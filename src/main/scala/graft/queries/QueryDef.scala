package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One gradable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Conventions that make the hash-compare robust across engines:
  *   - every output column is explicitly aliased, lowercase, identical on
  *     both sides;
  *   - every query ends with a total ORDER BY on a unique key so row order
  *     is deterministic;
  *   - floating-point aggregates are computed exactly: the input double is
  *     cast to DECIMAL, summed (exact, order-independent), and the result
  *     cast back to DOUBLE — bit-identical in Spark and DuckDB regardless
  *     of partial-aggregation order. Per-row double arithmetic (a*b) is
  *     IEEE-deterministic and safe to do before the decimal cast.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Temp dir for a query-scoped scratch index (q81/q82/q83), deleted
    * recursively at JVM exit — long-running mains (Bench's repeated
    * passes) would otherwise abandon a half-corpus index per call
    * under /tmp. */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      catch { case _: Throwable => () } // best effort at exit
    }))
    p.toString
  }

  /** Exact sum of a double expression via fixed-point: each per-row
    * double value (IEEE-deterministic in both engines) is rounded at
    * `scale` decimals with an explicit ROUND — identical half-away
    * rounding in Spark and DuckDB, unlike double→DECIMAL casts — then
    * summed exactly as BIGINT and scaled back to double. */
  def sumD(e: String, scale: Int = 4): Column =
    expr(oSumD(e, scale))

  /** Exact average of a double expression (exact sum / count). */
  def avgD(e: String, scale: Int = 4): Column =
    expr(oAvgD(e, scale))

  /** Same text runs in both Spark SQL and DuckDB. */
  def oSumD(e: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(ROUND(($e) * 1e$scale) AS BIGINT)) AS DOUBLE) / 1e$scale"
  def oAvgD(e: String, scale: Int = 4): String =
    s"${oSumD(e, scale)} / COUNT(*)"
}

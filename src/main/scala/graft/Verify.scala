package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure surfacing (VERDICT r8 #2): a throwing query used to write
  * nothing and silently vanish from the correctness artifact — that is
  * how a broken query could hide behind an "N/N pass" headline. Now every
  * query name is GUARANTEED a row in the artifact: on error we write a
  * one-row parquet with a `_verify_error` column (the driver's compare
  * can only fail it, never skip it) and record the failure in
  * `_errors.json`. VerifySpec drives a deliberately-broken query through
  * this path.
  */
object Verify {

  /** Runs each query, writes outDir/<name> parquet (or an error marker),
    * returns name → error message for the failures. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          queries: Map[String, (SparkSession, String) => DataFrame])
  : Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name failed: $msg")
        errors += name -> msg
        // Error marker: a schema no oracle produces, so the compare
        // reports a mismatch row instead of an absent query.
        import spark.implicits._
        try Seq(msg).toDF("_verify_error").coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        catch { case _: Throwable => () } // marker write is best-effort
      }
    }
    writeJson(s"$outDir/_errors.json", errors.toMap)
    errors.toMap
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeJson(path: String, kv: Map[String, String]): Unit =
    Files.writeString(Paths.get(path),
      kv.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — names (builder-side
    // iteration aid) restrict the dump to that subset; the driver
    // passes none and gets every query.
    val sfDir = args(0); val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // Write µs-precision INT64 timestamps so the DuckDB-side compare
      // sees the same values Spark computed (no INT96 legacy encoding).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    val errors = run(spark, sfDir, outDir, selected)
    // Artifact-completeness invariant: every selected query has output.
    val missing = selected.keySet.filter(n => !Files.exists(Paths.get(s"$outDir/$n")))
    if (missing.nonEmpty)
      System.err.println(s"[verify] INVARIANT VIOLATION: no artifact for ${missing.mkString(",")}")
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} of ${selected.size} queries failed: ${errors.keys.mkString(",")}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}

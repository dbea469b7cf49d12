package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling (the Deequ/dbt-docs data-quality front
  * door): per-column row/null counts, a portable KMV distinct
  * ESTIMATE, and min/max — computed in a SINGLE aggregation over ONE
  * scan, so profiling a 100 TB table costs exactly one pass no matter
  * how many columns are profiled (the naive per-column loop is C
  * scans). The distinct estimates ride [[Sketch]]'s k-bounded
  * `kmv_hashes` state (exact below k, ≈6% rsd at k = 256), so the
  * whole profile is a pure function of the table content — DuckDB
  * replays every cell, estimate included.
  *
  * Min/max are emitted as canonical strings of the column's native
  * ordering; both engines order ASCII strings and numerics
  * identically (the same assumption every ORDER BY oracle in the
  * suite already leans on).
  */
object Profile {

  /** `column, n_rows, n_null, est_distinct, min_s, max_s` — one row
    * per profiled column, one scan total. */
  def profile(df: DataFrame, cols: Seq[String],
      k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val perCol: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        expr("kmv_hashes(CAST(conv(substring(md5(CAST(`" + c +
          s"` AS STRING)), 1, 15), 16, 10) AS BIGINT), $k)")
          .as(s"_kmv_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), perCol: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        Sketch.estimate(s"_kmv_$c", k).as("est_distinct"),
        col(s"_min_$c").as("min_s"),
        col(s"_max_$c").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))
  }
}

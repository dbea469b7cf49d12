package graft.query

import graft.sink.CdcTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL passthrough over a base directory of CdcTables — the engine's
  * "analytical query surface" entry (reference entry point B,
  * SURVEY.md §3.2: arbitrary SQL over the lakehouse tables with
  * Catalyst doing pushdown/pruning). Registers every table under the
  * base dir (plus `<name>_current` current-state views) and runs SQL.
  */
object GraftSession {

  /** Register all CdcTables under `baseDir` as temp views (listed via
    * the Hadoop FileSystem API, so the base dir can live on s3a/HDFS
    * like the tables themselves). Returns the registered view names. */
  def register(spark: SparkSession, baseDir: String): Seq[String] =
    graft.core.Fs.list(baseDir).flatMap { name =>
      val dir = s"$baseDir/$name"
      if (CdcTable.currentVersion(dir) > 0) {
        val df = CdcTable.read(spark, dir)
        val viewName = name.stripPrefix("_")
        df.createOrReplaceTempView(viewName)
        if (df.columns.contains("_cdc_operation")) {
          CurrentState(df).createOrReplaceTempView(s"${viewName}_current")
          Seq(viewName, s"${viewName}_current")
        } else Seq(viewName)
      } else Nil
    }

  /** Register + run one SQL statement. */
  def sql(spark: SparkSession, baseDir: String, query: String): DataFrame = {
    register(spark, baseDir)
    spark.sql(query)
  }
}

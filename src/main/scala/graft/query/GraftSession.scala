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

  /** Register all CdcTables under `baseDir` as temp views. Returns the
    * registered view names. */
  def register(spark: SparkSession, baseDir: String): Seq[String] = {
    val base = java.nio.file.Paths.get(baseDir)
    if (!java.nio.file.Files.isDirectory(base)) return Nil
    val st = java.nio.file.Files.list(base)
    val names = try {
      val it = st.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
      it.forEachRemaining(p => { buf += p; () })
      buf.toVector
    } finally st.close()
    val out = scala.collection.mutable.ArrayBuffer[String]()
    names.foreach { p =>
      val name = p.getFileName.toString
      if (java.nio.file.Files.isDirectory(p) &&
        CdcTable.currentVersion(p.toString) > 0) {
        val df = CdcTable.read(spark, p.toString)
        val viewName = name.stripPrefix("_")
        df.createOrReplaceTempView(viewName)
        out += viewName
        if (df.columns.contains("_cdc_operation")) {
          CurrentState(df).createOrReplaceTempView(s"${viewName}_current")
          out += s"${viewName}_current"
        }
      }
    }
    out.toSeq
  }

  /** Register + run one SQL statement. */
  def sql(spark: SparkSession, baseDir: String, query: String): DataFrame = {
    register(spark, baseDir)
    spark.sql(query)
  }
}

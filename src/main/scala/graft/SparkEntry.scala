package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 surfaces here as a named query
  * with (where SQL-expressible) a DuckDB oracle; the driver hash-compares
  * the two on sf0.01.
  */
object SparkEntry {

  /** All gradable queries, grouped by domain. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ EventsQ.defs ++ ReconQ.defs ++ TextQ.defs ++
      EmbeddingQ.defs ++ OpsQ.defs ++ TemporalQ.defs ++ WindowQ.defs ++
      StreamQ.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

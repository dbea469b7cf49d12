package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Current-state view over the append-only CDC event log (SURVEY.md
  * §2.5 J4 / §2.7 W1): latest event per key wins, soft deletes drop
  * out. This is the reference's implicit consumer pattern (its tables
  * are append-only logs; `tests/e2e/test_cdc_flow.py:129-147` asserts
  * per-op rows) made explicit.
  *
  * One shuffle on the key; ties broken by kafka offset, matching the
  * reference's per-partition ordering guarantee (spec.md:183 FR-002).
  */
object CurrentState {

  def apply(log: DataFrame, idCol: String = "_id",
      tsCol: String = "_cdc_timestamp",
      opCol: String = "_cdc_operation",
      tieBreakers: Seq[String] = Seq("_kafka_offset")): DataFrame = {
    // Final tiebreak: a deterministic content hash. Kafka offsets are
    // null for batch/backfill/file sources, and ts_ms is millisecond
    // granularity — without this, same-millisecond events for one key
    // resolve to an arbitrary (run-dependent) winner.
    val contentHash = xxhash64(to_json(struct(log.columns.map(col)
      .toIndexedSeq: _*)))
    val order = (col(tsCol).desc +:
      tieBreakers.filter(log.columns.contains).map(col(_).desc)) :+
      contentHash.desc
    val w = Window.partitionBy(col(idCol)).orderBy(order: _*)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "delete")
      .drop("_rn")
  }

  /** Compact the log into a materialized current-state table: run the
    * view once and overwrite — the batch equivalent of an upsert sink
    * (the reference declares an `upsert` write mode it never implements,
    * `config.py:47`). */
  def compactTo(log: DataFrame, outDir: String, idCol: String = "_id"): Unit =
    apply(log, idCol).write.mode("overwrite").parquet(outDir)
}

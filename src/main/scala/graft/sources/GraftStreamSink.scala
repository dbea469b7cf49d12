package graft.sources

import graft.core.SchemaMerge.MergeMode
import graft.sink.CdcTable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.Sink

/** Streaming SINK over a CdcTable: `writeStream.format("graft")`.
  * Each micro-batch lands as one atomic manifest commit tagged with
  * (`txnAppId`, batchId), so a batch replayed after a crash is a
  * committed-txn no-op — the exactly-once contract of the CDC ingest
  * (CdcIngest's foreachBatch path) available as a plain sink. The
  * micro-batch Dataset arrives streaming-tagged and is rewrapped as a
  * batch frame over its executed RDD (the V1-sink convention) before
  * the parquet write. */
class GraftStreamSink(dir: String, partitionBy: Seq[String],
    mode: MergeMode, txnAppId: String) extends Sink {

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    val batch: DataFrame =
      org.apache.spark.sql.graftshim.StreamingShim.batchDataFrame(
        data.sparkSession, data.queryExecution.toRdd, data.schema)
    CdcTable.append(batch, dir, mode, partitionBy,
      txn = Some((txnAppId, batchId)))
    ()
  }

  override def toString: String = s"GraftStreamSink[$dir]"
}

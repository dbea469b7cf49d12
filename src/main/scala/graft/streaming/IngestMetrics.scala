package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Batch write statistics via StreamingQueryListener (SURVEY.md §2.6
  * A4; replaces the reference's hand-rolled per-write metrics,
  * `delta_writer.py:142-164`, and mirrors its Prometheus counter names
  * `shared/metrics/prometheus_metrics.py:28-95`). */
class IngestMetrics extends StreamingQueryListener {
  final case class BatchStats(queryId: java.util.UUID, batchId: Long,
      numInputRows: Long, inputRowsPerSecond: Double,
      processedRowsPerSecond: Double, durationMs: Long)

  private val stats = new ConcurrentLinkedQueue[BatchStats]()

  def snapshot: Seq[BatchStats] = stats.asScala.toSeq
  def totalRows: Long = snapshot.map(_.numInputRows).sum
  /** Rows seen by one query (a session-wide listener hears them all). */
  def totalRows(queryId: java.util.UUID): Long =
    snapshot.filter(_.queryId == queryId).map(_.numInputRows).sum

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    stats.add(BatchStats(p.id, p.batchId, p.numInputRows,
      p.inputRowsPerSecond, p.processedRowsPerSecond,
      p.durationMs.values().asScala.map(_.longValue()).sum))
  }
}

object IngestMetrics {
  /** Prometheus-style snapshot mirroring the reference's counter names
    * (`shared/metrics/prometheus_metrics.py:28-95`) — the SURVEY.md
    * §7.5 observability-hook equivalent. */
  def prometheusSnapshot(m: IngestMetrics): Map[String, Double] = {
    val s = m.snapshot
    Map(
      "cdc_events_processed_total" -> s.map(_.numInputRows).sum.toDouble,
      "cdc_batches_processed_total" -> s.size.toDouble,
      "cdc_batch_duration_ms_sum" -> s.map(_.durationMs).sum.toDouble,
      "cdc_events_per_second_last" ->
        s.lastOption.map(_.processedRowsPerSecond).getOrElse(0.0))
  }

  /** Attach a fresh listener to the session; caller keeps the handle. */
  def attach(spark: SparkSession): IngestMetrics = {
    val m = new IngestMetrics
    spark.streams.addListener(m)
    m
  }
}

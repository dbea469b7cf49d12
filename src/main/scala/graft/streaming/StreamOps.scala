package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming analytics helpers (SURVEY.md §2.9 T4/T5): watermarked
  * tumbling / sliding / session windows over an event-time column.
  * Pure plan builders — they work identically on batch and streaming
  * DataFrames, which is how the specs test them (memory stream in,
  * memory sink out) and how batch backfill reuses the same code.
  */
object StreamOps {

  /** Tumbling window aggregation with a watermark bounding state. */
  def tumbling(df: DataFrame, tsCol: String, width: String,
      watermark: String, aggs: Seq[Column], groupBy: Seq[Column] = Nil)
      : DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width) +: groupBy: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding window aggregation. */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
      watermark: String, aggs: Seq[Column], groupBy: Seq[Column] = Nil)
      : DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide) +: groupBy: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session window (gap-based) aggregation per key. */
  def sessions(df: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Stale-event split (T4, spec.md:211): events with event-time older
    * than `maxAge` relative to processing time branch to the DLQ. */
  def staleSplit(df: DataFrame, tsCol: String, maxAge: String)
      : (DataFrame, DataFrame) = {
    val isStale = col(tsCol) < current_timestamp() - expr(s"INTERVAL $maxAge")
    (df.filter(!isStale), df.filter(isStale))
  }
}

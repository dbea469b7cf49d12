package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash aggregator (SURVEY.md §2.10: `Aggregator[IN,BUF,OUT]`
  * for MinHash signatures): folds a GROUP of token/shingle ids into
  * the 16-minima signature — the grouped/streaming face of the
  * row-level `minhash_sig` expression, for corpora where a document's
  * tokens arrive as rows (exploded or streamed) rather than as one
  * array. Same hash family as the expression, so signatures are
  * interchangeable. Usable via `udaf(MinHashAggregator)` or
  * `Dataset.groupByKey(...).agg(MinHashAggregator.toColumn)`.
  */
object MinHashAggregator
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val K = TextHashes.MinHashK
  private val P = TextHashes.MinHashP

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], id: Long): Array[Long] = {
    var k = 0
    while (k < K) {
      val h = ((1103515245L + 12345L * k) * id + 748191L * k) % P
      if (h < buf(k)) buf(k) = h
      k += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < K) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

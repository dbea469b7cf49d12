package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a typed imperative aggregate
  * (SURVEY.md §2.10): frequent-item counts in ONE pass with a
  * k-bounded state, the 100 TB alternative to `GROUP BY token` when
  * only the head of the distribution matters — each partition builds
  * its own k-counter summary (partial aggregation), only k entries
  * per partition shuffle, and merges use the Agarwal et al. mergeable-
  * summaries rule (sum counters; if over capacity, subtract the
  * (k+1)-th largest and drop non-positives). A full vocabulary
  * aggregation shuffles every distinct token; this shuffles k rows per
  * partition, period.
  *
  * Guarantees: estimated count ∈ [true − N/(k+1), true], and any item
  * with frequency > N/(k+1) is present. When the distinct-item count
  * never exceeds k (vocabulary ≤ capacity) no decrement ever fires and
  * the counts are EXACT — which is what lets the q71 oracle compare
  * against exact GROUP BY counts at test scale.
  *
  * Usage: `heavy_hitters(tok, 256)` → array<struct<tok, cnt>> sorted
  * by (cnt desc, tok asc), ready to explode.
  */
case class HeavyHitters(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyHitters.Buf] {

  import HeavyHitters._

  override def children: Seq[Expression] = Seq(child, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  private lazy val capacity: Int = {
    val v = capacityExpr.eval(null)
    require(v != null, "heavy_hitters capacity must be a literal int")
    v.asInstanceOf[Number].intValue()
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters requires a string input, got ${child.dataType.sql}")
    else if (!capacityExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(capacityExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        "heavy_hitters capacity must be an integer literal")
    else if (capacity <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters capacity must be positive: $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Buf = new Buf(capacity)

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: Buf, o: Buf): Buf = { b.mergeIn(o); b }

  override def eval(b: Buf): Any =
    new GenericArrayData(b.sortedEntries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    })

  override def serialize(b: Buf): Array[Byte] = {
    val entries = b.counters.toSeq
    val payload = entries.map { case (t, _) =>
      t.getBytes(StandardCharsets.UTF_8)
    }
    val size = 8 + payload.map(_.length + 12).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(b.capacity).putInt(entries.size)
    entries.zip(payload).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length).put(bytes).putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buf(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.counters.update(new String(tb, StandardCharsets.UTF_8),
        bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
}

object HeavyHitters {
  /** Misra–Gries counter state: at most `capacity` live counters. */
  final class Buf(val capacity: Int) {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]

    /** Classic MG update generalized to weighted adds. */
    def add(t: String, w: Long): Unit =
      counters.get(t) match {
        case Some(c) => counters.update(t, c + w); ()
        case None if counters.size < capacity =>
          counters.update(t, w); ()
        case None =>
          // decrement-all by the largest amount the new item allows;
          // weighted form of "subtract 1 from every counter"
          val d = math.min(w, counters.values.min)
          shaveAll(d)
          if (w > d) add(t, w - d)
      }

    /** Mergeable-summaries merge: pointwise sum, then shave by the
      * (capacity+1)-th largest so at most `capacity` survive. */
    def mergeIn(o: Buf): Unit = {
      o.counters.foreach { case (t, c) =>
        counters.update(t, counters.getOrElse(t, 0L) + c)
      }
      if (counters.size > capacity) {
        val cut = counters.values.toArray.sorted(
          Ordering.Long.reverse).apply(capacity)
        shaveAll(cut)
      }
    }

    private def shaveAll(d: Long): Unit = {
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counters.foreach { case (t, c) =>
        if (c - d <= 0) dead += t else counters.update(t, c - d)
      }
      dead.foreach(counters.remove)
    }

    /** Deterministic output order: count desc, then token asc. */
    def sortedEntries: Array[(String, Long)] =
      counters.toArray.sortBy { case (t, c) => (-c, t) }
  }
}

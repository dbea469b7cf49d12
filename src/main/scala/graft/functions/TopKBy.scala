package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate (SURVEY.md §2.10 extensibility;
  * the distributed retrieval primitive behind
  * [[graft.ext.Similarity.knnJoinBrute]]): `topk_by(score, id, k)`
  * keeps the k largest `(score, id)` pairs under the total order
  * (score DESC, id ASC) with a k-bounded state.
  *
  * Why not a window: `ROW_NUMBER() OVER (PARTITION BY q ORDER BY s)`
  * shuffles EVERY candidate row to the group's reducer before any can
  * be discarded — for a k-NN join that is |corpus| rows per query. This
  * aggregate discards below-top-k candidates map-side (classic partial
  * aggregation), so only ≤ k entries per partition per group shuffle —
  * the same state-bounding move as [[HeavyHitters]], but exact: top-k
  * under a total order is a mergeable summary with no error term.
  *
  * Output: `array<struct<id, score>>` sorted by (score DESC, id ASC) —
  * deterministic for any input order, ready to `posexplode` into
  * (rank, id, score) rows that match a ROW_NUMBER oracle exactly.
  */
case class TopKBy(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBy.Buf] {

  import TopKBy._

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by"

  private lazy val k: Int = {
    val v = kExpr.eval(null)
    require(v != null, "topk_by k must be a literal int")
    v.asInstanceOf[Number].intValue()
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != LongType || idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by requires (BIGINT score, BIGINT id), got " +
          s"(${scoreExpr.dataType.sql}, ${idExpr.dataType.sql})")
    else if (!kExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("topk_by k must be an integer literal")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"topk_by k must be positive: $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(b: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    b
  }

  override def merge(b: Buf, o: Buf): Buf = { b.mergeIn(o); b }

  override def eval(b: Buf): Any =
    new GenericArrayData(b.sorted.map { case (s, i) =>
      InternalRow(i, s): Any
    })

  override def serialize(b: Buf): Array[Byte] = {
    val entries = b.entries
    val bb = java.nio.ByteBuffer.allocate(8 + entries.length * 16)
    bb.putInt(b.k).putInt(entries.length)
    entries.foreach { case (s, i) => bb.putLong(s).putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buf(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach { _ => buf.add(bb.getLong(), bb.getLong()) }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))
}

object TopKBy {
  /** k-bounded (score, id) heap ranked by (score DESC, id ASC). The
    * queue's head is the WORST retained entry (PriorityQueue dequeues
    * its ordering's max, and the ordering ranks worse = higher), so
    * add-then-evict is O(log k) and state never exceeds k pairs. */
  final class Buf(val k: Int) {
    // max under this ordering = lowest score, then highest id = the
    // entry to evict first (explicit compare — no negation, so
    // Long.MinValue scores can't overflow).
    private val evictFirst: Ordering[(Long, Long)] =
      new Ordering[(Long, Long)] {
        def compare(x: (Long, Long), y: (Long, Long)): Int = {
          val c = java.lang.Long.compare(y._1, x._1)
          if (c != 0) c else java.lang.Long.compare(x._2, y._2)
        }
      }
    private val pq =
      scala.collection.mutable.PriorityQueue.empty[(Long, Long)](evictFirst)

    def add(score: Long, id: Long): Unit = {
      if (pq.size < k) { pq.enqueue((score, id)); () }
      else {
        val (ws, wi) = pq.head
        // strictly better than the worst under (score DESC, id ASC)?
        if (score > ws || (score == ws && id < wi)) {
          pq.dequeue(); pq.enqueue((score, id)); ()
        }
      }
    }

    def mergeIn(o: Buf): Unit = o.entries.foreach { case (s, i) => add(s, i) }

    /** Unordered snapshot (serialization). */
    def entries: Array[(Long, Long)] = pq.toArray

    /** Deterministic output order: score DESC, id ASC (ascending under
      * evictFirst IS best-first). */
    def sorted: Array[(Long, Long)] =
      pq.toArray.sorted(evictFirst)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Order-insensitive multiset digest aggregate (SURVEY.md §2.10: the
  * one custom aggregate the reconciliation algorithm motivates —
  * reference `research.md:722-727` hashes sorted batches, which forces
  * a sort; a commutative digest makes the comparison shuffle-free and
  * sort-free).
  *
  * State: (count, sum of mixed hashes, xor of mixed hashes). Each
  * input long is avalanche-mixed (splitmix64 finalizer — public-domain
  * constant set) so that sum/xor over the multiset are collision-
  * resistant in practice; two multisets agree on (count, sum, xor)
  * with overwhelming probability iff they are equal. Merge is
  * component-wise addition/xor ⇒ associative + commutative ⇒ safe
  * under partial aggregation in any partition order.
  *
  * Usage: `multiset_digest(xxhash64(col1, col2, …))` per bucket, then
  * compare digest structs between source and target.
  */
case class MultisetDigest(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MultisetDigest.Buf] {

  import MultisetDigest._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("sum", LongType, nullable = false),
    StructField("xor", LongType, nullable = false)))
  override def prettyName: String = "multiset_digest"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multiset_digest requires a BIGINT input (hash the row first), " +
        s"got ${child.dataType.sql}")

  override def createAggregationBuffer(): Buf = new Buf(0L, 0L, 0L)

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val m = mix(v.asInstanceOf[Long])
      b.cnt += 1; b.sum += m; b.xor ^= m
    }
    b
  }

  override def merge(b: Buf, o: Buf): Buf = {
    b.cnt += o.cnt; b.sum += o.sum; b.xor ^= o.xor; b
  }

  override def eval(b: Buf): Any =
    InternalRow(b.cnt, b.sum, b.xor)

  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24)
    bb.putLong(b.cnt).putLong(b.sum).putLong(b.xor)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new Buf(bb.getLong(), bb.getLong(), bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultisetDigest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultisetDigest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MultisetDigest =
    copy(child = newChildren.head)
}

object MultisetDigest {
  final class Buf(var cnt: Long, var sum: Long, var xor: Long)

  /** splitmix64 finalizer (public-domain mixing constants). */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}

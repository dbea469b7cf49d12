package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** k-minimum-values distinct-count sketch state (Bar-Yossef et al.
  * RANDOM 2002; the KMV/"bottom-k" estimator): `kmv_hashes(hash, k)`
  * keeps the k SMALLEST DISTINCT hash values seen, as a sorted
  * ascending `array<bigint>`.
  *
  * Why this over Spark's `approx_count_distinct`/datasketches HLL:
  * those estimates are engine-private (q55 can only gate them with an
  * error BOUND), while the k smallest distinct values of a portable
  * hash are a pure function of the input SET — DuckDB reproduces the
  * sketch AND the estimate bit-for-bit (`ORDER BY hash LIMIT k` over
  * the distinct hashes), so the correctness gate hash-matches the
  * estimate itself. The estimate for >k distinct inputs is
  * `(k-1)·2^60 div h_k` (exact integer arithmetic, see
  * [[graft.ext.Sketch]]); for ≤k the sketch IS the distinct set.
  *
  * Scale shape: state is ≤ k longs per group per partition, dedup
  * internal to the buffer (a TreeSet — duplicates of a hash can never
  * occupy two slots, which is why `topk_by` can't express this), and
  * merge = insert-all (the k-min of a union is the k-min of the union
  * of k-mins), so map-side partials discard everything but k values
  * before the shuffle — the same state-bounding move as [[TopKBy]] and
  * [[HeavyHitters]], and the law that makes sketches of PARTITIONED
  * 100 TB corpora combinable without a second pass over the data. */
case class KmvHashes(
    hashExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(hashExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_hashes"

  /** Folded as Long first so an out-of-Int-range literal (e.g.
    * 4294967298L, which Number.intValue would silently wrap to 2) is
    * rejected instead of truncated. */
  private lazy val kLong: Long = {
    val v = kExpr.eval(null)
    require(v != null, "kmv_hashes k must be a literal int")
    v.asInstanceOf[Number].longValue()
  }
  private lazy val k: Int = kLong.toInt

  /** Sketches live one-per-group in memory and merge via TreeSet
    * copies; a k past this is a config typo, not a sketch. */
  private val MaxK = 1 << 24

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_hashes requires a BIGINT hash, got ${hashExpr.dataType.sql}")
    else if (!kExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("kmv_hashes k must be an integer literal")
    else if (kLong < 2 || kLong > MaxK)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_hashes k must be in [2, $MaxK]: $kLong")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(b: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (b.size < k) { b.add(h); () }
    else if (h < b.last()) { if (b.add(h)) b.pollLast(); () }

  override def update(b: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = hashExpr.eval(input)
    if (h != null) insert(b, h.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
      o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) insert(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.size * 8)
    bb.putInt(b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = createAggregationBuffer()
    val n = bb.getInt()
    (0 until n).foreach(_ => b.add(bb.getLong()))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvHashes =
    copy(hashExpr = newChildren(0), kExpr = newChildren(1))
}

package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing expressions for the dedup/fingerprint pipeline.
  *
  * Each computes, in ONE pass of JVM code per row, what the portable
  * SQL formulation (split → transform → md5 → conv → array_min …)
  * computes through interpreted higher-order-function lambdas — with
  * identical results (token ids are the first 7 hex chars of the md5 of
  * the UTF-8 token, minhash/simhash use the same modular-arithmetic
  * hash family as the DuckDB oracle). The lambda forms re-evaluate the
  * split per element reference and get re-inlined into pushed-down
  * filters by the optimizer (InferFiltersFromGenerate + PushDownPredicates
  * substitute aliases regardless of cost), which turned a 5k-document
  * shingle join into ~50 s; these expressions make recomputation free.
  *
  * Semantics shared by all: tokens = trim(text) split on \s+; distinct
  * keeps FIRST occurrences of the token/shingle STRING (hash duplicates
  * from 28-bit collisions are kept, mirroring
  * `list_transform(list_distinct(...), md5prefix)`).
  */
object TextHashes {
  private val ws = Pattern.compile("\\s+")

  def tokens(text: UTF8String): Array[String] =
    ws.split(text.toString.trim, -1)

  /** First 7 md5 hex chars as a long (28-bit id) — identical to
    * CAST(conv(substring(md5(t),1,7),16,10) AS BIGINT). */
  def md5Prefix7(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    // 7 hex chars = 3.5 bytes
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
  }

  def distinctHashes(parts: Iterator[String]): Array[Long] = {
    val seen = new java.util.LinkedHashSet[String]()
    parts.foreach(seen.add)
    val out = new Array[Long](seen.size)
    var i = 0
    val it = seen.iterator()
    while (it.hasNext) { out(i) = md5Prefix7(it.next()); i += 1 }
    out
  }

  val MinHashK = 16
  val MinHashP = 1000000007L

  def minhash(ids: Array[Long]): Array[java.lang.Long] = {
    val out = new Array[java.lang.Long](MinHashK)
    var k = 0
    while (k < MinHashK) {
      val a = 1103515245L + 12345L * k
      val b = 748191L * k
      var min = Long.MaxValue
      var i = 0
      while (i < ids.length) {
        val h = (a * ids(i) + b) % MinHashP
        if (h < min) min = h
        i += 1
      }
      out(k) = if (ids.isEmpty) null else java.lang.Long.valueOf(min)
      k += 1
    }
    out
  }

  def simhash16(ids: Array[Long]): Long = {
    var hash = 0L
    var j = 0
    while (j < 16) {
      var s = 0L
      var i = 0
      while (i < ids.length) {
        s += ((ids(i) >> j) & 1L) * 2 - 1
        i += 1
      }
      if (s > 0) hash |= (1L << j)
      j += 1
    }
    hash
  }

  // Whole-row entry points, callable as STATIC Java methods from
  // generated code (an object without a companion class compiles with
  // static forwarders) — each expression's doGenCode is a single
  // static call, so the expressions participate in whole-stage codegen
  // instead of forcing the interpreted CodegenFallback path.

  def tokenIds(text: UTF8String): ArrayData =
    new GenericArrayData(distinctHashes(tokens(text).iterator))

  def shingleIdsOf(text: UTF8String): ArrayData = {
    val t = tokens(text)
    val shingles =
      if (t.length < 3) Iterator.empty
      else (0 to t.length - 3).iterator.map(i =>
        s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    new GenericArrayData(distinctHashes(shingles))
  }

  /** First 14 md5 hex chars as a long (56-bit id) — identical to
    * CAST(conv(substring(md5(t),1,14),16,10) AS BIGINT). */
  def md5Prefix14(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
      ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
      ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
  }

  /** Distinct word-n-gram 56-bit ids in one pass (the generalized
    * [[shingleIdsOf]]; n-gram strings are space-joined, first
    * occurrence kept). */
  def ngramIdsOf(text: UTF8String, n: Int): ArrayData = {
    val t = tokens(text)
    if (t.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= t.length - n) {
      val sb = new java.lang.StringBuilder(t(i))
      var j = 1
      while (j < n) { sb.append(' ').append(t(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = md5Prefix14(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** One row per word-bigram POSITION as (pfid, bfid) — the hashed
    * prefix-token id and bigram id the LM/DSIR scoring pipelines key
    * on, in ONE pass: tokens hash once each (the SQL composition
    * re-evaluates the regex split per element reference after
    * optimizer re-inlining — quadratic per document), bigram strings
    * hash once per position. Ids match the staged formulation
    * exactly: md5-prefix-7 of the UTF-8 string, mod `buckets`. */
  def lmFeatureIdsOf(text: UTF8String, buckets: Int): ArrayData = {
    val t = tokens(text)
    if (t.length < 2)
      return new GenericArrayData(Array.empty[Any])
    val tokHash = new Array[Long](t.length)
    var i = 0
    while (i < t.length) {
      tokHash(i) = md5Prefix7(t(i)) % buckets; i += 1
    }
    val out = new Array[Any](t.length - 1)
    i = 1
    while (i < t.length) {
      out(i - 1) = org.apache.spark.sql.catalyst.InternalRow(
        tokHash(i - 1),
        md5Prefix7(s"${t(i - 1)} ${t(i)}") % buckets)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint selection in ONE pass (Schleimer et al.
    * SIGMOD 2003): positional k-gram 56-bit ids hashed once each,
    * every w-window's RIGHTMOST minimum found with a monotonic deque
    * (O(ng) total — popping on >= keeps the latest of equal minima,
    * which IS the rightmost-min tie rule), distinct selected
    * positions emitted in order as struct(pos 1-based, fp). The SQL
    * HOF composition re-evaluates the whole k-gram hash array per
    * element reference after optimizer re-inlining — quadratic per
    * document (the [[lmFeatureIdsOf]] failure mode; observed
    * unbounded at 100×). */
  def winnowFpsOf(text: UTF8String, k: Int, w: Int): ArrayData = {
    val t = tokens(text)
    val ng = t.length - k + 1
    if (ng < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      val sb = new java.lang.StringBuilder(t(i))
      var j = 1
      while (j < k) { sb.append(' ').append(t(i + j)); j += 1 }
      hs(i) = md5Prefix14(sb.toString)
      i += 1
    }
    val ww = math.min(w, ng)
    val dq = new Array[Int](ng) // index deque, values rising front→back
    var head = 0; var tail = 0
    val sel = new scala.collection.mutable.ArrayBuffer[Int]()
    var last = -1
    i = 0
    while (i < ng) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - ww) head += 1
      if (i >= ww - 1 && dq(head) != last) { last = dq(head); sel += last }
      i += 1
    }
    val out = new Array[Any](sel.length)
    var p = 0
    while (p < sel.length) {
      out(p) = org.apache.spark.sql.catalyst.InternalRow(
        sel(p) + 1, hs(sel(p)))
      p += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(ids: ArrayData): ArrayData =
    new GenericArrayData(minhash(ids.toLongArray()).asInstanceOf[Array[Any]])

  def simhashOf(ids: ArrayData): Long = simhash16(ids.toLongArray())

  private[functions] def checkString(e: Expression,
      name: String): TypeCheckResult =
    if (e.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string argument, got ${e.dataType.sql}")

  private[functions] def checkLongArray(e: Expression,
      name: String): TypeCheckResult = e.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<bigint>, got ${t.sql}")
  }
}

/** token_ids(text): 28-bit md5 ids of the distinct whitespace tokens. */
case class TokenIds(child: Expression) extends UnaryExpression {
  import TextHashes._
  override def checkInputDataTypes(): TypeCheckResult =
    checkString(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ids"
  override def nullSafeEval(v: Any): Any =
    tokenIds(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.tokenIds($c)")
  override protected def withNewChildInternal(c: Expression): TokenIds =
    copy(child = c)
}

/** shingle_ids(text): 28-bit md5 ids of the distinct word 3-grams
  * (space-joined), matching the staged SQL shingle construction. */
case class ShingleIds(child: Expression) extends UnaryExpression {
  import TextHashes._
  override def checkInputDataTypes(): TypeCheckResult =
    checkString(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_ids"
  override def nullSafeEval(v: Any): Any =
    shingleIdsOf(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.shingleIdsOf($c)")
  override protected def withNewChildInternal(c: Expression): ShingleIds =
    copy(child = c)
}

/** ngram_sids(text, n): 56-bit md5-prefix ids of the distinct word
  * n-grams — the generalized shingle_ids (decontamination wants the
  * 13-gram rule, span dedup wants parameterized spans, and 56 bits
  * keeps billion-scale n-gram spaces collision-sparse where 28 bits
  * would saturate). `n` must be a foldable integer literal — it
  * shapes the generated code. */
case class NgramSids(child: Expression, n: Int) extends UnaryExpression {
  import TextHashes._
  require(n >= 1, s"ngram_sids: n must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    checkString(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_sids"
  override def nullSafeEval(v: Any): Any =
    ngramIdsOf(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.ngramIdsOf($c, $n)")
  override protected def withNewChildInternal(c: Expression): NgramSids =
    copy(child = c)
}

object NgramSids {
  /** Registry builder: the second argument must fold to an int. */
  def fromArgs(e: Seq[Expression]): NgramSids = {
    require(e.length == 2, s"ngram_sids(text, n) takes 2 args, got ${e.length}")
    val n = e(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other if other.foldable =>
        other.eval() match {
          case i: Int => i
          case l: Long =>
            require(l >= Int.MinValue && l <= Int.MaxValue,
              s"ngram_sids: n out of Int range: $l")
            l.toInt
          case v => throw new IllegalArgumentException(
            s"ngram_sids: n must be an integer literal, got $v")
        }
      case _ => throw new IllegalArgumentException(
        "ngram_sids: n must be a foldable integer literal")
    }
    NgramSids(e.head, n)
  }
}

/** minhash_sig(ids): 16 minima of (a_k·x + b_k) mod p over the ids. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  import TextHashes._
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any =
    minhashSig(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.minhashSig($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** simhash16(ids): 16-bit simhash of the id multiset. */
case class SimHash16(child: Expression) extends UnaryExpression {
  import TextHashes._
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      simhashOf(v.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.simhashOf($c)")
  override protected def withNewChildInternal(c: Expression): SimHash16 =
    copy(child = c)
}

/** lm_feature_ids(text, buckets): one struct(pfid, bfid) per
  * word-bigram position — [[TextHashes.lmFeatureIdsOf]] as a codegen'd
  * native; `buckets` must be a foldable integer literal (it shapes the
  * hash space, which is part of any model built on the ids). */
case class LmFeatureIds(child: Expression, buckets: Int)
    extends UnaryExpression {
  import TextHashes._
  require(buckets >= 2, s"lm_feature_ids: buckets must be >= 2: $buckets")
  override def checkInputDataTypes(): TypeCheckResult =
    checkString(child, prettyName)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pfid", LongType, nullable = false),
      StructField("bfid", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "lm_feature_ids"
  override def nullSafeEval(v: Any): Any =
    lmFeatureIdsOf(v.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.lmFeatureIdsOf($c, $buckets)")
  override protected def withNewChildInternal(c: Expression): LmFeatureIds =
    copy(child = c)
}

/** winnow_fps(text, k, w): one struct(pos, fp) per winnow-selected
  * k-gram position — [[TextHashes.winnowFpsOf]] as a codegen'd
  * native; `k` and `w` must be foldable integer literals (they shape
  * the fingerprint scheme). */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  import TextHashes._
  require(k >= 1 && w >= 1, s"winnow_fps: k and w must be >= 1: $k, $w")
  override def checkInputDataTypes(): TypeCheckResult =
    checkString(child, prettyName)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def nullSafeEval(v: Any): Any =
    winnowFpsOf(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.winnowFpsOf($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFps =
    copy(child = c)
}

object WinnowFps {
  /** Registry builder: k and w must fold to ints. */
  def fromArgs(e: Seq[Expression]): WinnowFps = {
    require(e.length == 3,
      s"winnow_fps(text, k, w) takes 3 args, got ${e.length}")
    def intOf(x: Expression, name: String): Int = x match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other if other.foldable =>
        other.eval() match {
          case i: Int => i
          case l: Long =>
            require(l >= Int.MinValue && l <= Int.MaxValue,
              s"winnow_fps: $name out of Int range: $l")
            l.toInt
          case v => throw new IllegalArgumentException(
            s"winnow_fps: $name must be an integer literal, got $v")
        }
      case _ => throw new IllegalArgumentException(
        s"winnow_fps: $name must be a foldable integer literal")
    }
    WinnowFps(e.head, intOf(e(1), "k"), intOf(e(2), "w"))
  }
}

object LmFeatureIds {
  /** Registry builder: the second argument must fold to an int. */
  def fromArgs(e: Seq[Expression]): LmFeatureIds = {
    require(e.length == 2,
      s"lm_feature_ids(text, buckets) takes 2 args, got ${e.length}")
    val b = e(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other if other.foldable =>
        other.eval() match {
          case i: Int => i
          case l: Long =>
            require(l >= Int.MinValue && l <= Int.MaxValue,
              s"lm_feature_ids: buckets out of Int range: $l")
            l.toInt
          case v => throw new IllegalArgumentException(
            s"lm_feature_ids: buckets must be an integer literal, got $v")
        }
      case _ => throw new IllegalArgumentException(
        "lm_feature_ids: buckets must be a foldable integer literal")
    }
    LmFeatureIds(e.head, b)
  }
}

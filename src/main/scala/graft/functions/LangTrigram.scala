package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Driver-built scoring table for [[LangTrigramBits]]: per-language
  * Laplace miss costs plus an open-addressed long-keyed map from the
  * PACKED trigram (3 code points × 21 bits — every Unicode code point
  * fits, and 63 bits stay positive in a long) to the per-language bit
  * vector. All costs are precomputed by the SAME fixed-point
  * `fixed_log2` arithmetic the composed DataFrame form uses, so the
  * native scorer is bit-identical to the composition by construction
  * — the table holds RESULTS of that arithmetic, never re-derives it.
  *
  * Size: |distinct trigrams| × |langs| longs — the same volume the
  * composed form broadcasts as a join table, held once per executor
  * via the codegen reference object. Lang-id models are bounded by
  * langs × charset³, not the corpus (TextAnalysis.charTrigramLangModel
  * scaladoc), so driver construction is metadata-scale. */
final class LangModelData(
    val langs: Array[UTF8String], // ascending — ties pick index 0 first
    val miss: Array[Long],        // bits for an unseen trigram, per lang
    tris: Array[Long],            // packed trigram keys
    vecs: Array[Array[Long]])     // per-lang bits, aligned with tris
    extends Serializable {

  require(langs.length == miss.length,
    "langs and miss vectors must align")
  require(tris.length == vecs.length, "keys and vectors must align")

  // open addressing, linear probing, power-of-2 capacity ≥ 2·n
  private val cap: Int = {
    var c = 16
    while (c < tris.length * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  private val slot = new Array[Int](cap)
  java.util.Arrays.fill(slot, -1)
  private val table: Array[Array[Long]] = vecs
  locally {
    var i = 0
    while (i < tris.length) {
      var p = idx(tris(i))
      while (slot(p) >= 0) {
        require(keys(p) != tris(i), s"duplicate trigram key ${tris(i)}")
        p = (p + 1) & mask
      }
      keys(p) = tris(i); slot(p) = i
      i += 1
    }
  }

  private def idx(k: Long): Int = {
    val h = k * -7046029254386353131L // 0x9E3779B97F4A7C15
    (((h ^ (h >>> 32)) & 0x7FFFFFFF) & mask).toInt
  }

  /** The per-lang bit vector for a packed trigram, or null (miss). */
  def lookup(k: Long): Array[Long] = {
    var p = idx(k)
    while (slot(p) >= 0) {
      if (keys(p) == k) return table(slot(p))
      p = (p + 1) & mask
    }
    null
  }
}

object LangTrigram {

  /** Pack 3 code points into one positive long (21 bits each). */
  def pack(c0: Int, c1: Int, c2: Int): Long =
    (c0.toLong << 42) | (c1.toLong << 21) | c2.toLong

  /** Packed key of a 3-code-point trigram string (model side). */
  def packTri(tri: String): Long = {
    val cps = tri.codePoints().toArray
    require(cps.length == 3,
      s"model trigram must be exactly 3 code points: '$tri'")
    pack(cps(0), cps(1), cps(2))
  }

  private val und = UTF8String.fromString("und")

  /** One-pass per-document scorer: sums each language's bits over the
    * code-point trigrams and returns (n_tris, argmin-lang, its bits);
    * ties go to the SMALLEST language name (langs are sorted, so the
    * first strict minimum wins) — exactly the composed form's
    * `min(struct(bits, lang))`. */
  def score(text: UTF8String, m: LangModelData): InternalRow = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length - 2
    if (n < 1) return InternalRow(0L, und, 0L)
    val l = m.langs.length
    val acc = new Array[Long](l)
    var i = 0
    while (i < n) {
      val v = m.lookup(pack(cps(i), cps(i + 1), cps(i + 2)))
      val row = if (v == null) m.miss else v
      var j = 0
      while (j < l) { acc(j) += row(j); j += 1 }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < l) { if (acc(j) < acc(best)) best = j; j += 1 }
    InternalRow(n.toLong, m.langs(best), acc(best))
  }
}

/** lang_trigram_bits(text): [[LangTrigram.score]] as a codegen'd
  * native — the whole per-document × per-language Laplace scoring
  * loop runs inside the scan projection, replacing the composed
  * form's (positions × |langs|)-row explode + broadcast join + two
  * aggregations (the same shape-collapse `lm_feature_ids` bought
  * DSIR). The model rides along as a codegen reference object; it is
  * NOT SQL-registrable (the model is not a literal), so the Scala API
  * wraps it via the graftshim column bridge. */
case class LangTrigramBits(child: Expression, model: LangModelData)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_trigram_bits requires a STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tris", LongType, nullable = false),
    StructField("pred_lang", StringType, nullable = false),
    StructField("bits_fp", LongType, nullable = false)))
  override def prettyName: String = "lang_trigram_bits"
  override def nullSafeEval(v: Any): Any =
    LangTrigram.score(v.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langModel", model,
      classOf[LangModelData].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LangTrigram.score($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression)
  : LangTrigramBits = copy(child = c)
}

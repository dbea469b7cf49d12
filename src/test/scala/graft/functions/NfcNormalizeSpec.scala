package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native NFC expression: composition semantics, codegen vs
  * interpreted bit-equality, and the normalizeText pipeline built on
  * it. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "Cafe\u0301" // e + COMBINING ACUTE (NFD)
  private val composed = "Caf\u00e9"   // precomposed \u00e9 (NFC)

  test("nfc_normalize composes decomposed sequences") {
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df
      .withColumn("viaFn", expr("nfc_normalize(t)"))
      .withColumn("viaCol", graft.ext.TextAnalysis.nfcNormalize(col("t")))
      .select($"id", $"viaFn", $"viaCol",
        length($"t").as("lenRaw"), length($"viaFn").as("lenNorm"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.get(3), r.get(4))).toMap
    // both construction routes (registered fn / direct Column) agree
    out.foreach { case (_, (f, c, _, _)) => assert(f == c) }
    assert(out(1L)._1 == composed, "NFD input composes to NFC")
    assert(out(1L)._3 == 5 && out(1L)._4 == 4, "one codepoint shorter")
    assert(out(2L)._1 == composed, "already-NFC input unchanged")
    assert(out(3L)._1 == "plain", "ASCII passes through")
    assert(out(4L)._1 == null, "null propagates")
  }

  test("codegen and interpreted paths agree bit-for-bit") {
    val rows = Seq("abc", decomposed, composed, "mixed " + decomposed,
      "A\u030a\u0301", "") // stacked combining marks
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t").withColumn("n", expr("nfc_normalize(t)"))
    val viaCodegen = df.orderBy("id").select("n").as[String].collect()
    val interpreted = rows.map(t =>
      NfcNormalize.nfc(org.apache.spark.unsafe.types.UTF8String
        .fromString(t)).toString)
    assert(viaCodegen.toSeq == interpreted)
  }

  test("normalizeText collapses whitespace, lowercases, composes") {
    val df = Seq((1L, s"  A\t\tB  $decomposed  ")).toDF("id", "t")
    val n = df.select(graft.ext.TextAnalysis.normalizeText($"t"))
      .as[String].head()
    assert(n == s"a b ${composed.toLowerCase}", s"got '$n'")
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native text-hash expressions must equal the portable built-in
  * compositions exactly (the DuckDB oracle computes the latter). */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private val tok = "CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT)"
  private def docs = Seq(
    "the fast key order sort table scan merge",
    "one two",
    "",
    "a a a b b c",
    "spark group query row data slow small filter"
  ).toDF("text")

  test("token_ids equals distinct-token md5-prefix composition") {
    val both = docs.select(
      expr("token_ids(text)").as("native"),
      expr(s"transform(array_distinct(split(trim(text), '\\\\s+')), " +
        s"t -> $tok)").as("composed"))
    assert(both.filter(not($"native" <=> $"composed")).count() == 0)
  }

  test("shingle_ids equals distinct-3gram md5-prefix composition") {
    val shs =
      """CASE WHEN size(split(trim(text), '\\s+')) >= 3
        |THEN array_distinct(transform(
        |  sequence(0, size(split(trim(text), '\\s+')) - 3),
        |  i -> concat(split(trim(text), '\\s+')[i], ' ',
        |    split(trim(text), '\\s+')[i+1], ' ',
        |    split(trim(text), '\\s+')[i+2])))
        |ELSE array() END""".stripMargin
    val both = docs.select(
      expr("shingle_ids(text)").as("native"),
      expr(s"transform($shs, t -> $tok)").as("composed"))
    assert(both.filter(not($"native" <=> $"composed")).count() == 0)
  }

  test("ngram_sids equals the built-in composition for several n") {
    Seq(1, 2, 4, 13).foreach { n =>
      val native = graft.ext.Decontaminate
        .withNgramSids(docs, "text", n, out = "native")
      val both = graft.ext.Decontaminate
        .ngramSidsBuiltin(native, "text", n, out = "composed")
      assert(both.filter(not($"native" <=> $"composed")).count() == 0,
        s"n=$n mismatch")
    }
    // and the registered SQL function resolves with a literal n
    val viaSql = docs.selectExpr("ngram_sids(text, 2) AS s")
      .filter(size($"s") > 0).count()
    assert(viaSql > 0)
  }

  test("ngram_sids equals the composition on random unicode corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // words over a unicode-diverse alphabet (ascii, accents, CJK,
    // an astral-plane char) — md5 prefixes must agree byte-for-byte
    val word = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ß', '中', '文', '\uD83D'.toChar)))
      .map(_.mkString.replaceAll("[\\uD800-\\uDFFF]", "x"))
    val doc = Gen.chooseNum(0, 12).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    val docsGen = Gen.listOfN(30, doc)
    val params = Gen.Parameters.default
    (1 to 5).foreach { i =>
      val texts = docsGen(params, Seed(i.toLong)).get
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("id", "text")
      Seq(2, 5).foreach { n =>
        val native = graft.ext.Decontaminate
          .withNgramSids(df, "text", n, out = "native")
        val both = graft.ext.Decontaminate
          .ngramSidsBuiltin(native, "text", n, out = "composed")
        val bad = both.filter(not($"native" <=> $"composed"))
        assert(bad.count() == 0,
          s"seed=$i n=$n: ${bad.select("text").as[String].collect()
            .take(3).mkString(" | ")}")
      }
    }
  }

  test("minhash_sig and simhash16 equal their lambda forms") {
    val ids = docs.select(expr("shingle_ids(text)").as("sids"),
      expr("token_ids(text)").as("tids"))
    val both = ids.select(
      expr("minhash_sig(sids)").as("mh_native"),
      expr("""transform(sequence(0, 15), k -> array_min(transform(sids,
        x -> ((1103515245 + 12345 * k) * x + 748191 * k)
        % 1000000007)))""").as("mh_composed"),
      expr("simhash16(tids)").as("sh_native"),
      expr("""aggregate(sequence(0, 15), 0L, (acc, j) -> acc +
        IF(aggregate(tids, 0L, (a2, x) ->
          a2 + (shiftright(x, CAST(j AS INT)) % 2) * 2 - 1) > 0,
        shiftleft(1L, CAST(j AS INT)), 0L))""").as("sh_composed"))
    assert(both.filter(not($"mh_native" <=> $"mh_composed")).count() == 0)
    assert(both.filter(not($"sh_native" <=> $"sh_composed")).count() == 0)
  }

  test("lm_feature_ids equals the staged bigram composition") {
    val rows = Seq("a b c d", "solo", "", "  padded   tokens here ",
      "x y x y x", "ünï côdé tökens")
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val native = df.select($"id", explode(
        expr("lm_feature_ids(text, 65536)")).as("p"))
      .select($"id", $"p.pfid", $"p.bfid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val composed = df
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .withColumn("bg", explode(expr(
        """CASE WHEN size(toks) >= 2 THEN
          |  transform(sequence(0, size(toks) - 2),
          |    i -> concat(toks[i], ' ', toks[i+1]))
          |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)))
      .select($"id",
        expr("CAST(conv(substring(md5(split(bg, ' ')[0]), 1, 7), 16, 10)" +
          " AS BIGINT) % 65536").as("pfid"),
        expr("CAST(conv(substring(md5(bg), 1, 7), 16, 10) AS BIGINT)" +
          " % 65536").as("bfid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(native.toSeq.sorted == composed.toSeq.sorted)
    assert(native.nonEmpty)
  }
}

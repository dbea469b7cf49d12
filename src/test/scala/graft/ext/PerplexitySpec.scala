package graft.ext

import graft.SparkSpec
import graft.functions.FixedPointMath
import org.apache.spark.sql.functions.col

/** CCNet-style perplexity filtering: brute-force model equality on
  * random corpora, the head/middle/tail threshold contract, and the
  * train/apply split on a foreign corpus. */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private val B = 65536

  private def fid(s: String): Long =
    graft.functions.TextHashes.md5Prefix7(s) % B

  /** Driver-side mirror of the whole scoring pipeline. */
  private def bruteScores(rows: Seq[(Long, String, Boolean)])
  : Map[Long, (Long, Long, Long)] = {
    def positions(t: String): Seq[(Long, Long)] = {
      val toks = t.trim.split("\\s+", -1).toSeq
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map { p =>
        (fid(p.head), fid(p.mkString(" ")))
      }.toSeq
    }
    val tgt = rows.filter(_._3).flatMap(r => positions(r._2))
    val bc = tgt.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pc = tgt.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    rows.flatMap { case (id, t, _) =>
      val ps = positions(t)
      if (ps.isEmpty) None
      else {
        val bits = ps.map { case (p, b) =>
          val pFp = math.max(1L, math.min((1L << 30) - 1,
            ((1L << 30) * (bc.getOrElse(b, 0L) + 1)) /
              (pc.getOrElse(p, 0L) + B)))
          (30L << 16) - FixedPointMath.flog2(pFp)
        }.sum
        Some(id -> ((ps.size.toLong, bits, bits / ps.size)))
      }
    }.toMap
  }

  test("perplexityScore matches the brute-force model on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.chooseNum(0, 10).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(25, Gen.zip(doc, Gen.oneOf(true, false)))
    (1 to 3).foreach { seed =>
      val rows = corpusGen(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((t, tgt), i) => (i.toLong, t, tgt) }
      val df = rows.toDF("id", "text", "is_t")
      val (bcT, pcT) = TextAnalysis.bigramLmTables(df, col("is_t"))
      val got = TextAnalysis.perplexityScore(df, "id", bcT, pcT)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val expect = bruteScores(rows)
      assert(got == expect, s"seed=$seed")
    }
  }

  test("head/middle/tail cut at the smallest value thresholds " +
    "covering 1/3 and 2/3 of scored docs") {
    // bpt values spread so the thirds are unambiguous: target docs
    // see their own bigrams (cheap), foreign docs miss (expensive)
    val rows = (0 until 9).map { i =>
      val t =
        if (i < 3) "a b a b a b"
        else if (i < 6) "a b x" + i // shares one cheap bigram
        else s"z$i w$i z$i"         // fully unseen
      (i.toLong, t, i < 3)
    }
    val df = rows.toDF("id", "text", "is_t")
    val out = TextAnalysis
      .perplexityBuckets(df, "id", col("is_t"))
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.length == 9)
    val byBucket = out.groupBy(_._5).view.mapValues(_.map(_._4).toSet).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // bucket thresholds: every head bpt < every middle bpt < every
    // tail bpt (value cuts — equal values can never straddle buckets)
    assert(byBucket("head").max < byBucket("middle").min)
    assert(byBucket("middle").max < byBucket("tail").min)
    // value-threshold contract vs a driver-side replay
    val bpts = out.map(_._4).sorted
    val n = bpts.length
    val distinct = bpts.distinct
    def cum(v: Long) = bpts.count(_ <= v).toLong
    val t1 = distinct.find(v => cum(v) * 3 >= n).get
    val t2 = distinct.find(v => cum(v) * 3 >= 2L * n).get
    out.foreach { case (_, _, _, bpt, bucket) =>
      val expect =
        if (bpt <= t1) "head" else if (bpt <= t2) "middle" else "tail"
      assert(bucket == expect, s"bpt=$bpt")
    }
  }

  test("train/apply: a fully foreign corpus scores the smoothing " +
    "floor exactly") {
    val train = Seq((1L, "a b c", true)).toDF("id", "text", "is_t")
    val (bcT, pcT) = TextAnalysis.bigramLmTables(train, col("is_t"))
    // unseen features: p = (2^30·1) div (0 + 2^16) = 2^14 exactly,
    // so each position costs (30−14)·2^16 bits
    val foreign = Seq((10L, "qq rr ss")).toDF("id", "text")
    val r = TextAnalysis.perplexityScore(foreign, "id", bcT, pcT)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((10L, 2L, 2L * (16L << 16), 16L << 16)))
  }

  test("perplexityFilterStreamToTable curates a stream with a " +
    "trained model and an absolute cutoff") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("pplout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pplck").toString
    // offline fit on target prose; cutoff between seen and unseen
    val ref = Seq((1L, "good clean text flows well", true))
      .toDF("id", "text", "t")
    val model = TextAnalysis.bigramLmTables(ref, col("t"))
    // with count-1 Laplace smoothing a seen bigram costs just over
    // 15 bits (p = 2^31/(1+2^16) ≈ 2^15^-) and a fully unseen one
    // exactly 16 (the smoothing floor) — cut at 15.5 bits/token
    val cut = 31L << 15
    val arriving = Seq((10L, "good clean text"), (11L, "zz qq ww"),
      (12L, "solo"), (13L, "clean text flows"))
    val mem = MemoryStream[(Long, String)]
    val q = TextAnalysis.perplexityFilterStreamToTable(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text", () => model,
      cut, out, ckpt)
    try {
      mem.addData(arriving.take(2): _*); q.processAllAvailable()
      mem.addData(arriving.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val kept = graft.sink.CdcTable.read(spark, out)
      .select("doc_id").as[Long].collect().toSet
    // batch-path mirror selects the identical set; unscorable doc 12
    // and over-cutoff doc 11 are gone
    val mirror = TextAnalysis.perplexityScore(
        arriving.toDF("doc_id", "text"), "doc_id",
        model._1, model._2)
      .filter(col("bpt_fp") <= cut)
      .select("id").as[Long].collect().toSet
    assert(kept == mirror && kept == Set(10L, 13L),
      s"stream $kept vs batch $mirror")
  }

  test("docs without bigrams are absent from the scored set") {
    val df = Seq((1L, "solo", false), (2L, "a b", true))
      .toDF("id", "text", "is_t")
    val (bcT, pcT) = TextAnalysis.bigramLmTables(df, col("is_t"))
    val ids = TextAnalysis.perplexityScore(df, "id", bcT, pcT)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }
}

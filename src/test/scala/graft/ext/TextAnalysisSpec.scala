package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, expr}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat and the dog of the house"),
    (2L, "el gato y la casa el perro la"),
    (3L, "x y z w")).toDF("id", "text")

  test("token count, word hits, quality score") {
    val r = docs.select($"id",
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.wordHits($"text", "the").as("the_hits"),
      TextAnalysis.qualityScore($"text").as("q"))
      .as[(Long, Int, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 8 && r(1L)._3 == 3L)
    assert(r(1L)._4 > 0.4 && r(3L)._4 == 0.0)
  }

  test("language id picks marker-dominant language") {
    val r = docs.select($"id",
      TextAnalysis.languageId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "en" && r(2L) == "es" && r(3L) == "und")
  }

  test("importanceScores: fixed-point DSIR surrogate, exact by hand") {
    // bigram position counts: "a b" tc=2 bc=1, "b a" tc=1 bc=0,
    // "b c" tc=0 bc=1 → weights (1e6·(tc+1)) div (tc+bc+2):
    // 600000, 666666, 333333; doc 3 has no bigrams → scores 0
    val docs = Seq(
      (1L, "a b a b", true),
      (2L, "a b c", false),
      (3L, "x", false)).toDF("id", "text", "is_en")
    val r = TextAnalysis.importanceScores(docs, "id", col("is_en"))
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r.size == 3, "every input row scored")
    assert(r(1L) == ((1L, 3L, 1866666L, 1866666.0 / 3 / 1e6)))
    assert(r(2L) == ((2L, 2L, 933333L, 933333.0 / 2 / 1e6)))
    assert(r(3L) == ((3L, 0L, 0L, 0.0)))
  }

  test("importanceScores matches a brute-force model on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny vocabulary forces genuine cross-doc bigram collisions
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.chooseNum(0, 10).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(25, Gen.zip(doc, Gen.oneOf(true, false)))
    def fid(bg: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString.take(7), 16) % 65536
    }
    (1 to 4).foreach { seed =>
      val rows = corpusGen(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = rows.zipWithIndex
        .map { case ((t, tgt), i) => (i.toLong, t, tgt) }
        .toDF("id", "text", "is_t")
      val got = TextAnalysis.importanceScores(df, "id", col("is_t"))
        .as[(Long, Long, Long, Double)].collect()
        .map(x => x._1 -> ((x._2, x._3))).toMap
      val feats = rows.zipWithIndex.map { case ((t, tgt), i) =>
        val toks = t.trim.split("\\s+", -1).toSeq
        val fs = if (toks.length >= 2)
          toks.sliding(2).map(_.mkString(" ")).map(fid).toSeq
        else Seq.empty[Long]
        (i.toLong, tgt, fs)
      }
      val tc = feats.filter(_._2).flatMap(_._3)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bc = feats.filterNot(_._2).flatMap(_._3)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      def w(f: Long): Long =
        (1000000L * (tc.getOrElse(f, 0L) + 1)) /
          (tc.getOrElse(f, 0L) + bc.getOrElse(f, 0L) + 2)
      feats.foreach { case (id, _, fs) =>
        val expect = (fs.size.toLong, fs.map(w).sum)
        assert(got(id) == expect,
          s"seed=$seed doc=$id got=${got(id)} expect=$expect fs=$fs")
      }
    }
  }

  test("importanceScores: NULL target flag counts as background") {
    val docs = Seq(
      (1L, "p q", Some(true)),
      (2L, "p q", None: Option[Boolean])).toDF("id", "text", "is_en")
    // "p q": tc=1, bc=1 (the NULL row) → w = 2e6 div 4 = 500000
    val r = TextAnalysis.importanceScores(docs, "id", col("is_en"))
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(r(1L) == 500000L && r(2L) == 500000L)
  }

  test("importanceFilterStreamToTable curates a stream with trained weights") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("dsirout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dsirck").toString
    // offline fit: target prose vs junk
    val ref = Seq((1L, "good clean text", true), (2L, "bad noisy junk", false))
      .toDF("id", "text", "t")
    val w = TextAnalysis.importanceWeightTable(ref, col("t"))
    val arriving = Seq((10L, "good clean text"), (11L, "bad noisy junk"),
      (12L, "wholly unseen vocabulary"), (13L, "good clean junk"))
    val mem = MemoryStream[(Long, String)]
    val q = TextAnalysis.importanceFilterStreamToTable(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text", () => w,
      out, ckpt)
    try {
      mem.addData(arriving.take(2): _*); q.processAllAvailable()
      mem.addData(arriving.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val kept = graft.sink.CdcTable.read(spark, out)
      .select("doc_id").as[Long].collect().toSet
    // acceptance is a pure function of (id, trained weights): the
    // batch-path mirror must select the identical set
    val mirror = Sampling.importanceResample(
      TextAnalysis.scoreWithWeights(
        arriving.toDF("doc_id", "text"), "doc_id", w),
      "id", "importance").select("id").as[Long].collect().toSet
    assert(kept == mirror, s"stream $kept vs batch $mirror")
    // spot the scores the cut was judged against: target-like 0.666…,
    // junk-like 0.333…, unseen vocabulary neutral 0.5
    val imp = TextAnalysis.scoreWithWeights(
        arriving.toDF("doc_id", "text"), "doc_id", w)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(imp(10L) == 1333332L && imp(11L) == 666666L &&
      imp(12L) == 1000000L, imp.toString)
  }

  test("fingerprints and rolling hash are deterministic and order-sensitive") {
    val a = Seq(("w1 w2 w3", "w3 w2 w1")).toDF("t1", "t2")
      .select(TextAnalysis.rollingHash(col("t1")).as("h1"),
        TextAnalysis.rollingHash(col("t2")).as("h2"),
        TextAnalysis.fingerprint60(col("t1")).as("f1"))
      .collect()(0)
    assert(a.getLong(0) != a.getLong(1), "order matters")
    assert(a.getLong(2) > 0)
  }

  test("dfPrune removes boilerplate tokens, preserves order") {
    // 'boiler' is in 4/5 docs (≥ 3/4 threshold); every other token is rare
    val docs = Seq(
      (1L, "alpha boiler beta"), (2L, "boiler gamma"),
      (3L, "delta epsilon boiler"), (4L, "boiler"),
      (5L, "zeta eta")).toDF("doc_id", "text")
    val out = TextAnalysis.dfPrune(docs, "text", num = 3, den = 4)
      .select("doc_id", "cleaned").as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta", "order preserved, boiler gone")
    assert(out(2L) == "gamma" && out(3L) == "delta epsilon")
    assert(out(4L) == "", "all-boilerplate doc empties")
    assert(out(5L) == "zeta eta", "untouched doc unchanged")
    // below-threshold corpus: nothing removed
    val none = TextAnalysis.dfPrune(docs, "text", num = 99, den = 100)
      .select("doc_id", "cleaned").as[(Long, String)].collect().toMap
    assert(none(2L) == "boiler gamma")
    intercept[IllegalArgumentException] {
      TextAnalysis.dfPrune(docs, "text", num = 5, den = 4)
    }
  }

  test("tfIdfTop ranks rare-but-frequent terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "apple apple apple the the"),
      (2L, "banana the cherry the mango"),
      (3L, "the cherry cherry kiwi plum")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tfIdfTop(docs, "text", "doc_id", k = 2)
      .select("id", "tok", "rn").as[(Long, String, Long)]
      .collect().groupBy(_._1)
      .view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // "apple": tf=3, df=1 → score 9; "the": tf=2, df=3 → score 2
    assert(r(1L) == Seq("apple", "the"))
    // doc 2 singletons: banana/mango (df=1, score 3) beat cherry
    // (df=2, score 1.5) and "the" (df=3); alphabetical tie-break
    assert(r(2L) == Seq("banana", "mango"))
    // doc 3: cherry tf=2 df=2 → 3; kiwi/plum df=1 → 3; tie broken
    // alphabetically: cherry, kiwi
    assert(r(3L) == Seq("cherry", "kiwi"))
  }

  test("bpePairCounts counts adjacent pairs with multiplicity") {
    val docs = Seq(
      (1L, "a b a b c"), // pairs: "a b" ×2, "b a", "b c"
      (2L, "a b"),       // "a b"
      (3L, "solo")       // no pairs
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(r("a b") == 3L && r("b a") == 1L && r("b c") == 1L)
    assert(r.size == 3)
  }

  test("bigramCoverage: supported positions over total, NULL under 2 " +
      "tokens") {
    // "a b" occurs in docs 1,2,3 (df 3 ≥ minDf) — every other bigram
    // is rarer, so only "a b" positions count as covered
    val docs = Seq(
      (1L, "a b c a b"),  // bigrams: a-b, b-c, c-a, a-b → 2 of 4 covered
      (2L, "a b x"),      // a-b, b-x → 1 of 2
      (3L, "a b"),        // a-b → 1 of 1
      (4L, "q r s"),      // none covered → 0 of 2
      (5L, "solo")        // < 2 tokens → NULL coverage
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramCoverage(docs, "doc_id", "text", minDf = 3)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 4L, 2L, Some(0.5))))
    assert(r(2L) == ((2L, 2L, 1L, Some(0.5))))
    assert(r(3L) == ((3L, 1L, 1L, Some(1.0))))
    assert(r(4L) == ((4L, 2L, 0L, Some(0.0))))
    assert(r(5L) == ((5L, 0L, 0L, None)))
  }

  test("bm25TopK ranks by term relevance; zero-hit docs are absent") {
    val docs = Seq(
      (1L, "spark spark spark join"),      // high tf on a query term
      (2L, "spark filter"),                // one hit, short doc
      (3L, "filter scan sort group"),      // no query terms
      (4L, "spark join " + Seq.fill(60)("pad").mkString(" ")) // hits diluted by length
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(docs, "doc_id", "text", "spark join", 10)
      .select("id", "n_terms_hit").as[(Long, Long)].collect()
    // doc 3 has no query terms → absent
    assert(r.map(_._1).toSet == Set(1L, 2L, 4L))
    // doc 1 (2 terms, high tf, short) outranks doc 4 (2 terms, long)
    // which needs dl-normalization to lose despite equal term count
    assert(r.head._1 == 1L)
    assert(r.map(_._1).indexOf(4L) > r.map(_._1).indexOf(1L))
    assert(r.find(_._1 == 1L).get._2 == 2L) // both terms hit
    // deterministic: rerun bit-identical
    val r2 = TextAnalysis.bm25TopK(docs, "doc_id", "text", "spark join", 10)
      .select("id", "score_fp").as[(Long, Long)].collect()
    val r3 = TextAnalysis.bm25TopK(docs.repartition(5), "doc_id", "text",
      "spark join", 10)
      .select("id", "score_fp").as[(Long, Long)].collect()
    assert(r2.toSeq == r3.toSeq)
  }

  test("bm25 term filter is literal-safe: backslash and quote terms") {
    // advisor r10: the old string-interpolated `tok IN ('...')` broke
    // on backslashes (Spark SQL escape char); isin takes terms as data
    val docs = Seq(
      (1L, """c:\temp\x o'brien match"""),
      (2L, "plain filler text")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        """c:\temp\x o'brien""", 10)
      .select("id", "n_terms_hit").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 2L)), s"got ${r.toSeq}")
  }

  test("rrfFuse: both-ranker ids beat single-ranker ids, exact scores") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rnk")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("id", "rnk")
    val r = TextAnalysis.rrfFuse(Seq(a, b), "id", "rnk", k = 10)
      .select("id", "n_rankers", "rrf_fp")
      .as[(Long, Long, Long)].collect()
    // 20 appears in both rankers (ranks 2 and 1) and must lead
    assert(r.head._1 == 20L && r.head._2 == 2L)
    assert(r.head._3 ==
      math.round(1e12 / 62) + math.round(1e12 / 61))
    // singles ordered by their own rank: 10 (r1) > 40 (r2) > 30 (r3)
    assert(r.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L))
  }

  test("tokenEntropy matches a driver-side fixed-point reference") {
    val corpus = Seq(
      (1L, "a a a a a a"), // one type: entropy exactly 0
      (2L, "a b c d"), // uniform: entropy exactly flog2(4)
      (3L, "the cat and the dog of the house"),
      (4L, "x"), // single token
      (5L, "a a b b b c d d d d")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(corpus, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    val expect = Seq(
      (1L, "a a a a a a"), (2L, "a b c d"),
      (3L, "the cat and the dog of the house"), (4L, "x"),
      (5L, "a a b b b c d d d d")).map { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val cnt = toks.groupBy(identity).map(_._2.size.toLong)
      val n = toks.size.toLong
      import graft.functions.FixedPointMath.flog2
      val num = cnt.map(c => c * flog2(c)).sum
      id -> ((id, n, cnt.size.toLong, 65536L * cnt.size / n,
        flog2(n) - num / n))
    }.toMap
    assert(got == expect)
    assert(got(1L)._5 == 0L) // fully repetitive → 0 bits
    assert(got(2L)._5 == graft.functions.FixedPointMath.flog2(4L)) // uniform
    assert(got(4L)._5 == 0L)
    // repetitive doc scores strictly below the diverse one
    assert(got(1L)._5 < got(3L)._5)
  }

  test("ngramNovelty: unique shingles counted exactly; short docs drop") {
    val corpus = Seq(
      (1L, "a b c d"), // shingles: "a b c" (shared), "b c d" (unique)
      (2L, "a b c e"), // shingles: "a b c" (shared), "b c e" (unique)
      (3L, "x y")) // < 3 tokens: no shingles, unscorable
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(corpus, "doc_id")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((1L, 2L, 1L, 500000L)))
    assert(got(2L) == ((2L, 2L, 1L, 500000L)))
  }

  test("skipgramPairs: distance-bounded ordered pairs, exact counts") {
    val corpus = Seq((1L, "a b c"), (2L, "a b a")).toDF("doc_id", "text")
    val got = TextAnalysis.skipgramPairs(corpus, window = 2)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // "a b c": (a,b)(b,a)(b,c)(c,b) at d=1, (a,c)(c,a) at d=2
    // "a b a": both adjacencies emit (a,b) AND (b,a) → 2 each;
    //          (a,a) twice at d=2 — so (a,b)/(b,a) total 3
    assert(got == Map(
      ("a", "b") -> 3L, ("b", "a") -> 3L, ("b", "c") -> 1L,
      ("c", "b") -> 1L, ("a", "c") -> 1L, ("c", "a") -> 1L,
      ("a", "a") -> 2L))
    // window=1 drops the distance-2 pairs
    val w1 = TextAnalysis.skipgramPairs(corpus, window = 1)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(!w1.contains(("a", "c")) && !w1.contains(("a", "a")))
    assert(w1(("a", "b")) == 3L)
  }

  test("lexical index probe equals the full-scan BM25, partition-pruned") {
    val corpus = Seq(
      (1L, "spark joins hash tables fast"),
      (2L, "hash join beats nested loops"),
      (3L, "sort merge join for big tables"),
      (4L, "unrelated prose about gardens"),
      (5L, "hash hash hash join")).toDF("doc_id", "text")
    val idx = tmpDir("lexidx")
    TextAnalysis.writeLexicalIndex(corpus, idx, "doc_id", buckets = 8)
    val probe = TextAnalysis.probeLexical(spark, idx, "hash join", k = 3)
    val full = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      "hash join", k = 3)
    assert(probe.collect().toSeq == full.collect().toSeq,
      "index probe must reproduce the full scan bit for bit")
    // the scan is partition-pruned to the query terms' buckets
    val scan = probe.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("tbucket"),
      s"probe must prune posting partitions, got: $scan")
    // driver-side bucket mirror matches what the write produced
    val buckets = spark.read.parquet(s"$idx/postings")
      .select("tok", "tbucket").distinct()
      .as[(String, Long)].collect()
    buckets.foreach { case (tok, tb) =>
      assert(TextAnalysis.tokenBucketOf(tok, 8) == tb, tok)
    }
  }

  test("incremental lexical index: batched arrival ≡ full scan, " +
      "replay-safe, bucket-pruned") {
    val corpus = Seq(
      (1L, "spark joins hash tables fast"),
      (2L, "hash join beats nested loops"),
      (3L, "sort merge join for big tables"),
      (4L, "unrelated prose about gardens"),
      (5L, "hash hash hash join")).toDF("doc_id", "text")
    val idx = tmpDir("lexinc")
    // three id-sliced exactly-once batches
    for (b <- 0 until 3)
      TextAnalysis.lexicalIndexAppend(
        corpus.filter($"doc_id" % 3 === b.toLong), idx, "doc_id",
        buckets = 8, txn = Some(("t", b.toLong)))
    val probe = TextAnalysis
      .probeLexicalTable(spark, idx, "hash join", k = 3, buckets = 8)
    val full = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
      "hash join", k = 3)
    assert(probe.collect().toSeq == full.collect().toSeq,
      "batch-sliced arrival must be invisible to the ranking")
    // crash replay: re-appending a committed batch changes nothing
    TextAnalysis.lexicalIndexAppend(
      corpus.filter($"doc_id" % 3 === 1L), idx, "doc_id",
      buckets = 8, txn = Some(("t", 1L)))
    assert(TextAnalysis.probeLexicalTable(spark, idx, "hash join",
        k = 3, buckets = 8).collect().toSeq ==
      full.collect().toSeq, "replayed batch double-counted df/totals")
    // manifest-level pruning: the probe plans fewer posting files
    // than the whole table holds
    val allFiles = graft.sink.CdcTable
      .read(spark, s"$idx/postings").inputFiles.length
    val probedFiles = TextAnalysis.probeLexicalTable(spark, idx,
      "hash join", k = 3, buckets = 8).inputFiles.length
    assert(probedFiles < allFiles,
      s"bucket pruning must drop files: $probedFiles vs $allFiles")
  }

  test("compactLexicalIndex: probe invariant, fewer files, appends " +
      "and replays still work after the fold") {
    val corpus = Seq(
      (1L, "spark joins hash tables fast"),
      (2L, "hash join beats nested loops"),
      (3L, "sort merge join for big tables"),
      (4L, "unrelated prose about gardens"),
      (5L, "hash hash hash join")).toDF("doc_id", "text")
    val idx = tmpDir("lexcmp")
    for (b <- 0 until 3)
      TextAnalysis.lexicalIndexAppend(
        corpus.filter($"doc_id" % 3 === b.toLong), idx, "doc_id",
        buckets = 8, txn = Some(("t", b.toLong)))
    val before = TextAnalysis
      .probeLexicalTable(spark, idx, "hash join", k = 3, buckets = 8)
      .collect().toSeq
    val filesBefore = graft.sink.CdcTable
      .read(spark, s"$idx/postings").inputFiles.length
    // the SQL surface routes the lexical root to the lexical fold
    val r = spark.sql(s"GRAFT COMPACT INDEX '$idx'")
      .as[(Long, Long)].collect().head
    assert(r._1 >= 3, s"3 batch commits to fold, saw ${r._1}")
    val filesAfter = graft.sink.CdcTable
      .read(spark, s"$idx/postings").inputFiles.length
    assert(filesAfter < filesBefore,
      s"fold must shrink the file set: $filesAfter vs $filesBefore")
    assert(graft.sink.CdcTable.read(spark, s"$idx/totals").count() == 1,
      "totals fold to one row")
    assert(TextAnalysis.probeLexicalTable(spark, idx, "hash join",
        k = 3, buckets = 8).collect().toSeq == before,
      "compaction must be ranking-invariant")
    // a replayed pre-fold batch is STILL deduped (txn marks survive
    // the replace as stubs) and a genuinely new batch still lands
    TextAnalysis.lexicalIndexAppend(
      corpus.filter($"doc_id" % 3 === 1L), idx, "doc_id",
      buckets = 8, txn = Some(("t", 1L)))
    assert(TextAnalysis.probeLexicalTable(spark, idx, "hash join",
        k = 3, buckets = 8).collect().toSeq == before,
      "replayed batch double-counted after compaction")
    val extra = Seq((6L, "another hash join document")).toDF("doc_id", "text")
    TextAnalysis.lexicalIndexAppend(extra, idx, "doc_id",
      buckets = 8, txn = Some(("t", 3L)))
    val after = TextAnalysis.bm25TopK(
      corpus.union(extra), "doc_id", "text", "hash join", k = 3)
    assert(TextAnalysis.probeLexicalTable(spark, idx, "hash join",
        k = 3, buckets = 8).collect().toSeq == after.collect().toSeq,
      "post-fold append must rank identically to the full scan")
  }

  test("blocklistFilter counts whole-token hits case-insensitively") {
    val docs = Seq(
      (1L, "clean prose about gardens"),
      (2L, "the BAD word appears"),        // case-insensitive hit
      (3L, "bad bad badly"),               // 2 hits; no substring match
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis
      .blocklistFilter(docs, "doc_id", Seq("bad", "worse"))
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> t).toMap
    assert(got(1L) == ((1L, 0L, true)))
    assert(got(2L) == ((2L, 1L, false)))
    assert(got(3L) == ((3L, 2L, false)), "badly must NOT match 'bad'")
    assert(got(4L) == ((4L, 0L, true)))
    // scan-shape: no join, no shuffle
    val p = TextAnalysis.blocklistFilter(docs, "doc_id", Seq("bad"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Exchange"), p.take(300))
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistFilter(docs, "doc_id", Seq.empty)
    }
  }

  test("pmiCollocations surfaces a planted collocation, exact score") {
    // "zig zag" always co-occur; filler tokens are common everywhere
    val docs = (1L to 30L).map { i =>
      (i, s"zig zag the of and to the of and to w$i x$i")
    }.toDF("doc_id", "text")
    val got = TextAnalysis
      .pmiCollocations(docs, window = 1, minCount = 5, k = 4)
      .as[(String, String, Long, Long)].collect()
    assert(got.nonEmpty)
    val top = got.head
    assert(Set(top._1, top._2) == Set("zig", "zag"),
      s"planted collocation must rank first: ${got.toSeq}")
    // exact fixed-point check against a driver computation
    import graft.functions.FixedPointMath.flog2
    val pairs = TextAnalysis.skipgramPairs(docs, window = 1)
      .as[(String, String, Long)].collect()
    val n = pairs.map(_._3).sum
    val m = pairs.groupBy(_._1).map { case (t, g) => t -> g.map(_._3).sum }
    val expect = flog2(top._3 * n) - flog2(m(top._1) * m(top._2))
    assert(top._4 == expect)
  }

  test("stupidBackoff matches a brute-force JVM model on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.functions.FixedPointMath.flog2
    val pen = flog2(5L) - 65536L
    // tiny vocabulary forces real trigram/bigram hits AND misses
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.chooseNum(0, 9).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    (1 to 4).foreach { seed =>
      val rows = Gen.listOfN(20, doc)(Gen.Parameters.default,
        Seed(seed.toLong)).get.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val toksOf = rows.map { case (i, t) =>
        i -> t.trim.split("\\s+", -1).toSeq }.toMap
      def grams(n: Int): Map[String, Long] = toksOf.values.toSeq
        .flatMap(ts => if (ts.length >= n)
          ts.sliding(n).map(_.mkString(" ")).toSeq else Nil)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (uc, bc, tc) = (grams(1), grams(2), grams(3))
      val n = uc.values.sum
      val got = TextAnalysis
        .stupidBackoff(rows.toDF("id", "text"), "id")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      rows.foreach { case (id, _) =>
        val ts = toksOf(id)
        val bits = (2 until ts.length).map { i =>
          val k3 = s"${ts(i - 2)} ${ts(i - 1)} ${ts(i)}"
          val k2 = s"${ts(i - 1)} ${ts(i)}"
          if (tc.contains(k3))
            (0, flog2(bc(s"${ts(i - 2)} ${ts(i - 1)}")) - flog2(tc(k3)))
          else if (bc.contains(k2))
            (1, pen + flog2(uc(ts(i - 1))) - flog2(bc(k2)))
          else
            (2, 2 * pen + flog2(n) -
              flog2(math.max(uc.getOrElse(ts(i), 0L), 1L)))
        }
        val np = bits.size.toLong
        val expect = (id, np,
          bits.count(_._1 == 0).toLong, bits.count(_._1 == 1).toLong,
          bits.count(_._1 == 2).toLong, bits.map(_._2).sum,
          if (np > 0) bits.map(_._2).sum / np else 0L)
        assert(got(id) == expect,
          s"seed=$seed doc=$id got=${got(id)} expect=$expect toks=$ts")
      }
    }
  }

  test("stupidBackoffScore: short docs score 0/0 and a foreign " +
      "corpus backs off to count-1 singletons") {
    val train = Seq((1L, "a b c a b c")).toDF("id", "text")
    val (u, b, t) = TextAnalysis.stupidBackoffTables(train)
    // "z z z": no trigram/bigram/unigram hit → per position
    // 2·pen + flog2(N) − flog2(1); N = 6
    import graft.functions.FixedPointMath.flog2
    val pen = flog2(5L) - 65536L
    val r = TextAnalysis.stupidBackoffScore(
      Seq((1L, "a b"), (2L, "z z z")).toDF("id", "text"), "id",
      u, b, t)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, 0L, 0L, 0L, 0L, 0L, 0L)))
    val perPos = 2 * pen + flog2(6L)
    assert(r(2L) == ((2L, 1L, 0L, 0L, 1L, perPos, perPos)))
  }

  test("lmCounts: batched arrival ≡ full-scan model, replay-idempotent, " +
      "compact folds to one row per gram") {
    val corpus = Seq((1L, "a b c a b"), (2L, "b c a"), (3L, "c c c c"),
      (4L, "a"), (5L, "")).toDF("id", "text")
    val tbl = tmpDir("lmtbl")
    (0 until 2).foreach { b =>
      TextAnalysis.lmCountsAppend(
        corpus.filter(col("id") % 2 === b), tbl,
        txn = Some(("t", b.toLong)))
    }
    // replay: same txn, counts must not double
    TextAnalysis.lmCountsAppend(
      corpus.filter(col("id") % 2 === 0), tbl, txn = Some(("t", 0L)))
    def model(u: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame,
        t: org.apache.spark.sql.DataFrame) =
      (u.as[(String, Long)].collect().toSet,
        b.as[(String, Long)].collect().toSet,
        t.as[(String, Long)].collect().toSet)
    val (fu, fb, ft) = TextAnalysis.stupidBackoffTables(corpus)
    val full = model(fu, fb, ft)
    val pre = TextAnalysis.lmCountsRead(spark, tbl)
    assert(model(pre._1, pre._2, pre._3) == full,
      "summed batch counts must equal the full-scan tables")
    // fold: one commit, one row per gram, model unchanged
    graft.ext.Dedup.compactIndex(spark, tbl)
    val post = TextAnalysis.lmCountsRead(spark, tbl)
    assert(model(post._1, post._2, post._3) == full,
      "the fold must not change the model")
    val eff = graft.sink.CdcTable.read(spark, tbl)
    assert(eff.count() ==
      eff.select("n_order", "gram").distinct().count(),
      "post-fold: one row per gram")
    // scoring through the incremental model = scoring the full model
    val (iu, ib, it) = TextAnalysis.lmCountsRead(spark, tbl)
    val inc = TextAnalysis.stupidBackoffScore(corpus, "id", iu, ib, it)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val direct = TextAnalysis.stupidBackoff(corpus, "id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(inc == direct)
  }

  test("lmCountsStreamToTable: crash replay cannot double a count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tbl = tmpDir("lmstream")
    val ckpt = tmpDir("lmstreamck")
    val mem = MemoryStream[(Long, String)]
    val q = TextAnalysis.lmCountsStreamToTable(
      mem.toDF.toDF("id", "text"), "text", tbl, ckpt)
    try {
      mem.addData((1L, "a b c"), (2L, "b c")); q.processAllAvailable()
      mem.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()
    // manual replay of batch 0's content under its txn marker: no-op
    TextAnalysis.lmCountsAppend(
      Seq((1L, "a b c"), (2L, "b c")).toDF("id", "text"), tbl,
      txn = Some(("graft-lm", 0L)))
    val (u, b, t) = TextAnalysis.lmCountsRead(spark, tbl)
    val (fu, fb, ft) = TextAnalysis.stupidBackoffTables(
      Seq((1L, "a b c"), (2L, "b c"), (3L, "c")).toDF("id", "text"))
    assert(u.as[(String, Long)].collect().toSet ==
      fu.as[(String, Long)].collect().toSet)
    assert(b.as[(String, Long)].collect().toSet ==
      fb.as[(String, Long)].collect().toSet)
    assert(t.as[(String, Long)].collect().toSet ==
      ft.as[(String, Long)].collect().toSet)
  }

  test("lmCountsCdfSync: the model tracks the table's CURRENT content " +
      "through DELETE/UPDATE/MERGE, any sync cadence, replay-safe") {
    import graft.sink.CdcTable
    def model(t3: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)) =
      (t3._1.as[(String, Long)].collect().toSet,
        t3._2.as[(String, Long)].collect().toSet,
        t3._3.as[(String, Long)].collect().toSet)
    val corpus = Seq((1L, "a b c a b"), (2L, "b c a"), (3L, "c c c c"),
      (4L, "a"), (5L, "zz top zz")).toDF("id", "text")
    def run(syncEvery: Boolean) = {
      val tbl = tmpDir(s"lmcdf_$syncEvery")
      val lm = tmpDir(s"lmcdf_lm_$syncEvery")
      def sync() = TextAnalysis.lmCountsCdfSync(spark, tbl, lm)
      CdcTable.append(corpus.filter(col("id") <= 3), tbl,
        partitionBy = Nil)
      if (syncEvery) sync()
      CdcTable.append(corpus.filter(col("id") > 3), tbl,
        partitionBy = Nil)
      if (syncEvery) sync()
      CdcTable.delete(spark, tbl, "id = 3", partitionBy = Nil)
      if (syncEvery) sync()
      CdcTable.update(spark, tbl, "id = 4",
        Seq("text" -> "'a d'"), partitionBy = Nil)
      if (syncEvery) sync()
      CdcTable.merge(spark, tbl,
        Seq((2L, "b c a q"), (9L, "q q")).toDF("id", "text"),
        Seq("id"), partitionBy = Nil)
      sync()
      assert(sync() == 0, "nothing unseen → no work")
      (tbl, lm)
    }
    val (tbl, lm) = run(syncEvery = true)
    val (_, lmOnce) = run(syncEvery = false)
    val truth = model(TextAnalysis.stupidBackoffTables(
      CdcTable.read(spark, tbl).select(col("id"), col("text"))))
    assert(model(TextAnalysis.lmCountsRead(spark, lm)) == truth,
      "CDF-synced model must equal training on the current content")
    assert(model(TextAnalysis.lmCountsRead(spark, lmOnce)) == truth,
      "sync cadence must not matter (abelian folds)")
    // 'c c c c' was deleted: its grams net to zero and leave the
    // model; the physical fold sheds the zero rows too
    assert(!model(TextAnalysis.lmCountsRead(spark, lm))._3
      .exists(_._1 == "c c c"), "retracted trigram must be gone")
    graft.ext.Dedup.compactIndex(spark, lm)
    assert(model(TextAnalysis.lmCountsRead(spark, lm)) == truth)
    assert(CdcTable.read(spark, lm).filter(col("cnt") === 0L).count()
      == 0L, "the fold sheds net-zero partials physically")
  }

  test("piiScrub: counts + sequential replacement, attribution order") {
    val docs = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org now"),
      (2L, "call 555-123-4567 or 555-000-1111"),
      (3L, "host 192.168.0.1 and 10.0.0.255"),
      // the phone-shaped digit run sits INSIDE an email: the email
      // pass scrubs it first, so n_phone must be 0
      (4L, "reach user555-123-4567@corp.example.com today"),
      (5L, "no pii here"),
      (6L, "")).toDF("id", "text")
    val r = TextAnalysis.piiScrub(docs, "id")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 2L, 0L, 0L, "mail <EMAIL> and <EMAIL> now")))
    assert(r(2L) == ((2L, 0L, 2L, 0L, "call <PHONE> or <PHONE>")))
    assert(r(3L) == ((3L, 0L, 0L, 2L, "host <IP> and <IP>")))
    assert(r(4L) == ((4L, 1L, 0L, 0L, "reach <EMAIL> today")))
    assert(r(5L) == ((5L, 0L, 0L, 0L, "no pii here")))
    assert(r(6L) == ((6L, 0L, 0L, 0L, "")))
  }

  test("langIdTrained: separates languages from counts alone; short " +
      "docs predict und; brute JVM reference agrees") {
    import graft.functions.FixedPointMath.flog2
    val corpus = Seq(
      (1L, "en", "the cat sat on the mat with the hat"),
      (2L, "en", "the dog and the cat ran to the house"),
      (3L, "es", "el gato corre por la casa con el perro"),
      (4L, "es", "la casa del perro es grande y bonita"),
      (5L, "en", "xy"), // < 3 chars: no trigram
      (6L, "en", "the cat ran to the mat"),
      (7L, "es", "el perro corre a la casa")).toDF("id", "lang", "text")
    val model = TextAnalysis.charTrigramLangModel(corpus)
    val got = TextAnalysis.langIdTrained(corpus, "id", model)
      .as[(Long, Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(5L)._3 == "und" && got(5L)._2 == 0L && got(5L)._4 == 0L)
    // brute JVM reference: same Laplace-smoothed fixed-point bits
    val rows = corpus.as[(Long, String, String)].collect()
    def tris(t: String): Seq[String] =
      if (t.length < 3) Nil
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val mdl = rows.flatMap { case (_, l, t) => tris(t).map(l -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tl = mdl.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val v = mdl.keySet.map(_._2).size.toLong
    rows.filter(_._3.length >= 3).foreach { case (id, _, t) =>
      val scoresByLang = tl.keys.toSeq.sorted.map { l =>
        val bits = tris(t).map(tr =>
          flog2(tl(l) + v) - flog2(mdl.getOrElse((l, tr), 0L) + 1)).sum
        (bits, l)
      }
      val (bits, win) = scoresByLang.min
      assert(got(id)._3 == win && got(id)._4 == bits,
        s"doc $id got=${got(id)} expect=($win,$bits)")
    }
    // the separations hold: every training doc classifies to its lang
    rows.filter(_._3.length >= 3).foreach { case (id, l, _) =>
      assert(got(id)._3 == l, s"doc $id predicted ${got(id)._3}, is $l")
    }
  }

  test("chrF matches a brute JVM reference; repetition clips; " +
      "identical texts score 10^6; empty/short texts score 0") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"),       // identical
      (3L, "the cat cat cat sat"),                    // repetition
      (4L, "completely different words here"),
      (5L, ""), (6L, "ab")                            // degenerate
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 1L), (1L, 4L), (5L, 6L), (1L, 6L))
      .toDF("a_id", "b_id")
    val got = TextAnalysis.chrF(docs, pairs, "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // brute reference
    val txt = Map(1L -> "the cat sat", 2L -> "the cat sat",
      3L -> "the cat cat cat sat",
      4L -> "completely different words here", 5L -> "", 6L -> "ab")
      .view.mapValues(_.replaceAll("\\s+", "")).toMap
    def gramsOf(s: String, n: Int): Map[String, Long] =
      (0 to s.length - n).map(i => s.substring(i, i + n))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def ref(a: Long, b: Long): (Long, Long, Long, Long) = {
      var clipT = 0L; var sp = 0L; var sr = 0L
      for (n <- 1 to 6) {
        val (ga, gb) = (gramsOf(txt(a), n), gramsOf(txt(b), n))
        val clip = ga.map { case (g, c) =>
          math.min(c, gb.getOrElse(g, 0L)) }.sum
        clipT += clip
        sp += clip * 1000000L / math.max(txt(a).length - n + 1, 1)
        sr += clip * 1000000L / math.max(txt(b).length - n + 1, 1)
      }
      val (cp, cr) = (sp / 6, sr / 6)
      (clipT, cp, cr, 5 * cp * cr / math.max(4 * cp + cr, 1))
    }
    got.keys.foreach { case (a, b) =>
      val (ct, cp, cr, f) = ref(a, b)
      assert(got((a, b)) == ((a, b, ct, cp, cr, f)),
        s"pair ($a,$b): got ${got((a, b))}, expect ($ct,$cp,$cr,$f)")
    }
    assert(got((1L, 2L))._6 == 1000000L, "identical texts score 1.0")
    assert(got((5L, 6L))._6 == 0L, "empty candidate scores 0")
    // repetition clips: doc 3 repeats 'cat' 3x but doc 1 has it once
    assert(got((3L, 1L))._4 < got((1L, 2L))._4,
      "repeated grams must clip against the reference count")
  }

  test("langIdTrainedNative is bit-identical to the composed form, " +
      "including ties, misses, unicode and null text") {
    val train = Seq(
      (1L, "en", "the cat sat on the mat with the hat"),
      (2L, "en", "the dog and the cat ran to the house"),
      (3L, "es", "el gato corre por la casa con el perro"),
      (4L, "es", "la casa del perro es grande y bonita"),
      (6L, "de", "der hund läuft schnell durch größe straßen heute"),
      (7L, "el", "το σπίτι είναι μεγάλο και όμορφο σήμερα εδώ")
    ).toDF("id", "lang", "text")
    // scored frame ≠ training corpus: misses, ties, unicode, nulls
    val probe = Seq(
      (20L, "the cat ran to the house with the dog"),
      (21L, "el perro corre por la casa grande"),
      (22L, "xy"), // < 3 code points: und
      (23L, null), // null text: und
      (24L, "zzz qqq unseen trigrams only 😀😀😀 🎉🎉"),
      (25L, "aaa"), // every lang scores pure miss: tie → min name
      (26L, "the el der το mixed soup of all four languages"),
      (27L, "größe straßen σπίτι über ñandú 🎉 mixed planes")
    ).toDF("id", "text")
    val model = TextAnalysis.charTrigramLangModel(train)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toSeq).toSeq
    val composed = rows(
      TextAnalysis.langIdTrained(probe, "id", model))
    val native = rows(
      TextAnalysis.langIdTrainedNative(probe, "id", model))
    assert(native == composed,
      s"native:\n${native.mkString("\n")}\nvs composed:\n" +
        composed.mkString("\n"))
    // the all-miss doc ties across every language only if the
    // per-lang miss costs coincide; either way both forms agree and
    // the composed form's min(struct(bits, lang)) rule is the law
    val allMiss = native.find(_.head == 25L).get
    val composedMiss = composed.find(_.head == 25L).get
    assert(allMiss == composedMiss)
  }

  test("GraftSession registers tables + current views and answers SQL") {
    val base = tmpDir("gsess")
    val cfg = graft.streaming.CdcIngest.Config(base,
      checkpointDir = tmpDir("gsessck"))
    val now = System.currentTimeMillis()
    def env(op: String, id: String, x: Int, ts: Long) =
      s"""{"payload":{"_id":"$id","before":null,"after":
         |"{\\"_id\\":\\"$id\\",\\"x\\":$x}","op":"$op","ts_ms":$ts,
         |"source":{"version":"2.5","connector":"mongodb","name":"m",
         |"ts_ms":$ts,"snapshot":"false","db":"g","rs":"rs0",
         |"collection":"t","ord":1}}}""".stripMargin.replace("\n", "")
    graft.streaming.CdcIngest.processBatch(Seq(
      env("c", "a", 1, now), env("u", "a", 2, now + 1),
      env("c", "b", 3, now)).toDF("value"), cfg)
    val views = graft.query.GraftSession.register(spark, base)
    assert(views.contains("g_t") && views.contains("g_t_current"))
    val cur = graft.query.GraftSession.sql(spark, base,
      "SELECT _id, x FROM g_t_current ORDER BY _id")
      .as[(String, Long)].collect().toSeq
    assert(cur == Seq(("a", 2L), ("b", 3L)))
    assert(graft.query.GraftSession.sql(spark, base,
      "SELECT COUNT(*) FROM g_t").collect()(0).getLong(0) == 3L)
  }

  test("clippedNgramOverlap: multiset clipping, not set overlap") {
    val docs = Seq(
      // candidate repeats 'the cat' 3x; reference has it ONCE —
      // clipping credits the bigram once, set-Jaccard would too but
      // unigram 'the' must clip at min(3, 2) = 2
      (1L, "the cat the cat the cat"),
      (2L, "the cat sat on the mat"),
      (3L, "wholly different words here"),
      (4L, "the cat sat on the mat")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("a_id", "b_id")
    val got = TextAnalysis.clippedNgramOverlap(docs, pairs, "doc_id")
      .select($"a_id", $"b_id", $"tc1", $"tr1", $"clip1", $"tc2",
        $"tr2", $"clip2", $"p1_fp", $"r1_fp", $"f1_fp", $"p2_fp")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // cand 1: toks [the,cat]*3 → tc1=6; clip1: the→min(3,2)=2,
    // cat→min(3,1)=1 → 3; bigrams: 'the cat'×3 clip min(3,1)=1,
    // 'cat the'×2 clip 0 → clip2=1, tc2=5; ref 2 has 6 toks / 5
    // bigrams; F1(uni) = 2·3/(6+6) = 0.5 exactly
    assert(got((1L, 2L)) == ((1L, 2L, 6L, 6L, 3L, 5L, 5L, 1L,
      500000L, 500000L, 500000L, 200000L)))
    // disjoint texts: zero clip everywhere
    assert(got((3L, 2L)) ==
      ((3L, 2L, 4L, 6L, 0L, 3L, 5L, 0L, 0L, 0L, 0L, 0L)))
    // identical texts: perfect precision, recall, F1
    assert(got((2L, 4L)) == ((2L, 4L, 6L, 6L, 6L, 5L, 5L, 5L,
      1000000L, 1000000L, 1000000L, 1000000L)))
  }

  test("rougeL: token-level LCS with exact fixed-point P/R/F") {
    // LCS([w1 w2 w3 w4 w2 w1], [w2 w1 w3 w1 w4]) = 3 (w1 w3 w4)
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w2 w1"),
      (2L, "w2 w1 w3 w1 w4"),
      (3L, "w1 w2 w3 w4 w2 w1"), // identical to 1
      (4L, "zz yy")              // disjoint from 1
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a_id", "b_id")
    val got = TextAnalysis.rougeL(docs, pairs, "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t).toMap
    assert(got((1L, 2L)) == ((1L, 2L, 6L, 5L, 3L,
      500000L, 600000L, 545454L)), s"${got((1L, 2L))}")
    assert(got((1L, 3L)) == ((1L, 3L, 6L, 6L, 6L,
      1000000L, 1000000L, 1000000L)))
    assert(got((1L, 4L)) == ((1L, 4L, 6L, 2L, 0L, 0L, 0L, 0L)))
  }

  test("rougeL maxTokens: truncation ≡ pre-truncated texts; a bound " +
      "at or above every length is a no-op") {
    val long1 = (1 to 60).map(i => s"a$i").mkString(" ")
    val long2 = ((1 to 30).map(i => s"a$i") ++
      (1 to 30).map(i => s"b$i")).mkString(" ")
    val docs = Seq((1L, long1), (2L, long2)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val cut = TextAnalysis.rougeL(docs, pairs, "doc_id",
        maxTokens = 40)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    val pre = TextAnalysis.rougeL(
        docs.select($"doc_id", expr(
          "array_join(slice(split(text, ' '), 1, 40), ' ')")
          .as("text")),
        pairs, "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(cut == pre, s"$cut vs pre-truncated $pre")
    assert(cut._3 == 40L && cut._4 == 40L && cut._5 == 30L,
      s"40-token truncation, LCS = the 30 shared leading tokens: $cut")
    val noop = TextAnalysis.rougeL(docs, pairs, "doc_id",
        maxTokens = 1000)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    val full = TextAnalysis.rougeL(docs, pairs, "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(noop == full)
  }

  test("corpusBleu: perfect match scores log2 BLEU = 0; a zero " +
      "clipped count makes log BLEU NULL; brevity penalty kicks in " +
      "only when candidates run short") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    // identical candidate/reference: every p_n = 1e6, c = r → BP = 0
    val perfect = TextAnalysis.corpusBleu(docs,
      Seq((1L, 2L)).toDF("a_id", "b_id"), "doc_id")
      .collect().head
    assert(perfect.getAs[Long]("p1_fp") == 1000000L)
    assert(perfect.getAs[Long]("p4_fp") == 1000000L)
    assert(perfect.getAs[Long]("bp_neglog2_fp") == 0L)
    assert(perfect.getAs[Long]("bleu_log2_fp") == 0L)
    // disjoint texts: clip1 = 0 → log BLEU undefined (NULL), p = 0
    val nul = TextAnalysis.corpusBleu(docs,
      Seq((1L, 3L)).toDF("a_id", "b_id"), "doc_id")
      .collect().head
    assert(nul.getAs[Long]("p1_fp") == 0L)
    assert(nul.isNullAt(nul.fieldIndex("bleu_log2_fp")))
    // short candidate vs long reference: positive brevity penalty
    val short = Seq((10L, "w1 w2 w3"), (11L, "w1 w2 w3 w4 w5 w6"))
      .toDF("doc_id", "text")
    val bp = TextAnalysis.corpusBleu(short,
      Seq((10L, 11L)).toDF("a_id", "b_id"), "doc_id")
      .collect().head
    // −log2 BP = ((6−3)·94548) div 3 = 94548 (one full factor of e)
    assert(bp.getAs[Long]("bp_neglog2_fp") == 94548L)
    assert(bp.getAs[Long]("c_len") == 3L &&
      bp.getAs[Long]("r_len") == 6L)
  }
}

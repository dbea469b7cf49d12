package graft.ext

import graft.SparkSpec
import graft.sink.CdcTable
import org.apache.spark.sql.functions._

/** The ops compose: one end-to-end training-data pipeline over the
  * real documents table — normalize → boilerplate-prune → exact dedup
  * → quality filter → stratified split → sequence packing → graft
  * table — asserting determinism (two runs, identical result) and
  * sane cardinality at each stage. This is the workflow the operator
  * inventory exists to serve; the spec catches cross-op contract
  * drift (column names, staged-alias collisions, schema surprises)
  * that per-op specs can't. */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def runPipeline(): org.apache.spark.sql.DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
    // 1. normalize text (ws-collapse, lower, NFC)
    val normed = docs.withColumn("text",
      TextAnalysis.normalizeText(col("text")))
    // 2. document-frequency boilerplate pruning
    val pruned = TextAnalysis.dfPrune(normed, "text", num = 4, den = 5)
      .withColumn("text", col("cleaned"))
      .drop("toks", "kept", "cleaned")
    // 3. exact dedup on the normalized fingerprint
    val deduped = pruned
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("_rk") === 1).drop("_rk")
    // 4. quality filter: enough tokens survived pruning
    val kept = deduped
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .filter(col("n_tokens") >= 10)
    // 5. deterministic stratified split by language
    val split = Sampling.hashSplit(kept, "doc_id")
    // 6. pack the train split into 512-token sequences per source
    Sampling.sequencePack(split.filter(col("split") === "train"),
      "source", "doc_id", "n_tokens", budget = 512)
      .select("doc_id", "text", "lang", "source", "n_tokens",
        "split", "pack_id")
  }

  test("normalize→prune→dedup→filter→split→pack composes and is stable") {
    val a = runPipeline().orderBy("doc_id").collect()
    val b = runPipeline().orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "pipeline must be run-deterministic")
    assert(a.length > 20, s"pipeline kept ${a.length} docs")
    val total = graft.Tables(spark, dir, "documents").count()
    assert(a.length < total, "some documents must be filtered")
    // every kept doc has a pack assignment and positive token count
    assert(a.forall(r => r.getLong(r.fieldIndex("pack_id")) >= 0))
    assert(a.forall(r => r.getInt(r.fieldIndex("n_tokens")) >= 10))
  }

  test("curation ops compose: decontaminate → span-filter → sample") {
    val docs = graft.Tables(spark, dir, "documents")
    val eval = docs.filter(col("source") === "src0")
    val corpus = docs.filter(col("source") =!= "src0")
    def run() = {
      // 1. drop docs sharing any verbatim 4-gram with the eval set
      val flagged = Decontaminate
        .contaminated(corpus, eval, "text", "doc_id", n = 4)
        .select(col("id").as("doc_id"))
      val clean = corpus.join(flagged, Seq("doc_id"), "left_anti")
      // 2. drop docs dominated by cross-doc boilerplate spans
      val keep = Dedup.spanStats(clean, "text", "doc_id")
        .filter(col("keep_ratio") >= 0.9)
        .select(col("id").as("doc_id"))
      val spanClean = clean.join(keep, Seq("doc_id"), "left_semi")
      // 3. deterministic stratified sample of the survivors
      Sampling.stratifiedSample(spanClean, "lang", "doc_id",
        Map("en" -> 100), defaultPct = 50)
    }
    val a = run().select("doc_id").as[Long].collect().sorted.toSeq
    val b = run().select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "curation chain must be run-deterministic")
    assert(a.nonEmpty && a.length < corpus.count(),
      s"chain kept ${a.length} docs")
    // flagged docs can never survive the chain
    val flaggedIds = Decontaminate
      .contaminated(corpus, eval, "text", "doc_id", n = 4)
      .select(col("id")).as[Long].collect().toSet
    assert(a.forall(id => !flaggedIds.contains(id)))
  }

  test("curation composes: canonical dedup → perplexity gate → " +
    "DSIR resample → temp mix") {
    val docs = graft.Tables(spark, dir, "documents")
    def canonOf() = {
      // 1. near-dup clusters resolved to their best member; the other
      //    members drop
      val res = Dedup.near(docs, "text", "doc_id")
      val keepBest = Dedup.canonicalByQuality(res, docs,
        "doc_id", "n_chars")
      val losers = res.components
        .join(keepBest.select(col("kept_id").as("id")),
          Seq("id"), "left_anti")
        .select(col("id").as("doc_id"))
      docs.join(losers, Seq("doc_id"), "left_anti")
    }
    def run() = {
      val canon = canonOf()
      // 2. CCNet gate: drop the perplexity tail third
      val headMid = TextAnalysis.perplexityBuckets(canon, "doc_id",
          col("lang") === "en")
        .filter(col("ppl_bucket") =!= "tail")
        .select(col("id").as("doc_id"))
      val gated = canon.join(headMid, Seq("doc_id"), "left_semi")
      // 3. DSIR: score targetness vs the English subset, resample
      val kept = Sampling.importanceResample(
        TextAnalysis.importanceScores(gated, "doc_id",
          col("lang") === "en"),
        "id", "importance", boost = 2.0)
        .select(col("id").as("doc_id"))
      val curated = gated.join(kept, Seq("doc_id"), "left_semi")
      // 4. temperature-flatten the language mix
      Sampling.temperatureSample(curated, "lang", "doc_id",
        halvings = 1, headRate = 0.9)
    }
    val a = run().select("doc_id").as[Long].collect().sorted.toSeq
    val b = run().select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "curation pipeline is run-deterministic")
    assert(a.nonEmpty && a.size < docs.count(), s"kept ${a.size}")
    // cluster losers really are gone from the final mix
    val res = Dedup.near(docs, "text", "doc_id")
    val keptIds = Dedup.canonicalByQuality(res, docs, "doc_id", "n_chars")
      .select("kept_id").as[Long].collect().toSet
    val loserIds = res.components.select("id").as[Long].collect().toSet
      .diff(keptIds)
    assert(a.forall(id => !loserIds.contains(id)),
      "no near-dup cluster loser survives curation")
    // perplexity-tail docs (scored on the deduped corpus) are gone too
    val tailIds = TextAnalysis.perplexityBuckets(canonOf(), "doc_id",
        col("lang") === "en")
      .filter(col("ppl_bucket") === "tail")
      .select("id").as[Long].collect().toSet
    assert(tailIds.nonEmpty, "gate must have something to drop")
    assert(a.forall(id => !tailIds.contains(id)),
      "no perplexity-tail doc survives curation")
  }

  test("curation composes: leakage-safe split after dedup labeling") {
    val docs = graft.Tables(spark, dir, "documents")
    val res = Dedup.near(docs, "text", "doc_id")
    val split = Sampling.clusterSplit(docs, "doc_id", res.components)
    // 1. no near-dup cluster straddles the cut
    val straddling = split.groupBy("group_id")
      .agg(countDistinct(col("split")).as("nsp"))
      .filter(col("nsp") > 1).count()
    assert(straddling == 0, "a cluster crossed the train/test cut")
    // 2. every doc is assigned, exactly once
    assert(split.count() == docs.count())
    // 3. run-deterministic
    val a = split.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    val b = Sampling.clusterSplit(docs, "doc_id",
        Dedup.near(docs, "text", "doc_id").components)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // 4. the token-entropy gate composes on the train side: the
    //    most-repetitive docs it drops are gone from training
    val train = split.filter(col("split") === "train")
    val lowEntropy = TextAnalysis.tokenEntropy(train, "doc_id")
      .filter(col("entropy_fp") < 65536L) // < 1 bit/token
      .select(col("id").as("doc_id"))
    val gated = train.join(lowEntropy, Seq("doc_id"), "left_anti")
    assert(gated.count() + lowEntropy.count() == train.count())
  }

  test("curation composes: the top-fraction quality cut gates the mix") {
    // the FineWeb-Edu stage in place: score everything, keep exactly
    // the best half, then flatten the language mix — every survivor
    // of the full composition must be inside the cut's kept set, and
    // the cut itself is exact (⌈n/2⌉, not a rate that drifts)
    val docs = graft.Tables(spark, dir, "documents")
    val scored = docs.withColumn("score_fp",
      floor(TextAnalysis.qualityScore(col("text")) * 1e6).cast("long"))
    def cutOf() = Sampling.topFraction(scored, "score_fp", "doc_id", 1, 2)
    val n = scored.count()
    assert(cutOf().count() == (n + 1) / 2, "the cut is exact, not a rate")
    def run() = Sampling.temperatureSample(cutOf(), "lang", "doc_id",
        halvings = 1, headRate = 0.9)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val a = run()
    assert(a == run(), "cut + mix is run-deterministic")
    val cutIds = cutOf().select("doc_id").as[Long].collect().toSet
    assert(a.nonEmpty && a.forall(cutIds.contains),
      "nothing outside the quality cut survives to the mix")
  }

  test("curation composes: classifier gate → budget mix → shards") {
    // the discriminative-filter deployment shape: train the linear
    // probe on the corpus's own labels, keep the best-scoring half,
    // fill a token budget at mixture weights, shard the result
    val docs = graft.Tables(spark, dir, "documents")
    def run() = {
      val w = Classifier.train(docs, "doc_id", col("lang") === "en")
      val scored = docs.join(
        Classifier.score(docs, "doc_id", w)
          .select(col("id").as("doc_id"), col("score_fp")),
        Seq("doc_id"))
      val cut = Sampling.topFraction(scored, "score_fp", "doc_id", 1, 2)
      val toks = TextAnalysis.tokenCount(col("text")).cast("long")
      val total = cut.select(sum(toks).as("t")).head.getLong(0)
      val weights = cut.select(col("source").as("stratum")).distinct()
        .withColumn("wt",
          expr("CAST(substring(stratum, 4) AS BIGINT) % 4 + 1"))
      val mixed = Sampling.budgetMix(cut, "doc_id", "source", toks,
        weights, total / 2)
      Sampling.shardAssign(
        cut.join(mixed.select(col("id").as("doc_id")),
          Seq("doc_id"), "left_semi"),
        "doc_id", numShards = 4)
        .select("doc_id", "shard", "pos")
    }
    val a = run().as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(a == run().as[(Long, Long, Int)].collect().sortBy(_._1).toSeq,
      "classifier → mix → shards is run-deterministic")
    assert(a.nonEmpty && a.size < docs.count(), s"kept ${a.size}")
    // everything sharded survived the classifier cut
    val w = Classifier.train(docs, "doc_id", col("lang") === "en")
    val cutIds = Sampling.topFraction(
        docs.join(Classifier.score(docs, "doc_id", w)
          .select(col("id").as("doc_id"), col("score_fp")),
          Seq("doc_id")),
        "score_fp", "doc_id", 1, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(a.forall(r => cutIds.contains(r._1)),
      "nothing outside the classifier cut reaches the shards")
    // shard positions are dense per shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.size).toSeq)
    }
  }

  test("curation composes: blocklist gate → winnowed overlap dedup") {
    val docs = graft.Tables(spark, dir, "documents")
    def run() = {
      // 1. C4 blocklist gate
      val clean = TextAnalysis
        .blocklistFilter(docs, "doc_id", Seq("slow"))
        .filter(col("keep")).select(col("id").as("doc_id"))
        .join(docs, Seq("doc_id"))
      // 2. MOSS overlap pairs over winnowed fingerprints; drop every
      // pair's higher id — the surviving set is pair-free
      val losers = Dedup.ngramJaccardPairsFromSids(
          Dedup.winnowSids(clean, "doc_id"), threshold = 0.5,
          maxShingleDocFreq = Some(25L))
        .select(col("b_id").as("doc_id")).distinct()
      clean.join(losers, Seq("doc_id"), "left_anti")
    }
    val a = run().select("doc_id").as[Long].collect().sorted.toSeq
    val b = run().select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "chain must be run-deterministic")
    assert(a.nonEmpty && a.length < docs.count().toInt)
    // no survivor contains a blocklisted token
    val survivors = docs.filter(col("doc_id").isin(a: _*))
    assert(TextAnalysis.blocklistFilter(survivors, "doc_id", Seq("slow"))
      .filter(!col("keep")).count() == 0)
    // the surviving set really is overlap-free at the threshold
    assert(Dedup.ngramJaccardPairsFromSids(
        Dedup.winnowSids(survivors, "doc_id"), threshold = 0.5,
        maxShingleDocFreq = Some(25L)).count() == 0,
      "no >= 0.5 winnowed-overlap pair may survive the dedup")
  }

  test("the pipeline result lands in a graft table with stats") {
    val out = tmpDir("pipe_out")
    CdcTable.append(
      runPipeline().withColumn("_id", col("doc_id").cast("string")),
      out, partitionBy = Seq("split"))
    val table = spark.read.format("graft").load(out)
    assert(table.count() == runPipeline().count())
    // manifest stats exist for the numeric columns → skipping works
    val c = CdcTable.log(out).last
    assert(c.stats.nonEmpty &&
      c.stats.values.exists(_.contains("n_tokens")))
    // split is a partition column: a split filter prunes at the manifest
    assert(table.filter(col("split") === "train").count() ==
      table.count(), "only train rows were packed and written")
  }
}

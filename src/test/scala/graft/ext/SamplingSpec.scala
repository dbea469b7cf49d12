package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic splitting / packing properties that the oracle query
  * can't express: stability across runs and partitionings, boundary
  * semantics of the pack assignment. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is stable across runs and partitionings") {
    val docs = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "t")
    val a = Sampling.hashSplit(docs, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(docs.repartition(7), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "assignment is a pure function of the key")
    // all three splits populated, roughly 80/10/10
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 300 && counts("val") < 120 &&
      counts("test") < 120, counts.toString)
    // growing the corpus never reassigns an existing document
    val grown = Sampling.hashSplit(
      (1L to 900L).map(i => (i, s"doc$i")).toDF("id", "t"), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a.forall { case (k, v) => grown(k) == v })
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "id", trainPct = 95, valPct = 10)
    }
  }

  test("clusterSplit: no cluster straddles the cut; singletons = hashSplit") {
    val docs = (1L to 300L).toDF("id")
    // clusters: {1..5} -> component 1, {10,11} -> component 10
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L)).toDF("id", "component")
    val got = Sampling.clusterSplit(docs, "id", comps)
      .select("id", "group_id", "split")
      .as[(Long, Long, String)].collect().map(t => t._1 -> t).toMap
    // every member of a cluster gets the SAME split
    assert((1L to 5L).map(got(_)._3).toSet.size == 1)
    assert(Set(10L, 11L).map(got(_)._3).size == 1)
    // cluster members split by the GROUP key, singletons by their own
    val plain = Sampling.hashSplit(docs, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got(2L)._3 == plain(1L), "member follows the cluster rep")
    val clustered = Set(1L, 2L, 3L, 4L, 5L, 10L, 11L)
    (1L to 300L).filterNot(clustered).foreach { i =>
      assert(got(i)._2 == i && got(i)._3 == plain(i))
    }
  }

  test("stratifiedSample keeps stable per-stratum fractions") {
    val docs = (1L to 1000L).map(i =>
      (i, if (i % 2 == 0) "en" else "zh")).toDF("id", "lang")
    val kept = Sampling.stratifiedSample(docs, "lang", "id",
      Map("en" -> 100), defaultPct = 20)
      .select("id", "lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") == 500, "100% stratum keeps everything")
    assert(byLang("zh") > 50 && byLang("zh") < 150,
      s"20% stratum keeps ~100 of 500: ${byLang("zh")}")
    // deterministic: same kept set on re-run over a repartitioned frame
    val again = Sampling.stratifiedSample(docs.repartition(7), "lang",
      "id", Map("en" -> 100), defaultPct = 20)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept.map(_._1).sorted.toSeq)
    // a kept document stays kept when the corpus grows
    val grown = Sampling.stratifiedSample(
      (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
        .toDF("id", "lang"), "lang", "id",
      Map("en" -> 100), defaultPct = 20)
      .select("id").as[Long].collect().toSet
    assert(kept.map(_._1).forall(grown.contains))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, "lang", "id", Map("en" -> 101))
    }
  }

  test("importanceResample keeps ~importance fraction, deterministically") {
    // importance 1.0 → always kept; 0.0 → never; 0.5 → ~half, and the
    // kept set is a pure function of the key (stable across runs and
    // partitionings)
    val rows = (1L to 900L).map { i =>
      (i, if (i <= 300) 1.0 else if (i <= 600) 0.5 else 0.0)
    }.toDF("id", "imp")
    val kept = Sampling.importanceResample(rows, "id", "imp")
      .select("id").as[Long].collect().toSet
    assert((1L to 300L).forall(kept), "importance 1.0 is always kept")
    assert((601L to 900L).forall(i => !kept(i)), "importance 0 never")
    val mid = kept.count(i => i > 300 && i <= 600)
    assert(mid > 100 && mid < 200, s"~half of the 0.5 stratum: $mid")
    val again = Sampling
      .importanceResample(rows.repartition(7), "id", "imp")
      .select("id").as[Long].collect().toSet
    assert(again == kept, "pure function of (key, score)")
    // boost doubles the acceptance cut, capped at 1
    val boosted = Sampling.importanceResample(rows, "id", "imp", 2.0)
      .select("id").as[Long].collect().toSet
    assert(kept.subsetOf(boosted), "boost only adds documents")
    assert(boosted.count(i => i > 300 && i <= 600) == 300,
      "0.5 at boost 2 caps at certainty")
    intercept[IllegalArgumentException] {
      Sampling.importanceResample(rows, "id", "imp", 0.0)
    }
  }

  test("temperatureSample flattens the head, boosts the tail, caps at 1") {
    // 1600 'big' vs 100 'small': at α=0.5, headRate=0.5 the keep
    // rates are 0.5 and min(1, 0.5·sqrt(16)) = 1.0 — the tail stratum
    // is kept whole while the head is halved
    val rows = ((1L to 1600L).map(i => (i, "big")) ++
      (2001L to 2100L).map(i => (i, "small"))).toDF("id", "src")
    val out = Sampling.temperatureSample(rows, "src", "id",
      halvings = 1, headRate = 0.5)
      .select("id", "src", "accept_cut")
      .as[(Long, String, Long)].collect()
    val bySrc = out.groupBy(_._2)
    assert(bySrc("small").length == 100, "tail kept whole (cut = 1e6)")
    assert(bySrc("small").forall(_._3 == 1000000L))
    val nBig = bySrc("big").length
    assert(nBig > 640 && nBig < 960, s"head ~halved: $nBig")
    assert(bySrc("big").forall(_._3 == 500000L))
    // more halvings → milder flattening (α → 1): tail cut shrinks
    val milder = Sampling.temperatureSample(rows, "src", "id",
      halvings = 2, headRate = 0.5)
      .filter(col("src") === "small").select("accept_cut")
      .as[Long].head()
    assert(milder == 1000000L, "0.5*16^0.5=2 vs 0.5*16^0.25=1 — both cap")
    val milder3 = Sampling.temperatureSample(rows, "src", "id",
      halvings = 3, headRate = 0.5)
      .filter(col("src") === "small").select("accept_cut")
      .as[Long].head()
    assert(milder3 < 1000000L && milder3 > 700000L,
      s"alpha=0.875: 0.5*16^0.125 = ${milder3}")
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(rows, "src", "id", halvings = 0)
    }
  }

  test("mixOrder interleaves sources proportionally to weights") {
    val docs = (("A" -> 10) :: ("B" -> 10) :: Nil)
      .flatMap { case (s, n) => (1 to n).map(i => (s, i.toLong)) }
      .toDF("source", "doc_id")
    val mixed = Sampling.mixOrder(docs, "source", "doc_id",
      Map("A" -> 2.0))
    // every prefix consumes 2 A per 1 B until A exhausts
    val first9 = mixed.orderBy(col("mix_pos"), col("source"),
        col("doc_id")).limit(9)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(first9 == Map("A" -> 6L, "B" -> 3L))
    // deterministic: same schedule on a different partitioning
    val again = Sampling.mixOrder(docs.repartition(5), "source",
        "doc_id", Map("A" -> 2.0))
      .orderBy(col("mix_pos"), col("source"), col("doc_id")).limit(9)
      .select("source", "doc_id").as[(String, Long)].collect().toSeq
    val first = mixed.orderBy(col("mix_pos"), col("source"),
        col("doc_id")).limit(9)
      .select("source", "doc_id").as[(String, Long)].collect().toSeq
    assert(again == first)
    intercept[IllegalArgumentException] {
      Sampling.mixOrder(docs, "source", "doc_id", Map("A" -> 0.0))
    }
  }

  test("topFraction selects exactly the global-sort set, sortlessly") {
    // scores with heavy ties (mod 7) so the threshold score group is
    // wide — the set must equal the naive row_number-over-global-sort
    // formulation at every fraction, including ones that land
    // mid-tie-group
    val docs = (1L to 503L).map(i => (i, i % 7)).toDF("id", "s")
    def brute(num: Long, den: Long): Set[Long] = {
      val k = (503L * num + den - 1) / den
      docs.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(
            col("s").desc, md5(col("id").cast("string")).asc,
            col("id").asc)))
        .filter(col("rn") <= k).select("id").as[Long].collect().toSet
    }
    for ((num, den) <- Seq((1L, 10L), (1L, 3L), (503L, 503L), (1L, 503L))) {
      val got = Sampling.topFraction(docs, "s", "id", num, den)
        .select("id").as[Long].collect().toSet
      assert(got == brute(num, den), s"fraction $num/$den")
    }
    // fraction 0 keeps nothing; partitioning never changes the set
    assert(Sampling.topFraction(docs, "s", "id", 0, 5).count() == 0)
    val a = Sampling.topFraction(docs, "s", "id", 1, 4)
      .select("id").as[Long].collect().toSet
    val b = Sampling.topFraction(docs.repartition(7), "s", "id", 1, 4)
      .select("id").as[Long].collect().toSet
    assert(a == b, "kept set is partitioning-independent")
    // NULL scores are excluded, k derives from the non-null count
    val withNulls = docs.withColumn("s",
      when(col("id") <= 3, lit(null)).otherwise(col("s")))
    assert(Sampling.topFraction(withNulls, "s", "id", 500, 500)
      .count() == 500)
    intercept[IllegalArgumentException] {
      Sampling.topFraction(docs, "s", "id", 6, 5)
    }
  }

  test("dedup pair helpers leave no cached plans behind") {
    // regression for the round-3 advisor finding: staged frames were
    // persisted and never released, accumulating CacheManager entries
    // (and storage memory) across repeated calls
    val docs = (1L to 40L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i end"))
      .toDF("id", "text")
    val r = Dedup.near(docs, "text", "id")
    r.pairs.count(); r.decisions.count()
    Dedup.ngramJaccardPairs(docs, "text", "id", threshold = 0.5).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "every staged persist must be released before returning")
  }

  test("sampleExactK: exactly k per stratum, stable under growth") {
    val docs = (1L to 300L).map(i =>
      (i, Seq("en", "zh", "de")(i.toInt % 3))).toDF("id", "lang")
    val a = Sampling.sampleExactK(docs, "lang", "id", k = 7)
      .select("stratum", "id").as[(String, Long)].collect()
    assert(a.groupBy(_._1).forall(_._2.length == 7),
      "exactly k per stratum")
    // window formulation picks the identical set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("bucket").desc, col("id").asc)
    val expect = docs
      .withColumn("bucket", Sampling.stableBucket("id", 1000000))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select(col("lang").as("stratum"), col("id"))
      .as[(String, Long)].collect().toSet
    assert(a.toSet == expect)
    // a tiny stratum returns all of it, not an error
    val tiny = Sampling.sampleExactK(
        docs.filter(col("id") <= 5), "lang", "id", k = 7)
      .select("id").as[Long].collect().toSet
    assert(tiny == (1L to 5L).toSet)
  }

  test("rankNormalize equals the percent_rank window, sortlessly") {
    // heavy ties (score = i % 5) so tie groups span strata boundaries
    val rows = (0 until 97).map(i =>
      (i.toLong, Seq("a", "b", "c")(i % 3), (i % 5).toLong))
    val df = rows.toDF("id", "st", "sc")
    val got = Sampling.rankNormalize(df, "st", "sc")
      .select("id", "rank_norm").as[(Long, Double)].collect().toMap
    val expect = df.withColumn("rn",
        org.apache.spark.sql.functions.percent_rank().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("st").orderBy("sc")))
      .select("id", "rn").as[(Long, Double)].collect().toMap
    assert(got == expect, "histogram ranks == window ranks, bit-exact")
    // a single-row stratum ranks 0, not NaN
    val solo = Sampling.rankNormalize(
        Seq((1L, "only", 7L)).toDF("id", "st", "sc"), "st", "sc")
      .select("rank_norm").as[Double].head()
    assert(solo == 0.0)
  }

  test("budgetMix fails loudly on a nonpositive or null weight") {
    // advisor r10: a zero/negative wt silently produced negative
    // allocations; it must now raise with the offending stratum named
    val df = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("id", "st", "tok")
    for (badWt <- Seq(0L, -3L)) {
      val wts = Seq(("a", 2L), ("b", badWt)).toDF("stratum", "wt")
      val e = intercept[Exception] {
        Sampling.budgetMix(df, "id", "st", col("tok"), wts, 8L).collect()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("budgetMix: weights must be positive"),
        s"wt=$badWt raised the wrong error: $msg")
    }
  }

  test("budgetMix matches a brute-force greedy reference exactly") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString.take(7), 16) % 1000000
    }
    // 3 strata, uneven sizes; weights 3/2/1; budget below total
    val rows = (0 until 60).map { i =>
      val st = Seq("a", "b", "c")(i % 3)
      (i.toLong, st, (i % 7 + 1).toLong)
    }
    val wts = Seq(("a", 3L), ("b", 2L), ("c", 1L))
    val budget = 60L
    val df = rows.toDF("id", "st", "tok")
    val got = Sampling.budgetMix(df, "id", "st",
        col("tok"), wts.toDF("stratum", "wt"), budget)
      .select("id", "alloc", "cum_before")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    // reference: largest-remainder apportionment + greedy md5 prefix
    val wsum = wts.map(_._2).sum
    val base = wts.map { case (s, w) =>
      (s, budget * w / wsum, budget * w % wsum)
    }
    val leftover = budget - base.map(_._2).sum
    val ranked = base.sortBy { case (s, _, r) => (-r, s) }
    val alloc = ranked.zipWithIndex.map { case ((s, b, _), i) =>
      s -> (b + (if (i < leftover) 1L else 0L))
    }.toMap
    assert(alloc.values.sum == budget, "apportionment is exact")
    val expect = rows.groupBy(_._2).flatMap { case (st, ds) =>
      var cum = 0L
      ds.sortBy(d => (bucket(d._1), d._1)).flatMap { case (id, _, tok) =>
        val before = cum; cum += tok
        if (before < alloc(st)) Some(id -> ((alloc(st), before))) else None
      }
    }.toMap
    assert(got == expect,
      s"diff: got-only=${got.keySet -- expect.keySet} " +
        s"expect-only=${expect.keySet -- got.keySet}")
    // the greedy prefix property: kept tokens land in
    // [alloc, alloc + max_tok) for every stratum with enough supply
    val keptTok = rows.filter(r => got.contains(r._1))
      .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    wts.foreach { case (s, _) =>
      assert(keptTok(s) >= alloc(s) && keptTok(s) < alloc(s) + 7,
        s"stratum $s kept=${keptTok(s)} alloc=${alloc(s)}")
    }
  }

  test("uniMax matches a brute-force water-filling reference exactly") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString.take(7), 16) % 1000000
    }
    // very uneven strata: a tiny (cap binds), b mid, c huge (uniform
    // share binds); budget forces both branches of the min()
    val rows = (0 until 80).map { i =>
      val st = if (i < 4) "a" else if (i < 20) "b" else "c"
      (i.toLong, st, (i % 5 + 1).toLong)
    }
    val df = rows.toDF("id", "st", "tok")
    for ((en, ed) <- Seq((1L, 1L), (2L, 1L), (1L, 2L));
         budget <- Seq(0L, 50L, 120L, 10000L)) {
      val got = Sampling.uniMax(df, "id", "st", col("tok"), budget,
          en, ed)
        .select("id", "alloc", "cum_before")
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      // reference water-filling
      val totals = rows.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy { case (s, n) => (n, s) }
      var rem = budget; var m = totals.length
      val alloc = totals.map { case (s, n) =>
        val a = math.min(en * n / ed, rem / m)
        rem -= a; m -= 1
        s -> a
      }.toMap
      assert(alloc.values.sum <= budget)
      val expect = rows.groupBy(_._2).flatMap { case (st, ds) =>
        var cum = 0L
        ds.sortBy(d => (bucket(d._1), d._1)).flatMap { case (id, _, tok) =>
          val before = cum; cum += tok
          if (before < alloc(st)) Some(id -> ((alloc(st), before)))
          else None
        }
      }.toMap
      assert(got == expect, s"epochs=$en/$ed budget=$budget " +
        s"got-only=${got.keySet -- expect.keySet} " +
        s"expect-only=${expect.keySet -- got.keySet}")
      // the epoch cap is never exceeded
      totals.foreach { case (s, n) =>
        assert(alloc(s) <= en * n / ed) }
      // ample budget + 1 epoch = everything kept
      if (budget == 10000L && en == 1L && ed == 1L)
        assert(got.keySet == rows.map(_._1).toSet)
    }
  }

  test("writeShards: stable shard files with the pinned in-shard order") {
    val out = tmpDir("shards")
    val df = (0 until 200).map(i => (i.toLong, s"doc $i"))
      .toDF("id", "text")
    Sampling.writeShards(df, "id", numShards = 4, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 200, "no row lost")
    // every shard's parquet is written in pos order and pos is dense
    val byShard = back.select("shard", "pos", "id")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq,
        "pos is dense per shard")
    }
    // re-run is byte-stable: same assignment, same order
    val again = Sampling.shardAssign(df, "id", 4)
      .select("id", "shard", "pos").as[(Long, Long, Int)].collect().toSet
    val first = back.select("id", "shard", "pos")
      .as[(Long, Long, Int)].collect().toSet
    assert(again == first)
  }

  test("sequencePack assigns each doc to the pack where it starts") {
    val docs = Seq(
      ("s1", 1L, 600L), ("s1", 2L, 600L), ("s1", 3L, 600L), // 0,600,1200
      ("s1", 4L, 600L),                                     // 1800 → pack 1
      ("s2", 1L, 2500L), ("s2", 2L, 100L))                  // 0 → 0; 2500 → 1
      .toDF("source", "doc_id", "n_tokens")
    val packed = Sampling
      .sequencePack(docs, "source", "doc_id", "n_tokens", budget = 2048)
      .select("source", "doc_id", "pack_id").as[(String, Long, Long)]
      .collect().toSet
    assert(packed == Set(
      ("s1", 1L, 0L), ("s1", 2L, 0L), ("s1", 3L, 0L), ("s1", 4L, 0L),
      ("s2", 1L, 0L), ("s2", 2L, 1L)))
    // tighter budget splits s1: starts at 0,600,1200,1800 / 1024
    val tight = Sampling
      .sequencePack(docs, "source", "doc_id", "n_tokens", budget = 1024)
      .filter(col("source") === "s1")
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toSet
    assert(tight == Set((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("weightedSampleK matches the driver-side A-Res reference") {
    val docs = (1L to 200L).map(i => (i, 1L + (i % 13) * 7L))
      .toDF("id", "w")
    val got = Sampling.weightedSampleK(docs, "id", "w", 20)
      .select("id").as[Long].collect().toSet
    // independent reference: same md5-u, same fixed_log2 recurrence,
    // same truncating integer key, ranked on the driver
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (1L to 200L).map { i =>
      val h = md5hex(i.toString)
      val u28 = java.lang.Long.parseLong(h.take(7), 16) + 1
      val w = 1L + (i % 13) * 7L
      val key = ((28L << 16) - graft.functions.FixedPointMath
        .flog2(u28)) * 1000000L * 1000000L /
        math.round(w.toDouble * 1e6)
      (key, h, i)
    }.sorted.take(20).map(_._3).toSet
    assert(got == want)
  }

  test("weightedSampleK is stable, weight-monotone, and guards edges") {
    val docs = (1L to 300L)
      .map(i => (i, if (i % 50 == 0) 0L else i)).toDF("id", "w")
    val a = Sampling.weightedSampleK(docs, "id", "w", 30)
      .select("id").as[Long].collect().toSeq
    val b = Sampling.weightedSampleK(docs.repartition(7), "id", "w", 30)
      .select("id").as[Long].collect().toSeq
    assert(a == b, "the sample is a pure function of content")
    assert(!a.exists(_ % 50 == 0), "zero-weight rows never selected")
    // same u (same key string under a shifted id column) + larger
    // weight → smaller A-Res key: a heavier twin always outranks its
    // lighter self, so doubling every weight keeps the selection
    val doubled = Sampling.weightedSampleK(
      docs.withColumn("w", col("w") * 2), "id", "w", 30)
      .select("id").as[Long].collect().toSeq
    assert(doubled == a,
      "A-Res selection is invariant under uniform weight scaling " +
        "only in rank terms — identical u's keep the same order")
    // k larger than the population returns every positive-weight row
    val all = Sampling.weightedSampleK(docs, "id", "w", 1000)
    assert(all.count() == 294)
    intercept[IllegalArgumentException] {
      Sampling.weightedSampleK(docs, "id", "w", 0)
    }
  }

  test("weightedSampleIncremental: any batch split equals batch-global") {
    val docs = (1L to 200L).map(i => (i, 1L + (i % 13) * 7L))
      .toDF("id", "w")
    val want = Sampling.weightedSampleK(docs, "id", "w", 20)
      .select("id").as[Long].collect().toSeq
    // three different split shapes, same final state
    for ((name, parts) <- Seq(
        ("thirds", Seq(docs.filter($"id" <= 66),
          docs.filter($"id" > 66 && $"id" <= 133),
          docs.filter($"id" > 133))),
        ("mod", Seq(docs.filter($"id" % 2 === 0),
          docs.filter($"id" % 2 === 1))))) {
      val state = tmpDir(s"wsi_$name")
      parts.foreach(b =>
        Sampling.weightedSampleIncremental(b, "id", "w", 20, state))
      val got = graft.sink.CdcTable.read(spark, state)
        .orderBy($"ares_fp",
          md5($"id".cast("string")), $"id")
        .select("id").as[Long].collect().toSeq
      assert(got == want, s"split '$name' diverged")
    }
    // replay safety: re-folding a batch under its committed txn no-ops
    val state = tmpDir("wsi_txn")
    Sampling.weightedSampleIncremental(docs.filter($"id" <= 100),
      "id", "w", 20, state, txn = Some(("wsi", 1L)))
    Sampling.weightedSampleIncremental(docs.filter($"id" > 100),
      "id", "w", 20, state, txn = Some(("wsi", 2L)))
    val afterTwo = graft.sink.CdcTable.read(spark, state)
      .select("id").as[Long].collect().toSet
    Sampling.weightedSampleIncremental(docs.filter($"id" > 100),
      "id", "w", 20, state, txn = Some(("wsi", 2L))) // replay
    assert(graft.sink.CdcTable.read(spark, state)
      .select("id").as[Long].collect().toSet == afterTwo)
    assert(afterTwo == want.toSet)
  }

  test("weightedSampleK: fractional weights participate at µ precision") {
    // r15 advisor: weights in (0,1) used to truncate to 0 (excluded)
    // and 1.9 ranked as 1 — the µ-scaled fixed point keeps their real
    // proportions. The driver-side A-Res reference replays them.
    val docs = (1L to 100L)
      .map(i => (i, if (i <= 90) 0.5 else i.toDouble)).toDF("id", "w")
    val got = Sampling.weightedSampleK(docs, "id", "w", 5)
    val rows = got.collect()
    assert(rows.length == 5)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("ares_fp"))),
      "no NULL A-Res keys may reach the selection")
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (1L to 100L).map { i =>
      val h = md5hex(i.toString)
      val u28 = java.lang.Long.parseLong(h.take(7), 16) + 1
      val w = if (i <= 90) 0.5 else i.toDouble
      val key = ((28L << 16) - graft.functions.FixedPointMath
        .flog2(u28)) * 1000000L * 1000000L / math.round(w * 1e6)
      (key, h, i)
    }.sorted.take(5).map(_._3).toSet
    assert(got.select("id").as[Long].collect().toSet == want,
      "fractional weights must rank by their true µ-scaled value")
    // half of w = 1.0: the same u gives exactly double the key
    val one = Sampling.weightedSampleK(
      Seq((7L, 1.0)).toDF("id", "w"), "id", "w", 1)
      .select("ares_fp").as[Long].head()
    val half = Sampling.weightedSampleK(
      Seq((7L, 0.5)).toDF("id", "w"), "id", "w", 1)
      .select("ares_fp").as[Long].head()
    assert(half == one * 2, s"w=0.5 must rank at exactly 2× w=1 ($half vs $one)")
  }

  test("weightedSampleK excludes sub-representable weights (wµ = 0)") {
    // below 5e-7 the µ-scaled weight rounds to 0: inclusion
    // probability is sub-representable — excluded, never promoted
    val docs = (1L to 100L)
      .map(i => (i, if (i <= 90) 2.5e-7 else 1.0)).toDF("id", "w")
    val got = Sampling.weightedSampleK(docs, "id", "w", 20)
    val ids = got.select("id").as[Long].collect()
    assert(ids.length == 10 && ids.forall(_ > 90),
      "weights rounding to 0µ are excluded")
    // NULL and negative weights stay excluded too
    val mixed = Seq((1L, null.asInstanceOf[java.lang.Double]),
      (2L, java.lang.Double.valueOf(-3.0)),
      (3L, java.lang.Double.valueOf(2.0))).toDF("id", "w")
    assert(Sampling.weightedSampleK(mixed, "id", "w", 5)
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }
}

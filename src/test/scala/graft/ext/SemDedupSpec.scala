package graft.ext

import graft.SparkSpec

/** SemDeDup: cell-blocked pairing semantics, the most-central keep
  * rule, and the blocking contract (near-identical vectors in
  * DIFFERENT cells are never paired — the approximation SemDeDup
  * accepts by design). */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated centroid directions
  private val cents = Seq(
    0L -> Array(1f, 0f, 0f, 0f),
    1L -> Array(0f, 1f, 0f, 0f))

  private def df(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("duplicate groups resolve to the most-central member") {
    // cell 0: three near-duplicates, id 11 most aligned with the
    // centroid; cell 1: a pair, id 21 most aligned; id 30 a singleton
    val r = Similarity.semDedup(df(
      10L -> Array(0.98f, 0.02f, 0.19f, 0f),
      11L -> Array(1f, 0f, 0f, 0f),
      12L -> Array(0.97f, 0.01f, 0.24f, 0f),
      20L -> Array(0.05f, 0.9f, 0.43f, 0f),
      21L -> Array(0f, 1f, 0f, 0f),
      30L -> Array(0f, 0f, 1f, 0f)), "vec_id", 0.8, cents)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (10L, 11L, 3L, 0L), // min-id label, kept = most central
      (20L, 21L, 2L, 1L)))
  }

  test("high-cosine pairs in different cells are NOT paired " +
    "(cell blocking is the contract)") {
    // both vectors near the 45° boundary, one on each side: cosine
    // ~0.995 but different cells → no pair, no output row
    val r = Similarity.semDedup(df(
      1L -> Array(0.74f, 0.67f, 0f, 0f),
      2L -> Array(0.67f, 0.74f, 0f, 0f)), "vec_id", 0.8, cents)
      .count()
    assert(r == 0L)
  }

  test("keep-rule ties break to the smallest id") {
    // identical vectors: identical centroid dots → kept = min id
    val v = Array(0.8f, 0f, 0.6f, 0f)
    val r = Similarity.semDedup(
      df(5L -> v, 3L -> v, 9L -> v), "vec_id", 0.99, cents)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((3L, 3L, 3L, 0L)))
  }

  test("join-path assignment is bit-identical to the literal argmax") {
    // 20 centroids (past the comfortable literal range), random-ish
    // vectors with planted duplicates; both paths must agree exactly
    val rnd = new scala.util.Random(77)
    def vec(): Array[Float] = Array.fill(6)(rnd.nextFloat() * 2 - 1)
    val centVecs = (0L until 20L).map(i => i -> vec())
    val base = (100L until 160L).map(i => i -> vec())
    val planted = base.take(10).map { case (i, v) => (i + 1000L, v) }
    val rows = base ++ planted
    val data = df(rows: _*)
    val lit = Similarity.semDedup(data, "vec_id", 0.9, centVecs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val cdf = centVecs.toDF("cid", "ce")
    val join = Similarity.semDedupJoin(data, "vec_id", 0.9, cdf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(lit == join, s"literal=$lit join=$join")
    assert(lit.nonEmpty, "planted duplicates must cluster")
  }

  test("transitive chains collapse into one group") {
    // a~b and b~c above threshold, a~c below: one component of 3
    val r = Similarity.semDedup(df(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0.9f, 0f, 0.436f, 0f),
      3L -> Array(0.62f, 0f, 0.785f, 0f)), "vec_id", 0.85, cents)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 1L, 3L, 0L)))
  }

  test("semDedupIncremental: kept-only index, replay-stable with txn") {
    import graft.sink.CdcTable
    val idx = tmpDir("semincr")
    val p1 = Similarity.semDedupIncremental(df(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0.95f, 0.05f, 0f, 0f), // ~copy of 0, same cell
      2L -> Array(0f, 1f, 0f, 0f)),      // cell-1 exemplar
      "vec_id", 0.85, cents, idx, txn = Some(("t", 1L)))
    assert(p1.select("b_id").as[Long].collect().toSet == Set(1L))
    assert(CdcTable.read(spark, idx).select("id").as[Long]
      .collect().toSet == Set(0L, 2L), "index holds kept only")
    val b2 = df(
      10L -> Array(0.9f, 0.1f, 0f, 0f),  // ~copy of KEPT 0 → drop
      11L -> Array(0.7f, 0f, 0.72f, 0f)) // cell 0 but cos 0.70 → keep
    def run2() = Similarity.semDedupIncremental(
      b2, "vec_id", 0.85, cents, idx, txn = Some(("t", 2L)))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(run2() == Set((0L, 10L)), "cross-batch probe hits the exemplar")
    assert(CdcTable.read(spark, idx).select("id").as[Long]
      .collect().toSet == Set(0L, 2L, 11L))
    // replay of batch 2 (same txn): same evidence, no index growth
    assert(run2() == Set((0L, 10L)))
    assert(CdcTable.read(spark, idx).count() == 3L, "replay no-ops")
  }

  test("incremental keep rule is first-arrival: a dropped vector's " +
    "copies are judged against the KEPT exemplar, not the dropped one") {
    import graft.sink.CdcTable
    // chain a~b, b~c, a!~c (the transitive-chain fixture, split)
    val a = 0L -> Array(1f, 0f, 0f, 0f)
    val b = 1L -> Array(0.9f, 0f, 0.436f, 0f)
    val c = Array(0.62f, 0f, 0.785f, 0f)
    // same batch: ANY lower-id member counts — c drops via dropped b
    val idx1 = tmpDir("semchain1")
    val p = Similarity.semDedupIncremental(df(a, b, 2L -> c),
      "vec_id", 0.85, cents, idx1)
    assert(p.select("b_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(CdcTable.read(spark, idx1).select("id").as[Long]
      .collect().toSet == Set(0L))
    // later batch: only KEPT exemplars are in the index — c survives
    // (cos vs a is 0.62 < 0.85; the b it resembles was never kept)
    val idx2 = tmpDir("semchain2")
    Similarity.semDedupIncremental(df(a, b), "vec_id", 0.85, cents, idx2)
    val p2 = Similarity.semDedupIncremental(df(10L -> c),
      "vec_id", 0.85, cents, idx2)
    assert(p2.count() == 0L, "no kept exemplar within threshold")
    assert(CdcTable.read(spark, idx2).select("id").as[Long]
      .collect().toSet == Set(0L, 10L))
  }

  test("incremental join-path equals the literal path, index included") {
    import graft.sink.CdcTable
    val rnd = new scala.util.Random(91)
    def vec(): Array[Float] = Array.fill(4)(rnd.nextFloat() * 2 - 1)
    val base = (0L until 40L).map(i => i -> vec())
    val dup = base.take(6).map { case (i, v) =>
      (100L + i) -> v.map(x => x * 0.99f + 0.005f) }
    val all = (base ++ dup).sortBy(_._1)
    val (b1, b2) = all.partition(_._1 < 50L)
    val centsDf = base.take(8)
      .map { case (i, v) => (i, v) }.toSeq
      .toDF("cid", "ce")
    val idxL = tmpDir("semeqL"); val idxJ = tmpDir("semeqJ")
    def pairsOf(run: Seq[(Long, Array[Float])] => org.apache.spark.sql.DataFrame) = {
      val p1 = run(b1); p1.count() // force batch 1 too, for the compare
      val p2 = run(b2)
      (p1.select("a_id", "b_id").as[(Long, Long)].collect().toSet,
        p2.select("a_id", "b_id").as[(Long, Long)].collect().toSet)
    }
    val cents = base.take(8).map { case (i, v) => (i, v) }
    val lit = pairsOf(rows => Similarity.semDedupIncremental(
      df(rows: _*), "vec_id", 0.8, cents, idxL))
    val jn = pairsOf(rows => Similarity.semDedupIncrementalJoin(
      df(rows: _*), "vec_id", 0.8, centsDf, idxJ))
    assert(lit == jn, s"lit=$lit join=$jn")
    val iL = CdcTable.read(spark, idxL).select("id", "cid")
      .as[(Long, Long)].collect().toSet
    val iJ = CdcTable.read(spark, idxJ).select("id", "cid")
      .as[(Long, Long)].collect().toSet
    assert(iL == iJ, "interchangeable indexes: same kept set AND cells")
    assert(lit._1.nonEmpty || lit._2.nonEmpty,
      "planted near-dups must surface")
  }

  test("join-path streaming glue mirrors the literal glue exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sink.CdcTable
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0.95f, 0.05f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)), (3L, Array(0.7f, 0f, 0.72f, 0f)))
    def land(run: (org.apache.spark.sql.DataFrame, String, String,
        String) => org.apache.spark.sql.streaming.StreamingQuery) = {
      val idx = tmpDir("sjidx"); val out = tmpDir("sjout")
      val mem = MemoryStream[(Long, Array[Float])]
      val q = run(mem.toDF.toDF("vec_id", "embedding"), idx, out,
        tmpDir("sjckpt"))
      try { mem.addData(feed: _*); q.processAllAvailable() }
      finally q.stop()
      (CdcTable.read(spark, out).select("vec_id").as[Long]
          .collect().sorted.toSeq,
        CdcTable.read(spark, idx).select("id", "cid")
          .as[(Long, Long)].collect().toSet)
    }
    val lit = land((s, i, o, c) => Similarity.semDedupStreamToTable(
      s, "vec_id", cents, i, o, c, threshold = 0.85))
    val jn = land((s, i, o, c) => Similarity.semDedupStreamToTableJoin(
      s, "vec_id",
      cents.toDF("cid", "ce"), i, o, c, threshold = 0.85))
    assert(lit == jn, s"lit=$lit join=$jn")
    assert(lit._1 == Seq(0L, 2L, 3L), "the near-copy dropped")
  }

  test("semDedupStreamToTable: kept-only cell index across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sink.CdcTable
    implicit val sqlCtx = spark.sqlContext
    val idx = tmpDir("ssidx"); val out = tmpDir("ssout")
    val ckpt = tmpDir("ssckpt")
    val mem = MemoryStream[(Long, Array[Float])]
    val q = Similarity.semDedupStreamToTable(
      mem.toDF.toDF("vec_id", "embedding"), "vec_id", cents, idx, out,
      ckpt, threshold = 0.85)
    try {
      mem.addData((0L, Array(1f, 0f, 0f, 0f)),
        (1L, Array(0.95f, 0.05f, 0f, 0f)), // ~copy of 0 → drop
        (2L, Array(0f, 1f, 0f, 0f)))       // cell-1 exemplar → keep
      q.processAllAvailable()
    } finally q.stop()
    // restart: the exemplar index still covers pre-restart history
    val q2 = Similarity.semDedupStreamToTable(
      mem.toDF.toDF("vec_id", "embedding"), "vec_id", cents, idx, out,
      ckpt, threshold = 0.85)
    try {
      mem.addData((10L, Array(0.9f, 0.1f, 0f, 0f)),  // ~copy of 0 → drop
        (11L, Array(0.7f, 0f, 0.72f, 0f)))           // diverse → keep
      q2.processAllAvailable()
    } finally q2.stop()
    assert(CdcTable.read(spark, out).select("vec_id").as[Long]
      .collect().sorted.toSeq == Seq(0L, 2L, 11L),
      "near-copies dropped across the restart")
    assert(CdcTable.read(spark, idx).count() == 3L,
      "kept-only indexing: one exemplar row per kept vector")
  }
}

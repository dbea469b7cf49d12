package graft.ext

import graft.SparkSpec

/** Fixed-point PageRank: exact match against a driver-side integer
  * reference on a random graph, plus structural sanity (hub ranks
  * highest on a star, uniform graph stays uniform). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver reference: the same truncating-integer recurrence. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val r0 = scale / n
    val tele = (15L * r0) / 100L
    val deg = edges.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var r = nodes.map(_ -> r0).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (src, _) =>
          (85L * r(src)) / (100L * deg(src))
        }.sum
      }
      r = nodes.map(v => v -> (tele + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("pageRank matches the driver-side integer reference exactly") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 120).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)
    }.filter { case (a, b) => a != b }.distinct
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == ref(edges, 3))
  }

  test("personalizedPageRank matches a seeded driver reference exactly") {
    val rnd = new scala.util.Random(13)
    val edges = (0 until 120).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)
    }.filter { case (a, b) => a != b }.distinct
    val seedSet = Set(2L, 5L, 11L)
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", seedSet.toSeq.toDF("id"), iters = 3)
      .as[(Long, Long)].collect().toMap
    // driver reference with seed-concentrated start + teleport
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val nS = seedSet.count(nodes.contains)
    val r0 = 1000000000000L / nS
    val tele = (15L * r0) / 100L
    val deg = edges.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var r = nodes.map(v => v -> (if (seedSet(v)) r0 else 0L)).toMap
    for (_ <- 0 until 3) {
      val in = edges.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (src, _) =>
          (85L * r(src)) / (100L * deg(src)) }.sum
      }
      r = nodes.map(v => v ->
        ((if (seedSet(v)) tele else 0L) + in.getOrElse(v, 0L))).toMap
    }
    assert(got == r)
    // mass starts at the seeds: a node unreachable from any seed is 0
    assert(got.values.exists(_ == 0L) ||
      nodes.forall(v => got(v) > 0L)) // (random graph may reach all)
  }

  test("pageRankWeighted matches a BigInt driver reference; uniform " +
      "weights reproduce pageRank exactly") {
    val rnd = new scala.util.Random(17)
    val edges = (0 until 120).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
        (rnd.nextInt(1000000) + 1).toLong * 1000000L) // fp-sim scale
    }.filter { case (a, b, _) => a != b }
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq // distinct pairs
    val got = Graph.pageRankWeighted(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iters = 3)
      .as[(Long, Long)].collect().toMap
    // BigInt reference (r·w overflows Long at this weight scale)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val r0 = 1000000000000L / nodes.size
    val tele = (15L * r0) / 100L
    val wsum = edges.groupBy(_._1).map { case (s, g) =>
      s -> g.map(_._3).sum }
    var r = nodes.map(_ -> r0).toMap
    for (_ <- 0 until 3) {
      val in = edges.groupBy(_._2).map { case (dst, g) =>
        dst -> g.map { case (src, _, w) =>
          ((BigInt(85) * r(src) * w) /
            (BigInt(100) * wsum(src))).toLong
        }.sum
      }
      r = nodes.map(v => v -> (tele + in.getOrElse(v, 0L))).toMap
    }
    assert(got == r)
    // uniform weights ⇒ w/wsum = 1/deg ⇒ bit-identical to pageRank
    val plain = edges.map(e => (e._1, e._2))
    assert(Graph.pageRankWeighted(
        plain.map { case (a, b) => (a, b, 7L) }.toDF("src", "dst", "w"),
        "src", "dst", "w", iters = 3)
      .as[(Long, Long)].collect().toMap ==
      Graph.pageRank(plain.toDF("src", "dst"), "src", "dst", iters = 3)
        .as[(Long, Long)].collect().toMap)
    // nonpositive weight fails loudly
    val e = intercept[Exception] {
      Graph.pageRankWeighted(Seq((1L, 2L, 0L)).toDF("src", "dst", "w"),
        "src", "dst", "w").collect()
    }
    assert((Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(c => String.valueOf(c.getMessage))
          .getOrElse(""))
      .contains("weights must be positive"))
  }

  test("star graph: the hub out-ranks every leaf") {
    // leaves 1..6 -> hub 0, hub -> every leaf (so no dangling nodes)
    val edges = (1L to 6L).flatMap(l => Seq((l, 0L), (0L, l)))
    val r = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 4)
      .as[(Long, Long)].collect().toMap
    (1L to 6L).foreach(l => assert(r(0L) > r(l), s"hub vs leaf $l: $r"))
    // leaves are symmetric → identical ranks
    assert((1L to 6L).map(r).toSet.size == 1)
  }

  test("regular ring stays uniform; more iterations preserve that") {
    val n = 8L
    val edges = (0L until n).map(i => (i, (i + 1) % n))
    val r = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r.values.toSet.size == 1, s"ring should be uniform: $r")
  }

  test("argument validation") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", dampNum = 100, dampDen = 100)
    }
  }
}

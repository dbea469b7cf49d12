package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Misra–Gries aggregate: exactness when the vocabulary fits,
  * the MG error bound and guaranteed-presence property when it
  * doesn't, and stability under partial aggregation (partition
  * merges). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def topVia(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(expr(s"heavy_hitters(tok, $cap)").as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.tok", $"h.cnt").as[(String, Long)].collect()

  test("exact counts when distinct items fit the capacity") {
    val words = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(20)("c") ++ Seq.fill(5)("d")
    val df = words.toDF("tok").repartition(8) // force partial merges
    val got = topVia(df, 16).toMap
    assert(got == Map("a" -> 50L, "b" -> 30L, "c" -> 20L, "d" -> 5L))
    // deterministic order: cnt desc, tok asc
    assert(topVia(df, 16).map(_._1).toSeq == Seq("a", "b", "c", "d"))
  }

  test("over capacity: bounds hold and true heavy hitters survive") {
    // one dominant item + 40 rare ones, capacity 8
    val words = Seq.fill(500)("hot") ++
      (1 to 40).flatMap(i => Seq.fill(3)(s"rare$i"))
    val n = words.size
    val cap = 8
    val df = words.toDF("tok").repartition(4)
    val got = topVia(df, cap)
    assert(got.size <= cap)
    val hot = got.toMap.get("hot")
    assert(hot.isDefined, "an item with freq >> N/(k+1) must be present")
    // estimate within [true - N/(k+1), true]
    assert(hot.get <= 500L && hot.get >= 500L - n / (cap + 1), got.toSeq)
    // null inputs are ignored
    val withNulls = (words.map(Option(_)) ++ Seq.fill(10)(
      None: Option[String])).toDF("tok")
    assert(topVia(withNulls, 64).toMap.apply("hot") == 500L)
  }

  test("Column-API helper matches the registered function") {
    val df = (Seq.fill(9)("x") ++ Seq.fill(4)("y")).toDF("tok")
    val viaCol = df.agg(graft.ext.TextAnalysis
        .heavyHitters($"tok", 8).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.tok", $"h.cnt").as[(String, Long)].collect().toSeq
    assert(viaCol == Seq(("x", 9L), ("y", 4L)))
  }

  test("property: MG invariants hold on random streams and splits") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val streamGen = for {
      nItems <- Gen.choose(1, 30)
      len <- Gen.choose(1, 400)
      toks <- Gen.listOfN(len, Gen.choose(0, nItems - 1).map(i => s"w$i"))
      cap <- Gen.choose(2, 40)
      splits <- Gen.choose(1, 6)
    } yield (toks, cap, splits)
    (0 until 60).foreach { seed =>
      streamGen(Gen.Parameters.default, Seed(seed.toLong)).foreach {
        case (toks, cap, splits) =>
          // driver-side MG over arbitrary partition splits, merged in
          // order — the same code the aggregate runs on executors
          val parts = toks.grouped(
            math.max(1, toks.size / splits)).toSeq
          val bufs = parts.map { p =>
            val b = new HeavyHitters.Buf(cap)
            p.foreach(b.add(_, 1L))
            b
          }
          val merged = bufs.reduce { (a, b) => a.mergeIn(b); a }
          val est = merged.sortedEntries.toMap
          val exact = toks.groupBy(identity).view
            .mapValues(_.size.toLong).toMap
          val n = toks.size
          assert(est.size <= cap)
          est.foreach { case (t, c) =>
            val tr = exact(t)
            assert(c <= tr, s"never overestimate: $t $c > $tr")
            assert(c >= tr - n / (cap + 1),
              s"error bound: $t $c < $tr - ${n / (cap + 1)}")
          }
          // guaranteed presence of true heavy hitters
          exact.foreach { case (t, tr) =>
            if (tr > n / (cap + 1))
              assert(est.contains(t), s"heavy $t ($tr of $n) missing")
          }
          // exactness when the vocabulary fits
          if (exact.size <= cap) assert(est == exact)
      }
    }
  }

  test("q71 sketch path matches the exact aggregation") {
    val dir = "/root/testdata/sf0.001"
    val sketch = graft.queries.TextQ.q71(spark, dir)
      .as[(String, Long)].collect().toSeq
    val exact = graft.Tables(spark, dir, "documents")
      .select(explode(split(trim($"text"), "\\s+")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(10)
      .as[(String, Long)].collect().toSeq
    assert(sketch == exact)
  }
}

package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE trainer semantics the oracle query can't isolate: greedy
  * left-to-right pairing, word-boundary isolation, merged-symbol
  * boundary safety, early exhaustion, and a randomized cross-check
  * against an independent JVM reference implementation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._
  import TextAnalysis.BpeMerge

  private def df(docs: String*) =
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  // independent reference: explicit symbol lists + explicit greedy
  // left-to-right merge application
  private def bruteNorm(t: String): Seq[Vector[String]] =
    t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
      .split("\\s+").toSeq.map(_.map(_.toString).toVector)

  private def bruteMergeWord(w: Vector[String], l: String, r: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == l && w(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += w(i); i += 1 }
    }
    out.result()
  }

  private def bruteTrain(docs: Seq[String], n: Int)
      : (Seq[BpeMerge], Seq[Seq[Vector[String]]]) = {
    var state = docs.map(bruteNorm)
    val merges = Seq.newBuilder[BpeMerge]
    var k = 1
    var done = false
    while (k <= n && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for (d <- state; w <- d; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) =
          counts.getOrElse((w(i), w(i + 1)), 0L) + 1
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        merges += BpeMerge(k, l, r, c)
        state = state.map(_.map(bruteMergeWord(_, l, r)))
        k += 1
      }
    }
    (merges.result(), state)
  }

  test("greedy left-to-right: 'aaa' pairs as (aa, a)") {
    val got = TextAnalysis.bpeTrain(df("aaa"), "text", 2)
    assert(got == Seq(BpeMerge(1, "a", "a", 2),
      BpeMerge(2, "aa", "a", 1)),
      s"overlapping 'a a a' must collapse left-first: $got")
  }

  test("merges never cross word boundaries; trainer exhausts early") {
    // (a,b) twice, once per word; after the merge both words are a
    // single symbol — no pairs remain, so merge 2 never happens
    val got = TextAnalysis.bpeTrain(df("ab ab"), "text", 3)
    assert(got == Seq(BpeMerge(1, "a", "b", 2)), got.toString)
  }

  test("a merged symbol cannot false-match its constituent parts") {
    // after (a,b) → 'ab', the state of "abb" is |ab||b|: the next
    // pair must be (ab, b) — a replace that leaked across the '|'
    // wrapping would have matched the inner b||b instead
    val got = TextAnalysis.bpeTrain(df("abb"), "text", 2)
    assert(got == Seq(BpeMerge(1, "a", "b", 1),
      BpeMerge(2, "ab", "b", 1)), got.toString)
  }

  test("randomized cross-check against the JVM reference") {
    val rnd = new scala.util.Random(41)
    val alphabet = "aabbc "
    val docs = Seq.fill(30)(
      Seq.fill(rnd.nextInt(40) + 5)(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val (expect, endState) = bruteTrain(docs, 6)
    val got = TextAnalysis.bpeTrain(df(docs: _*), "text", 6)
    assert(got == expect, s"\n got=$got\n exp=$expect")
    // and the encode step lands on the reference's symbol counts
    val counts = df(docs: _*)
      .withColumn("stn", TextAnalysis.bpeSegment("text", got))
      .select(col("doc_id"),
        expr("(length(stn) - length(replace(stn, '|', ''))) DIV 2"))
      .as[(Long, Long)].collect().toMap
    endState.zipWithIndex.foreach { case (d, i) =>
      assert(counts(i.toLong) == d.map(_.length.toLong).sum,
        s"doc $i symbol count")
    }
  }

  test("training is partitioning-independent") {
    val docs = Seq("the cat sat", "the bat sat", "a cat sat on the mat")
    val a = TextAnalysis.bpeTrain(df(docs: _*), "text", 5)
    val b = TextAnalysis.bpeTrain(df(docs: _*).repartition(7), "text", 5)
    assert(a == b)
  }

  // ---- driver-local dictionary trainer (bpeTrainLocal) ----

  test("local trainer ≡ distributed trainer on a randomized corpus") {
    val rnd = new scala.util.Random(97)
    val alphabet = "aabbcd  "
    val docs = Seq.fill(40)(
      Seq.fill(rnd.nextInt(50) + 5)(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val (expect, _) = bruteTrain(docs, 12)
    val got = TextAnalysis.bpeTrainLocal(df(docs: _*), "text", 12)
    assert(got == expect, s"\n got=$got\n exp=$expect")
    // and it matches the per-round Spark trainer exactly
    val dist = TextAnalysis.bpeTrain(df(docs: _*), "text", 12)
    assert(got == dist, s"\n local=$got\n dist=$dist")
  }

  test("local trainer: overlapping runs pair greedily left-to-right") {
    val got = TextAnalysis.bpeTrainLocal(df("aaa"), "text", 2)
    assert(got == Seq(BpeMerge(1, "a", "a", 2),
      BpeMerge(2, "aa", "a", 1)), got.toString)
  }

  test("local trainer exhausts early when no pairs remain") {
    val got = TextAnalysis.bpeTrainLocal(df("ab ab"), "text", 5)
    assert(got == Seq(BpeMerge(1, "a", "b", 2)), got.toString)
  }

  test("local trainer: maxDictRows rejects loudly with the minFreq hint") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrainLocal(df("one two three four"), "text", 2,
        maxDictRows = 3)
    }
    assert(e.getMessage.contains("minFreq"), e.getMessage)
  }

  test("local trainer: minFreq floors hapax words out of the dictionary") {
    // 'zz' appears once; with the floor at 2 the (z,z) pair can never
    // be selected, while 'ab'×3 still trains normally
    val d = df("ab ab ab zz")
    val all = TextAnalysis.bpeTrainLocal(d, "text", 3, minFreq = 1)
    assert(all.exists(m => m.left == "z" && m.right == "z"), all.toString)
    val floored = TextAnalysis.bpeTrainLocal(d, "text", 3, minFreq = 2)
    assert(floored == Seq(BpeMerge(1, "a", "b", 3)), floored.toString)
  }
}

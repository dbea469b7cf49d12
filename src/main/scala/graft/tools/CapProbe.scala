package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe for the AUTO hot-bucket cap
  * ([[Dedup.autoBandDocFreq]], `max(64, ceil(√n))`): a 100×-scale
  * corpus (default 100k docs — 100× the sf0.1 documents table) with a
  * PLANTED boilerplate cluster (default 1k near-identical copies —
  * the mass-dup case the cap exists for) plus ordinary planted dup
  * pairs (size-2 clusters — the signal the cap must NOT suppress).
  * Runs the q82-shaped probe (half the corpus indexed, half probed)
  * twice on the same index — auto cap vs `Some(Int.MaxValue)` — and
  * prints candidate-pair volume, wall time, and ordinary-pair recall
  * for both. r9 verdict #3: the √n formula's scale behavior was
  * argued, not measured; this measures it.
  *
  *   runMain graft.tools.CapProbe [nDocs] [clusterSize] [nPairs]
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val clusterSize = args.lift(1).map(_.toInt).getOrElse(1000)
    val nPairs = args.lift(2).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Deterministic synthetic corpus, seeded per id (no RNG state):
    //  - ids [0, clusterSize): the boilerplate cluster — one shared
    //    40-token page + a tiny per-id tail (near-dups of each other);
    //    ids alternate halves so the cluster loads index AND batch
    //  - ids [clusterSize, clusterSize + 2*nPairs): ordinary dup
    //    pairs — id 2k is a near-copy of id 2k+1, unique per pair
    //  - the rest: unique filler text (id-seeded tokens, no overlap)
    val boiler = (1 to 40).map(j => s"boiler$j").mkString(" ")
    def pairBase(k: Int) = (1 to 40).map(j => s"pair${k}tok$j").mkString(" ")
    def filler(i: Long) = (1 to 40).map(j => s"u${i}w$j").mkString(" ")
    val docs = spark.range(0, nDocs).select(col("id")).as[Long].map { i =>
      val text =
        if (i < clusterSize) s"$boiler tail$i"
        else if (i < clusterSize + 2L * nPairs) {
          val k = ((i - clusterSize) / 2).toInt
          s"${pairBase(k)} v${i % 2}"
        } else filler(i)
      // interleave halves by parity so every planted structure spans
      // the index/batch split
      val docId = if (i % 2 == 0) i / 2 else nDocs / 2 + i / 2
      (docId, text, i)
    }.toDF("doc_id", "text", "orig_id")
      .localCheckpoint()

    val cut = nDocs / 2
    val b1 = docs.filter(col("doc_id") < cut).select("doc_id", "text")
    val b2 = docs.filter(col("doc_id") >= cut).select("doc_id", "text")
    // ordinary planted pairs as (minOrigId's docId, maxOrigId's docId)
    val planted = (0 until nPairs).map { k =>
      val i0 = clusterSize + 2L * k; val i1 = i0 + 1
      def docId(i: Long) = if (i % 2 == 0) i / 2 else cut + i / 2
      (math.min(docId(i0), docId(i1)), math.max(docId(i0), docId(i1)))
    }.toDF("a_id", "b_id")

    val idx = graft.queries.QueryDef.scratchDir("capprobe")
    val tIdx0 = System.nanoTime()
    Dedup.nearIncremental(b1, "text", "doc_id", idx,
      maxBandDocFreq = Some(Int.MaxValue)) // cap is probe-time; index
                                           // content is cap-independent
    println(f"index build: ${(System.nanoTime() - tIdx0) / 1e9}%.1fs " +
      f"(n=$nDocs cluster=$clusterSize pairs=$nPairs, " +
      f"auto cap would be ${Dedup.autoBandDocFreq(nDocs)})")

    for ((label, cap) <- Seq(
        "auto(sqrt-n)" -> None,
        "uncapped" -> Some(Int.MaxValue))) {
      val t0 = System.nanoTime()
      val pairs = Dedup.nearIncrementalCore(b2, "text", "doc_id", idx,
          bands = 4, maxBandDocFreq = cap,
          maxBatchRows = Long.MaxValue)
        .pairs.localCheckpoint()
      val nCand = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val found = planted.join(
        pairs.filter(col("est_jaccard") >= 0.5),
        Seq("a_id", "b_id"), "left_semi").count()
      println(f"$label%-14s candidates=$nCand%10d " +
        f"time=$secs%7.1fs planted_pair_recall=$found/$nPairs")
    }
    spark.stop()
  }
}

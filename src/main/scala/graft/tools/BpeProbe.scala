package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE trainer round-rate probe (r13 verdict #7): real tokenizers run
  * 30k+ SEQUENTIAL merge rounds; [[graft.ext.TextAnalysis.bpeTrain]]
  * pays one Spark job per round, so the 100 TB story needs a measured
  * rounds/sec number for the driver-local dictionary trainer
  * ([[graft.ext.TextAnalysis.bpeTrainLocal]]) at a scaled dictionary
  * shape — and the per-round cost of the distributed trainer at the
  * same shape for contrast.
  *
  *   runMain graft.tools.BpeProbe [factor] [rounds]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = s"/tmp/graft-scale$factor"
    ScaleData.ensure(spark, "/root/testdata/sf0.1", out, factor)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val nDocs = docs.count()
    val dictSize = docs
      .select(explode(split(trim(regexp_replace(
          lower(col("text")), "[^a-z0-9 ]", " ")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct().count()
    println(s"factor ${factor}x: $nDocs docs, $dictSize distinct words")

    // distributed trainer: per-round cost at this shape (4 rounds)
    val t0 = System.nanoTime()
    graft.ext.TextAnalysis.bpeTrain(docs, "text", 4)
    val distSec = (System.nanoTime() - t0) / 1e9
    println(f"distributed bpeTrain: 4 rounds in $distSec%.1f s " +
      f"= ${distSec / 4}%.2f s/round " +
      f"(30k rounds would be ${30000 * distSec / 4 / 3600}%.1f h)")

    // local trainer end-to-end at the same shape (dict build + loop;
    // the synthetic corpus's vocabulary is tiny, so this is
    // dict-build-dominated — the loop cost is probed separately below)
    val t1 = System.nanoTime()
    val ms = graft.ext.TextAnalysis.bpeTrainLocal(docs, "text", rounds,
      maxDictRows = 20000000)
    val localSec = (System.nanoTime() - t1) / 1e9
    println(f"local bpeTrainLocal: ${ms.length} rounds end-to-end in " +
      f"$localSec%.1f s at this dict shape (incl. the one distributed " +
      f"dict build)")

    // the driver merge loop at a REALISTIC dictionary: 1M distinct
    // synthetic words (lengths 3–12, 26-letter alphabet, Zipf-ish
    // frequencies) through 30k merge rounds — the production
    // vocabulary regime the corpus-derived dict above can't reach
    val rnd = new scala.util.Random(7)
    val seen = new java.util.HashSet[String]()
    val dict = Array.newBuilder[(String, Long)]
    var i = 0
    while (i < 1000000) {
      val len = 3 + rnd.nextInt(10)
      val w = new String(Array.fill(len)(('a' + rnd.nextInt(26)).toChar))
      if (seen.add(w)) {
        dict += ((w, math.max(1L, (1e9 / (i + 1)).toLong)))
        i += 1
      }
    }
    val dictArr = dict.result()
    val t2 = System.nanoTime()
    val ms2 = graft.ext.TextAnalysis.bpeTrainDict(dictArr, 30000)
    val loopSec = (System.nanoTime() - t2) / 1e9
    println(f"driver merge loop, 1M-word Zipf dict: ${ms2.length} " +
      f"rounds in $loopSec%.1f s = ${ms2.length / loopSec}%.0f " +
      f"rounds/s (vs ${distSec / 4}%.2f s/round distributed)")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does the CC-bound query family (q94/q130/q137) spend its
  * time? Splits [[graft.ext.Dedup.near]]'s cost into the
  * MinHash→LSH→verify pipeline (pairs materialized) vs the
  * connected-components iteration on top — r11 candidate #2 asked
  * whether a cheaper CC iteration is worth building; this measures
  * how much there is to win.
  *
  *   runMain graft.tools.CcProbe [factor]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val dir =
      if (factor == 1) base
      else { ScaleData.ensure(spark, base, s"/tmp/graft-scale$factor",
        factor); s"/tmp/graft-scale$factor" }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (pass <- 1 to 2) {
      println(s"-- pass $pass (${factor}x)")
      // near() materializes the verified pairs (localCheckpoint) at
      // construction, so this block times the whole
      // minhash → LSH → verify pipeline
      val res = timed("pipeline (minhash+lsh+verify)") {
        graft.ext.Dedup.near(docs, "text", "doc_id")
      }
      val nPairs = res.pairs.count()
      val edges = res.pairs.select(col("a_id"), col("b_id"))
        .localCheckpoint()
      // the CC labeling alone, on pre-materialized edges: the
      // distributed star fixpoint vs the driver union-find fast path
      val nStar = timed("cc star iteration (limit=0)") {
        graft.ext.Dedup.connectedComponents(spark, edges,
          driverEdgeLimit = 0L).count()
      }
      val nComp = timed("cc union-find fast path") {
        graft.ext.Dedup.connectedComponents(spark, edges).count()
      }
      val full = timed("near(+components) end to end") {
        graft.ext.Dedup.near(docs, "text", "doc_id").components.count()
      }
      println(s"   pairs=$nPairs starRows=$nStar ufRows=$nComp fullRows=$full")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization plan dumps: the lifecycle queries' interesting
  * plans are the INTERNAL maintenance jobs (appends/syncs run eagerly
  * while the declared query's DataFrame is being built), which never
  * appear in the returned frame's explain. This tool rebuilds those
  * internal frames exactly as the operators do and prints
  * explain("formatted") for each, so before/after plan diffs can be
  * committed under plans/r16/.
  *
  * Usage: runMain graft.tools.OptPlans <sfDir> <target> [<target>…]
  */
object OptPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val targets = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def want(t: String): Boolean = targets.isEmpty || targets.contains(t)
    def dump(label: String, df: DataFrame): Unit = {
      println(s"\n===== $label =====")
      df.explain("formatted")
    }

    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    // The per-sync/append LM count frame (q206 lmCountsCdfSync, q151
    // lmCountsAppend): what one maintenance batch computes before its
    // single CdcTable.append.
    if (want("lm_counts"))
      dump("lm_counts: per-batch (n_order, gram, cnt) frame",
        graft.ext.TextAnalysis.lmBatchCountsForPlan(
          docs.withColumn("_change_type", lit("insert"))))

    // The SAME frame in the pre-r16-optimization shape (verbatim the
    // old lmCountsCdfSync body, git 9769301): a union of three
    // stupidBackoffTables aggregates per change sign — kept here so
    // the committed before/after plan diff is reproducible.
    if (want("lm_counts_legacy")) {
      val feed = docs.withColumn("_change_type", lit("insert"))
      def signedCounts(side: DataFrame, sign: Long): DataFrame = {
        val (u, b, t) =
          graft.ext.TextAnalysis.stupidBackoffTables(side, "text")
        u.select(lit(1).as("n_order"), col("w").as("gram"),
            (col("c") * sign).as("cnt"))
          .unionByName(b.select(lit(2).as("n_order"),
            col("k").as("gram"), (col("c") * sign).as("cnt")))
          .unionByName(t.select(lit(3).as("n_order"),
            col("k").as("gram"), (col("c") * sign).as("cnt")))
      }
      dump("lm_counts_legacy: pre-r16 union-of-six shape",
        signedCounts(feed.filter(col("_change_type")
            .isin("insert", "update_postimage")), 1L)
          .unionByName(signedCounts(feed.filter(col("_change_type")
            .isin("delete", "update_preimage")), -1L)))
    }

    // min-of-2 wall-time A/B of the two LM count shapes (noop-style
    // full materialization via count() over the aggregate — both
    // sides aggregate, so nothing is pruned away).
    if (want("lm_time")) {
      def time(label: String, mk: () => DataFrame): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = mk().count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$label%-12s min=${ts.map(_._1).min}%6.2f s " +
          f"rows=${ts.head._2}")
      }
      val feed = docs.withColumn("_change_type", lit("insert"))
      time("new", () =>
        graft.ext.TextAnalysis.lmBatchCountsForPlan(feed))
      def signedCounts(side: DataFrame, sign: Long): DataFrame = {
        val (u, b, t) =
          graft.ext.TextAnalysis.stupidBackoffTables(side, "text")
        u.select(lit(1).as("n_order"), col("w").as("gram"),
            (col("c") * sign).as("cnt"))
          .unionByName(b.select(lit(2).as("n_order"),
            col("k").as("gram"), (col("c") * sign).as("cnt")))
          .unionByName(t.select(lit(3).as("n_order"),
            col("k").as("gram"), (col("c") * sign).as("cnt")))
      }
      time("legacy", () =>
        signedCounts(feed.filter(col("_change_type")
            .isin("insert", "update_postimage")), 1L)
          .unionByName(signedCounts(feed.filter(col("_change_type")
            .isin("delete", "update_preimage")), -1L)))
      time("new2", () =>
        graft.ext.TextAnalysis.lmBatchCountsForPlan(feed))
    }

    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does one pathological pair straggle a ROUGE-L stage, and does the
  * `maxTokens` guard bound it? (r13 verdict #4: the per-pair LCS is
  * O(|a|·|b|) interpreted HOF steps — pair VOLUME is bounded by the
  * candidate residue, but a single 2×50k-token pair costs 2.5·10⁹
  * lambda evaluations inside one task.)
  *
  * Times [[graft.ext.TextAnalysis.rougeL]] on ONE synthetic pair:
  * unguarded at growing sizes (250², 500², 1000² tokens — the
  * in-plan prefix-max makes a dp ROW cost O(|b|²) appends, so the
  * pair is effectively CUBIC and the slope reads off fast), then the
  * 2×50k-token pathological pair under maxTokens ∈ {500, 1000}
  * (the bound standard ROUGE tooling applies). Expected: unguarded
  * time ×8 per size doubling; a guarded 50k run costing the same as
  * its truncated size regardless of the raw document length.
  */
object RougeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def doc(n: Int, p: String) =
      (1 to n).map(i => s"$p${i % 97}").mkString(" ")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val lcs = f
      println(f"[rouge-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (lcs=$lcs)")
    }
    def run(na: Int, nb: Int, maxTokens: Int): Long =
      graft.ext.TextAnalysis.rougeL(
        Seq((1L, doc(na, "a")), (2L, doc(nb, "a"))).toDF("doc_id", "text"),
        Seq((1L, 2L)).toDF("a_id", "b_id"), "doc_id",
        maxTokens = maxTokens)
        .select(col("lcs")).as[Long].head()

    run(100, 100, 0) // warm the plan/JIT once
    for (n <- Seq(250, 500, 1000))
      time(s"unguarded ${n}x$n")(run(n, n, 0))
    for (m <- Seq(500, 1000))
      time(s"50kx50k maxTokens=$m")(run(50000, 50000, m))
    spark.stop()
  }
}

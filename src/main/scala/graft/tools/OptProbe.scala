package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-16 write-path ops (the DvProbe
  * protocol: fixed work, growing table, min-of-1 wall times after a
  * warmup row):
  *
  *   1. Scoped vs full OPTIMIZE — ONE partition of 8 selected, total
  *      table size growing 16×. The claim under test: the scoped
  *      rewrite's cost rides the SELECTED partition (flat), the full
  *      rewrite's cost rides the table (grows) — at 100 TB the
  *      difference is a partition rewrite vs a corpus rewrite.
  *   2. CHECK-constraint append overhead — the same append with 0 vs
  *      3 constraints. The claim: enforcement is in-write expression
  *      evaluation (single-pass), so the overhead is a few percent,
  *      not a second scan.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sink.CdcTable

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    println("== scoped vs full OPTIMIZE (1 of 8 partitions selected) ==")
    for (n <- Seq(100000L, 400000L, 1600000L)) {
      def mk(tag: String): String = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"optprobe_${tag}_$n").toString
        // 4 appends of 8 partitions each -> 32+ small files, ~200 B/row
        (0 until 4).foreach { b =>
          CdcTable.append(
            spark.range(n / 4).select(
              concat(lit("p"), (col("id") % 8).cast("string")).as("part"),
              concat(lit(s"$tag-$b-"), col("id").cast("string")).as("_id"),
              sha2(concat(lit(b), col("id").cast("string")), 256).as("pay")),
            dir, partitionBy = Seq("part"))
        }
        dir
      }
      val scopedDir = mk("scoped")
      val (tScoped, _) = timed(CdcTable.optimizeWhere(spark, scopedDir,
        Some("part = 'p0'"), nFiles = Some(2)))
      val fullDir = mk("full")
      val (tFull, _) = timed {
        val df = CdcTable.read(spark, fullDir).coalesce(16)
        CdcTable.replaceWith(spark, fullDir, df,
          partitionBy = Seq("part"))
      }
      println(f"n=$n%8d  scoped(1/8): $tScoped%6.2f s   full: $tFull%6.2f s")
    }

    println("== CHECK-constraint append overhead (same batch, 0 vs 3) ==")
    for (n <- Seq(400000L, 1600000L)) {
      def batch(tag: String) = spark.range(n).select(
        concat(lit(s"$tag-"), col("id").cast("string")).as("_id"),
        (col("id") % 1000).as("qty"),
        sha2(col("id").cast("string"), 256).as("pay"))
      val plain = java.nio.file.Files
        .createTempDirectory(s"consprobe_plain_$n").toString
      CdcTable.append(batch("seed").limit(10), plain, partitionBy = Nil)
      val (tPlain, _) = timed(
        CdcTable.append(batch("a"), plain, partitionBy = Nil))
      val cons = java.nio.file.Files
        .createTempDirectory(s"consprobe_cons_$n").toString
      CdcTable.append(batch("seed").limit(10), cons, partitionBy = Nil)
      CdcTable.addConstraint(spark, cons, "qty_pos", "qty >= 0")
      CdcTable.addConstraint(spark, cons, "qty_cap", "qty < 1000000")
      CdcTable.addConstraint(spark, cons, "id_set", "_id IS NOT NULL")
      val (tCons, _) = timed(
        CdcTable.append(batch("a"), cons, partitionBy = Nil))
      println(f"n=$n%8d  plain: $tPlain%6.2f s   3 constraints: " +
        f"$tCons%6.2f s   overhead: ${100 * (tCons / tPlain - 1)}%5.1f%%")
    }
    spark.stop()
  }
}

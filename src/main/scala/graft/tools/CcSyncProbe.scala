package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is the per-batch components refresh bounded by NEW-edge volume,
  * not stored-pair volume? (r12 verdict #1: the old relabel re-ran
  * connected components over ALL stored pairs on every batch —
  * O(stored pairs × batches) cumulatively.)
  *
  * For stored pair counts N ∈ {20k, 200k, 2M}: build a pairs table of
  * N disjoint 2-cliques, pay the initial fold once, then append a
  * fixed 200-edge batch (each edge MERGES two stored components, the
  * worst case: remap + member rewrite, not just inserts) and time
  * [[graft.ext.Dedup.syncComponents]] — against the old full-relabel
  * cost (CC over the whole stored pair set) at the same N.
  *
  * Expected: sync time ~flat in N (driver union–find over 200 edges +
  * two key-bounded component probes + a touched-file merge), full
  * relabel growing with N.
  */
object CcSyncProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sink.CdcTable

    for (n <- Seq(20000L, 200000L, 2000000L)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"ccprobe_$n").toString
      // N disjoint 2-cliques: (2i, 2i+1)
      val stored = spark.range(n)
        .select((col("id") * 2).as("a_id"),
          (col("id") * 2 + 1).as("b_id"), lit(0.9).as("est_jaccard"))
      CdcTable.append(stored, s"$dir/pairs", partitionBy = Nil,
        txn = Some(("probe", 1L)))
      val t0 = System.nanoTime()
      graft.ext.Dedup.syncComponents(spark, dir)
      val initSec = (System.nanoTime() - t0) / 1e9
      // the batch: 200 edges, each merging clique i with clique i+1
      // (odd member -> next even member), spread across the id range
      val step = n / 200
      val batch = spark.range(200)
        .select((col("id") * 2 * step + 1).as("a_id"),
          (col("id") * 2 * step + 2).as("b_id"),
          lit(0.9).as("est_jaccard"))
      CdcTable.append(batch, s"$dir/pairs", partitionBy = Nil,
        txn = Some(("probe", 2L)))
      val t1 = System.nanoTime()
      graft.ext.Dedup.syncComponents(spark, dir)
      val syncSec = (System.nanoTime() - t1) / 1e9
      // the OLD cost shape: full CC over all stored pairs
      val t2 = System.nanoTime()
      graft.ext.Dedup.connectedComponents(spark,
        CdcTable.read(spark, s"$dir/pairs")).count()
      val fullSec = (System.nanoTime() - t2) / 1e9
      println(f"""{"stored_pairs":$n,"init_fold_sec":$initSec%.2f,""" +
        f""""batch_sync_sec":$syncSec%.2f,""" +
        f""""full_relabel_sec":$fullSec%.2f}""")
    }
    spark.stop()
  }
}

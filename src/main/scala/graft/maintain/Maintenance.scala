package graft.maintain

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table maintenance: compaction, vacuum and snapshot versioning —
  * the engine's equivalents of the reference's OPTIMIZE / VACUUM /
  * time-travel surface (SURVEY.md §2.2 K3/K4 and §2.1 S7;
  * reference `writer/delta_writer.py:234-282`,
  * `specs/001-mongodb-cdc-delta/research.md:604-615`) without Delta:
  * snapshots are versioned directories `v=N` plus an atomically-swapped
  * `_latest` pointer, giving read-committed version/"as-of" reads over
  * plain parquet.
  */
object Maintenance {

  /** Rewrite `<dir>/data` into ~`targetFileMB`-sized files (small-file
    * compaction; reference delta_writer.py:234-266). Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
      targetFileMB: Int = 128): (Long, Long) = {
    requireNotCdcTable(dir, "compact")
    val dataDir = Paths.get(dir, "data")
    def parquetFiles = {
      val st = Files.walk(dataDir)
      try st.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet")).toVector
      finally st.close()
    }
    val before = parquetFiles
    val totalBytes = before.map(Files.size).sum
    val nFiles = math.max(1,
      (totalBytes / (targetFileMB.toLong * 1024 * 1024)).toInt)
    val df = spark.read.parquet(dataDir.toString)
    val tmp = Paths.get(dir, "data_compact_tmp")
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    // swap: data -> trash, tmp -> data (single-writer maintenance job)
    val trash = Paths.get(dir, s"data_old_${System.nanoTime()}")
    Files.move(dataDir, trash)
    Files.move(tmp, dataDir)
    deleteRecursively(trash)
    (before.size.toLong, parquetFiles.size.toLong)
  }

  /** compact/zorderBy rewrite `<dir>/data` flat — applied to a
    * CdcTable that would flatten the `data/sv=N` schema generations
    * while `_graft_version` still points at them, breaking every later
    * CdcTable.read (and potentially mixing parquet physical types in
    * one directory). Those tables compact via
    * [[graft.sink.CdcTable.compactToCurrentState]] instead. */
  private def requireNotCdcTable(dir: String, op: String): Unit =
    require(!Files.exists(Paths.get(dir, "_graft_version")),
      s"$op: $dir is a CdcTable (schema generations under data/sv=N); " +
        "use CdcTable.compactToCurrentState instead")

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      val children = try st.iterator().asScala.toVector finally st.close()
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }

  /** Z-ORDER clustering rewrite (reference `research.md:208`
    * recommendation; Delta `OPTIMIZE … ZORDER BY`): sort the data by
    * the interleaved bits of the quantile-bucketed cluster columns and
    * rewrite — range-partitioned on the z-value so parquet min/max
    * stats become selective on EVERY clustered column, enabling file
    * skipping at scale. Quantile bucketing (approxQuantile boundaries,
    * computed distributively — NOT a global-window rank, which would
    * funnel the table through one task) makes interleaving robust to
    * skewed value distributions. */
  def zorderBy(spark: SparkSession, dir: String, cols: Seq[String],
      targetFileMB: Int = 128, numFiles: Option[Int] = None): Unit = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty && cols.size <= 4, "1..4 z-order columns")
    requireNotCdcTable(dir, "zorderBy")
    val dataDir = Paths.get(dir, "data")
    val df = spark.read.parquet(dataDir.toString)
    val bits = 5 // 32 quantile buckets per column
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    // distributed quantile sketch per column → bucket boundaries
    val ranked = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val bounds = df.stat.approxQuantile(c, probs, 0.001)
      val boundsArr = bounds.map(b => s"CAST($b AS DOUBLE)")
        .mkString("array(", ", ", ")")
      // bucket = #boundaries ≤ value (linear scan over 31 boundaries).
      // Lambda variable name must not collide with any data column —
      // lambda vars shadow columns even when the column is backticked.
      d.withColumn(s"_rank$i", expr(
        s"aggregate($boundsArr, 0L, (__zacc, __zb) -> " +
          s"__zacc + IF(CAST(`$c` AS DOUBLE) >= __zb, 1L, 0L))"))
    }
    // interleave bits: z = Σ_b Σ_i rank_i[b] << (b*n + i)
    val n = cols.size
    val zExpr = (0 until bits).flatMap(b => cols.indices.map(i =>
      s"(((_rank$i >> $b) & 1) << ${b * n + i})")).mkString(" + ")
    val total = tableStats(dir).totalBytes
    val nFiles = numFiles.getOrElse(math.max(1,
      (total / (targetFileMB.toLong * 1024 * 1024)).toInt))
    val tmp = Paths.get(dir, "data_zorder_tmp")
    ranked.withColumn("_z", expr(zExpr))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop((cols.indices.map(i => s"_rank$i") :+ "_z"): _*)
      .write.mode("overwrite").parquet(tmp.toString)
    val trash = Paths.get(dir, s"data_old_${System.nanoTime()}")
    Files.move(dataDir, trash)
    Files.move(tmp, dataDir)
    deleteRecursively(trash)
  }

  /** Storage statistics for a table directory (SURVEY.md §2.6 A5;
    * reference `storage/minio_client.py:254-290` object stats and
    * Delta `DESCRIBE DETAIL`): parquet file count + total bytes. */
  final case class TableStats(numFiles: Long, totalBytes: Long)

  def tableStats(dir: String): TableStats = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return TableStats(0, 0)
    val st = Files.walk(root)
    val files = try st.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toVector
      finally st.close()
    TableStats(files.size.toLong, files.map(Files.size).sum)
  }

  // ------------------------------------------------------------------
  // Snapshot store: poor-man's time travel over parquet
  // ------------------------------------------------------------------

  private def latestPath(dir: String) = Paths.get(dir, "_latest")

  def latestVersion(dir: String): Option[Long] = {
    val p = latestPath(dir)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.toLong)
    else None
  }

  /** Write a new snapshot version; readers only see it after the
    * `_latest` pointer swaps (atomic move). Returns the new version. */
  def writeSnapshot(df: DataFrame, dir: String): Long = {
    val v = latestVersion(dir).getOrElse(-1L) + 1
    df.write.mode("overwrite").parquet(s"$dir/v=$v")
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, "._latest.tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, latestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Read the latest snapshot, or `versionAsOf` (time travel). */
  def readSnapshot(spark: SparkSession, dir: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.orElse(latestVersion(dir)).getOrElse(
      throw new IllegalStateException(s"no snapshot at $dir"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Drop snapshot versions older than the newest `keep` (vacuum;
    * reference delta_writer.py:268-282, default retention semantics).
    * Returns removed versions. */
  def vacuum(dir: String, keep: Int = 2): Seq[Long] = {
    val latest = latestVersion(dir).getOrElse(return Nil)
    val st = Files.list(Paths.get(dir))
    val versions = try st.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v=") => s.drop(2).toLong }
      .toVector.sorted
      finally st.close()
    val toDrop = versions.filter(_ <= latest).dropRight(keep)
    toDrop.foreach(v => deleteRecursively(Paths.get(dir, s"v=$v")))
    toDrop
  }
}

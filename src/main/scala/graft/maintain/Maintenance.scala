package graft.maintain

import graft.core.Fs
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table maintenance: compaction, vacuum and snapshot versioning —
  * the engine's equivalents of the reference's OPTIMIZE / VACUUM /
  * time-travel surface (SURVEY.md §2.2 K3/K4 and §2.1 S7;
  * reference `writer/delta_writer.py:234-282`,
  * `specs/001-mongodb-cdc-delta/research.md:604-615`) without Delta:
  * snapshots are versioned directories `v=N` plus an append-only
  * `_snaplog` of (version, commit-timestamp) entries, giving
  * read-committed version AND timestamp "as-of" reads over plain
  * parquet. All metadata IO goes through the Hadoop FileSystem API
  * ([[graft.core.Fs]]) so maintenance runs on file://, hdfs:// and
  * s3a:// — no local-disk assumptions.
  */
object Maintenance {

  /** Rewrite `<dir>/data` into ~`targetFileMB`-sized files (small-file
    * compaction; reference delta_writer.py:234-266). Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
      targetFileMB: Int = 128): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    requireNotCdcTable(dir, "compact")
    val dataDir = s"$dir/data"
    def parquetFiles = Fs.walkFiles(dataDir)
      .filter(_._1.getName.endsWith(".parquet"))
    val before = parquetFiles
    val totalBytes = before.map(_._2).sum
    val nFiles = math.max(1,
      (totalBytes / (targetFileMB.toLong * 1024 * 1024)).toInt)
    val df = spark.read.parquet(dataDir)
    val parts = partitionColsOf(dataDir)
    val tmp = s"$dir/data_compact_tmp"
    // a Hive-partitioned layout survives the rewrite: co-locate each
    // partition's rows, then write back partitioned
    val writer = (if (parts.isEmpty) df.repartition(nFiles)
      else df.repartition(nFiles, parts.map(col): _*))
      .write.mode("overwrite")
    (if (parts.isEmpty) writer else writer.partitionBy(parts: _*))
      .parquet(tmp)
    // swap: data -> trash, tmp -> data (single-writer maintenance job)
    val trash = s"$dir/data_old_${System.nanoTime()}"
    Fs.rename(dataDir, trash)
    Fs.rename(tmp, dataDir)
    Fs.delete(trash, recursive = true)
    (before.size.toLong, parquetFiles.size.toLong)
  }

  /** Top-level Hive partition columns of a data dir (`key=value`
    * children), in directory order. */
  private def partitionColsOf(dataDir: String): Seq[String] =
    Fs.list(dataDir)
      .filter(n => n.contains("=") && !n.startsWith("_") &&
        !n.startsWith("."))
      .map(_.split("=", 2)(0)).distinct

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
    require(cols.nonEmpty && cols.size <= 4, "1..4 z-order columns")
    requireNotCdcTable(dir, "zorderBy")
    val dataDir = s"$dir/data"
    val df = spark.read.parquet(dataDir)
    val total = tableStats(dir).totalBytes
    val nFiles = numFiles.getOrElse(math.max(1,
      (total / (targetFileMB.toLong * 1024 * 1024)).toInt))
    val parts = partitionColsOf(dataDir)
    val tmp = s"$dir/data_zorder_tmp"
    // Hive partitioning survives: cluster WITHIN partitions (Delta's
    // OPTIMIZE ZORDER semantics) by ranging on (partCols, z) so each
    // task holds one partition range in z order before partitionBy
    val clustered = zorderFrame(df, cols, nFiles, leading = parts)
    (if (parts.isEmpty) clustered.write.mode("overwrite")
     else clustered.write.mode("overwrite").partitionBy(parts: _*))
      .parquet(tmp)
    val trash = s"$dir/data_old_${System.nanoTime()}"
    Fs.rename(dataDir, trash)
    Fs.rename(tmp, dataDir)
    Fs.delete(trash, recursive = true)
    ()
  }

  /** The reusable z-order clustering transform: returns `df`
    * range-partitioned and sorted on the interleaved z-value of the
    * quantile-bucketed `cols` (writers decide where it lands — the
    * plain-dir swap above, or a CdcTable `replace` manifest via
    * [[graft.sink.CdcTable.compactToCurrentState]]). */
  private[graft] def zorderFrame(df: DataFrame, cols: Seq[String],
      nFiles: Int, leading: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty && cols.size <= 4, "1..4 z-order columns")
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
    val order = leading.map(col) :+ col("_z")
    ranked.withColumn("_z", expr(zExpr))
      .repartitionByRange(nFiles, order: _*)
      .sortWithinPartitions(order: _*)
      .drop((cols.indices.map(i => s"_rank$i") :+ "_z"): _*)
  }

  /** compact/zorderBy rewrite `<dir>/data` flat — applied to a
    * CdcTable that would orphan every manifest-referenced file while
    * the commit log still points at them, breaking every later
    * CdcTable.read. Those tables compact via
    * [[graft.sink.CdcTable.compactToCurrentState]] instead. */
  private def requireNotCdcTable(dir: String, op: String): Unit =
    require(!Fs.exists(s"$dir/_graft_log") &&
        !Fs.exists(s"$dir/_graft_version"),
      s"$op: $dir is a CdcTable (manifest-committed data files); " +
        "use CdcTable.compactToCurrentState instead")

  /** Storage statistics for a table directory (SURVEY.md §2.6 A5;
    * reference `storage/minio_client.py:254-290` object stats and
    * Delta `DESCRIBE DETAIL`): parquet file count + total bytes. */
  final case class TableStats(numFiles: Long, totalBytes: Long)

  def tableStats(dir: String): TableStats = {
    val files = Fs.walkFiles(dir)
      .filter(_._1.getName.endsWith(".parquet"))
    TableStats(files.size.toLong, files.map(_._2).sum)
  }

  // ------------------------------------------------------------------
  // Snapshot store: time travel over parquet (version + timestamp)
  // ------------------------------------------------------------------

  private def snapLogDir(dir: String) = s"$dir/_snaplog"
  private def snapPath(dir: String, v: Long) =
    f"${snapLogDir(dir)}/$v%020d.snap"

  /** Versions of a LEGACY (pre-`_snaplog`) snapshot store: the old
    * layout committed versions via a `_latest` pointer file. Without
    * this, such a dir would read as "no snapshot" and the next
    * [[writeSnapshot]] would compute v=0 and silently OVERWRITE the
    * existing v=0 data. Entry timestamps fall back to each version
    * dir's modification time. Only consulted when `_latest` exists —
    * a bare v=N dir without either marker is an in-flight
    * (uncommitted) write and must stay invisible. */
  private def legacyVersions(dir: String): Seq[(Long, Long)] =
    if (!Fs.exists(s"$dir/_latest")) Nil
    else Fs.list(dir)
      .filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toLong).toOption)
      .sorted
      .map { v =>
        val (fs, p) = Fs(s"$dir/v=$v")
        v -> fs.getFileStatus(p).getModificationTime
      }

  /** (version, commitTs) entries in version order — `_snaplog` entries
    * plus any legacy-layout versions they don't already cover. */
  def snapshotLog(dir: String): Seq[(Long, Long)] = {
    val persisted = Fs.list(snapLogDir(dir))
      .filter(_.endsWith(".snap")).sorted
      .flatMap { n =>
        val v = n.stripSuffix(".snap").toLong
        Fs.readString(s"${snapLogDir(dir)}/$n")
          .map(c => v -> c.trim.stripPrefix("ts=").toLong)
      }
    val known = persisted.map(_._1).toSet
    (legacyVersions(dir).filterNot(e => known(e._1)) ++ persisted)
      .sortBy(_._1)
  }

  def latestVersion(dir: String): Option[Long] =
    snapshotLog(dir).lastOption.map(_._1)

  /** Write a new snapshot version; readers only see it after its
    * `_snaplog` entry commits (atomic create-exclusive — the data dir
    * alone is invisible). Returns the new version. `tsMillis`
    * overrides the recorded commit timestamp (tests / backfills). */
  def writeSnapshot(df: DataFrame, dir: String,
      tsMillis: Option[Long] = None): Long = {
    val v = latestVersion(dir).getOrElse(-1L) + 1
    df.write.mode("overwrite").parquet(s"$dir/v=$v")
    val ts = tsMillis.getOrElse(System.currentTimeMillis())
    require(Fs.createExclusive(snapPath(dir, v), s"ts=$ts"),
      s"snapshot $v already committed at $dir — concurrent writers?")
    v
  }

  /** Read the latest snapshot, `versionAsOf`, or `timestampAsOf` (the
    * newest version whose commit timestamp is ≤ the given millis —
    * reference research.md:604-615 specifies both travel modes). */
  def readSnapshot(spark: SparkSession, dir: String,
      versionAsOf: Option[Long] = None,
      timestampAsOf: Option[Long] = None): DataFrame = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "specify at most one of versionAsOf / timestampAsOf")
    val v = versionAsOf
      .orElse(timestampAsOf.map { ts =>
        val log = snapshotLog(dir)
        log.filter(_._2 <= ts).lastOption.map(_._1).getOrElse(
          throw new IllegalArgumentException(
            s"no snapshot at or before ts=$ts in $dir " +
              s"(earliest is ${log.headOption.map(_._2)})"))
      })
      .orElse(latestVersion(dir))
      .getOrElse(throw new IllegalStateException(s"no snapshot at $dir"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Drop snapshot versions older than the newest `keep` (vacuum;
    * reference delta_writer.py:268-282, default retention semantics).
    * Returns removed versions. */
  def vacuum(dir: String, keep: Int = 2): Seq[Long] = {
    val versions = snapshotLog(dir).map(_._1)
    val toDrop = versions.dropRight(keep)
    toDrop.foreach { v =>
      Fs.delete(s"$dir/v=$v", recursive = true)
      Fs.delete(snapPath(dir, v))
    }
    toDrop
  }
}

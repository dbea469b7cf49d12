package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import graft.core.SchemaMerge
import graft.core.SchemaMerge.MergeMode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** A parquet-backed CDC table with schema evolution: the engine's
  * stand-in for the reference's Delta sink (`writer/delta_writer.py:
  * 55-201`) in this Delta-less environment — same contract:
  * append-only event log, partitioned by `_ingestion_date`, schema
  * merged (widened) on every batch, version counter bumped on change.
  *
  * Layout (schema generations):
  *
  *   <dir>/data/sv=N/...          parquet written under schema vN
  *                                (partitioned by `_ingestion_date`)
  *   <dir>/_graft_schema_vN.json  schema of generation N
  *   <dir>/_graft_version         current generation (atomic swap)
  *
  * Every incoming batch is cast to the merged schema BEFORE the write
  * (SchemaMerge.castTo), so each generation directory is internally
  * consistent; widening changes (int64→double …) open a NEW generation
  * instead of mixing parquet physical types in one directory — Spark's
  * parquet reader refuses cross-type reads, and this is also how the
  * read path stays scan-only at 100 TB: each generation is scanned
  * under its own schema and unioned with a cast projection, no file
  * rewrite ever happens on schema change (zero-downtime evolution,
  * reference SC-007 `spec.md:336`).
  */
object CdcTable {

  private def versionPath(dir: String) = Paths.get(dir, "_graft_version")
  private def schemaPath(dir: String, v: Long) =
    Paths.get(dir, s"_graft_schema_v$v.json")

  def currentVersion(dir: String): Long = {
    val p = versionPath(dir)
    if (Files.exists(p))
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  def schemaOf(dir: String, v: Long): Option[StructType] = {
    val p = schemaPath(dir, v)
    if (Files.exists(p))
      Some(DataType.fromJson(new String(Files.readAllBytes(p),
        StandardCharsets.UTF_8)).asInstanceOf[StructType])
    else None
  }

  def currentSchema(dir: String): Option[StructType] = {
    val v = currentVersion(dir)
    if (v == 0) None else schemaOf(dir, v)
  }

  private def txnPath(dir: String) = Paths.get(dir, "_graft_txn")

  /** Last committed (appId, version) for idempotent replays. */
  def lastTxn(dir: String): Option[(String, Long)] = {
    val p = txnPath(dir)
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .trim.split(':') match {
      case Array(app, v) => Some((app, v.toLong))
      case _ => None
    }
  }

  private def commitTxn(dir: String, appId: String, version: Long): Unit = {
    val tmp = Paths.get(dir, "._graft_txn.tmp")
    Files.write(tmp, s"$appId:$version".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, txnPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append a batch, merging schemas under `mode`. A schema change
    * opens a new generation. Returns the schema version after the
    * write. Single-writer semantics (the streaming sink is the only
    * writer, as in the reference).
    *
    * `txn = Some((appId, version))` makes replays idempotent — the
    * foreachBatch exactly-once pattern (Delta's txnAppId/txnVersion;
    * the reference tracks `_kafka_offset` for the same purpose,
    * `schema_inferrer.py:488`): a batch whose version was already
    * committed for this appId is skipped. The txn marker is written
    * after the data, so the guarantee is idempotent-replay (retries of
    * an uncommitted batch may duplicate if the process dies between
    * data write and marker — parquet has no atomic multi-file txn;
    * Delta closes that gap with its log). */
  def append(batch: DataFrame, dir: String, mode: MergeMode = SchemaMerge.Auto,
      partitionBy: Seq[String] = Seq("_ingestion_date"),
      txn: Option[(String, Long)] = None): Long = {
    txn.foreach { case (app, v) =>
      lastTxn(dir) match {
        case Some((lastApp, lastV)) if lastApp == app && lastV >= v =>
          return currentVersion(dir) // replayed batch — skip
        case _ => ()
      }
    }
    val existing = currentSchema(dir)
    val merged = existing match {
      case Some(e) => SchemaMerge.merge(e, batch.schema, mode)
      case None => batch.schema
    }
    val v = if (existing.contains(merged)) currentVersion(dir)
      else {
        val nv = currentVersion(dir) + 1
        Files.createDirectories(Paths.get(dir))
        val tmp = Paths.get(dir, s"._graft_schema_v$nv.json.tmp")
        Files.write(tmp, merged.json.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, schemaPath(dir, nv), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        nv
      }
    val out = SchemaMerge.castTo(batch, merged)
    val writer = out.write.mode("append")
    val partCols = partitionBy.filter(merged.fieldNames.contains)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(s"$dir/data/sv=$v")
    if (v != currentVersion(dir)) {
      val tv = Paths.get(dir, "._graft_version.tmp")
      Files.write(tv, v.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tv, versionPath(dir), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    txn.foreach { case (app, ver) => commitTxn(dir, app, ver) }
    v
  }

  /** Read the table under its current merged schema: one scan per
    * schema generation, each cast to the current schema and unioned.
    * Older generations are typically few (schema churn is rare), so
    * this stays a handful of parallel scans. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val cur = currentVersion(dir)
    require(cur > 0, s"no CdcTable at $dir")
    val target = schemaOf(dir, cur).get
    val gens = (1L to cur).flatMap { v =>
      val p = Paths.get(dir, "data", s"sv=$v")
      schemaOf(dir, v).filter(_ => Files.exists(p)).map { s =>
        SchemaMerge.castTo(spark.read.schema(s).parquet(p.toString), target)
      }
    }
    gens.reduce(_ unionByName _)
  }

  /** All generation schemas (history — reference schema_manager
    * version tracking `writer/schema_manager.py:106-148`). */
  def schemaHistory(dir: String): Seq[(Long, StructType)] =
    (1L to currentVersion(dir)).flatMap(v => schemaOf(dir, v).map(v -> _))

  /** Upsert-mode compaction (the reference's declared `upsert` write
    * mode, `config.py:47`, which it never implements; SURVEY.md §7
    * step 5): collapse the append-only event log to its current state
    * — latest event per key wins, soft deletes drop out — and rewrite
    * as a single fresh generation under the current schema. Run
    * periodically (like OPTIMIZE); readers see merge-on-read current
    * state via [[graft.query.CurrentState]] between compactions. */
  def compactToCurrentState(spark: SparkSession, dir: String,
      idCol: String = "_id"): Long = {
    import java.nio.file.StandardCopyOption
    val cur = currentVersion(dir)
    require(cur > 0, s"no CdcTable at $dir")
    val state = graft.query.CurrentState(read(spark, dir), idCol)
    val tmp = Paths.get(dir, "data_upsert_tmp")
    state.write.mode("overwrite").parquet(tmp.toString)
    val nv = cur + 1
    val ts = Paths.get(dir, s"._graft_schema_v$nv.json.tmp")
    Files.write(ts, schemaOf(dir, cur).get.json
      .getBytes(StandardCharsets.UTF_8))
    Files.move(ts, schemaPath(dir, nv), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // swap: all old generations out, compacted state in as sv=nv
    val dataDir = Paths.get(dir, "data")
    val trash = Paths.get(dir, s"data_old_${System.nanoTime()}")
    Files.move(dataDir, trash)
    Files.createDirectories(dataDir)
    Files.move(tmp, dataDir.resolve(s"sv=$nv"))
    val tv = Paths.get(dir, "._graft_version.tmp")
    Files.write(tv, nv.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tv, versionPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(trash)
    nv
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      val children = try st.iterator().asScala.toVector finally st.close()
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }
}

package graft.sink

import java.util.UUID

import graft.core.{CommitArbiter, Fs, SchemaMerge}
import graft.core.SchemaMerge.MergeMode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** A parquet-backed CDC table with schema evolution and ATOMIC commits:
  * the engine's stand-in for the reference's Delta sink
  * (`writer/delta_writer.py:55-201`, ACID via the Delta log
  * `delta_writer.py:129-140`) in this Delta-less environment — same
  * contract: append-only event log, partitioned by `_ingestion_date`,
  * schema merged (widened) on every batch, version bumped on change.
  *
  * Layout (manifest commit log):
  *
  *   <dir>/data/batch-<uuid>/...   parquet files of one committed batch
  *                                 (partitioned by `_ingestion_date`)
  *   <dir>/_graft_log/<n>.commit   one atomically-created manifest per
  *                                 commit: schema + the exact file list
  *                                 + txn coords + timestamp
  *
  * A batch is VISIBLE only once its manifest commits — data files are
  * staged first under a fresh `batch-<uuid>` directory and referenced
  * by the manifest, so a crash anywhere before the manifest leaves
  * only unreferenced orphans (cleaned by [[vacuumOrphans]]) and a
  * replay cannot duplicate rows: the manifest IS the txn marker
  * (single atomic create-exclusive file, no data-then-marker window).
  * All metadata IO goes through the Hadoop FileSystem API
  * ([[graft.core.Fs]]) so the sink runs on file://, hdfs:// and s3a://.
  *
  * Schema generations: every commit records its full schema and a
  * schema version `sv`; widening changes (int64→double …) bump `sv`
  * instead of mixing parquet physical types in one scan — Spark's
  * parquet reader refuses cross-type reads — and the read path stays
  * scan-only at 100 TB: each generation is scanned under its own
  * schema and unioned with a cast projection, no file rewrite ever
  * happens on schema change (zero-downtime evolution, reference SC-007
  * `spec.md:336`).
  */
object CdcTable {

  /** One committed manifest. `files` are dir-relative. `stub` marks a
    * checkpoint-condensed superseded commit whose file list was
    * dropped (the raw commit file, if not yet vacuumed, still has it —
    * [[readAsOf]] hydrates from there). */
  final case class Commit(
      commit: Long,
      schemaVersion: Long,
      action: String, // "append" | "replace" | "rename"
      ts: Long,
      txn: Option[(String, Long)],
      schema: StructType,
      files: Seq[String],
      stub: Boolean = false,
      /** Column-mapping marker (`GRAFT RENAME COLUMN` / `GRAFT DROP
        * COLUMN` — Delta column-mapping parity, metadata-only): files
        * committed BEFORE this commit store the column under the old
        * physical name; [[readCommits]] applies the ordered chain
        * after each earlier generation's scan, so no data rewrites.
        * `(from, to)` renames; `(from, "")` DROPS `from` — encoded in
        * the same field so every marker-carrying path (restore,
        * clone, checkpoint stubs, CDF, rewrite subsets) handles both.
        * The commit carries the post-op schema and no files. */
      rename: Option[(String, String)] = None,
      /** Per-file column min/max/hasNull for manifest-level data
        * skipping ([[FileStats]]); keys are the rel paths in `files`. */
      stats: Map[String, Map[String, FileStats.ColStats]] = Map.empty,
      /** Per-file row counts (footer-derived at commit time) — lets
        * [[rowCountEstimate]] size the table without touching data.
        * Files committed before this field existed are simply absent. */
      fileRows: Map[String, Long] = Map.empty,
      /** Per-file byte sizes (free at commit time — the footer read's
        * own FileStatus): [[detail]] answers live bytes and the
        * small-file OPTIMIZE selects its rewrite set from the
        * manifest alone, instead of a listStatus storm over a
        * million-file table. Legacy files are absent (detail falls
        * back to batched stats for exactly those). */
      fileBytes: Map[String, Long] = Map.empty,
      /** Per-file Bloom filters for equality skipping on
        * high-cardinality unclustered columns ([[FileStats]] bloom
        * section): rel path → column → packed base64 bits. Present
        * only for columns the append requested via `bloomCols`. */
      blooms: Map[String, Map[String, String]] = Map.empty,
      /** DML change files (Delta Change Data Feed `_change_data`
        * parity): dir-relative parquet files under `_changes/batch-…`
        * holding the logical row changes this commit made — the
        * commit's table schema plus a `_change_type` column
        * (`delete` / `update_preimage` / `update_postimage` /
        * `insert`). Written by the keyed/predicate DML paths only;
        * physical rewrites (compaction, OPTIMIZE, restore) change no
        * logical rows and carry none. [[readChanges]] serves them. */
      changeFiles: Seq[String] = Nil,
      /** Deletion-vector sidecars (merge-on-read DELETE): dir-relative
        * parquet files under `_dv/batch-…` of (_graft_file,
        * _graft_pos) rows — positions deleted from still-live data
        * files. Applied at read by [[readCommits]]; folded away by any
        * full rewrite (compaction). A `replace` commit carries the
        * union of prior live sidecars forward. */
      dvFiles: Seq[String] = Nil,
      /** FULL-FILE delete shortcut (Delta CDF's remove-file
        * optimization): data files EVERY live row of which this DML
        * commit deleted. They drop from the manifest without any
        * change-file write — a mass `DELETE WHERE lang = 'xx'` must
        * not re-write preimages of whole partitions — and
        * [[readChanges]] derives their `delete` rows from the files
        * themselves (on disk until vacuum; the usual feed horizon). */
      removedFiles: Seq[String] = Nil,
      /** CHECK-constraint ops this commit applies (Delta
        * `ALTER TABLE … ADD CONSTRAINT` parity). The current
        * constraint set is the ordered fold of these ops over the
        * FULL log ([[constraintsOf]]) — replace commits do not
        * re-state constraints, exactly like the rename chain. Normal
        * ops ride on dedicated fileless `action="constraint"`
        * commits; clone/restore re-state or diff the set on their
        * first commit so derived tables inherit it. */
      constraintOps: Seq[ConsOp] = Nil,
      /** Reader-required format features (Delta reader protocol
        * parity): stamped automatically by [[commit]] from what the
        * commit actually uses ([[stampFeatures]]). [[log]] refuses a
        * table requiring a feature this build doesn't know
        * ([[SupportedReaderFeatures]]) — a reader that silently
        * ignored e.g. an unknown DV-like sidecar would resurrect
        * deleted rows. Absent on pre-feature commits (`Nil`). */
      requires: Seq[String] = Nil,
      /** Writer-required features (Delta writer protocol parity):
        * reading needs nothing, but a WRITER that doesn't implement
        * them would corrupt the contract (e.g. append without CHECK
        * enforcement, DML without change files). [[commit]] refuses
        * to write to a table carrying an unknown one. */
      writerRequires: Seq[String] = Nil,
      /** Table-property ops (Delta TBLPROPERTIES parity): `(key,
        * Some(value))` sets, `(key, None)` unsets; the current map is
        * the ordered fold over the FULL log ([[propertiesOf]], the
        * constraint/rename pattern). Properties are writer-honored
        * metadata — `graft.vacuum.retainHours` overrides the VACUUM
        * default, so property commits stamp the `table-properties`
        * writer feature (an old writer vacuuming at the 7-day default
        * under a 30-day property would break long time travel). */
      propOps: Seq[(String, Option[String])] = Nil)

  /** Format features this build reads correctly. A table whose log
    * requires anything outside this set fails LOUDLY at open. */
  val SupportedReaderFeatures: Set[String] =
    Set("deletion-vectors", "column-mapping")

  /** Features this build writes correctly (superset of reader —
    * every writer is also a reader). */
  val SupportedWriterFeatures: Set[String] =
    SupportedReaderFeatures ++
      Set("check-constraints", "change-data-feed", "table-properties")

  /** Derive the feature stamps from what a commit actually carries —
    * centralized in [[commit]] so no write path can forget one. The
    * stamps protect FUTURE cross-version fleets: every reader/writer
    * from this build on validates them, so the next format feature
    * degrades old binaries loudly instead of silently mis-reading. */
  private def stampFeatures(c: Commit): Commit = {
    val r = (if (c.dvFiles.nonEmpty) Seq("deletion-vectors") else Nil) ++
      (if (c.rename.isDefined) Seq("column-mapping") else Nil)
    val w = (if (c.constraintOps.exists(_.add))
        Seq("check-constraints") else Nil) ++
      (if (c.changeFiles.nonEmpty || c.removedFiles.nonEmpty)
        Seq("change-data-feed") else Nil) ++
      (if (c.propOps.exists(_._2.isDefined))
        Seq("table-properties") else Nil)
    if (r.isEmpty && w.isEmpty) c
    else c.copy(requires = (c.requires ++ r).distinct,
      writerRequires = (c.writerRequires ++ w).distinct)
  }

  /** One CHECK-constraint op: `add` introduces `name` with the SQL
    * boolean `expr` (violation iff the expression is FALSE — NULL
    * passes, standard SQL CHECK semantics); `add=false` drops `name`.
    * `cols` are the table columns the expression references, captured
    * at ADD time so RENAME/DROP COLUMN can reject exactly (no
    * re-parsing of the expression on the metadata-only paths). */
  final case class ConsOp(add: Boolean, name: String, expr: String,
      cols: Seq[String])

  /** Resolve a manifest file entry to a readable path. Entries are
    * normally dir-RELATIVE (`data/batch-…`) so tables relocate freely;
    * a SHALLOW CLONE ([[cloneShallow]]) borrows the source's files by
    * absolute path / URI instead — those pass through unchanged. */
  private def resolve(dir: String, f: String): String =
    if (f.startsWith("/") || f.contains("://")) f else s"$dir/$f"

  /** The identity a manifest entry shares with [[relPathCol]]'s
    * row-level extraction: the last `data/batch-…` suffix. Relative
    * entries ARE that suffix already; absolute borrowed entries
    * (shallow clones) reduce to it, so file-keyed rewrites key the
    * same rows to the same manifest entries either way. */
  private def fileKey(f: String): String = {
    val i = f.lastIndexOf("/data/batch-")
    if (i >= 0) f.substring(i + 1) else f
  }

  private def logDir(dir: String) = s"$dir/_graft_log"
  private def commitPath(dir: String, n: Long) =
    f"${logDir(dir)}/$n%020d.commit"

  private def render(c: Commit): String = {
    val head = Seq(
      s"commit=${c.commit}", s"sv=${c.schemaVersion}",
      s"action=${c.action}", s"ts=${c.ts}") ++
      (if (c.stub) Seq("stub=1") else Nil) ++
      c.txn.toSeq.flatMap { case (a, v) =>
        Seq(s"txnApp=$a", s"txnVer=$v") } ++
      c.rename.toSeq.flatMap { case (f, t) =>
        Seq(s"renameFrom=$f", s"renameTo=$t") } ++
      Seq(s"schema=${c.schema.json}") ++
      c.files.map(f => s"file=$f") ++
      c.stats.toSeq.sortBy(_._1).flatMap { case (rel, cols) =>
        cols.toSeq.sortBy(_._1).map { case (col, cs) =>
          s"stat=${FileStats.render(rel, col, cs)}" }
      } ++
      c.fileRows.toSeq.sortBy(_._1).map { case (rel, n) =>
        s"frows=${FileStats.renderRows(rel, n)}" } ++
      c.fileBytes.toSeq.sortBy(_._1).map { case (rel, n) =>
        s"fbytes=${FileStats.renderRows(rel, n)}" } ++
      c.blooms.toSeq.sortBy(_._1).flatMap { case (rel, cols) =>
        cols.toSeq.sortBy(_._1).map { case (col, bits) =>
          s"bloom=${FileStats.renderBloom(rel, col, bits)}" }
      } ++
      c.changeFiles.map(f => s"cfile=$f") ++
      c.dvFiles.map(f => s"dvfile=$f") ++
      c.removedFiles.map(f => s"rfile=$f") ++
      c.constraintOps.map(renderCons) ++
      c.propOps.map {
        case (k, Some(v)) => s"prop=set:${b64(k)}:${b64(v)}"
        case (k, None) => s"prop=unset:${b64(k)}"
      } ++
      c.requires.map(f => s"requires=$f") ++
      c.writerRequires.map(f => s"wrequires=$f")
    head.mkString("\n")
  }

  private def parseProp(payload: String): (String, Option[String]) =
    payload.split(":", -1) match {
      case Array("set", k, v) => (unb64(k), Some(unb64(v)))
      case Array("unset", k) => (unb64(k), None)
      case _ => throw new IllegalArgumentException(
        s"unparseable property op: $payload")
    }

  // Constraint-op wire form. Names, expressions and column names are
  // base64ed individually: a CHECK expression legitimately contains
  // '=', ':' and newlines, any of which would tear the line format.
  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s),
      java.nio.charset.StandardCharsets.UTF_8)
  private def renderCons(op: ConsOp): String =
    if (op.add)
      s"cons=add:${b64(op.name)}:${b64(op.expr)}:" +
        op.cols.map(b64).mkString(",")
    else s"cons=drop:${b64(op.name)}"
  private def parseCons(payload: String): ConsOp =
    payload.split(":", -1) match {
      case Array("drop", n) => ConsOp(add = false, unb64(n), "", Nil)
      case Array("add", n, e, cs) => ConsOp(add = true, unb64(n),
        unb64(e), cs.split(",").toIndexedSeq.filter(_.nonEmpty).map(unb64))
      case _ => throw new IllegalArgumentException(
        s"unparseable constraint op: $payload")
    }

  private def parse(content: String): Commit = {
    val kv = content.linesIterator.toSeq.flatMap { line =>
      val i = line.indexOf('=')
      if (i < 0) None else Some(line.substring(0, i) -> line.substring(i + 1))
    }
    def one(k: String) = kv.collectFirst { case (`k`, v) => v }
    Commit(
      commit = one("commit").get.toLong,
      schemaVersion = one("sv").get.toLong,
      action = one("action").getOrElse("append"),
      ts = one("ts").map(_.toLong).getOrElse(0L),
      txn = for (a <- one("txnApp"); v <- one("txnVer"))
        yield (a, v.toLong),
      schema = DataType.fromJson(one("schema").get)
        .asInstanceOf[StructType],
      files = kv.collect { case ("file", f) => f },
      stub = one("stub").contains("1"),
      rename = for (f <- one("renameFrom"); t <- one("renameTo"))
        yield (f, t),
      stats = kv.collect { case ("stat", payload) => payload }
        .flatMap(FileStats.parse)
        .groupBy(_._1)
        .map { case (rel, entries) =>
          rel -> entries.map(e => e._2 -> e._3).toMap },
      fileRows = kv.collect { case ("frows", payload) => payload }
        .flatMap(FileStats.parseRows).toMap,
      fileBytes = kv.collect { case ("fbytes", payload) => payload }
        .flatMap(FileStats.parseRows).toMap,
      blooms = kv.collect { case ("bloom", payload) => payload }
        .flatMap(FileStats.parseBloom)
        .groupBy(_._1)
        .map { case (rel, entries) =>
          rel -> entries.map(e => e._2 -> e._3).toMap },
      changeFiles = kv.collect { case ("cfile", f) => f },
      dvFiles = kv.collect { case ("dvfile", f) => f },
      removedFiles = kv.collect { case ("rfile", f) => f },
      constraintOps = kv.collect { case ("cons", p) => parseCons(p) },
      requires = kv.collect { case ("requires", f) => f },
      writerRequires = kv.collect { case ("wrequires", f) => f },
      propOps = kv.collect { case ("prop", p) => parseProp(p) })
  }

  /** Write a consolidated checkpoint every this many commits so log
    * reads stay O(interval) file reads instead of O(total commits) —
    * the Delta checkpoint pattern: at one commit per micro-batch the
    * raw log is thousands of files within days, and every append would
    * otherwise re-read all of them (an S3 GET storm at 100 TB scale). */
  private val CheckpointInterval = 10L
  private val CheckpointSep = "\n===\n"

  /** One checkpoint file replays as the full log up to its commit id.
    * Superseded commits (before the last `replace`) are kept as stubs
    * without file lists — their schemas and txn high-water marks still
    * matter, their files are vacuumable orphans. */
  private def writeCheckpoint(dir: String, commits: Seq[Commit]): Unit = {
    val eIdx = commits.lastIndexWhere(_.action == "replace")
    val condensed = commits.zipWithIndex.map { case (c, i) =>
      if (eIdx >= 0 && i < eIdx)
        c.copy(files = Nil, stub = true, stats = Map.empty,
          fileRows = Map.empty, fileBytes = Map.empty,
          blooms = Map.empty,
          changeFiles = Nil, dvFiles = Nil,
          removedFiles = Nil) // hydrate from raw
      else c
    }
    Fs.writeString(
      f"${logDir(dir)}/${commits.last.commit}%020d.checkpoint",
      condensed.map(render).mkString(CheckpointSep))
  }

  /** Parsed-manifest cache, keyed by absolute log-file path →
    * (length, mtime, parsed commits). Commit files are immutable once
    * fully written (create-exclusive, then content) and checkpoints
    * are rewritten only under a new condensation — either way the
    * (length, mtime) pair changes with the bytes, so a stale entry
    * cannot serve: the listStatus every `log()` already pays
    * revalidates each hit for free. Only SUCCESSFUL parses enter the
    * cache (a torn in-flight file stays uncached and is re-read).
    * Cross-process writers create NEW files, which are cache misses
    * by construction. Bounded: cleared wholesale past `LogCacheMax`
    * entries (the working set is the live tables of one JVM). */
  private val logParseCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long, IndexedSeq[Commit])]()
  private val LogCacheMax = 65536

  private def cachedParse(path: String, len: Long, mtime: Long)(
      parseAll: String => IndexedSeq[Commit])
      : Option[IndexedSeq[Commit]] = {
    val hit = logParseCache.get(path)
    if (hit != null && hit._1 == len && hit._2 == mtime)
      return Some(hit._3)
    val parsed = scala.util.Try(
      Fs.readString(path).map(parseAll)).toOption.flatten
    parsed.foreach { cs =>
      if (logParseCache.size() >= LogCacheMax) logParseCache.clear()
      logParseCache.put(path, (len, mtime, cs))
    }
    parsed
  }

  /** The committed log, in commit order: latest readable checkpoint +
    * only the commit files after it. */
  def log(dir: String): Seq[Commit] = {
    val infos = Fs.listWithInfo(logDir(dir))
    val base = infos.filter(_._1.endsWith(".checkpoint"))
      .sortBy(_._1).reverse.iterator
      .map { case (n, len, mt) =>
        cachedParse(s"${logDir(dir)}/$n", len, mt)(s =>
          s.split(java.util.regex.Pattern.quote(CheckpointSep))
            .toIndexedSeq.map(parse))
      }
      .collectFirst { case Some(cs) => cs } // torn → older
      .getOrElse(Vector.empty)
    val after = base.lastOption.map(_.commit).getOrElse(0L)
    // A commit file becomes visible at create time but its content
    // lands a moment later (create-exclusive, then write) — a racing
    // reader may catch it empty/torn. Taking the longest PARSEABLE
    // prefix keeps every reader on a consistent snapshot: an in-flight
    // trailing commit is simply not visible yet.
    val commits =
      base ++ infos.filter(_._1.endsWith(".commit"))
        .sortBy(_._1)
        .filter(_._1.stripSuffix(".commit").toLong > after)
        .map { case (n, len, mt) =>
          cachedParse(s"${logDir(dir)}/$n", len, mt)(s =>
            IndexedSeq(parse(s)))
        }
        .takeWhile(_.isDefined).flatMap(_.get)
    // reader protocol gate — OUTSIDE the torn-prefix Try above: a
    // feature this build can't read must fail the table open loudly,
    // never be silently truncated away as an "in-flight" commit
    val unknown = commits.flatMap(_.requires).distinct
      .filterNot(SupportedReaderFeatures)
    if (unknown.nonEmpty) throw new IllegalStateException(
      s"table at $dir requires reader feature(s) this build does " +
        s"not support: ${unknown.mkString(", ")} (supported: " +
        s"${SupportedReaderFeatures.toSeq.sorted.mkString(", ")}) — " +
        "upgrade the library to read this table")
    commits
  }

  /** Commits contributing to the current state: everything from the
    * last `replace` (compaction rewrites the whole table) onward. */
  private def effective(commits: Seq[Commit]): Seq[Commit] = {
    val i = commits.lastIndexWhere(_.action == "replace")
    if (i < 0) commits else commits.drop(i)
  }

  /** `GRAFT RENAME COLUMN` — Delta column-mapping parity,
    * METADATA-ONLY: one commit records the (from → to) mapping with
    * the renamed schema and no files; nothing rewrites (at 100 TB a
    * rename is one manifest write, not a petabyte of IO). Files
    * committed before the rename keep the old PHYSICAL name on disk;
    * every read path ([[readCommits]]) applies the ordered rename
    * chain after each earlier generation's scan, so old and new files
    * read seamlessly under the new logical name, and time travel to a
    * pre-rename snapshot still shows the old name (the chain is
    * range-bounded). Renames compose (a→b then b→c, swaps via a
    * temporary) in commit order.
    *
    * Costs and contracts, stated honestly:
    *   - the rename bumps the schema version, so the NEXT keyed /
    *     predicate DML modernizes pre-rename files (the pre-existing
    *     evolution rule: a replace commit carries one schema, so
    *     carried-by-reference files must already match it);
    *   - a stale writer appending under the OLD name afterwards
    *     widens the schema with a fresh column of that name (exactly
    *     as any unknown column would) — it does NOT silently feed the
    *     renamed column;
    *   - manifest column stats/blooms of pre-rename files stay keyed
    *     by the old name, so data skipping on the renamed column is
    *     conservative (no pruning, never wrong) until files rewrite;
    *   - PARTITION columns live in file paths — rejected loudly;
    *   - `_cdc_`/`_graft` metadata columns are engine-owned —
    *     rejected.
    *
    * Returns the new schema version. Single-writer maintenance, like
    * every schema operation; optimistic validation fails a racing
    * write loudly. */
  def renameColumn(spark: SparkSession, dir: String, from: String,
      to: String): Long = {
    val commits0 = log(dir)
    require(commits0.nonEmpty, s"no CdcTable at $dir")
    val schema = commits0.last.schema
    require(from.nonEmpty && to.nonEmpty,
      "rename: empty column name") // "" is the DROP marker encoding
    require(from != to, s"rename source and target are both '$from'")
    require(schema.fieldNames.contains(from),
      s"rename: no column '$from' in ${dir} " +
        s"(columns: ${schema.fieldNames.mkString(", ")})")
    require(!schema.fieldNames.contains(to),
      s"rename: column '$to' already exists in $dir")
    Seq(from, to).foreach(c => require(
      !c.startsWith("_cdc") && !c.startsWith("_graft"),
      s"rename: '$c' is an engine-owned metadata column"))
    val partCols = effective(commits0).flatMap(_.files)
      .flatMap(partColsFromPath).toSet
    require(!partCols.contains(from),
      s"rename: '$from' is a PARTITION column — partition values " +
        "live in file paths, which a metadata-only rename cannot " +
        "reach; rewrite the table under the new layout instead " +
        "(GRAFT OPTIMIZE ... ZORDER / compactToCurrentState)")
    constraintsOf(commits0).find(_.cols.contains(from)).foreach(cn =>
      throw new IllegalArgumentException(
        s"rename: column '$from' is referenced by CHECK constraint " +
          s"${cn.name} [${cn.expr}] — drop the constraint first " +
          "(its expression would silently stop resolving)"))
    generatedOf(schema).find(g => g._3.contains(from) &&
        g._1.name != from).foreach(g =>
      throw new IllegalArgumentException(
        s"rename: column '$from' is a source of generated column " +
          s"${g._1.name} [${g._2}] — drop that column first"))
    val renamed = StructType(schema.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    val snap = commits0.last.commit
    commit(dir, n => Commit(n, commits0.last.schemaVersion + 1,
      "rename", System.currentTimeMillis(), None, renamed, Nil,
      rename = Some((from, to))),
      validate = cur =>
        if (cur.lastOption.map(_.commit) != Some(snap))
          throw new java.util.ConcurrentModificationException(
            s"rename at $dir: a write landed mid-rename (expected " +
              s"log tail $snap); rerun")).schemaVersion
  }

  /** `GRAFT DROP COLUMN` — the metadata-only sibling of
    * [[renameColumn]] (Delta drop-column-with-column-mapping parity):
    * one commit records the narrowed schema; no files rewrite. The
    * physical data stays in pre-drop files (time travel to a pre-drop
    * snapshot still reads it — the range-bounded schema, exactly like
    * rename); current reads simply cast to the narrowed target, which
    * prunes the column at the scan. Re-adding a column of the same
    * name later is ordinary schema widening and does NOT resurrect
    * old values: pre-drop generations cast their ORIGINAL column away
    * because the drop bumped the generation (spec-gated).
    *
    * Same contracts as rename: partition and `_cdc_`/`_graft`
    * metadata columns reject loudly; the next keyed/predicate DML
    * modernizes old files (physically shedding the dropped bytes —
    * until then VACUUM cannot reclaim them, the documented
    * column-mapping tradeoff). Returns the new schema version. */
  def dropColumn(spark: SparkSession, dir: String, name: String): Long = {
    val commits0 = log(dir)
    require(commits0.nonEmpty, s"no CdcTable at $dir")
    val schema = commits0.last.schema
    require(schema.fieldNames.contains(name),
      s"drop: no column '$name' in $dir " +
        s"(columns: ${schema.fieldNames.mkString(", ")})")
    require(schema.fields.length > 1,
      s"drop: '$name' is the table's only column")
    require(!name.startsWith("_cdc") && !name.startsWith("_graft"),
      s"drop: '$name' is an engine-owned metadata column")
    val partCols = effective(commits0).flatMap(_.files)
      .flatMap(partColsFromPath).toSet
    require(!partCols.contains(name),
      s"drop: '$name' is a PARTITION column — partition values live " +
        "in file paths; rewrite the table under a new layout instead")
    constraintsOf(commits0).find(_.cols.contains(name)).foreach(cn =>
      throw new IllegalArgumentException(
        s"drop: column '$name' is referenced by CHECK constraint " +
          s"${cn.name} [${cn.expr}] — drop the constraint first"))
    generatedOf(schema).find(g => g._3.contains(name) &&
        g._1.name != name).foreach(g =>
      throw new IllegalArgumentException(
        s"drop: column '$name' is a source of generated column " +
          s"${g._1.name} [${g._2}] — drop that column first"))
    val narrowed = StructType(schema.fields.filterNot(_.name == name))
    val snap = commits0.last.commit
    commit(dir, n => Commit(n, commits0.last.schemaVersion + 1,
      "drop", System.currentTimeMillis(), None, narrowed, Nil,
      rename = Some((name, ""))), // empty target = drop marker
      validate = cur =>
        if (cur.lastOption.map(_.commit) != Some(snap))
          throw new java.util.ConcurrentModificationException(
            s"drop at $dir: a write landed mid-drop (expected log " +
              s"tail $snap); rerun")).schemaVersion
  }

  /** `GRAFT ADD COLUMN` — metadata-only schema widening, completing
    * the ALTER family (ADD / RENAME / DROP, Delta parity): one commit
    * records the widened schema (the new column is nullable by
    * construction — existing rows have no value for it); no files
    * rewrite, and every existing generation null-fills through the
    * ordinary castTo path. Appends could already widen implicitly via
    * schema merge — this is the EXPLICIT declaration form (reserve
    * the column before any writer sends it, with the type YOU chose
    * rather than the first batch's inference). Returns the new schema
    * version. */
  def addColumn(spark: SparkSession, dir: String, name: String,
      dataType: DataType): Long = {
    val commits0 = log(dir)
    require(commits0.nonEmpty, s"no CdcTable at $dir")
    val schema = commits0.last.schema
    require(!schema.fieldNames.contains(name),
      s"add: column '$name' already exists in $dir")
    require(!name.startsWith("_cdc") && !name.startsWith("_graft"),
      s"add: '$name' is an engine-owned metadata prefix")
    val widened = StructType(schema.fields :+
      StructField(name, dataType, nullable = true))
    val snap = commits0.last.commit
    commit(dir, n => Commit(n, commits0.last.schemaVersion + 1,
      "add", System.currentTimeMillis(), None, widened, Nil),
      validate = cur =>
        if (cur.lastOption.map(_.commit) != Some(snap))
          throw new java.util.ConcurrentModificationException(
            s"add at $dir: a write landed mid-add (expected log " +
              s"tail $snap); rerun")).schemaVersion
  }

  /** `GRAFT ALTER COLUMN … TYPE` — explicit metadata-only TYPE
    * WIDENING, completing the ALTER family (ADD / RENAME / DROP /
    * ALTER TYPE, Delta type-widening parity): one commit records the
    * widened schema; no files rewrite. Pre-widening generations scan
    * under their own (narrower) physical type and cast up through the
    * ordinary castTo path — lossless by construction, because the new
    * type must sit ABOVE the old one in the [[SchemaMerge]] widening
    * lattice (int→long→double, decimal growth, element-level widening
    * inside arrays/structs). Narrowing or cross-family changes reject
    * loudly. Time travel to a pre-widening snapshot still serves the
    * old type (the range-bounded schema, exactly like rename/drop).
    *
    * Appends could already widen implicitly via schema merge — this
    * is the EXPLICIT declaration form (reserve the wide type before
    * any writer sends a wide value, rather than letting the first
    * overflowing batch pick the moment). Partition columns reject
    * (their values live in file paths as strings; re-typing them is a
    * rewrite concern); `_cdc_`/`_graft` metadata columns reject.
    * Returns the new schema version. */
  def widenColumn(spark: SparkSession, dir: String, name: String,
      newType: DataType): Long = {
    val commits0 = log(dir)
    require(commits0.nonEmpty, s"no CdcTable at $dir")
    val schema = commits0.last.schema
    val field = schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"alter type: no column '$name' in $dir " +
          s"(columns: ${schema.fieldNames.mkString(", ")})"))
    require(!name.startsWith("_cdc") && !name.startsWith("_graft"),
      s"alter type: '$name' is an engine-owned metadata column")
    require(field.dataType != newType,
      s"alter type: '$name' already has type " +
        field.dataType.simpleString)
    val widened = scala.util.Try(SchemaMerge.mergeTypes(
      field.dataType, newType)).getOrElse(
      throw new IllegalArgumentException(
        s"alter type: ${field.dataType.simpleString} and " +
          s"${newType.simpleString} do not share a widening path"))
    require(widened == newType,
      s"alter type: ${newType.simpleString} does not WIDEN '$name' " +
        s"(${field.dataType.simpleString} ⊔ ${newType.simpleString} " +
        s"= ${widened.simpleString}) — narrowing would corrupt " +
        "existing values; rewrite the table instead")
    val partCols = effective(commits0).flatMap(_.files)
      .flatMap(partColsFromPath).toSet
    require(!partCols.contains(name),
      s"alter type: '$name' is a PARTITION column — partition values " +
        "live in file paths; rewrite the table under a new layout")
    val out = StructType(schema.fields.map(f =>
      if (f.name == name) f.copy(dataType = newType, nullable = true)
      else f))
    val snap = commits0.last.commit
    commit(dir, n => Commit(n, commits0.last.schemaVersion + 1,
      "widen", System.currentTimeMillis(), None, out, Nil),
      validate = cur =>
        if (cur.lastOption.map(_.commit) != Some(snap))
          throw new java.util.ConcurrentModificationException(
            s"alter type at $dir: a write landed mid-alter (expected " +
              s"log tail $snap); rerun")).schemaVersion
  }

  // ───────────────────────────────────────────────────────────────
  // CHECK constraints — Delta `ALTER TABLE … ADD CONSTRAINT` parity
  // (reference DQ rules are reader-side filters, `spec.md` P8; this
  // is the WRITER-side invariant form: bad rows can never land).

  /** The table's current CHECK constraints: the ordered fold of
    * [[ConsOp]]s over the FULL log (replace commits do not re-state
    * constraints, like the rename chain). Entries are `add=true`. */
  def constraintsOf(commits: Seq[Commit]): Seq[ConsOp] =
    commits.flatMap(_.constraintOps).foldLeft(Vector.empty[ConsOp]) {
      (acc, op) =>
        val rest = acc.filterNot(_.name == op.name)
        if (op.add) rest :+ op else rest
    }

  def constraints(dir: String): Seq[ConsOp] = constraintsOf(log(dir))

  /** Fold the table's CHECK constraints into a write projection as a
    * conditional `raise_error` on the first column — SINGLE-PASS
    * enforcement inside the write job itself (Delta's CheckInvariant
    * approach): a 100 TB append pays zero extra scans, and the first
    * violating row fails the job before the commit (the staged batch
    * is an invisible orphan, vacuumable — exactly the crash story).
    * Violation iff the expression is FALSE: NULL passes (SQL CHECK
    * semantics, matching DuckDB/Delta). */
  private def constraintGuard(rows: DataFrame, cons: Seq[ConsOp],
      op: String): DataFrame = {
    if (cons.isEmpty) return rows
    import org.apache.spark.sql.functions.{coalesce, col, concat,
      expr, lit, raise_error, struct, to_json}
    val first = rows.columns.head
    val guarded = cons.foldLeft(col(s"`$first`")) { (acc, cn) =>
      // diagnostics render only the REFERENCED columns (a full-row
      // to_json chokes on non-string-keyed maps and bloats errors)
      val diag =
        if (cn.cols.isEmpty) lit("")
        else to_json(struct(cn.cols.map(c => col(s"`$c`")): _*))
      org.apache.spark.sql.functions
        .when(coalesce(expr(cn.expr), lit(true)), acc)
        .otherwise(raise_error(concat(
          lit(s"$op rejected by CHECK constraint ${cn.name} " +
            s"[${cn.expr}] on row "), diag)))
    }
    rows.withColumn(first, guarded)
  }

  /** ADD CONSTRAINT: validates the expression against the current
    * schema (boolean, known columns — the referenced set is recorded
    * so RENAME/DROP COLUMN reject exactly), scans EXISTING rows once
    * (Delta parity: a constraint the current data violates is
    * rejected with a sample), then commits one fileless
    * `action="constraint"` manifest. From that commit on, every
    * append / UPDATE / MERGE enforces it in-write via
    * [[constraintGuard]]. Returns the commit id. */
  def addConstraint(spark: SparkSession, dir: String, name: String,
      exprSql: String): Long = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    require(name.nonEmpty, "constraint name must be non-empty")
    val existing = constraintsOf(commits)
    require(!existing.exists(_.name == name),
      s"constraint $name already exists on $dir (drop it first)")
    val schema = commits.last.schema
    val cols = resolveRefs(spark, schema.fieldNames.toSeq, exprSql,
      s"ADD CONSTRAINT $name")
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    val typed = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .select(expr(exprSql).as("c")).schema.fields(0).dataType
    require(typed == org.apache.spark.sql.types.BooleanType,
      s"ADD CONSTRAINT $name: CHECK expression must be BOOLEAN, " +
        s"got ${typed.simpleString}")
    if (effective(commits).exists(_.files.nonEmpty)) {
      val bad = read(spark, dir)
        .filter(not(coalesce(expr(exprSql), lit(true)))).take(3)
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"ADD CONSTRAINT $name rejected: existing rows violate " +
          s"CHECK ($exprSql) — e.g. ${bad.mkString("; ")}")
    }
    val snap = commits.last.commit
    commit(dir, n => Commit(n, commits.last.schemaVersion,
      "constraint", System.currentTimeMillis(), None, schema, Nil,
      constraintOps = Seq(ConsOp(add = true, name, exprSql, cols))),
      validate = cur =>
        if (cur.lastOption.map(_.commit) != Some(snap))
          throw new java.util.ConcurrentModificationException(
            s"ADD CONSTRAINT at $dir: a write landed after the " +
              s"validation scan (expected log tail $snap); rerun"))
      .commit
  }

  /** DROP CONSTRAINT: one fileless commit; later writes stop
    * enforcing. Dropping an unknown name rejects loudly. */
  def dropConstraint(dir: String, name: String): Long = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val have = constraintsOf(commits)
    require(have.exists(_.name == name),
      s"no constraint $name on $dir " +
        s"(have: ${have.map(_.name).mkString(", ")})")
    commit(dir, n => Commit(n, commits.last.schemaVersion,
      "constraint", System.currentTimeMillis(), None,
      commits.last.schema, Nil,
      constraintOps = Seq(ConsOp(add = false, name, "", Nil)))).commit
  }

  // ───────────────────────────────────────────────────────────────
  // Generated columns — Delta GENERATED ALWAYS AS parity. The
  // generation expression lives in the MANIFEST schema's field
  // metadata (StructField.metadata survives the schema-JSON round
  // trip and the merge lattice); writers compute the column when a
  // batch does not provide it and VERIFY it when one does.

  private[sink] val GenExprKey = "graft.generated"
  private[sink] val GenColsKey = "graft.generatedFrom"

  /** Strip top-level field metadata from an INCOMING batch schema
    * before the merge lattice: a frame built from `read(tableA)`
    * carries tableA's engine markers (generated-column expressions)
    * in its schema, and appending it to tableB must not silently
    * install tableA's generated columns there. Only
    * [[addGeneratedColumn]] may introduce engine metadata; the
    * EXISTING manifest side of a merge keeps its own. */
  private def stripFieldMeta(s: StructType): StructType =
    StructType(s.fields.map(_.copy(
      metadata = org.apache.spark.sql.types.Metadata.empty)))

  /** Resolve the top-level columns a SQL expression references
    * against a schema, under the session resolver — the shared
    * DDL-validation step of ADD CONSTRAINT / ADD GENERATED /
    * OPTIMIZE WHERE. Unknown or ambiguous references throw with
    * `context` in the message. */
  private def resolveRefs(spark: SparkSession, schema: Seq[String],
      exprSql: String, context: String): Seq[String] = {
    val resolver = spark.sessionState.analyzer.resolver
    spark.sessionState.sqlParser.parseExpression(exprSql)
      .collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.head
      }.distinct.map { r =>
      schema.filter(resolver(_, r)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"$context references unknown column $r " +
            s"(columns: ${schema.mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"$context: column $r is ambiguous under the session " +
            s"resolver (matches ${many.mkString(", ")})")
      }
    }
  }

  /** Generated columns of a schema: (field, exprSql, source cols). */
  private def generatedOf(schema: StructType)
      : Seq[(StructField, String, Seq[String])] =
    schema.fields.toSeq.filter(_.metadata.contains(GenExprKey)).map {
      f => (f, f.metadata.getString(GenExprKey),
        if (f.metadata.contains(GenColsKey))
          f.metadata.getStringArray(GenColsKey).toSeq else Nil)
    }

  /** Verify-only pseudo-constraints for generated columns — every
    * written NON-NULL value must satisfy `col <=> CAST(expr AS
    * type)`, so an UPDATE that changes a source column without
    * recomputing the generated one fails LOUDLY instead of silently
    * serving a stale derivation (stricter than Delta's silent
    * recompute, and never wrong). A NULL generated value always
    * passes: rows committed BEFORE the DDL null-fill by documented
    * design, and a metadata-only DDL bumps the schema version, so
    * the NEXT predicate DML rewrites exactly those files — the
    * verify must not reject that legitimate state. */
  private def generatedVerify(schema: StructType): Seq[ConsOp] =
    generatedOf(schema).map { case (f, e, cols) =>
      ConsOp(add = true, s"generated_${f.name}",
        s"(`${f.name}` IS NULL) OR " +
          s"(`${f.name}` <=> CAST(($e) AS ${f.dataType.sql}))",
        cols :+ f.name)
    }

  /** Apply generation to rows being written: compute each generated
    * column the ORIGINAL batch did not provide (`providedCols` is the
    * pre-cast input schema); in-write-verify the ones it did. */
  private def applyGenerated(rows: DataFrame, schema: StructType,
      providedCols: Set[String], op: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val gens = generatedOf(schema)
    if (gens.isEmpty) return rows
    val computed = gens.foldLeft(rows) { case (df, (f, e, _)) =>
      if (providedCols.contains(f.name)) df
      else df.withColumn(f.name, expr(e).cast(f.dataType))
    }
    val provided = gens.map(_._1.name).filter(providedCols).toSet
    val verify = generatedVerify(schema)
      .zip(gens)
      .collect { case (v, g) if provided(g._1.name) => v }
    constraintGuard(computed, verify, op)
  }

  /** ADD a GENERATED column (Delta `GENERATED ALWAYS AS` parity),
    * metadata-only like [[addColumn]]: one commit records the widened
    * schema with the generation expression in the field's metadata.
    * From then on every append/MERGE computes the column when the
    * batch lacks it (so `partitionBy` can target it — the
    * derived-date partitioning pattern) and verifies it in-write when
    * the batch provides it. Rows committed BEFORE the DDL null-fill
    * (the ordinary added-column rule — this engine adds the column
    * late rather than forcing it at creation; documented honestly).
    * The expression may reference existing non-generated columns
    * only; RENAME/DROP of a referenced column rejects. */
  def addGeneratedColumn(spark: SparkSession, dir: String,
      name: String, dataType: DataType, exprSql: String): Long = {
    val commits0 = log(dir)
    require(commits0.nonEmpty, s"no CdcTable at $dir")
    val schema = commits0.last.schema
    require(!schema.fieldNames.contains(name),
      s"add generated: column '$name' already exists in $dir")
    require(!name.startsWith("_cdc") && !name.startsWith("_graft"),
      s"add generated: '$name' is an engine-owned metadata prefix")
    val cols = resolveRefs(spark, schema.fieldNames.toSeq, exprSql,
      s"ADD GENERATED $name")
    cols.foreach(c => require(
      !generatedOf(schema).exists(_._1.name == c),
      s"ADD GENERATED $name: '$c' is itself generated — chained " +
        "generation is not supported (inline the expression)"))
    // type-check: the expression must cast to the declared type
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .select(org.apache.spark.sql.functions.expr(exprSql)
        .cast(dataType).as("c")).schema // analysis throws on nonsense
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(GenExprKey, exprSql)
      .putStringArray(GenColsKey, cols.toArray).build()
    val widened = StructType(schema.fields :+
      StructField(name, dataType, nullable = true, metadata = meta))
    val snap = commits0.last.commit
    commit(dir, n => Commit(n, commits0.last.schemaVersion + 1,
      "add", System.currentTimeMillis(), None, widened, Nil),
      validate = cur =>
        if (cur.lastOption.map(_.commit) != Some(snap))
          throw new java.util.ConcurrentModificationException(
            s"add generated at $dir: a write landed mid-add " +
              s"(expected log tail $snap); rerun")).schemaVersion
  }

  // ───────────────────────────────────────────────────────────────
  // Table properties — Delta TBLPROPERTIES parity. Writer-honored
  // metadata (e.g. `graft.vacuum.retainHours` — Delta's
  // deletedFileRetentionDuration); folded over the full log like
  // constraints; clones inherit, RESTORE rolls back.

  /** The table's current properties: ordered fold of set/unset ops
    * over the FULL log (later wins). */
  def propertiesOf(commits: Seq[Commit]): Map[String, String] =
    commits.flatMap(_.propOps)
      .foldLeft(scala.collection.immutable.ListMap.empty[String, String]) {
        case (acc, (k, Some(v))) => acc.updated(k, v)
        case (acc, (k, None)) => acc - k
      }

  def properties(dir: String): Map[String, String] =
    propertiesOf(log(dir))

  /** SET a property — one fileless `action="property"` commit.
    * Engine-honored keys validate their value HERE (a malformed
    * retention must fail the SET, not wedge every later VACUUM). */
  def setProperty(dir: String, key: String, value: String): Long = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    require(key.nonEmpty, "property key must be non-empty")
    if (key == "graft.vacuum.retainHours")
      require(scala.util.Try(value.toLong).toOption.exists(_ >= 0),
        s"property $key must be a non-negative integer hour count, " +
          s"got '$value'")
    commit(dir, n => Commit(n, commits.last.schemaVersion,
      "property", System.currentTimeMillis(), None,
      commits.last.schema, Nil,
      propOps = Seq((key, Some(value))))).commit
  }

  /** UNSET a property. Unsetting an absent key rejects loudly. */
  def unsetProperty(dir: String, key: String): Long = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    require(propertiesOf(commits).contains(key),
      s"no property $key on $dir " +
        s"(have: ${propertiesOf(commits).keys.mkString(", ")})")
    commit(dir, n => Commit(n, commits.last.schemaVersion,
      "property", System.currentTimeMillis(), None,
      commits.last.schema, Nil,
      propOps = Seq((key, None)))).commit
  }

  /** Current schema-generation version (0 = no table yet). */
  def currentVersion(dir: String): Long =
    log(dir).lastOption.map(_.schemaVersion).getOrElse(0L)

  def currentSchema(dir: String): Option[StructType] =
    log(dir).lastOption.map(_.schema)

  /** Schema of generation `v` (as of its last commit). */
  def schemaOf(dir: String, v: Long): Option[StructType] =
    log(dir).filter(_.schemaVersion == v).lastOption.map(_.schema)

  /** Last committed (appId, version) for idempotent replays. */
  def lastTxn(dir: String): Option[(String, Long)] =
    log(dir).flatMap(_.txn).lastOption

  /** All generation schemas in order (history — reference
    * schema_manager version tracking `schema_manager.py:106-148`). */
  def schemaHistory(dir: String): Seq[(Long, StructType)] =
    log(dir).map(c => c.schemaVersion -> c.schema)
      .foldLeft(Vector.empty[(Long, StructType)]) { (acc, p) =>
        if (acc.exists(_._1 == p._1)) acc else acc :+ p
      }

  /** Serializes IN-PROCESS commits per table: the ingest appends to
    * the shared `_dlq` table from parallel per-collection futures, and
    * on s3a `create(overwrite=false)` is not atomic — two racing
    * creates of the same `N.commit` could both "succeed" and one
    * manifest would be silently lost. With all of one table's writers
    * living in the single streaming-driver JVM (the deployment
    * contract, as in the reference), this lock is what makes the
    * commit race-free on object stores. CROSS-process arbitration is
    * the [[graft.core.CommitArbiter]] seam: atomic create-exclusive
    * on local/HDFS, read-back-verified create elsewhere, injectable
    * for stores that need external arbitration — deployments that
    * intend concurrent writer PROCESSES must pass
    * [[requireCrossProcessCommits]] first. */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Fail-loud probe for MULTI-WRITER deployments (more than one
    * writer PROCESS appending to `dir` concurrently — the in-process
    * per-table lock already covers any number of threads in one JVM).
    * Call it once per table before starting such a writer; it throws
    * unless commit arbitration on `dir`'s filesystem is actually safe
    * for cross-process racers: an atomic conditional create
    * ([[graft.core.Fs.provenAtomicCreateExclusive]] — local, HDFS, or
    * a scheme the deployment asserts via
    * `-Dgraft.commit.conditionalCreateSchemes`), or an installed
    * external [[graft.core.CommitArbiter]]. Without either, a bare
    * object-store `create(overwrite=false)` is check-then-act and two
    * drivers can claim the same commit id — refusing loudly here is
    * the difference between a startup error and a silently lost
    * commit at 100 TB. */
  def requireCrossProcessCommits(dir: String): Unit =
    if (!Fs.provenAtomicCreateExclusive(dir) && CommitArbiter.isDefault)
      throw new IllegalStateException(
        s"table at $dir sits on a filesystem whose create-exclusive is " +
          "check-then-act, so concurrent writer PROCESSES could both " +
          "claim the same commit id (read-back verification shrinks " +
          "but cannot close that window). Either run one writer " +
          "process per table, assert the store's conditional-create " +
          "support with -Dgraft.commit.conditionalCreateSchemes=" +
          "<scheme>, or install an external graft.core.CommitArbiter")

  /** Atomically add a manifest; retries the commit id on a lost race
    * (single-writer by contract, but a replayed batch after a crash
    * can observe its own half-finished predecessor). `validate` runs
    * against the CURRENT log before every attempt — the optimistic-
    * concurrency hook `replace` commits use to detect writes that
    * landed after their snapshot (a compaction superseding an unseen
    * append would silently lose it). */
  private def commit(dir: String, mk: Long => Commit,
      validate: Seq[Commit] => Unit = _ => ()): Commit = {
    val lock = tableLocks.computeIfAbsent(
      new org.apache.hadoop.fs.Path(dir).toString, _ => new Object)
    lock.synchronized(commitLocked(dir, mk, validate))
  }

  private def commitLocked(dir: String, mk: Long => Commit,
      validate: Seq[Commit] => Unit): Commit = {
    // Each lost race burns one attempt, and with k concurrent writers
    // a single commit can lose up to (k-1) races per competitor batch —
    // size the bound well above the per-table writer fan-out.
    var attempts = 0
    while (attempts < 50) {
      val current = log(dir)
      // writer protocol gate (log() already gated the reader side):
      // appending without implementing e.g. constraint enforcement
      // would corrupt the table's contract
      val unknownW = current
        .flatMap(c => c.requires ++ c.writerRequires).distinct
        .filterNot(SupportedWriterFeatures)
      if (unknownW.nonEmpty) throw new IllegalStateException(
        s"table at $dir requires writer feature(s) this build does " +
          s"not support: ${unknownW.mkString(", ")} (supported: " +
          s"${SupportedWriterFeatures.toSeq.sorted.mkString(", ")}) — " +
          "the table stays readable; upgrade the library to write")
      validate(current)
      val next = current.lastOption.map(_.commit + 1).getOrElse(1L)
      val c = stampFeatures(mk(next))
      if (CommitArbiter.current.tryExclusive(commitPath(dir, next),
          render(c))) {
        // derived + idempotent, so a plain overwrite write is fine
        if (next % CheckpointInterval == 0)
          writeCheckpoint(dir, current :+ c)
        return c
      }
      attempts += 1 // lost a commit race (e.g. parallel DLQ appends)
      // the id holder is either a racing writer whose content lands in
      // a moment (wait it out) or a dead writer's torn file (created
      // but never written) — reclaim the id once it is clearly stale
      val p = commitPath(dir, next)
      val parseable = Fs.readString(p)
        .exists(s => scala.util.Try(parse(s)).isSuccess)
      if (!parseable) {
        val (fsys, hp) = Fs(p)
        if (fsys.exists(hp) && System.currentTimeMillis() -
            fsys.getFileStatus(hp).getModificationTime > 60000L)
          fsys.delete(hp, false)
        else Thread.sleep(10L)
      }
    }
    throw new IllegalStateException(
      s"could not commit to $dir after 50 attempts — concurrent writers?")
  }

  /** Enumerate the parquet files of a staged batch, dir-relative.
    * LAST occurrence of the batch marker: a table legitimately rooted
    * under a path that itself contains `/data/batch-` (e.g. a curation
    * artifact nested inside another table's data dir) must still key
    * its rel paths at ITS OWN staging level, or `$dir/$rel` reads and
    * the bloom/keyed-rewrite rel joins all silently miss. Partition
    * segments cannot contain '/', so the last occurrence is always the
    * staging dir this commit just wrote. The regexp sites extracting
    * rel paths from input_file_name use the same last-occurrence rule
    * (greedy `.*` prefix) — keep them in sync. */
  private def stagedFiles(dir: String, batchDir: String): Seq[String] =
    Fs.walkFiles(batchDir)
      .map(_._1.toString)
      .filter(_.endsWith(".parquet"))
      .map { abs =>
        val marker = abs.lastIndexOf("/data/batch-")
        require(marker >= 0, s"staged file outside data dir: $abs")
        abs.substring(marker + 1)
      }

  /** input_file_name → manifest rel path, as a regex: the greedy `.*`
    * prefix pins the capture to the LAST `data/batch-` occurrence,
    * matching [[stagedFiles]]' keying — INCLUDING the anchoring `/`
    * before it (input_file_name is always an absolute URI, so the
    * separator exists). Without the `/` a partition-value suffix
    * spelling `…data` followed by a partition dir starting `batch-`
    * would key rel paths differently here than stagedFiles does. */
  private[graft] val RelPathRe = ".*/(data/batch-.*)$"

  /** input_file_name → rel path for CDF change files (same
    * last-occurrence rule as [[RelPathRe]]). */
  private[graft] val ChangeRelPathRe = ".*/(_changes/batch-.*)$"

  /** The `_change_type` values [[readChanges]] can emit — Delta CDF
    * parity. Appends derive `insert` from the manifest (zero write
    * cost); DML commits persist their exact logical changes. */
  val ChangeTypes: Seq[String] =
    Seq("insert", "delete", "update_preimage", "update_postimage")

  /** A commit's change-file / DV-sidecar row schemas. */
  private def changeSchemaOf(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("_change_type",
      org.apache.spark.sql.types.StringType))

  /** Stage auxiliary (non-data) parquet under `<dir>/<sub>/batch-…`
    * and return the dir-relative file list — the CDF change-file and
    * DV-sidecar writer ([[stagedFiles]]' keying rules apply). */
  private def stageAux(dir: String, sub: String, rows: DataFrame)
      : Seq[String] = {
    val batchDir = s"$dir/$sub/batch-${UUID.randomUUID()}"
    rows.write.mode("overwrite").parquet(batchDir)
    Fs.walkFiles(batchDir).map(_._1.toString)
      .filter(_.endsWith(".parquet"))
      .map { abs =>
        val marker = abs.lastIndexOf(s"/$sub/batch-")
        require(marker >= 0, s"staged file outside $sub: $abs")
        abs.substring(marker + 1)
      }
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
    * committed for this appId is skipped, and because the manifest IS
    * the commit point, a crash between the data write and the
    * manifest leaves only invisible orphan files — the replay appends
    * exactly once (no duplicate window, matching the Delta guarantee). */
  def append(batch: DataFrame, dir: String, mode: MergeMode = SchemaMerge.Auto,
      partitionBy: Seq[String] = Seq("_ingestion_date"),
      txn: Option[(String, Long)] = None,
      maxStructFields: Int = Int.MaxValue,
      bloomCols: Seq[String] = Nil): Long = {
    val commits = log(dir)
    txn.foreach { case (app, v) =>
      val committed = commits.flatMap(_.txn)
        .filter(_._1 == app).map(_._2)
      if (committed.nonEmpty && committed.max >= v)
        return commits.last.schemaVersion // replayed batch — skip
    }
    val existing = commits.lastOption.map(_.schema)
    // incoming metadata never reaches the manifest (stripFieldMeta):
    // only the ADD GENERATED DDL may install engine markers
    val bSchema = stripFieldMeta(batch.schema)
    val merged = existing match {
      case Some(e) => SchemaMerge.merge(e, bSchema, mode,
        maxStructFields)
      // self-merge normalizes the first schema (all-nullable, like
      // every later merge) so a second identical append doesn't open
      // a spurious generation over a nullability-only difference
      case None => SchemaMerge.merge(bSchema, bSchema, mode,
        maxStructFields)
    }
    val sv =
      if (existing.contains(merged)) commits.last.schemaVersion
      else commits.lastOption.map(_.schemaVersion + 1).getOrElse(1L)
    val out = constraintGuard(
      applyGenerated(SchemaMerge.castTo(batch, merged), merged,
        batch.schema.fieldNames.toSet, "append"),
      constraintsOf(commits), "append")
    val batchDir = s"$dir/data/batch-${UUID.randomUUID()}"
    val writer = out.write.mode("overwrite")
    val partCols = partitionBy.filter(merged.fieldNames.contains)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(batchDir)
    val files = stagedFiles(dir, batchDir)
    val (stats, frows, fbytes) = FileStats.collectInfo(dir, files)
    val blooms = collectBlooms(out.sparkSession, batchDir, files,
      bloomCols, merged, partCols)
    commit(dir, n => Commit(n, sv, "append",
      System.currentTimeMillis(), txn, merged, files,
      stats = stats, fileRows = frows, fileBytes = fbytes,
      blooms = blooms))
    sv
  }

  /** Build the per-file Bloom filters an append requested: one
    * column-pruned read-back of the just-written staged batch per
    * bloom column (page-cache-warm — the batch was written a moment
    * ago), hashing each non-null value to its 4 bit positions in SQL
    * (the portable md5-substring family [[FileStats.bloomPositions]]
    * probes with) and collecting the DISTINCT (file, position) pairs —
    * bounded by files × 8192 regardless of row count. Requested
    * columns must exist, be string/integral (the only types whose
    * string rendering is probe-portable), and not be partition
    * columns (whose values never reach the data files — partition
    * pruning already covers them). */
  private def collectBlooms(spark: SparkSession, batchDir: String,
      relFiles: Seq[String], bloomCols: Seq[String],
      schema: StructType, partCols: Seq[String])
  : Map[String, Map[String, String]] = {
    if (bloomCols.isEmpty) return Map.empty
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // Key by the FULL relative path (`data/batch-…/…/part-….parquet`),
    // not the basename: with a non-empty partitionBy one task writes
    // the same part-NNNNN basename into several partition directories,
    // and basename keying would merge those files' positions into one
    // superset bloom while the others silently got none.
    val byRel = relFiles.toSet
    def relOf(abs: String): String = {
      val marker = abs.lastIndexOf("/data/batch-")
      require(marker >= 0, s"bloom read-back file outside data dir: $abs")
      val rel = abs.substring(marker + 1)
      require(byRel.contains(rel),
        s"bloom read-back file not in the staged list: $rel")
      rel
    }
    bloomCols.foreach { c =>
      require(!partCols.contains(c),
        s"bloomCols: $c is a partition column — partition pruning " +
          "already covers it and its values are not in the data files")
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"bloomCols: no such column $c in ${schema.fieldNames.mkString(",")}"))
      require(Seq(ByteType, ShortType, IntegerType, LongType, StringType)
        .contains(f.dataType),
        s"bloomCols: $c has unsupported type ${f.dataType.simpleString} " +
          "(string/integral only — other renderings are not " +
          "probe-portable)")
    }
    bloomCols.map { c =>
      // aggregate positions per FILE with collect_set (map-side
      // partial aggregation, bounded by BloomBits per file) instead of
      // a corpus-wide distinct on the exploded (file, position) rows:
      // the shuffle carries one bounded set per file per map task, not
      // hashes×rows rows, and the collect returns one row per file
      c -> spark.read.parquet(batchDir)
        .select(input_file_name().as("_f"),
          col(c).cast("string").as("_v"))
        .where(col("_v").isNotNull)
        .select(col("_f"), explode(expr(
          s"transform(sequence(0, ${FileStats.BloomHashes - 1}), " +
            "j -> CAST(conv(substring(md5(_v), j*4+1, 4), 16, 10) " +
            s"AS INT) % ${FileStats.BloomBits})")).as("_p"))
        .groupBy(col("_f"))
        .agg(collect_set(col("_p")).as("_ps"))
        .collect()
        .map { r =>
          relOf(r.getString(0)) -> FileStats.packBloom(
            r.getSeq[Int](1))
        }.toMap
    }.foldLeft(Map.empty[String, Map[String, String]]) {
      case (acc, (c, perFile)) =>
        perFile.foldLeft(acc) { case (a, (rel, bits)) =>
          a.updated(rel, a.getOrElse(rel, Map.empty).updated(c, bits)) }
    }
  }

  /** Current row count from the manifest alone — zero data IO (the
    * per-file footer counts are harvested at commit time). Files
    * committed before `frows` existed contribute 0, so this is a
    * LOWER BOUND; use it for sizing decisions (e.g. LSH plane
    * derivation) where an underestimate degrades performance, never
    * correctness. `excludeTxn` drops commits carrying exactly that
    * txn marker — a replayed streaming batch can thereby size against
    * the same pre-batch count its original run saw. */
  def rowCountEstimate(dir: String,
      excludeTxn: Option[(String, Long)] = None): Long =
    effective(log(dir))
      .filterNot(c => excludeTxn.exists(c.txn.contains))
      .flatMap(_.fileRows.values).sum

  /** Read the table under its current merged schema: one scan per
    * schema generation over exactly the committed file lists, each
    * cast to the current schema and unioned. Older generations are
    * typically few (schema churn is rare), so this stays a handful of
    * parallel scans. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    readCommits(spark, dir, effective(commits))
  }

  /** Read ONLY the given manifest-relative files of the table's
    * current state (schema/partition handling identical to [[read]]
    * — the file subset scans under its commit's generation and casts
    * to the current schema). The scan primitive for file-keyed
    * maintenance (e.g. [[graft.ext.Profile.profileSyncFiles]]):
    * profiling the files a sync has not yet seen must not re-read
    * the table. Unknown rels are simply absent from the result. */
  private[graft] def readFilesOf(spark: SparkSession, dir: String,
      rels: Set[String]): DataFrame = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    // keep EVERY commit (file lists filtered) so the target schema
    // stays the table's current one even when the newest commit
    // contributes no requested file
    readCommits(spark, dir,
      effective(commits).map(c =>
        c.copy(files = c.files.filter(f => rels(fileKey(f))))))
  }

  /** The manifest-relative path of each row's source file, as a
    * column — percent-decoded `input_file_name()` keyed by the same
    * last-occurrence rule as [[stagedFiles]]. */
  private[graft] def relPathCol(): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{input_file_name, regexp_extract}
    pctDecode(regexp_extract(input_file_name(), RelPathRe, 1))
  }

  /** [[read]] minus the commits carrying exactly `excludeTxn` —
    * [[rowCountEstimate]]'s exclusion applied to the DATA: a replayed
    * incremental-index batch (whose own index append already
    * committed before the crash) probes the same pre-batch snapshot
    * its original run saw, so occupancy counts / hot-bucket caps /
    * pair sets replay bit-identically instead of double-counting the
    * batch's own rows on the historical side. */
  def readExcludingTxn(spark: SparkSession, dir: String,
      excludeTxn: Option[(String, Long)]): DataFrame = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val eff = effective(commits)
      .filterNot(c => excludeTxn.exists(c.txn.contains))
    if (eff.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        commits.last.schema)
    else readCommits(spark, dir, eff)
  }

  /** Read with MANIFEST-level partition pruning: the predicate runs
    * over each committed file's (partitionColumn, value) pairs parsed
    * from its staged path, and files that fail are never handed to
    * Spark at all — log-based file skipping (the Delta/Iceberg scale
    * pattern): no directory listing, no scan-time filtering, the
    * planned scan contains exactly the surviving files. Files without
    * a value for a predicated column (e.g. pre-partitioning layouts)
    * are kept — pruning must never drop data it cannot judge. */
  def readPruned(spark: SparkSession, dir: String,
      partitionPredicate: (String, String) => Boolean): DataFrame =
    readFiltered(spark, dir, partitionPredicate)

  /** [[readPruned]] + [[readAsOf]] combined: manifest-level file
    * skipping over the table as of a commit / timestamp — the scan
    * primitive behind the `graft` DataSource format
    * ([[graft.sources.GraftSource]]). `statsPredicate` additionally
    * judges each file by its recorded column stats ([[FileStats]] —
    * min/max/hasNull data skipping); files without stats always pass. */
  def readFiltered(spark: SparkSession, dir: String,
      partitionPredicate: (String, String) => Boolean,
      commitAsOf: Option[Long] = None,
      timestampAsOf: Option[Long] = None,
      statsPredicate: Map[String, FileStats.ColStats] => Boolean =
        _ => true,
      bloomPredicate: Map[String, String] => Boolean =
        _ => true): DataFrame = {
    // normalize through fileKey first, mirroring partColsFromPath: a
    // shallow clone borrows ABSOLUTE paths, and a key=value segment in
    // the SOURCE table's own directory (e.g. /warehouse/region=eu/tbl)
    // is not a partition column of the borrowed file — judging it
    // would silently prune live rows under a same-named predicate
    def keep(rel: String): Boolean =
      fileKey(rel).split('/').toIndexedSeq
        .filter(seg => seg.contains('=') && !seg.startsWith("."))
        .map(_.split("=", 2))
        .forall(kv => partitionPredicate(kv(0), kv(1)))
    val commits = commitsAsOf(dir, commitAsOf, timestampAsOf)
    // stats/blooms of a file are keyed by the column names AT ITS
    // COMMIT; re-express them under the CURRENT logical names through
    // the rename/drop chain before judging — a dropped-then-re-added
    // same-name column would otherwise consult the stale pre-drop
    // stats (hasNull=false) and wrongly prune all-NULL files
    val renames = commits
      .flatMap(c => c.rename.map(r => (c.schemaVersion, r._1, r._2)))
      .sortBy(_._1)
    def rekey[V](m: Map[String, V], sv: Long): Map[String, V] =
      renames.filter(_._1 > sv).foldLeft(m) {
        case (acc, (_, from, "")) => acc - from // DROP: stale key out
        case (acc, (_, from, to)) =>
          acc.get(from).fold(acc)(v => (acc - from).updated(to, v))
      }
    readCommits(spark, dir,
      commits.map(c => c.copy(files = c.files.filter(f =>
        keep(f) &&
          statsPredicate(rekey(c.stats.getOrElse(f, Map.empty),
            c.schemaVersion)) &&
          bloomPredicate(rekey(c.blooms.getOrElse(f, Map.empty),
            c.schemaVersion))))))
  }

  /** Time travel over the manifest log (the commit records its own
    * timestamp, Delta-style): the table as of commit `commitAsOf`, or
    * as of the newest commit with ts ≤ `timestampAsOf` millis. Works
    * as long as the superseded files haven't been vacuumed
    * ([[vacuumOrphans]] retention is the travel horizon) and log
    * checkpoints retain superseded commits only as fileless stubs —
    * so travel BEFORE the last `replace` needs the raw commit files
    * (kept until vacuum, like Delta). */
  def readAsOf(spark: SparkSession, dir: String,
      commitAsOf: Option[Long] = None,
      timestampAsOf: Option[Long] = None): DataFrame =
    readCommits(spark, dir, commitsAsOf(dir, commitAsOf, timestampAsOf))

  /** The effective (post-`replace`), stub-hydrated commits as of the
    * requested point — the shared resolution behind [[readAsOf]],
    * [[readFiltered]] and the `graft` DataSource's schema lookup. */
  private[graft] def commitsAsOf(dir: String,
      commitAsOf: Option[Long] = None,
      timestampAsOf: Option[Long] = None): Seq[Commit] = {
    require(commitAsOf.isEmpty || timestampAsOf.isEmpty,
      "specify at most one of commitAsOf / timestampAsOf")
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val upTo = (commitAsOf, timestampAsOf) match {
      case (Some(n), _) => commits.takeWhile(_.commit <= n)
      case (_, Some(ts)) => commits.takeWhile(_.ts <= ts)
      case _ => commits
    }
    require(upTo.nonEmpty, s"no commit at or before the requested point " +
      s"(earliest: commit=${commits.head.commit} ts=${commits.head.ts})")
    effective(upTo).map(hydrate(dir, _))
  }

  /** The log may have come from a checkpoint that condensed superseded
    * commits to fileless stubs. Their RAW commit files keep the file
    * lists until vacuumOrphans prunes them (the same retention window
    * that keeps the superseded data files), so travel before the last
    * `replace` hydrates from the raw log — and fails loudly, not
    * empty-silently, once vacuum has truncated the history. */
  private def hydrate(dir: String, c: Commit): Commit =
    if (!c.stub) c
    else Fs.readString(commitPath(dir, c.commit)).map(parse).getOrElse(
      throw new IllegalStateException(
        s"time travel to commit ${c.commit} at $dir: history " +
          "truncated — the log checkpoint keeps this superseded " +
          "commit only as a fileless stub and vacuumOrphans has " +
          "pruned its raw commit file (vacuum retention is the " +
          "travel horizon)"))

  /** Files [[readChanges]] will serve for a commit — the stream
    * source's `maxFilesPerTrigger` budget unit. Checkpoint STUBS must
    * hydrate from the raw log first (condensation emptied their file
    * lists — counting them as 0 would admit an entire stubbed backfill
    * history in one trigger); a stub whose raw commit was vacuumed
    * counts as unbounded, so the capped source gives it its own
    * trigger and readChanges raises its own loud horizon error there. */
  def servedFileCount(dir: String, c: Commit): Long =
    scala.util.Try(hydrate(dir, c)).toOption match {
      case None => Long.MaxValue / 4
      case Some(h) => h.action match {
        case "append" => h.files.size.toLong
        case _ => (h.changeFiles.size + h.removedFiles.size).toLong
      }
    }

  /** Change feed (the Delta CDF read shape; the reference's CDC event
    * log IS its change stream): the rows APPENDED in commits
    * (`afterCommit`, `upToCommit`], each tagged with `_commit`,
    * `_commit_ts` and `_change_type` = 'insert'. `replace` commits are
    * physical rewrites (compaction / DLQ resolution) that change no
    * logical rows and are skipped; consumers that need replace
    * awareness diff [[readAsOf]] snapshots instead. Commits already
    * condensed to checkpoint stubs hydrate from the raw log (loud
    * failure past the vacuum horizon, like [[readAsOf]]) — tail the
    * feed within the retention window. */
  /** The metadata columns every change-feed row carries. */
  val changeMetaSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("_change_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_commit",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("_commit_ts",
      org.apache.spark.sql.types.LongType)))

  /** Schema of [[readChanges]] over the CURRENT table schema — what a
    * change-feed stream ([[graft.sources.GraftStreamSource]]) declares. */
  def changesSchema(dir: String): StructType = {
    val base = currentSchema(dir).getOrElse(throw
      new IllegalArgumentException(s"no CdcTable at $dir"))
    StructType(base.fields ++ changeMetaSchema.fields)
  }

  def readChanges(spark: SparkSession, dir: String, afterCommit: Long,
      upToCommit: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name,
      lit, regexp_extract, url_decode}
    import spark.implicits._
    val commits = CdcTable.log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val hi = upToCommit.getOrElse(commits.last.commit)
    val range = commits
      .filter(c => c.commit > afterCommit && c.commit <= hi)
      .map(hydrate(dir, _))
    val appends = range.filter(c => c.action == "append" &&
      c.files.nonEmpty)
    val dml = range.filter(_.changeFiles.nonEmpty)
    val target = range.lastOption.map(_.schema)
      .getOrElse(commits.last.schema)
    val withMeta = StructType(target.fields ++ changeMetaSchema.fields)
    // rename markers inside the range ride along (no files, no change
    // rows) so earlier in-range content reads under the range-final
    // column names
    val renameMarkers = range.filter(_.rename.nonEmpty)
    val insertLeg = if (appends.isEmpty) None else {
      // ONE scan per schema generation over the whole range (a feed
      // spanning thousands of commits must not become thousands of
      // union legs); each row finds its commit through a BROADCAST
      // (file → commit) map — the manifest knows every file's commit,
      // and the range's file count bounds the map. input_file_name is
      // a URI (percent-encoded once over the on-disk name), so decode
      // it back before matching the manifest's raw relative paths.
      val fileMeta = appends
        .flatMap(c => c.files.map(f => (f, c.commit, c.ts)))
        .toDF("_graft_file", "_commit", "_commit_ts")
      Some(SchemaMerge.castTo(readCommits(spark, dir,
        (appends ++ renameMarkers).sortBy(_.commit)), target)
        .withColumn("_graft_file",
          pctDecode(regexp_extract(input_file_name(), RelPathRe, 1)))
        .join(broadcast(fileMeta), Seq("_graft_file"))
        .drop("_graft_file")
        .withColumn("_change_type", lit("insert"))
        .select(withMeta.fieldNames.map(n =>
          col(s"`$n`")).toIndexedSeq: _*))
    }
    // DML leg (Delta CDF parity): the delete/update_preimage/
    // update_postimage/insert rows the keyed/predicate DML commits
    // persisted as change files — same generation-grouped scan and
    // broadcast (file → commit) tagging as the insert leg. Physical
    // rewrites (compaction/OPTIMIZE/restore) carry no change files
    // and correctly emit nothing.
    val dmlLeg = if (dml.isEmpty) None else {
      val renames = (dml ++ renameMarkers)
        .flatMap(c => c.rename.map(r => (c.schemaVersion, r._1, r._2)))
        .distinct.sortBy(_._1)
      val targetCt = changeSchemaOf(target)
      val cfileMeta = dml
        .flatMap(c => c.changeFiles.map(f => (f, c.commit, c.ts)))
        .toDF("_graft_cfile", "_commit", "_commit_ts")
      val legs = dml.groupBy(_.schemaVersion).toSeq.sortBy(_._1)
        .map { case (sv, cs) =>
          var df = spark.read.schema(changeSchemaOf(cs.last.schema))
            .parquet(cs.flatMap(_.changeFiles)
              .map(f => resolve(dir, f)): _*)
          renames.filter(_._1 > sv).foreach { case (_, from, to) =>
            df = if (to.isEmpty) df.drop(from)
                 else df.withColumnRenamed(from, to)
          }
          SchemaMerge.castTo(df, targetCt)
        }
      Some(legs.reduce(_ unionByName _)
        .withColumn("_graft_cfile", pctDecode(
          regexp_extract(input_file_name(), ChangeRelPathRe, 1)))
        .join(broadcast(cfileMeta), Seq("_graft_cfile"))
        .drop("_graft_cfile")
        .select(withMeta.fieldNames.map(n =>
          col(s"`$n`")).toIndexedSeq: _*))
    }
    // REMOVED-FILE leg (the full-file delete shortcut's read side):
    // a mass delete records fully-dead files as `removedFiles`
    // instead of copying their rows into change files — their
    // `delete` rows derive from the files THEMSELVES (on disk until
    // vacuum; past that the feed fails loudly, the usual horizon),
    // read under their original generations via the owners' manifest
    // entries, with the rename chain and pre-delete DVs applied.
    val withRf = range.filter(_.removedFiles.nonEmpty)
    val rfLeg = if (withRf.isEmpty) None else {
      // soft-hydrate the whole log once (stubs recover their file
      // lists from the raw commit files where those still exist)
      val hydrated = commits.map(c =>
        if (!c.stub) c
        else Fs.readString(commitPath(dir, c.commit)).map(parse)
          .getOrElse(c))
      val legs = withRf.map { c =>
        val rfSet = c.removedFiles.map(fileKey).toSet
        val owners = hydrated
          .map(o => o.copy(files =
            if (o.commit < c.commit) o.files.filter(f => rfSet(fileKey(f)))
            else Nil))
          .filter(o => o.files.nonEmpty ||
            o.rename.nonEmpty || // chain markers (any position) ride
            (o.dvFiles.nonEmpty && o.commit < c.commit)) // pre-delete
        val found = owners.flatMap(_.files).map(fileKey).toSet
        require(rfSet.subsetOf(found),
          s"change feed at $dir: commit ${c.commit} removed " +
            s"${(rfSet -- found).size} file(s) whose owning manifest " +
            "history has been vacuumed — the retention window is the " +
            "feed horizon; tail within it")
        SchemaMerge.castTo(readCommits(spark, dir, owners), target)
          .withColumn("_change_type", lit("delete"))
          .withColumn("_commit", lit(c.commit))
          .withColumn("_commit_ts", lit(c.ts))
          .select(withMeta.fieldNames.map(n =>
            col(s"`$n`")).toIndexedSeq: _*)
      }
      Some(legs.reduce(_ unionByName _))
    }
    Seq(insertLeg, dmlLeg, rfLeg).flatten
      .reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), withMeta))
  }

  /** Percent-decode ONLY `%XX` escapes of a URI path component.
    * `url_decode` alone is form-decoding: it also turns '+' into a
    * space, but '+' is not in Hive's path-escape set, so an on-disk
    * name containing a literal '+' would stop matching the manifest's
    * raw relative path (or yield the wrong partition value) and rows
    * would silently vanish. Protecting '+' as %2B first makes
    * url_decode a pure %XX decoder. */
  private def pctDecode(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{regexp_replace, url_decode}
    url_decode(regexp_replace(c, "\\+", "%2B"))
  }

  /** Hive `key=value` partition segments of a staged file path, in
    * path order — derived from the MANIFEST alone, no FS listing.
    * Normalized through [[fileKey]] first: borrowed ABSOLUTE entries
    * (shallow clones) must contribute only their `data/batch-…`
    * suffix — a `key=value` segment in the SOURCE table's own
    * directory path (e.g. `/warehouse/region=eu/tbl`) is not a
    * partition column of the borrowed file and would otherwise
    * corrupt clone reads and rewrite layout checks. */
  private def partColsFromPath(rel: String): Seq[String] =
    fileKey(rel).split('/').toIndexedSeq
      .filter(seg => seg.contains('=') && !seg.startsWith("."))
      .map(_.split("=", 2)(0)).distinct

  /** Past this many live tombstone positions the DV filter switches
    * from a broadcast map probe (zero shuffle, O(1)/row) to a
    * distributed anti-join (shuffles the DV side only — the scan side
    * stays where it is via broadcast… no: a plain anti-join; the
    * degenerate huge-DV mode a compaction should have folded long
    * ago). Tunable via -Dgraft.dv.broadcastLimit. */
  private def dvBroadcastLimit: Long =
    sys.props.get("graft.dv.broadcastLimit").map(_.toLong)
      .getOrElse(20000000L)

  private val dvSchema = StructType(Seq(
    StructField("_graft_file", org.apache.spark.sql.types.StringType),
    StructField("_graft_pos", org.apache.spark.sql.types.LongType)))

  /** One scan per (generation, partition-layout): data columns are
    * read flat from the exact committed file list and the partition
    * columns are re-derived from the file PATH (the manifests know the
    * full staged paths, so this works across any mix of partitioned
    * appends and differently-laid-out replace commits — Spark's
    * directory-based partition discovery cannot, because the
    * `batch-<uuid>` level between data/ and the partition dirs is not
    * key=value). Scan legs stay bounded: generations are few and each
    * has at most a couple of layouts.
    *
    * DELETION VECTORS: when the passed commits carry DV sidecars,
    * each leg is tagged with (rel file, `_metadata.row_index`) at the
    * scan and tombstoned positions are filtered out — merge-on-read.
    * The common path broadcasts the (file → sorted positions) map and
    * probes it with a binary search per row (no shuffle, no plan
    * break beyond the filter); a DV set past [[dvBroadcastLimit]]
    * falls back to a distributed anti-join. Legs whose files carry no
    * tombstones skip the filter entirely, so pre-DV history scans at
    * full codegen speed.
    *
    * `tagPos` additionally KEEPS the (`_graft_file`, `_graft_pos`)
    * columns in the output — the scan primitive [[deleteKeysDV]]
    * builds sidecars from. */
  private def readCommits(spark: SparkSession, dir: String,
      commits: Seq[Commit], tagPos: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val target0 = commits.last.schema
    val dvSidecars = commits.flatMap(_.dvFiles).distinct
    // (file → sorted positions) for the broadcast probe; None = use
    // the anti-join fallback (DV set too large to hold on the driver)
    val dvMap: Option[Map[String, Array[Long]]] =
      if (dvSidecars.isEmpty) Some(Map.empty)
      else {
        val dv = spark.read.schema(dvSchema)
          .parquet(dvSidecars.map(f => resolve(dir, f)): _*)
        if (dv.count() > dvBroadcastLimit) None
        else Some(dv.collect()
          .groupBy(_.getString(0))
          .map { case (f, rows) =>
            f -> rows.map(_.getLong(1)).distinct.sorted })
      }
    val dvBc = dvMap.filter(_.nonEmpty).map(m =>
      spark.sparkContext.broadcast(m))
    val dvProbe = dvBc.map { bc =>
      udf((f: String, p: Long) => {
        val arr = bc.value.getOrElse(f, null)
        arr != null && java.util.Arrays.binarySearch(arr, p) >= 0
      })
    }
    val target =
      if (!tagPos) target0
      else StructType(target0.fields ++ dvSchema.fields)
    // ordered column-mapping chain (GRAFT RENAME COLUMN): a
    // generation scanned under its own schema then applies every
    // rename committed AFTER it (sv order = commit order — each
    // rename bumps the schema version), which re-expresses old
    // physical names as the target's logical names with ZERO data
    // IO. The chain comes from the PASSED commits, so time travel
    // (a truncated range) never applies post-snapshot renames.
    val renames = commits
      .flatMap(c => c.rename.map(r => (c.schemaVersion, r._1, r._2)))
      .sortBy(_._1)
    val gens = commits
      .groupBy(c => (c.schemaVersion,
        c.files.headOption.map(partColsFromPath).getOrElse(Nil)))
      .toSeq.sortBy(_._1._1)
      .flatMap { case ((sv, partCols), cs) =>
        val files = cs.flatMap(_.files)
        if (files.isEmpty) None
        else {
          val schema = cs.last.schema // one schema per generation
          val dataSchema = StructType(
            schema.fields.filterNot(f => partCols.contains(f.name)))
          var df = spark.read.schema(dataSchema)
            .parquet(files.map(f => resolve(dir, f)): _*)
          // DV / position tagging rides the SCAN (``_metadata`` is a
          // scan-time column — it must be materialized before any
          // projection drops access to it). Legs none of whose files
          // carry tombstones skip the probe: pre-DV history scans
          // unfiltered at full codegen speed.
          val legHasDv = dvMap match {
            case Some(m) => files.exists(f => m.contains(fileKey(f)))
            case None => true // huge-DV fallback: cannot judge cheaply
          }
          if (tagPos || legHasDv) {
            df = df
              .withColumn("_graft_file", relPathCol())
              .withColumn("_graft_pos", col("_metadata.row_index"))
            if (legHasDv) dvProbe match {
              case Some(probe) => df = df.filter(
                !probe(col("_graft_file"), col("_graft_pos")))
              case None =>
                val dv = spark.read.schema(dvSchema)
                  .parquet(dvSidecars.map(f => resolve(dir, f)): _*)
                df = df.join(dv, Seq("_graft_file", "_graft_pos"),
                  "left_anti")
            }
            if (!tagPos) df = df.drop("_graft_file", "_graft_pos")
          }
          partCols.filter(schema.fieldNames.contains).foreach { p =>
            // match inside the data/batch-… suffix only: for borrowed
            // absolute files (shallow clones) a same-named key=value
            // segment in the SOURCE table's directory path would win
            // a first-match regex over the full URI
            val raw = regexp_extract(
              regexp_extract(input_file_name(), RelPathRe, 1),
              java.util.regex.Pattern.quote(p) + "=([^/]+)", 1)
            df = df.withColumn(p,
              when(raw === "__HIVE_DEFAULT_PARTITION__",
                lit(null).cast("string"))
                .otherwise(pctDecode(raw)))
          }
          // after partition injection, so the chain sees every column
          renames.filter(_._1 > sv).foreach { case (_, from, to) =>
            // empty target = DROP: pre-drop generations must shed the
            // column here, or a later re-added column of the same
            // name would resurrect the old values through castTo
            df = if (to.isEmpty) df.drop(from)
                 else df.withColumnRenamed(from, to)
          }
          Some(SchemaMerge.castTo(df, target))
        }
      }
    if (gens.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        target)
    else gens.reduce(_ unionByName _)
  }

  /** Upsert-mode compaction (the reference's declared `upsert` write
    * mode, `config.py:47`, which it never implements; SURVEY.md §7
    * step 5): collapse the append-only event log to its current state
    * — latest event per key wins, soft deletes drop out — and commit
    * it as a `replace` manifest (a new generation superseding all
    * prior commits; their files become vacuumable orphans). Readers
    * see merge-on-read current state via [[graft.query.CurrentState]]
    * between compactions. */
  def compactToCurrentState(spark: SparkSession, dir: String,
      idCol: String = "_id", zorderCols: Seq[String] = Nil,
      numFiles: Int = 0,
      partitionBy: Seq[String] = Seq("_ingestion_date")): Long = {
    // one log snapshot: the state is computed from it AND the replace
    // validates against it, so an append landing mid-compaction fails
    // the commit (ConcurrentModificationException) instead of being
    // silently superseded — retry the compaction to pick it up
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val state = graft.query.CurrentState(
      readCommits(spark, dir, effective(commits)), idCol)
    val partCols = partitionBy.filter(state.columns.contains)
    val clustered =
      if (zorderCols.isEmpty) state
      // cluster WITHIN partitions so the partitioned write keeps files
      // contiguous in z within each partition (OPTIMIZE ZORDER shape)
      else graft.maintain.Maintenance.zorderFrame(state, zorderCols,
        if (numFiles > 0) numFiles
        else math.max(1, spark.sparkContext.defaultParallelism / 2),
        leading = partCols)
    replaceWith(spark, dir, clustered, partitionBy,
      expectedLastCommit = Some(commits.last.commit))
  }

  /** Atomically rewrite the table's whole content as one `replace`
    * manifest under the current schema (superseded files become
    * vacuumable orphans). The rewrite primitive behind upsert
    * compaction and DLQ replay resolution. Keeps the table's partition
    * layout: a generation must be layout-uniform or the unioned
    * per-generation scan would mix partitioned and flat files. */
  final case class DeleteResult(
      rowsDeleted: Long,
      filesRewritten: Long,
      filesCarried: Long,
      commit: Long)

  /** Targeted row deletion (Delta-parity DML — the corpus-removal /
    * right-to-be-forgotten operation a training-data store needs).
    *
    * One pushed-down scan with `input_file_name` finds the EXACT set
    * of files containing matching rows (parquet row-group stats skip
    * the rest, so the scan is cheap relative to any rewrite, and a
    * file that merely MIGHT match never rewrites). Only those files
    * re-write without their matching rows; every other live file is
    * republished by REFERENCE in one optimistic-concurrency replace
    * commit — stats carried forward, zero data movement for the
    * untouched bulk. Readers see the pre-delete snapshot until the
    * single manifest commit lands (MVCC), and time travel to an
    * earlier commit still shows the deleted rows until vacuum.
    *
    * Files from older schema GENERATIONS or with a different
    * partition LAYOUT than `partitionBy` also rewrite (touched or
    * not): a replace commit carries one schema and one layout, so
    * carrying them by reference would misread them — the delete
    * doubles as generation/layout compaction on such tables.
    *
    * @note CHANGE FEED (round 16, Delta CDF parity): the commit
    *       persists its victims as `delete` change rows — partial
    *       files' rows into change files (O(matched)), FULLY-dead
    *       files by reference (`removedFiles`, the full-file
    *       shortcut: a mass delete of whole partitions costs
    *       manifest writes, not a corpus-scale preimage copy) — and
    *       [[readChanges]] / the streaming source serve both. */
  def delete(spark: SparkSession, dir: String, predicate: String,
      partitionBy: Seq[String] = Seq("_ingestion_date")): DeleteResult =
    rewriteMatching(spark, dir, predicate, "delete", partitionBy,
      changes = { (rows, pred) =>
        import org.apache.spark.sql.functions.{coalesce, lit}
        rows.filter(coalesce(pred, lit(false)))
          .withColumn("_change_type", lit("delete"))
      },
      fullFileShortcut = true) { // pure removal: dead files drop
      (rows, pred) =>
        // SQL delete semantics: a NULL predicate means "not matched" —
        // the row must SURVIVE (bare !pred is NULL for it and the
        // filter would silently drop it alongside the true matches)
        import org.apache.spark.sql.functions.{coalesce, lit}
        rows.filter(!coalesce(pred, lit(false)))
    }

  /** Targeted row update (`UPDATE … SET … WHERE …`): same
    * touched-file machinery as [[delete]] — only files containing
    * matching rows rewrite, with the assignments applied to matching
    * rows and everything else byte-identical; untouched files carry by
    * reference. Assignment values are SQL expressions over the row;
    * types coerce through the table schema (castTo), never widen it. */
  def update(spark: SparkSession, dir: String, predicate: String,
      assignments: Seq[(String, String)],
      partitionBy: Seq[String] = Seq("_ingestion_date")): DeleteResult = {
    require(assignments.nonEmpty, "UPDATE needs at least one assignment")
    // validate SET columns before any scan — a no-match update must
    // still reject a typo'd column rather than silently succeed.
    // Resolution follows the session's resolver (case-insensitive by
    // default, matching how Spark resolves the same name in the
    // predicate), and the key is canonicalized to the table's spelling
    // so the projection replaces the column instead of adding one.
    val resolver = spark.sessionState.analyzer.resolver
    val canonical = currentSchema(dir).fold(assignments) { s =>
      assignments.map { case (k, v) =>
        s.fieldNames.filter(resolver(_, k)) match {
          case Array(one) => (one, v)
          case Array() => throw new IllegalArgumentException(
            s"UPDATE SET references unknown column $k")
          case many => throw new IllegalArgumentException(
            s"UPDATE SET column $k is ambiguous under the session " +
              s"resolver (matches ${many.mkString(", ")})")
        }
      }
    }
    // duplicate assignments to one column must error (SQL semantics),
    // not silently last-write-win through the projection map
    val dupCols = canonical.groupBy(_._1).collect {
      case (k, as) if as.size > 1 => k }
    require(dupCols.isEmpty,
      s"duplicate UPDATE SET assignments for: ${dupCols.mkString(", ")}")
    rewriteMatching(spark, dir, predicate, "update", partitionBy,
      changes = { (rows, pred) =>
        import org.apache.spark.sql.functions.{coalesce, expr, lit}
        val matched = rows.filter(coalesce(pred, lit(false)))
        // postimage applies every RHS against the PRE-update row in
        // ONE projection, exactly like the rewrite below
        matched.withColumn("_change_type", lit("update_preimage"))
          .unionByName(matched
            .withColumns(canonical.map { case (k, v) =>
              k -> expr(v) }.toMap)
            .withColumn("_change_type", lit("update_postimage")))
      }) {
      (rows, pred) =>
        import org.apache.spark.sql.functions.{col, expr, when}
        // ONE projection: every predicate and RHS evaluates against
        // the PRE-update row (standard SQL UPDATE semantics) — a
        // sequential withColumn fold would feed later assignments the
        // already-updated columns (SET a = b, b = a would not swap,
        // and SET x = 0 ... WHERE x = 2 would unmatch mid-row)
        rows.withColumns(canonical.map { case (k, v) =>
          k -> when(pred, expr(v)).otherwise(col(s"`$k`"))
        }.toMap)
    }
  }

  /** Keyed MERGE (Delta `whenMatched update-all / whenNotMatched
    * insert-all`, the upsert workhorse): source rows REPLACE same-key
    * target rows, new keys insert — in one commit. The touched-file
    * discovery is a key join instead of a predicate (the source key
    * set is not a literal), then the same carry-by-reference rewrite:
    * only files holding matched keys rewrite (their unmatched rows
    * survive, matched rows drop via LEFT ANTI), the whole source
    * lands as fresh files, everything else republishes by reference.
    * Source keys must be unique per key tuple (duplicates would all
    * insert). */
  def merge(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String],
      partitionBy: Seq[String] = Seq("_ingestion_date"),
      evolveSchema: Boolean = false,
      txn: Option[(String, Long)] = None): DeleteResult =
    keyedRewrite(spark, dir, source, keys, partitionBy, evolveSchema,
      insert = true, op = "merge", txn = txn)

  /** Keyed DELETE: drop every target row whose key tuple appears in
    * `keys` — the repair-plan / right-to-be-forgotten path where the
    * key set is a FRAME, not a literal predicate (so it never
    * round-trips through the driver as an IN-list). Same touched-file
    * machinery as MERGE minus the insert: only files holding matched
    * keys rewrite, everything else carries by reference. */
  def deleteKeys(spark: SparkSession, dir: String, keys: DataFrame,
      keyCols: Seq[String],
      partitionBy: Seq[String] = Seq("_ingestion_date")): DeleteResult =
    keyedRewrite(spark, dir,
      keys.select(keyCols.map(k =>
        org.apache.spark.sql.functions.col(s"`$k`")).toIndexedSeq: _*),
      keyCols, partitionBy, evolveSchema = false,
      insert = false, op = "deleteKeys")

  /** Merge-on-read keyed DELETE — DELETION VECTORS (Delta DV
    * parity): instead of rewriting every touched file, one scan finds
    * the matching rows' (file, `_metadata.row_index`) pairs, writes
    * them as a sidecar parquet under `_dv/batch-…`, and commits ONE
    * manifest that re-publishes every live file by reference plus the
    * sidecar. [[readCommits]] filters tombstoned positions at scan
    * time, so the read is ≡ a rewrite-based [[deleteKeys]] while the
    * COMMIT cost is O(tombstones) — at 100 TB, a million scattered
    * right-to-be-forgotten ids cost one small sidecar write instead
    * of rewriting every touched file's full bytes. The scan itself is
    * DV-applied, so re-deleting an already-deleted key records
    * nothing twice. CDF: the matched rows land as `delete` change
    * rows, exactly like the rewrite path.
    *
    * Housekeeping contracts: OPTIMIZE / compaction (any full rewrite)
    * folds DVs physically and drops the sidecars; manifest stats,
    * blooms and `fileRows` of DV'd files stay conservative
    * (over-inclusive — skipping never prunes wrongly, row estimates
    * upper-bound) until then; time travel before the DV commit still
    * shows the rows; RESTORE treats sidecars as snapshot state. */
  def deleteKeysDV(spark: SparkSession, dir: String, keys: DataFrame,
      keyCols: Seq[String]): DeleteResult = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "deleteKeysDV needs at least one key column")
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val schema = commits.last.schema
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"deleteKeysDV key $k not in the table schema"))
    val srcKeys = keys
      .select(keyCols.map(k => col(s"`$k`")).toIndexedSeq: _*).distinct()
    commitDv(spark, dir, commits, "deleteKeysDV",
      scan => scan.join(srcKeys, keyCols.toSeq, "left_semi"))
  }

  /** Merge-on-read PREDICATE delete — [[delete]]'s deletion-vector
    * sibling (the [[deleteKeysDV]] machinery with a predicate instead
    * of a key frame; SQL: `GRAFT DELETE FROM … WHERE … USING DV`).
    * Same contracts: O(tombstones) commit, zero data rewrite, exact
    * SQL NULL semantics (a NULL predicate row is not matched), CDF
    * delete rows, folded by the next compaction. */
  def deleteDV(spark: SparkSession, dir: String, predicate: String)
      : DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    commitDv(spark, dir, commits, "deleteDV",
      scan => scan.filter(coalesce(expr(predicate), lit(false))))
  }

  /** Merge-on-read keyed MERGE — [[merge]]'s deletion-vector sibling
    * (how Delta's own MoR update path works: matched positions die
    * via a DV sidecar, the WHOLE source appends as fresh files,
    * nothing rewrites). At 100 TB, a scattered upsert of a million
    * keys costs the source write + one sidecar instead of rewriting
    * every touched file's full bytes. One commit (action `"dv"`,
    * which also keeps the append-derived insert leg of the change
    * feed from double-emitting the fresh files — the commit's change
    * files enumerate the logical changes exactly: update_preimage /
    * update_postimage / insert). No schema evolution in MoR mode
    * (widening forces a full rewrite by construction — use [[merge]]
    * with `evolveSchema`). Same source contract as [[merge]]: keys
    * unique per tuple. DVs accumulate until OPTIMIZE/compaction folds
    * them; `txn` gives exactly-once replays. */
  def mergeDV(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String],
      partitionBy: Seq[String] = Seq("_ingestion_date"),
      txn: Option[(String, Long)] = None): DeleteResult = {
    import org.apache.spark.sql.functions.{col, lit}
    require(keys.nonEmpty, "mergeDV needs at least one key column")
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    txn.foreach { case (app, v) =>
      val committed = commits.flatMap(_.txn)
        .filter(_._1 == app).map(_._2)
      if (committed.nonEmpty && committed.max >= v)
        return DeleteResult(0L, 0L,
          effective(commits).flatMap(_.files).size, commits.last.commit)
    }
    val snap = commits.last.commit
    val schema = commits.last.schema
    val extra = source.schema.fieldNames
      .filterNot(schema.fieldNames.contains)
    require(extra.isEmpty,
      s"mergeDV source has columns absent from the table " +
        s"(${extra.mkString(", ")}); schema evolution needs the " +
        "rewrite route (merge with evolveSchema = true)")
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"mergeDV key $k not in the table schema"))
    val live = effective(commits)
    val src = source.localCheckpoint() // pin: feeds 4 branches
    val srcKeys = src
      .select(keys.map(k => col(s"`$k`")).toIndexedSeq: _*).distinct()
    val matched = readCommits(spark, dir, live, tagPos = true)
      .join(srcKeys, keys.toSeq, "left_semi")
      .localCheckpoint()
    val n = matched.count()
    val matchedKeys = matched
      .select(keys.map(k => col(s"`$k`")).toIndexedSeq: _*).distinct()
    val srcCast = applyGenerated(SchemaMerge.castTo(src, schema),
      schema, src.schema.fieldNames.toSet, "mergeDV")
    val ct = "_change_type"
    val changeRows = matched.drop("_graft_file", "_graft_pos")
      .withColumn(ct, lit("update_preimage"))
      .unionByName(srcCast.join(matchedKeys, keys.toSeq, "left_semi")
        .withColumn(ct, lit("update_postimage")))
      .unionByName(srcCast.join(matchedKeys, keys.toSeq, "left_anti")
        .withColumn(ct, lit("insert")))
    // the WHOLE source lands as fresh files under the table's layout
    // (CHECK constraints gate them in-write, like the rewrite route)
    val targetLayout = partitionBy.filter(schema.fieldNames.contains)
    val batchDir = s"$dir/data/batch-${UUID.randomUUID()}"
    val writer = constraintGuard(srcCast, constraintsOf(commits),
      "mergeDV").write.mode("overwrite")
    (if (targetLayout.nonEmpty) writer.partitionBy(targetLayout: _*)
     else writer).parquet(batchDir)
    val fresh = stagedFiles(dir, batchDir)
    val (freshStats, freshRows, freshBytes) =
      FileStats.collectInfo(dir, fresh)
    val sidecar =
      if (n == 0) Nil
      else stageAux(dir, "_dv",
        matched.select(col("_graft_file"), col("_graft_pos")))
    val cfiles = stageAux(dir, "_changes",
      SchemaMerge.castTo(changeRows, changeSchemaOf(schema)))
    val c = commit(dir, nn => Commit(nn, commits.last.schemaVersion,
      "dv", System.currentTimeMillis(), txn, schema, fresh,
      stats = freshStats, fileRows = freshRows,
      fileBytes = freshBytes,
      changeFiles = cfiles, dvFiles = sidecar),
      validate = cur => if (cur.lastOption.map(_.commit) != Some(snap))
        throw new java.util.ConcurrentModificationException(
          s"mergeDV at $dir built from commit $snap but the log is " +
            s"now at ${cur.lastOption.map(_.commit).getOrElse(0L)} — " +
            "a write landed mid-merge; rerun (nothing was lost)"))
    DeleteResult(n, 0L, live.flatMap(_.files).size, c.commit)
  }

  /** Shared DV-delete tail: one DV-applied position-tagged scan
    * (re-deleting already-deleted rows records nothing twice),
    * `matchOf` selects the victims, then ONE sidecar + change-file
    * write and ONE fileless `"dv"` commit. */
  private def commitDv(spark: SparkSession, dir: String,
      commits: Seq[Commit], op: String,
      matchOf: DataFrame => DataFrame): DeleteResult = {
    import org.apache.spark.sql.functions.{col, lit}
    val snap = commits.last.commit
    val schema = commits.last.schema
    val live = effective(commits)
    // pin the matched frame — the sidecar, the change rows and the
    // count all read it
    val matched = matchOf(readCommits(spark, dir, live, tagPos = true))
      .localCheckpoint()
    val n = matched.count()
    if (n == 0)
      return DeleteResult(0L, 0L, live.flatMap(_.files).size, snap)
    val sidecar = stageAux(dir, "_dv",
      matched.select(col("_graft_file"), col("_graft_pos")))
    val cfiles = stageAux(dir, "_changes", SchemaMerge.castTo(
      matched.drop("_graft_file", "_graft_pos")
        .withColumn("_change_type", lit("delete")),
      changeSchemaOf(schema)))
    val c = commit(dir, nn => Commit(nn, commits.last.schemaVersion,
      "dv", System.currentTimeMillis(), None, schema, Nil,
      changeFiles = cfiles, dvFiles = sidecar),
      validate = cur => if (cur.lastOption.map(_.commit) != Some(snap))
        throw new java.util.ConcurrentModificationException(
          s"$op at $dir built from commit $snap but the log " +
            s"is now at ${cur.lastOption.map(_.commit).getOrElse(0L)} " +
            "— a write landed mid-delete; rerun (nothing was lost)"))
    DeleteResult(n, 0L, live.flatMap(_.files).size, c.commit)
  }

  /** `txn`: recorded in the replace commit as an idempotency /
    * HIGH-WATER marker (a committed (appId, ver ≥ v) short-circuits
    * the rewrite, like [[append]]) — the hook incremental maintainers
    * (e.g. [[graft.ext.Dedup.syncComponents]]) use to remember which
    * upstream commit a keyed upsert has folded in. */
  private def keyedRewrite(spark: SparkSession, dir: String,
      source: DataFrame, keys: Seq[String], partitionBy: Seq[String],
      evolveSchema: Boolean, insert: Boolean, op: String,
      txn: Option[(String, Long)] = None): DeleteResult = {
    import org.apache.spark.sql.functions.{col, count, input_file_name,
      lit, regexp_extract}
    require(keys.nonEmpty, s"$op needs at least one key column")
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    txn.foreach { case (app, v) =>
      val committed = commits.flatMap(_.txn)
        .filter(_._1 == app).map(_._2)
      if (committed.nonEmpty && committed.max >= v)
        return DeleteResult(0L, 0L,
          effective(commits).flatMap(_.files).size, commits.last.commit)
    }
    val snap = commits.last.commit
    val tableSchema = commits.last.schema
    // schema evolution (Delta withSchemaEvolution parity): widen the
    // table schema by the source's columns. A WIDENED replace commit
    // must carry every row under the new schema, so evolution forces
    // a FULL rewrite (carry-by-reference would leave files the new
    // schema misreads) — the documented cost of widening through a
    // replace-based DML; same-schema merges keep the cheap path.
    val schema =
      if (evolveSchema)
        SchemaMerge.merge(tableSchema, stripFieldMeta(source.schema),
          SchemaMerge.Auto)
      else tableSchema
    val widened = schema != tableSchema
    if (!evolveSchema) {
      val extra = source.schema.fieldNames
        .filterNot(tableSchema.fieldNames.contains)
      require(extra.isEmpty,
        s"$op source has columns absent from the table " +
          s"(${extra.mkString(", ")}); pass evolveSchema = true to widen")
    }
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"$op key $k not in the table schema"))
    val currentSv =
      if (widened) commits.last.schemaVersion + 1
      else commits.last.schemaVersion
    val live = effective(commits)
    // pin the source: it is evaluated for touch-detection, the
    // anti-join, AND the final write — a non-deterministic source
    // (sampling, a concurrently-written location) re-evaluated per
    // branch could delete a key it then fails to re-insert (Delta
    // materializes the merge source for the same reason)
    val src = source.localCheckpoint()
    val srcKeys = src
      .select(keys.map(k => col(s"`$k`")).toIndexedSeq: _*).distinct()

    val touchedRows = readCommits(spark, dir, live)
      .withColumn("__graft_file", pctDecode(
        regexp_extract(input_file_name(), RelPathRe, 1)))
      .join(srcKeys, keys)
      .groupBy(col("__graft_file")).agg(count(lit(1)).as("n"))
      .collect()
    val touched = touchedRows.map(_.getString(0)).toSet
    val rowsMatched = touchedRows.map(_.getLong(1)).sum

    // FULL-FILE shortcut for pure removals (keyed DELETE, not MERGE —
    // see rewriteMatching): fully-matched files drop from the
    // manifest with no rewrite and no preimage change-file write; the
    // feed derives their delete rows from the files themselves
    val matchedByFile = touchedRows
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val frowsByFile = live.flatMap(_.fileRows)
      .map { case (k, v) => fileKey(k) -> v }.toMap
    val fullyDead: Set[String] =
      if (insert || widened) Set.empty
      else matchedByFile.collect {
        case (f, n) if frowsByFile.get(f).contains(n) => f }.toSet

    val targetLayout = partitionBy.filter(schema.fieldNames.contains)
    def dropped(f: String): Boolean = fullyDead(fileKey(f))
    def mustRewrite(c: Commit, f: String): Boolean =
      !dropped(f) && (widened || touched(fileKey(f)) ||
        c.schemaVersion != currentSv ||
        partColsFromPath(f) != targetLayout)
    val rewriteCommits = live
      .map(c => c.copy(files = c.files.filter(f => mustRewrite(c, f))))
      // rename markers ride along (no files): the rewrite subset's
      // older generations must still read under the renamed schema
      .filter(c => c.files.nonEmpty || c.rename.nonEmpty ||
        c.dvFiles.nonEmpty) // DV sidecars must gate the rewrite scan
    val removed = live.flatMap(c => c.files.filter(dropped)).distinct
    val carried = live.flatMap(c =>
      c.files.filterNot(f => dropped(f) || mustRewrite(c, f)))
    val carriedStats = live.flatMap(_.stats.view
      .filterKeys(f => !touched(fileKey(f)) && carried.contains(f))).toMap
    val carriedRows = live.flatMap(_.fileRows.view
      .filterKeys(f => !touched(fileKey(f)) && carried.contains(f))).toMap
    val carriedBytes = live.flatMap(_.fileBytes.view
      .filterKeys(f => !touched(fileKey(f)) && carried.contains(f))).toMap

    // a keyed delete matching nothing (and needing no generation or
    // layout compaction) must be a no-op commit-wise, like delete()
    if (!insert && rewriteCommits.forall(_.files.isEmpty) &&
        removed.isEmpty)
      return DeleteResult(0L, 0L, carried.size, snap)

    // an insert-only merge (no keys matched, single generation,
    // matching layout) rewrites nothing — readCommits cannot take an
    // empty commit list, so survivors degenerate to an empty frame
    // (cast BEFORE the key join: the rewrite subset's own last commit
    // may predate a key column added by evolution, and the anti-join
    // must resolve keys against the current table schema)
    val rewriteRows =
      if (rewriteCommits.forall(_.files.isEmpty))
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else SchemaMerge.castTo(readCommits(spark, dir, rewriteCommits),
        schema)
    val survivors = rewriteRows.join(srcKeys, keys.toSeq, "left_anti")
    // generated columns: computed when the source lacks them,
    // in-write-verified when it provides them (change rows carry the
    // computed values too — srcCast feeds both)
    val srcCast = applyGenerated(SchemaMerge.castTo(src, schema),
      schema, src.schema.fieldNames.toSet, op)
    // CHECK constraints gate only the NEW rows (survivors passed at
    // their own write time — induction holds); in-write enforcement,
    // no extra scan
    val outRows =
      if (insert) survivors.unionByName(
        constraintGuard(srcCast, constraintsOf(commits), op))
      else survivors
    // a purely full-file keyed delete leaves nothing to rewrite:
    // skip the (empty) staging write entirely
    val fresh =
      if (!insert && rewriteCommits.forall(_.files.isEmpty))
        Seq.empty[String]
      else {
        val batchDir = s"$dir/data/batch-${UUID.randomUUID()}"
        val writer = outRows.write.mode("overwrite")
        (if (targetLayout.nonEmpty) writer.partitionBy(targetLayout: _*)
         else writer).parquet(batchDir)
        stagedFiles(dir, batchDir)
      }
    val (freshStats, freshRows, freshBytes) =
      FileStats.collectInfo(dir, fresh)

    // CDF change rows (Delta CDF parity): matched target rows are the
    // preimages; for MERGE the source splits into update_postimage
    // (matched keys) and insert (new keys) — all O(matched + source),
    // never O(table). The matched-key set is pinned (it gates three
    // branches and is bounded by the source size).
    val ct = "_change_type"
    val matchedOld = rewriteRows.join(srcKeys, keys.toSeq, "left_semi")
    val changeRows =
      if (!insert)
        matchedOld.withColumn(ct, lit("delete"))
      else {
        // pin the matched preimages ONCE (the mergeDV shape): they
        // feed the matched-key split of the source AND the preimage
        // change rows — unpinned, the touched-file subset was scanned
        // twice more (the matched-key distinct and the change-file
        // write each re-ran the semi-join). Volume = the commit's own
        // preimage change rows, which are written out anyway.
        val matchedPre = matchedOld.localCheckpoint()
        val matchedKeys = matchedPre
          .select(keys.map(k => col(s"`$k`")).toIndexedSeq: _*)
          .distinct()
        matchedPre.withColumn(ct, lit("update_preimage"))
          .unionByName(srcCast.join(matchedKeys, keys.toSeq, "left_semi")
            .withColumn(ct, lit("update_postimage")))
          .unionByName(srcCast.join(matchedKeys, keys.toSeq, "left_anti")
            .withColumn(ct, lit("insert")))
      }
    val cfiles = stageAux(dir, "_changes",
      SchemaMerge.castTo(changeRows, changeSchemaOf(schema)))

    val c = commit(dir, n => Commit(n, currentSv, "replace",
      System.currentTimeMillis(), txn, schema, carried ++ fresh,
      stats = carriedStats ++ freshStats,
      fileRows = carriedRows ++ freshRows,
      fileBytes = carriedBytes ++ freshBytes,
      changeFiles = cfiles,
      dvFiles = if (carried.isEmpty) Nil
        else live.flatMap(_.dvFiles).distinct,
      removedFiles = removed),
      validate = cur => if (cur.lastOption.map(_.commit) != Some(snap))
        throw new java.util.ConcurrentModificationException(
          s"$op at $dir built from commit $snap but the log is now " +
            s"at ${cur.lastOption.map(_.commit).getOrElse(0L)} — a " +
            s"write landed mid-$op; rerun over the new snapshot " +
            "(nothing was lost)"))
    DeleteResult(rowsMatched, fresh.size, carried.size, c.commit)
  }

  /** Shared DML engine: find the exact touched-file set with one
    * pushed-down scan, rewrite ONLY those files through
    * `transform(rows, pred)`, republish the rest by reference in one
    * optimistic-concurrency replace commit (stats carried).
    * `changes(rows, pred)` produces the commit's CDF rows (the
    * commit's schema + `_change_type`), persisted as change files —
    * O(matched rows), never O(table). */
  private def rewriteMatching(spark: SparkSession, dir: String,
      predicate: String, op: String, partitionBy: Seq[String],
      changes: (DataFrame, org.apache.spark.sql.Column) => DataFrame,
      fullFileShortcut: Boolean = false)(
      transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame)
      : DeleteResult = {
    import org.apache.spark.sql.functions.{col, count, expr,
      input_file_name, lit, regexp_extract}
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val snap = commits.last.commit
    val schema = commits.last.schema
    val currentSv = commits.last.schemaVersion
    val live = effective(commits)
    val pred = expr(predicate)

    val touchedRows = readCommits(spark, dir, live)
      .withColumn("__graft_file", pctDecode(
        regexp_extract(input_file_name(), RelPathRe, 1)))
      .filter(pred)
      .groupBy(col("__graft_file")).agg(count(lit(1)).as("n"))
      .collect()
    val touched = touchedRows.map(_.getString(0)).toSet
    val rowsMatched = touchedRows.map(_.getLong(1)).sum
    if (touched.isEmpty)
      return DeleteResult(0L, 0L, live.flatMap(_.files).size, snap)

    // FULL-FILE shortcut (pure-removal ops only — Delta CDF's
    // remove-file optimization): a touched file whose matched-row
    // count equals its manifest row count has NO survivors — it
    // neither rewrites nor carries nor writes preimage change rows;
    // it drops from the manifest as a `removedFiles` entry and the
    // feed derives its delete rows from the file itself. Files
    // without `frows` metadata (or holding DV'd positions — their
    // matched count is below the raw frows) stay on the partial
    // path: conservative, never wrong. A mass DELETE of whole
    // partitions thereby costs manifest writes, not a corpus-scale
    // preimage copy.
    val matchedByFile = touchedRows
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val frowsByFile = live.flatMap(_.fileRows)
      .map { case (k, v) => fileKey(k) -> v }.toMap
    val fullyDead: Set[String] =
      if (!fullFileShortcut) Set.empty
      else matchedByFile.collect {
        case (f, n) if frowsByFile.get(f).contains(n) => f }.toSet

    val targetLayout = partitionBy.filter(schema.fieldNames.contains)
    def dropped(f: String): Boolean = fullyDead(fileKey(f))
    def mustRewrite(c: Commit, f: String): Boolean =
      !dropped(f) && (touched(fileKey(f)) ||
        c.schemaVersion != currentSv ||
        partColsFromPath(f) != targetLayout)
    val rewriteCommits = live
      .map(c => c.copy(files = c.files.filter(f => mustRewrite(c, f))))
      // rename markers ride along (no files): the rewrite subset's
      // older generations must still read under the renamed schema
      .filter(c => c.files.nonEmpty || c.rename.nonEmpty ||
        c.dvFiles.nonEmpty) // DV sidecars must gate the rewrite scan
    val removed = live.flatMap(c => c.files.filter(dropped)).distinct
    val carried = live.flatMap(c =>
      c.files.filterNot(f => dropped(f) || mustRewrite(c, f)))
    val carriedStats = live.flatMap(_.stats.view
      .filterKeys(f => !touched(fileKey(f)) && carried.contains(f))).toMap
    val carriedRows = live.flatMap(_.fileRows.view
      .filterKeys(f => !touched(fileKey(f)) && carried.contains(f))).toMap
    val carriedBytes = live.flatMap(_.fileBytes.view
      .filterKeys(f => !touched(fileKey(f)) && carried.contains(f))).toMap

    // cast the rewrite set to the CURRENT table schema before the
    // predicate/transform runs: readCommits targets the subset's own
    // last commit, and when only older-generation files need rewriting
    // (e.g. DELETE WHERE newcol IS NULL matching only pre-evolution
    // files) a predicate referencing a newer-generation column would
    // otherwise fail to resolve on a legitimate operation. A purely
    // full-file delete leaves nothing to rewrite at all.
    val rewriteRows =
      if (rewriteCommits.forall(_.files.isEmpty))
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else SchemaMerge.castTo(
        readCommits(spark, dir, rewriteCommits), schema)
    val fresh =
      if (rewriteCommits.forall(_.files.isEmpty)) Seq.empty[String]
      else {
        // the guard re-checks untouched survivor rows of touched
        // files too (they pass by induction) — in-write, O(touched).
        // Generated columns verify here too: an UPDATE that changes a
        // source column without recomputing its derivation fails
        // loudly instead of committing a stale generated value.
        val outRows = constraintGuard(transform(rewriteRows, pred),
          constraintsOf(commits) ++ generatedVerify(schema), op)
        val batchDir = s"$dir/data/batch-${UUID.randomUUID()}"
        val writer = SchemaMerge.castTo(outRows, schema)
          .write.mode("overwrite")
        (if (targetLayout.nonEmpty) writer.partitionBy(targetLayout: _*)
         else writer).parquet(batchDir)
        stagedFiles(dir, batchDir)
      }
    val (freshStats, freshRows, freshBytes) =
      FileStats.collectInfo(dir, fresh)
    // CDF change rows (one extra matched-rows-only scan of the
    // PARTIALLY-touched files — never the carried bulk, and never
    // the fully-dead files the shortcut routed to removedFiles)
    val cfiles = stageAux(dir, "_changes", SchemaMerge.castTo(
      changes(rewriteRows, pred), changeSchemaOf(schema)))

    val c = commit(dir, n => Commit(n, currentSv, "replace",
      System.currentTimeMillis(), None, schema, carried ++ fresh,
      stats = carriedStats ++ freshStats,
      fileRows = carriedRows ++ freshRows,
      fileBytes = carriedBytes ++ freshBytes,
      changeFiles = cfiles,
      dvFiles = if (carried.isEmpty) Nil
        else live.flatMap(_.dvFiles).distinct,
      removedFiles = removed),
      validate = cur => if (cur.lastOption.map(_.commit) != Some(snap))
        throw new java.util.ConcurrentModificationException(
          s"$op at $dir built from commit $snap but the log is now " +
            s"at ${cur.lastOption.map(_.commit).getOrElse(0L)} — a " +
            s"write landed mid-$op; rerun over the new snapshot " +
            "(nothing was lost)"))
    DeleteResult(rowsMatched, fresh.size, carried.size, c.commit)
  }

  /** PARTITION-SCOPED OPTIMIZE (Delta `OPTIMIZE … WHERE` parity) —
    * the 100 TB form of compaction: rewrite ONLY the files whose
    * partition-path values satisfy `predicate`, republish everything
    * else by reference in one optimistic replace commit. At scale a
    * table is optimized partition-by-partition as partitions close
    * (yesterday's ingest date, one language…); a full-table OPTIMIZE
    * is a corpus-scale rewrite nobody runs.
    *
    * The predicate may reference PARTITION columns only — selection
    * is decided from the manifest alone (zero data IO; the file list
    * with path-derived partition values is evaluated as a local
    * frame, so types and percent-decoding match the read path
    * exactly). Files of superseded schema generations or stale
    * layouts join the rewrite (the single-generation replace-commit
    * invariant, same rule as keyed/predicate DML) — with a stable
    * schema that set is empty and the rewrite touches exactly the
    * selected partitions. Rewritten files fold their deletion-vector
    * tombstones physically (the rewrite read is DV-applied); carried
    * files keep their sidecars. A physical rewrite changes no logical
    * rows, so the change feed stays silent (compaction semantics).
    * Returns (filesBefore, filesAfter, commit id). */
  def optimizeWhere(spark: SparkSession, dir: String,
      predicate: Option[String], zorderCols: Seq[String] = Nil,
      nFiles: Option[Int] = None,
      smallerThan: Option[Long] = None): (Int, Int, Long) = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}
    require(predicate.isDefined || smallerThan.isDefined,
      "scoped OPTIMIZE needs WHERE and/or SMALLER THAN; use the " +
        "full OPTIMIZE otherwise")
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val snap = commits.last.commit
    val schema = commits.last.schema
    val currentSv = commits.last.schemaVersion
    val live = effective(commits)
    val files = live.flatMap(_.files)
    val before = files.size
    // partition columns, in path order of the newest data
    val targetLayout = live.reverse.iterator.flatMap(_.files.headOption)
      .map(partColsFromPath).nextOption().getOrElse(Nil)
    val partCols = files.flatMap(partColsFromPath).distinct
    val resolver = spark.sessionState.analyzer.resolver
    val predMatched: Set[String] = predicate match {
      case None => files.toSet
      case Some(pred) =>
        require(partCols.nonEmpty,
          s"OPTIMIZE WHERE on $dir: the table has no partition " +
            "columns — the predicate cannot prune files; run a full " +
            "OPTIMIZE")
        // partition-only predicate: selection must be
        // manifest-decidable. resolveRefs rejects unknowns; a known
        // NON-partition column needs its own message.
        scala.util.Try(resolveRefs(spark, partCols, pred,
          "OPTIMIZE WHERE")).recover { case e: IllegalArgumentException
            if e.getMessage.contains("unknown column") =>
          throw new IllegalArgumentException(
            s"OPTIMIZE WHERE may reference partition columns only " +
              s"(${partCols.mkString(", ")}) — a non-partition " +
              "predicate cannot scope a physical rewrite: " +
              e.getMessage)
        }.get
        // evaluate the predicate on the manifest's file list as a
        // local frame: same percent-decoding + typing as the read
        // path injects
        def rawSeg(f: String, p: String): String =
          fileKey(f).split('/')
            .find(s => s.startsWith(p + "=")).map(_.split("=", 2)(1))
            .orNull
        import scala.jdk.CollectionConverters._
        val fileFrame = spark.createDataFrame(
          files.distinct.map(f => org.apache.spark.sql.Row.fromSeq(
            f +: partCols.map(p => rawSeg(f, p)))).asJava,
          StructType(StructField("_file",
            org.apache.spark.sql.types.StringType) +:
            partCols.map(p => StructField(p,
              org.apache.spark.sql.types.StringType))))
        val typed = partCols.foldLeft(fileFrame) { (df, p) =>
          val t = schema.fields.find(f => resolver(f.name, p))
            .map(_.dataType)
            .getOrElse(org.apache.spark.sql.types.StringType)
          df.withColumn(p,
            when(col(s"`$p`") === "__HIVE_DEFAULT_PARTITION__",
              lit(null).cast("string"))
              .otherwise(pctDecode(col(s"`$p`"))).cast(t))
        }
        typed.filter(coalesce(expr(pred), lit(false)))
          .select(col("_file")).collect().map(_.getString(0)).toSet
    }
    // SMALLER THAN: bin-pack only the small files (Delta's OPTIMIZE
    // semantics) from manifest-recorded sizes — zero IO; legacy files
    // without a recorded size conservatively count as small (they get
    // rewritten once and gain one)
    val selected = smallerThan match {
      case None => predMatched
      case Some(t) =>
        val bytes = live.flatMap(_.fileBytes).toMap
        predMatched.filter(f => bytes.get(f).forall(_ < t))
    }
    if (selected.isEmpty) return (before, before, snap)
    def mustRewrite(c: Commit, f: String): Boolean =
      selected(f) || c.schemaVersion != currentSv ||
        partColsFromPath(f) != targetLayout
    val rewriteCommits = live
      .map(c => c.copy(files = c.files.filter(f => mustRewrite(c, f))))
      .filter(c => c.files.nonEmpty || c.rename.nonEmpty ||
        c.dvFiles.nonEmpty)
    val carried = live.flatMap(c =>
      c.files.filterNot(f => mustRewrite(c, f)))
    val carriedSet = carried.toSet
    val carriedStats = live.flatMap(_.stats.view
      .filterKeys(carriedSet)).toMap
    val carriedRows = live.flatMap(_.fileRows.view
      .filterKeys(carriedSet)).toMap
    val carriedBytes = live.flatMap(_.fileBytes.view
      .filterKeys(carriedSet)).toMap
    val carriedBlooms = live.flatMap(_.blooms.view
      .filterKeys(carriedSet)).toMap
    val rewriteRows = SchemaMerge.castTo(
      readCommits(spark, dir, rewriteCommits), schema)
    val target = nFiles.getOrElse(
      math.max(1, spark.sparkContext.defaultParallelism / 4))
    val out =
      if (zorderCols.nonEmpty)
        graft.maintain.Maintenance.zorderFrame(rewriteRows, zorderCols,
          target)
      else rewriteRows.coalesce(target)
    val batchDir = s"$dir/data/batch-${UUID.randomUUID()}"
    val writer = out.write.mode("overwrite")
    (if (targetLayout.nonEmpty) writer.partitionBy(targetLayout: _*)
     else writer).parquet(batchDir)
    val fresh = stagedFiles(dir, batchDir)
    val (freshStats, freshRows, freshBytes) =
      FileStats.collectInfo(dir, fresh)
    val c = commit(dir, n => Commit(n, currentSv, "replace",
      System.currentTimeMillis(), None, schema, carried ++ fresh,
      stats = carriedStats ++ freshStats,
      fileRows = carriedRows ++ freshRows,
      fileBytes = carriedBytes ++ freshBytes,
      blooms = carriedBlooms,
      dvFiles = if (carried.isEmpty) Nil
        else live.flatMap(_.dvFiles).distinct),
      validate = cur => if (cur.lastOption.map(_.commit) != Some(snap))
        throw new java.util.ConcurrentModificationException(
          s"OPTIMIZE WHERE at $dir built from commit $snap but the " +
            s"log is now at " +
            s"${cur.lastOption.map(_.commit).getOrElse(0L)} — a " +
            "write landed mid-optimize; rerun (nothing was lost)"))
    ((before, c.files.size, c.commit))
  }

  def replaceWith(spark: SparkSession, dir: String, df: DataFrame,
      partitionBy: Seq[String] = Seq("_ingestion_date"),
      expectedLastCommit: Option[Long] = None,
      txn: Option[(String, Long)] = None): Long = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    txn.foreach { case (app, v) =>
      val committed = commits.flatMap(_.txn)
        .filter(_._1 == app).map(_._2)
      if (committed.nonEmpty && committed.max >= v)
        return commits.last.schemaVersion // replayed rewrite — skip
    }
    val base = expectedLastCommit.getOrElse(commits.last.commit)
    val schema = commits.last.schema
    val batchDir = s"$dir/data/batch-${UUID.randomUUID()}"
    val writer = SchemaMerge.castTo(df, schema).write.mode("overwrite")
    val partCols = partitionBy.filter(schema.fieldNames.contains)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(batchDir)
    val nv = commits.last.schemaVersion + 1
    val files = stagedFiles(dir, batchDir)
    val (stats, frows, fbytes) = FileStats.collectInfo(dir, files)
    commit(dir, n => Commit(n, nv, "replace",
      System.currentTimeMillis(), txn, schema, files,
      stats = stats, fileRows = frows, fileBytes = fbytes),
      validate = cur => if (cur.lastOption.map(_.commit) != Some(base))
        throw new java.util.ConcurrentModificationException(
          s"replace at $dir built from commit $base but the log is " +
            s"now at ${cur.lastOption.map(_.commit).getOrElse(0L)} — " +
            "a write landed mid-rewrite; rerun the compaction over " +
            "the new snapshot (nothing was lost)"))
    nv
  }

  /** RESTORE the table to an earlier snapshot — Delta `RESTORE TABLE …
    * TO VERSION AS OF` parity, METADATA-ONLY: the snapshot's effective
    * file lists are re-committed BY REFERENCE (no data is copied or
    * rewritten — at 100 TB a restore is a handful of manifest writes),
    * with the snapshot's schema, so schema evolution rolls back too.
    * History is preserved: the pre-restore commits stay in the log and
    * remain time-travelable.
    *
    * The snapshot's commits merge into ONE manifest per schema/layout
    * GENERATION (the unit [[readCommits]] scans by), so the common
    * single-generation snapshot restores ATOMICALLY in one `replace`
    * commit; a multi-generation snapshot adds one `append` per later
    * generation, under fresh monotonic schema versions that preserve
    * the grouping. The commit chain is optimistically validated: a
    * concurrent write mid-restore fails the restore with
    * ConcurrentModificationException (rerun it) — never silently
    * interleaves (a crash between the commits of a multi-generation
    * restore leaves the first generations restored; rerunning the
    * same restore completes it). Restore reaches only as far as
    * VACUUM left the files: any reinstated file already pruned fails
    * loudly up front (the vacuum retention is the restore horizon,
    * exactly as for [[readAsOf]]). Txn markers are NOT replayed — the
    * original commits still carry them, so exactly-once high-water
    * marks survive the restore unchanged.
    *
    * Returns the new current schema version. Restoring to the current
    * snapshot is a no-op. */
  def restore(spark: SparkSession, dir: String,
      commitAsOf: Option[Long] = None,
      timestampAsOf: Option[Long] = None): Long = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val snap = commitsAsOf(dir, commitAsOf, timestampAsOf)
    if (snap.last.commit == commits.last.commit)
      return commits.last.schemaVersion // already at the snapshot
    // ONE listStatus per distinct data directory (Fs.statBatch), not
    // one exists() RPC per file — a million-file snapshot must not
    // pay a million serial HEAD calls before a metadata-only restore
    // DV sidecars are load-bearing snapshot state: restoring without
    // a pruned sidecar would silently resurrect its deleted rows
    val snapFiles = (snap.flatMap(_.files) ++ snap.flatMap(_.dvFiles))
      .distinct
    val present = Fs.statBatch(snapFiles.map(f => resolve(dir, f))).keySet
    val missing = snapFiles.filterNot(f => present(resolve(dir, f)))
    require(missing.isEmpty,
      s"restore at $dir: ${missing.size} file(s) of the requested " +
        s"snapshot no longer exist (vacuumOrphans pruned superseded " +
        s"data past the retention — the vacuum window is the restore " +
        s"horizon): ${missing.take(3).mkString(", ")}")
    // merge the snapshot's commits into one manifest per GENERATION
    // (the (schemaVersion, partition-layout) unit readCommits scans
    // by), preserving order; fresh monotonic schema versions keep the
    // grouping (equal old sv → equal new sv)
    val gens: Seq[Seq[Commit]] = snap.foldLeft(Vector.empty[Vector[Commit]]) {
      (acc, c) =>
        def key(x: Commit) = (x.schemaVersion,
          x.files.headOption.map(partColsFromPath).getOrElse(Nil))
        acc.lastOption match {
          case Some(g) if key(g.head) == key(c) =>
            acc.init :+ (g :+ c)
          case _ => acc :+ Vector(c)
        }
    }
    val base = commits.last.schemaVersion
    val svMap = snap.map(_.schemaVersion).distinct.sorted
      .zipWithIndex.map { case (sv, i) => sv -> (base + 1 + i) }.toMap
    // constraints are table METADATA and restore with the snapshot
    // (Delta RESTORE parity): diff current set → snapshot set and
    // carry the ops on the first restored commit. The snapshot fold
    // runs over the full log PREFIX (constraint commits may predate
    // the snapshot's last replace).
    val targetCons = constraintsOf(
      commits.takeWhile(_.commit <= snap.last.commit))
    val curCons = constraintsOf(commits)
    val consDiff =
      curCons.filterNot(c => targetCons.exists(_.name == c.name))
        .map(c => ConsOp(add = false, c.name, "", Nil)) ++
        targetCons.filterNot(curCons.contains)
    // properties restore with the snapshot too (Delta RESTORE parity)
    val targetProps = propertiesOf(
      commits.takeWhile(_.commit <= snap.last.commit))
    val curProps = propertiesOf(commits)
    val propDiff: Seq[(String, Option[String])] =
      curProps.keys.filterNot(targetProps.contains)
        .map(k => (k, None: Option[String])).toSeq ++
        targetProps.filter { case (k, v) =>
          curProps.get(k) != Some(v) }
          .map { case (k, v) => (k, Some(v)) }.toSeq
    var expectTail = commits.last.commit
    var newSv = base
    gens.zipWithIndex.foreach { case (g, i) =>
      val action = if (i == 0) "replace" else "append"
      newSv = svMap(g.last.schemaVersion)
      val tailBefore = expectTail
      val committed = commit(dir, n => Commit(n, newSv,
        action, System.currentTimeMillis(), None, g.last.schema,
        g.flatMap(_.files),
        constraintOps = if (i == 0) consDiff else Nil,
        propOps = if (i == 0) propDiff else Nil,
        // a rename marker travels through the restore: its sv is
        // unique, but the group may also hold the SAME-sv appends
        // that followed it (fileless marker + files share the group
        // key), so take the group's one marker — pre-rename files
        // re-committed earlier in this loop keep reading correctly
        rename = g.flatMap(_.rename).headOption,
        stats = g.flatMap(_.stats).toMap,
        fileRows = g.flatMap(_.fileRows).toMap,
        fileBytes = g.flatMap(_.fileBytes).toMap,
        blooms = g.flatMap(_.blooms).toMap,
        // DV sidecars are part of the snapshot's logical state and
        // must reinstate with it; CDF change files are the HISTORY
        // and stay on their original commits (a restore emits no
        // change rows, like compaction — consumers diff snapshots)
        dvFiles = g.flatMap(_.dvFiles).distinct),
        validate = cur =>
          if (cur.lastOption.map(_.commit) != Some(tailBefore))
            throw new java.util.ConcurrentModificationException(
              s"restore at $dir: a write landed mid-restore (expected " +
                s"log tail $tailBefore, found " +
                s"${cur.lastOption.map(_.commit).getOrElse(0L)}); " +
                "rerun the restore"))
      expectTail = committed.commit
    }
    newSv
  }

  /** SHALLOW CLONE — Delta `CREATE TABLE … SHALLOW CLONE` parity: a
    * new table at `dstDir` whose manifest references the SOURCE's
    * current data files by absolute path; no data is copied (cloning
    * a 100 TB table is a few manifest writes). The clone then evolves
    * independently: its own appends/DML land under `dstDir` as usual,
    * and keyed/predicate rewrites of borrowed files write the
    * surviving rows into the clone (never touching the source).
    *
    * The standard shallow-clone hazard applies (as documented for
    * Delta): VACUUM on the SOURCE may delete borrowed files once a
    * source rewrite supersedes them there — the source is unaware of
    * the clone's references. Materialize the clone first (`GRAFT
    * OPTIMIZE`/`COMPACT` rewrite everything into the clone's own
    * directory) if the source's retention cannot be trusted.
    *
    * Returns the number of borrowed files. Fails if `dstDir` already
    * holds a table. */
  def cloneShallow(spark: SparkSession, srcDir: String,
      dstDir: String): Long = {
    val src = log(srcDir)
    require(src.nonEmpty, s"no CdcTable at $srcDir")
    require(log(dstDir).isEmpty,
      s"clone target $dstDir already holds a graft table")
    val eff = effective(src).map(hydrate(srcDir, _))
    // the source's CURRENT constraint set and properties (full-log
    // folds — their commits may predate the last replace) re-state on
    // the clone's FIRST commit, so the clone enforces/honors what the
    // source does
    val srcCons = constraintsOf(src)
    val srcProps = propertiesOf(src).toSeq
      .map { case (k, v) => (k, Some(v)) }
    var borrowed = 0L
    var expectTail = 0L
    eff.zipWithIndex.foreach { case (c, ci) =>
      val abs = c.files.map(f => resolve(srcDir, f))
      borrowed += abs.size
      def rekey[V](m: Map[String, V]): Map[String, V] =
        m.map { case (k, v) => resolve(srcDir, k) -> v }
      val tailBefore = expectTail
      val committed = commit(dstDir, n => Commit(n, c.schemaVersion,
        c.action, System.currentTimeMillis(), None, c.schema, abs,
        rename = c.rename,
        stats = rekey(c.stats), fileRows = rekey(c.fileRows),
        fileBytes = rekey(c.fileBytes),
        blooms = rekey(c.blooms),
        // DV sidecars borrow like data files (their content keys rows
        // by the data/batch-… suffix, identical under the clone);
        // CDF change files are source history and do not clone
        dvFiles = c.dvFiles.map(f => resolve(srcDir, f)),
        constraintOps = if (ci == 0) srcCons else Nil,
        propOps = if (ci == 0) srcProps else Nil),
        validate = cur =>
          if (cur.lastOption.map(_.commit).getOrElse(0L) != tailBefore)
            throw new java.util.ConcurrentModificationException(
              s"clone at $dstDir: a concurrent write landed in the " +
                "target mid-clone"))
      expectTail = committed.commit
    }
    borrowed
  }

  /** Table detail (Delta `DESCRIBE DETAIL` / reference storage stats
    * surface): counts and structure come from the manifest log alone;
    * live bytes are one file-status call per LIVE file (no recursive
    * directory walk over orphans/superseded data). */
  final case class TableDetail(
      commits: Long,
      schemaVersion: Long,
      generations: Long,
      liveFiles: Long,
      liveBytes: Long,
      lastCommitTs: Long,
      lastTxn: Option[(String, Long)],
      /** Manifest-derived live row count ([[rowCountEstimate]]) — a
        * lower bound (files committed before `frows` existed
        * contribute 0), answered with zero data IO. */
      rowsEstimate: Long = 0L,
      /** Active CHECK constraints ([[constraintsOf]]). */
      constraints: Long = 0L)

  def detail(dir: String): TableDetail = {
    val commits = log(dir)
    require(commits.nonEmpty, s"no CdcTable at $dir")
    val eff = effective(commits)
    val files = eff.flatMap(_.files)
    // manifest-recorded sizes first (zero IO); batched listStatus only
    // for legacy files committed before `fbytes` existed
    val known = eff.flatMap(_.fileBytes).toMap
    val unknown = files.distinct.filterNot(known.contains)
    val sizes = Fs.statBatch(unknown.map(f => resolve(dir, f)))
    val bytes = files.map(f => known.getOrElse(f,
      sizes.getOrElse(resolve(dir, f), 0L))).sum
    TableDetail(
      commits = commits.last.commit,
      schemaVersion = commits.last.schemaVersion,
      generations = eff.map(_.schemaVersion).distinct.size.toLong,
      liveFiles = files.size.toLong,
      liveBytes = bytes,
      lastCommitTs = commits.last.ts,
      lastTxn = commits.flatMap(_.txn).lastOption,
      rowsEstimate = eff.flatMap(_.fileRows.values).sum,
      constraints = constraintsOf(commits).size.toLong)
  }

  /** Delete data files no manifest references — crash leftovers and
    * pre-compaction generations — once older than `retainMillis`
    * (grace period for in-flight readers of a superseded snapshot,
    * Delta VACUUM semantics, reference delta_writer.py:268-282).
    * Returns the deleted paths. */
  def vacuumOrphans(dir: String, retainMillis: Long = 7L * 24 * 3600 * 1000)
      : Seq[String] = {
    val commits = log(dir)
    if (commits.isEmpty) return Nil
    val referenced = effective(commits).flatMap(_.files)
      .map(f => resolve(dir, f)).toSet
    val cutoff = System.currentTimeMillis() - retainMillis
    val (fs, dataP) = Fs(s"$dir/data")
    if (!fs.exists(dataP)) return Nil
    val it = fs.listFiles(dataP, true)
    val deleted = Vector.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toUri.getPath
      val matches = referenced.contains(p) ||
        referenced.contains(st.getPath.toString)
      if (!matches && st.getModificationTime < cutoff &&
          (p.endsWith(".parquet") || st.getPath.getName.startsWith("_"))) {
        fs.delete(st.getPath, false)
        deleted += p
      }
    }
    // drop batch dirs left empty
    fs.listStatus(dataP).foreach { d =>
      if (d.isDirectory && fs.listStatus(d.getPath).isEmpty)
        fs.delete(d.getPath, false)
    }
    // CDF change files and DV sidecars: referenced by their commit for
    // as long as the RAW commit file exists (checkpoint stubs hydrate
    // from it); once vacuum has pruned the raw history past retention,
    // the aux files are unreadable-by-design and prune with it
    val auxReferenced = commits
      .map(c => if (!c.stub) c
        else Fs.readString(commitPath(dir, c.commit)).map(parse)
          .getOrElse(c))
      .flatMap(c => c.changeFiles ++ c.dvFiles)
      .map(f => resolve(dir, f)).toSet
    Seq("_changes", "_dv").foreach { sub =>
      val (afs, auxP) = Fs(s"$dir/$sub")
      if (afs.exists(auxP)) {
        val ait = afs.listFiles(auxP, true)
        while (ait.hasNext) {
          val st = ait.next()
          val p = st.getPath.toUri.getPath
          val matches = auxReferenced.contains(p) ||
            auxReferenced.contains(st.getPath.toString)
          if (!matches && st.getModificationTime < cutoff &&
              (p.endsWith(".parquet") ||
                st.getPath.getName.startsWith("_"))) {
            afs.delete(st.getPath, false)
            deleted += p
          }
        }
        afs.listStatus(auxP).foreach { d =>
          if (d.isDirectory && afs.listStatus(d.getPath).isEmpty)
            afs.delete(d.getPath, false)
        }
      }
    }
    // prune log files a checkpoint supersedes (same retention grace:
    // a reader that listed the log before the checkpoint may still be
    // reading the raw commit files). The SECOND-newest checkpoint is
    // retained too: checkpoint writes are temp+rename, which on s3a is
    // a non-atomic copy — if the newest were torn AND its predecessor
    // already pruned, log() would have nothing to fall back to. Raw
    // commits prune only up to that retained predecessor.
    val names = Fs.list(logDir(dir))
    val ckpts = names.filter(_.endsWith(".checkpoint")).sorted
    if (ckpts.nonEmpty) {
      val keepCkpts = ckpts.takeRight(2).toSet
      val pruneUpTo = ckpts.takeRight(2).head
        .stripSuffix(".checkpoint").toLong
      val stale = names.filter { n =>
        (n.endsWith(".commit") &&
          n.stripSuffix(".commit").toLong <= pruneUpTo) ||
          (n.endsWith(".checkpoint") && !keepCkpts(n))
      }
      stale.foreach { n =>
        val p = new org.apache.hadoop.fs.Path(s"${logDir(dir)}/$n")
        if (fs.getFileStatus(p).getModificationTime < cutoff) {
          fs.delete(p, false)
          deleted += p.toUri.getPath
        }
      }
    }
    deleted.result()
  }
}

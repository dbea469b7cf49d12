package graft.sources

import graft.core.Fs
import graft.sink.CdcTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** The `graft` DataSource: the SQL-facing surface of the CdcTable
  * manifest log, registered through the stable `sources` API (v1) +
  * `DataSourceRegister` (META-INF/services), so the table works from
  * pure SQL exactly like Delta's `USING delta` surface (reference
  * research.md:604-615 time travel; `delta_writer.py` table reads):
  *
  *   spark.read.format("graft").load(dir)                 — current state
  *     .option("commitAsOf", 3) / .option("timestampAsOf", ms)
  *   CREATE TABLE t USING graft OPTIONS (path '...'); INSERT INTO t ...
  *   df.write.format("graft").mode("append"|"overwrite").save(dir)
  *
  * (`SELECT * FROM graft.`/path``-style direct file queries are a
  * FileFormat-only Spark feature; the named-table route above is the
  * SQL entry point.)
  *
  * Scan shape: schema comes from the manifest log alone (no file
  * listing); pushed-down filters on partition-path columns prune FILES
  * at the manifest level before Spark ever plans the scan (the
  * Delta/Iceberg log-based file-skipping pattern — see
  * [[GraftRelation.keeps]]); remaining filters and the column
  * projection are applied inside the delegated DataFrame plan, so they
  * reach the underlying parquet reader as PushedFilters/ReadSchema.
  * The v1 exchange hands Spark `RDD[Row]` (one row-conversion on the
  * boundary) — fine for the SQL convenience surface; throughput-
  * critical pipelines use the programmatic [[CdcTable]] API, which is
  * plan-native end to end.
  */
class GraftSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("paths")).getOrElse(
      throw new IllegalArgumentException(
        "the graft format needs a path: .load(dir) or OPTIONS (path '…')"))

  private def mergeModeOf(parameters: Map[String, String])
      : graft.core.SchemaMerge.MergeMode =
    parameters.getOrElse("mergeMode", "auto").toLowerCase match {
      case "auto" => graft.core.SchemaMerge.Auto
      case "strict" => graft.core.SchemaMerge.Strict
      case "permissive" => graft.core.SchemaMerge.Permissive
      case "coercion" => graft.core.SchemaMerge.Coercion
      case other => throw new IllegalArgumentException(
        s"unknown mergeMode '$other' (auto|strict|permissive|coercion)")
    }

  private def partitionByOf(parameters: Map[String, String])
      : Seq[String] =
    parameters.get("partitionBy")
      .map(_.split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("_ingestion_date"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    parameters.get("metaTable") match {
      case Some(which) =>
        GraftMetaRelation(sqlContext, pathOf(parameters), which)
      case None if parameters.get("readChangeFeed")
          .exists(_.toBoolean) =>
        // batch CDF read (Delta `readChangeFeed`/`table_changes`
        // parity): inserts from append commits + the DML change rows
        // (delete / update_preimage / update_postimage / insert),
        // each tagged _change_type/_commit/_commit_ts. Commit bounds
        // are INCLUSIVE, like Delta's startingVersion/endingVersion.
        GraftChangesRelation(sqlContext, pathOf(parameters),
          parameters.get("startingCommit").map(_.toLong).getOrElse(1L),
          parameters.get("endingCommit").map(_.toLong))
      case None =>
        GraftRelation(sqlContext, pathOf(parameters),
          parameters.get("commitAsOf").map(_.toLong),
          parameters.get("timestampAsOf").map(_.toLong),
          stateView = parameters.get("stateView").exists(_.toBoolean),
          idCol = parameters.getOrElse("idCol", "_id"))
    }

  /** Batch write surface. Append = CdcTable.append (schema merged,
    * atomic manifest commit); Overwrite = atomic `replace` under the
    * table's current merged schema (schema evolution happens through
    * appends, never through a rewrite). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val dir = pathOf(parameters)
    val partitionBy = partitionByOf(parameters)
    val exists = Fs.exists(s"$dir/_graft_log")
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft table already exists at $dir (SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Overwrite if exists =>
        CdcTable.replaceWith(data.sparkSession, dir, data, partitionBy)
        ()
      case _ =>
        CdcTable.append(data, dir, mergeModeOf(parameters),
          partitionBy = partitionBy)
        ()
    }
    GraftRelation(sqlContext, dir, None, None)
  }

  /** writeStream surface: every micro-batch appends through one atomic
    * manifest commit, and the (checkpointLocation, batchId) txn makes
    * replayed batches idempotent no-ops — end-to-end exactly-once with
    * no foreachBatch boilerplate. Append output mode only (the table
    * is an event log; updates arrive as new CDC events, as in the
    * reference). */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"the graft sink is append-only (got $outputMode)")
    val dir = pathOf(parameters)
    // The txn id must be unique PER QUERY: two queries sharing one id
    // dedup against each other's batch ids and silently drop data. A
    // per-table fallback would do exactly that, and a session-level
    // spark.sql.streaming.checkpointLocation is resolved per-query by
    // Spark after this hook — not visible here. So: fail loudly.
    val txnAppId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "the graft sink needs .option(\"checkpointLocation\", dir) (or " +
          "an explicit .option(\"txnAppId\", id) unique to this query): " +
          "the exactly-once batch txn is keyed by it, and a shared or " +
          "implicit id would let two queries skip each other's batches. " +
          "Note: a session-level spark.sql.streaming.checkpointLocation " +
          "conf does NOT satisfy this — Spark resolves it per query " +
          "AFTER this hook, so it is not visible here; if you rely on " +
          "the conf, also pass the resolved per-query location (or any " +
          "query-unique id) as an explicit writer option"))
    new GraftStreamSink(dir,
      if (partitionColumns.nonEmpty) partitionColumns
      else partitionByOf(parameters),
      mergeModeOf(parameters),
      txnAppId = txnAppId)
  }

  /** readStream surface: the table's change feed as a micro-batch
    * stream — see [[GraftStreamSource]]. */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), CdcTable.changesSchema(pathOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new GraftStreamSource(sqlContext.sparkSession, pathOf(parameters),
      parameters.getOrElse("startingCommit", "0"),
      parameters.get("maxCommitsPerTrigger").map(_.toLong),
      parameters.get("maxFilesPerTrigger").map(_.toLong))
}

/** Batch change-feed relation —
  * `spark.read.format("graft").option("readChangeFeed", "true")
  * .option("startingCommit", n)[.option("endingCommit", m)].load(dir)`
  * (both bounds inclusive, Delta CDF parity). Declares the CURRENT
  * table schema + change metadata; a range ending before a later
  * rename/drop coerces through castTo (null-filling columns that did
  * not exist then) — bound the range after schema changes, or use the
  * programmatic [[CdcTable.readChanges]] for the range-exact schema. */
final case class GraftChangesRelation(sqlContext: SQLContext,
    dir: String, startingCommit: Long, endingCommit: Option[Long])
    extends BaseRelation with TableScan {

  override val schema: StructType = CdcTable.changesSchema(dir)

  override def buildScan(): RDD[Row] =
    graft.core.SchemaMerge.castTo(
      CdcTable.readChanges(sqlContext.sparkSession, dir,
        afterCommit = startingCommit - 1, upToCommit = endingCommit),
      schema).rdd
}

/** Metadata tables (the Iceberg `.history` / `.files` pattern,
  * Delta's `DESCRIBE HISTORY`): the table's own commit log and file
  * inventory as queryable DataFrames, straight from the manifest —
  * no data files are opened, so these answer instantly at any table
  * size:
  *
  *   spark.read.format("graft").option("metaTable", "history").load(dir)
  *     → (commit, commit_ts, action, schema_version, n_files, is_stub)
  *   … .option("metaTable", "files").load(dir)
  *     → (file, commit, commit_ts, schema_version, n_stats_cols)
  *       one row per LIVE file (files superseded by a replace drop out)
  */
final case class GraftMetaRelation(sqlContext: SQLContext, dir: String,
    which: String) extends BaseRelation with TableScan {
  import org.apache.spark.sql.types._

  private def commits = CdcTable.log(dir)

  override val schema: StructType = which match {
    case "history" => StructType(Seq(
      StructField("commit", LongType, nullable = false),
      StructField("commit_ts", LongType, nullable = false),
      StructField("action", StringType, nullable = false),
      StructField("schema_version", LongType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      StructField("is_stub", BooleanType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("commit", LongType, nullable = false),
      StructField("commit_ts", LongType, nullable = false),
      StructField("schema_version", LongType, nullable = false),
      StructField("n_stats_cols", IntegerType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown metaTable '$other' (history|files)")
  }

  override def buildScan(): RDD[Row] = {
    val rows: Seq[Row] = which match {
      case "history" => commits.map(c => Row(
        c.commit, c.ts, c.action, c.schemaVersion, c.files.size, c.stub))
      case "files" =>
        // live view: a replace supersedes everything before it
        val live = commits.lastIndexWhere(_.action == "replace") match {
          case -1 => commits
          case i => commits.drop(i)
        }
        live.flatMap(c => c.files.map(f => Row(
          f, c.commit, c.ts, c.schemaVersion,
          c.stats.get(f).map(_.size).getOrElse(0))))
    }
    sqlContext.sparkContext.parallelize(rows, 1)
  }
}

/** `stateView = true` serves the merge-on-read CURRENT STATE (latest
  * event per `idCol` wins, soft deletes drop out — the reference's
  * consumer pattern, [[graft.query.CurrentState]]) instead of the raw
  * event log, straight from SQL:
  * `CREATE TABLE t USING graft OPTIONS (path '…', stateView 'true')`.
  * In this mode NO filter reaches below the per-key resolution — a
  * pre-resolution filter could drop the winning event and resurrect a
  * superseded one — so the scan reads the full log, resolves, and
  * leaves every predicate to Spark above (unhandledFilters). */
final case class GraftRelation(sqlContext: SQLContext, dir: String,
    commitAsOf: Option[Long], timestampAsOf: Option[Long],
    stateView: Boolean = false, idCol: String = "_id")
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  /** Schema from the manifest log alone — no file listing, no footer
    * reads (at 100 TB a schema lookup must not touch data files). */
  override val schema: StructType =
    CdcTable.commitsAsOf(dir, commitAsOf, timestampAsOf).last.schema

  /** All filters are re-applied by Spark above this scan: manifest
    * pruning and the delegated-plan filters below can only SKIP work,
    * never change results. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val filtered = if (stateView) {
      // resolution must see EVERY event of a key: no file pruning, no
      // pre-resolution row filters (either could drop the winning
      // event and resurrect a superseded one)
      graft.query.CurrentState(
        CdcTable.readAsOf(sqlContext.sparkSession, dir,
          commitAsOf, timestampAsOf), idCol)
    } else {
      val pruned = prunedRead(filters)
      // hand the remaining predicates to the delegated plan too, so
      // they push into its parquet scan (PushedFilters) instead of
      // filtering post-conversion rows
      filters.flatMap(toColumn)
        .reduceOption(_ && _).map(pruned.filter).getOrElse(pruned)
    }
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(
        requiredColumns.map(c => col(s"`$c`")).toIndexedSeq: _*)
    projected.rdd
  }

  /** The scan's manifest-pruned base frame — three pruning passes,
    * all conservative (Spark re-applies every filter above the scan):
    * partition-path values, per-file column min/max/hasNull stats
    * (data skipping), and per-file Bloom filters (equality skipping on
    * unclustered columns the appends indexed via `bloomCols`).
    * Package-visible so the spec can assert the PLANNED file list of
    * exactly the frame [[buildScan]] executes. */
  private[graft] def prunedRead(filters: Array[Filter]): DataFrame =
    CdcTable.readFiltered(sqlContext.sparkSession, dir,
      (k, v) => filters.forall(keeps(_, k,
        java.net.URLDecoder.decode(v, "UTF-8"))),
      commitAsOf, timestampAsOf,
      statsPredicate =
        stats => filters.forall(graft.sink.FileStats.allows(stats, _)),
      bloomPredicate =
        bl => filters.forall(graft.sink.FileStats.bloomAllows(bl, _)))

  /** INSERT INTO (SQL) — append or overwrite through the same atomic
    * manifest commits as the programmatic API. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    if (overwrite)
      CdcTable.replaceWith(data.sparkSession, dir, data)
    else CdcTable.append(data, dir)
    ()
  }

  /** Does `filter` allow a file whose partition path carries (k, v)?
    * Sound by construction: anything not understood keeps the file
    * (true), and files without a value for the filtered column never
    * reach this predicate (readFiltered keeps them). String
    * comparisons prune lexicographically — correct for the engine's
    * fixed-width ISO `_ingestion_date` values. */
  private def keeps(filter: Filter, k: String, v: String): Boolean =
    filter match {
      case EqualTo(a, x) if a == k => v == String.valueOf(x)
      case EqualNullSafe(a, x) if a == k && x != null =>
        v == String.valueOf(x)
      case In(a, xs) if a == k =>
        xs.exists(x => v == String.valueOf(x))
      case GreaterThan(a, x: String) if a == k => v > x
      case GreaterThanOrEqual(a, x: String) if a == k => v >= x
      case LessThan(a, x: String) if a == k => v < x
      case LessThanOrEqual(a, x: String) if a == k => v <= x
      case IsNull(a) if a == k => v == "__HIVE_DEFAULT_PARTITION__"
      case IsNotNull(a) if a == k => v != "__HIVE_DEFAULT_PARTITION__"
      case StringStartsWith(a, p) if a == k => v.startsWith(p)
      case And(l, r) => keeps(l, k, v) && keeps(r, k, v)
      case Or(l, r) => keeps(l, k, v) || keeps(r, k, v)
      case Not(EqualTo(a, x)) if a == k => v != String.valueOf(x)
      case _ => true
    }

  /** Best-effort translation of a pushed filter back to a Column for
    * the delegated plan; None for shapes not worth translating (Spark
    * re-applies everything anyway). */
  private def toColumn(filter: Filter): Option[Column] = filter match {
    case EqualTo(a, x) => Some(col(s"`$a`") === lit(x))
    case GreaterThan(a, x) => Some(col(s"`$a`") > lit(x))
    case GreaterThanOrEqual(a, x) => Some(col(s"`$a`") >= lit(x))
    case LessThan(a, x) => Some(col(s"`$a`") < lit(x))
    case LessThanOrEqual(a, x) => Some(col(s"`$a`") <= lit(x))
    case In(a, xs) => Some(col(s"`$a`").isin(xs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(s"`$a`").isNull)
    case IsNotNull(a) => Some(col(s"`$a`").isNotNull)
    case StringStartsWith(a, p) => Some(col(s"`$a`").startsWith(p))
    case StringEndsWith(a, p) => Some(col(s"`$a`").endsWith(p))
    case StringContains(a, p) => Some(col(s"`$a`").contains(p))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r))
      yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r))
      yield lc || rc
    case Not(f) => toColumn(f).map(!_)
    case _ => None
  }
}

package graft.ext

import graft.core.Fs

/** Race-free per-index configuration sidecar for the incremental
  * dedup/similarity indexes: one `_graft_index_meta` file inside the
  * index directory, written exactly once with a create-exclusive (the
  * same atomic primitive the commit log rides on), holding the layout
  * parameters stored rows are only meaningful under (LSH band count,
  * bucket bit width).
  *
  * Why a sidecar and not a row sample: the previous guard read ONE
  * arbitrary index row (`limit(1).collect()`), so two racing FIRST
  * writers could each see an empty index and seed it with different
  * layouts — after which the check passed or failed nondeterministically
  * and mismatched rows silently never matched. With create-exclusive
  * there is exactly one winning config; the losing racer validates
  * against it BEFORE appending any row and fails loudly on a mismatch.
  *
  * Legacy indexes (created before the sidecar existed) are adopted on
  * first touch: the caller supplies the value recovered from the
  * existing rows and it becomes the sidecar — a one-time migration
  * with no creation race left to lose (rows already pin the layout).
  */
private[graft] object IndexMeta {

  private def path(indexDir: String) = s"$indexDir/_graft_index_meta"

  /** The stored config map, creating the sidecar with `proposed` if
    * this is the first writer. `legacy` recovers the config from
    * pre-sidecar index rows (None = index empty / fresh). Returns the
    * WINNING map — the caller decides whether a mismatch against its
    * own parameters is adoptable or an error. Keys added to the
    * format AFTER an index was created are simply absent from its
    * map; callers supply their backward-compatible default via
    * `getOrElse`. */
  def ensure(indexDir: String, proposed: Map[String, Int],
      legacy: () => Option[Map[String, Int]]): Map[String, Int] =
    ensureRaw(indexDir,
      proposed.map { case (k, v) => k -> v.toString },
      () => legacy().map(_.map { case (k, v) => k -> v.toString }))
      // non-integer entries (e.g. a pinned column list) are simply
      // not part of the Int view
      .flatMap { case (k, v) =>
        scala.util.Try(v.trim.toInt).toOption.map(k -> _) }

  /** String-valued [[ensure]] — for configs that are not integers
    * (e.g. the profile index's pinned column list). Values must not
    * contain newlines (one `k=v` line per entry). */
  def ensureRaw(indexDir: String, proposed: Map[String, String],
      legacy: () => Option[Map[String, String]]): Map[String, String] = {
    proposed.foreach { case (k, v) =>
      require(!v.contains("\n") && !k.contains("=") && !k.contains("\n"),
        s"index meta entry $k is not line-safe") }
    def read(): Option[Map[String, String]] =
      Fs.readString(path(indexDir)).map { s =>
        s.linesIterator.flatMap { line =>
          val i = line.indexOf('=')
          if (i < 0) None
          else Some(line.substring(0, i) -> line.substring(i + 1))
        }.toMap
      }
    read().getOrElse {
      val v = legacy().getOrElse(proposed)
      val content = v.toSeq.sortBy(_._1)
        .map { case (k, x) => s"$k=$x" }.mkString("\n")
      if (graft.core.CommitArbiter.current.tryExclusive(
          path(indexDir), content)) v
      // lost the creation race — the winner's config is authoritative
      else read().getOrElse(sys.error(
        s"index meta at ${path(indexDir)} vanished mid-read"))
    }
  }

  /** Single-key convenience over [[ensure]]; errors if the stored
    * sidecar predates `key` entirely (the single-key indexes always
    * wrote their one key at creation). */
  def ensureInt(indexDir: String, key: String, proposed: Int,
      legacy: () => Option[Int]): Int =
    ensure(indexDir, Map(key -> proposed),
      () => legacy().map(v => Map(key -> v)))
      .getOrElse(key, sys.error(
        s"index meta at ${path(indexDir)} has no key '$key'"))

  /** Rewrite the sidecar unconditionally — for OFFLINE migrations
    * that change the stored layout (e.g. [[Dedup.rebandIndex]]).
    * Plain overwrite, no create-exclusive: migrations are
    * single-writer maintenance by contract (quiesce appenders first),
    * so there is no creation race to lose. */
  def overwrite(indexDir: String, values: Map[String, Int]): Unit =
    Fs.writeString(path(indexDir), values.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("\n"))

  /** Run an optimistic-concurrency index fold, retrying when a racing
    * append supersedes its snapshot (the append always wins — a fold
    * must never cost a live stream a commit). The fold closure
    * re-reads the log on every attempt. */
  def foldWithRetry(retries: Int)(fold: () => Unit): Unit = {
    var attempt = 0
    while (true) {
      try { fold(); return }
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > retries) throw e
      }
    }
  }
}

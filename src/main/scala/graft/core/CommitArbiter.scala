package graft.core

/** Cross-PROCESS commit arbitration seam (the piece of the commit
  * protocol that depends on what the storage system can promise).
  *
  * A graft table's commit point is winning the create of
  * `_graft_log/N.commit` for the next id N. Within one JVM the
  * per-table lock serializes writers; ACROSS processes the winner must
  * be decided by an atomic conditional create — which local O_EXCL and
  * the HDFS namenode provide, but a bare S3 `create(overwrite=false)`
  * does not (check-then-act: two drivers on different machines can
  * both "win" and the second PUT silently replaces the first manifest
  * — a lost commit). The reference never faces this (one writer
  * process by construction); a multi-driver cluster deployment does.
  *
  * The contract is explicit and three-tiered:
  *
  *  1. On schemes with PROVEN atomic create-exclusive
  *     ([[Fs.provenAtomicCreateExclusive]]: local, hdfs, or any
  *     scheme the deployment asserts via
  *     `-Dgraft.commit.conditionalCreateSchemes=s3a,...` — assert it
  *     only when the connector really issues a conditional write,
  *     e.g. S3 `If-None-Match` PUTs), the default arbiter IS the
  *     atomic create: safe for any number of writer processes.
  *  2. On unproven schemes the default arbiter adds READ-BACK
  *     verification: after a create "succeeds" it re-reads the file
  *     and claims victory only if its own content survived, turning
  *     most silent-overwrite races into ordinary lost-race retries.
  *     This SHRINKS the window, it does not close it (both writers
  *     can read back between each other's PUTs) — hence
  *     [[graft.sink.CdcTable.requireCrossProcessCommits]] still
  *     refuses multi-writer intent on these schemes.
  *  3. Deployments that need true multi-writer on such stores
  *     [[CommitArbiter.install]] an external arbiter (a DynamoDB-style
  *     lock table, a database row, a coordination service — the same
  *     seam delta-storage-s3-dynamodb fills for Delta): whatever can
  *     answer "did I, alone, claim this path?" atomically.
  */
trait CommitArbiter {

  /** Atomically claim `path` with `content`; true iff THIS caller won
    * (at most one true per path across all processes). */
  def tryExclusive(path: String, content: String): Boolean
}

object CommitArbiter {

  /** Tier 1 + 2 of the contract above. */
  object Default extends CommitArbiter {
    override def tryExclusive(path: String, content: String): Boolean = {
      if (!Fs.createExclusive(path, content)) false
      else if (Fs.provenAtomicCreateExclusive(path)) true
      else Fs.readString(path).contains(content)
    }
  }

  @volatile private var current0: CommitArbiter = Default

  /** The arbiter every table commit routes through. */
  def current: CommitArbiter = current0

  def isDefault: Boolean = current0 eq Default

  /** Install an external arbiter (tier 3). Process-global: one
    * storage deployment per JVM, matching the Hadoop FileSystem
    * cache's own granularity. */
  def install(a: CommitArbiter): Unit = current0 = a

  def reset(): Unit = current0 = Default
}

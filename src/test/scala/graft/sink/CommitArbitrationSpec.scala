package graft.sink

import graft.SparkSpec
import graft.core.{CommitArbiter, Fs}

/** Cross-process commit arbitration (VERDICT r9 #4): the in-process
  * per-table lock cannot serialize two DRIVER PROCESSES, so commit
  * safety across JVMs rests on the conditional-create contract — an
  * atomic create-exclusive where the scheme proves it, a fail-loud
  * refusal (or injected arbiter) where it doesn't. The headline test
  * races two real writer JVMs (separate processes, separate
  * SparkSessions) against one table and checks no commit id was lost
  * or duplicated. */
class CommitArbitrationSpec extends SparkSpec {
  import spark.implicits._

  test("provenAtomicCreateExclusive: scheme contract") {
    assert(Fs.provenAtomicCreateExclusive("/tmp/t"))
    assert(Fs.provenAtomicCreateExclusive("file:///tmp/t"))
    assert(Fs.provenAtomicCreateExclusive("hdfs://nn/t"))
    // pure URI inspection: probing an absent connector must not throw
    assert(!Fs.provenAtomicCreateExclusive("s3a://bucket/table"))
    assert(!Fs.provenAtomicCreateExclusive("gs://bucket/table"))
    // a deployment can assert conditional-create support per scheme
    val key = "graft.commit.conditionalCreateSchemes"
    try {
      System.setProperty(key, "s3a, abfs")
      assert(Fs.provenAtomicCreateExclusive("s3a://bucket/table"))
      assert(Fs.provenAtomicCreateExclusive("abfs://c@a/table"))
      assert(!Fs.provenAtomicCreateExclusive("gs://bucket/table"))
    } finally System.clearProperty(key)
  }

  test("requireCrossProcessCommits refuses unproven stores, accepts proof or arbiter") {
    CdcTable.requireCrossProcessCommits("/tmp/t") // local: fine
    val e = intercept[IllegalStateException] {
      CdcTable.requireCrossProcessCommits("s3a://bucket/table")
    }
    assert(e.getMessage.contains("CommitArbiter"))
    // an installed external arbiter satisfies the probe...
    try {
      CommitArbiter.install(new CommitArbiter {
        override def tryExclusive(p: String, c: String): Boolean =
          Fs.createExclusive(p, c)
      })
      CdcTable.requireCrossProcessCommits("s3a://bucket/table")
    } finally CommitArbiter.reset()
    // ...and reset restores the refusal
    intercept[IllegalStateException] {
      CdcTable.requireCrossProcessCommits("s3a://bucket/table")
    }
  }

  test("default arbiter: loser of a create race reports false") {
    val dir = tmpDir("arb")
    assert(CommitArbiter.current.tryExclusive(s"$dir/1.commit", "A"))
    assert(!CommitArbiter.current.tryExclusive(s"$dir/1.commit", "B"))
    assert(Fs.readString(s"$dir/1.commit").contains("A"))
  }

  test("blind-PUT store: bare create-exclusive silently loses a commit") {
    // the hazard requireCrossProcessCommits exists for, demonstrated
    // on a real FileSystem code path: a store whose
    // create(overwrite=false) never checks existence lets BOTH
    // writers "win" and the second PUT replaces the first manifest
    spark.sparkContext.hadoopConfiguration.set("fs.ncs.impl",
      classOf[NonConditionalFs].getName)
    val dir = tmpDir("ncs")
    assert(Fs.createExclusive(s"ncs:$dir/1.commit", "A"))
    assert(Fs.createExclusive(s"ncs:$dir/1.commit", "B"),
      "the blind PUT must also report success — that IS the hazard")
    assert(Fs.readString(s"ncs:$dir/1.commit").contains("B"),
      "writer A's commit was silently replaced")
    assert(!Fs.provenAtomicCreateExclusive(s"ncs:$dir"))
    intercept[IllegalStateException] {
      CdcTable.requireCrossProcessCommits(s"ncs:$dir")
    }
  }

  test("read-back tier catches a competing PUT landing before the verify") {
    spark.sparkContext.hadoopConfiguration.set("fs.ncs.impl",
      classOf[NonConditionalFs].getName)
    val dir = tmpDir("ncs-rb")
    // no competitor: the default arbiter wins on the unproven scheme
    assert(CommitArbiter.current.tryExclusive(s"ncs:$dir/1.commit", "A"))
    // competitor's PUT lands between our PUT and our read-back: the
    // arbiter must report a LOST race (ordinary retry) instead of two
    // winners
    NonConditionalFs.interloper = Some("RACER")
    try {
      assert(!CommitArbiter.current.tryExclusive(s"ncs:$dir/2.commit", "A"),
        "read-back must detect the overwritten commit")
      assert(Fs.readString(s"ncs:$dir/2.commit").contains("RACER"))
    } finally NonConditionalFs.interloper = None
  }

  test("TWO writer JVMs race one table: no lost or duplicated commit") {
    // Separate processes — nothing in-JVM (tableLocks, FS cache) can
    // mask a broken on-disk protocol. Each subprocess boots its own
    // SparkSession, waits on a barrier so the append windows overlap,
    // then appends 5 one-row batches.
    val dir = tmpDir("race-table")
    val sync = tmpDir("race-sync")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    def launch(id: String): Process =
      new ProcessBuilder(
        javaBin, "-Xmx1g", "-cp", cp,
        "graft.sink.RaceAppendMain", dir, id, "5", sync)
        .redirectOutput(new java.io.File(s"$sync/out-$id.log"))
        .redirectErrorStream(true)
        .start()
    val a = launch("A"); val b = launch("B")
    try {
      import java.nio.file.{Files, Paths}
      val deadline = System.currentTimeMillis() + 120000L
      while (!(Files.exists(Paths.get(sync, "ready-A")) &&
               Files.exists(Paths.get(sync, "ready-B")))) {
        assert(System.currentTimeMillis() < deadline,
          "writer JVMs never became ready — see out-*.log under " + sync)
        assert(a.isAlive || Files.exists(Paths.get(sync, "ready-A")),
          s"writer A died before ready: ${slurp(s"$sync/out-A.log")}")
        assert(b.isAlive || Files.exists(Paths.get(sync, "ready-B")),
          s"writer B died before ready: ${slurp(s"$sync/out-B.log")}")
        Thread.sleep(50L)
      }
      Files.write(Paths.get(sync, "go"), Array.empty[Byte])
      assert(a.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) &&
        a.exitValue() == 0, s"writer A failed: ${slurp(s"$sync/out-A.log")}")
      assert(b.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) &&
        b.exitValue() == 0, s"writer B failed: ${slurp(s"$sync/out-B.log")}")
    } finally { a.destroyForcibly(); b.destroyForcibly(); () }

    // every append became exactly one commit, ids are a gapless
    // 1..10 with no duplicates (a duplicated id = one manifest
    // silently replaced the other = a lost commit)
    val commits = CdcTable.log(dir)
    assert(commits.map(_.commit) == (1L to 10L),
      s"commit ids: ${commits.map(_.commit)}")
    // and no row was lost or doubled across the race
    val rows = CdcTable.read(spark, dir)
      .select("payload").as[String].collect().sorted.toSeq
    val expect = (for (w <- Seq("A", "B"); i <- 1 to 5)
      yield s"$w-$i").sorted
    assert(rows == expect, s"rows: $rows")
  }

  private def slurp(p: String): String =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)))
      s.takeRight(2000)
    } catch { case _: Exception => "<no log>" }
}

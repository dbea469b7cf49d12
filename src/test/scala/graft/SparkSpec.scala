package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. NOTE: the session is one per
  * forked test JVM, shared by every suite that runs in it — suite
  * state (cached plans, temp views) leaks across suites unless
  * released. `afterAll` below asserts the global CacheManager is
  * empty so a leaking suite fails itself instead of poisoning a
  * later suite's regression guard (r9 verdict #1). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  override def afterAll(): Unit = {
    try {
      // only sample the session if this suite actually started it —
      // touching `spark` here would boot a session for suites that
      // never used one
      if (SparkSpec.started.get()) {
        assert(spark.sharedState.cacheManager.isEmpty,
          s"${getClass.getSimpleName} left cached plans behind on the " +
            "JVM-shared session; unpersist() them (cache hygiene is " +
            "load-bearing: leaked plans accumulate storage memory in a " +
            "long-running driver)")
      }
    } finally super.afterAll()
  }
}

object SparkSpec {
  private[graft] val started = new java.util.concurrent.atomic.AtomicBoolean(false)

  lazy val session: SparkSession = { started.set(true); SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate() }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

/** Empirical decomposition of a registered query's wall time by SQL
  * execution (guide §1: measure where the time goes before touching
  * anything). A lifecycle query runs eager internal maintenance jobs
  * (appends, syncs, folds) while its DataFrame is being BUILT — the
  * part `explain` on the returned frame never shows. Each SQL
  * execution's description is the action call site
  * ("parquet at CdcTable.scala:1135"), so aggregating execution wall
  * time by description attributes those jobs to the operators that
  * ran them. Non-SQL jobs (RDD actions) are attributed by their
  * result-stage call site.
  *
  * Usage: runMain graft.tools.ProfileQ <sfDir> <queryName> [...]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQ <sfDir> <query> [query …]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val defs = graft.SparkEntry.allDefs.filter(d => names.contains(d.name))
    require(defs.map(_.name).toSet == names.toSet,
      s"unknown queries: ${names.diff(defs.map(_.name)).mkString(", ")}")
    graft.Tables.all.foreach { t =>
      try spark.read.parquet(s"$dir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // execId -> (desc, t0); finished executions accumulate in order
    val execs = new java.util.concurrent.ConcurrentHashMap[
      Long, (String, Long)]()
    val done = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Double)]())
    // jobs not under a SQL execution: (desc, t0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long)]()
    val listener = new SparkListener {
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: SparkListenerSQLExecutionStart =>
          // rootExecutionId: AQE re-plans nest executions; attribute
          // only the roots so time is not double-counted
          if (s.rootExecutionId.forall(_ == s.executionId))
            execs.put(s.executionId, (s.description, s.time))
        case s: SparkListenerSQLExecutionEnd =>
          Option(execs.remove(s.executionId)).foreach { case (d, t0) =>
            done.add((d, (s.time - t0) / 1e3))
          }
        case _ => ()
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val underSql = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .isDefined
        if (!underSql)
          jobs.put(js.jobId,
            (js.stageInfos.lastOption.map(_.name).getOrElse("?") +
              " [rdd]", js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (desc, t0) =>
          done.add((desc, (je.time - t0) / 1e3))
        }
      }
    }
    defs.foreach { d =>
      // warm pass (JIT, page cache) so the profiled pass matches the
      // bench's min-of-3 steady state
      try d.fn(spark, dir).count() catch { case _: Throwable => () }
      done.clear(); execs.clear(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try d.fn(spark, dir).count() catch { case t: Throwable =>
        println(s"FAILED ${d.name}: ${t.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain the last events
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val all = done.asScala.toSeq
      println(f"\n===== ${d.name}: wall=$wall%.2f s, " +
        f"execs=${all.size}, exec-sum=${all.map(_._2).sum}%.2f s =====")
      println("-- executions >= 0.05 s, in order --")
      all.filter(_._2 >= 0.05).foreach { case (d0, s) =>
        println(f"  $s%6.2f  $d0") }
      println("-- aggregate by callsite --")
      all.groupBy(_._1).map { case (k, v) =>
        (v.map(_._2).sum, v.size, k) }.toSeq.sortBy(-_._1)
        .take(30).foreach { case (s, n, k) =>
          println(f"  $s%6.2f  n=$n%-4d $k") }
    }
    spark.stop()
  }
}

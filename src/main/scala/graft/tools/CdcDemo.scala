package graft.tools

import graft.query.CurrentState
import graft.sink.CdcTable
import graft.streaming.CdcIngest
import org.apache.spark.sql.SparkSession

/** Minimal end-to-end CDC walkthrough over synthetic Debezium
  * envelopes: ingest two batches (with a schema widening in the
  * second), then print the event log, schema history and the
  * current-state view. Usage: runMain graft.tools.CdcDemo [baseDir]
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("cdcdemo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val now = System.currentTimeMillis()
    def env(op: String, id: String, doc: String, ts: Long) =
      s"""{"payload":{"_id":"$id","before":null,"after":"${doc.replace("\"", "\\\"")}",
         |"op":"$op","ts_ms":$ts,"source":{"version":"2.5","connector":"mongodb",
         |"name":"m","ts_ms":$ts,"snapshot":"false","db":"shop","rs":"rs0",
         |"collection":"orders","ord":1}}}""".stripMargin.replace("\n", "")

    val cfg = CdcIngest.Config(base, checkpointDir = s"$base/_ckpt")
    println(s"== ingesting batch 1 (3 inserts) into $base")
    CdcIngest.processBatch(Seq(
      env("c", "o1",
        """{"_id":{"$oid":"507f1f77bcf86cd799439011"},"amount":10,""" +
          """"status":"pending","created":{"$date":1700000000000}}""", now),
      env("c", "o2", """{"_id":"o2","amount":20,"status":"pending"}""", now),
      env("c", "o3", """{"_id":"o3","amount":30,"status":"pending"}""", now)
    ).toDF("value"), cfg)

    println("== ingesting batch 2 (update with double amount = widening, delete)")
    CdcIngest.processBatch(Seq(
      env("u", "o1", """{"_id":"o1","amount":10.5,"status":"shipped"}""",
        now + 1000),
      env("d", "o2", """{"_id":"o2"}""", now + 2000)
    ).toDF("value"), cfg)

    val dir = s"$base/shop_orders"
    println("== schema history")
    CdcTable.schemaHistory(dir).foreach { case (v, s) =>
      println(s"  v$v: ${s.simpleString}") }
    println("== event log")
    val log = CdcTable.read(spark, dir)
    log.select("_id", "amount", "status", "_cdc_operation", "_cdc_timestamp")
      .orderBy("_cdc_timestamp", "_id").show(false)
    println("== current state (latest per _id, deletes dropped)")
    CurrentState(log).select("_id", "amount", "status").orderBy("_id")
      .show(false)
    println("== upsert compaction (log -> current state, new generation)")
    val nv = CdcTable.compactToCurrentState(spark, dir)
    val compacted = CdcTable.read(spark, dir)
    println(s"  generation v$nv, ${compacted.count()} rows")
    compacted.select("_id", "amount", "status").orderBy("_id").show(false)
    println("== targeted DML: GRAFT DELETE (right-to-be-forgotten)")
    val del = spark.sql(
      s"GRAFT DELETE FROM '$dir' WHERE _id = 'o1'").collect()(0)
    println(s"  rows_deleted=${del.getLong(0)} " +
      s"files_rewritten=${del.getLong(1)} carried=${del.getLong(2)}")
    CdcTable.read(spark, dir).select("_id", "amount", "status")
      .orderBy("_id").show(false)
    spark.stop()
  }
}

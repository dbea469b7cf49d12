package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState carries per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val out = StreamOps.runningPerKeyState(
      mem.toDF.toDF("k", "v"), "k", "v")
    val q = out.writeStream.format("memory").queryName("state")
      .outputMode("update").start()
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      mem.addData(("a", 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, events, sum FROM state ORDER BY key, events")
        .as[(String, Long, Double)].collect().toSeq
      // batch 1 emitted a→(2, 3.0), b→(1, 10.0); batch 2 a→(3, 7.0):
      // state carried the earlier count and sum forward
      assert(rows.contains(("a", 3L, 7.0)))
      assert(rows.contains(("b", 1L, 10.0)))
    } finally q.stop()
  }
}

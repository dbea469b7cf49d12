package graft.streaming

import graft.SparkSpec

/** S1 Kafka surface: the connector jar is absent in this environment
  * (zero egress, no kafka artifact under /opt/spark/jars), so the
  * end-to-end path cannot execute here — these tests pin the OPTION
  * CONTRACT the reference consumer requires (event_consumer.py:58-67)
  * and that the failure without the connector is the expected
  * data-source-lookup error, not a silent misconfiguration. */
class KafkaSurfaceSpec extends SparkSpec {

  test("kafka option wiring matches the reference consumer contract") {
    val opts = CdcIngest.kafkaOptions("broker:9092", "mongodb.*", 2000L)
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribePattern") == "mongodb.*")
    assert(opts("kafka.isolation.level") == "read_committed",
      "transactional Debezium producers need read_committed")
    assert(opts("maxOffsetsPerTrigger") == "2000",
      "bounded poll = backpressure (T7)")
    assert(opts("startingOffsets") == "earliest")
  }

  test("without the connector jar the source fails with lookup error") {
    val e = intercept[Exception] {
      CdcIngest.kafkaSource(spark, "broker:9092")
    }
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("kafka"), msg.take(200))
  }
}

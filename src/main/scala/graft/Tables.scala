package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read the parquet files
  * directly — Catalyst prunes columns and pushes filters into the scan,
  * so there is no benefit to materializing views. At cluster scale the
  * same call reads a partitioned table off object storage.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses
    // unless spark.sql.legacy.parquet.nanosAsLong=true (then the column
    // reads as epoch-nanos LongType). Verify/Bench set the conf in
    // their builders; for foreign sessions we set it here — scoped to
    // the events load and only when not already true, since it leaks
    // session-wide (any later NANOS parquet read in the same session
    // will also get longs instead of a fail-fast error). The long is
    // normalized back to a µs TimestampType immediately so queries see
    // the same values DuckDB sees after CAST(ts AS TIMESTAMP).
    if (name == "events" &&
      !spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view named after itself (for spark.sql). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}

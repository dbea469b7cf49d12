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
    // Defensive: events.ts is TIMESTAMP(NANOS) parquet, which Spark 4
    // refuses outright unless this legacy conf is set. Verify/Bench set
    // it in the builder; set it here too so queries survive a foreign
    // session (runtime-settable SQLConf).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` is nanosecond-precision parquet, which Spark 4 only
    // reads with spark.sql.legacy.parquet.nanosAsLong=true (as epoch
    // nanos). Normalize to a microsecond TimestampType here so every
    // query sees the same values DuckDB sees after CAST(ts AS TIMESTAMP).
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` is TIMESTAMP(NANOS) parquet. Spark 4.1.2 reads it as
    // TimestampNTZType, truncating to µs — exactly the naive-timestamp
    // value DuckDB sees after CAST(ts AS TIMESTAMP), so NTZ is the
    // canonical type every query (and every oracle) is written against.
    // Older engines needed spark.sql.legacy.parquet.nanosAsLong=true and
    // surfaced epoch-nanos LongType instead; that path is normalized to
    // the same NTZ µs values. Anything else is a new engine behavior and
    // must fail HERE, not as a wrong-answer row in the oracle gate
    // (TablesSpec pins this contract).
    if (name == "events") {
      val normalized = df.schema("ts").dataType match {
        case TimestampNTZType => df
        // NTZ built by pure epoch arithmetic — no TIMESTAMP→NTZ cast,
        // which would route through the session timezone and skew a
        // non-UTC foreign session relative to the NTZ-read path (r9
        // advisor, low)
        case LongType => df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "timestampadd(MICROSECOND, ts div 1000, " +
              "TIMESTAMP_NTZ'1970-01-01 00:00:00')"))
        case other => throw new IllegalStateException(
          s"events.ts read as unexpected type $other (engine behavior " +
            "changed); extend Tables.apply's normalization to NTZ µs")
      }
      normalized
    } else df
  }

  /** Register every table as a temp view named after itself (for spark.sql). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of the test corpus, for data-bound
  * benchmarking beyond the driver-provided scale factors (the 80-query
  * bench at sf0.1 is dominated by fixed per-query overhead — to see
  * shuffle/scan behavior that predicts 100 TB, the headline queries
  * need data that does not fit a single task).
  *
  * Each replica `r` shifts every key column by `r * STRIDE`, so
  * referential integrity holds within a replica and replicas are
  * disjoint — joins produce exactly N× the rows, aggregations keep
  * their group structure. Dimension anchors (nation/region) stay
  * single-copy: foreign keys into them are NOT shifted, mirroring how
  * real fact growth leaves small dims fixed. Document text is
  * token-tagged per replica (replica 0 keeps the original), so
  * shingle/dedup queries see a corpus N× the vocabulary rather than a
  * degenerate pile of exact duplicates; embeddings replicate as-is
  * (10× cluster mass, same geometry).
  *
  * Output is cached: a marker file records the factor, and a matching
  * cache is reused untouched (bench runs pay generation once). */
object ScaleData {

  private val STRIDE = 1000000000L

  /** Content fingerprint of the base corpus: every file's relative
    * path, size and mtime, hashed. A regenerated base corpus at the
    * same path must invalidate the cached scale-up — matching on
    * "factor from path" alone would silently benchmark stale data. */
  private def baseFingerprint(baseDir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val root = new java.io.File(baseDir)
    val lines = walk(root).map { f =>
      s"${root.toPath.relativize(f.toPath)}|${f.length}|${f.lastModified}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Generate (or reuse) a `factor`× corpus at `outDir` from
    * `baseDir`. Returns generation seconds (0.0 on cache hit). */
  def ensure(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Double = {
    val marker = new java.io.File(s"$outDir/_SCALE_OK")
    val stamp = s"$factor from $baseDir @${baseFingerprint(baseDir)}"
    if (marker.exists() &&
        java.nio.file.Files.readString(marker.toPath).trim == stamp)
      return 0.0
    val t0 = System.nanoTime()
    val dir = new java.io.File(outDir)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    dir.mkdirs()

    def base(t: String): DataFrame =
      spark.read.parquet(s"$baseDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    /** Union `factor` shifted replicas of `df`. */
    def replicate(df: DataFrame)(shift: (DataFrame, Long) => DataFrame)
        : DataFrame =
      (0 until factor).map(r => shift(df, r.toLong * STRIDE))
        .reduce(_ unionByName _)

    // single-copy dims: keys never shift, every replica joins them
    write("nation", base("nation"))
    write("region", base("region"))

    write("customer", replicate(base("customer"))((df, s) =>
      df.withColumn("c_custkey", col("c_custkey") + s)))
    write("supplier", replicate(base("supplier"))((df, s) =>
      df.withColumn("s_suppkey", col("s_suppkey") + s)))
    write("part", replicate(base("part"))((df, s) =>
      df.withColumn("p_partkey", col("p_partkey") + s)))
    write("orders", replicate(base("orders"))((df, s) =>
      df.withColumn("o_orderkey", col("o_orderkey") + s)
        .withColumn("o_custkey", col("o_custkey") + s)))
    write("lineitem", replicate(base("lineitem"))((df, s) =>
      df.withColumn("l_orderkey", col("l_orderkey") + s)
        .withColumn("l_partkey", col("l_partkey") + s)
        .withColumn("l_suppkey", col("l_suppkey") + s)))
    write("events", replicate(base("events"))((df, s) =>
      df.withColumn("event_id", col("event_id") + s)))
    write("embeddings", replicate(base("embeddings"))((df, s) =>
      df.withColumn("vec_id", col("vec_id") + s)))
    // tag every token per replica (replica 0 = original corpus):
    // shingles across replicas are disjoint, so near-dup structure
    // scales instead of collapsing into exact-duplicate pile-ups
    write("documents", replicate(base("documents")) { (df, s) =>
      val tagged =
        if (s == 0L) df
        else df.withColumn("text", array_join(
          transform(split(col("text"), " "),
            t => concat(lit(s"x${s / STRIDE}"), t)), " "))
      tagged.withColumn("doc_id", col("doc_id") + s)
        .withColumn("n_chars", length(col("text")))
    })

    val w = new java.io.PrintWriter(marker)
    try w.print(stamp) finally w.close()
    (System.nanoTime() - t0) / 1e9
  }
}

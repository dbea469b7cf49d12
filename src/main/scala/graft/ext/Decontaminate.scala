package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination at corpus scale — flag training documents
  * sharing verbatim n-grams with an evaluation set (the GPT-3/PaLM
  * 13-gram rule; `n` is a parameter because synthetic corpora need
  * shorter grams to exercise the path).
  *
  * Scale design: the eval set is SMALL by definition (benchmarks are
  * thousands of documents; the corpus is billions), so its distinct
  * n-gram ids fit on the driver. They are packed into a Bloom filter
  * whose serialized bytes ride into the scan as a LITERAL probed by
  * Spark's own codegen'd `BloomFilterMightContain` — the exact
  * expression/sketch pairing `InjectRuntimeFilter` uses for shuffle
  * pruning. The corpus-side explode is filtered AT SCAN SPEED before
  * anything shuffles; only the ~fpp survivors reach the exact
  * verification join (broadcast, eval-sized), which removes Bloom
  * false positives — so the final answer is EXACT, and the oracle can
  * hash-match it, while the 100 TB corpus pays one scan and a
  * near-empty aggregation.
  */
object Decontaminate {

  /** Distinct word-`n`-gram 56-bit md5-prefix ids of `textCol` —
    * engine-portable (DuckDB derives identical ids), narrow on the
    * wire. */
  def ngramSids(textCol: String, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    expr(
      s"""CASE WHEN size(split(trim(`$textCol`), '\\\\s+')) >= $n THEN
         |  array_distinct(transform(
         |    sequence(0, size(split(trim(`$textCol`), '\\\\s+')) - $n),
         |    i -> CAST(conv(substring(md5(concat_ws(' ',
         |           slice(split(trim(`$textCol`), '\\\\s+'), i + 1, $n))),
         |         1, 14), 16, 10) AS BIGINT)))
         |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)
  }

  /** Per-document contamination counts: (id, n_shared) for every
    * corpus document sharing ≥ 1 distinct n-gram with the eval set.
    *
    * Requires GraftExtensions for the `might_contain` prefilter; falls
    * back to the plain broadcast join without it (same result, no
    * scan-stage pruning). */
  def contaminated(corpus: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, n: Int = 13, fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    // distinct eval n-gram ids: driver-bounded by eval-set size
    val evalSids = eval
      .select(explode(ngramSids(textCol, n)).as("sid")).distinct()
    val evalIds = evalSids.as(org.apache.spark.sql.Encoders.scalaLong)
      .collect()

    val exploded = corpus
      .select(col(idCol).as("id"), explode(ngramSids(textCol, n)).as("sid"))
    val prefiltered =
      if (evalIds.nonEmpty &&
          spark.catalog.functionExists("might_contain")) {
        val bloom = BloomFilter.create(math.max(evalIds.length, 64L), fpp)
        evalIds.foreach(bloom.putLong)
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        // the serialized sketch rides into the scan as a binary
        // literal (X'…'), exactly how InjectRuntimeFilter plants its
        // runtime filters; the probe is codegen'd
        val hex = bos.toByteArray.map(b => f"$b%02X").mkString
        exploded.filter(expr(s"might_contain(X'$hex', sid)"))
      } else exploded
    // exact verify kills Bloom false positives: broadcast the
    // eval-sized id set; result is exact
    prefiltered.join(broadcast(evalSids), Seq("sid"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}

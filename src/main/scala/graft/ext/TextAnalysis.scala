package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text-analysis column functions — the library faces of the
  * oracle-checked query pack (q28–q32): token counting, stopword-based
  * quality scoring, marker-based language ID, content fingerprinting.
  * All codegen'd built-ins over a text column; shuffle-free. */
object TextAnalysis {

  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Occurrences of `word` (padded replace trick; non-overlapping). */
  def wordHits(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    ((length(padded) -
      length(regexp_replace(padded, s" ${java.util.regex.Pattern.quote(word)} ", ""))) /
      (word.length + 2)).cast("long")
  }

  /** Stopword-density quality score in [0, ~1]. */
  def qualityScore(text: Column,
      stopwords: Seq[String] = Seq("the", "and", "of", "to")): Column = {
    val hits = stopwords.map(wordHits(text, _)).reduce(_ + _)
    hits.cast("double") / tokenCount(text)
  }

  /** Marker-scored language ID with deterministic priority
    * tie-breaking; `markers` maps language → marker words. */
  def languageId(text: Column,
      markers: Seq[(String, Seq[String])] = Seq(
        "en" -> Seq("the", "and"), "es" -> Seq("el", "la"),
        "de" -> Seq("der", "und"), "fr" -> Seq("le", "et"))): Column = {
    val scores = markers.map { case (lang, ws) =>
      lang -> ws.map(wordHits(text, _)).reduce(_ + _)
    }
    val best = scores.zipWithIndex.foldRight(lit("und")) {
      case (((lang, score), i), acc) =>
        val laterMax = scores.drop(i + 1).map(_._2)
        val isBest = laterMax.foldLeft(score > 0) {
          (c, other) => c && score >= other
        }
        when(isBest, lang).otherwise(acc)
    }
    best
  }

  /** Normalized-content fingerprints: md5 hex + 60-bit numeric. */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))
  def fingerprint60(text: Column): Column =
    conv(substring(fingerprint(text), 1, 15), 16, 10).cast("long")

  private def tokenId(t: Column): Column =
    conv(substring(md5(t), 1, 7), 16, 10).cast("long")

  /** Rolling polynomial hash of the token sequence (order-sensitive
    * document fingerprint, unlike the set-based minhash). */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(trim(text), "\\s+"), t => tokenId(t)),
      lit(0L),
      (acc, x) => pmod(acc * lit(1000003L) + x, lit(1000000007L)))

  /** Overlapping fixed-size token windows (the RAG/pretraining
    * chunker): window i covers tokens [i·step, i·step + width), so
    * consecutive chunks overlap by width − step tokens and every token
    * appears in at least one chunk. Returns an array of token-array
    * chunks to explode — a per-row expression (scan-speed), with the
    * explode fan-out ≈ n/step rows per document. */
  def tokenChunks(text: Column, width: Int, step: Int): Column = {
    require(width > 0 && step > 0 && step <= width,
      s"need 0 < step <= width, got width=$width step=$step")
    val toks = split(trim(text), "\\s+")
    transform(
      sequence(lit(0), floor((size(toks) - 1) / step).cast("int")),
      i => slice(toks, i * step + 1, lit(width)))
  }
}

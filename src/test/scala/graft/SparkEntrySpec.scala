package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guards on the driver contract itself: `queries` is a
  * Map keyed by name, so a DUPLICATE QueryDef name would silently
  * collapse two queries into one and the lost one would vanish from
  * the correctness artifact with no error anywhere. And the oracle
  * hash-compare is row-order-sensitive, so every oracle must end in a
  * total ORDER BY unless the result is provably a single row. These
  * conventions lived only in comments before; a spec makes breaking
  * them a local test failure instead of a red round. */
class SparkEntrySpec extends AnyFunSuite {

  test("query names are unique, well-formed, and map-safe") {
    val names = SparkEntry.allDefs.map(_.name)
    val dupes = names.diff(names.distinct)
    assert(dupes.isEmpty, s"duplicate query names collapse in the Map: $dupes")
    names.foreach(n => assert(n.matches("q\\d+_[a-z0-9_]+"),
      s"non-conforming query name: $n"))
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle is non-empty and order-deterministic") {
    // single-row results cannot be order-ambiguous; everything else
    // must carry a total ORDER BY (the driver's compare hashes rows
    // in sequence)
    val singleRow = Set("q02_point_lookup", "q03_range_revenue",
      "q13_subquery_avg", "q75_kmeans_train", "q166_chrf_corpus",
      "q174_rouge_l_corpus", "q177_corpus_bleu")
    for (d <- SparkEntry.allDefs; sql <- d.oracle) {
      assert(sql.trim.nonEmpty, s"${d.name}: empty oracle")
      assert(sql.toUpperCase.contains("ORDER BY") || singleRow(d.name),
        s"${d.name}: oracle needs a total ORDER BY (hash compare is " +
          "row-order-sensitive) or must be registered single-row")
    }
  }
}

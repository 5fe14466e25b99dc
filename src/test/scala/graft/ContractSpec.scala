package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the harness silently skips
  * oracle entries whose key names no query (typo = a query loses its
  * correctness gate without failing anything), and rows-only queries
  * must stay the explicit, documented set. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries with no query: $dangling")
  }

  test("rows-only queries are exactly the documented approximate set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set(
      "q22_approx_distinct",   // HLL estimate
      "q25_ann_ivf",           // ANN top-k (recall spec-gated)
      "q34_stream_topk",       // Space-Saving sketch
      "q35_quartiles_approx",  // Greenwald-Khanna sketch
      "q48_hll_cube",          // sketch cube (error spec-gated)
      "q59_stream_window_distinct") // streaming HLL (error spec-gated)
    assert(rowsOnly == documented,
      s"undocumented rows-only queries: ${rowsOnly -- documented}; " +
        s"stale documented entries: ${documented -- rowsOnly}")
  }

  test("query names are sequential and well-formed") {
    val nums = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    assert(nums == (1 to 64).map(i => f"q$i%02d").toSet, nums.toSeq.sorted.mkString(","))
  }
}

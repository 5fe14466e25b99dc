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
    // q22/q35/q48/q59 were made oracle-checkable in round 4 by emitting
    // the accuracy claim as hash-matchable columns (exact side + a
    // within-bound boolean), and q34 by running its Space-Saving
    // sketch in the exact regime (capacity > domain, err pinned 0);
    // only genuinely engine-specific CONTENT (ANN neighbor sets)
    // stays rows-only.
    val documented = Set(
      "q25_ann_ivf")           // ANN top-k (recall spec-gated)
    assert(rowsOnly == documented,
      s"undocumented rows-only queries: ${rowsOnly -- documented}; " +
        s"stale documented entries: ${documented -- rowsOnly}")
  }

  test("query names are sequential and well-formed") {
    val nums = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    assert(nums == (1 to 71).map(i => f"q$i%02d").toSet, nums.toSeq.sorted.mkString(","))
  }
}

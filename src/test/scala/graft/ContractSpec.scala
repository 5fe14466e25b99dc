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
    // within-bound boolean), q34 by running its Space-Saving sketch in
    // the exact regime (capacity > domain, err pinned 0), and in round
    // 5 q25 closed the set: its IVF search runs with nprobe = nlist
    // (exhaustive ⇒ provably equals brute force ⇒ q13's oracle), with
    // the approximate regime still recall-spec-gated. Every query is
    // now oracle-gated.
    val documented = Set.empty[String]
    assert(rowsOnly == documented,
      s"undocumented rows-only queries: ${rowsOnly -- documented}; " +
        s"stale documented entries: ${documented -- rowsOnly}")
  }

  test("query names are sequential and well-formed") {
    val nums = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    assert(nums == (1 to 331).map(i => f"q$i%02d").toSet, nums.toSeq.sorted.mkString(","))
  }
}

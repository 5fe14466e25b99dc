package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import graft.SparkSpec

/** [[MinHashLSH.incrementalNearDuplicatesResult]]: delta-vs-corpus
  * dedup must equal the full-corpus run restricted to delta-touching
  * pairs, and its verification must aggregate only candidate docs. */
class IncrementalDedupSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").cache()

  private def fullRestricted(
      deltaPred: Long => Boolean): Set[(Long, Long, Double, Double)] =
    MinHashLSH.nearDuplicates(docs, "doc_id", "text", 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .filter(t => deltaPred(t._1) || deltaPred(t._2))
      .toSet

  private def incremental(
      deltaPred: org.apache.spark.sql.Column): Set[(Long, Long, Double, Double)] = {
    val res = MinHashLSH.incrementalNearDuplicatesResult(
      docs.filter(!deltaPred), docs.filter(deltaPred),
      "doc_id", "text", 0.5)
    val got = res.df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    res.release()
    got
  }

  test("incremental == full corpus restricted to delta-touching pairs") {
    val got = incremental(col("doc_id") % 10 === 0)
    val want = fullRestricted(_ % 10 == 0)
    assert(got == want, s"got ${got.size}, want ${want.size}")
    assert(want.nonEmpty, "fixture has no delta-touching pairs — weak test")
  }

  test("holds for a different (larger) delta split, including est values") {
    val got = incremental(col("doc_id") % 3 === 1)
    val want = fullRestricted(_ % 3 == 1)
    assert(got == want, s"got ${got.size}, want ${want.size}")
  }

  test("empty delta yields no pairs without touching the corpus pairwise") {
    val got = incremental(col("doc_id") < 0)
    assert(got.isEmpty)
  }

  test("signature aggregate runs once per input: cached, not re-planned per scan") {
    // The 32-min signature aggregate feeds three scans (band keys + both
    // estimate joins). Persisted, every consumer reads the cache — the
    // optimized plan must contain NO h0-producing Aggregate (all are
    // behind InMemoryRelation leaves), in both the full and the
    // incremental pipeline. Round-5 regression: the un-persisted plan
    // carried 3 such aggregates per input and q81 paid 12.5 s.
    val full = MinHashLSH.nearDuplicatesResult(docs, "doc_id", "text", 0.5)
    val inc = MinHashLSH.incrementalNearDuplicatesResult(
      docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", 0.5)
    for ((name, res) <- Seq("full" -> full, "incremental" -> inc)) {
      val plan = res.df.queryExecution.optimizedPlan
      val sigAggs = plan.collect {
        case a: Aggregate if a.aggregateExpressions.exists(_.name == "h0") => a
      }
      assert(sigAggs.isEmpty,
        s"$name pipeline re-plans the signature aggregate " +
          s"${sigAggs.size}x instead of reading the cache:\n${sigAggs.headOption}")
      val cachedSigs = plan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation
          if m.output.exists(_.name == "h0") => m
      }
      assert(cachedSigs.nonEmpty,
        s"$name pipeline has no cached signature relation in its plan")
      res.release()
    }
  }

  test("verification set-build aggregates only AFTER the candidate semi-join") {
    val res = MinHashLSH.incrementalNearDuplicatesResult(
      docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", 0.5)
    // every collect_list aggregate (the per-doc shingle-set build) must
    // sit ABOVE a left-semi join — i.e. the corpus postings are
    // restricted to candidate ids before the heavy aggregation. The set
    // build is eagerly persisted (round-12 cache-race fix), so the
    // aggregate lives inside the cached relation's plan: find the `sh`
    // InMemoryRelation and assert the property on its cachedPlan.
    // the relation's outputs are re-aliased per occurrence (sh_a /
    // sh_b), so match on the prefix
    val setCaches = res.df.queryExecution.optimizedPlan.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation
        if m.output.exists(_.name.startsWith("sh")) => m
    }
    assert(setCaches.nonEmpty, "expected a cached shingle-set relation")
    setCaches.foreach { m =>
      val s = m.cachedPlan.toString
      assert(s.contains("collect_list"),
        s"cached set relation has no collect_list set-build aggregate:\n$s")
      assert(s.contains("LeftSemi"),
        s"set-build aggregate is not restricted by a semi-join:\n$s")
    }
    res.release()
  }
}

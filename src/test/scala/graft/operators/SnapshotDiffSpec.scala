package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {

  private def snap(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "val", "bigpayload")
  }

  private val digest = SnapshotDiff.rowDigest(Seq(col("val")))

  test("statuses classify every key correctly") {
    val base = snap(Seq((1L, "a", "p1"), (2L, "b", "p2"), (3L, "c", "p3"), (4L, "d", "p4")))
    val cur = snap(Seq((2L, "b", "p2"), (3L, "CHANGED", "p3"), (4L, "d", "p4"), (5L, "e", "p5")))
    val got = SnapshotDiff.diff(base, cur, "k", digest)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("summarize aggregates counts and key ranges per status") {
    val base = snap(Seq((1L, "a", "p"), (2L, "b", "p"), (7L, "c", "p")))
    val cur = snap(Seq((2L, "B", "p"), (7L, "c", "p"), (9L, "e", "p"), (11L, "f", "p")))
    val got = SnapshotDiff.summarize(base, cur, "k", digest)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("added") == ((2L, 9L, 11L)))
    assert(got("removed") == ((1L, 1L, 1L)))
    assert(got("changed") == ((1L, 2L, 2L)))
    assert(got("unchanged") == ((1L, 7L, 7L)))
  }

  test("the join moves (key, digest) only — payload columns are pruned") {
    val base = snap(Seq((1L, "a", "p1")))
    val cur = snap(Seq((1L, "a", "p1")))
    val d = SnapshotDiff.diff(base, cur, "k", digest)
    assert(!d.queryExecution.optimizedPlan.toString.contains("bigpayload"))
  }

  test("null digest columns do not poison the digest (concat_ws skips)") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, null.asInstanceOf[String], "p")).toDF("k", "val", "bigpayload")
    val cur = Seq((1L, null.asInstanceOf[String], "p")).toDF("k", "val", "bigpayload")
    val got = SnapshotDiff.diff(base, cur, "k", digest).collect()
    assert(got.head.getString(1) == "unchanged")
  }
}

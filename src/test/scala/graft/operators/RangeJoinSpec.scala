package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.ScaleQueries

import scala.util.Random

class RangeJoinSpec extends SparkSpec {

  /** Brute-force reference: every key-equal pair in (lt+low, lt+high]. */
  private def naive(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Double)],
      low: Long, high: Long): Set[(Long, Long, Long, Double)] =
    (for {
      (lk, lt, lid) <- left
      (rk, rt, rv) <- right
      if lk == rk && rt > lt + low && rt <= lt + high
    } yield (lid, lt, rt, rv)).toSet

  private def banded(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Double)],
      low: Long, high: Long): Set[(Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    val l = left.toDF("k", "lt", "lid")
    val r = right.toDF("rk", "rt", "rv")
    RangeJoin.bucketedInner(l, r, "k", "rk", "lt", "rt", low, high)
      .select("lid", "lt", "rt", "rv").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
      .toSet
  }

  test("window boundaries: lower exclusive, upper inclusive") {
    val left = Seq((1L, 100L, 7L))
    val right = Seq((1L, 90L, 0.90), (1L, 91L, 0.91),
      (1L, 100L, 1.00), (1L, 101L, 1.01), (2L, 95L, 9.99))
    // window = (90, 100]: 90 out (exclusive), 101 out, key 2 out
    assert(banded(left, right, -10L, 0L) ==
      Set((7L, 100L, 91L, 0.91), (7L, 100L, 100L, 1.00)))
  }

  test("matches brute force on random data (negative ts, asymmetric window)") {
    val rnd = new Random(42)
    val left = Seq.fill(300)(
      (rnd.nextInt(5).toLong + 1, rnd.nextInt(1000).toLong - 500, rnd.nextLong()))
    val right = Seq.fill(300)(
      (rnd.nextInt(5).toLong + 1, rnd.nextInt(1000).toLong - 500, rnd.nextDouble()))
    // (lt-37, lt+13]: spans both sides of the anchor, crosses bands
    assert(banded(left, right, -37L, 13L) == naive(left, right, -37L, 13L))
  }

  test("null timestamps never match (SQL comparison semantics)") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, Some(100L), 7L), (1L, None, 8L)).toDF("k", "lt", "lid")
    val r = Seq((1L, Some(95L), 0.95), (1L, None, 0.0)).toDF("rk", "rt", "rv")
    val got = RangeJoin.bucketedInner(l, r, "k", "rk", "lt", "rt", -10L, 0L)
      .select("lid", "rv").collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
    // only the non-null pair within the window survives — a null ts on
    // either side banded to a null bucket and failed the exact filter,
    // matching what the naive non-equi join would do
    assert(got == Set((7L, 0.95)))
  }

  test("q46 stream-stream range join equals the batch join") {
    val got = ScaleQueries.streamRangeJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val ev = graft.queries.QueryUtil.eventsTsUs(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("pts"), col("event_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts_us").as("cts"),
        col("value").as("cv"))
    val want = p.join(c, col("user_id") === col("cu") &&
        col("cts") > col("pts") - lit(ScaleQueries.RangeWindowUs) &&
        col("cts") <= col("pts"))
      .select(col("user_id"), col("pts"), col("event_id"), col("cts"), col("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got.nonEmpty && got == want)
  }
}

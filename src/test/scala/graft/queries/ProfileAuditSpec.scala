package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q177/q178: dependency discovery + column-shape census — the
  * profiling extensions beyond the reference's numeric stats. */
class ProfileAuditSpec extends SparkSpec {

  test("q177: FD confidences and IND coverages equal driver replays; verdicts split") {
    val rows = ProfileQueries.dependencyAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val byName = rows.map(r => r._2 -> r).toMap
    assert(rows.length == 6)

    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
    // key FD holds exactly
    val keyFd = byName("customer: custkey -> mktsegment")
    assert(keyFd._5 && keyFd._4 == 1000 && keyFd._3 == cust.length.toLong)
    // nation FD: replay confidence
    val byNation = cust.groupBy(_._2).toSeq
    val kept = byNation.map(_._2.groupBy(_._3).map(_._2.length).max.toLong).sum
    val natFd = byName("customer: nationkey -> mktsegment")
    assert(natFd._4 == 1000 * kept / cust.length && !natFd._5)

    // INDs: lineitem -> orders holds; customer -> orders is partial iff
    // some customer never ordered
    assert(byName("lineitem.orderkey in orders.orderkey")._5)
    assert(byName("orders.custkey in customer.custkey")._5)
    val custKeys = cust.map(_._1).toSet
    val orderCust = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val rev = byName("customer.custkey in orders.custkey")
    assert(rev._3 == custKeys.size.toLong)
    assert(rev._4 == 1000L * custKeys.count(orderCust).toLong / custKeys.size)
    assert(rev._5 == custKeys.forall(orderCust))
  }

  test("q178: entropy census equals a driver replay; key vs enum separate") {
    val rows = ProfileQueries.uniquenessEntropy(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .collect()
    val n = o.length.toLong
    val want = ProfileQueries.UeCols.map { c =>
      val idx = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority").indexOf(c)
      val vals = o.map(r => String.valueOf(r.get(idx)))
      val counts = vals.groupBy(identity).map(_._2.length.toLong)
      val h = counts.toSeq.map(cnt => math.round(1e6 *
        ((cnt.toDouble / n.toDouble) * math.log(n.toDouble / cnt.toDouble)))).sum
      (c, n, counts.size.toLong, 1000L * counts.size / n, h, counts.size.toLong == n)
    }.sortBy(_._1)
    assert(rows.toSeq == want)
    val byCol = rows.map(r => r._1 -> r).toMap
    // the key column is flagged; the 3-value enum is not, and its
    // entropy sits near ln(3) while the key sits near ln(n)
    assert(byCol("o_orderkey")._6 && !byCol("o_orderstatus")._6)
    assert(byCol("o_orderstatus")._5 < 2000000)
    assert(byCol("o_orderkey")._5 > 4000000)
  }
}

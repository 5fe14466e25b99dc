package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout + data skipping (q74's operator): the Morton
  * interleave itself, exactness of the skipped scan, and the claim
  * that justifies the layout — BOTH dimensions prune files, where a
  * linear sort prunes only its own leading column. */
class ZOrderSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .select("l_partkey", "l_suppkey", "l_returnflag", "l_extendedprice")

  private def writeLayout(tag: String): Seq[ZOrderLayout.FileStats] = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_zorder_spec_$tag"
    ZOrderLayout.writeZOrdered(li, path, "l_partkey", "l_suppkey", 16)
  }
  private lazy val zStats = writeLayout("z")

  test("zvalue Column matches the JVM reference interleave") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (199L, 9L),
      (0xFFFFFFFFL, 0xFFFFFFFFL), (12345L, 6789L))
    val df = spark.createDataFrame(pairs).toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrderLayout.zvalue(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrderLayout.zvalueJvm(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // known Morton values: z(1,0)=1 (a takes even bits), z(0,1)=2, z(3,3)=15
    assert(ZOrderLayout.zvalueJvm(1, 0) == 1L)
    assert(ZOrderLayout.zvalueJvm(0, 1) == 2L)
    assert(ZOrderLayout.zvalueJvm(3, 3) == 15L)
  }

  test("scaled zvalue Column matches the JVM twin and spans both dims' high bits") {
    val pairs = Seq((0L, 0L), (199L, 9L), (100L, 5L), (40L, 2L), (79L, 3L))
    val df = spark.createDataFrame(pairs).toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrderLayout.zvalueScaled(col("a"), 0L, 199L, col("b"), 0L, 9L).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) ==
        ZOrderLayout.zvalueScaledJvm(r.getLong(0), 0L, 199L, r.getLong(1), 0L, 9L),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // both extremes scale to the full 16-bit range → max z uses 32 bits
    assert(ZOrderLayout.zvalueScaledJvm(199, 0, 199, 9, 0, 9) == (1L << 32) - 1)
  }

  test("scaled zvalue survives epoch-micros-wide domains (no long overflow)") {
    // domain width ~1.7e18: the old (x-lo)*65535 long arithmetic
    // overflowed past ~1.4e14 and scrambled the layout silently
    val lo = 0L
    val hi = 1700000000000000000L // ~2026 in epoch micros
    val xs = Seq(lo, hi / 4, hi / 2, (hi / 4) * 3, hi)
    val df = spark.createDataFrame(xs.map(x => (x, 5L))).toDF("a", "b")
      .select(col("a"),
        ZOrderLayout.zvalueScaled(col("a"), lo, hi, col("b"), 0L, 9L).as("z"))
    val got = df.orderBy("a").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (x, z) =>
      assert(z == ZOrderLayout.zvalueScaledJvm(x, lo, hi, 5L, 0L, 9L), s"x=$x")
      assert(z >= 0L, s"negative z for x=$x — overflow")
    }
    // scaling is monotone across the domain and hits the full 16-bit
    // range at the extremes (clamped, not wrapped)
    val scaledA = got.map { case (x, _) =>
      ZOrderLayout.zvalueScaledJvm(x, lo, hi, 0L, 0L, 9L) }
    assert(scaledA.toSeq == scaledA.sorted.toSeq)
    assert(ZOrderLayout.zvalueScaledJvm(hi, lo, hi, 9L, 0L, 9L) == (1L << 32) - 1)
  }

  test("skipping scan equals the plain filter exactly, across predicates") {
    for ((pLo, pHi, sLo, sHi) <- Seq((40L, 119L, 2L, 5L), (0L, 10L, 0L, 9L),
        (150L, 199L, 7L, 9L), (500L, 600L, 3L, 4L))) {
      val got = ZOrderLayout
        .skippingScan(spark, zStats, "l_partkey", "l_suppkey", pLo, pHi, sLo, sHi)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val want = li
        .filter(col("l_partkey").between(pLo, pHi) && col("l_suppkey").between(sLo, sHi))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want, s"predicate ($pLo-$pHi, $sLo-$sHi)")
    }
  }

  test("z layout prunes files on BOTH single dimensions") {
    val total = zStats.size
    assert(total >= 12, s"layout produced only $total files")
    // sf0.001 domains: l_partkey 0..199, l_suppkey 0..9
    val pOnly = ZOrderLayout
      .selectFiles(zStats, Some(40L), Some(79L), None, None).size
    val sOnly = ZOrderLayout
      .selectFiles(zStats, None, None, Some(2L), Some(3L)).size
    assert(pOnly <= (total * 6) / 10, s"partkey filter read $pOnly of $total files")
    assert(sOnly <= (total * 3) / 4, s"suppkey filter read $sOnly of $total files")
  }

  test("linear layout is the counterfactual: secondary dimension prunes nothing") {
    // same data sorted by l_partkey alone — every file spans the whole
    // l_suppkey domain, so a suppkey filter can skip NOTHING
    val path = s"${sys.props("java.io.tmpdir")}/graft_zorder_spec_linear"
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(path)
    val linStats = ZOrderLayout.collectStats(spark, path, "l_partkey", "l_suppkey")
    val sOnlyLinear = ZOrderLayout
      .selectFiles(linStats, None, None, Some(2L), Some(3L)).size
    assert(sOnlyLinear == linStats.size,
      s"expected the linear layout to read every file on a suppkey filter")
    // while the z layout skips files for the very same predicate
    val sOnlyZ = ZOrderLayout.selectFiles(zStats, None, None, Some(2L), Some(3L)).size
    assert(sOnlyZ < sOnlyLinear, s"z=$sOnlyZ linear=$sOnlyLinear")
  }

  test("empty-intersection predicates read zero files and return zero rows") {
    val files = ZOrderLayout
      .selectFiles(zStats, Some(100000L), Some(200000L), Some(2L), Some(3L))
    assert(files.isEmpty)
    val n = ZOrderLayout
      .skippingScan(spark, zStats, "l_partkey", "l_suppkey",
        100000L, 200000L, 2L, 3L).count()
    assert(n == 0L)
  }
}

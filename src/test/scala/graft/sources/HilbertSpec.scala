package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hilbert curve + layout contracts: the curve is a bijection with
  * strict cell adjacency (the property Morton lacks), the Column
  * expression agrees with the JVM twin, and the Hilbert layout's
  * per-file rectangles prune at least as well as the z layout on the
  * same corpus. */
class HilbertSpec extends SparkSpec {

  /** Standard inverse walk (spec-local; the engine never needs it). */
  private def d2xy(d0: Long): (Long, Long) = {
    var t = d0
    var x = 0L; var y = 0L
    var s = 1L
    while (s < (1L << HilbertCurve.BitsPerDim)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("curve: round-trips with the inverse walk; consecutive cells are adjacent") {
    val rnd = new scala.util.Random(7)
    (1 to 20000).foreach { _ =>
      val d = rnd.nextLong() & 0xFFFFFFFFL
      val (x, y) = d2xy(d)
      assert(HilbertCurve.xy2d(x, y) == d)
    }
    // strict adjacency — the property Morton fails at every quadrant
    // seam (z jumps diagonally there)
    var prev = d2xy(0L)
    (1L to 8192L).foreach { d =>
      val cur = d2xy(d)
      assert(math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) == 1L,
        s"jump at d=$d")
      prev = cur
    }
    // Morton really does jump, so the assertion above is not vacuous
    val zJumps = (1L to 8192L).count { z =>
      def unspread(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >> 1)) & 0x3333333333333333L
        x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
        x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
        x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
        (x | (x >> 16)) & 0xFFFFFFFFL
      }
      val (ax, ay) = (unspread(z - 1), unspread((z - 1) >> 1))
      val (bx, by) = (unspread(z), unspread(z >> 1))
      math.abs(bx - ax) + math.abs(by - ay) > 1
    }
    assert(zJumps > 0)
  }

  test("expression: Column path agrees with the JVM twin") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (65535L, 65535L), (123L, 45678L),
      (40000L, 3L), (32768L, 32767L))
    val got = rows.toDF("a", "b")
      .select(HilbertCurve.hilbert_key(col("a"), col("b"))).collect()
      .map(_.getLong(0))
    assert(got.toSeq == rows.map { case (a, b) => HilbertCurve.xy2d(a, b) })
  }

  test("layout: tighter (or equal) rectangles than z-order; single-dim filters still skip") {
    val li = graft.queries.QueryUtil.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_returnflag", "l_extendedprice")
    val base = java.nio.file.Files
      .createTempDirectory("graft_hilbert_spec").toString
    try {
      val zs = ZOrderLayout.writeZOrdered(li, s"$base/z",
        "l_partkey", "l_suppkey", 8)
      val hs = ZOrderLayout.writeHilbertOrdered(li, s"$base/h",
        "l_partkey", "l_suppkey", 8)
      def area(s: Seq[ZOrderLayout.FileStats]): Long =
        s.map(f => (f.maxA - f.minA + 1) * (f.maxB - f.minB + 1)).sum
      // Hilbert's locality must not LOSE to z on the same corpus (small
      // slack: 8 files on a tiny fixture is a coarse rasterization)
      assert(area(hs) <= (area(zs) * 11) / 10,
        s"hilbert ${area(hs)} vs z ${area(zs)}")
      // both single-dimension filters prune files on the hilbert layout
      val all = hs.map(_.path)
      val partOnly = ZOrderLayout.selectFiles(hs,
        Some(10L), Some(30L), None, None)
      val suppOnly = ZOrderLayout.selectFiles(hs,
        None, None, Some(1L), Some(2L))
      assert(partOnly.size < all.size, "part filter skipped nothing")
      assert(suppOnly.size < all.size, "supp filter skipped nothing")
      // skipping is conservative: surviving files contain every match
      val want = li.filter(col("l_partkey").between(10, 30)).count()
      val got = spark.read.parquet(partOnly: _*)
        .filter(col("l_partkey").between(10, 30)).count()
      assert(got == want)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("q328 == q74: the layout never changes results") {
    val h = graft.SparkEntry.queries("q328_hilbert_scan")(spark, sfDir)
      .collect().map(_.toSeq)
    val z = graft.SparkEntry.queries("q74_zorder_skipping")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(h.toSeq == z.toSeq)
  }
}

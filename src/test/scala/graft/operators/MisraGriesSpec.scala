package graft.operators

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {

  // 3 heavy keys (1200/900/600 of N=3000) over a 300-key tail
  private def fixture(): Seq[String] =
    Seq.fill(1200)("hot1") ++ Seq.fill(900)("hot2") ++ Seq.fill(600)("hot3") ++
      (0 until 300).map(i => s"tail$i")

  test("candidates contain every key above N/k under any partitioning") {
    import spark.implicits._
    val data = fixture()
    val n = data.length
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(4, 16); parts <- Seq(1, 4, 13)) {
      val df = data.toDF("hkey").repartition(parts)
      val cands = MisraGries.candidates(df, "hkey", k)
      assert(cands.size <= k, s"k=$k parts=$parts")
      val heavy = exact.filter(_._2 > n / k).keySet
      assert(heavy.subsetOf(cands.keySet),
        s"k=$k parts=$parts missing ${heavy -- cands.keySet}")
      // count error band: exact - N/k <= mg <= exact
      cands.foreach { case (key, mg) =>
        val ex = exact(key)
        assert(mg <= ex && mg >= ex - n / k, s"$key mg=$mg exact=$ex")
      }
    }
  }

  test("degenerate cases: fewer keys than k; single partition of one key") {
    import spark.implicits._
    val small = Seq("a", "b", "a").toDF("hkey")
    // under capacity the summary is exact
    assert(MisraGries.candidates(small, "hkey", 8) == Map("a" -> 2L, "b" -> 1L))
    val one = Seq.fill(50)("x").toDF("hkey").repartition(3)
    assert(MisraGries.candidates(one, "hkey", 2) == Map("x" -> 50L))
  }
}

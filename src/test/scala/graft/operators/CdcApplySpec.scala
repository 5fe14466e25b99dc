package graft.operators

import graft.SparkSpec

class CdcApplySpec extends SparkSpec {

  private def base = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "price")
  }

  private def cl(rows: Seq[(Long, Int, String, String, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "seq", "op", "name", "price")
  }

  private def snap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("insert, update, delete, and untouched rows all land correctly") {
    val changelog = cl(Seq(
      (1L, 1, "D", "a", 10.0),        // delete 1
      (2L, 1, "U", "b2", 25.0),       // update 2
      (9L, 1, "I", "new", 99.0)))     // insert 9
    val got = snap(CdcApply(base, changelog, "k", "seq", "op").collect())
    assert(got == Set((2L, "b2", 25.0), (3L, "c", 30.0), (9L, "new", 99.0)))
  }

  test("latest sequence number wins per key") {
    val changelog = cl(Seq(
      (2L, 1, "U", "first", 1.0),
      (2L, 3, "U", "third", 3.0),
      (2L, 2, "U", "second", 2.0),
      (3L, 2, "D", "c", 0.0),
      (3L, 1, "U", "resurrected?", 7.0)))  // older than the delete
    val got = snap(CdcApply(base, changelog, "k", "seq", "op").collect())
    assert(got == Set((1L, "a", 10.0), (2L, "third", 3.0)))
  }

  test("delete of a missing key is a no-op; upsert-as-I on an existing key updates") {
    val changelog = cl(Seq(
      (42L, 1, "D", "x", 0.0),
      (1L, 1, "I", "a-upserted", 11.0)))
    val got = snap(CdcApply(base, changelog, "k", "seq", "op").collect())
    assert(got == Set((1L, "a-upserted", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("changelog missing a payload column is rejected") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, 1, "U", "a")).toDF("k", "seq", "op", "name") // no price
    intercept[IllegalArgumentException] {
      CdcApply(base, bad, "k", "seq", "op")
    }
  }
}

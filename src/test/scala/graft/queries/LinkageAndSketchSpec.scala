package graft.queries

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.{SparkEntry, SparkSpec}
import graft.sources.IndexStore

/** Structural properties of q190 (Fellegi-Sunter linkage) and q189
  * (HLL sketch store) the hash gate implies but doesn't state. */
class LinkageAndSketchSpec extends SparkSpec {

  test("q190: every customer links as a true pair in exactly one band; counts conserve") {
    val out = SparkEntry.queries("q190_record_linkage")(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("decision")).toSet ==
      Set("match", "non_match", "possible"), "all three bands must be live")
    // the block key survives every perturbation, so each customer's
    // true (a, b) pair is a candidate and lands in exactly one band
    val nCust = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(out.map(_.getAs[Long]("n_true")).sum == nCust)
    out.foreach { r =>
      assert(r.getAs[Long]("n_true") + r.getAs[Long]("n_false") ==
        r.getAs[Long]("n_pairs"), r.toString)
    }
    // the collided-typo false-positive regime is real on this fixture
    val m = out.find(_.getAs[String]("decision") == "match").get
    assert(m.getAs[Long]("n_true") > 0 && m.getAs[Long]("n_false") > 0,
      "match band should carry both true links and collided typos")
  }

  test("q189: stored-sketch merge equals direct; store rebuilds on fingerprint change") {
    val out = SparkEntry.queries("q189_sketch_store")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("merged_eq_direct"), r.toString)
      assert(r.getAs[Boolean]("err_ok"), r.toString)
    }
    // lifecycle: content-fingerprint change mints a new store and
    // deletes the superseded generation (the IndexStore contract)
    val d = Files.createTempDirectory("graft_sketch_").toFile
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(d.getPath, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val p1 = ScaleQueries.ensureSketchStore(spark, d.getPath)
    assert(IndexStore.hasSuccess(new File(p1)))
    val ev = new File(d, "events.parquet")
    assert(ev.setLastModified(ev.lastModified() + 5000))
    val p2 = ScaleQueries.ensureSketchStore(spark, d.getPath)
    assert(p2 != p1, "fingerprint change did not mint a new sketch store")
    assert(!new File(p1).exists(), "superseded sketch store not deleted")
  }
}

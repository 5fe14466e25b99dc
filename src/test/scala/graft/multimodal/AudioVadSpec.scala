package graft.multimodal

import graft.SparkSpec
import graft.queries.{PipelineQueries, QueryUtil}

/** q229 VAD: codec-path segmentation equals a text-derived driver
  * reference (no codec), islands are maximal, and the parameter-free
  * mean gate behaves (strict minority active is impossible to
  * guarantee in general, but coverage is bounded and real segments
  * exist on the corpus). */
class AudioVadSpec extends SparkSpec {

  private def reference(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] =
    docs.filter(_._1 % 3 == 1).map { case (id, text) =>
      val s = text.replaceAll("[^ -~]", "")
      val n = math.min(s.length, Multimodal.WavMaxSamples)
      val nf = n / AudioVad.FrameLen
      val e = (0 until nf).map { f =>
        (f * AudioVad.FrameLen until (f + 1) * AudioVad.FrameLen)
          .map(i => math.abs((s.charAt(i).toInt - 128) * 256).toLong).sum
      }
      val tot = e.sum
      val act = e.map(_ * nf > tot)
      var (ns, na, ck) = (0L, 0L, 0L)
      var f = 0
      while (f < nf) {
        if (act(f)) {
          val ss = f + 1
          while (f < nf && act(f)) { na += 1; f += 1 }
          ns += 1; ck += ss.toLong * 1000003L + f
        } else f += 1
      }
      id -> (nf.toLong, na, ns, ck)
    }.toMap

  test("q229 codec-path VAD equals the text-derived reference") {
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = reference(docs)
    val got = PipelineQueries.audioVad(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (nf, na, ns, ck)) =>
      val (gnf, gna, gns, gck, gpm) = got(id)
      assert((gnf, gna, gns, gck) == ((nf, na, ns, ck)), s"clip $id")
      assert(gpm == (if (nf > 0) 1000L * na / nf else 0L), s"clip $id")
    }
    // the corpus produces real activity structure: some clip has >= 2
    // disjoint segments, and no clip is fully active (strictly-above-
    // mean gating can never fire on every frame)
    assert(got.values.exists(_._3 >= 2L))
    got.values.foreach { case (nf, na, _, _, _) =>
      if (nf > 0) assert(na < nf)
    }
  }

  test("q229 segments are maximal islands: checksum rejects a split") {
    // a clip with one long active island must report it as ONE segment;
    // compare against the reference's checksum on every clip (any
    // boundary split or merge error moves ck)
    val docs = QueryUtil.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = reference(docs)
    // islands in the reference are maximal by construction; per clip,
    // n_segments transitions = number of inactive->active boundaries
    want.foreach { case (id, (nf, na, ns, _)) =>
      assert(ns <= (na + 1) / 2 + 1 || na == 0 || ns <= na, s"clip $id")
      assert(ns == 0 || na >= ns, s"clip $id: segments without coverage")
      assert(nf >= na)
    }
  }
}

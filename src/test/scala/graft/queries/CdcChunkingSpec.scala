package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q164: content-defined chunking — census correctness plus the
  * INSERTION-LOCALITY property the technique exists for. */
class CdcChunkingSpec extends SparkSpec {

  private def chunksOf(words: Seq[String]): Seq[Seq[String]] = {
    import graft.queries.PipelineQueries.CdcBoundaryMod
    val out = Seq.newBuilder[Seq[String]]
    var cur = Vector(words.head)
    words.sliding(2).foreach {
      case Seq(a, b) =>
        if (graft.text.Hashing.h60Jvm(s"$a:$b") % CdcBoundaryMod == 0) {
          out += cur; cur = Vector.empty
        }
        cur :+= b
      case _ =>
    }
    out += cur
    out.result()
  }

  test("q164: census equals a driver-side replay of the chunking") {
    val r = PipelineQueries.cdcChunking(spark, sfDir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
    val texts = QueryUtil.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val census = scala.collection.mutable.HashMap.empty[String, (Long, Long, Long)]
    var (nChunks, words) = (0L, 0L)
    texts.foreach { t =>
      chunksOf(t.trim.toLowerCase.split("\\s+").toSeq).foreach { c =>
        nChunks += 1; words += c.length
        val text = c.mkString(" ")
        val (cnt, b, w) = census.getOrElse(text, (0L, text.length.toLong,
          c.length.toLong))
        census(text) = (cnt + 1, b, w)
      }
    }
    val dup = census.values.map(_._1 - 1).sum
    val totB = census.values.map(v => v._1 * v._2).sum
    val dupB = census.values.map(v => (v._1 - 1) * v._2).sum
    assert(got == (nChunks, census.size.toLong, dup, totB, dupB,
      (1000 * dupB) / totB, (1000 * words) / nChunks))
    // the fixture's planted near-dups make savings real
    assert(dup > 0 && got._6 > 0)
  }

  test("q164: an insertion disturbs only its own chunk (locality)") {
    // a 200-word doc vs the same doc with one word inserted mid-way:
    // all chunks outside the edited one must keep their digests —
    // the property fixed-size chunking provably lacks
    // all-distinct words: chunk texts are unique, so the shared-set size
    // is a faithful count of surviving chunks
    val words = (0 until 200).map(i => s"w$i")
    val edited = (words.take(100) :+ "inserted") ++ words.drop(100)
    val a = chunksOf(words).map(_.mkString(" "))
    val b = chunksOf(edited).map(_.mkString(" "))
    val shared = a.toSet.intersect(b.toSet)
    // all but the edited chunk (and possibly its immediate neighbor,
    // if the insertion created/removed a boundary) survive
    assert(shared.size >= a.size - 2,
      s"only ${shared.size}/${a.size} chunks survived a 1-word insertion")
    assert(a.size > 5, "fixture degenerate: everything in one chunk")
  }
}

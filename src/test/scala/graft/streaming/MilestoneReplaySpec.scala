package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.ScaleQueries

/** The property the round-10 driver run falsified: q281's milestone
  * crossings must be IDENTICAL however the replay batches — one
  * micro-batch, or the same events split across 2 and 3 micro-batches
  * in shuffled (event-time-violating) file order. The old processor
  * folded eagerly per batch and relied on time-ordered arrival across
  * batches; the rewritten one buffers and folds only watermark-sealed
  * prefixes, so batch boundaries cannot change a crossing's row. */
class MilestoneReplaySpec extends SparkSpec {

  /** Child session with the RocksDB state-store provider
    * `transformWithState` requires (mirrors ScaleQueries.twsSession). */
  private lazy val tws = {
    val c = spark.newSession()
    c.conf.set("spark.sql.shuffle.partitions", "4")
    c.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    c
  }

  private case class Purchase(user: Long, tsUs: Long, eventId: Long,
      cents: Long)

  /** All sf0.001 purchases plus the far-future sentinel, as rows. */
  private lazy val (purchases, sentinelTsUs) = {
    val ev = graft.queries.QueryUtil.eventsTsUs(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => Purchase(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    (ev, ev.map(_.tsUs).max + ScaleQueries.MilestoneFlushUs)
  }

  /** Batch oracle: per-user event-time cumulative sum, first crossing
    * of each threshold. */
  private lazy val expected: Seq[(Long, Long, Long, Long, Long)] =
    oracleOf(purchases)

  private def oracleOf(evs: Seq[Purchase])
      : Seq[(Long, Long, Long, Long, Long)] =
    evs.groupBy(_.user).toSeq.flatMap { case (u, rows) =>
      var c = 0L
      rows.sortBy(r => (r.tsUs, r.eventId)).flatMap { r =>
        val nc = c + r.cents
        val hits = ScaleQueries.MilestoneThresholds.collect {
          case t if c < t && nc >= t => (u, t, r.tsUs, r.eventId, nc)
        }
        c = nc
        hits
      }
    }.sortBy(h => (h._1, h._2))

  /** Stage `purchases` as `nChunks` parquet files in a deterministic
    * SHUFFLED order (hash of event_id — violates event time), one file
    * per chunk with strictly increasing modification times so the file
    * stream replays chunk 0, chunk 1, … as separate micro-batches; the
    * sentinel rides the LAST file (a watermark only ever advances with
    * the data that has actually arrived). */
  private def stage(nChunks: Int): String = {
    val shuffled = purchases.sortBy(p =>
      scala.util.hashing.MurmurHash3.stringHash(s"${p.eventId}"))
    val chunkSize = math.max(1, (shuffled.size + nChunks - 1) / nChunks)
    stageChunks(shuffled.grouped(chunkSize).toSeq, sentinelTsUs)
  }

  /** Stage explicit chunk contents (one parquet file per chunk, strictly
    * increasing mtimes so the file stream replays them as separate
    * micro-batches); the sentinel rides the LAST file. */
  private def stageChunks(chunks: Seq[Seq[Purchase]],
      sentinelTs: Long): String = {
    val dir = Files.createTempDirectory("graft_milestone_replay_")
      .toString
    val s = spark
    import s.implicits._
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val rows = chunk.map(p =>
        (p.eventId, p.tsUs, p.user, "purchase", p.cents / 100.0)) ++
        (if (i == chunks.size - 1)
           Seq((-1L, sentinelTs, -1L, "purchase", 0.0))
         else Nil)
      val tmp = Files.createTempDirectory("graft_milestone_chunk_")
        .toString
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(dir, f"chunk$i%03d.parquet")
      Files.move(part.toPath, dest)
      dest.toFile.setLastModified(1700000000000L + i * 60000L)
      rmTree(new java.io.File(tmp))
    }
    dir
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(); ()
  }

  private def run(dir: String, maxFilesPerTrigger: Int)
      : Seq[(Long, Long, Long, Long, Long)] =
    try ScaleQueries.streamMilestonesFrom(tws, dir, maxFilesPerTrigger)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sortBy(h => (h._1, h._2))
    finally rmTree(new java.io.File(dir))

  test("single-batch replay matches the batch cumulative-sum oracle") {
    val got = run(stage(1), 0)
    assert(got == expected)
  }

  test("2-batch shuffled replay emits identical crossings") {
    val got = run(stage(2), 1)
    assert(got == expected)
  }

  test("3-batch shuffled replay emits identical crossings") {
    val got = run(stage(3), 1)
    assert(got == expected)
  }

  /** The `<` vs `<=` boundary the round-11 advice asked to pin: an
    * event whose ts_ms EQUALS the current watermark. Batch 1 carries an
    * event at t0+45d, so after it the watermark is exactly t0 (45-day
    * delay); batch 2 then delivers an event AT t0 — equal to the
    * watermark. Spark must not late-drop it (late is strictly below the
    * watermark) and the processor must not seal it early (`ts_ms <
    * watermark` is strict — equality does not prove completeness); it
    * folds once the sentinel advances the final watermark past it. If
    * either side used the other comparison, the t0 event's 250.00 would
    * vanish from (or double inside) the cumulative and the 30000/80000
    * crossings would move rows. */
  test("event exactly at the watermark is neither dropped nor double-folded") {
    val t0Us = 1700000000L * 1000000L
    val dayUs = 86400000000L
    // u=7: e1 at t0 (25000 c), e2 at t0+45d (10000 c) -> cum 25000,
    // 35000: one crossing of 30000 AT e2. Lose e1 and nothing crosses;
    // fold e1 twice and the crossing moves to e1.
    val e1 = Purchase(7L, t0Us, 101L, 25000L)
    val e2 = Purchase(7L, t0Us + 45L * dayUs, 102L, 10000L)
    val dir = stageChunks(Seq(Seq(e2), Seq(e1), Seq.empty),
      t0Us + 45L * dayUs + ScaleQueries.MilestoneFlushUs)
    val got = run(dir, 1)
    assert(got == oracleOf(Seq(e1, e2)))
    assert(got == Seq((7L, 30000L, e2.tsUs, 102L, 35000L)))
  }
}

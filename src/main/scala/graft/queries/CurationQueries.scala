package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{CdcApply, PrefixSum}
import graft.text.TextStats
import QueryUtil._

/** Corpus-curation operators: training-sequence packing (the
  * concat-then-chunk layout every autoregressive pretraining run
  * uses), outlier winsorization, and CDC changelog application — the
  * last mile between a cleaned corpus and the training job.
  */
object CurationQueries {

  // ---- q94: training sequence packing (concat + chunk) ---------------

  val PackBudget = 256L   // tokens per training sequence
  val PackBucket = 64L    // docs per prefix-sum bucket

  /** Pack the document stream into fixed-[[PackBudget]]-token training
    * sequences by concatenation: each doc's global token offset is an
    * exact distributed prefix sum over doc_id order
    * ([[graft.operators.PrefixSum]] — two-phase scan, NEVER the
    * single-partition global window), and its chunk span follows by
    * integer division. This is the GPT-style pack-and-chunk layout:
    * documents may straddle sequence boundaries; `start_chunk ==
    * end_chunk` means the doc fits inside one training row.
    *
    * Driver state = one long per [[PackBucket]]-doc bucket; at 100 TB
    * the divisor scales up so bucket count stays ~10⁶. */
  def sequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), TextStats.nTokens(col("text")).cast("long").as("n_tok"))
    PrefixSum.withPrefixSum(docs, "doc_id", "n_tok",
        expr(s"doc_id div $PackBucket"), cumCol = "cum", preCol = "start_pos")
      .select(col("doc_id"), col("n_tok"), col("start_pos"),
        expr(s"start_pos div $PackBudget").as("start_chunk"),
        expr(s"(start_pos + greatest(n_tok, 1) - 1) div $PackBudget").as("end_chunk"))
      .orderBy("doc_id")
  }

  val sequencePackingSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextStats.nTokensSql("text")}::BIGINT AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tok,
       |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
       |      AS start_pos
       |  FROM t)
       |SELECT doc_id, n_tok, start_pos,
       |  start_pos // $PackBudget AS start_chunk,
       |  (start_pos + greatest(n_tok, 1) - 1) // $PackBudget AS end_chunk
       |FROM c ORDER BY doc_id""".stripMargin

  // ---- q95: winsorization (percentile clipping) ----------------------

  val WinsorLo = 0.01
  val WinsorHi = 0.99

  /** Winsorize `lineitem.l_extendedprice` at the exact
    * [p01, p99] ([[graft.operators.ExactQuantile]], boundaries rounded
    * to 6 decimals on both engines — the q78 convention), reporting
    * clip counts and the cent-exact mean before/after. The clip is a
    * codegen `least(greatest(...))` over boundary literals — one scan
    * for the report once the boundaries are known. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val Seq(lo, hi) = graft.operators.ExactQuantile
      .quantiles(li, "l_extendedprice", Seq(WinsorLo, WinsorHi))
      .map(q => BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val x = col("l_extendedprice")
    val clipped = least(greatest(x, lit(lo)), lit(hi))
    li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(x < lo, 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when(x > hi, 1L).otherwise(0L)).as("n_clipped_high"),
        lit(lo).as("p01"), lit(hi).as("p99"),
        r6(moneySum(x) / count(lit(1))).as("mean_before"),
        r6(moneySum(clipped) / count(lit(1))).as("mean_after"))
  }

  val winsorizeSql: String =
    s"""WITH q AS (
       |  SELECT round(quantile_cont(l_extendedprice, $WinsorLo), 6) AS lo,
       |    round(quantile_cont(l_extendedprice, $WinsorHi), 6) AS hi
       |  FROM lineitem)
       |SELECT count(*)::BIGINT AS n_rows,
       |  sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)::BIGINT
       |    AS n_clipped_low,
       |  sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)::BIGINT
       |    AS n_clipped_high,
       |  lo AS p01, hi AS p99,
       |  round(${moneySumSql("l_extendedprice")} / count(*), 6) AS mean_before,
       |  round(${moneySumSql("least(greatest(l_extendedprice, lo), hi)")}
       |    / count(*), 6) AS mean_after
       |FROM lineitem CROSS JOIN q
       |GROUP BY lo, hi""".stripMargin

  // ---- q96: CDC changelog application (MERGE) ------------------------

  val CdcDelMod = 11
  val CdcUpdMod = 7
  val CdcUpd2Mod = 21
  val CdcInsMod = 17
  val CdcInsOffset = 100000000L

  /** Apply a deterministic synthetic changelog to the `orders`
    * snapshot via [[graft.operators.CdcApply]]: deletes (`%11` keys),
    * two versions of updates for the `%21` keys (seq 2 must beat
    * seq 1 — the latest-wins contract under test), plain updates for
    * the remaining `%7` keys, and inserts under shifted keys (`%17`).
    * Gate = per-status rollup of the resulting snapshot: a missed
    * delete, a stale version, or a dropped insert all shift the
    * counts/sums. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"))
    val k = col("o_orderkey")
    def part(filter: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column,
        seq: Int, op: String, price: org.apache.spark.sql.Column): DataFrame =
      base.filter(filter).select(key.as("o_orderkey"), lit(seq).as("seq"),
        lit(op).as("op"), col("o_orderstatus"), col("o_orderpriority"),
        price.as("o_totalprice"))
    val p = col("o_totalprice")
    val changelog =
      part(k % CdcDelMod === 0, k, 1, "D", p)
        .unionByName(part(k % CdcUpdMod === 0 && k % CdcDelMod =!= 0, k, 1, "U", p + 10d))
        .unionByName(part(k % CdcUpd2Mod === 0 && k % CdcDelMod =!= 0, k, 2, "U", p + 20d))
        .unionByName(part(k % CdcInsMod === 0, k + CdcInsOffset, 1, "I", p + 5d))
    CdcApply(base, changelog, "o_orderkey", "seq", "op")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val cdcApplySql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey AS k, o_orderstatus AS st, o_orderpriority AS pr,
       |    o_totalprice AS p
       |  FROM orders),
       |cl AS (
       |  SELECT k, 1 AS seq, 'D' AS op, st, pr, p FROM base WHERE k % $CdcDelMod = 0
       |  UNION ALL SELECT k, 1, 'U', st, pr, p + 10.0 FROM base
       |    WHERE k % $CdcUpdMod = 0 AND k % $CdcDelMod <> 0
       |  UNION ALL SELECT k, 2, 'U', st, pr, p + 20.0 FROM base
       |    WHERE k % $CdcUpd2Mod = 0 AND k % $CdcDelMod <> 0
       |  UNION ALL SELECT k + $CdcInsOffset, 1, 'I', st, pr, p + 5.0 FROM base
       |    WHERE k % $CdcInsMod = 0),
       |w AS (
       |  SELECT k, arg_max(op, seq) AS op, arg_max(st, seq) AS st,
       |    arg_max(p, seq) AS p
       |  FROM cl GROUP BY k),
       |snap AS (
       |  SELECT CASE WHEN w.k IS NOT NULL THEN w.st ELSE b.st END AS st,
       |    CASE WHEN w.k IS NOT NULL THEN w.p ELSE b.p END AS p
       |  FROM base b FULL OUTER JOIN w ON b.k = w.k
       |  WHERE w.op IS NULL OR w.op <> 'D')
       |SELECT st AS o_orderstatus, count(*)::BIGINT AS n_rows,
       |  ${moneySumSql("p")} AS sum_price
       |FROM snap GROUP BY 1 ORDER BY 1""".stripMargin
}

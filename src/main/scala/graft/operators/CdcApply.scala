package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog application (MERGE INTO / upsert): fold a batch of
  * keyed change records — insert / update / delete, each with a
  * sequence number — into a base snapshot, latest sequence winning
  * per key.
  *
  * Scale shape: the changelog first collapses to one winner per key
  * with `max(struct(seq, op, payload…))` — an ordinary aggregate, so
  * map-side partial folding absorbs hot keys before the shuffle
  * (a `row_number` window would shuffle every version). The fold then
  * costs ONE full-outer join on the key, which co-partitions with the
  * winner aggregate's exchange. Payload width rides the join — at
  * 100 TB pair this with digest-first diffing ([[SnapshotDiff]]) when
  * only membership is needed.
  */
object CdcApply {

  /** Apply `changelog(keyCol, seqCol, opCol, payloadCols…)` to
    * `base(keyCol, payloadCols…)`. Ops: 'I'/'U' upsert the payload,
    * 'D' deletes the key. Sequence numbers must be unique per key
    * (they order the key's versions; max wins). Returns the new
    * snapshot with `base`'s columns. */
  def apply(
      base: DataFrame, changelog: DataFrame,
      keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val payloadCols = base.columns.filter(_ != keyCol).toSeq
    require(payloadCols.forall(changelog.columns.contains),
      s"changelog is missing payload columns: ${payloadCols.mkString(",")}")
    val winner = changelog.groupBy(col(keyCol))
      .agg(max(struct((seqCol +: opCol +: payloadCols).map(col): _*)).as("__w"))
      .select(col(keyCol) +: col(s"__w.$opCol").as("__op") +:
        payloadCols.map(c => col(s"__w.$c").as(s"__new_$c")): _*)
    base.join(winner, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(keyCol) +: payloadCols.map(c =>
        when(col("__op").isNotNull, col(s"__new_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}

package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (the SemDeDup shape, Abbas et al. 2023):
  * prune documents whose EMBEDDINGS are near-duplicates, keeping one
  * representative per semantic duplicate set. Catches paraphrases and
  * templated re-writes that lexical dedup (MinHash/SimHash on text)
  * cannot see.
  *
  * Pipeline: blocked candidate generation (IVF cells, the q40
  * machinery — within-cluster pairs only, never O(n²)) → exact cosine
  * verification ≥ τ → keep policy. The keep policy here is the
  * deterministic one: a vector is DROPPED iff some lower-id vector is
  * its verified near-duplicate (keep-first by id, the same convention
  * as the lexical dedup family q09/q10/q80). Non-transitive by
  * design — each drop is witnessed by a surviving-or-dropped earlier
  * vector, so the decision is a pure function of the verified pair
  * set and needs no iterative clustering.
  *
  * Scale: everything downstream of candidate generation is sized by
  * collisions, not corpus: the verified pair set groupBys on `doc_b`
  * (map-side partial collapses each dropped id to one row) and
  * LEFT-joins back to the corpus ids — one narrow shuffle of the id
  * column. At 100 TB the corpus embedding payload never moves; only
  * ids and the (small) drop set do.
  */
object SemDedup {

  /** Per-vector verdict `(id, n_dups, kept)` from a verified near-dup
    * pair table `(doc_a, doc_b, cos)` with `doc_a < doc_b`:
    * `n_dups` = number of lower-id near-duplicates, `kept` =
    * (n_dups == 0). `ids` is the corpus id column to report over. */
  def verdicts(ids: DataFrame, idCol: String, verifiedPairs: DataFrame): DataFrame = {
    val dups = verifiedPairs.groupBy(col("doc_b").as(idCol))
      .agg(count(lit(1)).as("n_dups"))
    ids.select(col(idCol))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("n_dups"), lit(0L)) === 0L).as("kept"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-bigram language model with add-one smoothing, used as a
  * quality / domain filter over a document corpus — the CCNet
  * construction (Wenzek et al. 2020): train a small LM on an in-domain
  * reference slice, score every document by negative log-likelihood per
  * token, keep the low-perplexity tail.
  *
  * Scale shape (100 TB): the model is built from a reference SAMPLE and
  * is vocabulary-bounded (≤ |V|² bigram rows, in practice far sparser),
  * so it broadcasts; scoring is tokenize → bigram explode → two
  * broadcast hash joins → per-doc aggregation, and the only shuffle is
  * the narrow (doc_id, partial-sum) combine with map-side partials.
  * Corpus text never reshuffles. For an open-vocabulary corpus where
  * the model outgrows a broadcast, the same plan runs as shuffle hash
  * joins keyed on (w1, w2) / (w1) — still narrow columns only.
  *
  * Exactness contract: per-bigram NLL terms are quantized to integer
  * MICRONATS — `round(1e6 · (ln(c1 + V) − ln(c2 + 1)))` of INTEGER
  * inputs — and then summed as longs, so per-doc scores are
  * order-independent and engine-exact. The quantization is safe because
  * only the distinct (c1, c2) count pairs matter: at every shipped SF
  * the nearest term to a rounding boundary is ≥ 1e-4 away, vs ~1e-10 of
  * possible ulp drift between `java.lang.Math.log` and a C `log`.
  */
object NgramLM {

  /** The trained model: bigram counts `(w1, w2, c2)`, left-context
    * counts `(w1, c1)` (the row-sum of `c2`), and the reference
    * vocabulary size `V` for add-one smoothing. */
  final case class BigramModel(c2: DataFrame, c1: DataFrame, vocab: Long)

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** `(id, w1, w2)` — one row per adjacent token pair. The transform
    * stays inside codegen (no UDF); docs with fewer than two tokens are
    * filtered BEFORE the `sequence` call (Spark's `sequence(1, 0)`
    * counts DOWN, which would fabricate a reversed pair). */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("a"))
      .filter(size(col("a")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(a) - 1)," +
          " i -> struct(element_at(a, i) AS w1, element_at(a, i + 1) AS w2))"))
        .as("b"))
      .select(col(idCol), col("b.w1"), col("b.w2"))

  /** Train on a reference corpus: two vocabulary-bounded aggregates
    * plus one scalar vocabulary-count job (model-build time, not query
    * time). */
  def train(refDocs: DataFrame, idCol: String, textCol: String): BigramModel = {
    val bg = bigrams(refDocs, idCol, textCol)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = bg.select(col("w1").as("w"))
      .union(bg.select(col("w2").as("w"))).distinct().count()
    BigramModel(c2, c1, vocab)
  }

  /** Score every document: `(id, n_bigrams, nll_micronats)` — exact
    * integer NLL under the model. Unseen bigrams smooth to `c2 = 0`,
    * unseen left contexts to `c1 = 0` (probability `1 / V`). Documents
    * with fewer than two tokens produce no row (callers left-join). */
  def scoreMicronats(docs: DataFrame, model: BigramModel,
      idCol: String, textCol: String): DataFrame = {
    val term = round(lit(1e6) *
      (log(coalesce(col("c1"), lit(0L)) + lit(model.vocab.toDouble)) -
        log(coalesce(col("c2"), lit(0L)) + lit(1.0d)))).cast("long")
    bigrams(docs, idCol, textCol)
      .join(broadcast(model.c2), Seq("w1", "w2"), "left")
      .join(broadcast(model.c1), Seq("w1"), "left")
      .select(col(idCol), term.as("t"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("t")).as("nll_micronats"))
  }
}

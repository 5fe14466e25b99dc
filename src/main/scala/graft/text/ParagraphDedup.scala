package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level exact dedup — the boilerplate-removal
  * step of the C4 / CCNet lineage (C4 dropped repeated three-sentence
  * spans; CCNet dedups paragraphs by hash across shards): every
  * paragraph that occurs more than once in the corpus is kept ONLY at
  * its first occurrence (minimal `(docOrder, position)`), and each
  * document is reassembled from its surviving paragraphs in original
  * order.
  *
  * 100 TB design — deliberately NOT a window function: a
  * `row_number() over (partition by paragraph)` puts every copy of a
  * viral paragraph (site footers occur in 10⁸⁺ documents) into ONE
  * shuffle partition. Instead:
  *
  *  1. winners: `groupBy(paragraph).agg(min(struct(doc, idx)))` —
  *     partial (map-side) aggregation collapses each hot paragraph to
  *     one candidate row PER INPUT PARTITION before the shuffle, so
  *     the reducer sees at most `numPartitions` rows per paragraph,
  *     never the raw copy count;
  *  2. keep: LEFT SEMI equi-join of the exploded paragraphs against
  *     the winners on the FULL `(paragraph, doc, idx)` key — the key
  *     is unique per row, so no hot key exists no matter how skewed
  *     the paragraph distribution is;
  *  3. per-doc totals come from a separate pre-join aggregate and meet
  *     the kept-side aggregate in a doc-keyed join (uniform key).
  *
  * Reassembly state per group is bounded by the document itself
  * (`sort_array(collect_list(struct(idx, para)))`), the same bound the
  * document already occupied at rest.
  */
object ParagraphDedup {

  /** Per-document dedup summary over `df`:
    * `(id, n_paras, n_kept, clean_text)` where `clean_text` is the
    * document rebuilt from its surviving paragraphs (original order,
    * `sep`-joined; empty string when every paragraph lost its race). */
  def keepFirst(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n"): DataFrame = {
    val paras = df
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__idx", "__para")))
    val winners = paras
      .groupBy("__para")
      .agg(min(struct(col("__doc"), col("__idx"))).as("__w"))
      .select(col("__para").as("__wp"),
        col("__w.__doc").as("__wd"), col("__w.__idx").as("__wi"))
    val kept = paras.join(winners,
        col("__para") === col("__wp") &&
          col("__doc") === col("__wd") && col("__idx") === col("__wi"),
        "left_semi")
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("__idx"), col("__para")))),
            x => x("__para")),
          sep).as("clean_text"))
    val totals = paras.groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_paras"))
    totals.join(kept, Seq("__doc"), "left")
      .select(col("__doc").as(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document text analysis for training-data pipelines: token
  * counting, quality scoring, heuristic language ID, and rolling-hash
  * fingerprinting. All pure column expressions (whole-stage codegen,
  * no UDFs), each with a DuckDB-SQL mirror generated from the same
  * constants.
  */
object TextStats {

  // ---- token counting -------------------------------------------------

  /** Whitespace token count. */
  def nTokens(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+"))).cast("long")

  def nTokensSql(e: String): String =
    s"(CASE WHEN length(trim($e)) = 0 THEN 0 ELSE len(string_split_regex(trim($e), '\\s+')) END)::BIGINT"

  /** BPE-ish subword count: word-pieces + digit runs + punctuation each
    * count as one token (a cheap deterministic proxy for a real BPE
    * vocab — the regex segments like common tokenizer pre-splits). */
  val bpeRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def nSubwordTokens(text: Column): Column =
    regexp_count(text, lit(bpeRegex)).cast("long")

  def nSubwordTokensSql(e: String): String =
    s"len(regexp_extract_all($e, '$bpeRegex'))::BIGINT"

  // ---- quality scoring ------------------------------------------------

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that", "from")

  /** Fraction of alphanumeric characters. */
  def alnumRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z0-9]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0d))

  def alnumRatioSql(e: String): String =
    s"(length(regexp_replace($e, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / greatest(length($e)::DOUBLE, 1.0))"

  /** Fraction of punctuation characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0d))

  def punctRatioSql(e: String): String =
    s"""(length(regexp_replace($e, '[^.,;:!?''"()-]', '', 'g'))::DOUBLE / greatest(length($e)::DOUBLE, 1.0))"""

  /** Fraction of tokens that are (lowercased) English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    size(filter(toks, t => t.isInCollection(stopwords))).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0d))
  }

  def stopwordRatioSql(e: String): String = {
    val list = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"(len(list_filter(string_split_regex(lower(trim($e)), '\\s+'), t -> list_contains($list, t)))::DOUBLE" +
      s" / greatest(len(string_split_regex(lower(trim($e)), '\\s+'))::DOUBLE, 1.0))"
  }

  /** Mean whitespace-token length. Pure length arithmetic — the sum of
    * token lengths is the non-whitespace character count of the trimmed
    * text, so no per-token `aggregate()` lambda (higher-order functions
    * run interpreted; this is a per-row hot path at corpus scale). */
  def meanTokenLen(text: Column): Column = {
    val t = trim(text)
    length(regexp_replace(t, "\\s+", "")).cast("double") /
      greatest(size(split(t, "\\s+")).cast("double"), lit(1.0d))
  }

  def meanTokenLenSql(e: String): String =
    s"(list_sum(list_transform(string_split_regex(trim($e), '\\s+'), t -> length(t)))::DOUBLE" +
      s" / greatest(len(string_split_regex(trim($e), '\\s+'))::DOUBLE, 1.0))"

  /** Composite quality score in [0,1]: favors mid-length docs with
    * normal word lengths and some stopword mass (Gopher/C4-style
    * heuristics, deterministic arithmetic only). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(nTokens(text).cast("double") / lit(64.0d), lit(1.0d))
    val wordScore = when(meanTokenLen(text).between(3.0, 10.0), 1.0d).otherwise(0.5d)
    val stopScore = least(stopwordRatio(text) * lit(4.0d), lit(1.0d))
    round((lenScore * 0.4 + wordScore * 0.3 + stopScore * 0.3), 6)
  }

  def qualityScoreSql(e: String): String = {
    val lenScore = s"least(${nTokensSql(e)}::DOUBLE / 64.0, 1.0)"
    val wordScore = s"(CASE WHEN ${meanTokenLenSql(e)} BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)"
    val stopScore = s"least(${stopwordRatioSql(e)} * 4.0, 1.0)"
    s"round($lenScore * 0.4 + $wordScore * 0.3 + $stopScore * 0.3, 6)"
  }

  // ---- language ID (n-gram/stopword heuristic) -------------------------

  /** Tiny per-language marker dictionaries (top function words). The
    * classifier scores each language by marker hits over lowercased
    * tokens and takes the argmax (ties → alphabetical language order,
    * zero hits → 'und'). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que", "pas", "pour"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(lower(trim(text)), "\\s+")
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers))).cast("long")
    }
  }

  /** Argmax over per-language score columns: strictly-greater wins, so
    * ties resolve to the alphabetically-first language (seq is sorted);
    * all-zero → 'und'. Feed it SIMPLE column refs (not nested exprs):
    * the fold duplicates each score subtree O(2^langs) times otherwise. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val best = scores.tail.foldLeft(
      struct(lit(scores.head._1).as("lang"), scores.head._2.as("score"))) {
      case (acc, (lang, score)) =>
        when(score > acc.getField("score"),
          struct(lit(lang).as("lang"), score.as("score"))).otherwise(acc)
    }
    when(best.getField("score") === 0L, "und").otherwise(best.getField("lang"))
  }

  /** Predicted language code (single-expression form; fine per-row, but
    * prefer the explode+aggregate plan for whole-corpus scoring —
    * see [[graft.queries.PipelineQueries.langId]]). */
  def langId(text: Column): Column = langIdFromScores(langScores(text))

  /** Conditional-sum score aggregates over an exploded `tok` column —
    * the corpus-scale plan: one explode, one partial-agg shuffle. */
  def langMarkerSums(tok: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, markers) =>
      lang -> sum(when(tok.isInCollection(markers), 1L).otherwise(0L))
    }

  def langIdSql(e: String): String = {
    val toks = s"string_split_regex(lower(trim($e)), '\\s+')"
    val scoreExprs = langMarkers.map { case (lang, markers) =>
      val list = markers.map(m => s"'$m'").mkString("[", ", ", "]")
      lang -> s"len(list_filter($toks, t -> list_contains($list, t)))"
    }
    // same strictly-greater fold, rendered as nested CASE
    val folded = scoreExprs.tail.foldLeft(
      s"{'lang': '${scoreExprs.head._1}', 'score': ${scoreExprs.head._2}}") {
      case (acc, (lang, score)) =>
        s"(CASE WHEN $score > ($acc).score THEN {'lang': '$lang', 'score': $score} ELSE $acc END)"
    }
    s"(CASE WHEN ($folded).score = 0 THEN 'und' ELSE ($folded).lang END)"
  }

  // ---- document fingerprinting (rolling k-gram hash, mod-p sampling) --

  /** Winnowing-style fingerprint summary: hash every k-char gram
    * (md5-derived 31-bit), keep hashes ≡ 0 (mod modP) — a deterministic
    * content-defined sample, robust to edits outside sampled windows.
    * Output per doc: n_grams, n_fp (sampled count), fp_min, fp_xor. */
  def fingerprintAggs(k: Int = 8, modP: Int = 8): Seq[Column] = {
    val h = Hashing.x31(col("gram"))
    Seq(
      count(lit(1)).as("n_grams"),
      sum(when(h % modP === 0, 1L).otherwise(0L)).as("n_fp"),
      min(when(h % modP === 0, h)).as("fp_min"),
      coalesce(sum(when(h % modP === 0, h)), lit(0L)).as("fp_sum"))
  }

  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, modP: Int = 8): DataFrame = {
    val grams = graft.Partitioning.spread(docs, col(idCol)).select(col(idCol).as("id"),
      explode(Hashing.charNgrams(col(textCol), k)).as("gram"))
    val aggs = fingerprintAggs(k, modP)
    grams.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  def fingerprintsSql(table: String, idCol: String, textCol: String,
      k: Int = 8, modP: Int = 8): String = {
    val h = Hashing.x31Sql("gram")
    s"""SELECT $idCol AS id, count(*) AS n_grams,
       |  sum(CASE WHEN $h % $modP = 0 THEN 1 ELSE 0 END)::BIGINT AS n_fp,
       |  min(CASE WHEN $h % $modP = 0 THEN $h END) AS fp_min,
       |  coalesce(sum(CASE WHEN $h % $modP = 0 THEN $h END), 0)::BIGINT AS fp_sum
       |FROM (SELECT $idCol, unnest(${Hashing.charNgramsSql(textCol, k)}) AS gram FROM $table)
       |GROUP BY $idCol""".stripMargin
  }
}

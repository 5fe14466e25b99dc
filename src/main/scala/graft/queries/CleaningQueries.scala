package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{ParagraphDedup, PiiRedaction}
import QueryUtil._

/** Corpus-cleaning stage queries: PII scrubbing (q79) and
  * paragraph-level boilerplate dedup (q80).
  *
  * The synthetic `documents` text is clean word salad, so — exactly as
  * the media queries (q55/q66/q70/q72) synthesize real containers
  * in-pipeline — both queries first inject deterministic dirt derived
  * from `doc_id`, with the IDENTICAL construction in the oracle SQL.
  * The gate then checks the full clean→dirty→clean round trip, not
  * just "some regex ran".
  */
object CleaningQueries {

  // ---- q79: PII detect + redact ---------------------------------------

  /** One synthetic PII item per doc by `doc_id % 5`: email / phone /
    * host ip / national-id / none. Patterns are mutually exclusive by
    * construction (see [[graft.text.PiiRedaction]] scaladoc), so the
    * expected per-kind counts are exact. */
  private def dirtyPii(spark: SparkSession, dir: String): DataFrame = {
    val m = col("doc_id") % 5
    table(spark, dir, "documents").withColumn("dirty",
      when(m === 0, concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
      .when(m === 1, concat(col("text"),
        lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .when(m === 2, concat(col("text"),
        lit(" from host 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string")))
      .when(m === 3, concat(col("text"),
        lit(" id 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(col("text")))
  }

  /** Per-source PII scrub report: counts per kind (pre-redaction),
    * characters removed, and the residual self-check (matches of any
    * pattern AFTER redaction — must be 0 everywhere). Detection,
    * redaction, and the residual audit are all codegen regex work on
    * ONE scan of the corpus. */
  def piiRedaction(spark: SparkSession, dir: String): DataFrame = {
    val d = dirtyPii(spark, dir)
      .withColumn("clean", PiiRedaction.redact(col("dirty")))
    d.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(PiiRedaction.piiCount(col("dirty"), "email")).as("n_emails"),
        sum(PiiRedaction.piiCount(col("dirty"), "phone")).as("n_phones"),
        sum(PiiRedaction.piiCount(col("dirty"), "ip")).as("n_ips"),
        sum(PiiRedaction.piiCount(col("dirty"), "national_id")).as("n_ids"),
        sum(length(col("dirty")) - length(col("clean"))).as("chars_removed"),
        sum(PiiRedaction.residual(col("clean"))).as("n_residual"))
      .orderBy("source")
  }

  /** The injection, verbatim in DuckDB. (Single line per branch: this
    * fragment is embedded in a stripMargin string, where a
    * continuation line starting with `||` would lose a pipe.) */
  private val dirtyPiiSql: String =
    "CASE doc_id % 5" +
      " WHEN 0 THEN text || ' contact user' || doc_id::VARCHAR || '@example.com'" +
      " WHEN 1 THEN text || ' call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')" +
      " || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')" +
      " WHEN 2 THEN text || ' from host 10.' || (doc_id % 256)::VARCHAR" +
      " || '.0.' || (doc_id % 100)::VARCHAR" +
      " WHEN 3 THEN text || ' id 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')" +
      " ELSE text END"

  val piiRedactionSql: String = {
    val Seq(email, ip, natId, phone) = PiiRedaction.Patterns.map(_._2)
    def esc(p: String) = p.replace("'", "''")
    val clean = PiiRedaction.Patterns.foldLeft("dirty") {
      case (acc, (_, p, r)) => s"regexp_replace($acc, '${esc(p)}', '$r', 'g')"
    }
    s"""WITH d AS (
       |  SELECT source, $dirtyPiiSql AS dirty FROM documents
       |), c AS (
       |  SELECT source, dirty, $clean AS clean FROM d
       |)
       |SELECT source,
       |  count(*) AS n_docs,
       |  sum(len(regexp_extract_all(dirty, '${esc(email)}')))::BIGINT AS n_emails,
       |  sum(len(regexp_extract_all(dirty, '${esc(phone)}')))::BIGINT AS n_phones,
       |  sum(len(regexp_extract_all(dirty, '${esc(ip)}')))::BIGINT AS n_ips,
       |  sum(len(regexp_extract_all(dirty, '${esc(natId)}')))::BIGINT AS n_ids,
       |  sum(length(dirty) - length(clean))::BIGINT AS chars_removed,
       |  sum(len(regexp_extract_all(clean, '${esc(email)}'))
       |    + len(regexp_extract_all(clean, '${esc(ip)}'))
       |    + len(regexp_extract_all(clean, '${esc(natId)}'))
       |    + len(regexp_extract_all(clean, '${esc(phone)}')))::BIGINT AS n_residual
       |FROM c GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- q237: Luhn-validated card detection ------------------------------

  /** Eight Luhn-valid 16-digit test numbers (check digits computed
    * offline) and their last-digit-bumped INVALID twins — a unique
    * check digit means ±1 always breaks the checksum. */
  val LuhnValid: Seq[String] = Seq(
    "4023456789012340", "4123456789012349", "4223456789012348",
    "4323456789012347", "4423456789012346", "4523456789012345",
    "4623456789012344", "4723456789012343")
  val LuhnInvalid: Seq[String] =
    LuhnValid.map(s => s.init + ((s.last - '0' + 1) % 10).toString)

  /** The Luhn sum expression over a 16-digit string column `s` —
    * doubling every second digit from the right (= even 0-based
    * positions from the left at this even length), subtracting 9 on
    * overflow; valid iff ≡ 0 (mod 10). Pure integer higher-order
    * expression, codegen-friendly, identical arithmetic in DuckDB. */
  private def luhnSumExpr(s: String): String =
    s"aggregate(transform(sequence(0, 15), i -> CASE WHEN i % 2 = 0 " +
      s"THEN IF(2 * (ascii(substring($s, i + 1, 1)) - 48) > 9, " +
      s"2 * (ascii(substring($s, i + 1, 1)) - 48) - 9, " +
      s"2 * (ascii(substring($s, i + 1, 1)) - 48)) " +
      s"ELSE ascii(substring($s, i + 1, 1)) - 48 END), 0, (a, x) -> a + x)"

  /** Checksum-VALIDATED PII detection — the precision upgrade q79's
    * regexes cannot give: any 16-digit run LOOKS like a card, but
    * only a Luhn-consistent one IS one, and a redaction pipeline that
    * cannot tell them apart either over-redacts telemetry ids or
    * under-reports exposure. Half the injected candidates are
    * Luhn-valid, half are their bumped-check-digit twins; per source
    * the audit reports candidates, checksum-valid, invalid, and the
    * validated fraction. The Luhn sum is a higher-order integer
    * expression inside codegen — one corpus scan, no UDF. */
  def luhnAudit(spark: SparkSession, dir: String): DataFrame = {
    val varr = LuhnValid.map(v => s"'$v'").mkString("array(", ", ", ")")
    val iarr = LuhnInvalid.map(v => s"'$v'").mkString("array(", ", ", ")")
    val d = table(spark, dir, "documents").withColumn("dirty", expr(
      s"""CASE doc_id % 4
         |  WHEN 0 THEN concat(text, ' card ',
         |    element_at($varr, cast((doc_id div 4) % 8 + 1 as int)))
         |  WHEN 1 THEN concat(text, ' card ',
         |    element_at($iarr, cast((doc_id div 4) % 8 + 1 as int)))
         |  ELSE text END""".stripMargin))
      .withColumn("cand", regexp_extract(col("dirty"), "([0-9]{16})", 1))
    d.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cand") =!= "", 1L).otherwise(0L)).as("n_cands"),
        sum(when(col("cand") =!= "" &&
          expr(s"${luhnSumExpr("cand")} % 10") === 0, 1L).otherwise(0L))
          .as("n_valid"))
      .withColumn("n_invalid", col("n_cands") - col("n_valid"))
      .withColumn("valid_permille",
        when(col("n_cands") > 0,
          expr("(1000 * n_valid) div n_cands")).otherwise(0L))
      .orderBy("source")
  }

  val luhnAuditSql: String = {
    val varr = LuhnValid.map(v => s"'$v'").mkString("[", ", ", "]")
    val iarr = LuhnInvalid.map(v => s"'$v'").mkString("[", ", ", "]")
    val luhn = "list_sum(list_transform(range(0, 16), i -> " +
      "CASE WHEN i % 2 = 0 THEN " +
      "CASE WHEN 2 * (ascii(substr(cand, (i + 1)::INT, 1)) - 48) > 9 " +
      "THEN 2 * (ascii(substr(cand, (i + 1)::INT, 1)) - 48) - 9 " +
      "ELSE 2 * (ascii(substr(cand, (i + 1)::INT, 1)) - 48) END " +
      "ELSE ascii(substr(cand, (i + 1)::INT, 1)) - 48 END))"
    s"""WITH d AS (
       |  SELECT source,
       |    CASE doc_id % 4
       |      WHEN 0 THEN text || ' card ' ||
       |        ($varr)[((doc_id // 4) % 8 + 1)::INT]
       |      WHEN 1 THEN text || ' card ' ||
       |        ($iarr)[((doc_id // 4) % 8 + 1)::INT]
       |      ELSE text END AS dirty
       |  FROM documents),
       |c AS (
       |  SELECT source, regexp_extract(dirty, '([0-9]{16})', 1) AS cand
       |  FROM d)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN cand <> '' THEN 1 ELSE 0 END)::BIGINT AS n_cands,
       |  sum(CASE WHEN cand <> '' AND $luhn % 10 = 0
       |           THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       |  sum(CASE WHEN cand <> '' THEN 1 ELSE 0 END)::BIGINT
       |    - sum(CASE WHEN cand <> '' AND $luhn % 10 = 0
       |               THEN 1 ELSE 0 END)::BIGINT AS n_invalid,
       |  (CASE WHEN sum(CASE WHEN cand <> '' THEN 1 ELSE 0 END) > 0
       |        THEN (1000 * sum(CASE WHEN cand <> '' AND $luhn % 10 = 0
       |                              THEN 1 ELSE 0 END))
       |          // sum(CASE WHEN cand <> '' THEN 1 ELSE 0 END)
       |        ELSE 0 END)::BIGINT AS valid_permille
       |FROM c GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- q187: gazetteer NER redaction (names, not patterns) -------------

  /** The name list a gazetteer NER stage broadcasts. Capitalized, so
    * no token of the all-lowercase corpus can collide — injected names
    * are the only matches, making every count below exact. */
  val Gazetteer: Seq[String] = Seq("Alice", "Bob", "Carol", "David",
    "Erin", "Frank", "Grace", "Heidi", "Ivan", "Judy", "Mallory", "Oscar")

  /** Two deterministic gazetteer names appended to every third doc —
    * the q79 injection convention, for ENTITY pii instead of
    * pattern-shaped pii. */
  private def dirtyNames(spark: SparkSession, dir: String): DataFrame = {
    val nameArr = array(Gazetteer.map(lit): _*)
    table(spark, dir, "documents").withColumn("dirty",
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" regards "),
          element_at(nameArr, (col("doc_id") % 12 + 1).cast("int")),
          lit(" "),
          element_at(nameArr, (expr("(doc_id div 12) % 12") + 1).cast("int"))))
      .otherwise(col("text")))
  }

  /** Gazetteer NER scrub — the PII class regex cannot reach (q79's
    * scaladoc draws exactly this line: names need an entity list or a
    * model, not a pattern). The gazetteer BROADCASTS and tokens join
    * against it (the q127 vocab shape): posexplode → broadcast-hash
    * left join → per-doc reassembly ordered by token position → the
    * per-source scrub report, all on ONE corpus scan (PlanSpec pins
    * it). The corpus text never shuffles by anything but doc_id — the
    * map-side partial collect means the exchange carries one
    * reassembly buffer per doc, not per token; at 100 TB the gazetteer
    * stays a fixed-size broadcast whatever the corpus size, and the
    * same plan carries a model-emitted span table in place of the
    * static list.
    *
    * Report: docs, name tokens found, distinct names seen, characters
    * removed by redaction, and the residual self-check (gazetteer hits
    * in already-redacted text — must be 0, the q79 convention). */
  def nerRedaction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gaz = Gazetteer.toDF("name")
    val alt = Gazetteer.mkString("\\b(", "|", ")\\b")
    val toks = dirtyNames(spark, dir)
      .select(col("source"), col("doc_id"),
        length(col("dirty")).cast("long").as("dirty_len"),
        posexplode(split(col("dirty"), " ")).as(Seq("pos", "tok")))
    val marked = toks.join(broadcast(gaz), toks("tok") === gaz("name"), "left")
    // ONE corpus pass: the per-doc aggregate carries the redacted text
    // AND the doc's found-name SET (sort_array canonicalizes it; the
    // set is bounded by the gazetteer, not the doc), so the per-source
    // distinct-name count needs no second scan/explode/join — its
    // aggregation state is the set of distinct per-doc name-sets,
    // ≤ 2^|gazetteer| tiny arrays in the worst case.
    val perDoc = marked.groupBy("source", "doc_id", "dirty_len")
      .agg(
        sum(when(col("name").isNotNull, 1L).otherwise(0L)).as("n_names"),
        sort_array(collect_set(col("name"))).as("doc_names"),
        // sort_array on (pos, out) structs restores token order; the
        // getField projection keeps reassembly join-free
        array_join(sort_array(collect_list(struct(col("pos"),
            when(col("name").isNotNull, lit("[NAME]")).otherwise(col("tok"))
              .as("out")))).getField("out"), " ").as("clean"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_names")).as("n_name_tokens"),
        size(array_distinct(flatten(collect_set(col("doc_names")))))
          .cast("long").as("n_distinct_names"),
        sum(col("dirty_len") - length(col("clean"))).as("chars_removed"),
        sum(regexp_count(col("clean"), lit(alt))).as("n_residual"))
      .select(col("source"), col("n_docs"), col("n_name_tokens"),
        col("n_distinct_names"), col("chars_removed"), col("n_residual"))
      .orderBy("source")
  }

  val nerRedactionSql: String = {
    val list = Gazetteer.map(n => s"'$n'").mkString("[", ", ", "]")
    val alt = Gazetteer.mkString("\\b(", "|", ")\\b")
    val inject = "CASE WHEN doc_id % 3 = 0 THEN text || ' regards ' ||" +
      s" $list[(doc_id % 12 + 1)::INT] || ' ' ||" +
      s" $list[((doc_id // 12) % 12 + 1)::INT] ELSE text END"
    s"""WITH d AS (
       |  SELECT source, doc_id, $inject AS dirty FROM documents),
       |c AS (
       |  SELECT source, doc_id, dirty,
       |    array_to_string(list_transform(string_split(dirty, ' '),
       |      t -> CASE WHEN list_contains($list, t)
       |           THEN '[NAME]' ELSE t END), ' ') AS clean,
       |    len(list_filter(string_split(dirty, ' '),
       |      t -> list_contains($list, t)))::BIGINT AS n_names
       |  FROM d),
       |nt AS (
       |  SELECT source, unnest(list_filter(string_split(dirty, ' '),
       |    t -> list_contains($list, t))) AS nm
       |  FROM d),
       |nd AS (SELECT source, count(DISTINCT nm) AS n_dn FROM nt GROUP BY source)
       |SELECT c.source, count(*) AS n_docs,
       |  sum(n_names)::BIGINT AS n_name_tokens,
       |  coalesce(max(nd.n_dn), 0)::BIGINT AS n_distinct_names,
       |  sum(length(dirty) - length(clean))::BIGINT AS chars_removed,
       |  sum(len(regexp_extract_all(clean, '$alt')))::BIGINT AS n_residual
       |FROM c LEFT JOIN nd ON c.source = nd.source
       |GROUP BY c.source ORDER BY c.source""".stripMargin
  }

  // ---- q80: paragraph-level boilerplate dedup --------------------------

  /** Three boilerplate paragraphs (newsletter / copyright / cookies),
    * appended by `doc_id % 4` (one clean class). Each survives only in
    * the first document carrying it. */
  private val Boiler = Seq(
    "subscribe to our newsletter for updates and follow the channel for more content every day",
    "all rights reserved unauthorized reproduction of this material is strictly prohibited by the publisher",
    "click here to accept cookies and continue reading the full article on our site")

  private def dirtyParagraphs(spark: SparkSession, dir: String): DataFrame = {
    val m = col("doc_id") % 4
    table(spark, dir, "documents").withColumn("dirty",
      when(m === 0, concat_ws("\n", col("text"), lit(Boiler(0))))
      .when(m === 1, concat_ws("\n", col("text"), lit(Boiler(1)), lit(Boiler(2))))
      .when(m === 2, concat_ws("\n", col("text"), lit(Boiler(2))))
      .otherwise(col("text")))
  }

  /** Per-document dedup report: paragraph counts before/after the
    * corpus-wide keep-first pass plus the md5 of the reassembled clean
    * document — the strongest possible gate (any dropped, duplicated,
    * reordered, or mis-joined paragraph flips the hash). See
    * [[graft.text.ParagraphDedup]] for why this is winners+semi-join,
    * not a window over the (viral-key-skewed) paragraph column. */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame =
    ParagraphDedup.keepFirst(dirtyParagraphs(spark, dir), "doc_id", "dirty")
      .select(col("doc_id"), col("n_paras"), col("n_kept"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy("doc_id")

  // ---- q82: resilient JSON ingest (quarantine + schema evolution) -----

  /** JSON-lines rendering of `documents` written once per JVM into two
    * shards — v1 (even ids: old schema `doc_id, lang, text`) and v2
    * (odd ids: evolved schema with `quality`) — with every
    * `doc_id % 17 == 0` line corrupted (prefixed junk ⇒ invalid JSON).
    * Same mtime+length fingerprint rule as the q47 layout: ingest-time
    * work, not per-query work. */
  private def ensureJsonShards(spark: SparkSession, dir: String): (String, String) =
    synchronized {
      val src = new java.io.File(s"$dir/documents.parquet")
      val tag = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(
          s"$dir:${src.length}:${src.lastModified}"))
      val root = s"${sys.props("java.io.tmpdir")}/graft_json_docs_$tag"
      val (v1, v2) = (s"$root/v1", s"$root/v2")
      if (!new java.io.File(v1, "_SUCCESS").exists ||
          !new java.io.File(v2, "_SUCCESS").exists) {
        val docs = table(spark, dir, "documents")
        def corrupted(line: org.apache.spark.sql.Column) =
          when(col("doc_id") % 17 === 0, concat(lit("x"), line)).otherwise(line)
        docs.filter(col("doc_id") % 2 === 0)
          .select(corrupted(to_json(struct(
            col("doc_id"), col("lang"), col("text")))).as("value"))
          .write.mode("overwrite").text(v1)
        docs.filter(col("doc_id") % 2 === 1)
          .withColumn("quality", col("doc_id") % 7)
          .select(corrupted(to_json(struct(
            col("doc_id"), col("lang"), col("text"), col("quality")))).as("value"))
          .write.mode("overwrite").text(v2)
      }
      (v1, v2)
    }

  /** Ingest report over the two JSON shards: per-language row counts,
    * quarantined-line count (corrupt rows parse no fields, so they land
    * in the `_corrupt` group), evolved-column presence, and recovered
    * content size. The oracle never parses JSON — it derives the same
    * numbers from `documents` plus the injection arithmetic, so a
    * parser that dropped, duplicated, or mis-quarantined any line
    * fails the gate. */
  def jsonIngest(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = ensureJsonShards(spark, dir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("lang", "string")
      .add("text", "string").add("quality", "long")
    graft.sources.JsonIngest.readResilient(spark, schema, v1, v2)
      .groupBy(coalesce(col("lang"), lit("_corrupt")).as("lang_group"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col(graft.sources.JsonIngest.CorruptCol)).as("n_corrupt"),
        count(col("quality")).as("n_evolved"),
        coalesce(sum(col("quality")), lit(0L)).as("sum_quality"),
        coalesce(sum(length(col("text"))), lit(0L)).cast("long").as("sum_text_len"))
      .orderBy("lang_group")
  }

  val jsonIngestSql: String =
    """WITH r AS (
      |  SELECT CASE WHEN doc_id % 17 = 0 THEN NULL ELSE lang END AS lang,
      |    CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS corrupt,
      |    CASE WHEN doc_id % 17 <> 0 AND doc_id % 2 = 1
      |         THEN doc_id % 7 END AS quality,
      |    CASE WHEN doc_id % 17 <> 0 THEN length(text) END AS tlen
      |  FROM documents)
      |SELECT coalesce(lang, '_corrupt') AS lang_group,
      |  count(*) AS n_rows,
      |  sum(corrupt)::BIGINT AS n_corrupt,
      |  count(quality) AS n_evolved,
      |  coalesce(sum(quality), 0)::BIGINT AS sum_quality,
      |  coalesce(sum(tlen), 0)::BIGINT AS sum_text_len
      |FROM r GROUP BY 1 ORDER BY lang_group""".stripMargin

  // ---- q289: CSV dirty-ingest quarantine ----------------------------------

  /** Write-once CSV shard derived from `orders` with a deterministic
    * corruption (every 97th key's money field is the unparseable token
    * `CORRUPT_PRICE`) — the q82 convention: the dirt is a pure function
    * of the key, so the oracle regenerates the expected quarantine from
    * the clean parquet without ever reading the CSV. */
  private def ensureCsvShard(spark: SparkSession, dir: String): String =
    synchronized {
      val src = new java.io.File(s"$dir/orders.parquet")
      val tag = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(
          s"$dir:${src.length}:${src.lastModified}"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_csv_orders_$tag"
      if (!new java.io.File(path, "_SUCCESS").exists) {
        table(spark, dir, "orders")
          .select(concat(
            col("o_orderkey"), lit(","), col("o_custkey"), lit(","),
            when(col("o_orderkey") % 97 === 0, lit("CORRUPT_PRICE"))
              .otherwise(floor(col("o_totalprice") * 100).cast("long")
                .cast("string"))).as("value"))
          .write.mode("overwrite").text(path)
      }
      path
    }

  /** The CSV twin of q82's resilient JSON ingest — the other wire
    * format a 100 TB landing zone actually receives. PERMISSIVE read
    * with an explicit schema and a corrupt-record column: a row whose
    * money field fails the BIGINT cast keeps its parseable fields,
    * nulls the bad one, and lands in quarantine — counted, rated
    * per-mille, and key-checksummed so the quarantine is auditable
    * (WHICH rows died, not just how many), while the good rows flow
    * to the revenue aggregate untouched. One pass, no second read.
    *
    * The staged shard's corruption is `o_orderkey % 97 = 0`
    * ([[ensureCsvShard]]) — the oracle reproduces every output number
    * from the clean parquet with that predicate. */
  def csvIngest(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureCsvShard(spark, dir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("o_orderkey", "long").add("o_custkey", "long")
      .add("cents", "long").add("_corrupt_record", "string")
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .agg(count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_quarantined"),
        expr("(1000 * count(_corrupt_record)) div count(1)")
          .as("quarantine_pm"),
        coalesce(sum("cents"), lit(0L)).as("revenue_cents"),
        coalesce(sum(when(col("_corrupt_record").isNotNull,
          col("o_orderkey"))), lit(0L)).as("quarantined_key_checksum"))
  }

  val csvIngestSql: String =
    """SELECT count(*)::BIGINT AS n_rows,
      |  sum(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)::BIGINT
      |    AS n_quarantined,
      |  ((1000 * sum(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END))
      |    // count(*))::BIGINT AS quarantine_pm,
      |  coalesce(sum(CASE WHEN o_orderkey % 97 <> 0
      |    THEN floor(o_totalprice * 100)::BIGINT END), 0)::BIGINT
      |    AS revenue_cents,
      |  coalesce(sum(CASE WHEN o_orderkey % 97 = 0 THEN o_orderkey END),
      |    0)::BIGINT AS quarantined_key_checksum
      |FROM orders""".stripMargin

  val paragraphDedupSql: String = {
    val b = Boiler.map(_.replace("'", "''"))
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE doc_id % 4
       |      WHEN 0 THEN text || chr(10) || '${b(0)}'
       |      WHEN 1 THEN text || chr(10) || '${b(1)}' || chr(10) || '${b(2)}'
       |      WHEN 2 THEN text || chr(10) || '${b(2)}'
       |      ELSE text END AS dirty
       |  FROM documents
       |), p AS (
       |  SELECT doc_id, u.idx, u.para
       |  FROM d, LATERAL (
       |    SELECT unnest(string_split(dirty, chr(10))) AS para,
       |           generate_subscripts(string_split(dirty, chr(10)), 1) AS idx) u
       |), k AS (
       |  SELECT *, row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
       |  FROM p
       |)
       |SELECT doc_id,
       |  count(*) AS n_paras,
       |  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  md5(coalesce(string_agg(CASE WHEN rn = 1 THEN para END, chr(10) ORDER BY idx), ''))
       |    AS clean_md5
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- q113: Gopher quality-rule suite -------------------------------

  /** Word-count bounds (Rae et al. 2021, §A1.1 — the canonical
    * pretraining quality filter) and the stopword list in its common
    * a/in variant (Dolma/RefinedWeb lineage) — the variant
    * discriminates English from non-English on this corpus where the
    * paper's verbatim eight would reject everything. */
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherStopwords = Seq("the", "be", "to", "of", "and", "a", "in", "that")

  /** The Gopher rule suite over `documents` — per-rule violation
    * counts plus the `any`-rule roll-up, every signal in exact integer
    * space (per-mille ratios via `div`, never a float):
    * word-count ∈ [50, 100k]; mean word length ∈ [3, 10] chars
    * (`1000·Σchars div n` milli-chars); #/ellipsis symbol-to-word
    * ratio ≤ 0.1; ≥ 80% of words contain an alphabetic char; ≥ 2
    * distinct stopwords present (the "real prose" test).
    *
    * One scan computes all per-doc flags (shared tokenization
    * subexpressions), one tiny aggregate, then a 6-way `stack` unpivot
    * of the single aggregate row — rule cardinality, not corpus size,
    * bounds everything after the scan. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val t = trim(col("text"))
    val words = split(t, "\\s+")
    val nWords = graft.text.TextStats.nTokens(col("text"))
    val sumChars = length(regexp_replace(t, "\\s+", ""))
    val nSym = regexp_count(col("text"), lit("#|\\.\\.\\."))
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]")))
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val nStop = GopherStopwords.map(w =>
      when(instr(padded, s" $w ") > 0, 1L).otherwise(0L)).reduce(_ + _)
    val flags = table(spark, dir, "documents")
      .select(nWords.as("nw"), sumChars.cast("long").as("sc"),
        nSym.cast("long").as("ns"), nAlpha.cast("long").as("na"),
        nStop.as("nst"))
      .select(
        (col("nw") < GopherMinWords || col("nw") > GopherMaxWords).as("f_wc"),
        (col("nw") > 0 &&
          !expr("(1000 * sc) div nw").between(3000L, 10000L)).as("f_mwl"),
        (col("ns") * 10L > col("nw")).as("f_sym"),
        (col("na") * 5L < col("nw") * 4L).as("f_alpha"),
        (col("nst") < 2L).as("f_stop"))
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L))
    val agg = flags.agg(count(lit(1)).as("n_docs"),
      cnt("f_wc").as("c_wc"), cnt("f_mwl").as("c_mwl"),
      cnt("f_sym").as("c_sym"), cnt("f_alpha").as("c_alpha"),
      cnt("f_stop").as("c_stop"),
      sum(when(col("f_wc") || col("f_mwl") || col("f_sym") ||
        col("f_alpha") || col("f_stop"), 1L).otherwise(0L)).as("c_any"))
    agg.select(expr(
        "stack(6, 'word_count', c_wc, 'mean_word_len', c_mwl, " +
          "'symbol_ratio', c_sym, 'alpha_words', c_alpha, " +
          "'stopwords', c_stop, 'any', c_any)").as(Seq("rule", "n_fail")),
        col("n_docs"))
      .withColumn("fail_pm", expr("(1000 * n_fail) div n_docs"))
      .orderBy("rule")
  }

  val gopherRulesSql: String = {
    val stop = GopherStopwords.map(w =>
      s"(CASE WHEN strpos(' ' || lower(text) || ' ', ' $w ') > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH f AS (
       |  SELECT
       |    (nw < $GopherMinWords OR nw > $GopherMaxWords) AS f_wc,
       |    (nw > 0 AND NOT ((1000 * sc) // nw BETWEEN 3000 AND 10000)) AS f_mwl,
       |    (ns * 10 > nw) AS f_sym,
       |    (na * 5 < nw * 4) AS f_alpha,
       |    (nst < 2) AS f_stop
       |  FROM (
       |    SELECT ${graft.text.TextStats.nTokensSql("text")} AS nw,
       |      length(regexp_replace(trim(text), '\\s+', '', 'g')) AS sc,
       |      len(regexp_extract_all(text, '#|\\.\\.\\.')) AS ns,
       |      len(list_filter(string_split_regex(trim(text), '\\s+'),
       |        x -> regexp_matches(x, '[A-Za-z]'))) AS na,
       |      ($stop) AS nst
       |    FROM documents)),
       |a AS (
       |  SELECT count(*)::BIGINT AS n_docs,
       |    sum(CASE WHEN f_wc THEN 1 ELSE 0 END)::BIGINT AS c_wc,
       |    sum(CASE WHEN f_mwl THEN 1 ELSE 0 END)::BIGINT AS c_mwl,
       |    sum(CASE WHEN f_sym THEN 1 ELSE 0 END)::BIGINT AS c_sym,
       |    sum(CASE WHEN f_alpha THEN 1 ELSE 0 END)::BIGINT AS c_alpha,
       |    sum(CASE WHEN f_stop THEN 1 ELSE 0 END)::BIGINT AS c_stop,
       |    sum(CASE WHEN f_wc OR f_mwl OR f_sym OR f_alpha OR f_stop
       |      THEN 1 ELSE 0 END)::BIGINT AS c_any
       |  FROM f),
       |u AS (
       |  SELECT 'word_count' AS rule, c_wc AS n_fail, n_docs FROM a
       |  UNION ALL SELECT 'mean_word_len', c_mwl, n_docs FROM a
       |  UNION ALL SELECT 'symbol_ratio', c_sym, n_docs FROM a
       |  UNION ALL SELECT 'alpha_words', c_alpha, n_docs FROM a
       |  UNION ALL SELECT 'stopwords', c_stop, n_docs FROM a
       |  UNION ALL SELECT 'any', c_any, n_docs FROM a)
       |SELECT rule, n_fail, n_docs, (1000 * n_fail) // n_docs AS fail_pm
       |FROM u ORDER BY rule""".stripMargin
  }

  // ---- q123: source-precedence canonical dedup -------------------------

  /** Synthetic-feed doc_id offsets (keyspaces disjoint by construction:
    * raw doc_ids are < 10⁹ at every SF). */
  val CanonCcOffset = 1000000000L
  val CanonWebOffset = 2000000000L

  /** Precedence packing: `pri · 10¹¹ + doc_id` — one comparable long, so
    * the canonical copy is a single `min_by` (no window sort). Raw
    * doc_ids stay far below 10¹¹. */
  val CanonPriShift = 100000000000L

  /** Canonical-copy selection across overlapping feeds — the multi-source
    * corpus-merge step every crawl pipeline runs: when the same content
    * arrives from several sources, keep exactly ONE copy, chosen by
    * source PRIORITY (curated mirror beats raw crawl beats scraped
    * re-dump), with doc_id as the deterministic tiebreak. The corpus has
    * no cross-source duplicates, so — the q79/q96 convention — the query
    * synthesizes two deterministic overlay feeds from the corpus itself:
    * `cc-main` (every `%3` doc, priority 0: BETTER than the original) and
    * `web-dup` (every `%4` doc, priority 2: worse, never wins against an
    * original). The gate is the per-source merge report: totals, kept,
    * dropped, and the exact id-sum of kept copies — a wrong winner
    * anywhere shifts a checksum.
    *
    * Scale shape: the decision shuffles (digest, packed-key, doc_id,
    * source) ONLY — document payloads never move; winners are one
    * `min_by` per content group (map-side combined), and a real pipeline
    * re-attaches payloads by a doc_id semi-join against the winner set
    * (the q09 keep_id convention). Priorities pack into the key long, so
    * there is no struct comparison in the hot aggregate. */
  def canonicalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select("doc_id", "source", "text")
    def feed(f: DataFrame, off: Long, src: String, pri: Long): DataFrame =
      f.select((col("doc_id") + off).as("doc_id"), lit(src).as("source"),
        lit(pri).as("pri"), col("text"))
    val all = docs.select(col("doc_id"), col("source"), lit(1L).as("pri"), col("text"))
      .unionByName(feed(docs.filter(col("doc_id") % 3 === 0), CanonCcOffset, "cc-main", 0L))
      .unionByName(feed(docs.filter(col("doc_id") % 4 === 0), CanonWebOffset, "web-dup", 2L))
      .select(col("doc_id"), col("source"),
        (col("pri") * CanonPriShift + col("doc_id")).as("pkey"),
        md5(col("text")).as("digest"))
    val winners = all.groupBy("digest")
      .agg(min_by(struct(col("doc_id"), col("source")), col("pkey")).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.source").as("source"))
    val totals = all.groupBy("source").agg(count(lit(1)).as("n_total"))
    val kept = winners.groupBy("source").agg(count(lit(1)).as("n_kept"),
      sum(col("doc_id")).as("kept_id_checksum"))
    totals.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("kept_id_checksum"), lit(0L)).as("kept_id_checksum"))
      .orderBy("source")
  }

  val canonicalDedupSql: String =
    s"""WITH feeds AS (
       |  SELECT doc_id, source, 1 AS pri, md5(text) AS digest FROM documents
       |  UNION ALL SELECT doc_id + $CanonCcOffset, 'cc-main', 0, md5(text)
       |    FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL SELECT doc_id + $CanonWebOffset, 'web-dup', 2, md5(text)
       |    FROM documents WHERE doc_id % 4 = 0),
       |w AS (
       |  SELECT digest,
       |    arg_min(doc_id, pri * $CanonPriShift + doc_id) AS doc_id,
       |    arg_min(source, pri * $CanonPriShift + doc_id) AS source
       |  FROM feeds GROUP BY digest),
       |tot AS (SELECT source, count(*)::BIGINT AS n_total FROM feeds GROUP BY source),
       |kept AS (
       |  SELECT source, count(*)::BIGINT AS n_kept,
       |    sum(doc_id)::BIGINT AS kept_id_checksum
       |  FROM w GROUP BY source)
       |SELECT t.source, t.n_total,
       |  coalesce(k.n_kept, 0)::BIGINT AS n_kept,
       |  (t.n_total - coalesce(k.n_kept, 0))::BIGINT AS n_dropped,
       |  coalesce(k.kept_id_checksum, 0)::BIGINT AS kept_id_checksum
       |FROM tot t LEFT JOIN kept k USING (source)
       |ORDER BY source""".stripMargin

  // ---- q127: tokenizer vocabulary coverage / OOV rate ------------------

  /** Vocabulary size: top words by corpus frequency (count desc, word
    * asc — the deterministic total order at the cut). */
  val VocabK = 500

  /** Tokenizer-vocabulary coverage audit — the "will this tokenizer
    * shred this corpus?" check run before committing a vocab: build the
    * top-[[VocabK]] word vocabulary from the corpus itself (the
    * frequency-ranked seed every subword trainer starts from), then
    * score every language slice by out-of-vocabulary token rate in
    * exact integer per-mille. High-OOV slices are where a vocab
    * underserves a language — the multilingual-fairness number
    * tokenizer papers report.
    *
    * Scale shape: the vocab is a corpus-wide word count (map-side
    * combined, two short columns) cut by TakeOrderedAndProject, then
    * BROADCAST back — the corpus-side pass is one explode + broadcast
    * left-join + per-lang aggregate; the corpus text itself never
    * shuffles. At 100 TB the vocab stays tiny by construction
    * ([[VocabK]] rows) whatever the corpus size. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(VocabK)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_pm", expr("(1000 * n_oov) div n_tokens"))
      .orderBy("lang")
  }

  val vocabCoverageSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)),
       |    '\\s+')) AS w
       |  FROM documents),
       |vocab AS (
       |  SELECT w FROM tok GROUP BY w
       |  ORDER BY count(*) DESC, w LIMIT $VocabK)
       |SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_docs,
       |  count(*)::BIGINT AS n_tokens,
       |  sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       |  ((1000 * sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END))
       |    // count(*))::BIGINT AS oov_pm
       |FROM tok t LEFT JOIN vocab v ON t.w = v.w
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q140: per-source dataset card ---------------------------------

  /** The per-feed composition card a curation pipeline publishes before
    * mixing — one row per source with the numbers every mix decision
    * reads: docs, exact token and char sums, distinct languages, exact
    * within-source duplicate count (md5 groups — q09's construction
    * scoped per source), mean doc length in integer tokens, and the
    * per-mille share of corpus tokens. All exact integers; the card is
    * the input the q131 mix planner and q58/q106 samplers consume.
    * The corpus carries no duplicate texts, so — the q123 convention —
    * every `%6` doc re-appears once in its OWN source (a re-crawl of
    * the same page), making the dup column provably non-degenerate.
    *
    * Scale shape: ONE corpus scan feeds a per-(source, digest)
    * collapse (map-side combined) and a per-source rollup — the dup
    * count aggregates FROM the digest table, never a second scan; the
    * corpus-total joins back as a 1-row broadcast. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextStats
    val raw = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"), col("text"))
    val d = raw.unionByName(raw.filter(col("doc_id") % 6 === 0))
      .select(col("source"), col("lang"), col("n_chars"),
        TextStats.nTokens(col("text")).as("n_tok"), md5(col("text")).as("digest"))
    val byDigest = d.groupBy("source", "digest")
      .agg(count(lit(1)).as("copies"), first(col("lang")).as("lang"),
        sum(col("n_tok")).as("tok"), sum(col("n_chars")).as("chars"))
    val per = byDigest.groupBy("source")
      .agg(sum("copies").as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum("tok").as("n_tokens"),
        sum("chars").as("n_chars"),
        sum(col("copies") - 1).as("n_dup_docs"))
    val tot = per.agg(sum("n_tokens").as("corpus_tokens"))
    per.crossJoin(tot)
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("n_tokens"), col("n_chars"), col("n_dup_docs"),
        expr("n_tokens div n_docs").as("mean_doc_tokens"),
        expr("(1000 * n_tokens) div corpus_tokens").as("token_share_pm"))
      .orderBy("source")
  }

  val datasetCardSql: String = {
    import graft.text.TextStats
    s"""WITH u AS (
       |  SELECT doc_id, source, lang, n_chars, text FROM documents
       |  UNION ALL
       |  SELECT doc_id, source, lang, n_chars, text FROM documents
       |  WHERE doc_id % 6 = 0),
       |d AS (
       |  SELECT source, lang, n_chars,
       |    ${TextStats.nTokensSql("text")} AS n_tok, md5(text) AS digest
       |  FROM u),
       |g AS (
       |  SELECT source, digest, count(*)::BIGINT AS copies,
       |    any_value(lang) AS lang, sum(n_tok)::BIGINT AS tok,
       |    sum(n_chars)::BIGINT AS chars
       |  FROM d GROUP BY source, digest),
       |per AS (
       |  SELECT source, sum(copies)::BIGINT AS n_docs,
       |    count(DISTINCT lang)::BIGINT AS n_langs,
       |    sum(tok)::BIGINT AS n_tokens, sum(chars)::BIGINT AS n_chars,
       |    sum(copies - 1)::BIGINT AS n_dup_docs
       |  FROM g GROUP BY source),
       |tot AS (SELECT sum(n_tokens)::BIGINT AS corpus_tokens FROM per)
       |SELECT source, n_docs, n_langs, n_tokens, n_chars, n_dup_docs,
       |  (n_tokens // n_docs)::BIGINT AS mean_doc_tokens,
       |  ((1000 * n_tokens) // corpus_tokens)::BIGINT AS token_share_pm
       |FROM per CROSS JOIN tot ORDER BY source""".stripMargin
  }

  // ---- q135: Zipf-law fit of the frequency spectrum ------------------

  /** Ranks fitted: the top-[[ZipfK]] frequency spectrum (the head is
    * where Zipf holds and where a corrupted corpus shows first). */
  val ZipfK = 500

  /** Corpus-health check via the Zipf exponent — natural language has
    * frequency ∝ rank^(−s) with s ≈ 1; template spam, dedup failures,
    * and boilerplate floods all bend the slope, so corpus pipelines
    * track it per snapshot. OLS fit of ln(freq) on ln(rank) over the
    * top-[[ZipfK]] words, with BOTH axes quantized to integer
    * MICRO-LOG units per distinct (rank, freq) BEFORE the moment sums
    * (q100's discipline: one `ln`+`round` per row of the K-row
    * spectrum; every Σ after that is exact integer arithmetic, so the
    * slope/intercept/R² are pure functions of the spectrum). Rank ties
    * broken (count desc, word) — the deterministic total order.
    *
    * Scale shape: one corpus word count (map-side combined) cut to K
    * rows by TakeOrderedAndProject; the fit's moment sums aggregate
    * K rows. Slope in micro units, R² in per-mille. The synthetic
    * corpus is a 31-word near-uniform salad, so the fixture honestly
    * measures slope ≈ −0.16, R² ≈ 46‰ — the "this is not natural
    * language" verdict is exactly what the check exists to raise
    * (English corpora fit s ≈ 1, R² > 900‰). */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val spectrum = table(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(ZipfK)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("w"))).cast("long").as("r"), col("c"))
      .select(expr("cast(round(1000000 * ln(cast(r as double))) as long)").as("x"),
        expr("cast(round(1000000 * ln(cast(c as double))) as long)").as("y"))
    // moment combination in DECIMAL(38,0): n·Σxy reaches ~10¹⁹ once the
    // head frequencies pass ~10⁵ (ln·10⁶ axes) — past long range
    val d38 = "decimal(38,0)"
    spectrum.agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
      .select(col("n").cast("long").as("n"),
        expr("cast(round(cast(1000000 * (n * sxy - sx * sy) as double) " +
          "/ cast(n * sxx - sx * sx as double)) as long)").as("slope_micro"),
        expr("cast(round((cast(sy as double) " +
          "- (cast(n * sxy - sx * sy as double) " +
          "/ cast(n * sxx - sx * sx as double)) * cast(sx as double)) " +
          "/ cast(n as double)) as long)").as("intercept_micro"),
        expr("cast(floor(1000.0 * (cast(n * sxy - sx * sy as double) " +
          "* cast(n * sxy - sx * sy as double)) " +
          "/ (cast(n * sxx - sx * sx as double) " +
          "* cast(n * syy - sy * sy as double))) as long)").as("r2_pm"))
  }

  val zipfFitSql: String =
    s"""WITH spec AS (
       |  SELECT row_number() OVER (ORDER BY count(*) DESC, w) AS r,
       |    count(*)::BIGINT AS c
       |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |        FROM documents) GROUP BY w
       |  ORDER BY count(*) DESC, w LIMIT $ZipfK),
       |q AS (
       |  SELECT round(1000000 * ln(r::DOUBLE))::BIGINT AS x,
       |    round(1000000 * ln(c::DOUBLE))::BIGINT AS y
       |  FROM spec),
       |m AS (
       |  SELECT count(*)::DECIMAL(38,0) AS n,
       |    sum(x::DECIMAL(38,0)) AS sx, sum(y::DECIMAL(38,0)) AS sy,
       |    sum((x * y)::DECIMAL(38,0)) AS sxy,
       |    sum((x * x)::DECIMAL(38,0)) AS sxx,
       |    sum((y * y)::DECIMAL(38,0)) AS syy
       |  FROM q)
       |SELECT n::BIGINT AS n,
       |  round((1000000 * (n * sxy - sx * sy))::DOUBLE
       |    / (n * sxx - sx * sx)::DOUBLE)::BIGINT AS slope_micro,
       |  round((sy::DOUBLE - ((n * sxy - sx * sy)::DOUBLE
       |      / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE)
       |    / n::DOUBLE)::BIGINT AS intercept_micro,
       |  floor(1000.0 * ((n * sxy - sx * sy)::DOUBLE
       |      * (n * sxy - sx * sy)::DOUBLE)
       |    / ((n * sxx - sx * sx)::DOUBLE
       |       * (n * syy - sy * sy)::DOUBLE))::BIGINT AS r2_pm
       |FROM m""".stripMargin

  // ---- q151: Heaps-law vocabulary growth fit --------------------------

  /** Growth checkpoints along the ingestion order. */
  val HeapsK = 16

  /** Vocabulary-growth audit (Heaps' law): natural corpora grow their
    * vocabulary as V(T) ≈ k·T^β with β ≈ 0.4–0.6; a template-flooded
    * or deduplication-broken feed bends β, and a CLOSED vocabulary
    * (generated/boilerplate text) drives it to 0 — so curation
    * pipelines track the exponent per snapshot alongside q135's Zipf
    * slope. The corpus is cut at [[HeapsK]] ingestion-order
    * checkpoints; at each, cumulative tokens T and cumulative distinct
    * vocabulary V are EXACT integers (V via per-word FIRST-occurrence
    * rank — a word counts at the earliest checkpoint covering it, so
    * no checkpoint recounts the corpus); the OLS of ln V on ln T uses
    * q135's discipline — both axes quantized to integer micro-log per
    * checkpoint row BEFORE the moment sums, moments in DECIMAL(38,0),
    * outputs BIGINT. A constant-V spectrum (vocabulary saturated at
    * every checkpoint — this synthetic 31-word salad's honest verdict)
    * has zero y-variance, where R² is 0/0; both engines pin that case
    * to 1000‰ (the zero slope fits exactly).
    *
    * Scale shape: one corpus scan → (word, first_rank) aggregate
    * collapsed to a first-rank histogram (≤ #docs rows); checkpoint
    * sums are a K-row broadcast grid non-equi-joined against the
    * histogram and the per-doc token table — never a second corpus
    * scan. The ingestion-order rank is a doc-level window (docs, not
    * tokens); at warehouse scale it substitutes q94's distributed
    * PrefixSum, same as q143's per-source rank. */
  def heapsFit(spark: SparkSession, dir: String): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
      .select(col("w"), row_number().over(win).cast("long").as("dr"))
    val nDocs = docs.count()
    val frHist = docs.select(col("dr"), explode(col("w")).as("word"))
      .groupBy("word").agg(min(col("dr")).as("fr"))
      .groupBy("fr").agg(count(lit(1)).as("c"))
    val dtok = docs.select(col("dr"), size(col("w")).cast("long").as("ntok"))
    val grid = spark.range(1, HeapsK + 1).toDF("ckpt")
      .select(col("ckpt"), expr(s"($nDocs * ckpt + ${HeapsK - 1}) div $HeapsK").as("nj"))
    val vj = broadcast(grid).join(frHist, col("fr") <= col("nj"))
      .groupBy("ckpt").agg(sum(col("c")).as("cum_vocab"))
    val tj = broadcast(grid).join(dtok, col("dr") <= col("nj"))
      .groupBy("ckpt").agg(sum(col("ntok")).as("cum_tokens"))
    val ck = grid.join(vj, "ckpt").join(tj, "ckpt")
      .select(col("ckpt"), col("nj").as("n_docs"),
        col("cum_tokens"), col("cum_vocab"),
        expr("cast(round(1000000 * ln(cast(cum_tokens as double))) as long)").as("x"),
        expr("cast(round(1000000 * ln(cast(cum_vocab as double))) as long)").as("y"))
    val d38 = "decimal(38,0)"
    val fit = ck.agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
      .select(
        expr("cast(round(cast(1000000 * (n * sxy - sx * sy) as double) " +
          "/ cast(n * sxx - sx * sx as double)) as long)").as("beta_micro"),
        expr("cast(round((cast(sy as double) " +
          "- (cast(n * sxy - sx * sy as double) " +
          "/ cast(n * sxx - sx * sx as double)) * cast(sx as double)) " +
          "/ cast(n as double)) as long)").as("lnk_micro"),
        expr("cast(CASE WHEN n * syy - sy * sy = 0 THEN 1000 ELSE " +
          "floor(1000.0 * (cast(n * sxy - sx * sy as double) " +
          "* cast(n * sxy - sx * sy as double)) " +
          "/ (cast(n * sxx - sx * sx as double) " +
          "* cast(n * syy - sy * sy as double))) END as long)").as("r2_pm"))
    ck.select("ckpt", "n_docs", "cum_tokens", "cum_vocab")
      .crossJoin(broadcast(fit))
      .orderBy("ckpt")
  }

  val heapsFitSql: String =
    s"""WITH d AS (
       |  SELECT string_split_regex(lower(trim(text)), '\\s+') AS w,
       |    row_number() OVER (ORDER BY doc_id) AS dr
       |  FROM documents),
       |fr AS (
       |  SELECT word, min(dr)::BIGINT AS fr
       |  FROM (SELECT dr, unnest(w) AS word FROM d) GROUP BY word),
       |frh AS (SELECT fr, count(*)::BIGINT AS c FROM fr GROUP BY fr),
       |dt AS (SELECT dr, len(w)::BIGINT AS ntok FROM d),
       |nd AS (SELECT count(*)::BIGINT AS n FROM documents),
       |grid AS (
       |  SELECT g AS ckpt, ((n * g + ${HeapsK - 1}) // $HeapsK)::BIGINT AS nj
       |  FROM (SELECT unnest(generate_series(1, $HeapsK)) AS g) CROSS JOIN nd),
       |vj AS (
       |  SELECT ckpt, sum(c)::BIGINT AS cum_vocab
       |  FROM grid JOIN frh ON frh.fr <= grid.nj GROUP BY ckpt),
       |tj AS (
       |  SELECT ckpt, sum(ntok)::BIGINT AS cum_tokens
       |  FROM grid JOIN dt ON dt.dr <= grid.nj GROUP BY ckpt),
       |ck AS (
       |  SELECT grid.ckpt::BIGINT AS ckpt, grid.nj AS n_docs,
       |    cum_tokens, cum_vocab,
       |    round(1000000 * ln(cum_tokens::DOUBLE))::BIGINT AS x,
       |    round(1000000 * ln(cum_vocab::DOUBLE))::BIGINT AS y
       |  FROM grid JOIN vj USING (ckpt) JOIN tj USING (ckpt)),
       |m AS (
       |  SELECT count(*)::DECIMAL(38,0) AS n,
       |    sum(x::DECIMAL(38,0)) AS sx, sum(y::DECIMAL(38,0)) AS sy,
       |    sum((x * y)::DECIMAL(38,0)) AS sxy,
       |    sum((x * x)::DECIMAL(38,0)) AS sxx,
       |    sum((y * y)::DECIMAL(38,0)) AS syy
       |  FROM ck),
       |fit AS (
       |  SELECT
       |    round((1000000 * (n * sxy - sx * sy))::DOUBLE
       |      / (n * sxx - sx * sx)::DOUBLE)::BIGINT AS beta_micro,
       |    round((sy::DOUBLE - ((n * sxy - sx * sy)::DOUBLE
       |        / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE)
       |      / n::DOUBLE)::BIGINT AS lnk_micro,
       |    (CASE WHEN n * syy - sy * sy = 0 THEN 1000 ELSE
       |      floor(1000.0 * ((n * sxy - sx * sy)::DOUBLE
       |          * (n * sxy - sx * sy)::DOUBLE)
       |        / ((n * sxx - sx * sx)::DOUBLE
       |           * (n * syy - sy * sy)::DOUBLE)) END)::BIGINT AS r2_pm
       |  FROM m)
       |SELECT ckpt, n_docs, cum_tokens, cum_vocab, beta_micro, lnk_micro, r2_pm
       |FROM ck CROSS JOIN fit ORDER BY ckpt""".stripMargin

  // ---- q153: C4-style line-level filtering audit ----------------------

  /** Words per synthesized line. */
  val C4LineW = 7
  /** Minimum words for a line to survive (C4 uses 3 on sentences; 5
    * here so the last-chunk shortfall genuinely exercises the rule). */
  val C4MinWords = 5

  /** The C4 cleaning recipe's LINE stage (Raffel et al. 2020, §2.2) as
    * a corpus operator: keep a line only if it ends in terminal
    * punctuation, has ≥ [[C4MinWords]] words, and carries no
    * boilerplate marker ("javascript"/"cookie" — the curly-brace and
    * policy rules ride the same predicate); drop the ENTIRE document
    * when any line contains "lorem ipsum". The synthetic salad has no
    * lines, so — the q79/q80 convention — the dirt is injected
    * deterministically in-pipeline with the IDENTICAL construction in
    * the oracle: docs chunk into [[C4LineW]]-word lines; line class
    * `(doc_id·31 + li) mod 17` = 0 becomes a javascript/cookie
    * boilerplate line, = 1 becomes a lorem-ipsum line (dooming its
    * doc), and surviving lines get a terminal '.' only when
    * `(doc_id + li) mod 3 ≠ 0` — so every rule provably fires, and the
    * audit gates the kept CONTENT (per-line x31 checksum), not just
    * counts. Rules classify each line into exactly one bucket in
    * priority order (banned → no-punct → short → kept), so the class
    * counts partition lines_in.
    *
    * Scale shape: the lorem doc-flag is a per-row array fold (no
    * shuffle, no self-join); one explode → one per-source aggregation;
    * text reaches the shuffle only as the per-source rollup. */
  def c4LineFilter(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Hashing
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        split(trim(col("text")), "\\s+").as("w"))
      .withColumn("nl", expr(s"(size(w) - 1) div $C4LineW + 1"))
      .withColumn("lorem",
        expr("exists(sequence(0, nl - 1), li -> pmod(doc_id * 31 + li, 17) = 1)"))
    val lines = d
      .withColumn("li", explode(expr("sequence(0, nl - 1)")))
      .withColumn("chunk",
        expr(s"concat_ws(' ', slice(w, li * $C4LineW + 1, $C4LineW))"))
      .withColumn("h", pmod(col("doc_id") * 31 + col("li"), lit(17)))
      .withColumn("line",
        when(col("h") === 0,
          lit("click here to enable javascript and cookies in your browser."))
        .when(col("h") === 1, lit("lorem ipsum dolor sit amet consectetur."))
        .otherwise(when(pmod(col("doc_id") + col("li"), lit(3)) =!= 0,
          concat(col("chunk"), lit("."))).otherwise(col("chunk"))))
      .withColumn("banned",
        col("line").contains("javascript") || col("line").contains("cookie"))
      .withColumn("punct", expr("right(line, 1) in ('.', '!', '?')"))
      .withColumn("nwords", size(split(col("line"), " ")))
    val kept = !col("lorem") && !col("banned") && col("punct") &&
      col("nwords") >= C4MinWords
    lines.groupBy("source").agg(
        countDistinct(col("doc_id")).as("docs_in"),
        countDistinct(when(col("lorem"), col("doc_id"))).as("docs_dropped_lorem"),
        sum(when(!col("lorem"), 1L).otherwise(0L)).as("lines_in"),
        sum(when(!col("lorem") && col("banned"), 1L).otherwise(0L))
          .as("lines_banned"),
        sum(when(!col("lorem") && !col("banned") && !col("punct"), 1L)
          .otherwise(0L)).as("lines_nopunct"),
        sum(when(!col("lorem") && !col("banned") && col("punct") &&
          col("nwords") < C4MinWords, 1L).otherwise(0L)).as("lines_short"),
        sum(when(kept, 1L).otherwise(0L)).as("lines_kept"),
        sum(when(kept, length(col("line")).cast("long")).otherwise(0L))
          .as("kept_chars"),
        sum(when(kept, Hashing.x31(concat(col("line"), lit(":"),
          col("doc_id").cast("string")))).otherwise(0L)).as("kept_checksum"))
      .orderBy("source")
  }

  val c4LineFilterSql: String = {
    import graft.text.Hashing
    s"""WITH d AS (
       |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |d2 AS (
       |  SELECT doc_id, source, w, ((len(w) - 1) // $C4LineW + 1) AS nl,
       |    list_sum(list_transform(generate_series(0, ((len(w) - 1) // $C4LineW + 1) - 1,
       |      1), li -> CASE WHEN (doc_id * 31 + li) % 17 = 1 THEN 1 ELSE 0 END)) > 0
       |      AS lorem
       |  FROM d),
       |ln AS (
       |  SELECT doc_id, source, lorem, u.li AS li,
       |    (doc_id * 31 + li) % 17 AS h,
       |    array_to_string(w[(li * $C4LineW + 1):(li * $C4LineW + $C4LineW)], ' ')
       |      AS chunk
       |  FROM d2, unnest(generate_series(0, nl - 1, 1)) AS u(li)),
       |l2 AS (
       |  SELECT doc_id, source, lorem,
       |    CASE WHEN h = 0
       |      THEN 'click here to enable javascript and cookies in your browser.'
       |    WHEN h = 1 THEN 'lorem ipsum dolor sit amet consectetur.'
       |    WHEN (doc_id + li) % 3 <> 0 THEN chunk || '.'
       |    ELSE chunk END AS line
       |  FROM ln),
       |l3 AS (
       |  SELECT doc_id, source, lorem, line,
       |    (line LIKE '%javascript%' OR line LIKE '%cookie%') AS banned,
       |    right(line, 1) IN ('.', '!', '?') AS punct,
       |    len(string_split(line, ' ')) AS nwords
       |  FROM l2)
       |SELECT source,
       |  count(DISTINCT doc_id)::BIGINT AS docs_in,
       |  count(DISTINCT CASE WHEN lorem THEN doc_id END)::BIGINT
       |    AS docs_dropped_lorem,
       |  sum(CASE WHEN NOT lorem THEN 1 ELSE 0 END)::BIGINT AS lines_in,
       |  sum(CASE WHEN NOT lorem AND banned THEN 1 ELSE 0 END)::BIGINT
       |    AS lines_banned,
       |  sum(CASE WHEN NOT lorem AND NOT banned AND NOT punct THEN 1 ELSE 0 END
       |    )::BIGINT AS lines_nopunct,
       |  sum(CASE WHEN NOT lorem AND NOT banned AND punct AND nwords < $C4MinWords
       |    THEN 1 ELSE 0 END)::BIGINT AS lines_short,
       |  sum(CASE WHEN NOT lorem AND NOT banned AND punct AND nwords >= $C4MinWords
       |    THEN 1 ELSE 0 END)::BIGINT AS lines_kept,
       |  sum(CASE WHEN NOT lorem AND NOT banned AND punct AND nwords >= $C4MinWords
       |    THEN length(line) ELSE 0 END)::BIGINT AS kept_chars,
       |  sum(CASE WHEN NOT lorem AND NOT banned AND punct AND nwords >= $C4MinWords
       |    THEN ${Hashing.x31Sql("line || ':' || doc_id::VARCHAR")} ELSE 0 END
       |    )::BIGINT AS kept_checksum
       |FROM l3 GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- q155: Unicode NFC normalization audit --------------------------

  /** The canonicalization pass every multilingual ingestion pipeline
    * runs before content hashing: "é" and "e"+COMBINING ACUTE are
    * byte-distinct but render identically, so an un-normalized corpus
    * silently misses exact duplicates (q09) and splits vocabulary
    * (q127) — NFC (UAX #15) composes them. Spark has no normalization
    * builtin; [[graft.functions.Unicode]] adds it as a native codegen
    * expression (an ASCII fast path + `Normalizer.isNormalized` keep
    * the common case allocation-free). The ASCII fixture gets the
    * q79/q80 deterministic dirt: docs `doc_id % 4 = 0` decompose every
    * 'a' into a + U+0301 (NOT in NFC), docs `% 4 = 1` swap 'e' for
    * precomposed 'é' (already NFC — the negative control proving the
    * detector doesn't fire on mere non-ASCII). The per-source report
    * carries doc counts, char counts before/after (each combining pair
    * composes to one code point), and an x31 checksum of the
    * NORMALIZED text — which hash-gates that JVM `Normalizer` NFC and
    * DuckDB's utf8proc NFC agree byte-for-byte on the fixture.
    *
    * Scale shape: pure per-row projection + one per-source aggregate;
    * nothing shuffles but the rollup. */
  def nfcAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Unicode
    import graft.text.Hashing
    val dirty = when(pmod(col("doc_id"), lit(4)) === 0,
        expr("replace(text, 'a', 'á')")) // a + U+0301 (decomposed)
      .when(pmod(col("doc_id"), lit(4)) === 1,
        expr("replace(text, 'e', 'é')")) // U+00E9 (precomposed, already NFC)
      .otherwise(col("text"))
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), dirty.as("t"))
      .withColumn("n", Unicode.nfc_normalize(col("t")))
    d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n") =!= col("t"), 1L).otherwise(0L)).as("n_nonnfc"),
        sum(length(col("t")).cast("long")).as("chars_raw"),
        sum(length(col("n")).cast("long")).as("chars_nfc"),
        sum(Hashing.x31(concat(col("n"), lit(":"),
          col("doc_id").cast("string")))).as("nfc_checksum"))
      .orderBy("source")
  }

  val nfcAuditSql: String = {
    import graft.text.Hashing
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 4 = 0 THEN replace(text, 'a', 'a' || chr(769))
       |         WHEN doc_id % 4 = 1 THEN replace(text, 'e', chr(233))
       |         ELSE text END AS t
       |  FROM documents),
       |n AS (SELECT doc_id, source, t, nfc_normalize(t) AS n FROM d)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN n <> t THEN 1 ELSE 0 END)::BIGINT AS n_nonnfc,
       |  sum(length(t))::BIGINT AS chars_raw,
       |  sum(length(n))::BIGINT AS chars_nfc,
       |  sum(${Hashing.x31Sql("n || ':' || doc_id::VARCHAR")})::BIGINT
       |    AS nfc_checksum
       |FROM n GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- q158: source-mix diversity indices -----------------------------

  /** The mix-health numbers a dataset card (q140) and mix planner
    * (q131) publish alongside raw shares — how CONCENTRATED is the
    * corpus across source feeds: Shannon entropy (in integer
    * micronats, quantized per source row — each term is ONE
    * fixed-shape double expression, q100's discipline), the effective
    * source count exp(H) (the "how many equal-size feeds is this
    * equivalent to" number, per-mille), the Simpson/Herfindahl
    * concentration index Σp² (nano units), and the Gini coefficient of
    * the share distribution via the exact integer rank formula
    * Σ(2i−n−1)·tᵢ / (n·Σt) on the (tokens, source) total order.
    *
    * Scale shape: ONE corpus scan collapses to the per-source token
    * table (map-side combined); every index is arithmetic over that
    * |sources|-row table (bounded by the feed catalog, not the
    * corpus) — the rank window spans |sources| rows. */
  def mixDiversity(spark: SparkSession, dir: String): DataFrame = {
    val per = table(spark, dir, "documents")
      .select(col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("t"))
    val tot = per.agg(sum("t").as("tt"), count(lit(1)).as("ns"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("t", "source")
    per.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(w).cast("long"))
      .agg(
        min(col("ns")).as("n_sources"),
        min(col("tt")).as("total_tokens"),
        sum(expr("cast(round(1000000 * ((cast(t as double) / cast(tt as double))" +
          " * ln(cast(tt as double) / cast(t as double)))) as long)"))
          .as("h_micronats"),
        sum(expr("cast(round(1000000000 * ((cast(t as double) / cast(tt as double))" +
          " * (cast(t as double) / cast(tt as double)))) as long)"))
          .as("simpson_nano"),
        sum((lit(2) * col("i") - col("ns") - 1) * col("t")).as("gini_num"))
      .select(col("n_sources"), col("total_tokens"), col("h_micronats"),
        expr("cast(round(1000 * exp(cast(h_micronats as double) / 1e6)) as long)")
          .as("eff_sources_pm"),
        col("simpson_nano"),
        expr("(1000 * gini_num) div (n_sources * total_tokens)").as("gini_pm"))
  }

  val mixDiversitySql: String =
    s"""WITH per AS (
       |  SELECT source,
       |    sum(len(string_split_regex(lower(trim(text)), '\\s+')))::BIGINT AS t
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(t)::BIGINT AS tt, count(*)::BIGINT AS ns FROM per),
       |r AS (
       |  SELECT t, tt, ns,
       |    row_number() OVER (ORDER BY t, source)::BIGINT AS i
       |  FROM per CROSS JOIN tot),
       |a AS (
       |  SELECT min(ns)::BIGINT AS n_sources, min(tt)::BIGINT AS total_tokens,
       |    sum(round(1000000 * ((t::DOUBLE / tt::DOUBLE)
       |      * ln(tt::DOUBLE / t::DOUBLE))))::BIGINT AS h_micronats,
       |    sum(round(1000000000 * ((t::DOUBLE / tt::DOUBLE)
       |      * (t::DOUBLE / tt::DOUBLE))))::BIGINT AS simpson_nano,
       |    sum((2 * i - ns - 1) * t)::BIGINT AS gini_num
       |  FROM r)
       |SELECT n_sources, total_tokens, h_micronats,
       |  round(1000 * exp(h_micronats::DOUBLE / 1e6))::BIGINT AS eff_sources_pm,
       |  simpson_nano,
       |  ((1000 * gini_num) // (n_sources * total_tokens))::BIGINT AS gini_pm
       |FROM a""".stripMargin

  // ---- q169: nucleus vocabulary coverage ------------------------------

  /** Coverage target in per-mille (the "top-p nucleus" of the
    * frequency distribution). */
  val NucleusPm = 900L

  /** How CONCENTRATED is each language's token mass — the
    * tokenizer-design companion to q127's OOV audit: rank each
    * language's words by frequency and report how many words cover
    * [[NucleusPm]]‰ of its tokens (the nucleus), plus the top-10
    * words' share. A language whose nucleus is tiny tokenizes cheaply;
    * one with a fat tail needs subword coverage. Exact integers
    * throughout: a rank is inside the nucleus iff the mass BEFORE it
    * is short of the target (`10·(cum − cnt) < 9·T`), so the count of
    * such ranks is the exact minimal nucleus size.
    *
    * Scale shape: one corpus word count (map-side combined) →
    * vocab-sized (lang, word) table; ranking windows span each
    * language's vocabulary, bounded by the dictionary, not the
    * corpus. */
  def nucleusCoverage(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("c").desc, col("word"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    val counts = table(spark, dir, "documents")
      .select(col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("c"))
    counts
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum("c").over(w))
      .withColumn("tot", sum("c").over(wAll))
      .groupBy("lang").agg(
        count(lit(1)).as("vocab_size"),
        min(col("tot")).as("tokens"),
        // rank is inside the minimal nucleus iff the mass BEFORE it is
        // short of the 90% target: 10·(cum − c) < 9·tot
        sum(when(lit(10) * (col("cum") - col("c")) < lit(9) * col("tot"), 1L)
          .otherwise(0L)).as("n_words_p90"),
        sum(when(col("rk") <= 10, col("c")).otherwise(0L)).as("top10_tokens"))
      .withColumn("top10_share_pm", expr("(1000 * top10_tokens) div tokens"))
      .select("lang", "vocab_size", "tokens", "n_words_p90", "top10_share_pm")
      .orderBy("lang")
  }

  val nucleusCoverageSql: String =
    s"""WITH c AS (
       |  SELECT lang, word, count(*)::BIGINT AS c
       |  FROM (SELECT lang,
       |          unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
       |        FROM documents)
       |  GROUP BY lang, word),
       |r AS (
       |  SELECT lang, c,
       |    row_number() OVER (PARTITION BY lang ORDER BY c DESC, word) AS rk,
       |    sum(c) OVER (PARTITION BY lang ORDER BY c DESC, word
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(c) OVER (PARTITION BY lang) AS tot
       |  FROM c)
       |SELECT lang, count(*)::BIGINT AS vocab_size, min(tot)::BIGINT AS tokens,
       |  sum(CASE WHEN 10 * (cum - c) < 9 * tot THEN 1 ELSE 0 END)::BIGINT
       |    AS n_words_p90,
       |  ((1000 * sum(CASE WHEN rk <= 10 THEN c ELSE 0 END)) // min(tot))::BIGINT
       |    AS top10_share_pm
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin

  // ---- q170: score-calibration audit (reliability bins + ECE) ---------

  /** The reliability-diagram / Expected-Calibration-Error audit every
    * quality-classifier deployment runs — "when the scorer says 700‰,
    * is the label true 70% of the time?": the deterministic scorer
    * here is the stopword-mass signal (English stopwords predict
    * lang = 'en' — q15's heuristic family), binned into ten fixed-width
    * score bins; per bin the mean claimed score and the empirical
    * positive rate, and globally ECE = Σ nᵦ·|gap| / N — ALL exact
    * integer per-mille (score = 1000·n_stop div n_tok per doc; no
    * float ever crosses the engine boundary).
    *
    * Scale shape: one token explode → per-doc (n_tok, n_stop)
    * aggregate → 10-bin rollup; the ECE total broadcasts back as a
    * 1-row cross join. */
  def calibrationAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextStats
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
    val docs = toks.groupBy("doc_id", "lang").agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("word").isInCollection(TextStats.stopwords), 1L)
          .otherwise(0L)).as("n_stop"))
      .withColumn("score_pm", expr("(1000 * n_stop) div n_tok"))
      .withColumn("bin", least(lit(9L), expr("score_pm div 100")))
      .withColumn("pos", when(col("lang") === "en", 1L).otherwise(0L))
    val bins = docs.groupBy("bin").agg(
        count(lit(1)).as("n_docs"),
        expr("sum(score_pm) div count(1)").as("mean_score_pm"),
        expr("(1000 * sum(pos)) div count(1)").as("pos_rate_pm"))
      .withColumn("gap_pm", abs(col("mean_score_pm") - col("pos_rate_pm")))
    val ece = bins.agg(
      expr("sum(n_docs * gap_pm) div sum(n_docs)").as("ece_pm"))
    bins.crossJoin(broadcast(ece))
      .select("bin", "n_docs", "mean_score_pm", "pos_rate_pm", "gap_pm",
        "ece_pm")
      .orderBy("bin")
  }

  val calibrationAuditSql: String = {
    import graft.text.TextStats
    val stop = TextStats.stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, lang, count(*)::BIGINT AS n_tok,
       |    sum(CASE WHEN word IN ($stop) THEN 1 ELSE 0 END)::BIGINT AS n_stop
       |  FROM t GROUP BY doc_id, lang),
       |s AS (
       |  SELECT least(9, ((1000 * n_stop) // n_tok) // 100)::BIGINT AS bin,
       |    ((1000 * n_stop) // n_tok)::BIGINT AS score_pm,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM d),
       |b AS (
       |  SELECT bin, count(*)::BIGINT AS n_docs,
       |    (sum(score_pm) // count(*))::BIGINT AS mean_score_pm,
       |    ((1000 * sum(pos)) // count(*))::BIGINT AS pos_rate_pm
       |  FROM s GROUP BY bin),
       |g AS (
       |  SELECT bin, n_docs, mean_score_pm, pos_rate_pm,
       |    abs(mean_score_pm - pos_rate_pm)::BIGINT AS gap_pm
       |  FROM b),
       |e AS (
       |  SELECT (sum(n_docs * gap_pm) // sum(n_docs))::BIGINT AS ece_pm FROM g)
       |SELECT bin, n_docs, mean_score_pm, pos_rate_pm, gap_pm, e.ece_pm
       |FROM g CROSS JOIN e ORDER BY bin""".stripMargin
  }

  // ---- q251: Brier score decomposition -----------------------------------

  /** The proper-scoring-rule view of q170's calibration question —
    * Murphy's decomposition `BS = REL − RES + UNC` of the Brier score
    * of the stopword-ratio score as a forecast of lang = en (q170's
    * exact signal): RELIABILITY is miscalibration (lower better),
    * RESOLUTION is discrimination (higher better), UNCERTAINTY the
    * irreducible base-rate term — ECE alone can't separate "useless
    * but calibrated" from "sharp but biased"; this can.
    *
    * Bins are the DISTINCT per-mille scores (value-grouped, ≤ 1001
    * cells — the q248 shape), which is the regime where Murphy's
    * identity is exact; the only quantization is the documented
    * per-bin event rate `o_pm = (1000·k) div n` and the final `div N`
    * — the emitted `decomposition_gap_micro` carries the exact
    * leftover so the identity is auditable rather than asserted.
    * Units: micro = per-mille². All numerators non-negative except
    * the gap (signed subtraction of floors — sign-exact).
    *
    * Scale shape: one token scan → per-doc (score, label) (map-side
    * combine), collapse to ≤ 1001 value cells, then cell-table
    * arithmetic. */
  def brierDecomposition(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.TextStats
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
    val docs = toks.groupBy("doc_id", "lang").agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("word").isInCollection(TextStats.stopwords), 1L)
          .otherwise(0L)).as("n_stop"))
      .select(expr("(1000 * n_stop) div n_tok").as("f"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val cells = docs.groupBy("f")
      .agg(count(lit(1)).as("n"), sum("pos").as("k"))
      .withColumn("o_pm", expr("(1000 * k) div n"))
    val tot = cells.agg(sum("n").as("nn"), sum("k").as("kk"))
      .withColumn("obar_pm", expr("(1000 * kk) div nn"))
    cells.crossJoin(broadcast(tot))
      .agg(
        first(col("nn")).as("n_docs"),
        first(col("obar_pm")).as("base_rate_pm"),
        expr("""sum(n * (f - o_pm) * (f - o_pm))""").as("rel_num"),
        expr("""sum(n * (o_pm - obar_pm) * (o_pm - obar_pm))""")
          .as("res_num"),
        // exact Brier: Σ over cells of k·(f−1000)² + (n−k)·f²
        expr("""sum(k * (f - 1000) * (f - 1000) + (n - k) * f * f)""")
          .as("bs_num"))
      .select(col("n_docs"), col("base_rate_pm"),
        expr("bs_num div n_docs").as("brier_micro"),
        expr("rel_num div n_docs").as("reliability_micro"),
        expr("res_num div n_docs").as("resolution_micro"),
        expr("base_rate_pm * (1000 - base_rate_pm)").as("uncertainty_micro"))
      .withColumn("decomposition_gap_micro",
        expr("""brier_micro - (reliability_micro - resolution_micro
                + uncertainty_micro)"""))
  }

  val brierDecompositionSql: String = {
    import graft.text.TextStats
    val stop = TextStats.stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, lang, count(*)::BIGINT AS n_tok,
       |    sum(CASE WHEN word IN ($stop) THEN 1 ELSE 0 END)::BIGINT AS n_stop
       |  FROM t GROUP BY doc_id, lang),
       |s AS (
       |  SELECT ((1000 * n_stop) // n_tok)::BIGINT AS f,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM d),
       |cells AS (
       |  SELECT f, count(*)::BIGINT AS n, sum(pos)::BIGINT AS k,
       |    ((1000 * sum(pos)) // count(*))::BIGINT AS o_pm
       |  FROM s GROUP BY f),
       |tot AS (
       |  SELECT sum(n)::BIGINT AS nn, sum(k)::BIGINT AS kk,
       |    ((1000 * sum(k)) // sum(n))::BIGINT AS obar_pm
       |  FROM cells),
       |agg AS (
       |  SELECT nn AS n_docs, obar_pm AS base_rate_pm,
       |    (sum(n * (f - o_pm) * (f - o_pm)) // nn)::BIGINT
       |      AS reliability_micro,
       |    (sum(n * (o_pm - obar_pm) * (o_pm - obar_pm)) // nn)::BIGINT
       |      AS resolution_micro,
       |    (sum(k * (f - 1000) * (f - 1000) + (n - k) * f * f) // nn)::BIGINT
       |      AS brier_micro,
       |    (obar_pm * (1000 - obar_pm))::BIGINT AS uncertainty_micro
       |  FROM cells, tot GROUP BY nn, obar_pm)
       |SELECT n_docs, base_rate_pm, brier_micro, reliability_micro,
       |  resolution_micro, uncertainty_micro,
       |  (brier_micro - (reliability_micro - resolution_micro
       |    + uncertainty_micro))::BIGINT AS decomposition_gap_micro
       |FROM agg""".stripMargin
  }

  // ---- q279: Burrows' Delta stylometric distance ----------------------------

  /** WHOSE VOICE is each feed writing in? — Burrows' Delta (Burrows
    * 2002), the standard stylometric distance attribution studies run
    * on function-word profiles: per source, the micro-rate of each of
    * the [[graft.text.TextStats.stopwords]] function words (content
    * words track topic; function words track STYLE — generator,
    * template, translator); per word, a z-score across sources; per
    * source pair, the mean absolute z-difference. Two feeds with
    * near-zero Delta share a writing process (same scraper template,
    * same generating model) even when their CONTENT differs — the
    * complement of q272, which sees shared content but not shared
    * style.
    *
    * Integer discipline: rates in floor micro (ppm of the source's
    * tokens, complete source×word grid so absences read 0); the
    * z-score folds the mean into one signed ratio
    * `z_milli = 1000·(G·f − Σf) div ⌊√(G·Σf² − (Σf)²)⌋` — the
    * variance radicand is ≤ G²·10¹² < 2⁵², inside the q261
    * floor-sqrt determinism bound; both engines truncate the signed
    * division identically (DivSemanticsSpec). Delta is the floor
    * milli mean of |z_a − z_b| over the fixed word list.
    *
    * Scale shape: one token scan (map-side combined counts); the grid,
    * stats, and G²·W/2 pair table are all bounded by feeds × the
    * 20-word list, never the corpus. */
  def stylometricDelta(spark: SparkSession, dir: String): DataFrame = {
    val stop = graft.text.TextStats.stopwords
    val toks = table(spark, dir, "documents")
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    val totals = toks.groupBy("source").agg(count(lit(1)).as("n"))
    val counts = toks.filter(col("w").isin(stop: _*))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val grid = totals
      .select(col("source"), col("n"),
        explode(array(stop.map(lit): _*)).as("w"))
    val f = grid.join(counts, Seq("source", "w"), "left")
      .na.fill(0L, Seq("c"))
      .select(col("source"), col("w"),
        expr("(1000000 * c) div n").as("f"))
    val stats = f.groupBy("w").agg(sum("f").as("sf"),
      sum(expr("f * f")).as("sff"), count(lit(1)).as("g"))
    val z = f.join(broadcast(stats), Seq("w"))
      .select(col("source"), col("w"),
        expr("""(1000 * (g * f - sf)) div greatest(
                cast(floor(sqrt(cast(g * sff - sf * sf as double)))
                     as bigint), 1)""").as("z"))
    val za = z.toDF("src_a", "w", "z_a")
    val zb = z.toDF("src_b", "w2", "z_b")
    za.join(zb, col("w") === col("w2") && col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(sum(abs(col("z_a") - col("z_b"))).as("zdiff_sum"),
        count(lit(1)).as("n_words"))
      .select(col("src_a"), col("src_b"), col("n_words"),
        expr("zdiff_sum div n_words").as("delta_milli"))
      .orderBy("src_a", "src_b")
  }

  val stylometricDeltaSql: String = {
    val stop = graft.text.TextStats.stopwords
    val words = stop.map(s => s"('$s')").mkString(", ")
    val inList = stop.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split_regex(lower(trim(text)),
       |    '\\s+')) AS w
       |  FROM documents),
       |totals AS (SELECT source, count(*)::BIGINT AS n FROM toks GROUP BY 1),
       |counts AS (
       |  SELECT source, w, count(*)::BIGINT AS c FROM toks
       |  WHERE w IN ($inList) GROUP BY 1, 2),
       |grid AS (
       |  SELECT t.source, t.n, v.w
       |  FROM totals t, (VALUES $words) v(w)),
       |f AS (
       |  SELECT g.source, g.w,
       |    ((1000000 * coalesce(c.c, 0)) // g.n)::BIGINT AS f
       |  FROM grid g LEFT JOIN counts c USING (source, w)),
       |stats AS (
       |  SELECT w, sum(f)::BIGINT AS sf, sum(f * f)::BIGINT AS sff,
       |    count(*)::BIGINT AS g
       |  FROM f GROUP BY 1),
       |z AS (
       |  SELECT f.source, f.w,
       |    ((1000 * (s.g * f.f - s.sf)) // greatest(
       |      floor(sqrt((s.g * s.sff - s.sf * s.sf)::DOUBLE))::BIGINT, 1)
       |     )::BIGINT AS z
       |  FROM f JOIN stats s USING (w))
       |SELECT a.source AS src_a, b.source AS src_b,
       |  count(*)::BIGINT AS n_words,
       |  (sum(abs(a.z - b.z)) // count(*))::BIGINT AS delta_milli
       |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
       |GROUP BY 1, 2
       |ORDER BY src_a, src_b""".stripMargin
  }

  // ---- q278: TextRank keyword extraction -----------------------------------

  val TextRankIterations = 3
  val TextRankTopK = 20

  /** WHICH words hold the corpus together? — TextRank (Mihalcea &
    * Tarau 2004): PageRank run over the word CO-OCCURRENCE graph
    * (adjacent-token pairs, window 2, symmetrized, self-loops dropped)
    * instead of a link graph — the unsupervised keyword extractor
    * under every "top terms" card that wants more than raw frequency
    * (a word ranks high when it neighbors OTHER well-connected words,
    * not merely when it repeats; q44's TF-IDF scores documents'
    * distinctive terms — this scores the corpus' structural ones).
    * Reuses [[graft.operators.PageRank]] verbatim — the operator is
    * key-type-agnostic, so word strings ride as node ids (a 100 TB
    * run would dictionary-encode them first, like q111 packs longs;
    * the vocabulary-sized graph here makes strings the honest
    * choice). Integer-exact per the operator contract; top-K is
    * TakeOrderedAndProject.
    *
    * Scale shape: one corpus scan → distinct co-occurrence pairs
    * (bounded by VOCABULARY², map-side combined); per-iteration
    * shuffles are vocabulary-sized, never corpus-sized. */
  def textrankKeywords(spark: SparkSession, dir: String): DataFrame = {
    val bg = graft.text.NgramLM
      .bigrams(table(spark, dir, "documents"), "doc_id", "text")
      .filter(col("w1") =!= col("w2"))
      .select("w1", "w2").distinct()
    val arcs = bg
      .select(explode(array(
        struct(col("w1").as("src"), col("w2").as("dst")),
        struct(col("w2").as("src"), col("w1").as("dst")))).as("e"))
      .select("e.src", "e.dst").distinct()
    graft.operators.PageRank.run(arcs, TextRankIterations)
      .orderBy(col("rank").desc, col("node"))
      .limit(TextRankTopK)
      .select(col("node").as("word"), col("rank"))
  }

  val textrankKeywordsSql: String = {
    import graft.operators.PageRank
    val it = (p: String) => PageRank.iterationSql(p)
    s"""WITH bg AS (
       |  SELECT DISTINCT a[i] AS w1, a[i + 1] AS w2
       |  FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') AS a
       |        FROM documents) t,
       |  unnest(generate_series(1, len(a) - 1)) AS s(i)
       |  WHERE a[i] <> a[i + 1]),
       |e0 AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT w1 AS src, w2 AS dst FROM bg
       |    UNION ALL SELECT w2, w1 FROM bg)),
       |deg AS (SELECT src, count(*)::BIGINT AS deg FROM e0 GROUP BY src),
       |e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
       |n AS (SELECT DISTINCT src AS node FROM e0),
       |r0 AS (SELECT node, ${PageRank.RankUnit}::BIGINT AS rank FROM n),
       |r1 AS (${it("r0")}),
       |r2 AS (${it("r1")}),
       |r3 AS (${it("r2")})
       |SELECT node AS word, rank FROM r3
       |ORDER BY rank DESC, word LIMIT $TextRankTopK""".stripMargin
  }

  // ---- q266: vocabulary growth curve -------------------------------------

  /** Number of equal doc-id slices the growth curve is measured over. */
  val GrowthSlices = 10L

  /** How fast does NOVELTY decay as the corpus grows? — the empirical
    * vocabulary-growth curve: ingest the corpus in ten deterministic
    * doc-id slices and count how many bigram types each slice sees
    * FIRST. q151 fits Heaps' law to the curve and q246 estimates the
    * unseen mass at the end of it; this publishes the curve itself —
    * the table a crawl planner reads to decide whether the next slice
    * of the same feed is still worth ingesting.
    *
    * Exact by construction: a bigram's first-occurrence slice is
    * `min(slice)` over its occurrences (integer), each slice's
    * new-type count an exact aggregate, the cumulative a running sum
    * over ten rows, and the novelty rate a floor per-mille of
    * new types per slice token mass.
    *
    * Scale shape: one scan → (bigram, min-slice) aggregate with
    * map-side combine (bounded by VOCABULARY, not corpus); slice
    * masses are a second scan-level aggregate; everything after runs
    * on [[GrowthSlices]] rows. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents")
    val bg = graft.text.NgramLM.bigrams(docs, "doc_id", "text")
      .select(pmod(col("doc_id"), lit(GrowthSlices)).as("slice"),
        concat(col("w1"), lit(" "), col("w2")).as("w"))
    val firstSeen = bg.groupBy("w").agg(min("slice").as("slice"))
      .groupBy("slice").agg(count(lit(1)).as("new_types"))
    val mass = bg.groupBy("slice").agg(count(lit(1)).as("slice_tokens"))
    mass.join(firstSeen, Seq("slice"), "left")
      .na.fill(0L, Seq("new_types"))
      .withColumn("cum_types",
        sum("new_types").over(Window.orderBy("slice")))
      .withColumn("novelty_pm",
        expr("(1000 * new_types) div slice_tokens"))
      .select("slice", "slice_tokens", "new_types", "cum_types",
        "novelty_pm")
      .orderBy("slice")
  }

  val vocabGrowthSql: String =
    s"""WITH bg AS (
       |  SELECT doc_id % $GrowthSlices AS slice, a[i] || ' ' || a[i + 1] AS w
       |  FROM (SELECT doc_id,
       |          string_split_regex(lower(trim(text)), '\\s+') AS a
       |        FROM documents) t,
       |  unnest(generate_series(1, len(a) - 1)) AS s(i)),
       |fs AS (
       |  SELECT slice, count(*)::BIGINT AS new_types FROM (
       |    SELECT w, min(slice) AS slice FROM bg GROUP BY w)
       |  GROUP BY slice),
       |mass AS (
       |  SELECT slice, count(*)::BIGINT AS slice_tokens
       |  FROM bg GROUP BY slice)
       |SELECT mass.slice::BIGINT AS slice, mass.slice_tokens,
       |  coalesce(fs.new_types, 0)::BIGINT AS new_types,
       |  (sum(coalesce(fs.new_types, 0)) OVER (ORDER BY mass.slice)
       |    )::BIGINT AS cum_types,
       |  ((1000 * coalesce(fs.new_types, 0)) // mass.slice_tokens)::BIGINT
       |    AS novelty_pm
       |FROM mass LEFT JOIN fs USING (slice)
       |ORDER BY slice""".stripMargin

  // ---- q246: Good-Turing frequency spectrum ------------------------------

  /** Highest raw count reported in the frequency-of-frequencies
    * spectrum (the Good-Turing correction only matters at small r). */
  val GtMaxR = 10L

  /** How much probability mass belongs to n-grams the corpus has
    * NEVER seen? — the Good-Turing answer every smoothing scheme
    * (Katz, Kneser-Ney's ancestor) is built on: the unseen mass is
    * the singleton share `p₀ = N₁/N`, and each small count r is
    * discounted to `r* = (r+1)·N_{r+1}/N_r`. Computed over word
    * BIGRAMS (the [[graft.text.NgramLM]] event space — this IS the
    * smoothing input of the q100 bigram LM): the synthetic corpus has
    * a closed unigram vocabulary where every word repeats, but the
    * bigram spectrum keeps the rare tail Good-Turing reads. q135 fits
    * the Zipf SLOPE of the spectrum's head; this reads its TAIL — the
    * r ≤ [[GtMaxR]] frequency-of-frequencies that decide how much of
    * the next crawl slice will be novel.
    *
    * Pure integer arithmetic end to end: N_r are counts, event mass
    * r·N_r a product, the discounted count a floor milli ratio and
    * the unseen mass a floor per-mille ratio (numerators always
    * non-negative — no signed-division caveat). `N_{r+1}` is an
    * equi-join on r+1 (NOT a lead() over the present rows — absent
    * spectrum rows must read as zero).
    *
    * Scale shape: one scan explodes bigrams into an (event, count)
    * aggregate with map-side combine — the only corpus-sized stage;
    * the spectrum groupBy collapses V events to ≤ max(r) rows and
    * everything after is arithmetic over ≤ [[GtMaxR]] rows with two
    * broadcast scalars. */
  def goodTuring(spark: SparkSession, dir: String): DataFrame = {
    val fof = graft.text.NgramLM
      .bigrams(table(spark, dir, "documents"), "doc_id", "text")
      .select(concat(col("w1"), lit(" "), col("w2")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("r"))
      .groupBy("r").agg(count(lit(1)).as("n_r"))
    val tot = fof.agg(
      sum(col("r") * col("n_r")).as("n_total"),
      sum(when(col("r") === 1L, col("n_r")).otherwise(0L)).as("n1"))
    val nxt = fof.select((col("r") - 1L).as("r"), col("n_r").as("n_r1"))
    fof.filter(col("r") <= GtMaxR)
      .join(nxt, Seq("r"), "left").na.fill(0L, Seq("n_r1"))
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        (col("r") * col("n_r")).as("token_mass"),
        expr("(1000 * (r + 1) * n_r1) div n_r").as("r_star_milli"),
        expr("(1000 * n1) div n_total").as("p0_permille"))
      .orderBy("r")
  }

  val goodTuringSql: String =
    s"""WITH toks AS (
       |  SELECT a[i] || ' ' || a[i + 1] AS w
       |  FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') AS a
       |        FROM documents) t,
       |  unnest(generate_series(1, len(a) - 1)) AS s(i)),
       |tc AS (SELECT w, count(*)::BIGINT AS r FROM toks GROUP BY 1),
       |fof AS (SELECT r, count(*)::BIGINT AS n_r FROM tc GROUP BY 1),
       |tot AS (
       |  SELECT sum(r * n_r)::BIGINT AS n_total,
       |    sum(CASE WHEN r = 1 THEN n_r ELSE 0 END)::BIGINT AS n1
       |  FROM fof)
       |SELECT f.r, f.n_r, (f.r * f.n_r)::BIGINT AS token_mass,
       |  ((1000 * (f.r + 1) * coalesce(g.n_r, 0)) // f.n_r)::BIGINT
       |    AS r_star_milli,
       |  ((1000 * n1) // n_total)::BIGINT AS p0_permille
       |FROM fof f LEFT JOIN fof g ON g.r = f.r + 1, tot
       |WHERE f.r <= $GtMaxR ORDER BY f.r""".stripMargin

  // ---- q247: readability audit -------------------------------------------

  /** Reading-level profile per source — Flesch reading ease and
    * Flesch-Kincaid grade, the curation signal q14's surface ratios
    * (length, punctuation, stopwords) do not capture: two corpora with
    * identical lengths read very differently when one is all
    * polysyllables. Syllables are the standard heuristic (maximal
    * vowel-group runs, `[aeiouy]+`); the corpus carries no sentence
    * punctuation, so the DOCUMENT is the sentence unit (documented
    * convention — both formulas degrade gracefully: words/doc replaces
    * words/sentence).
    *
    * Exactness discipline: words, syllables, and docs are integer
    * counts; both published formulas are affine in two ratios, so each
    * ratio is quantized ONCE by floor milli-division and the formula
    * evaluated on the quantized terms — `FK·1000 = 390·(1000·W div
    * 1000·S)…` rearranged as `(390·W) div S + (11800·Y) div W − 15590`
    * (all divisions of non-negatives; the SUBTRACTION may go negative,
    * which is sign-exact). Identical expression trees in both engines.
    *
    * Scale shape: one scan, two `regexp_extract_all` counts + the
    * token-length count per row inside codegen, then a G-row
    * per-source aggregate — nothing leaves the scan un-reduced. */
  def readabilityAudit(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("w"),
        expr("cast(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) as long)")
          .as("y"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
        sum("y").as("syllables"))
      .select(col("source"), col("n_docs"), col("words"), col("syllables"),
        expr("(1000 * words) div n_docs").as("words_per_doc_milli"),
        expr("(1000 * syllables) div words").as("syllables_per_word_milli"),
        expr("(390 * words) div n_docs + (11800 * syllables) div words - 15590")
          .as("fk_grade_milli"),
        expr("206835 - (1015 * words) div n_docs - (84600 * syllables) div words")
          .as("flesch_milli"))
      .orderBy("source")

  val readabilityAuditSql: String =
    s"""WITH d AS (
       |  SELECT source,
       |    len(string_split_regex(lower(trim(text)), '\\s+'))::BIGINT AS w,
       |    len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS y
       |  FROM documents),
       |g AS (
       |  SELECT source, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS words,
       |    sum(y)::BIGINT AS syllables
       |  FROM d GROUP BY 1)
       |SELECT source, n_docs, words, syllables,
       |  ((1000 * words) // n_docs)::BIGINT AS words_per_doc_milli,
       |  ((1000 * syllables) // words)::BIGINT AS syllables_per_word_milli,
       |  ((390 * words) // n_docs + (11800 * syllables) // words - 15590
       |    )::BIGINT AS fk_grade_milli,
       |  (206835 - (1015 * words) // n_docs - (84600 * syllables) // words
       |    )::BIGINT AS flesch_milli
       |FROM g ORDER BY source""".stripMargin
}

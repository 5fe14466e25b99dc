package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprint SELECTION (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03 — the MOSS algorithm): from every window of `w`
  * consecutive k-gram hashes, keep the minimal one (rightmost on
  * ties), giving a deterministic ~`2/(w+1)` subsample of positions
  * with the COVERAGE GUARANTEE q16's unselected rolling hashes lack:
  * any shared token run of length ≥ `w + k − 1` between two documents
  * shares at least one SELECTED fingerprint hash, so matching on the
  * winnowed sets — a fraction of the gram table — can never miss a
  * long enough clone.
  *
  * The (hash, rightmost-tie) choice is encoded in one integer key so
  * both engines order identically with plain `min`:
  * `v = (h60(gram) mod 2⁴⁰)·2²⁰ + (2²⁰−1−p)` — smaller hash wins,
  * equal hashes fall to the larger position. Positions must fit 20
  * bits (1M grams/doc; a 100 TB pipeline shards longer docs upstream,
  * same bound the reference's per-doc operators assume).
  *
  * Scale shape: the gram explode is the q101/q220 narrow-row pattern;
  * the per-doc sliding `min` is ONE `doc_id` shuffle + sort with an
  * O(1)-per-row frame, and everything downstream of the `distinct`
  * operates on the winnowed ~2/(w+1) subsample only.
  */
object Winnowing {

  /** 2²⁰ — position field width. */
  val PosField: Long = 1L << 20

  /** 2⁴⁰ — hash field modulus. */
  val HashField: Long = 1L << 40

  /** Selected fingerprints `(idCol, m)` — `m = h40·2²⁰ + (2²⁰−1−p)`,
    * distinct per document; `m div 2²⁰` recovers the hash, position
    * `p = 2²⁰−1−(m mod 2²⁰)`. Documents with fewer than `w` grams
    * (fewer than `w+k−1` tokens) select nothing. */
  def selected(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    val grams = docs
      .select(col(idCol), NgramLM.tokens(col(textCol)).as("a"))
      .filter(size(col("a")) >= k)
      .select(col(idCol), (size(col("a")) - (k - 1)).as("n_grams"),
        explode(expr(
          s"transform(sequence(1, size(a) - ${k - 1}), i -> named_struct(" +
            s"'p', i, 'g', array_join(slice(a, i, $k), ' ')))")).as("o"))
      .select(col(idCol), col("n_grams"), col("o.p").as("p"),
        ((Hashing.h60(col("o.g")) % HashField) * PosField +
          (lit(PosField - 1) - col("o.p"))).as("v"))
    val frame = Window.partitionBy(idCol).orderBy("p").rowsBetween(0, w - 1)
    grams
      .withColumn("m", min(col("v")).over(frame))
      .filter(col("p") <= col("n_grams") - (w - 1))
      .select(col(idCol), col("m"))
      .distinct()
  }

  /** SQL twin of [[selected]] as a CTE body over table `tbl`:
    * yields rows `(id, m)`. */
  def selectedSql(tbl: String, idCol: String, textCol: String,
      k: Int, w: Int): String =
    s"""SELECT DISTINCT $idCol, m FROM (
       |  SELECT $idCol, n_grams, p, min(v) OVER (
       |      PARTITION BY $idCol ORDER BY p
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS m
       |  FROM (
       |    SELECT $idCol, len(a) - ${k - 1} AS n_grams, i AS p,
       |      (${Hashing.h60Sql(s"array_to_string(a[i:i+${k - 1}], ' ')")}
       |        % $HashField) * $PosField + ($PosField - 1 - i) AS v
       |    FROM (SELECT $idCol,
       |            string_split_regex(lower(trim($textCol)), '\\s+') AS a
       |          FROM $tbl) tk,
       |      LATERAL (SELECT unnest(generate_series(1, len(a) - ${k - 1}))
       |               AS i) u
       |    WHERE len(a) >= $k) vals) wins
       |WHERE p <= n_grams - ${w - 1}""".stripMargin
}

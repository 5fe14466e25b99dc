package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing primitives.
  *
  * Every dedup/fingerprint operator needs hash values that are
  * bit-identical in Spark and in the DuckDB oracle. `xxhash64`/`hash`
  * are Spark-private, and DuckDB's `hash` is DuckDB-private, so we build
  * on the one function both engines share: `md5` over UTF-8 strings.
  *
  *  - [[h60]]: first 15 hex chars of md5 → non-negative 60-bit long.
  *  - [[x31]]: h60 reduced mod the Mersenne prime 2^31-1; safe operand
  *    for 64-bit affine hashing without overflow ((2^31)·(2^31) < 2^63).
  *  - [[minhashCoeffs]]: 32 fixed affine coefficient pairs (a, b); the
  *    i-th MinHash function is `(a_i·x31 + b_i) mod (2^31-1)`.
  *
  * Each primitive has a Spark [[Column]] form and a SQL-text form used
  * to *generate* the DuckDB oracle from the same constants, so the two
  * engines cannot drift.
  */
object Hashing {

  /** Mersenne prime 2^31 - 1. */
  val P31: Long = 2147483647L

  /** 32 deterministic affine coefficients (a in [1, 2^31), b in [0, 2^31)).
    * scala.util.Random is a spec-fixed LCG: same seed → same constants in
    * every JVM, and the SQL oracle is generated from this very list. */
  val minhashCoeffs: IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(20260812L)
    IndexedSeq.fill(32)(
      (rnd.nextInt(Int.MaxValue - 1).toLong + 1L, rnd.nextInt(Int.MaxValue).toLong))
  }

  // ---- 60-bit md5-prefix hash ----------------------------------------

  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def h60Sql(e: String): String =
    s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  // ---- 31-bit reduction ----------------------------------------------

  def x31(c: Column): Column = h60(c) % P31

  def x31Sql(e: String): String = s"(${h60Sql(e)} % $P31)"

  /** Driver-side scalar twin of [[x31]] — bit-identical to the Column
    * and SQL forms (md5 hex, first 15 chars, mod P31). Used to derive
    * deterministic cross-engine constants (e.g. LSH hyperplane
    * components) that both the Scala operator and the generated
    * oracle recompute from the same strings. */
  def x31Jvm(s: String): Long = h60Jvm(s) % P31

  /** Driver-side scalar twin of [[h60]] (md5 hex, first 15 chars). */
  def h60Jvm(s: String): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  // ---- affine MinHash functions --------------------------------------

  /** i-th MinHash function applied to an x31 value. */
  def affine(i: Int, x: Column): Column = {
    val (a, b) = minhashCoeffs(i)
    (lit(a) * x + lit(b)) % P31
  }

  def affineSql(i: Int, xExpr: String): String = {
    val (a, b) = minhashCoeffs(i)
    s"(($a * $xExpr + $b) % $P31)"
  }

  // ---- word shingles --------------------------------------------------

  /** Distinct word k-shingles of a text column (k consecutive
    * whitespace-separated tokens joined by one space). Empty array for
    * texts with fewer than k tokens. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val sh = transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))
    array_distinct(when(size(toks) >= k, sh).otherwise(array()))
  }

  /** DuckDB list-comprehension mirror of [[wordShingles]] (1-based);
    * `listVar` names a column already holding the token list. */
  def wordShinglesSql(listVar: String, k: Int): String = {
    val parts = (0 until k).map(j => s"$listVar[i + $j]").mkString(" || ' ' || ")
    s"list_distinct([$parts for i in range(1, len($listVar) - ${k - 2})])"
  }

  /** Distinct character n-grams of a string column. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n))))
      .otherwise(array()))

  def charNgramsSql(textExpr: String, n: Int): String =
    s"list_distinct([substring($textExpr, i, $n) for i in range(1, length($textExpr) - ${n - 2})])"
}

package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextStatsSpec extends SparkSpec {

  private def one(text: String) = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text")
  }

  test("token counting") {
    val r = one("hello  world foo").select(
      TextStats.nTokens(col("text")).as("n"),
      TextStats.nSubwordTokens(col("text")).as("sub")).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("sub") == 3L)
    assert(one("").select(TextStats.nTokens(col("text"))).head().getLong(0) == 0L)
    // BPE-ish: word pieces + digit runs + punctuation each count
    val sub = one("don't run2 fast!").select(
      TextStats.nSubwordTokens(col("text"))).head().getLong(0)
    // don | ' | t | run | 2 | fast | !
    assert(sub == 7L)
  }

  test("ratios and quality are in range") {
    val r = one("the cat sat on the mat").select(
      round(TextStats.stopwordRatio(col("text")), 6).as("stop"),
      round(TextStats.alnumRatio(col("text")), 6).as("alnum"),
      round(TextStats.meanTokenLen(col("text")), 6).as("mtl"),
      TextStats.qualityScore(col("text")).as("q")).head()
    // the, on, the are stopwords -> 3/6
    assert(r.getAs[Double]("stop") == 0.5)
    assert(math.abs(r.getAs[Double]("mtl") - (3 + 3 + 3 + 2 + 3 + 3) / 6.0) < 1e-6)
    val q = r.getAs[Double]("q")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("language id picks marker-heavy language, und on zero hits") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("the cat and the dog is here", "en"),
      ("der hund und die katze ist da", "de"),
      ("el perro y la casa es grande", "es"),
      ("le chien et la maison est grande", "fr"),
      ("zzz qqq xxx", "und")).toDF("text", "want")
    val got = df.select(col("want"), TextStats.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"want ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("fingerprints: deterministic mod-p sample of gram hashes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fp = TextStats.fingerprints(docs, "doc_id", "text").cache()
    val row = fp.filter(col("n_fp") > 0).head()
    assert(row.getAs[Long]("n_grams") > 0)
    assert(row.getAs[Long]("n_fp") <= row.getAs[Long]("n_grams"))
    // ~1/8 of grams sampled on average
    val agg = fp.agg(sum("n_fp").cast("double") / sum("n_grams")).head().getDouble(0)
    assert(agg > 0.08 && agg < 0.17, s"sample rate $agg")
    fp.unpersist()
  }

  test("pattern mask reference semantics") {
    import graft.functions.PatternMask
    assert(PatternMask.mask("Abc-12 #x?") == "Aaa-##b#a?")
    assert(PatternMask.mask("café") == "aaaa") // accent folded
    assert(PatternMask.mask("3/4:5.6'7") == "#/#:#.#'#")
  }
}

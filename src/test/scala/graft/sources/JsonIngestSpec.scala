package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.functions._
import graft.SparkSpec

class JsonIngestSpec extends SparkSpec {

  private val schema = new StructType()
    .add("id", "long").add("name", "string").add("score", "long")

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_spec")
    java.nio.file.Files.write(dir.resolve("part-00000.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("corrupt lines are quarantined with the raw line; valid ones parse") {
    val p = writeLines(Seq(
      """{"id": 1, "name": "a"}""",
      """x{"id": 2, "name": "b"}""",
      """{"id": 3, "name": "c", "score": 9}"""))
    val df = JsonIngest.readResilient(spark, schema, p).cache()
    assert(df.count() == 3)
    val corrupt = df.filter(col(JsonIngest.CorruptCol).isNotNull).collect()
    assert(corrupt.length == 1)
    assert(corrupt.head.getAs[String](JsonIngest.CorruptCol)
      == """x{"id": 2, "name": "b"}""")
    assert(corrupt.head.isNullAt(0) && corrupt.head.isNullAt(1))
    df.unpersist()
  }

  test("schema evolution: a shard without the new column parses it null") {
    val old = writeLines(Seq("""{"id": 1, "name": "a"}"""))
    val neu = writeLines(Seq("""{"id": 2, "name": "b", "score": 5}"""))
    // cache first: Spark disallows corrupt-column-only scans over raw
    // JSON (the count below prunes to just that column)
    val df = JsonIngest.readResilient(spark, schema, old, neu).cache()
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getLong(2) == 5L)
    assert(df.filter(col(JsonIngest.CorruptCol).isNotNull).count() == 0)
    df.unpersist()
  }

  test("a type-mismatched field quarantines the line, not the job") {
    val p = writeLines(Seq(
      """{"id": "not a number", "name": "a"}""",
      """{"id": 4, "name": "d"}"""))
    val df = JsonIngest.readResilient(spark, schema, p).cache()
    assert(df.count() == 2)
    assert(df.filter(col(JsonIngest.CorruptCol).isNotNull).count() == 1)
    df.unpersist()
  }

  test("corrupt-column-only scans are rejected by Spark; the two workarounds hold") {
    // Spark guards against queries whose column pruning leaves ONLY the
    // corrupt column: the parser then never attempts the data columns,
    // so every line would look "parsed" and the corrupt filter would be
    // vacuous — the guard turns a silent wrong answer into a loud
    // AnalysisException. This spec pins the guard (so an upgrade that
    // changes the behavior is caught) and both documented workarounds.
    val p = writeLines(Seq(
      """{"id": 1, "name": "a"}""",
      """not json at all"""))
    val raw = JsonIngest.readResilient(spark, schema, p)
    // corrupt-only scan: filter + count prunes to _corrupt alone
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      raw.filter(col(JsonIngest.CorruptCol).isNotNull).count()
    }
    assert(e.getMessage.toLowerCase.contains("corrupt"),
      s"unexpected guard message: ${e.getMessage}")
    // workaround 1: cache the parsed frame — the scan then reads the
    // materialized columns, not the raw JSON
    val cached = raw.cache()
    try assert(cached.filter(col(JsonIngest.CorruptCol).isNotNull).count() == 1)
    finally cached.unpersist()
    // workaround 2: keep a real data column in the projection so the
    // parse is genuine, count from that shape
    val withData = raw.select(col("id"), col(JsonIngest.CorruptCol))
      .filter(col(JsonIngest.CorruptCol).isNotNull).collect()
    assert(withData.length == 1 && withData.head.isNullAt(0))
  }
}

package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write,
  WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK — the WRITE half of the connector surface
  * ([[RangeGen]] covers the read half): an aggregating sink that folds
  * every written row into per-column long sums and publishes ONE
  * atomic summary artifact, exercising the V2 commit protocol
  * end-to-end:
  *
  *  - each task's [[DataWriter]] folds its partition locally and
  *    ships the partials as its [[WriterCommitMessage]] — no row ever
  *    travels to the driver;
  *  - the driver's `commit` folds the messages and publishes the
  *    summary by write-to-staging + atomic rename — a reader sees the
  *    complete artifact or nothing (the IndexStore discipline at the
  *    connector layer);
  *  - `abort` discards partials: a failed job leaves the previous
  *    artifact untouched.
  *
  * This is the "write side computes its own audit" pattern — ingest
  * checksum manifests, row-count reconciliation artifacts — done in
  * the engine's own transactional frame instead of a second pass.
  * Usage: `df.write.format("graft.sources.SummarySink")
  * .option("path", p).mode("append").save()` with an all-LONG schema;
  * the artifact at `p` is one line: `n_rows` then one sum per column
  * in schema order, tab-separated. */
class SummarySink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SummaryTable(schema, properties.get("path"))
}

private[sources] class SummaryTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "SummarySink requires option(path)")
  override def name(): String = s"graft_summary_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    schema.fields.foreach(f => require(f.dataType == LongType,
      s"SummarySink folds LONG columns only; got $f"))
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new SummaryBatchWrite(
          schema.fields.length, path)
      }
    }
  }
}

private[sources] case class SummaryPartial(n: Long, sums: Array[Long])
    extends WriterCommitMessage

/** Top-level (self-contained, serializable) writer factory — an inner
  * class would drag the non-serializable BatchWrite across the task
  * boundary. */
private[sources] case class SummaryWriterFactory(nCols: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      private val sums = new Array[Long](nCols)
      override def write(row: InternalRow): Unit = {
        n += 1
        var i = 0
        while (i < nCols) {
          if (!row.isNullAt(i)) sums(i) += row.getLong(i)
          i += 1
        }
      }
      override def commit(): WriterCommitMessage = SummaryPartial(n, sums)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private[sources] class SummaryBatchWrite(nCols: Int, path: String)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    SummaryWriterFactory(nCols)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var n = 0L
    val sums = new Array[Long](nCols)
    messages.foreach { case SummaryPartial(pn, ps) =>
      n += pn
      var i = 0
      while (i < nCols) { sums(i) += ps(i); i += 1 }
    }
    val dest = java.nio.file.Paths.get(path)
    Option(dest.getParent)
      .foreach(p => java.nio.file.Files.createDirectories(p))
    val staging = dest.resolveSibling(
      s".${dest.getFileName}.staging.${ProcessHandle.current.pid}")
    java.nio.file.Files.write(staging,
      (Seq(n) ++ sums).mkString("\t").getBytes("UTF-8"))
    java.nio.file.Files.move(staging, dest,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

object SummarySink {
  /** Read a published summary back: (n_rows, per-column sums). */
  def read(path: String): (Long, Seq[Long]) = {
    val parts = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").trim.split("\t")
    (parts.head.toLong, parts.tail.map(_.toLong).toSeq)
  }
}

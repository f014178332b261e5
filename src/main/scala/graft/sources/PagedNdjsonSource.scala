package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's paginated-scan shape
  * (SURVEY §2.1 S1/S2): the Map Warper crawl fetches numbered pages
  * (`?page=N`, /root/reference/mapwarper.js:23-26, 49-55); offline,
  * each page is a spooled NDJSON file. This source plans ONE
  * InputPartition PER PAGE, so page fetches parallelize across the
  * cluster instead of the reference's sequential single-threaded loop —
  * and the error channel stays in-band (a malformed line becomes an
  * error row, mirroring mapwarper.js:123-129, never a task failure).
  *
  * Design split: the connector handles pagination + IO + provenance
  * (page, line) and returns raw lines; record parsing stays in Spark
  * expressions (`from_json` with the declared schema) where Catalyst
  * can prune and push down.
  *
  * Usage: spark.read.format("graft.sources.PagedNdjsonSource")
  *          .option("path", dir).load()  // dir of page-*.ndjson
  */
class PagedNdjsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedNdjsonSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    // fail HERE with the actual problem — a null path otherwise
    // surfaces later as a bare NPE from planInputPartitions
    require(path != null && path.nonEmpty,
      "PagedNdjsonSource requires .option(\"path\", <dir of page-*.ndjson>)")
    new PagedTable(path)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object PagedNdjsonSource {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("line", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Page files in a directory, sorted for deterministic page indices. */
  def pageFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".ndjson"))
      .sortBy(_.getName).toSeq
  }
}

class PagedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"paged_ndjson($path)"
  override def schema(): StructType = PagedNdjsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(path)
}

class PagedScanBuilder(path: String) extends ScanBuilder {
  override def build(): Scan = new PagedScan(path)
}

class PagedScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = PagedNdjsonSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    // page provenance comes from the FILE NAME's number, not the
    // lexical list position: page-10000 sorts between page-1000 and
    // page-1001, and a missing middle file would silently shift every
    // later page's attribution (round-13 review); unnumbered files —
    // including numbers past Int.MaxValue, where toInt would throw at
    // planInputPartitions and kill the scan the fallback exists for —
    // fall back to a position past every numbered page
    PagedNdjsonSource.pageFiles(path).zipWithIndex
      .map { case (f, i) =>
        val page = "page-([0-9]+)\\.ndjson$".r.findFirstMatchIn(f.getName)
          .flatMap(m => scala.util.Try(m.group(1).toInt).toOption)
          .getOrElse(1000000 + i)
        PagePartition(page, f.getAbsolutePath): InputPartition
      }
      .toArray
  override def createReaderFactory(): PartitionReaderFactory = new PageReaderFactory
}

case class PagePartition(page: Int, file: String) extends InputPartition

class PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var source: scala.io.BufferedSource = _
      // construction failure held as an explicit flag, NOT an in-band
      // sentinel line: the old "__READ_ERROR__..." marker was spliced
      // into the line stream, so a DATA line that legitimately started
      // with the sentinel was misrouted to the error channel — and a
      // null getMessage printed as "null" (round-14 review). e.toString
      // always carries the class name.
      private var ctorError: String = null
      private val iter: Iterator[String] = {
        try {
          source = scala.io.Source.fromFile(p.file, "UTF-8")
          source.getLines()
        }
        catch { case e: Exception => ctorError = e.toString; Iterator.empty }
      }
      private var current: InternalRow = _
      private var failed = false
      override def next(): Boolean = {
        if (failed) return false
        if (ctorError != null) {
          failed = true
          current = new GenericInternalRow(Array[Any](p.page, null,
            UTF8String.fromString(ctorError)))
          return true
        }
        // ITERATION can throw too (MalformedInputException on invalid
        // UTF-8, IOException on a truncated file) — the in-band error
        // contract ("never a task failure") must cover hasNext/next,
        // not just reader construction; the page ends with one error
        // row (round-13 review)
        try {
          while (iter.hasNext) {
            val raw = iter.next()
            if (raw.trim.nonEmpty) { // blank-line compact, as the reference does
              current = new GenericInternalRow(Array[Any](p.page,
                UTF8String.fromString(raw), null))
              return true
            }
          }
          false
        } catch {
          case scala.util.control.NonFatal(e) =>
            failed = true
            current = new GenericInternalRow(Array[Any](p.page, null,
              UTF8String.fromString(s"read failed mid-page: ${e}")))
            true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = if (source != null) source.close()
    }
  }
}

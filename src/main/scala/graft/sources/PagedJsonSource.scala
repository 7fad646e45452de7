package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the paginated-API source (README.md:11–12;
  * SURVEY.md §2.1's "at scale" promise): one `InputPartition` PER PAGE
  * RANGE, so page fetching and JSON parsing happen executor-side in
  * parallel — the driver only plans the page list. This is the shape that
  * survives 100 TB: the file-paged form (`EtlOps.sourceApiPaginated`)
  * issues one driver-loop read per page, which is exactly the driver
  * bottleneck the V2 source removes. Offline, a "page request" is a page
  * directory of JSON lines; an HTTP client would slot into
  * `PageReader` unchanged (same reader lifecycle: open on first `next`,
  * parse record-at-a-time, `close` when the task drains it).
  *
  * Usage: `spark.read.format("graft.sources.PagedJsonSource")
  *   .option("pages", n).load(pagesDir)` — schema is the events page
  * contract (`event_id BIGINT, event_type STRING, user_id BIGINT`).
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.pageSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PagedJsonTable(
      path = properties.get("path"),
      pages = Option(properties.get("pages")).map(_.toInt).getOrElse(1),
      paceMs = Option(properties.get("paceMs")).map(_.toLong).getOrElse(0L))
}

object PagedJsonSource {
  val pageSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("user_id", LongType)))
}

private[sources] class PagedJsonTable(path: String, pages: Int, paceMs: Long)
    extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = PagedJsonSource.pageSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new PagedJsonScan(path, pages, paceMs)
}

private[sources] class PagedJsonScan(path: String, pages: Int, paceMs: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = PagedJsonSource.pageSchema
  override def toBatch: Batch = this
  // the page list IS the partitioning: page fetches parallelize across
  // executors, and adding pages adds tasks, not driver work
  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages).map(p => PageInputPartition(s"$path/page=$p"): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new PageReaderFactory(paceMs)
}

private[sources] case class PageInputPartition(pageDir: String) extends InputPartition

private[sources] class PageReaderFactory(paceMs: Long) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // pace the page REQUEST (reader open), not the row iteration: all
    // concurrent page tasks in this executor JVM share one bucket, so a
    // 32-task wave still hits the provider at 1/paceMs req/s (see
    // RatePacer's scale note on the per-executor budget)
    if (paceMs > 0) RatePacer.forInterval(paceMs).acquire()
    new PageReader(partition.asInstanceOf[PageInputPartition].pageDir)
  }
}

/** Executor-side page reader: parses one page's JSON lines record-at-a-
  * time. The ObjectMapper is built once per page (the amortized-codec-init
  * lifecycle a per-row UDF can't express).
  */
private[sources] class PageReader(pageDir: String) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines: Iterator[String] =
    Option(new java.io.File(pageDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json")).sortBy(_.getName).iterator
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath).asScala)
      .filter(_.nonEmpty)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      val node = mapper.readTree(lines.next())
      // missing fields AND explicit JSON nulls surface as SQL NULL,
      // matching the built-in JSON reader (an unfiltered NullNode would
      // decode to 0 / "null" instead)
      def longOrNull(f: String): Any =
        Option(node.get(f)).filterNot(_.isNull).map(_.asLong(): Any).orNull
      def strOrNull(f: String): Any =
        Option(node.get(f)).filterNot(_.isNull)
          .map(n => UTF8String.fromString(n.asText()): Any).orNull
      current = InternalRow(
        longOrNull("event_id"), strOrNull("event_type"), longOrNull("user_id"))
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 as a first-class Structured Streaming source: the reference's
  * paginated match-id endpoint (`extractor/riot/match/api.py:7-33`,
  * start/count pages) exposed through the DataSourceV2 connector API, so
  * the crawl frontier is driven by the engine's own micro-batch loop —
  * offsets checkpoint/resume exactly like a file or Kafka source — instead
  * of a driver-side fetch loop.
  *
  * Shape: the stream's offset is "pages consumed so far". Each micro-batch
  * covers a page range; every page becomes ONE input partition, so fetch
  * concurrency = pages per batch and scales with the executor count (the
  * Spark mapping of the reference's 200-concurrent async batches,
  * `extractor/riot/tasks.py:70-90`). Admission control
  * (`maxPagesPerTrigger`) is the reference's drain cap (O4) on the source
  * side; the per-request rate budget stays inside the client
  * (`HttpSource.RateLimiter`), which is constructed ON the reader — one
  * client per partition, transports never serialize.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format(classOf[HttpIdSourceProvider].getName)
  *     .option("client", classOf[MyPageClient].getName)  // no-arg ctor
  *     .option("maxPagesPerTrigger", "10")
  *     .load()                                           // (page, pos, id)
  * }}}
  * Tests/CI run a canned [[PageClient]] (zero egress); a production client
  * wraps the HTTP transport + rate budget.
  */
object HttpIdStreamSource {
  val schema: StructType = new StructType()
    .add("page", LongType, nullable = false)
    .add("pos", LongType, nullable = false)
    .add("id", StringType, nullable = false)

  /** Paginated endpoint abstraction. Implementations need a public no-arg
    * constructor (instantiated by class name on driver AND executors).
    * `pagesAvailable` must be monotonically non-decreasing and a page,
    * once available, immutable — the usual "committed log" contract that
    * makes offset-based replay exact.
    */
  trait PageClient {
    def pagesAvailable(): Long
    def fetchPage(page: Long): Seq[String]
  }

  private[sources] def clientFor(className: String): PageClient =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[PageClient]
}

class HttpIdSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpIdStreamSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpIdTable(properties.asScala.toMap)
}

private[sources] class HttpIdTable(options: Map[String, String]) extends Table with SupportsRead {
  private def clientClass: String = options.getOrElse("client",
    throw new IllegalArgumentException("option 'client' (PageClient class name) is required"))

  override def name(): String = s"http_ids($clientClass)"
  override def schema(): StructType = HttpIdStreamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = HttpIdStreamSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new HttpIdMicroBatchStream(clientClass,
          options.get("maxpagespertrigger").orElse(options.get("maxPagesPerTrigger")).map(_.toLong))
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val n = HttpIdStreamSource.clientFor(clientClass).pagesAvailable()
          (0L until n).map(p => PagePartition(p, clientClass): InputPartition).toArray
        }
        override def createReaderFactory(): PartitionReaderFactory = new PageReaderFactory
      }
    }
}

/** Offset = number of pages fully consumed. */
private[sources] case class PageOffset(pages: Long) extends Offset {
  override def json(): String = pages.toString
}

private[sources] class HttpIdMicroBatchStream(clientClass: String,
    maxPagesPerTrigger: Option[Long])
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // driver-side client: pagesAvailable() polling only
  private lazy val client = HttpIdStreamSource.clientFor(clientClass)
  // AvailableNow: the page count captured at query start is the fixed goal
  private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = PageOffset(0L)
  override def deserializeOffset(json: String): Offset = PageOffset(json.toLong)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(client.pagesAvailable())

  override def getDefaultReadLimit: ReadLimit =
    maxPagesPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[PageOffset].pages
    val available = availableNowTarget.getOrElse(client.pagesAvailable())
    val capped = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(available, from + r.maxRows())
      case _ => available
    }
    PageOffset(math.max(from, capped))
  }

  override def reportLatestOffset(): Offset = PageOffset(client.pagesAvailable())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[PageOffset].pages
    val to = end.asInstanceOf[PageOffset].pages
    (from until to).map(p => PagePartition(p, clientClass): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PageReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class PagePartition(page: Long, clientClass: String) extends InputPartition

private[sources] class PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      // one client per partition, built on the executor (HttpSource
      // .fetchDocsDistributed discipline: transports never serialize)
      private val ids = HttpIdStreamSource.clientFor(p.clientClass).fetchPage(p.page)
      private var i = -1
      override def next(): Boolean = { i += 1; i < ids.length }
      override def get(): InternalRow =
        InternalRow(p.page, i.toLong, UTF8String.fromString(ids(i)))
      override def close(): Unit = ()
    }
  }
}

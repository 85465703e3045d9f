package graft.sources.paged

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** §2.A1 as a first-class streaming source: the reference's
  * cursor-paginated collection loop (src/main.py:136-160) re-expressed
  * as a DataSource V2 `MicroBatchStream`.
  *
  *   spark.readStream.format("graft-pages")
  *     .option("path", apiRoot)            // the paged "service"
  *     .option("pageSize", 100)            // clamped to the server max
  *     .option("maxPagesPerTrigger", 10)   // admission per micro-batch
  *     .option("maxRecords", 3000)         // ≙ MAX_RESULTS global cap
  *     .load()
  *
  * Mapping to the reference loop:
  *   - the OFFSET is the cursor: `next_token` made durable. The engine
  *     checkpoints each batch's end offset, so a killed-and-restarted
  *     query resumes from the last committed cursor without re-fetching
  *     pages (the reference loses its in-memory `next_token` on crash
  *     and restarts from scratch);
  *   - page-size clamp ≙ src/main.py:95-96 (requested size clamped down
  *     to the server max);
  *   - `maxRecords` ≙ the MAX_RESULTS cap (src/main.py:18,136): the
  *     stream never admits records past it;
  *   - pagination ends when the cursor reaches what the service has —
  *     ≙ the `next_token`-absent break (src/main.py:157-160).
  *
  * Scale shape: each page is its own `InputPartition`, so a trigger's
  * admitted pages are fetched IN PARALLEL across executors (the
  * reference fetches serially on one thread); per-trigger admission
  * bounds memory, and the cursor advances only through the checkpoint
  * commit protocol — exactly-once delivery into the sink's idempotence
  * domain. Implements `SupportsTriggerAvailableNow`, so the scheduled
  * drain-everything run (≙ the daily EventBridge batch, main.tf:214-218)
  * is `.trigger(Trigger.AvailableNow)`.
  */
class PagedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive by convention (Spark hands this
    // method asCaseSensitiveMap): without the wrap, .option("pagesize",…)
    // would be silently ignored and fall back to the default.
    val opts = new CaseInsensitiveStringMap(properties)
    val root = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-pages: option 'path' is required"))
    def intOpt(k: String, dflt: Int) = Option(opts.get(k)).map(_.toInt).getOrElse(dflt)
    def longOpt(k: String, dflt: Long) = Option(opts.get(k)).map(_.toLong).getOrElse(dflt)
    new PagedTable(root,
      intOpt("pageSize", PagedApi.MaxServerPageSize),
      intOpt("maxPagesPerTrigger", 10),
      longOpt("maxRecords", 3000L)) // reference default, src/main.py:18
  }
}

object PagedSource {
  /** The projected tweet shape (≙ tweet.fields, src/main.py:90). */
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("created_at", StringType),
    StructField("text", StringType)))
}

class PagedTable(root: String, pageSize: Int, maxPagesPerTrigger: Int, maxRecords: Long)
  extends Table with SupportsRead {
  override def name(): String = s"graft-pages:$root"
  override def schema(): StructType = PagedSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PagedSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PagedMicroBatchStream(root, pageSize, maxPagesPerTrigger, maxRecords)
      }
    }
}

/** The durable cursor: number of records consumed from the stream head.
  * This is the engine-side identity of the API's opaque `next_token` —
  * serialized into the offset log, so restart resumes exactly here. */
case class PagedOffset(record: Long) extends Offset {
  override def json: String = s"""{"record":$record}"""
}

object PagedOffset {
  private val Re = """\{"record":(\d+)\}""".r
  def fromJson(s: String): PagedOffset = s.trim match {
    case Re(n) => PagedOffset(n.toLong)
    case other => throw new IllegalArgumentException(s"bad paged offset: $other")
  }
}

class PagedMicroBatchStream(root: String, requestedPageSize: Int,
                            maxPagesPerTrigger: Int, maxRecords: Long)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  // clamp ≙ src/main.py:95-96: the server never serves more than its max
  private val pageSize = math.min(math.max(requestedPageSize, 1), PagedApi.MaxServerPageSize)

  // AvailableNow snapshot: the run drains to what existed at start, even
  // if the service keeps growing while we drain
  @volatile private var preparedEnd: Option[Long] = None

  private def capped(n: Long): Long = math.min(n, maxRecords)
  private def availableNow(): Long = capped(PagedApi.countAvailable(root))

  override def initialOffset(): Offset = PagedOffset(0L)
  override def deserializeOffset(json: String): Offset = PagedOffset.fromJson(json)

  override def prepareForTriggerAvailableNow(): Unit =
    preparedEnd = Some(availableNow())

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(pageSize.toLong * maxPagesPerTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[PagedOffset].record
    val end = preparedEnd.getOrElse(availableNow())
    val admitted = limit match {
      case rm: ReadMaxRows => math.min(end, s + rm.maxRows())
      case _: ReadAllAvailable => end
      case _ => end
    }
    PagedOffset(math.max(s, admitted))
  }

  override def reportLatestOffset(): Offset =
    PagedOffset(preparedEnd.getOrElse(availableNow()))

  /** One InputPartition per page — the unit of API fetch AND of executor
    * parallelism. A 10-page trigger is 10 concurrent page requests. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PagedOffset].record
    val e = end.asInstanceOf[PagedOffset].record
    Iterator.iterate(s)(_ + pageSize).takeWhile(_ < e)
      .map(from => PagedInputPartition(root, from, math.min(from + pageSize, e)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PagedReaderFactory

  /** The cursor is durable in the offset log; the service is not
    * consumable-once, so commit has nothing to acknowledge. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class PagedInputPartition(root: String, from: Long, until: Long) extends InputPartition

class PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedInputPartition]
    new PartitionReader[InternalRow] {
      // executor-side page fetch: token = the page's start cursor
      private val page = PagedApi.fetch(
        p.root,
        if (p.from == 0L) None else Some(p.from.toString),
        (p.until - p.from).toInt)
      private val it = page.records.iterator
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          // limit 3: the text field keeps any embedded tabs intact
          // (framing only owns the first two separators)
          val parts = it.next().split("\t", 3)
          row = new GenericInternalRow(Array[Any](
            parts(0).toLong,
            UTF8String.fromString(if (parts.length > 1) parts(1) else null),
            UTF8String.fromString(if (parts.length > 2) parts(2) else null)))
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

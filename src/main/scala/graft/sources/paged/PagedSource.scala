package graft.sources.paged

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, StringContains}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** §2.A1 as a first-class source: the reference's cursor-paginated
  * collection loop (src/main.py:136-160) re-expressed as a DataSource V2
  * table readable BOTH as a batch scan and as a `MicroBatchStream`.
  *
  *   spark.readStream.format("graft-pages")     // or spark.read
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
  *     ≙ the `next_token`-absent break (src/main.py:157-160);
  *   - FILTER AND PROJECTION PUSHDOWN ≙ the reference compiling its
  *     filters, field list and limits *into the API query string*
  *     (`build_query` + tweet.fields, src/main.py:89-101): the scan
  *     builder implements `SupportsPushDownFilters` (id-range bounds ≙
  *     start_time/end_time; text-contains ≙ keyword terms) and
  *     `SupportsPushDownRequiredColumns` (≙ tweet.fields), so
  *     `spark.read.format("graft-pages").load().filter($"id" >= n)`
  *     fetches ONLY matching records — never the client-side
  *     fetch-everything-then-filter the reference explicitly avoids.
  *
  * Scale shape: each page is its own `InputPartition`, so a scan's
  * admitted pages are fetched IN PARALLEL across executors (the
  * reference fetches serially on one thread); per-trigger admission
  * bounds memory, and the cursor advances only through the checkpoint
  * commit protocol — exactly-once delivery into the sink's idempotence
  * domain. Implements `SupportsTriggerAvailableNow`, so the scheduled
  * drain-everything run (≙ the daily EventBridge batch, main.tf:214-218)
  * is `.trigger(Trigger.AvailableNow)`.
  *
  * With a pushed filter the offset counts records of the FILTERED
  * stream (exactly the reference's `next_token`, which is a cursor over
  * the query's result stream): a given checkpoint is only meaningful
  * for the query it was built with — restarting the same checkpoint
  * with a different pushed filter is undefined, same as reusing a
  * Twitter next_token across different query strings.
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
    // Explicit server-side query options — the reference CONSTRUCTS its
    // query string from config before paging (build_query,
    // src/main.py:89-101); these are that construction for the streaming
    // path, where Catalyst's V2 pushdown rule does not run (it only
    // rewrites batch DataSourceV2Relations). Batch reads get the same
    // effect automatically from .filter(...) via SupportsPushDownFilters;
    // both compose (tightest bounds win).
    val baseQuery = PagedApi.Query(
      minId = Option(opts.get("query.minId")).map(_.toLong),
      maxId = Option(opts.get("query.maxId")).map(_.toLong),
      contains = Option(opts.get("query.contains")).toSeq.flatMap(_.split(',')).filter(_.nonEmpty))
    // transient-failure policy for the page readers (429 Retry-After +
    // exponential backoff on 5xx); attempts past the bound fail the task
    val retry = PagedApi.RetryPolicy(
      maxAttempts = intOpt("retryMaxAttempts", 4),
      baseBackoffMs = longOpt("retryBaseBackoffMs", 100L))
    new PagedTable(root,
      intOpt("pageSize", PagedApi.MaxServerPageSize),
      intOpt("maxPagesPerTrigger", 10),
      longOpt("maxRecords", 3000L), // reference default, src/main.py:18
      baseQuery, retry)
  }
}

object PagedSource {
  /** The projected tweet shape (≙ tweet.fields, src/main.py:90). */
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("created_at", StringType),
    StructField("text", StringType)))
}

class PagedTable(root: String, pageSize: Int, maxPagesPerTrigger: Int, maxRecords: Long,
                 baseQuery: PagedApi.Query = PagedApi.Query.All,
                 retry: PagedApi.RetryPolicy = PagedApi.RetryPolicy())
  extends Table with SupportsRead {
  override def name(): String = s"graft-pages:$root"
  override def schema(): StructType = PagedSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(root, pageSize, maxPagesPerTrigger, maxRecords, baseQuery, retry)
}

/** Pushdown-capable scan builder — the Spark-native form of the
  * reference building its API query string before paging
  * (src/main.py:89-101). Accepted predicates leave the Spark plan and
  * become server-side query terms; everything else stays a residual
  * filter evaluated in-plan. */
class PagedScanBuilder(root: String, pageSize: Int, maxPagesPerTrigger: Int, maxRecords: Long,
                       baseQuery: PagedApi.Query = PagedApi.Query.All,
                       retry: PagedApi.RetryPolicy = PagedApi.RetryPolicy())
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var query: PagedApi.Query = baseQuery
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagedSource.Schema
  private var limit: Option[Int] = None
  private var countPushed = false

  /** COUNT(*) rides the API's result-count metadata (≙ the reference
    * reading `meta.result_count` instead of the tweets, src/main.py:156):
    * a bare `SELECT COUNT(*)` over the (filtered, capped) source becomes
    * ONE metadata probe — zero pages fetched (PagedSourceSuite asserts
    * the access log stays empty). Complete pushdown, ungrouped
    * COUNT(*) only; anything else stays in-plan. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (supportCompletePushDown(agg)) { countPushed = true; true } else false
  }

  /** LIMIT k becomes a page-plan bound (≙ the reference's max_results
    * riding the API request, src/main.py:95-96,136): a bare
    * `.load().limit(k)` plans ⌈k/pageSize⌉ pages instead of every page
    * of the (filtered) stream. Fully pushed: the service serves a
    * deterministic prefix of the filtered stream, which is a legal
    * LIMIT answer. */
  override def pushLimit(l: Int): Boolean = {
    limit = Some(limit.fold(l)(math.min(_, l)))
    true
  }

  /** A query no record matches (min > max) — the pushed form of an
    * always-false predicate like id > Long.MaxValue. */
  private val MatchNothing = PagedApi.Query(minId = Some(1L), maxId = Some(0L))

  /** A filter the service can evaluate: id-range bounds (≙
    * start_time/end_time) or text-contains (≙ query keywords). The
    * strict bounds saturate at the Long extremes instead of wrapping —
    * id > Long.MaxValue pushed as minId = MinValue would silently match
    * EVERYTHING, and a pushed filter is never re-checked in-plan. */
  private def asQuery(f: Filter): Option[PagedApi.Query] = f match {
    case EqualTo("id", v: Number) =>
      Some(PagedApi.Query(minId = Some(v.longValue), maxId = Some(v.longValue)))
    case GreaterThan("id", v: Number) =>
      Some(if (v.longValue == Long.MaxValue) MatchNothing
           else PagedApi.Query(minId = Some(v.longValue + 1)))
    case GreaterThanOrEqual("id", v: Number) => Some(PagedApi.Query(minId = Some(v.longValue)))
    case LessThan("id", v: Number) =>
      Some(if (v.longValue == Long.MinValue) MatchNothing
           else PagedApi.Query(maxId = Some(v.longValue - 1)))
    case LessThanOrEqual("id", v: Number) => Some(PagedApi.Query(maxId = Some(v.longValue)))
    case StringContains("text", t) => Some(PagedApi.Query(contains = Seq(t)))
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition(f => asQuery(f).isDefined)
    query = supported.flatMap(asQuery).foldLeft(baseQuery)(_ and _)
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    if (countPushed) new PagedCountScan(root, maxRecords, query, limit)
    else new PagedScan(root, pageSize, maxPagesPerTrigger, maxRecords, query, required, limit, retry)
}

/** The fully-pushed COUNT(*): one input partition producing one row —
  * min(matching count, maxRecords cap, pushed limit) — from the same
  * metadata probe the batch planner uses. No page is ever fetched. */
class PagedCountScan(root: String, maxRecords: Long, query: PagedApi.Query,
                     limit: Option[Int]) extends Scan {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def description(): String =
    s"graft-pages COUNT(*) pushdown root=$root query=${query.repr}"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(PagedCountPartition(root, limit.fold(maxRecords)(l => math.min(maxRecords, l.toLong)), query))
    override def createReaderFactory(): PartitionReaderFactory = new PagedCountReaderFactory
  }
}

case class PagedCountPartition(root: String, cap: Long, query: PagedApi.Query)
  extends InputPartition

class PagedCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[PagedCountPartition]
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean = if (served) false else { served = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          math.min(PagedApi.countMatching(cp.root, cp.query), cp.cap)))
      override def close(): Unit = ()
    }
  }
}

class PagedScan(root: String, pageSize: Int, maxPagesPerTrigger: Int, maxRecords: Long,
                query: PagedApi.Query, required: StructType,
                limit: Option[Int] = None,
                retry: PagedApi.RetryPolicy = PagedApi.RetryPolicy())
  extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-pages root=$root query=${query.repr} fields=${required.fieldNames.mkString(";")}" +
      limit.fold("")(l => s" limit=$l")
  override def toBatch: Batch =
    new PagedBatch(root, pageSize, maxRecords, query, required, limit, retry)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagedMicroBatchStream(root, pageSize, maxPagesPerTrigger, maxRecords, query, required, retry)

  /** Planning-time size report (the DSv2 contract Catalyst's join
    * sizing reads): rows = the same matching-count metadata probe the
    * batch planner uses, clamped by the maxRecords cap and any pushed
    * limit; bytes = rows × schema default widths. Without this a DSv2
    * scan defaults to "unknown = huge", so a 100-row capped API read
    * could never auto-broadcast — with it, Catalyst puts the capped
    * scan on the broadcast side of a join exactly as it would a small
    * dim table (PagedSourceSuite pins that plan). */
  override def estimateStatistics(): Statistics = {
    val cap = limit.fold(maxRecords)(l => math.min(maxRecords, l.toLong))
    val rows = math.min(PagedApi.countMatching(root, query), cap)
    val rowBytes = math.max(required.fields.map(_.dataType.defaultSize).sum, 1)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * rowBytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
    }
  }
}

/** Batch form: one InputPartition per page of the (filtered) stream —
  * the pages are planned from a single matching-count metadata probe and
  * fetched in parallel across executors. */
class PagedBatch(root: String, requestedPageSize: Int, maxRecords: Long,
                 query: PagedApi.Query, required: StructType,
                 limit: Option[Int] = None,
                 retry: PagedApi.RetryPolicy = PagedApi.RetryPolicy()) extends Batch {
  private val pageSize = math.min(math.max(requestedPageSize, 1), PagedApi.MaxServerPageSize)
  override def planInputPartitions(): Array[InputPartition] = {
    val cap = limit.fold(maxRecords)(l => math.min(maxRecords, l.toLong))
    val total = math.min(PagedApi.countMatching(root, query), cap)
    Iterator.iterate(0L)(_ + pageSize).takeWhile(_ < total)
      .map(from => PagedInputPartition(root, from, math.min(from + pageSize, total),
        query, required.fieldNames.toSeq, retry): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new PagedReaderFactory
}

/** The durable cursor: number of records consumed from the (filtered)
  * stream head. This is the engine-side identity of the API's opaque
  * `next_token` — serialized into the offset log, so restart resumes
  * exactly here. */
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
                            maxPagesPerTrigger: Int, maxRecords: Long,
                            query: PagedApi.Query = PagedApi.Query.All,
                            required: StructType = PagedSource.Schema,
                            retry: PagedApi.RetryPolicy = PagedApi.RetryPolicy())
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  // clamp ≙ src/main.py:95-96: the server never serves more than its max
  private val pageSize = math.min(math.max(requestedPageSize, 1), PagedApi.MaxServerPageSize)

  // AvailableNow snapshot: the run drains to what existed at start, even
  // if the service keeps growing while we drain
  @volatile private var preparedEnd: Option[Long] = None

  private def capped(n: Long): Long = math.min(n, maxRecords)
  private def availableNow(): Long = capped(PagedApi.countMatching(root, query))

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
      .map(from => PagedInputPartition(root, from, math.min(from + pageSize, e),
        query, required.fieldNames.toSeq, retry): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PagedReaderFactory

  /** The cursor is durable in the offset log; the service is not
    * consumable-once, so commit has nothing to acknowledge. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class PagedInputPartition(root: String, from: Long, until: Long,
                               query: PagedApi.Query = PagedApi.Query.All,
                               fields: Seq[String] = PagedApi.Fields,
                               retry: PagedApi.RetryPolicy = PagedApi.RetryPolicy())
  extends InputPartition

class PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedInputPartition]
    new PartitionReader[InternalRow] {
      // executor-side page fetch: token = the page's start cursor;
      // query + field projection ride the request (server-side eval).
      // Retried under the bounded policy — a 429/5xx re-reads the SAME
      // immutable cursor slice, so recovery never duplicates or drops
      // rows (PagedSourceSuite proves exactly-once under injected faults)
      private val page = PagedApi.fetchWithRetry(
        p.root,
        if (p.from == 0L) None else Some(p.from.toString),
        (p.until - p.from).toInt,
        p.query, p.fields, p.retry)
      private val it = page.rows.iterator
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val vals = it.next()
          row = new GenericInternalRow(
            p.fields.indices.map { i =>
              (p.fields(i), vals(i)) match {
                case (_, null) => null
                case ("id", v) => v.toLong
                case (_, v) => UTF8String.fromString(v)
              }
            }.toArray[Any])
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

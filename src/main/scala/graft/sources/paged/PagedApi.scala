package graft.sources.paged

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

/** A deterministic local stand-in for the reference's cursor-paginated
  * HTTP API (reference src/main.py:85-160): a "service" rooted at a
  * directory whose record stream lives in `records.tsv` (one
  * `id\tcreated_at\ttext` line per record).
  *
  * Behavior modeled 1:1 with the reference loop:
  *   - `fetch(token, maxResults)` returns one page: the requested size is
  *     clamped DOWN to the server maximum (≙ `if max_results >
  *     RESULTS_PER_PAGE: max_results = RESULTS_PER_PAGE`, src/main.py:95-96);
  *   - the returned `nextToken` is an opaque continuation, absent on the
  *     last page (≙ `res['meta']['next_token']`, src/main.py:156-160);
  *   - the caller enforces the global result cap (≙ `while
  *     results_counted < MAX_RESULTS`, src/main.py:18,136).
  *
  * Every fetch appends one line to `_access.log` — test instrumentation
  * that lets PagedSourceSuite assert a restarted stream resumes from its
  * checkpointed cursor WITHOUT re-fetching committed pages.
  */
object PagedApi {

  /** ≙ RESULTS_PER_PAGE (reference src/main.py:10-12 default 100). */
  val MaxServerPageSize = 100

  /** Rate-limit response (≙ HTTP 429 from the reference's
    * `requests.request` call, src/main.py:114-120 — Twitter's most common
    * transient failure in real use). Carries the server's Retry-After. */
  class RateLimitedException(val retryAfterMs: Long)
    extends RuntimeException(s"429 rate limited, retry after ${retryAfterMs}ms")

  /** Any other transient service failure (connection reset, HTTP 5xx). */
  class TransientServiceException(msg: String) extends RuntimeException(msg)

  /** Bounded-retry fetch policy for the partition readers: rate-limit
    * responses wait the server's Retry-After; other transient failures
    * back off exponentially from `baseBackoffMs`. Retrying a page fetch
    * is safe by construction — the cursor is immutable input, so a retry
    * re-reads the SAME page (no records duplicated or dropped); attempts
    * past `maxAttempts` rethrow and fail the task, handing recovery to
    * Spark's task retry / the streaming checkpoint. */
  case class RetryPolicy(maxAttempts: Int = 4, baseBackoffMs: Long = 100L)

  private def faultsPath(root: String) = Paths.get(root, "_faults.tsv")

  /** Test-only fault injection: the next `count` fetches for `token`
    * ("-" = the initial page) fail with `kind` ∈ {429, 503}. Models the
    * reference's real-world failure mode at src/main.py:119. */
  def injectFault(root: String, token: String, count: Int, kind: Int,
                  retryAfterMs: Long = 50L): Unit = synchronized {
    Files.write(faultsPath(root),
      s"$token\t$count\t$kind\t$retryAfterMs\n".getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Consume one fault budget for `token` if armed; throws the fault. */
  private def maybeFail(root: String, token: Option[String]): Unit = synchronized {
    val p = faultsPath(root)
    if (!Files.exists(p)) return
    val t = token.getOrElse("-")
    val lines = Files.readAllLines(p, UTF_8)
    var thrown: Option[RuntimeException] = None
    val kept = new java.util.ArrayList[String]()
    lines.forEach { ln =>
      val parts = ln.split("\t")
      if (thrown.isEmpty && parts(0) == t && parts(1).toInt > 0) {
        thrown = Some(parts(2).toInt match {
          case 429 => new RateLimitedException(parts(3).toLong)
          case c => new TransientServiceException(s"HTTP $c (injected)")
        })
        if (parts(1).toInt > 1)
          kept.add(s"$t\t${parts(1).toInt - 1}\t${parts(2)}\t${parts(3)}")
      } else kept.add(ln)
    }
    thrown.foreach { e =>
      Files.write(p, String.join("\n", kept).concat("\n").getBytes(UTF_8))
      logAccess(root, s"token=$t FAIL ${e.getMessage}")
      throw e
    }
  }

  /** The record fields the service can serve (≙ tweet.fields,
    * reference src/main.py:90). */
  val Fields: Seq[String] = Seq("id", "created_at", "text")

  /** A server-side query — the engine-side identity of the reference's
    * API query string (`build_query`, src/main.py:89-101): conjunctive
    * id-range bounds (≙ start_time/end_time params) and text-contains
    * terms (≙ the keyword/alias terms). The service evaluates it BEFORE
    * paging, so the cursor walks the *filtered* stream and non-matching
    * records never cross the wire. */
  case class Query(minId: Option[Long] = None, maxId: Option[Long] = None,
                   contains: Seq[String] = Nil) {
    def isEmpty: Boolean = minId.isEmpty && maxId.isEmpty && contains.isEmpty
    def matches(id: Long, text: String): Boolean =
      minId.forall(id >= _) && maxId.forall(id <= _) &&
        contains.forall(t => text != null && text.contains(t))
    /** Conjunction: tightest bounds win. */
    def and(other: Query): Query = Query(
      (minId ++ other.minId).reduceOption(_ max _),
      (maxId ++ other.maxId).reduceOption(_ min _),
      contains ++ other.contains)
    def repr: String =
      if (isEmpty) "-"
      else (minId.map("id>=" + _) ++ maxId.map("id<=" + _) ++
        contains.map("text~" + _)).mkString("&")
  }
  object Query { val All: Query = Query() }

  /** A page of already-projected rows: one slot per requested field
    * (null where the record has none), in request order. */
  case class PageRows(rows: Seq[Array[String]], nextToken: Option[String])

  private def recordsPath(root: String) = Paths.get(root, "records.tsv")
  def accessLogPath(root: String) = Paths.get(root, "_access.log")

  /** Total records the service currently has — a cheap metadata probe
    * (not a page fetch; not access-logged). */
  def countAvailable(root: String): Long = {
    val p = recordsPath(root)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.lines(p, UTF_8)
      try s.count() finally s.close()
    }
  }

  /** Matching-record count under a query — a cheap metadata probe (≙ the
    * API's result-count estimate; not a page fetch; not access-logged). */
  def countMatching(root: String, q: Query): Long =
    if (q.isEmpty) countAvailable(root)
    else {
      val p = recordsPath(root)
      if (!Files.exists(p)) 0L
      else {
        val s = Files.lines(p, UTF_8)
        try s.filter(ln => matchesLine(ln, q)).count() finally s.close()
      }
    }

  private def matchesLine(ln: String, q: Query): Boolean = {
    val parts = ln.split("\t", 3)
    q.matches(parts(0).toLong, if (parts.length > 2) parts(2) else null)
  }

  /** One page request. `token` is the continuation from the previous
    * page (None = start); with a query, the cursor walks the FILTERED
    * stream (the reference's next_token is likewise a cursor over the
    * query's result stream, src/main.py:156-160). `fields` is the
    * server-side projection (≙ tweet.fields): rows come back with one
    * slot per requested field, in request order. */
  /** `fetch` under the retry policy — what the partition readers call.
    * The loop is the engine-side version of what the reference's page
    * loop (src/main.py:136-160) NEEDS but lacks: its bare
    * `requests.request` crashes the whole collection run on the first
    * 429, losing the in-memory next_token. */
  @annotation.tailrec
  def fetchWithRetry(root: String, token: Option[String], maxResults: Int,
                     query: Query = Query.All, fields: Seq[String] = Fields,
                     retry: RetryPolicy = RetryPolicy(), attempt: Int = 1): PageRows = {
    val failure =
      try return fetch(root, token, maxResults, query, fields)
      catch {
        case e: RateLimitedException if attempt < retry.maxAttempts =>
          e.retryAfterMs // honor the server's Retry-After verbatim
        case e: TransientServiceException if attempt < retry.maxAttempts =>
          retry.baseBackoffMs << (attempt - 1) // exponential backoff
      }
    Thread.sleep(failure)
    fetchWithRetry(root, token, maxResults, query, fields, retry, attempt + 1)
  }

  def fetch(root: String, token: Option[String], maxResults: Int,
            query: Query = Query.All,
            fields: Seq[String] = Fields): PageRows = {
    maybeFail(root, token)
    val start = token.map(_.toLong).getOrElse(0L)
    val n = math.min(math.max(maxResults, 1), MaxServerPageSize)
    logAccess(root,
      s"token=${token.getOrElse("-")} start=$start max=$n q=${query.repr} fields=${fields.mkString(";")}")
    val s = Files.lines(recordsPath(root), UTF_8)
    val rows =
      try {
        import scala.jdk.CollectionConverters._
        // cursor arithmetic stays in Long: a .toInt truncation would
        // silently serve the wrong slice once a caller-configured
        // maxRecords pushes the cursor past Int.MaxValue
        var skipped = 0L
        s.iterator().asScala
          .filter(ln => query.isEmpty || matchesLine(ln, query))
          .dropWhile(_ => { val drop = skipped < start; if (drop) skipped += 1; drop })
          .take(n)
          .map { ln =>
            val parts = ln.split("\t", 3)
            fields.map {
              case "id" => parts(0)
              case "created_at" => if (parts.length > 1) parts(1) else null
              case "text" => if (parts.length > 2) parts(2) else null
              case other => throw new IllegalArgumentException(s"unknown field: $other")
            }.toArray
          }
          .toSeq
      } finally s.close()
    val total = countMatching(root, query)
    val next =
      if (start + rows.size < total) Some((start + rows.size).toString)
      else None
    PageRows(rows, next)
  }

  // synchronized: page readers run in parallel executor threads (one JVM
  // under local[*]); the log is test instrumentation, not a data path
  private def logAccess(root: String, line: String): Unit = synchronized {
    Files.write(accessLogPath(root), (line + "\n").getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Append records to the service (the "API" receiving new upstream
    * data between runs). Records are `(id, created_at, text)`.
    *
    * Framing contract: one record per line, first two '\t' are field
    * separators, the remainder is `text` verbatim (readers split with
    * limit 3, so tabs INSIDE text survive). Newlines in any field, or
    * tabs in `created_at`, would corrupt line framing / cursor
    * arithmetic — rejected here rather than silently truncated. */
  def appendRecords(root: String, recs: Seq[(Long, String, String)]): Unit = {
    Files.createDirectories(Paths.get(root))
    recs.foreach { case (id, at, tx) =>
      require(!at.contains('\t') && !at.contains('\n') && !at.contains('\r'),
        s"record $id: created_at must not contain tab/newline")
      require(!tx.contains('\n') && !tx.contains('\r'),
        s"record $id: text must not contain newline (tabs are allowed)")
    }
    val lines = recs.map { case (id, at, tx) => s"$id\t$at\t$tx" }
    Files.write(recordsPath(root),
      lines.mkString("", "\n", "\n").getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}

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

  case class Page(records: Seq[String], nextToken: Option[String])

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

  /** One page request. `token` is the continuation from the previous
    * page (None = start of stream). */
  def fetch(root: String, token: Option[String], maxResults: Int): Page = {
    val start = token.map(_.toLong).getOrElse(0L)
    val n = math.min(math.max(maxResults, 1), MaxServerPageSize)
    logAccess(root, s"token=${token.getOrElse("-")} start=$start max=$n")
    val s = Files.lines(recordsPath(root), UTF_8)
    val records =
      try {
        val it = s.skip(start).limit(n).iterator()
        val buf = Seq.newBuilder[String]
        while (it.hasNext) buf += it.next()
        buf.result()
      } finally s.close()
    val total = countAvailable(root)
    val next =
      if (start + records.size < total) Some((start + records.size).toString)
      else None
    Page(records, next)
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

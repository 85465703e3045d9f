package graft.sources

import org.apache.spark.sql.SparkSession

/** The catalog surface — SURVEY.md §2 "What's missing #2" (round 3).
  *
  * The reference's query layer is a *catalog*: a Glue database
  * (`fanstatsai`, reference main.tf:301-303) whose tables a crawler
  * registers from landed S3 prefixes (main.tf:304-314), and which Athena
  * queries BY NAME (`SELECT … FROM fanstatsai.tweets`). This is that
  * role on the Spark session catalog, in the two scopes Spark offers:
  *
  *   - `registerExternalTables`: CATALOG-LEVEL external tables
  *     (`graft.<t>` + the `graft.events` normalizing view) — the
  *     crawler-registered form. Bytes stay where they landed; the
  *     catalog maps name → location + schema. These are metastore
  *     objects: every session sharing the metastore sees them WITHOUT
  *     re-running setup (`spark.newSession()` proves it in
  *     CatalogSuite), and against a persistent metastore (Hive, Glue)
  *     they survive JVM restart — the sandbox's in-memory metastore is
  *     the only thing keeping them process-scoped here.
  *   - `registerViews`: session-scoped temp views (`graft_<t>`) — the
  *     quick ad-hoc form, one session's namespace.
  *   - `ensurePartitionedDocs`: a MANAGED lang-partitioned table
  *     (`saveAsTable`, hive-style `lang=…/` directories ≙ the
  *     `<platform>/<league>/YYYY/MM/DD/` key layout, reference
  *     src/main.py:70-73) — partition pruning on it is asserted in
  *     PlanSuite.
  */
object Catalog {

  /** ≙ the Glue database name (`fanstatsai`, main.tf:301). */
  val Db = "graft"

  private val PathTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  // last dir registered as temp views per session — makes registerViews
  // an O(1) no-op on re-entry, so a SQL query's timed body pays for the
  // query, not for re-registering ten views (VERDICT r4 #7)
  private val viewDirs = new java.util.WeakHashMap[SparkSession, String]()

  /** Register every test table under its session-scoped name
    * (`graft_<t>`) — idempotent and O(1) when `dir` is unchanged.
    * `events` goes through Tables.events so the ns→µs timestamp
    * normalization is part of the cataloged plan, exactly like a
    * crawler-declared column type. */
  def registerViews(spark: SparkSession, dir: String): Unit = synchronized {
    if (viewDirs.get(spark) == dir) return
    PathTables.foreach { t =>
      graft.Tables.table(spark, dir, t).createOrReplaceTempView(s"graft_$t")
    }
    graft.Tables.events(spark, dir).createOrReplaceTempView("graft_events")
    viewDirs.put(spark, dir): Unit
  }

  /** Register the landed tables as DURABLE external tables
    * (`graft.<t>`) plus the `graft.events` view (ns→µs normalization
    * stored as view SQL — a crawler-declared column type). Idempotent;
    * re-pointing at a different dir replaces the definitions, matching a
    * crawler re-run. Returns the database name. */
  def registerExternalTables(spark: SparkSession, dir: String): String = synchronized {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db")
    val canon = new java.io.File(dir).getCanonicalPath
    def current(tbl: String): Option[String] =
      if (!spark.catalog.tableExists(tbl)) None
      else spark.sql(s"SHOW TBLPROPERTIES $tbl ('graft.source.dir')")
        .collect().headOption.map(_.getString(1))
        .filterNot(_.contains("does not have property"))
    def ensure(tbl: String, file: String): Unit =
      if (!current(tbl).contains(canon)) {
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        spark.sql(s"""CREATE TABLE $tbl USING parquet LOCATION '$canon/$file'
                      TBLPROPERTIES ('graft.source.dir'='$canon')""")
      }
    PathTables.foreach(t => ensure(s"$Db.$t", s"$t.parquet"))
    ensure(s"$Db.events_raw", "events.parquet")
    // persistent view: the normalization travels with the catalog, so a
    // session that has never seen graft.Tables still reads µs instants
    val cols = spark.table(s"$Db.events_raw").schema.fieldNames
      .map(c => if (c == "ts") "timestamp_micros(ts div 1000) AS ts" else s"`$c`")
    spark.sql(
      s"CREATE OR REPLACE VIEW $Db.events AS SELECT ${cols.mkString(", ")} FROM $Db.events_raw")
    Db
  }

  /** Compute catalog statistics for the given `graft.<t>` tables
    * (row counts + sizes; ≙ Glue column statistics): with stats in the
    * metastore the PLANNER sizes joins — a dimension under the broadcast
    * threshold hash-broadcasts at planning time even with AQE off, and
    * CBO (`spark.sql.cbo.enabled`) can reorder multiway joins. At 100 TB
    * the stats pass is one metadata-ish scan per table, amortized over
    * every subsequent query. */
  def analyzeTables(spark: SparkSession, tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.sql(s"ANALYZE TABLE $Db.$t COMPUTE STATISTICS")
    }

  /** Register an EXTERNAL partitioned table over hive-style directories
    * at `location` (schema inferred from the files present, partition
    * columns last). Partition directories present at registration are
    * discovered; ones landed LATER by other writers need
    * `recoverPartitions` — exactly the Glue split between the crawler's
    * first run and its daily re-crawl (reference main.tf:304-314). */
  def registerPartitionedExternal(spark: SparkSession, table: String,
                                  location: String, partCols: Seq[String]): Unit = synchronized {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db")
    if (!spark.catalog.tableExists(table)) {
      val schema = spark.read.parquet(location).schema
      val ddl = (schema.fields.filterNot(f => partCols.contains(f.name)) ++
        partCols.map(schema(_)))
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"""CREATE TABLE $table ($ddl) USING parquet
                    PARTITIONED BY (${partCols.mkString(", ")})
                    LOCATION '$location'""")
      spark.sql(s"MSCK REPAIR TABLE $table")
    }
  }

  /** Re-discover partitions landed at the table's location by writers
    * the catalog never saw (≙ the crawler's daily re-crawl picking up
    * prefixes other producers dropped in, main.tf:304-314). One listing
    * pass over the location; new directories become queryable by name,
    * and pruning over the refreshed partition index keeps working. */
  def recoverPartitions(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE $table")

  /** Register the engine's SQL-callable functions (≙ the reference's
    * Comprehend sentiment reached FROM SQL): after this,
    * `SELECT graft_sentiment(text) FROM graft.documents` works for a
    * pure-SQL user. Idempotent. */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.udf.register("graft_sentiment", graft.ops.TextOps.sentimentSqlUdf)
    ()
  }

  /** Land `documents` as a lang-partitioned MANAGED catalog table and
    * return its name. One-time per (JVM, source dir) — reruns hit the
    * tableExists fast path (≙ the crawler registering a partitioned
    * table once, then queries pruning on it forever). The database
    * lives under a temp-dir warehouse location so repeated local runs
    * never pollute the repo tree. */
  def ensurePartitionedDocs(spark: SparkSession, dir: String): String = synchronized {
    // dir-keyed name: the same JVM may catalog several scale factors.
    // 64-bit portable hash of the canonical path — a 32-bit hashCode
    // collision would silently serve the other dir's table
    val canon = new java.io.File(dir).getCanonicalPath
    val key = java.lang.Long.toHexString(graft.U.h64Local(canon))
    val tbl = s"$Db.documents_by_lang_$key"
    if (!spark.catalog.tableExists(tbl)) {
      if (!spark.catalog.databaseExists(Db)) {
        val wh = java.nio.file.Files.createTempDirectory("graft_warehouse_").toString
        spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db LOCATION '$wh'")
      }
      // a dead JVM can leave the managed location on disk while the
      // in-memory catalog forgot the table (the metastore is
      // process-scoped; the warehouse is not) — those bytes are
      // unreachable garbage, so clear them before landing
      val loc = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(spark.catalog.getDatabase(Db).locationUri),
        tbl.split('.').last)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.Tables.documents(spark, dir)
        .write.mode("overwrite")
        .partitionBy("lang")
        .saveAsTable(tbl)
    }
    tbl
  }
}

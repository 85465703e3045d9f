package graft.sources

import org.apache.spark.sql.SparkSession

/** The catalog surface — SURVEY.md §2 "What's missing #2" (round 3).
  *
  * The reference's query layer is a *catalog*: a Glue database
  * (`fanstatsai`, reference main.tf:301-303) whose tables a crawler
  * registers from landed S3 prefixes (main.tf:304-314), and which Athena
  * queries BY NAME (`SELECT … FROM fanstatsai.tweets`). This is that
  * role on the Spark session catalog: every landed dataset is
  * addressable by table name through `spark.sql`, and the
  * date/entity-partitioned layout is a *catalog-tracked partitioned
  * table* whose partition predicates prune at planning time (the Athena
  * partition-projection behavior).
  *
  * Two registration modes, matching the two catalog object kinds:
  *   - `registerViews`: session-scoped views over the parquet test
  *     tables (≙ the crawler's external tables — bytes stay where they
  *     landed, the catalog maps name → location + schema);
  *   - `ensurePartitionedDocs`: a MANAGED partitioned table
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

  /** Register every test table under its catalog name (`graft_<t>`) —
    * idempotent, cheap (a view is a name → plan mapping, no data moves).
    * `events` goes through Tables.events so the ns→µs timestamp
    * normalization is part of the cataloged plan, exactly like a
    * crawler-declared column type. */
  def registerViews(spark: SparkSession, dir: String): Unit = synchronized {
    PathTables.foreach { t =>
      graft.Tables.table(spark, dir, t).createOrReplaceTempView(s"graft_$t")
    }
    graft.Tables.events(spark, dir).createOrReplaceTempView("graft_events")
  }

  /** Land `documents` as a lang-partitioned MANAGED catalog table and
    * return its name. One-time per (JVM, source dir) — reruns hit the
    * tableExists fast path (≙ the crawler registering a partitioned
    * table once, then queries pruning on it forever). The database
    * lives under a temp-dir warehouse location so repeated local runs
    * never pollute the repo tree. */
  def ensurePartitionedDocs(spark: SparkSession, dir: String): String = synchronized {
    // dir-keyed name: the same JVM may catalog several scale factors
    val tbl = s"$Db.documents_by_lang_${(dir.hashCode & 0x7fffffff).toHexString}"
    if (!spark.catalog.tableExists(tbl)) {
      val wh = java.nio.file.Files.createTempDirectory("graft_warehouse_").toString
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db LOCATION '$wh'")
      graft.Tables.documents(spark, dir)
        .write.mode("overwrite")
        .partitionBy("lang")
        .saveAsTable(tbl)
    }
    tbl
  }
}

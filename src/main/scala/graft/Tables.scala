package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Catalog over the driver-generated parquet fixtures
  * (`/root/testdata/sf*`, see FIXTURES.md). The reference stack
  * (dbt + DuckDB + Delta Lake, `/root/reference/README.md:1-2`) treats every
  * relation as a named schema-ful table; this object is our equivalent of
  * dbt's `source()` resolution: name → DataFrame, plus temp-view
  * registration for the SQL entry point (SURVEY.md §3 EP3).
  *
  * Scale note (100 TB): reads are plain `spark.read.parquet`, so partition
  * discovery, predicate pushdown, and column pruning all flow from Catalyst
  * into the vectorized parquet reader; nothing here collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table.
    *
    * `events.ts` has shipped in two physical forms across fixture
    * generations — parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects unless read as a nanos-since-epoch long via
    * `spark.sql.legacy.parquet.nanosAsLong`) and plain TIMESTAMP(MICROS)
    * without UTC adjustment (which Spark infers as TIMESTAMP_NTZ). Both
    * normalize to Spark's native µs TimestampType here, matching DuckDB's
    * `CAST(ts AS TIMESTAMP)` (floor truncation for nanos; identity for
    * micros at the UTC session tz), so queries see ONE canonical `ts`
    * regardless of fixture vintage. Queries must still truncate to whole
    * seconds before *outputting* ts values (FIXTURES.md parity trap). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Memoized per (session, dir, name) — r19, the registerAll treatment
    // one level down: every spark.read.parquet call re-lists the file and
    // fires a one-task schema-inference job, and queries call t() for the
    // same table several times per lifecycle (a microbatch demo pays it
    // once per batch). The cached value is the LAZY analyzed plan — no
    // data, no results; the fixtures are immutable and the key carries
    // the dir, so a session switching fixture dirs (the test suites)
    // misses cleanly. Weak session keys collect on session stop.
    val m = tables.synchronized {
      var c = tables.get(spark)
      if (c == null) {
        c = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        tables.put(spark, c)
      }
      c
    }
    m.getOrElseUpdate((dir, name), tUncached(spark, dir, name))
  }

  private val tables = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]())

  private def tUncached(spark: SparkSession, dir: String,
      name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos-era fixture
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => // TIMESTAMP_NTZ micros fixture: identity cast at UTC
          raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register all fixture tables as temp views (idempotent) so queries can
    * use `spark.sql(...)` — the ad-hoc SQL entry point of the reference
    * stack (DuckDB CLI / `dbt show`).
    *
    * Memoized per (session, dir): ~24 declared queries call this, and each
    * un-memoized call re-reads all 10 parquet footers for schema inference
    * (~100 ms serial driver work, contended under the concurrent bench).
    * Re-registers when the SAME session switches fixture dirs (the test
    * suites do); a session key holds no value reference back, so stopped
    * sessions collect out of the weak map. Nothing here caches DATA — the
    * views are lazy plans over the parquet files. */
  private val registered = new java.util.WeakHashMap[SparkSession, String]()
  def registerAll(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      if (registered.get(spark) != dir) {
        names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir)
      }
    }
}

/** One declared query: the Spark-side implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle twin the driver
  * hash-compares against (SURVEY.md §0, §5).
  *
  * Parity rules applied to every oracle-checked query (SURVEY.md §7.3):
  * explicit total ORDER BY, doubles rounded, DuckDB wide int results cast
  * down to Spark's types (sum(int)→BIGINT, length→INTEGER, ...),
  * `events.ts` (ns) truncated to whole seconds before use.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, spark: String, oracle: String): QueryDef = {
    // Same SQL text runs on Spark (over registered temp views) by default.
    val s = spark
    QueryDef(name, (sp, dir) => { Tables.registerAll(sp, dir); sp.sql(s) }, Some(oracle))
  }
}

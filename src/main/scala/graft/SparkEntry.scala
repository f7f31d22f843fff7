package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator row of SURVEY.md §2 is declared here as a named query
  * (name prefix = inventory row id, e.g. `j7_asof_join` ↔ §2.3 J7). Each
  * SQL-expressible query carries a DuckDB oracle twin in [[oracleSql]];
  * non-SQL-expressible operators (time travel, MinHash-LSH, ...) are
  * declared without an oracle → the driver records a rows-only check, and
  * the scalatest suites carry their correctness instead.
  */
object SparkEntry {

  private val modules: Seq[Seq[QueryDef]] = Seq(
    graft.queries.Relational.defs,
    graft.queries.Scalars.defs,
    graft.queries.Incremental.defs,
    graft.queries.Llm.defs,
    graft.queries.Medallion.defs,
    graft.queries.Graph.defs
  )

  private lazy val all: Seq[QueryDef] = {
    val qs = modules.flatten
    // Seq.toMap keeps the LAST duplicate silently — a same-named QueryDef
    // in two modules (or twice in one) ships the wrong query with no
    // signal (the r16 l2_containment shadowing). Fail loudly instead.
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names would silently shadow: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style pricing summary (SURVEY §7.2 M0). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.a1GroupbyAggs(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

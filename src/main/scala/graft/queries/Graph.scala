package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the star-schema-derived trade graph
  * (SURVEY.md §2.11 G-family). The reference stack (dbt + DuckDB,
  * `/root/reference/README.md:1-2`) runs graph-shaped SQL via recursive
  * CTEs; the Spark-first re-expression is the Pregel-style iterate:
  * a static `edges` frame hash-partitioned on `src`, a `ranks` frame
  * co-keyed on node, and each superstep = one co-partitioned join plus
  * one `dst`-keyed aggregate — the partitioning is declared once and
  * every iteration reuses it, so N supersteps cost N shuffles of the
  * rank table (never the corpus).
  *
  * Engine parity: ranks are SCALED BIGINTs with floor division
  * (`div` in Spark ≡ `//` in DuckDB) — every superstep is
  * integer-exact, so the oracle (the same iterations unrolled as CTEs)
  * matches bit-for-bit with no float-summation order concerns.
  */
object Graph {

  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------- G1
    // PageRank over the customer↔supplier trade graph (edges = distinct
    // (customer, supplier) pairs that share an order, symmetrized so
    // every node has in- and out-edges). Three damped supersteps
    // (d = 0.85) in scaled-integer arithmetic: rank₀ = R/n with
    // R = 10¹², contribution = rank div degree, rank' = (0.15·R) div n
    // + (0.85 · Σ contrib) — all BIGINT floor ops, so iteration order
    // and partial-agg order cannot perturb the result. At 100 TB:
    // the static frames (edges, degrees) and each superstep's ranks are
    // LAZILY localCheckpointed — without the cut every superstep's plan
    // re-derives its inputs from the source scan (iteration k re-reads
    // the corpus k times); lazy (not eager) so the whole iterate still
    // executes as ONE action with each intermediate materialized once,
    // instead of paying a scheduler round-trip per eager checkpoint
    // job (the Pregel contract; same lineage-cut pattern as
    // Dedup.connectedComponents). Checkpoint blocks are freed by the
    // ContextCleaner once unreferenced. The node count rides a
    // broadcast 1-row frame (no driver action).
    QueryDef("g1_pagerank", (s, dir) => {
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("a"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(false)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .localCheckpoint(false)
      val nf = broadcast(deg.agg(count(lit(1)).as("n")))
      var ranks = deg.crossJoin(nf)
        .select(col("src").as("node"), expr("1000000000000 div n").as("pr"))
        .localCheckpoint(false)
      for (_ <- 1 to 3) {
        ranks = edges
          .join(ranks, edges("src") === ranks("node"))
          .join(deg, Seq("src"))
          .select(col("dst"), expr("pr div d").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
          .crossJoin(nf)
          .select(col("dst").as("node"),
            expr("150000000000 div n + (sc * 85) div 100").as("pr"))
          .localCheckpoint(false)
      }
      ranks.orderBy(col("pr").desc, col("node").asc).limit(20)
    }, Some(
      """WITH pairs AS (
           SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         edges AS (
           SELECT a AS src, b AS dst FROM pairs
           UNION ALL SELECT b AS src, a AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         nn AS (SELECT count(*) AS n FROM deg),
         r0 AS (SELECT src AS node, 1000000000000 // (SELECT n FROM nn) AS pr
                FROM deg),
         r1 AS (SELECT e.dst AS node,
                       150000000000 // (SELECT n FROM nn)
                         + (sum(r.pr // dg.d) * 85) // 100 AS pr
                FROM edges e JOIN r0 r ON e.src = r.node
                     JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst),
         r2 AS (SELECT e.dst AS node,
                       150000000000 // (SELECT n FROM nn)
                         + (sum(r.pr // dg.d) * 85) // 100 AS pr
                FROM edges e JOIN r1 r ON e.src = r.node
                     JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst),
         r3 AS (SELECT e.dst AS node,
                       150000000000 // (SELECT n FROM nn)
                         + (sum(r.pr // dg.d) * 85) // 100 AS pr
                FROM edges e JOIN r2 r ON e.src = r.node
                     JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst)
         SELECT node, pr FROM r3
         ORDER BY pr DESC, node ASC LIMIT 20"""))
  )
}

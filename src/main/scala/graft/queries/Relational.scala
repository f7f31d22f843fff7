package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core (SURVEY.md §2.1 S1, §2.2 P1-P6, §2.3 J1-J8, §2.4 A1-A9,
  * §2.5 W1-W4, §2.6 O1-O6). The reference provides these through DuckDB SQL
  * under dbt models (`/root/reference/README.md:1-2`); here each is declared
  * Spark-first with the DataFrame API (or Spark SQL where the construct is
  * SQL-native, e.g. GROUPING SETS, correlated subqueries) so Catalyst picks
  * the physical strategy — broadcast vs shuffle joins, partial aggregation,
  * TakeOrderedAndProject for top-k, whole-stage codegen throughout.
  *
  * Scale notes are inline per query; the common ones:
  *  - dimension tables (region/nation/supplier/part/customer) stay under the
  *    broadcast threshold at any SF because they grow sublinearly vs the
  *    fact table → star joins are broadcast-hash, no shuffle of lineitem.
  *  - aggregations use hash partial+final (map-side combine) — the shuffled
  *    payload is |groups| × partitions, not |rows|.
  *  - every query pins a total ORDER BY only at the very top (a single
  *    final sort of an already-reduced result), never mid-plan.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  // ---------------------------------------------------------------- S1 + A1
  /** TPC-H Q1-style pricing summary: scan → filter → hash agg → sort.
    * Flagship (`SparkEntry.entry`). Pushdown: the l_shipdate predicate
    * reaches the parquet scan; only 7 of 12 lineitem columns are read. */
  def a1GroupbyAggs(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (round((sum(col("l_quantity")))*100)/100).as("sum_qty"),
        (round((sum(col("l_extendedprice")))*100)/100).as("sum_base_price"),
        (round((sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))*100)/100).as("sum_disc_price"),
        (round((sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))*100)/100).as("sum_charge"),
        (round((avg(col("l_quantity")))*10000)/10000).as("avg_qty"),
        (round((avg(col("l_extendedprice")))*10000)/10000).as("avg_price"),
        (round((avg(col("l_discount")))*10000)/10000).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
  }

  val a1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
       (round((sum(l_quantity))*100)/100) AS sum_qty,
       (round((sum(l_extendedprice))*100)/100) AS sum_base_price,
       (round((sum(l_extendedprice*(1-l_discount)))*100)/100) AS sum_disc_price,
       (round((sum(l_extendedprice*(1-l_discount)*(1+l_tax)))*100)/100) AS sum_charge,
       (round((avg(l_quantity))*10000)/10000) AS avg_qty,
       (round((avg(l_extendedprice))*10000)/10000) AS avg_price,
       (round((avg(l_discount))*10000)/10000) AS avg_disc,
       count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("a1_groupby_aggs", a1GroupbyAggs, Some(a1Oracle)),

    // -------------------------------------------------------------- S1 / P1
    // Projection with computed expressions + aliases; column pruning means
    // the scan reads exactly the 5 referenced columns.
    QueryDef("p1_projection", (s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (round((col("l_extendedprice") * (lit(1) - col("l_discount")))*100)/100).as("net_price"),
          (round((col("l_extendedprice") * col("l_tax"))*100)/100).as("tax_amt"),
          (col("l_quantity") > 25).as("bulk"))
        .orderBy(col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
    }, Some(
      """SELECT l_orderkey, l_linenumber,
         (round((l_extendedprice*(1-l_discount))*100)/100) AS net_price,
         (round((l_extendedprice*l_tax)*100)/100) AS tax_amt,
         l_quantity > 25 AS bulk
         FROM lineitem
         ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST""")),

    // ------------------------------------------------------------------- P2
    // Filter stack: conjunction/disjunction, IN, BETWEEN, LIKE, IS NOT NULL.
    // All of these are pushable predicates (parquet row-group skipping).
    QueryDef("p2_filter_predicates", (s, dir) => {
      t(s, dir, "orders")
        .filter(
          col("o_orderstatus").isin("F", "O") &&
          col("o_totalprice").between(1000, 200000) &&
          (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")) &&
          col("o_orderdate").isNotNull)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          (round((col("o_totalprice"))*100)/100).as("o_totalprice"))
        .orderBy(col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
         (round((o_totalprice)*100)/100) AS o_totalprice
         FROM orders
         WHERE o_orderstatus IN ('F','O')
           AND o_totalprice BETWEEN 1000 AND 200000
           AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
           AND o_orderdate IS NOT NULL
         ORDER BY o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- P3
    QueryDef("p3_case_when", (s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "standard")
            .otherwise("premium").as("tier"))
        .groupBy(col("tier")).agg(count(lit(1)).as("n"))
        .orderBy(col("tier").asc_nulls_last)
    }, Some(
      """SELECT CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                     WHEN c_acctbal < 5000 THEN 'standard'
                     ELSE 'premium' END AS tier, count(*) AS n
         FROM customer GROUP BY 1 ORDER BY tier ASC NULLS LAST""")),

    // ------------------------------------------------------------------- P4
    QueryDef("p4_distinct", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
    }, Some(
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""")),

    // ------------------------------------------------------------------- P5
    // DuckDB QUALIFY analogue: window + filter (latest order per customer).
    // Scale: single hash-partitioned window by o_custkey — one shuffle, no
    // driver involvement; at 100 TB this is the standard distinct-on plan.
    QueryDef("p5_qualify", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("latest_date"))
        .orderBy(col("o_custkey").asc_nulls_last)
    }, Some(
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date
         FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1
         ORDER BY o_custkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- P6
    // Deterministic systematic sample (event_id % 20) — reproducible across
    // engines, unlike rand(); Bernoulli sampling (`df.sample`) is
    // demonstrated in the scalatest suite where determinism vs an external
    // oracle isn't required.
    QueryDef("p6_sample", (s, dir) => {
      t(s, dir, "events")
        .filter(col("event_id") % 20 === 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), (round((sum(col("value")))*100)/100).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_last)
    }, Some(
      """SELECT event_type, count(*) AS n, (round((sum(value))*100)/100) AS sum_value
         FROM events WHERE event_id % 20 = 0
         GROUP BY event_type ORDER BY event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------- P6 (b)
    // Hash-Bernoulli sample: each row kept iff md5(key) falls under a
    // threshold — i.i.d. per row like `df.sample(0.25)` but reproducible
    // across engines (md5 is bit-identical everywhere, unlike rand()).
    // First hex digit < '4' keeps 4/16 = 25% of rows. At 100 TB this is a
    // pure map-side filter — no shuffle, pushes nothing to the driver.
    QueryDef("p6_sample_bernoulli", (s, dir) => {
      t(s, dir, "events")
        .filter(substring(md5(col("event_id").cast("string")), 1, 1) < "4")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), (round((sum(col("value")))*100)/100).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_last)
    }, Some(
      """SELECT event_type, count(*) AS n, (round((sum(value))*100)/100) AS sum_value
         FROM events WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '4'
         GROUP BY event_type ORDER BY event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J1
    // TPC-H Q5-style star join: lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈
    // nation ⋈ region. Catalyst broadcasts every dimension side (all far
    // below the 10 MB threshold at any SF since dims grow sublinearly);
    // lineitem is never shuffled.
    QueryDef("j1_join_inner", (s, dir) => {
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((round((sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))*100)/100).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc_nulls_last, col("n_name").asc_nulls_last)
    }, Some(
      """SELECT n_name,
         (round((sum(l_extendedprice*(1-l_discount)))*100)/100) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY n_name
         ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J2
    // Left outer join preserving customers with no orders; right side
    // pre-aggregated before the join so the outer join is group-to-one.
    QueryDef("j2_outer_join", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("spend"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          coalesce(sum(col("n_orders")), lit(0L)).as("n_orders"),
          (round((coalesce(sum(col("spend")), lit(0.0)))*100)/100).as("total_spend"),
          sum(when(col("n_orders").isNull, 1).otherwise(0)).as("inactive"))
        .orderBy(col("c_mktsegment").asc_nulls_last)
    }, Some(
      """SELECT c_mktsegment, count(*) AS n_customers,
         CAST(coalesce(sum(n_orders),0) AS BIGINT) AS n_orders,
         (round((coalesce(sum(spend),0))*100)/100) AS total_spend,
         CAST(sum(CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS inactive
         FROM customer LEFT JOIN
           (SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
            FROM orders GROUP BY o_custkey) o
           ON c_custkey = o_custkey
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J3
    // Left semi join = EXISTS. No payload from the right side is carried —
    // at scale this shuffles only the join key of the probe side.
    QueryDef("j3_semi_join", (s, dir) => {
      val c = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey").asc_nulls_last)
    }, Some(
      """SELECT c_nationkey, count(*) AS n_customers
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c.c_custkey
                         AND o_orderpriority = '1-URGENT')
         GROUP BY c_nationkey ORDER BY c_nationkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J4
    // Left anti join = NOT EXISTS (the null-safe variant; SURVEY §7.3 flags
    // NOT IN's null semantics — we deliberately use NOT EXISTS in both
    // engines so the semantics agree).
    QueryDef("j4_anti_join", (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      p.join(l, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_brand"))
        .orderBy(col("p_partkey").asc_nulls_last)
    }, Some(
      """SELECT p_partkey, p_brand FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p.p_partkey)
         ORDER BY p_partkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J5
    QueryDef("j5_cross_join", (s, dir) => {
      val r = t(s, dir, "region").select(col("r_name"))
      val n = t(s, dir, "nation").select(col("n_name"))
      r.crossJoin(n)
        .orderBy(col("r_name").asc_nulls_last, col("n_name").asc_nulls_last)
    }, Some(
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J6
    // Non-equi (range) join against a tiny bracket relation →
    // BroadcastNestedLoopJoin with the 3-row side broadcast; the fact side
    // streams through without a shuffle. At 100 TB the bracket side is
    // still constant-size → same plan holds.
    QueryDef("j6_range_join", (s, dir) => {
      import s.implicits._
      val brackets = Seq(("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 1e9))
        .toDF("bracket", "lo", "hi")
      t(s, dir, "lineitem")
        .join(broadcast(brackets),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy(col("bracket"))
        .agg(count(lit(1)).as("n"), (round((avg(col("l_extendedprice")))*100)/100).as("avg_price"))
        .orderBy(col("bracket").asc_nulls_last)
    }, Some(
      """SELECT bracket, count(*) AS n, (round((avg(l_extendedprice))*100)/100) AS avg_price
         FROM lineitem
         JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 25.0), ('high', 25.0, 1e9))
              AS b(bracket, lo, hi)
           ON l_quantity >= lo AND l_quantity < hi
         GROUP BY bracket ORDER BY bracket ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J8
    // Correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + join (no per-row re-execution, unlike a naive nested
    // loop). Declared in SQL because that's the construct's native surface.
    QueryDef("j8_correlated_subquery", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderkey, (round((o_totalprice)*100)/100) AS o_totalprice
           FROM orders o
           WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                     WHERE o2.o_custkey = o.o_custkey)
           ORDER BY o_orderkey ASC NULLS LAST""")
    }, Some(
      """SELECT o_orderkey, (round((o_totalprice)*100)/100) AS o_totalprice
         FROM orders o
         WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                   WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------- W1 (c)
    // NTILE bucketing — equal-frequency splits over a total order (the
    // train/val/test-split shape: deterministic decile assignment, floor
    // distribution with the remainder to the leading buckets in both
    // engines). A bare `ntile(10) OVER (ORDER BY ...)` moves EVERY
    // customer row to one partition — the one window shape that cannot
    // survive a 100× scale-up — so the Spark side is the DISTRIBUTED
    // exact ntile (the l4_perplexity move): bin by a value-monotone
    // range of the leading sort key (c_acctbal spans a fixed [-1000,
    // 10000) domain, so `floor(bal/100)` gives ≤111 bins regardless of
    // row count), exact global rank via the two-phase
    // [[graft.operators.DistributedRank]], then ntile's closed form
    // bucket(r, n): the first n%10 buckets hold ⌈n/10⌉ rows, the rest
    // ⌊n/10⌋ — identical semantics to the oracle's global ntile(10),
    // with only the ≤111-row bin-offsets frame ever single-partitioned.
    QueryDef("w1_ntile", (s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      graft.operators.DistributedRank.withGlobalRank(cust,
          expr("CAST(floor(c_acctbal / 100.0D) AS BIGINT)"),
          Seq(col("c_acctbal").asc, col("c_custkey").asc),
          "r", totalOut = Some("n_rows"))
        .withColumn("decile", expr(
          """CAST(CASE WHEN r <= (n_rows % 10L) * ((n_rows div 10L) + 1L)
             THEN ((r - 1L) div ((n_rows div 10L) + 1L)) + 1L
             ELSE (n_rows % 10L)
                  + ((r - 1L - (n_rows % 10L) * ((n_rows div 10L) + 1L))
                     div (n_rows div 10L))
                  + 1L
             END AS INT)"""))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          (round(min(col("c_acctbal")) * 100) / 100).as("lo"),
          (round(max(col("c_acctbal")) * 100) / 100).as("hi"))
        .orderBy(col("decile").asc_nulls_last)
    }, Some(
        """WITH t AS (
             SELECT c_custkey, c_acctbal,
                    CAST(ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC)
                      AS INTEGER) AS decile
             FROM customer)
           SELECT decile, count(*) AS n,
                  (round((min(c_acctbal))*100)/100) AS lo,
                  (round((max(c_acctbal))*100)/100) AS hi
           FROM t GROUP BY decile ORDER BY decile ASC NULLS LAST""")),

    // ------------------------------------------------------------------ J10
    // LATERAL join (DuckDB lateral / Spark 3.2+ lateral subquery): top-3
    // customers by balance PER NATION, the classic per-group top-N as a
    // correlated inline subquery. Catalyst decorrelates the LIMIT into a
    // ranked window under the hood — declarative text, no manual
    // self-join. Same SQL runs on both engines.
    QueryDef.sql("j10_lateral_join",
      spark =
        """SELECT n.n_name, c.c_custkey, c.bal
           FROM nation n, LATERAL (
             SELECT c_custkey, (round((c_acctbal)*100)/100) AS bal
             FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3) c
           ORDER BY n.n_name ASC NULLS LAST, c.bal DESC NULLS LAST,
                    c.c_custkey ASC NULLS LAST""",
      oracle =
        """SELECT n.n_name, c.c_custkey, c.bal
           FROM nation n, LATERAL (
             SELECT c_custkey, (round((c_acctbal)*100)/100) AS bal
             FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 3) c
           ORDER BY n.n_name ASC NULLS LAST, c.bal DESC NULLS LAST,
                    c.c_custkey ASC NULLS LAST"""),

    // ------------------------------------------------------------------ J11
    // POSITIONAL JOIN (DuckDB's row-aligned join): pair the i-th row of
    // one ordered derivation with the i-th of another — the spreadsheet
    // paste-columns-side-by-side operation. Spark expresses it as a
    // row_number equi-join over each side's EXPLICIT total order (the
    // oracle restates DuckDB's operator the same way, which is also its
    // standard rewrite). Inherently order-dependent, so it only makes
    // sense on small ordered sides — each side's window is one
    // single-partition pass by construction; keyed joins remain the
    // at-scale tool, this exists for reference parity.
    QueryDef("j11_positional_join", (s, dir) => {
      val byBal = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc).limit(20)
        .withColumn("pos", row_number().over(
          Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
      val byPrice = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(20)
        .withColumn("pos", row_number().over(
          Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      byBal.join(byPrice, Seq("pos"))
        .select(col("pos").cast("long").as("pos"), col("c_custkey"),
          expr("round(c_acctbal*100)/100").as("bal"),
          col("o_orderkey"), expr("round(o_totalprice*100)/100").as("price"))
        .orderBy(col("pos").asc_nulls_last)
    }, Some(
      """WITH a AS (
           SELECT row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS pos,
                  c_custkey, (round(c_acctbal*100)/100) AS bal
           FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20),
         b AS (
           SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS pos,
                  o_orderkey, (round(o_totalprice*100)/100) AS price
           FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20)
         SELECT a.pos AS pos, c_custkey, bal, o_orderkey, price
         FROM a POSITIONAL JOIN b
         ORDER BY pos ASC NULLS LAST""")),

    // ------------------------------------------------------------------- J9
    // Recursive CTE (DuckDB WITH RECURSIVE; Spark 4 added support) — the
    // dbt_utils.date_spine pattern: generate a gap-free day spine and
    // left join the daily mart to expose zero-sale days. The same SQL
    // text runs on both engines.
    QueryDef.sql("j9_recursive_cte",
      spark =
        """WITH RECURSIVE spine(day) AS (
             SELECT DATE '1995-01-01'
             UNION ALL
             SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM spine
             WHERE day < DATE '1995-03-31'),
           daily AS (
             SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n,
                    (round((sum(l_extendedprice))*100)/100) AS rev
             FROM lineitem GROUP BY 1)
           SELECT s.day, coalesce(n, CAST(0 AS BIGINT)) AS n_items,
                  coalesce(rev, 0.0) AS revenue
           FROM spine s LEFT JOIN daily d ON s.day = d.day
           ORDER BY s.day ASC NULLS LAST""",
      oracle =
        """WITH RECURSIVE spine(day) AS (
             SELECT DATE '1995-01-01'
             UNION ALL
             SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM spine
             WHERE day < DATE '1995-03-31'),
           daily AS (
             SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n,
                    (round((sum(l_extendedprice))*100)/100) AS rev
             FROM lineitem GROUP BY 1)
           SELECT s.day, coalesce(n, CAST(0 AS BIGINT)) AS n_items,
                  coalesce(rev, 0.0) AS revenue
           FROM spine s LEFT JOIN daily d ON s.day = d.day
           ORDER BY s.day ASC NULLS LAST"""),

    // ------------------------------------------------------------------- A2
    QueryDef("a2_count_distinct", (s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type").asc_nulls_last)
    }, Some(
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------------- A4
    // GROUPING SETS via ROLLUP + CUBE. NULL group markers replaced with
    // 'ALL' via coalesce so null-ordering quirks can't bite.
    QueryDef("a4_rollup_cube", (s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), (round((sum(col("o_totalprice")))*100)/100).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status").asc_nulls_last, col("priority").asc_nulls_last)
    }, Some(
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
                coalesce(o_orderpriority,'ALL') AS priority,
                count(*) AS n, (round((sum(o_totalprice))*100)/100) AS total
         FROM orders
         GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY status ASC NULLS LAST, priority ASC NULLS LAST""")),

    // ------------------------------------------------------------- A4 (b)
    // GROUPING SETS literal form ((a),(b),()) + grouping_id() so each
    // output row carries which set produced it — the part ROLLUP/CUBE can't
    // express. Same SQL shape in both engines (grouping_id bit order is
    // leftmost-column = most-significant bit in Spark and DuckDB alike);
    // grouping_id cast to INTEGER because DuckDB returns BIGINT.
    QueryDef.sql("a4_grouping_sets",
      spark =
        """SELECT coalesce(o_orderstatus,'ALL') AS status,
                  coalesce(o_orderpriority,'ALL') AS priority,
                  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
                  count(*) AS n,
                  (round((sum(o_totalprice))*100)/100) AS total
           FROM orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           ORDER BY gid ASC NULLS LAST, status ASC NULLS LAST,
                    priority ASC NULLS LAST""",
      oracle =
        """SELECT coalesce(o_orderstatus,'ALL') AS status,
                  coalesce(o_orderpriority,'ALL') AS priority,
                  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
                  count(*) AS n,
                  (round((sum(o_totalprice))*100)/100) AS total
           FROM orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           ORDER BY gid ASC NULLS LAST, status ASC NULLS LAST,
                    priority ASC NULLS LAST"""),

    // ------------------------------------------------------------- A4 (c)
    // GROUP BY ALL / ORDER BY ALL — the DuckDB SQL convenience the
    // reference's dbt models lean on; Spark 4 speaks the identical
    // dialect, so one SQL text runs on both engines (like the recursive
    // CTE). Resolves to the same keyed hash agg as an explicit GROUP BY.
    QueryDef.sql("a11_group_by_all",
      spark =
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                  (round((avg(o_totalprice))*100)/100) AS avg_total
           FROM orders
           GROUP BY ALL
           ORDER BY ALL NULLS LAST""",
      oracle =
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                  (round((avg(o_totalprice))*100)/100) AS avg_total
           FROM orders
           GROUP BY ALL
           ORDER BY ALL NULLS LAST"""),

    // ------------------------------------------------------------------- A5
    // Filtered aggregation (DuckDB `FILTER (WHERE ...)`) via conditional
    // aggregation — identical partial-agg pipeline, no extra pass.
    QueryDef("a5_filtered_agg", (s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "purchase", 1)).as("purchases"),
          count(when(col("event_type") === "click", 1)).as("clicks"),
          (round((coalesce(sum(when(col("event_type") === "purchase", col("value"))), lit(0.0)))*100)/100)
            .as("purchase_value"))
        .filter(col("purchases") > 0)
        .orderBy(col("user_id").asc_nulls_last)
    }, Some(
      """SELECT user_id,
                count(*) FILTER (WHERE event_type='purchase') AS purchases,
                count(*) FILTER (WHERE event_type='click') AS clicks,
                (round((coalesce(sum(value) FILTER (WHERE event_type='purchase'),0))*100)/100)
                  AS purchase_value
         FROM events GROUP BY user_id
         HAVING count(*) FILTER (WHERE event_type='purchase') > 0
         ORDER BY user_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------- A6
    QueryDef("a6_having", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), (round((sum(col("l_quantity")))*100)/100).as("qty"))
        .filter(col("n") >= 40)
        .orderBy(col("l_partkey").asc_nulls_last)
    }, Some(
      """SELECT l_partkey, count(*) AS n, (round((sum(l_quantity))*100)/100) AS qty
         FROM lineitem GROUP BY l_partkey HAVING count(*) >= 40
         ORDER BY l_partkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- A7
    // Ordered list/string aggregation. Order pinned by sorting the
    // collected array (collect_list order is otherwise partition-dependent
    // — SURVEY §7.3).
    QueryDef("a7_string_agg", (s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      c.filter(col("c_acctbal") > 9000)
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(concat_ws("|", array_sort(collect_list(col("c_name")))).as("vips"),
          count(lit(1)).as("n_vips"))
        .orderBy(col("n_name").asc_nulls_last)
    }, Some(
      """SELECT n_name, string_agg(c_name, '|' ORDER BY c_name) AS vips,
                count(*) AS n_vips
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE c_acctbal > 9000
         GROUP BY n_name ORDER BY n_name ASC NULLS LAST""")),

    // ------------------------------------------------------------------- A8
    // Statistical aggregates; exact percentile (not approx) for oracle
    // parity. At 100 TB you'd swap `percentile` for `percentile_approx`
    // (t-digest, mergeable) — exact percentile requires a full sort per
    // group; noted here deliberately.
    QueryDef("a8_stats_aggs", (s, dir) => {
      // r18: the two exact percentiles move to GroupedPercentile (rank
      // arithmetic on a sorted window; bit-equal parity pinned in
      // OperatorSpec) and rejoin the moment aggregates on the 3-row group
      // frame. One percentile in the agg list forced the WHOLE aggregate
      // — stddev/var/corr/min/max included — onto the ObjectHashAggregate
      // path (2.8 s solo at sf0.1); split, the moments run as one codegen
      // hash agg and the percentiles as one narrow sort.
      val li = t(s, dir, "lineitem")
      val moments = li.groupBy(col("l_returnflag"))
        .agg(
          (round((stddev_samp(col("l_quantity")))*10000)/10000).as("sd_qty"),
          (round((var_samp(col("l_quantity")))*10000)/10000).as("var_qty"),
          (round((corr(col("l_quantity"), col("l_extendedprice")))*10000)/10000).as("corr_qty_price"),
          (round((min(col("l_discount")))*100)/100).as("min_disc"),
          (round((max(col("l_discount")))*100)/100).as("max_disc"))
      val pct = graft.operators.GroupedPercentile.of(li,
        Seq("l_returnflag"), "l_extendedprice",
        Seq(("p50", 0.5), ("p90", 0.9)))
      moments.join(broadcast(pct), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("sd_qty"), col("var_qty"),
          col("corr_qty_price"),
          (round(col("p50")*10000)/10000).as("median_price"),
          (round(col("p90")*10000)/10000).as("p90_price"),
          col("min_disc"), col("max_disc"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }, Some(
      """SELECT l_returnflag,
                (round((stddev_samp(l_quantity))*10000)/10000) AS sd_qty,
                (round((var_samp(l_quantity))*10000)/10000) AS var_qty,
                (round((corr(l_quantity, l_extendedprice))*10000)/10000) AS corr_qty_price,
                (round((quantile_cont(l_extendedprice, 0.5))*10000)/10000) AS median_price,
                (round((quantile_cont(l_extendedprice, 0.9))*10000)/10000) AS p90_price,
                (round((min(l_discount))*100)/100) AS min_disc,
                (round((max(l_discount))*100)/100) AS max_disc
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A14
    // Linear-regression aggregate family (regr_*): slope/intercept/R²/
    // avgx/avgy per group — the SQL-standard bivariate fit both engines
    // implement natively. Single-pass mergeable moments (sums of x, y,
    // xy, x²), so at 100 TB it is one partial+final hash agg like A1;
    // results round to 6 dp (the moment arithmetic differs in the last
    // ulp across engines).
    QueryDef("a14_regr_aggs", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          (round((expr("regr_slope(l_extendedprice, l_quantity)"))*1000000)/1000000).as("slope"),
          (round((expr("regr_intercept(l_extendedprice, l_quantity)"))*1000000)/1000000).as("intercept"),
          (round((expr("regr_r2(l_extendedprice, l_quantity)"))*1000000)/1000000).as("r2"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n"),
          (round((expr("regr_avgx(l_extendedprice, l_quantity)"))*1000000)/1000000).as("avgx"),
          (round((expr("regr_avgy(l_extendedprice, l_quantity)"))*1000000)/1000000).as("avgy"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }, Some(
      """SELECT l_returnflag,
                (round((regr_slope(l_extendedprice, l_quantity))*1000000)/1000000) AS slope,
                (round((regr_intercept(l_extendedprice, l_quantity))*1000000)/1000000) AS intercept,
                (round((regr_r2(l_extendedprice, l_quantity))*1000000)/1000000) AS r2,
                CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
                (round((regr_avgx(l_extendedprice, l_quantity))*1000000)/1000000) AS avgx,
                (round((regr_avgy(l_extendedprice, l_quantity))*1000000)/1000000) AS avgy
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag ASC NULLS LAST""")),

    // ------------------------------------------------------------------- A3
    // Approximate distinct (HLL++). Approximate ⇒ no hash oracle (SURVEY
    // §2.4 A3); rows-only here, tolerance vs exact in FunctionsSpec. At
    // 100 TB this is the distinct-count of choice: mergeable sketches,
    // no per-key state explosion.
    QueryDef("a3_approx_distinct", (s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------------ A13
    // Approximate percentile (mergeable quantile sketch). Approximate ⇒
    // rows-only like A3; tolerance vs the exact percentile in
    // FunctionsSpec. At 100 TB this replaces a12's exact sort-based
    // percentile: the sketch is a bounded-size, mergeable partial
    // aggregate, so no per-group sort ever happens.
    QueryDef("a13_approx_percentile", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50"),
          expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("p95"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------------ A10
    // Boolean aggregates (DuckDB bool_and/bool_or ≡ Spark bool_and/bool_or).
    QueryDef("a10_bool_aggs", (s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(bool_and(col("value") > 0).as("all_positive"),
          bool_or(col("value") > 95).as("any_large"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_last)
    }, Some(
      """SELECT event_type,
                bool_and(value > 0) AS all_positive,
                bool_or(value > 95) AS any_large,
                count(*) AS n
         FROM events GROUP BY event_type
         ORDER BY event_type ASC NULLS LAST""")),

    // ------------------------------------------------------------- W1 (b)
    // cume_dist — the remaining ranking-family member (needs a total
    // order per partition for determinism, as w1).
    QueryDef("w1_cume_dist", (s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          expr("round((cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC))*10000)/10000").as("cd"))
        .orderBy(col("c_nationkey").asc_nulls_last, col("c_custkey").asc_nulls_last)
    }, Some(
      """SELECT c_nationkey, c_custkey,
                (round((cume_dist() OVER (PARTITION BY c_nationkey
                   ORDER BY c_acctbal ASC, c_custkey ASC))*10000)/10000) AS cd
         FROM customer
         ORDER BY c_nationkey ASC NULLS LAST, c_custkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- A9
    // DISTINCT ON (DuckDB) = row_number + filter: first event per user.
    QueryDef("a9_distinct_on", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("first_event"),
          col("event_type").as("first_type"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some(
      """SELECT user_id, event_id AS first_event, event_type AS first_type
         FROM (SELECT user_id, event_id, event_type,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------- W1
    // Ranking family. ntile/percent_rank need a total order per partition —
    // tie-broken by key for determinism.
    QueryDef("w1_ranking", (s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          (round((percent_rank().over(w))*10000)/10000).as("pct_rank"))
        .filter(col("rn") <= 5)
        .orderBy(col("c_nationkey").asc_nulls_last, col("rn").asc_nulls_last)
    }, Some(
      """SELECT c_nationkey, c_custkey,
                CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
                CAST(drnk AS INTEGER) AS drnk,
                CAST(quartile AS INTEGER) AS quartile,
                (round((pct_rank)*10000)/10000) AS pct_rank
         FROM (SELECT c_nationkey, c_custkey,
                 row_number() OVER w AS rn, rank() OVER w AS rnk,
                 dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile,
                 percent_rank() OVER w AS pct_rank
               FROM customer
               WINDOW w AS (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC))
         WHERE rn <= 5
         ORDER BY c_nationkey ASC NULLS LAST, rn ASC NULLS LAST""")),

    // ------------------------------------------------------------------- W2
    // Analytic family: lag/lead/first/last/nth over a per-customer order
    // timeline. last_value needs the full-partition frame (Spark's default
    // frame stops at CURRENT ROW) — pinned explicitly in both engines.
    QueryDef("w2_lag_lead", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          first(col("o_orderkey")).over(wFull).as("first_order"),
          last(col("o_orderkey")).over(wFull).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_custkey, o_orderkey,
                lag(o_orderkey, 1) OVER w AS prev_order,
                lead(o_orderkey, 1) OVER w AS next_order,
                first_value(o_orderkey) OVER w AS first_order,
                last_value(o_orderkey) OVER w AS last_order,
                nth_value(o_orderkey, 2) OVER w AS second_order
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- W3
    // Explicit ROWS frame: centered moving average over each customer's
    // order history.
    QueryDef("w3_window_frames", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-2, 0)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (round((avg(col("o_totalprice")).over(w))*100)/100).as("mov_avg3"),
          (round((min(col("o_totalprice")).over(w))*100)/100).as("mov_min3"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_custkey, o_orderkey,
                (round((avg(o_totalprice) OVER w)*100)/100) AS mov_avg3,
                (round((min(o_totalprice) OVER w)*100)/100) AS mov_min3
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------- W3 (b)
    // RANGE frame (value-based, not row-based): trailing 30-day spend per
    // customer — rows with equal order dates share the frame, unlike ROWS.
    QueryDef("w3_range_frame", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_s").asc)
        .rangeBetween(-30L * 86400, 0)
      t(s, dir, "orders")
        .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
        .select(col("o_custkey"), col("o_orderkey"),
          (round((sum(col("o_totalprice")).over(w))*100)/100).as("spend_30d"),
          count(lit(1)).over(w).as("n_30d"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_custkey, o_orderkey,
                (round((sum(o_totalprice) OVER w)*100)/100) AS spend_30d,
                count(*) OVER w AS n_30d
         FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s FROM orders)
         WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s ASC
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------- W3 (c)
    // Frame EXCLUDE CURRENT ROW (DuckDB window extension; Spark has no
    // native EXCLUDE clause): peer-average of the ±2-row neighborhood
    // WITHOUT the row itself. Spark-first identity — for distributive/
    // algebraic aggregates, agg over frame EXCLUDE CURRENT ROW ≡
    // combining the full-frame agg with the current row removed:
    //   sum … EXCLUDE ≡ sum(frame) − x
    //   count … EXCLUDE ≡ count(frame) − 1
    //   avg … EXCLUDE ≡ (sum − x) / (count − 1)
    // — still ONE window pass, codegen'd, no second shuffle. The oracle
    // pins the set semantics with DuckDB's literal EXCLUDE CURRENT ROW on
    // the (integer-exact) count; the avg uses the same subtract identity
    // TEXTUALLY on both sides because a native avg-of-peers sums floats
    // in a different order — last-ulp drift at a rounding boundary
    // (HANDOFF parity rule 1).
    QueryDef("w3_frame_exclude", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-2, 2)
      t(s, dir, "orders")
        .withColumn("f_sum", sum(col("o_totalprice")).over(w))
        .withColumn("f_n", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          // single-row partition → empty excluded frame: NULL (SQL avg of
          // nothing), not the NaN a raw double 0/0 would produce
          when(col("f_n") > 1,
            round(((col("f_sum") - col("o_totalprice")) /
              (col("f_n") - 1))*100)/100).as("peer_avg"),
          (col("f_n") - 1).as("peer_n"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_custkey, o_orderkey,
                CASE WHEN count(*) OVER wi > 1 THEN
                  (round((((sum(o_totalprice) OVER wi) - o_totalprice)
                          / ((count(*) OVER wi) - 1))*100)/100)
                END AS peer_avg,
                count(*) OVER wx AS peer_n
         FROM orders
         WINDOW wi AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC
                       ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING),
                wx AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC
                       ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                       EXCLUDE CURRENT ROW)
         ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------- W3 (d)
    // Frame EXCLUDE GROUP / EXCLUDE TIES (the remaining SQL-standard
    // exclusion modes; DuckDB implements them literally, Spark has none).
    // Spark-first identity over an UNBOUNDED frame, where the peer group
    // is always fully contained in the frame, so for distributive aggs:
    //   agg EXCLUDE GROUP ≡ agg(partition) − agg(peer group)
    //   agg EXCLUDE TIES  ≡ agg(partition) − agg(peer group) + current row
    // The peer group is RANGE BETWEEN CURRENT ROW AND CURRENT ROW over the
    // same ordering — Spark evaluates both frames in ONE Window operator
    // (same partitioning+ordering), one shuffle, codegen'd arithmetic.
    // Ordering by o_orderpriority (5 distinct values) guarantees large tie
    // groups so GROUP and TIES genuinely diverge. Counts are checked
    // against DuckDB's literal EXCLUDE GROUP/TIES (integer-exact,
    // order-independent); the sum uses the subtract identity TEXTUALLY on
    // both sides (HANDOFF parity rule 1 — a native exclusion sums floats
    // in a different order, last-ulp drift at rounding boundaries).
    QueryDef("w3_frame_exclude_ties", (s, dir) => {
      val wAll = Window.partitionBy(col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wPeer = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderpriority").asc)
        .rangeBetween(Window.currentRow, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("all_sum", sum(col("o_totalprice")).over(wAll))
        .withColumn("all_n", count(lit(1)).over(wAll))
        .withColumn("peer_sum", sum(col("o_totalprice")).over(wPeer))
        .withColumn("peer_n", count(lit(1)).over(wPeer))
        .select(col("o_custkey"), col("o_orderkey"),
          (col("all_n") - col("peer_n")).as("grp_n"),
          (col("all_n") - col("peer_n") + 1).as("ties_n"),
          // empty EXCLUDE GROUP frame (all rows are peers) → NULL sum
          when(col("all_n") > col("peer_n"),
            round((col("all_sum") - col("peer_sum"))*100)/100).as("grp_sum"),
          (round((col("all_sum") - col("peer_sum") + col("o_totalprice"))*100)/100)
            .as("ties_sum"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_custkey, o_orderkey,
                count(*) OVER wg AS grp_n,
                count(*) OVER wt AS ties_n,
                CASE WHEN (count(*) OVER wa) > (count(*) OVER wp) THEN
                  (round(((sum(o_totalprice) OVER wa) - (sum(o_totalprice) OVER wp))*100)/100)
                END AS grp_sum,
                (round(((sum(o_totalprice) OVER wa) - (sum(o_totalprice) OVER wp)
                        + o_totalprice)*100)/100) AS ties_sum
         FROM orders
         WINDOW wa AS (PARTITION BY o_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority ASC
                       RANGE BETWEEN CURRENT ROW AND CURRENT ROW),
                wg AS (PARTITION BY o_custkey ORDER BY o_orderpriority ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                       EXCLUDE GROUP),
                wt AS (PARTITION BY o_custkey ORDER BY o_orderpriority ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                       EXCLUDE TIES)
         ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------- W3 (e)
    // GROUPS frame mode (SQL standard; DuckDB implements it literally,
    // Spark has ROWS/RANGE only): `GROUPS BETWEEN 1 PRECEDING AND 1
    // FOLLOWING` frames the current PEER GROUP plus one whole group on
    // each side. Spark-first identity: peer groups are consecutive under
    // dense_rank, so a GROUPS frame of ±n groups ≡ a RANGE frame of ±n on
    // the dense_rank VALUE — two Window ops over the SAME partitioning
    // (dense_rank, then the range frame ordered by it), ONE shuffle; the
    // second sort key is monotone in the first, so the extra sort is a
    // cheap in-partition pass. The summed value rides as integer cents
    // (round(x*100) is exact at TPC-H price scale) so the group sum is
    // order-independent — bit-equal vs the oracle with no
    // float-association drift; /100.0 converts to double identically in
    // both engines. The oracle would be DuckDB's literal `GROUPS BETWEEN
    // 1 PRECEDING AND 1 FOLLOWING`, but this DuckDB build rejects GROUPS
    // mode ("not implemented yet"), so it restates the same semantics on
    // an INDEPENDENT evaluation path: a per-customer self-join over
    // dense_rank neighborhoods (|grp_b − grp_a| ≤ 1) + GROUP BY — no
    // window frame at all on the oracle side.
    QueryDef("w3_groups_frame", (s, dir) => {
      val wRank = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderpriority").asc)
      val wGroups = Window.partitionBy(col("o_custkey"))
        .orderBy(col("g").asc).rangeBetween(-1L, 1L)
      t(s, dir, "orders")
        .withColumn("cents", expr("cast(round(o_totalprice*100) as bigint)"))
        .withColumn("g", dense_rank().over(wRank))
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(wGroups).as("nbhd_n"),
          (sum(col("cents")).over(wGroups) / lit(100.0)).as("nbhd_sum"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }, Some(
      """WITH g AS (
           SELECT o_custkey, o_orderkey,
                  CAST(round(o_totalprice*100) AS BIGINT) AS cents,
                  dense_rank() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderpriority ASC) AS grp
           FROM orders)
         SELECT a.o_custkey, a.o_orderkey,
                count(*) AS nbhd_n,
                (sum(b.cents) / 100.0) AS nbhd_sum
         FROM g a JOIN g b
           ON a.o_custkey = b.o_custkey
          AND b.grp BETWEEN a.grp - 1 AND a.grp + 1
         GROUP BY a.o_custkey, a.o_orderkey
         ORDER BY a.o_custkey ASC NULLS LAST, a.o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------- A7 (b)
    // array_agg proper (list-valued aggregation) with pinned element order.
    // The list is emitted as a ','-joined string: the compare harness cannot
    // hash array-typed cells, and BIGINT->string formatting is identical in
    // both engines so the stringified form is deterministic and lossless.
    QueryDef("a7_array_agg", (s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_acctbal") > 9700)
        .groupBy(col("c_nationkey"))
        .agg(
          array_join(transform(array_sort(collect_list(col("c_custkey"))),
            _.cast("string")), ",").as("vip_keys"),
          count(lit(1)).as("n"))
        .orderBy(col("c_nationkey").asc_nulls_last)
    }, Some(
      """SELECT c_nationkey,
                array_to_string(list_sort(array_agg(c_custkey)), ',') AS vip_keys,
                count(*) AS n
         FROM customer WHERE c_acctbal > 9700
         GROUP BY c_nationkey ORDER BY c_nationkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- W4
    QueryDef("w4_running_total", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (round((sum(col("o_totalprice")).over(w))*100)/100).as("running_spend"),
          count(lit(1)).over(w).as("order_seq"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_custkey, o_orderkey,
                (round((sum(o_totalprice) OVER w)*100)/100) AS running_spend,
                count(*) OVER w AS order_seq
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- W5
    // Aggregate-as-window beyond sum/avg: an exact MEDIAN over a sliding
    // 11-row frame (percentile ≡ DuckDB quantile_cont as a window
    // aggregate). One keyed shuffle for the window partition; the
    // per-frame percentile is frame-local work. At 100 TB the scalable
    // twin is a13's approx sketch as a windowed aggregate.
    QueryDef("w5_windowed_median", (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderkey")).rowsBetween(-10, Window.currentRow)
      // r18 tried and reverted: folding a sorted windowed collect_list
      // through an interpolation expression measured 2.3× SLOWER than the
      // native windowed percentile (canary-adjusted same-session A/B) —
      // both rebuild an O(frame) buffer per row in a sliding frame, and
      // the array sort + per-row ArrayData copies cost more than the
      // value-map rebuild they replaced. The grouped (non-windowed)
      // percentile rewrite (GroupedPercentile.of) is where the win was.
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          (round((expr("percentile(o_totalprice, 0.5)").over(w))*100)/100)
            .as("med11"))
        .orderBy(col("o_orderstatus").asc_nulls_last,
          col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_orderstatus, o_orderkey,
                (round((quantile_cont(o_totalprice, 0.5) OVER (
                   PARTITION BY o_orderstatus ORDER BY o_orderkey
                   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW))*100)/100) AS med11
         FROM orders
         ORDER BY o_orderstatus ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- O1
    // Multi-key sort with explicit NULLS FIRST/LAST (Spark and DuckDB have
    // opposite defaults — SURVEY §7.3). Nulls introduced via nullif.
    QueryDef("o1_order_nulls", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
          (round((col("l_extendedprice"))*100)/100).as("price"))
        .orderBy(col("flag_or_null").asc_nulls_first,
          col("price").desc_nulls_last,
          col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
        .limit(500)
    }, Some(
      """SELECT l_orderkey, l_linenumber,
                nullif(l_returnflag, 'N') AS flag_or_null,
                (round((l_extendedprice)*100)/100) AS price
         FROM lineitem
         ORDER BY flag_or_null ASC NULLS FIRST, price DESC NULLS LAST,
                  l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST
         LIMIT 500""")),

    // ------------------------------------------------------------------- O2
    QueryDef("o2_limit_offset", (s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
        .select(col("o_orderkey"), (round((col("o_totalprice"))*100)/100).as("o_totalprice"))
        .offset(10).limit(50)
    }, Some(
      """SELECT o_orderkey, (round((o_totalprice)*100)/100) AS o_totalprice
         FROM orders
         ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
         LIMIT 50 OFFSET 10""")),

    // ------------------------------------------------------------------- O3
    // Top-k: Catalyst compiles ORDER BY + LIMIT into TakeOrderedAndProject —
    // each partition keeps a k-sized heap, only k×partitions rows move to
    // the driver side of the exchange. This is the 100 TB-safe top-k.
    QueryDef("o3_topk", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          (round((col("l_extendedprice") * (lit(1) - col("l_discount")))*100)/100).as("net"))
        .orderBy(col("net").desc_nulls_last,
          col("l_orderkey").asc_nulls_last, col("l_partkey").asc_nulls_last)
        .limit(25)
    }, Some(
      """SELECT l_orderkey, l_partkey,
                (round((l_extendedprice*(1-l_discount))*100)/100) AS net
         FROM lineitem
         ORDER BY net DESC NULLS LAST, l_orderkey ASC NULLS LAST,
                  l_partkey ASC NULLS LAST
         LIMIT 25""")),

    // ------------------------------------------------------------------- O4
    // UNION ALL (positional) + UNION distinct.
    QueryDef("o4_union", (s, dir) => {
      val c = t(s, dir, "customer")
      val rich = c.filter(col("c_acctbal") > 9500).select(col("c_custkey"))
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      // Fully lazy: each branch collapses to a 1-row count aggregate inside
      // the plan (no driver-side action during query construction).
      val unionAllN = rich.unionAll(auto)
        .agg(count(lit(1)).as("n")).select(lit("union_all").as("op"), col("n"))
      val unionDistinctN = rich.union(auto).distinct()
        .agg(count(lit(1)).as("n")).select(lit("union_distinct").as("op"), col("n"))
      unionAllN.unionAll(unionDistinctN).orderBy(col("op").asc_nulls_last)
    }, Some(
      """SELECT 'union_all' AS op, count(*) AS n FROM (
           SELECT c_custkey FROM customer WHERE c_acctbal > 9500
           UNION ALL
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
         UNION ALL
         SELECT 'union_distinct' AS op, count(*) AS n FROM (
           SELECT c_custkey FROM customer WHERE c_acctbal > 9500
           UNION
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
         ORDER BY op ASC NULLS LAST""")),

    // ------------------------------------------------------------------- O5
    // INTERSECT / EXCEPT (set semantics) tagged and unioned.
    QueryDef("o5_intersect_except", (s, dir) => {
      // r19 (guide §2.3/§3.1): INTERSECT/EXCEPT are set ops, so de-duping
      // the probe side first cannot change results — but it moves the
      // dedup BELOW the broadcast: the planner was broadcasting the RAW
      // 6M-row l_partkey column twice (plans/r19/o5_*_before.txt), a 6M-
      // entry driver-built hash relation per branch and the reason this
      // query was the suite's only core-starved one at 8 cores. distinct()
      // adds a map-side partial dedup before a ~20k-row exchange, and the
      // broadcast now ships the distinct key set.
      val ordered = t(s, dir, "lineitem")
        .select(col("l_partkey").as("p_partkey")).distinct()
      val branded = t(s, dir, "part").filter(col("p_size") >= 40).select(col("p_partkey"))
      val both = branded.intersect(ordered).withColumn("op", lit("intersect"))
      val neverOrdered = branded.except(ordered).withColumn("op", lit("except"))
      both.unionAll(neverOrdered)
        .select(col("op"), col("p_partkey"))
        .orderBy(col("op").asc_nulls_last, col("p_partkey").asc_nulls_last)
    }, Some(
      """SELECT 'intersect' AS op, p_partkey FROM (
           SELECT p_partkey FROM part WHERE p_size >= 40
           INTERSECT SELECT l_partkey FROM lineitem)
         UNION ALL
         SELECT 'except' AS op, p_partkey FROM (
           SELECT p_partkey FROM part WHERE p_size >= 40
           EXCEPT SELECT l_partkey FROM lineitem)
         ORDER BY op ASC NULLS LAST, p_partkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------- O6
    // PIVOT with pinned value set (never let the engine discover pivot
    // values at scale — that's an extra full pass).
    QueryDef("o6_pivot", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg((round((sum(col("l_quantity")))*100)/100))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }, Some(
      """SELECT l_returnflag,
                (round((sum(CASE WHEN l_linestatus='F' THEN l_quantity END))*100)/100) AS F,
                (round((sum(CASE WHEN l_linestatus='O' THEN l_quantity END))*100)/100) AS O
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag ASC NULLS LAST""")),

    // ------------------------------------------------------------------ O6c
    // DYNAMIC PIVOT (DuckDB `PIVOT ... ON col USING agg`): the IN list is
    // DISCOVERED, not pinned. Spark requires the two-phase form — a
    // distinct-collect of the pivot values (one tiny job over one column,
    // grouped map-side; its result is a handful of column names, which
    // must fit the driver by definition — they become the output schema),
    // then the pivot itself with the discovered list. Sorted for a
    // deterministic column order. The oracle is DuckDB's native dynamic
    // PIVOT, which runs the same discovery internally.
    QueryDef("o6_pivot_dynamic", (s, dir) => {
      val o = t(s, dir, "orders")
      val values = o.select(col("o_orderpriority")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      o.groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", values)
        .agg(count(lit(1)))
        .orderBy(col("o_orderstatus").asc_nulls_last)
    }, Some(
      """PIVOT orders ON o_orderpriority USING count(*)
         GROUP BY o_orderstatus
         ORDER BY o_orderstatus ASC NULLS LAST""")),

    // ------------------------------------------------------------------- O6b
    // UNPIVOT (wide → long) via Dataset.unpivot.
    QueryDef("o6_unpivot", (s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg((round((sum(when(col("l_linestatus") === "F", col("l_quantity"))))*100)/100).as("F"),
          (round((sum(when(col("l_linestatus") === "O", col("l_quantity"))))*100)/100).as("O"))
      wide.unpivot(Array(col("l_returnflag")), Array(col("F"), col("O")),
          "l_linestatus", "qty")
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
    }, Some(
      """WITH wide AS (
           SELECT l_returnflag,
                  (round((sum(CASE WHEN l_linestatus='F' THEN l_quantity END))*100)/100) AS F,
                  (round((sum(CASE WHEN l_linestatus='O' THEN l_quantity END))*100)/100) AS O
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, 'F' AS l_linestatus, F AS qty FROM wide
         UNION ALL
         SELECT l_returnflag, 'O' AS l_linestatus, O AS qty FROM wide
         ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""")),

    // ------------------------------------------------------------------- O7
    // Collation-aware ordering (DuckDB ICU `COLLATE`): names with planted
    // case noise ranked under the 'en' locale at PRIMARY strength via
    // `collate_key` — a per-row binary sort key (graft.functions.
    // CollateKey, codegen'd JDK Collator), so the locale order rides the
    // ordinary byte-order sort machinery (O(n) collator work, not
    // O(n log n) comparator calls; composes with range partitioning and
    // min-max skipping). Binary order would sort the upper-cased half
    // first — the ranks prove the collator is actually applied. The
    // oracle states primary-strength semantics independently (case folds
    // away) and breaks the remaining ties the same way the key does.
    QueryDef("o7_collation", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val noisy = t(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          when(col("c_custkey") % 2 === 0, upper(col("c_name")))
            .otherwise(col("c_name")).as("name"))
      noisy
        .withColumn("rnk", row_number().over(Window.orderBy(
          call_function("collate_key", col("name"), lit("en"), lit("primary"))
            .asc, col("c_custkey").asc)))
        .select(col("rnk"), col("c_custkey"), col("name"))
        .orderBy(col("rnk").asc_nulls_last)
    }, Some(
      """WITH noisy AS (
           SELECT c_custkey,
                  CASE WHEN c_custkey % 2 = 0 THEN upper(c_name)
                       ELSE c_name END AS name
           FROM customer WHERE c_custkey <= 200)
         SELECT CAST(row_number() OVER (
                  ORDER BY lower(name) ASC, c_custkey ASC) AS INTEGER) AS rnk,
                c_custkey, name
         FROM noisy ORDER BY rnk ASC NULLS LAST""")),

    // ------------------------------------------------------------------- W8
    // Ratio-to-report: each row's share of its partition total — the
    // percent-of-total window idiom every BI layer ships. The partition
    // sum is an UNBOUNDED window aggregate (no ordering, so no sort —
    // one pass over each partition's rows after the seg-keyed shuffle),
    // and the ranking window reuses the SAME partitioning; the share is
    // ONE IEEE division of exact BIGINT cents, deterministic in both
    // engines, rounded to 6dp. WindowGroupLimit bounds the top-10 cut.
    QueryDef("w8_ratio_to_report", (s, dir) => {
      val seg = Window.partitionBy(col("seg"))
      val rnk = Window.partitionBy(col("seg"))
        .orderBy(col("cents").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_mktsegment").as("seg"), col("c_custkey"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
        .withColumn("seg_cents", sum(col("cents")).over(seg))
        .withColumn("rk", row_number().over(rnk))
        .filter(col("rk") <= 10)
        .select(col("seg"), col("rk"), col("c_custkey"), col("cents"),
          col("seg_cents"),
          expr("round((CAST(cents AS DOUBLE) / seg_cents)*1000000)/1000000")
            .as("share"))
        .orderBy(col("seg").asc_nulls_last, col("rk").asc_nulls_last)
    }, Some(
      """WITH c AS (
           SELECT c_mktsegment AS seg, c_custkey,
                  CAST(round(c_acctbal*100) AS BIGINT) AS cents
           FROM customer),
         w AS (
           SELECT seg, c_custkey, cents,
                  CAST(sum(cents) OVER (PARTITION BY seg) AS BIGINT) AS seg_cents,
                  row_number() OVER (PARTITION BY seg
                    ORDER BY cents DESC, c_custkey ASC) AS rk
           FROM c)
         SELECT seg, CAST(rk AS INTEGER) AS rk, c_custkey, cents, seg_cents,
                (round((CAST(cents AS DOUBLE) / seg_cents)*1000000)/1000000) AS share
         FROM w WHERE rk <= 10
         ORDER BY seg ASC NULLS LAST, rk ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A22
    // Robust statistics: per-group median, MAD (median absolute
    // deviation), and the 3-sigma-equivalent robust outlier census
    // (|x − med| > 3·1.4826·MAD — the consistency-scaled rule that
    // mean/stddev outlier tests get wrong under contamination, since
    // outliers inflate the very stddev meant to flag them). Everything
    // after the two exact percentiles is INTEGER arithmetic: deviations
    // are doubled into exact integers (medians of ints end in .0/.5) and
    // the threshold comparison runs as BIGINT cross-multiplication
    // (adev2·10⁴ > 44478·mad2), so no float boundary can flip a verdict
    // between engines. Scale: two group-keyed percentile aggregates +
    // one broadcast joinback of 5-row frames — the fact shuffles twice
    // on the same tiny key space, never more.
    QueryDef("a22_robust_mad", (s, dir) => {
      val c = t(s, dir, "events")
        .select(col("event_type").as("g"),
          round(col("value") * 100).cast("long").as("cents"))
      // r19: native percentile aggregates, REVERTING the r18
      // GroupedPercentile rewire for this query only. Same-JVM warm/cold
      // A/B in both orders (tools/PctAB, plans/r19/pct_ab_*.json): the
      // rewrite ran 1.0-1.3 s warm vs 0.6-0.7 s native — cents is a
      // LONG column with heavy ties, so the native agg's value→count map
      // stays small while the rank windows sort the full fact twice.
      // a12/a8 keep the rewrite (mostly-distinct DOUBLE column: the map
      // IS the column; measured 1.6-2.0× the other way).
      val med = c.groupBy("g").agg(expr("percentile(cents, 0.5)").as("med"))
      val dev = c.join(broadcast(med), "g")
        .withColumn("adev2", (abs(col("cents") - col("med")) * 2).cast("long"))
      val mad = dev.groupBy("g").agg(expr("percentile(adev2, 0.5)").as("mad2"))
      dev.join(broadcast(mad), "g")
        .groupBy(col("g"))
        .agg(expr("round((max(med))*100)/100").as("median_cents"),
          expr("round((max(mad2)/2)*100)/100").as("mad_cents"),
          sum(when(col("adev2") * 10000 >
            (lit(44478) * col("mad2")).cast("long"), 1L).otherwise(0L))
            .as("n_outliers"),
          count(lit(1)).as("n"))
        .orderBy(col("g").asc_nulls_last)
    }, Some(
      """WITH c AS (
           SELECT event_type AS g, CAST(round(value*100) AS BIGINT) AS cents
           FROM events),
         med AS (SELECT g, quantile_cont(cents, 0.5) AS med FROM c GROUP BY 1),
         dev AS (SELECT c.g, CAST(2*abs(c.cents - m.med) AS BIGINT) AS adev2,
                        c.cents, m.med
                 FROM c JOIN med m ON c.g = m.g),
         mad AS (SELECT g, quantile_cont(adev2, 0.5) AS mad2 FROM dev GROUP BY 1)
         SELECT d.g,
                (round((max(d.med))*100)/100) AS median_cents,
                (round((max(mad.mad2)/2)*100)/100) AS mad_cents,
                CAST(sum(CASE WHEN d.adev2 * 10000 > CAST(44478 * mad.mad2 AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                count(*) AS n
         FROM dev d JOIN mad ON d.g = mad.g
         GROUP BY d.g ORDER BY d.g ASC NULLS LAST""")),

    // ------------------------------------------------------------- P2 (b)
    // year()-predicate pushdown via the UnfoldDatePredicates optimizer
    // rule (graft.plans — injected through SparkSessionExtensions): the
    // analyzer's `year(cast(ts AS date)) = 1995` is opaque to parquet
    // min/max skipping, so the rule unfolds it into exact range bounds
    // that land in PushedFilters (PlanSpec asserts the pushdown; both
    // engines evaluate year() natively here, so the oracle certifies the
    // rewrite's exactness across =, >=, < shapes and the null contract).
    QueryDef("p2_year_unfold", (s, dir) => {
      t(s, dir, "orders")
        .where(expr("year(o_orderdate) = 1995 OR year(o_orderdate) >= 1998"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }, Some(
      """SELECT o_orderpriority, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
         FROM orders
         WHERE year(o_orderdate) = 1995 OR year(o_orderdate) >= 1998
         GROUP BY 1 ORDER BY o_orderpriority ASC NULLS LAST""")),

    // ------------------------------------------------------------------ P10
    // Join-consistent (correlated) sampling: both tables sample by the
    // SAME deterministic hash band of the JOIN KEY, so a sampled order
    // keeps ALL its lineitems — the sampled join IS a uniform sample of
    // the full join. Independent Bernoulli sampling on each side would
    // keep only p² of matching pairs and break every FK-dependent
    // statistic; the key-hash band keeps per-order aggregates exact
    // within the sample. At 100 TB this is how join cardinality and
    // revenue estimates come from 1% of the data: the band predicate is
    // map-side on both inputs (rows drop before the exchange), and the
    // hash needs no coordination between producers of the two tables.
    // ------------------------------------------------------------------ P13
    // STRATIFIED proportional sampling — a FIXED total budget K split
    // across strata as exact floor quotas (floor(K·n_s/N)), each
    // stratum filled by deterministic-hash rank (the p10 consistency
    // discipline: same rows every run, any engine). This is the
    // training-mix primitive Bernoulli-per-stratum can't give: the
    // output size is exactly Σ quotas, not a binomial draw. Scale
    // shape: the per-stratum rank first cuts at the LITERAL budget
    // bound (rank ≤ K → WindowGroupLimit, a map-side top-K per
    // partition before the shuffle — the stratum never globally
    // sorts), the exact dynamic quota then filters the ≤K·strata
    // survivors against the broadcast quota frame.
    QueryDef("p13_stratified_sample", (s, dir) => {
      val cust = t(s, dir, "customer")
      val quotas = cust.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_stratum"))
        .crossJoin(broadcast(cust.agg(count(lit(1)).as("n_total"))))
        .withColumn("quota", expr("(500L * n_stratum) div n_total"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("h").asc, col("c_custkey").asc)
      val cut = cust
        .withColumn("h", md5(concat(lit("ss13:"),
          col("c_custkey").cast("string")).cast("binary")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= lit(500L)) // literal → WindowGroupLimit
      cut.join(broadcast(quotas), Seq("c_mktsegment"))
        .filter(col("rk") <= col("quota"))
        .groupBy(col("c_mktsegment"))
        .agg(max(col("n_stratum")).as("n_stratum"),
          max(col("quota")).as("quota"),
          count(lit(1)).as("n_sampled"),
          sum(col("c_custkey")).as("sum_keys"))
        .orderBy(col("c_mktsegment").asc_nulls_last)
    }, Some(
      """WITH q AS (
           SELECT c_mktsegment, count(*) AS n_stratum,
                  (500 * count(*)) // (SELECT count(*) FROM customer)
                    AS quota
           FROM customer GROUP BY 1),
         r AS (
           SELECT c_mktsegment, c_custkey,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY md5('ss13:' || CAST(c_custkey AS VARCHAR)) ASC,
                             c_custkey ASC) AS rk
           FROM customer)
         SELECT r.c_mktsegment,
                CAST(max(q.n_stratum) AS BIGINT) AS n_stratum,
                CAST(max(q.quota) AS BIGINT) AS quota,
                count(*) AS n_sampled,
                CAST(sum(r.c_custkey) AS BIGINT) AS sum_keys
         FROM r JOIN q ON r.c_mktsegment = q.c_mktsegment
         WHERE r.rk <= q.quota
         GROUP BY 1 ORDER BY 1 ASC NULLS LAST""")),

    // ------------------------------------------------------------------ P14
    // TOKEN-BUDGET stratified sampling — p13's quota machinery with the
    // quotas in SUM-OF-LENGTH space: a training mix is cut by token
    // count, not document count (a 100-token doc and a 10k-token doc
    // are not interchangeable mix units). A fixed total budget B splits
    // across strata proportionally to their token mass (floor(B·T_s/T)),
    // and each stratum admits the maximal PREFIX of its deterministic-
    // hash order whose cumulative length fits the stratum quota — same
    // rows every run, any engine. Scale shape: docs below the 200-char
    // quality floor drop map-side, so no admitted doc can rank past
    // B/200 = 500 — the per-stratum rank cut at that LITERAL bound is a
    // WindowGroupLimit (map-side top-K before the stratum shuffle,
    // PlanSpec-pinned; the bound must stay under Spark's
    // windowGroupLimitThreshold of 1000 or the rewrite declines), the
    // running sum rides the SAME partitioning and sort (zero extra
    // exchanges), and the exact dynamic quota then filters the
    // ≤500·strata survivors against the broadcast quota frame. The
    // stratum never globally sorts, at any corpus size.
    QueryDef("p14_token_budget_sample", (s, dir) => {
      val docs = t(s, dir, "documents")
        .filter(col("n_chars") >= 200L)
        .select(col("doc_id"), col("lang"), col("n_chars").as("len"))
      val quotas = docs.groupBy(col("lang"))
        .agg(sum(col("len")).as("t_stratum"))
        .crossJoin(broadcast(docs.agg(sum(col("len")).as("t_total"))))
        .withColumn("quota", expr("(100000L * t_stratum) div t_total"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("h").asc, col("doc_id").asc)
      // every kept doc is ≥200 chars, so rank >500 ⇒ cum >100000 ≥ any
      // quota: the literal cut loses nothing and fires WindowGroupLimit
      val ranked = docs
        .withColumn("h", md5(concat(lit("p14:"),
          col("doc_id").cast("string")).cast("binary")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= lit(500L))
      val cum = ranked.withColumn("cum", sum(col("len")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.join(broadcast(quotas), Seq("lang"))
        .filter(col("cum") <= col("quota"))
        .groupBy(col("lang"))
        .agg(max(col("t_stratum")).as("t_stratum"),
          max(col("quota")).as("quota"),
          count(lit(1)).as("n_docs"),
          sum(col("len")).as("sum_len"),
          sum(col("doc_id")).as("sum_keys"))
        .orderBy(col("lang").asc_nulls_last)
    }, Some(
      """WITH f AS (
           SELECT doc_id, lang, n_chars AS len
           FROM documents WHERE n_chars >= 200),
         q AS (
           SELECT lang, sum(len) AS t_stratum,
                  (100000 * sum(len)) // (SELECT sum(len) FROM f) AS quota
           FROM f GROUP BY 1),
         r AS (
           SELECT lang, doc_id, len,
                  sum(len) OVER (PARTITION BY lang
                    ORDER BY md5('p14:' || CAST(doc_id AS VARCHAR)) ASC,
                             doc_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM f)
         SELECT r.lang,
                CAST(max(q.t_stratum) AS BIGINT) AS t_stratum,
                CAST(max(q.quota) AS BIGINT) AS quota,
                count(*) AS n_docs,
                CAST(sum(r.len) AS BIGINT) AS sum_len,
                CAST(sum(r.doc_id) AS BIGINT) AS sum_keys
         FROM r JOIN q ON r.lang = q.lang
         WHERE r.cum <= q.quota
         GROUP BY 1 ORDER BY 1 ASC NULLS LAST""")),

    // ------------------------------------------------------------------ P15
    // TEMPORAL train/test split with an EMBARGO gap — the leakage
    // hygiene for time-ordered data (de Prado's purged split): train
    // ends a full embargo period BEFORE the test window starts, and
    // the embargoed slice is DROPPED from both sides, so near-boundary
    // correlation (sessions spanning the cut, labels computed over
    // trailing windows) cannot leak future information into training.
    // The census per event_type × split carries the day bounds — the
    // audit that train's last day < embargo < test's first day. Pure
    // map-side classification + one keyed agg; at 100 TB the split
    // predicate prunes partitions when the table is laid out by day.
    QueryDef("p15_temporal_split", (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("ts_sec", date_trunc("second", col("ts")))
      e.withColumn("split",
          when(col("ts_sec") < lit("2024-01-24 00:00:00").cast("timestamp"),
            "train")
            .when(col("ts_sec") >= lit("2024-01-25 00:00:00")
              .cast("timestamp"), "test")
            .otherwise("embargo"))
        .groupBy(col("event_type"), col("split"))
        .agg(count(lit(1)).as("n"),
          min(col("ts_sec").cast("date")).as("first_day"),
          max(col("ts_sec").cast("date")).as("last_day"))
        .orderBy(col("event_type").asc_nulls_last,
          col("split").asc_nulls_last)
    }, Some(
      """WITH e AS (
           SELECT event_type,
                  CAST(date_trunc('second', CAST(ts AS TIMESTAMP))
                    AS TIMESTAMP) AS ts_sec
           FROM events),
         s AS (
           SELECT event_type,
                  CASE WHEN ts_sec < TIMESTAMP '2024-01-24 00:00:00'
                         THEN 'train'
                       WHEN ts_sec >= TIMESTAMP '2024-01-25 00:00:00'
                         THEN 'test'
                       ELSE 'embargo' END AS split,
                  ts_sec
           FROM e)
         SELECT event_type, split, count(*) AS n,
                CAST(min(ts_sec) AS DATE) AS first_day,
                CAST(max(ts_sec) AS DATE) AS last_day
         FROM s GROUP BY 1, 2
         ORDER BY event_type ASC NULLS LAST, split ASC NULLS LAST""")),

    QueryDef("p10_consistent_sample", (s, dir) => {
      def keep(c: org.apache.spark.sql.Column) = substring(
        md5(concat(lit("cs7:"), c.cast("string")).cast("binary")), 1, 2) < "1a"
      val o = t(s, dir, "orders").where(keep(col("o_orderkey")))
      val l = t(s, dir, "lineitem").where(keep(col("l_orderkey")))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_cents"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }, Some(
      """WITH o AS (
           SELECT * FROM orders
           WHERE substring(md5('cs7:' || CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'),
         l AS (
           SELECT * FROM lineitem
           WHERE substring(md5('cs7:' || CAST(l_orderkey AS VARCHAR)), 1, 2) < '1a')
         SELECT o_orderpriority,
                count(*) AS n_lines,
                count(DISTINCT o_orderkey) AS n_orders,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
         FROM o JOIN l ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY o_orderpriority ASC NULLS LAST""")),

    // ------------------------------------------------------------------- O8
    // Recursive CTE (WITH RECURSIVE) — the reference stack's recursive
    // SQL surface (DuckDB recursive CTEs), runnable VERBATIM on Spark 4:
    // both engines execute the same text, so the oracle is a fully
    // independent recursive evaluator, not a restatement. The recursion
    // walks each sampled customer's order chain in date order,
    // accumulating an exact BIGINT-cents running total; depth = the
    // longest per-customer chain (bounded, ~24 at sf0.1, under Spark's
    // default 100-level recursion limit). Scale shape: Spark lowers each
    // step to ONE (c, rn)-equality hash join of the frontier against the
    // static numbered frame — frontier-sized, never corpus². The static
    // frame is MATERIALIZED first (lazy localCheckpoint, the g1
    // lineage-cut): Spark's recursive execution re-plans the step
    // subtree every iteration, so an unmaterialized `ord` would pay its
    // scan+shuffle+window ~24 more times (measured as the suite's
    // second-worst makespan pole); the checkpoint turns each step's
    // static side into an in-memory block scan — and unlike cache(),
    // whose entry would sit in the session-shared CacheManager with no
    // post-recursion point to unpersist it, checkpoint blocks free via
    // the ContextCleaner once the frame is unreferenced. The iterative
    // twins (g1/g2) hand-build this loop; o8 certifies the declarative
    // spelling.
    QueryDef("o8_recursive_cte", (s, dir) => {
      Tables.registerAll(s, dir)
      val ord = s.sql(
        """SELECT o_custkey AS c,
                  CAST(round(o_totalprice*100) AS BIGINT) AS cents,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
           FROM orders WHERE o_custkey % 10 = 0""").localCheckpoint(false)
      ord.createOrReplaceTempView("o8_ord")
      s.sql(
        """WITH RECURSIVE chain AS (
             SELECT c, rn, cents AS cum, CAST(1 AS BIGINT) AS hops
             FROM o8_ord WHERE rn = 1
             UNION ALL
             SELECT o.c, o.rn, ch.cum + o.cents, ch.hops + 1
             FROM chain ch JOIN o8_ord o ON o.c = ch.c AND o.rn = ch.rn + 1)
           SELECT c AS custkey, max(hops) AS chain_len,
                  max(cum) AS total_cents
           FROM chain GROUP BY c ORDER BY custkey ASC NULLS LAST""")
    }, Some(
        """WITH RECURSIVE ord AS (
             SELECT o_custkey AS c,
                    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
             FROM orders WHERE o_custkey % 10 = 0),
           chain AS (
             SELECT c, rn, cents AS cum, CAST(1 AS BIGINT) AS hops
             FROM ord WHERE rn = 1
             UNION ALL
             SELECT o.c, o.rn, ch.cum + o.cents, ch.hops + 1
             FROM chain ch JOIN ord o ON o.c = ch.c AND o.rn = ch.rn + 1)
           SELECT c AS custkey, max(hops) AS chain_len,
                  max(cum) AS total_cents
           FROM chain GROUP BY c ORDER BY custkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A12
    // Exact percentiles: continuous (linear interpolation between closest
    // ranks — Spark `percentile` ≡ DuckDB `quantile_cont`) and discrete
    // (smallest value at cumulative fraction ≥ p). Exact percentile is a
    // sort-based agg: at scale the shuffle is keyed on the group column and
    // each group sorts locally — fine for bounded group cardinality; the
    // unbounded-cardinality path is approx_percentile (A3's sketch family).
    QueryDef("a12_percentiles", (s, dir) => {
      // r18: rank-arithmetic exact percentiles (GroupedPercentile) instead
      // of the native map-building percentile aggregate — same numbers
      // bit-for-bit (parity property-pinned in OperatorSpec), 4.3 s → sub-
      // second solo at sf0.1. Two sorted windows (price, qty) + a 3-row
      // broadcast joinback replace one ObjectHashAggregate whose partial
      // state was the boxed column itself.
      val li = t(s, dir, "lineitem")
      val price = graft.operators.GroupedPercentile.of(li,
        Seq("l_returnflag"), "l_extendedprice",
        Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)))
      val qty = graft.operators.GroupedPercentile.of(li,
        Seq("l_returnflag"), "l_quantity", Nil, Seq(("dq", 0.5)))
      price.join(broadcast(qty), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          (round(col("p25")*10000)/10000).as("p25_price"),
          (round(col("p50")*10000)/10000).as("p50_price"),
          (round(col("p75")*10000)/10000).as("p75_price"),
          (round(col("dq")*100)/100).as("med_qty_disc"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }, Some(
      """SELECT l_returnflag,
                (round((quantile_cont(l_extendedprice, 0.25))*10000)/10000) AS p25_price,
                (round((quantile_cont(l_extendedprice, 0.5))*10000)/10000) AS p50_price,
                (round((quantile_cont(l_extendedprice, 0.75))*10000)/10000) AS p75_price,
                (round((quantile_disc(l_quantity, 0.5))*100)/100) AS med_qty_disc
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag ASC NULLS LAST""")),

    // ------------------------------------------------------------------- P7
    // Stratified sampling: a different deterministic Bernoulli rate per
    // stratum (order status), expressed as a hash-threshold filter both
    // engines compute identically (md5 is bit-stable everywhere; no
    // rand()). Map-only — the filter is applied at scan time, and at scale
    // each partition samples independently with zero coordination.
    QueryDef("p7_stratified_sample", (s, dir) => {
      val h = substring(md5(col("o_orderkey").cast("string")), 1, 1)
      val threshold = when(col("o_orderstatus") === "O", "2")
        .when(col("o_orderstatus") === "F", "4").otherwise("8")
      t(s, dir, "orders")
        .filter(h < threshold)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          (round((sum(col("o_totalprice")))*100)/100).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_last)
    }, Some(
      """SELECT o_orderstatus, count(*) AS n,
                (round((sum(o_totalprice))*100)/100) AS sum_price
         FROM orders
         WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) <
               (CASE WHEN o_orderstatus = 'O' THEN '2'
                     WHEN o_orderstatus = 'F' THEN '4' ELSE '8' END)
         GROUP BY o_orderstatus ORDER BY o_orderstatus ASC NULLS LAST""")),

    // ------------------------------------------------------------------- P8
    // Deterministic k-per-group sample (the distributed stand-in for
    // per-group reservoir sampling): rank rows inside each group by a
    // salted content hash — a uniform-but-reproducible order — and keep
    // the first k. Unlike rand()-reservoirs this needs no state, no seed
    // sync, and re-runs identically; the plan is one group-keyed window
    // with WindowGroupLimit pushing the k-cut below the shuffle (top-k
    // per group, never a full per-group sort at 100 TB).
    QueryDef("p8_reservoir_sample", (s, dir) => {
      val h = md5(concat(lit("rs7:"), col("o_orderkey").cast("string")))
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(h.asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy(col("o_orderstatus").asc_nulls_last, col("rn").asc_nulls_last)
    }, Some(
      """WITH ranked AS (
           SELECT o_orderstatus, o_orderkey,
                  CAST(row_number() OVER (
                    PARTITION BY o_orderstatus
                    ORDER BY md5('rs7:' || CAST(o_orderkey AS VARCHAR)) ASC,
                             o_orderkey ASC) AS INTEGER) AS rn
           FROM orders)
         SELECT o_orderstatus, o_orderkey, rn FROM ranked WHERE rn <= 5
         ORDER BY o_orderstatus ASC NULLS LAST, rn ASC NULLS LAST""")),

    // ------------------------------------------------------------------- P9
    // Deterministic WEIGHTED sample (priority sampling): each row draws a
    // content-keyed uniform u (6 md5 hex digits → an exact integer, same
    // digit-polynomial in both engines) and competes on priority u / w
    // with weight = order value in cents. The division is ONE
    // correctly-rounded IEEE op over identical integers — bit-identical
    // across engines with NO transcendentals and NO rounding step — so
    // the top-k by (priority, id) is exact. This is the
    // quality-weighted corpus sampling shape (sample rate ∝ weight)
    // with reproducibility = the seed string, map-only until the top-k.
    QueryDef("p9_weighted_sample", (s, dir) => {
      val hexU = "(instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 1048576 + " +
        "(instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 65536 + " +
        "(instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 4096 + " +
        "(instr('0123456789abcdef', substring(h, 4, 1)) - 1) * 256 + " +
        "(instr('0123456789abcdef', substring(h, 5, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(h, 6, 1)) - 1)"
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          md5(concat(lit("ws11:"), col("o_orderkey").cast("string"))).as("h"))
        .withColumn("u", expr(s"CAST($hexU AS BIGINT)"))
        .withColumn("w_c",
          expr("CAST(round((o_totalprice)*100) AS BIGINT)"))
        .withColumn("priority",
          col("u").cast("double") / col("w_c").cast("double"))
        .orderBy(col("priority").asc_nulls_last, col("o_orderkey").asc_nulls_last)
        .limit(20)
        .select(col("o_orderkey"),
          (round((col("o_totalprice"))*100)/100).as("o_totalprice"),
          col("u"), col("w_c"))
    }, Some(
      """WITH d AS (
           SELECT o_orderkey, o_totalprice,
                  md5('ws11:' || CAST(o_orderkey AS VARCHAR)) AS h
           FROM orders),
         k AS (
           SELECT o_orderkey, o_totalprice,
                  CAST((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 1048576
                     + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 65536
                     + (instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 4096
                     + (instr('0123456789abcdef', substring(h, 4, 1)) - 1) * 256
                     + (instr('0123456789abcdef', substring(h, 5, 1)) - 1) * 16
                     + (instr('0123456789abcdef', substring(h, 6, 1)) - 1)
                    AS BIGINT) AS u,
                  CAST(round((o_totalprice)*100) AS BIGINT) AS w_c
           FROM d)
         SELECT o_orderkey, (round((o_totalprice)*100)/100) AS o_totalprice,
                u, w_c
         FROM k
         ORDER BY CAST(u AS DOUBLE) / CAST(w_c AS DOUBLE) ASC NULLS LAST,
                  o_orderkey ASC NULLS LAST
         LIMIT 20""")),

    // ------------------------------------------------------------------- W7
    // FILTER-ed window aggregates: per customer, the running count and
    // running spend of URGENT orders only, alongside the unfiltered
    // running count — DuckDB's `count(*) FILTER (...) OVER w` restated
    // as the conditional-sum identity Spark compiles to the same single
    // Window operator (one shuffle, one sort, all three aggregates in
    // one pass; integer-exact).
    QueryDef("w7_filtered_window", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"), col("o_totalprice"))
        .withColumn("n_all", count(lit(1)).over(w))
        .withColumn("n_urgent",
          sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
            .over(w))
        .withColumn("urgent_spend",
          (round((sum(when(col("o_orderpriority") === "1-URGENT",
            col("o_totalprice")).otherwise(0.0)).over(w))*100)/100))
        .select(col("o_custkey"), col("o_orderkey"), col("n_all"),
          col("n_urgent"), col("urgent_spend"))
        .orderBy(col("o_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)
    }, Some(
      """SELECT o_custkey, o_orderkey,
                count(*) OVER w AS n_all,
                CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                  OVER w AS BIGINT) AS n_urgent,
                (round((COALESCE(sum(o_totalprice)
                    FILTER (WHERE o_orderpriority = '1-URGENT') OVER w,
                  0.0))*100)/100) AS urgent_spend
         FROM orders
         WHERE o_custkey < 200
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey ASC NULLS LAST, o_orderkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A16
    // Equi-width histogram without an engine histogram primitive: the
    // bucket index is pure arithmetic (least(floor(x/width), n-1) — the
    // width_bucket identity, stated portably in both engines), so the
    // whole histogram is ONE partial+final hash aggregate keyed by
    // bucket — map-side combined, shuffle bounded by bucket count, no
    // sort anywhere. The per-bucket min/max double as bin-edge evidence.
    QueryDef("a16_histogram", (s, dir) => {
      val bucket = least(floor(col("o_totalprice") / 50000.0), lit(11.0))
        .cast("int")
      t(s, dir, "orders")
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n"),
          (round(min(col("o_totalprice"))*100)/100).as("lo"),
          (round(max(col("o_totalprice"))*100)/100).as("hi"))
        .orderBy(col("bucket").asc_nulls_last)
    }, Some(
      """SELECT CAST(least(floor(o_totalprice / 50000.0), 11) AS INTEGER) AS bucket,
                count(*) AS n,
                (round((min(o_totalprice))*100)/100) AS lo,
                (round((max(o_totalprice))*100)/100) AS hi
         FROM orders GROUP BY 1 ORDER BY bucket ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A17
    // Mode (most frequent value) per group. Native `mode()` exists in both
    // engines but leaves TIES engine-defined, so the oracle-parity form is
    // the explicit two-level aggregate: count per (group, value), then
    // pick the max-count value with ties broken toward the SMALLEST value
    // — one window pass over the already-reduced counts frame. At 100 TB
    // the first aggregate is the only fact-sized shuffle (map-side
    // combine on (flag, qty) — bounded by distinct values, here ≤50 per
    // group); the ranking window runs over that tiny frame.
    QueryDef("a17_mode", (s, dir) => {
      val counts = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("cnt").as("n"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }, Some(
      """WITH counts AS (
           SELECT l_returnflag, l_quantity, count(*) AS cnt
           FROM lineitem GROUP BY 1, 2),
         ranked AS (
           SELECT l_returnflag, l_quantity, cnt,
                  row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY cnt DESC, l_quantity ASC) AS rn
           FROM counts)
         SELECT l_returnflag, l_quantity AS mode_qty, cnt AS n
         FROM ranked WHERE rn = 1
         ORDER BY l_returnflag ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A19
    // Bitmap-rollup EXACT distinct count: user ids pack into 63-bit words
    // (bit 63 stays clear — DuckDB refuses the signed-overflow shift, and
    // portable bitmaps shouldn't ride the sign bit anyway): word =
    // id div 63, bit = id mod 63. Per-(day, word) bitmaps merge
    // with bit_or — a MERGEABLE integer aggregate, so daily bitmaps
    // roll up to any coarser grain without rescanning the fact — and the
    // final count is sum(bit_count(word)). This is the roaring-bitmap /
    // BITMAP_COUNT_DISTINCT pattern warehouses use when approx sketches
    // (A3) aren't acceptable and COUNT(DISTINCT) re-shuffles at every
    // grain: the shuffle here is bounded by (days × live words), not
    // rows, and re-aggregation to weekly grain reuses the daily bitmaps.
    QueryDef("a19_bitmap_distinct", (s, dir) => {
      val e = t(s, dir, "events")
        .select(date_trunc("second", col("ts")).cast("date").as("day"),
          col("user_id"))
      val words = e.groupBy(col("day"),
          expr("CAST(user_id div 63 AS BIGINT)").as("word_idx"))
        .agg(bit_or(expr("CAST(shiftleft(CAST(1 AS BIGINT), " +
          "CAST(user_id % 63 AS INT)) AS BIGINT)")).as("word"))
      val daily = words.groupBy(col("day"))
        .agg(sum(bit_count(col("word")).cast("long")).as("n_users"))
      // weekly rollup REUSES the daily word bitmaps (bit_or merges) —
      // the whole point of the mergeable representation
      val weekly = words
        .groupBy(date_trunc("week", col("day")).cast("date").as("wk"),
          col("word_idx"))
        .agg(bit_or(col("word")).as("word"))
        .groupBy(col("wk"))
        .agg(sum(bit_count(col("word")).cast("long")).as("wk_users"))
      daily
        .join(weekly,
          date_trunc("week", col("day")).cast("date") === col("wk"))
        .select(col("day"), col("n_users"), col("wk_users"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      """WITH e AS (
           SELECT CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS DATE)
                    AS day,
                  user_id
           FROM events),
         words AS (
           SELECT day, CAST(user_id // 63 AS BIGINT) AS word_idx,
                  bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER))
                    AS word
           FROM e GROUP BY 1, 2),
         daily AS (
           SELECT day, CAST(sum(bit_count(word)) AS BIGINT) AS n_users
           FROM words GROUP BY 1),
         weekly AS (
           SELECT wk, CAST(sum(bit_count(word)) AS BIGINT) AS wk_users
           FROM (SELECT CAST(date_trunc('week', day) AS DATE) AS wk,
                        word_idx, bit_or(word) AS word
                 FROM words GROUP BY 1, 2)
           GROUP BY 1)
         SELECT day, n_users, wk_users
         FROM daily JOIN weekly
           ON CAST(date_trunc('week', day) AS DATE) = wk
         ORDER BY day ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A20
    // Rolling 7-day distinct users (the DAU/WAU rolling-window metric)
    // over the SAME mergeable word bitmaps as A19 — the composition that
    // makes the bitmap representation pay: a sliding distinct count
    // cannot partial-aggregate as raw ids (distinct isn't mergeable),
    // but word bitmaps OR across any day set, so the rolling window is a
    // ±6-day band self-join over the TINY (day, word) frame + one
    // bit_or per (day, word) + bit_count sum. The fact table is scanned
    // ONCE; the band join runs over days×words, not rows.
    QueryDef("a20_rolling_distinct", (s, dir) => {
      val words = t(s, dir, "events")
        .select(date_trunc("second", col("ts")).cast("date").as("day"),
          col("user_id"))
        .groupBy(col("day"),
          expr("CAST(user_id div 63 AS BIGINT)").as("word_idx"))
        .agg(bit_or(expr("CAST(shiftleft(CAST(1 AS BIGINT), " +
          "CAST(user_id % 63 AS INT)) AS BIGINT)")).as("word"))
      val days = words.select(col("day")).distinct()
        .select(col("day").as("d"))
      days
        .join(words,
          col("day").between(date_sub(col("d"), 6), col("d")))
        .groupBy(col("d"), col("word_idx"))
        .agg(bit_or(col("word")).as("word"))
        .groupBy(col("d").as("day"))
        .agg(sum(bit_count(col("word")).cast("long")).as("rolling_7d_users"))
        .orderBy(col("day").asc_nulls_last)
    }, Some(
      """WITH e AS (
           SELECT CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS DATE)
                    AS day,
                  user_id
           FROM events),
         words AS (
           SELECT day, CAST(user_id // 63 AS BIGINT) AS word_idx,
                  bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER))
                    AS word
           FROM e GROUP BY 1, 2),
         days AS (SELECT DISTINCT day AS d FROM words),
         banded AS (
           SELECT days.d, w.word_idx, bit_or(w.word) AS word
           FROM days JOIN words w
             ON w.day BETWEEN days.d - INTERVAL 6 DAY AND days.d
           GROUP BY 1, 2)
         SELECT d AS day,
                CAST(sum(bit_count(word)) AS BIGINT) AS rolling_7d_users
         FROM banded GROUP BY 1
         ORDER BY day ASC NULLS LAST""")),

    // ------------------------------------------------------------------- X1
    // Composite workload (TPC-H Q3 shape): selective dimension filter →
    // two-level star join → keyed agg → top-10. The plan to expect at any
    // scale: customer broadcasts into orders, that result broadcasts (or
    // shuffle-joins at real SF) into the date-filtered lineitem scan with
    // both date predicates pushed; the final top-10 is a
    // TakeOrderedAndProject, never a global sort.
    QueryDef("x1_workload_q3", (s, dir) => {
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-07-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg((round((sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))*100)/100)
          .as("revenue"))
        .orderBy(col("revenue").desc_nulls_last, col("o_orderdate").asc_nulls_last,
          col("l_orderkey").asc_nulls_last)
        .limit(10)
    }, Some(
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
                (round((sum(l_extendedprice * (1 - l_discount)))*100)/100) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING'
           AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1997-07-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC NULLS LAST, o_orderdate ASC NULLS LAST,
                  l_orderkey ASC NULLS LAST
         LIMIT 10""")),

    // ------------------------------------------------------------------- X2
    // Composite workload, TPC-H Q5 shape: local-supplier revenue by
    // nation inside one region-year. Six tables; the 100× plan: lineitem
    // (the only big table) flows through ONE pipeline — orders filters
    // by date at its scan and broadcasts, customer/supplier/nation/
    // region are dims and broadcast, the c_nationkey = s_nationkey
    // "local supplier" condition rides the supplier join, and the final
    // agg is partial+final on 5 nation keys. lineitem is never shuffled
    // except into the group-by.
    QueryDef("x2_workload_q5", (s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((round((sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))*100)/100)
          .as("revenue"))
        .orderBy(col("revenue").desc_nulls_last, col("n_name").asc_nulls_last)
    }, Some(
      """SELECT n_name,
                (round((sum(l_extendedprice * (1 - l_discount)))*100)/100) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey
           AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS LAST""")),

    // ------------------------------------------------------------------- X3
    // Composite workload, TPC-H Q18 shape (large-volume customers): join
    // against a HAVING-filtered aggregate of the fact table itself. The
    // 100× plan: the big-order key set is a keyed agg of lineitem
    // (partial+final) whose survivors are a tiny fraction — it joins
    // back as a broadcast LeftSemi, so lineitem is re-scanned but never
    // re-shuffled; orders/customer enrich via broadcast; the final
    // per-order agg groups the filtered rows; top-100 is
    // TakeOrderedAndProject.
    QueryDef("x3_workload_q18", (s, dir) => {
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("__q"))
        .filter(col("__q") > 250).select(col("l_orderkey"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      l.join(broadcast(big), Seq("l_orderkey"), "left_semi")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg((round((sum(col("l_quantity")))*100)/100).as("total_qty"))
        .orderBy(col("o_totalprice").desc_nulls_last,
          col("o_orderdate").asc_nulls_last, col("o_orderkey").asc_nulls_last)
        .limit(100)
    }, Some(
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                (round((sum(l_quantity))*100)/100) AS total_qty
         FROM customer, orders, lineitem
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
           AND c_custkey = o_custkey
           AND o_orderkey = l_orderkey
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC NULLS LAST, o_orderdate ASC NULLS LAST,
                  o_orderkey ASC NULLS LAST
         LIMIT 100""")),

    // ------------------------------------------------------------------- X4
    // TPC-H Q7 shape (volume shipping between two nations): lineitem
    // filters on the shipdate range AT THE SCAN (pushed), then joins
    // orders on the key and BROADCASTS supplier/customer/nation — the
    // nation-pair disjunction prunes early through the broadcast dims,
    // so the fact table streams through one pipeline into the 3-key agg.
    // The 100 TB shape: one keyed shuffle (orders), everything else
    // broadcast; the year() regroup is map-side.
    QueryDef("x4_workload_q7", (s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("n1_key"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("n2_key"),
        col("n_name").as("cust_nation"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(expr("round((sum(volume))*100)/100").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("supp_nation").asc_nulls_last,
          col("cust_nation").asc_nulls_last, col("l_year").asc_nulls_last)
    }, Some(
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS INTEGER) AS l_year,
                (round((sum(l_extendedprice * (1 - l_discount)))*100)/100) AS revenue,
                count(*) AS n_items
         FROM supplier, lineitem, orders, customer, nation n1, nation n2
         WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
           AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
           AND c_nationkey = n2.n_nationkey
           AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
           AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation ASC NULLS LAST, cust_nation ASC NULLS LAST,
                  l_year ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A15
    // arg_max / arg_min (DuckDB) ≡ max_by / min_by (Spark 4): "which key
    // attains the extreme" without a join-back or window. Ties are pinned
    // by folding the key into the ordering value (price cents ≪ 7 digits
    // + orderkey — exact integers in a double up to 2^53), so both
    // engines pick the SAME row deterministically. One hash aggregate,
    // partial+final — the extremes travel, never the rows.
    QueryDef("a15_argminmax", (s, dir) => {
      val v = round(col("l_extendedprice") * 100) * 10000000 + col("l_orderkey")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          max_by(col("l_orderkey"), v).as("priciest_order"),
          min_by(col("l_orderkey"), v).as("cheapest_order"),
          (round(max(col("l_extendedprice"))*100)/100).as("max_price"),
          (round(min(col("l_extendedprice"))*100)/100).as("min_price"))
        .orderBy(col("l_returnflag").asc_nulls_last)
    }, Some(
      """SELECT l_returnflag,
                arg_max(l_orderkey, round(l_extendedprice * 100) * 10000000 + l_orderkey)
                  AS priciest_order,
                arg_min(l_orderkey, round(l_extendedprice * 100) * 10000000 + l_orderkey)
                  AS cheapest_order,
                (round((max(l_extendedprice))*100)/100) AS max_price,
                (round((min(l_extendedprice))*100)/100) AS min_price
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag ASC NULLS LAST""")),

    // ------------------------------------------------------------------- X5
    // TPC-H Q21 shape (the fixture lacks commit/receipt dates, so
    // l_returnflag = 'R' stands in for "late line"): suppliers who were
    // the ONLY flagged supplier on a finished multi-supplier order. The
    // scale-defining feature is the PAIR of decorrelated self-joins on
    // the fact table — EXISTS (another supplier on the order) and NOT
    // EXISTS (another FLAGGED supplier) — which Catalyst plans as
    // LeftSemi/LeftAnti hash joins co-partitioned on l_orderkey, so the
    // three lineitem passes share one shuffle key; orders filters
    // map-side and supplier broadcasts for the final name lookup.
    QueryDef("x5_workload_q21", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      val oF = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      l1
        .join(l2, col("l_orderkey") === col("k2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("k3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .join(oF, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc_nulls_last)
        .limit(25)
    }, Some(
      """SELECT s_name, count(*) AS numwait
         FROM supplier, lineitem l1, orders
         WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY s_name
         ORDER BY numwait DESC, s_name ASC NULLS LAST
         LIMIT 25""")),

    // ------------------------------------------------------------------- X6
    // TPC-H Q13 shape: customer order-count distribution. The scale move
    // is aggregation-below-join: orders collapses to one (custkey, cnt)
    // row per customer BEFORE the outer join (map-side combine bounds the
    // shuffle to |customers|, never |orders|), then the histogram agg runs
    // over an already-reduced frame. The naive Q13 plan (outer join first,
    // then count) shuffles every order row — at 100 TB that is the whole
    // fact table through the exchange for a result with ~50 distinct rows.
    QueryDef("x6_workload_q13", (s, dir) => {
      val perCust = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      t(s, dir, "customer").select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }, Some(
      """WITH per_cust AS (
           SELECT o_custkey, count(*) AS cnt FROM orders
           WHERE o_orderpriority <> '1-URGENT'
           GROUP BY o_custkey)
         SELECT c_count, count(*) AS custdist FROM (
           SELECT COALESCE(cnt, 0) AS c_count
           FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey) t
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""")),

    // ------------------------------------------------------------------- X7
    // TPC-H Q11 shape: suppliers whose lineitem value exceeds 0.1% of the
    // global total (scalar-subquery threshold). Parity: per-value cast to
    // DECIMAL(18,2) BEFORE summing makes both sums order-independent and
    // exact, and the threshold compare is the integer form value*1000 >
    // total (no float in the predicate, so no boundary flips); the output
    // goes back to the suite-standard rounded double. Scale: one shuffle
    // on l_suppkey with map-side combine; the global total is a 1-row
    // broadcast (no driver collect); supplier names broadcast in.
    QueryDef("x7_workload_q11", (s, dir) => {
      val perSupp = t(s, dir, "lineitem")
        .select(col("l_suppkey"),
          col("l_extendedprice").cast("decimal(18,2)").as("v"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("v")).as("value"))
        // feeds the global total AND the filter side: cut, or the
        // per-supplier rollup (the query's only fact pass) runs twice
        .localCheckpoint(false)
      val total = perSupp.agg(sum(col("value")).as("tot"))
      perSupp
        .crossJoin(broadcast(total))
        .filter(col("value") * 1000 > col("tot"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"),
          (round(col("value").cast("double") * 100) / 100).as("value"))
        .orderBy(col("value").desc, col("s_name").asc_nulls_last)
    }, Some(
      """WITH ps AS (
           SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
           FROM lineitem GROUP BY l_suppkey),
         tot AS (SELECT sum(value) AS tot FROM ps)
         SELECT s_name, (round(CAST(value AS DOUBLE)*100)/100) AS value
         FROM ps CROSS JOIN tot
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE value * 1000 > tot
         ORDER BY value DESC, s_name ASC NULLS LAST""")),

    // ------------------------------------------------------------------- X8
    // TPC-H Q4 shape: orders in a quarter with at least one line shipped
    // after the order date (EXISTS → left-semi). The semi join carries the
    // non-equi conjunct inside the hash join (probe-side residual), so the
    // fact table never materializes matched pairs — output is bounded by
    // |orders in the quarter| before the tiny priority aggregate.
    QueryDef("x8_workload_q4", (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }, Some(
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority ASC NULLS LAST""")),

    // ------------------------------------------------------------------ J12
    // Salted skew join — the manual remedy when one fact key dominates and
    // the dim side is too big to broadcast (AQE's skew split only kicks in
    // for sort-merge; this form fixes the hash-partition hotspot itself).
    // The dim side replicates SALT ways (explode of a literal array), the
    // fact side picks a DETERMINISTIC salt from xxhash64 of its line id,
    // and the join key widens to (key, salt) — each hot key now spreads
    // over SALT reducers. Results are provably identical to the unsalted
    // join (every fact row still meets exactly one dim replica), which is
    // what the oracle checks. shuffle_hash hint pins the 100 TB plan shape
    // (no broadcast at test SF, no sort-merge sort of the replicated dim).
    QueryDef("j12_skew_salted", (s, dir) => {
      val saltN = 8
      val fact = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(saltN)))
      val dim = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("salt",
          explode(array((0 until saltN).map(i => lit(i.toLong)): _*)))
      fact.join(dim.hint("shuffle_hash"),
          fact("l_orderkey") === dim("o_orderkey") &&
            fact("salt") === dim("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          (round(sum(col("l_extendedprice")) * 100) / 100).as("revenue"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }, Some(
      """SELECT o_orderpriority, count(*) AS n_lines,
                (round((sum(l_extendedprice))*100)/100) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority ASC NULLS LAST""")),

    // ------------------------------------------------------------------- X9
    // TPC-H Q17 shape: revenue from small-quantity orders of one brand
    // (correlated avg-quantity subquery → aggregate-then-join). Parity:
    // quantities compare as BIGINT cents and the 20%-of-avg predicate is
    // the cross-multiplied integer form `q*5*cnt < sum_q` — no float
    // division anywhere near the filter. Scale: the brand filter broadcasts
    // into the fact scan FIRST (partkey pushdown bounds everything after
    // it), the per-part avg is one map-side-combined shuffle over the
    // restricted fact, and the final result is a single scalar.
    QueryDef("x9_workload_q17", (s, dir) => {
      val pf = broadcast(t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey")))
      val li = t(s, dir, "lineitem")
        .join(pf, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          col("l_quantity"), col("l_extendedprice"),
          expr("CAST(round((l_quantity)*100) AS BIGINT)").as("q_c"))
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(col("q_c")).as("sum_qc"), count(lit(1)).as("cnt"))
      li.join(perPart, Seq("l_partkey"))
        .filter(col("q_c") * 5 * col("cnt") < col("sum_qc"))
        .agg((round((sum(col("l_extendedprice")) / 7.0)*100)/100)
          .as("avg_yearly"))
    }, Some(
      """WITH li AS (
           SELECT l_partkey, l_quantity, l_extendedprice,
                  CAST(round((l_quantity)*100) AS BIGINT) AS q_c
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#23'),
         pp AS (
           SELECT l_partkey, CAST(sum(q_c) AS BIGINT) AS sum_qc,
                  count(*) AS cnt
           FROM li GROUP BY 1)
         SELECT (round((sum(l_extendedprice) / 7.0)*100)/100) AS avg_yearly
         FROM li JOIN pp USING (l_partkey)
         WHERE q_c * 5 * cnt < sum_qc""")),

    // ------------------------------------------------------------------ X10
    // TPC-H Q22 shape: "wealthy inactive customers" — above-average
    // balance, no urgent orders (the fixture gives every customer SOME
    // order, so the inactivity cut is priority-scoped to keep the result
    // non-empty) — reported per nation. Parity: balances compare
    // as BIGINT cents against the cross-multiplied mean (`bal*cnt >
    // sum_bal`), so the above-average cut has no float boundary. Scale:
    // the global (sum, count) pair is a 1-row broadcast (never a driver
    // collect); the no-orders test is a left-anti hash join on custkey —
    // the orders side projects to its join key only, so the anti join
    // ships keys, not rows.
    QueryDef("x10_workload_q22", (s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          expr("CAST(round((c_acctbal)*100) AS BIGINT)").as("bal_c"))
        .filter(col("bal_c") > 0)
      val stats = broadcast(cust.agg(sum(col("bal_c")).as("sum_bal"),
        count(lit(1)).as("cnt")))
      cust.crossJoin(stats)
        .filter(col("bal_c") * col("cnt") > col("sum_bal"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          (round((sum(col("c_acctbal")))*100)/100).as("totacctbal"))
        .orderBy(col("c_nationkey").asc_nulls_last)
    }, Some(
      """WITH cust AS (
           SELECT c_custkey, c_nationkey, c_acctbal,
                  CAST(round((c_acctbal)*100) AS BIGINT) AS bal_c
           FROM customer
           WHERE CAST(round((c_acctbal)*100) AS BIGINT) > 0),
         stats AS (
           SELECT CAST(sum(bal_c) AS BIGINT) AS sum_bal, count(*) AS cnt
           FROM cust)
         SELECT c_nationkey, count(*) AS numcust,
                (round((sum(c_acctbal))*100)/100) AS totacctbal
         FROM cust CROSS JOIN stats
         WHERE bal_c * cnt > sum_bal
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY c_nationkey
         ORDER BY c_nationkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------ X11
    // TPC-H Q15 shape: the top-revenue supplier(s) of a quarter (view +
    // scalar max subquery). Parity: per-line revenue rounds to BIGINT
    // cents BEFORE summing, so the per-supplier totals and the max are
    // order-free integers and the `= max` cut is exact (a float-sum
    // equality would flip at representation boundaries). Scale: one
    // map-side-combined shuffle on l_suppkey over the date-pruned scan;
    // the max rides back as a 1-row broadcast; supplier names broadcast
    // into a result bounded by ties.
    QueryDef("x11_workload_q15", (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          expr("CAST(round((l_extendedprice*(1-l_discount))*100) AS BIGINT)")
            .as("rev_c"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("rev_c")).as("total_c"))
        // feeds the max subquery AND the outer filter: cut, or the
        // revenue rollup (the query's only fact pass) runs twice
        .localCheckpoint(false)
      val mx = broadcast(rev.agg(max(col("total_c")).as("max_c")))
      rev.crossJoin(mx)
        .filter(col("total_c") === col("max_c"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (round((col("total_c").cast("double") / 100.0)*100)/100)
            .as("total_revenue"))
        .orderBy(col("s_suppkey").asc_nulls_last)
    }, Some(
      """WITH rev AS (
           SELECT l_suppkey,
                  CAST(sum(CAST(round((l_extendedprice*(1-l_discount))*100)
                    AS BIGINT)) AS BIGINT) AS total_c
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
           GROUP BY 1),
         mx AS (SELECT max(total_c) AS max_c FROM rev)
         SELECT s_suppkey, s_name,
                (round((CAST(total_c AS DOUBLE) / 100.0)*100)/100)
                  AS total_revenue
         FROM rev CROSS JOIN mx
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_c = max_c
         ORDER BY s_suppkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------ X12
    // TPC-H Q10 shape: top returned-item revenue per customer in a
    // quarter. The plan at any scale: both date bounds push into the
    // orders scan and the returnflag pushes into lineitem; the
    // fact-to-orders join is keyed on orderkey, the customer attributes
    // arrive via a broadcast (shuffle at real SF — same shape), and the
    // top-20 compiles to TakeOrderedAndProject, never a global sort.
    QueryDef("x12_workload_q10", (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
        .agg((round((sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))*100)/100)
          .as("revenue"))
        .orderBy(col("revenue").desc_nulls_last, col("c_custkey").asc_nulls_last)
        .limit(20)
    }, Some(
      """SELECT c_custkey, c_name, c_acctbal, c_nationkey,
                (round((sum(l_extendedprice * (1 - l_discount)))*100)/100)
                  AS revenue
         FROM customer, orders, lineitem
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
           AND l_returnflag = 'R'
         GROUP BY c_custkey, c_name, c_acctbal, c_nationkey
         ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS LAST
         LIMIT 20""")),

    // ------------------------------------------------------------------ X13
    // TPC-H Q19 shape: disjunction-of-conjunctions over a join (the
    // "promo revenue" OR-of-ANDs). The plan move: the COMMON conjunct of
    // all three arms (the brand set, the global quantity range) pushes
    // into the scans as a pre-filter, the part side broadcasts, and the
    // residual OR evaluates inside the join — Catalyst's CNF extraction
    // doing at plan time what hand-written UNION-of-three-joins would
    // cost three scans to do. One float op chain mirrored textually.
    QueryDef("x13_workload_q19", (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 20))
        .agg((round((sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))*100)/100)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    }, Some(
      """SELECT (round((sum(l_extendedprice * (1 - l_discount)))*100)/100)
                  AS revenue,
                count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_quantity >= 1 AND l_quantity <= 30
           AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                 AND l_quantity <= 11)
             OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                 AND l_quantity BETWEEN 10 AND 20)
             OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                 AND l_quantity >= 20))""")),

    // ------------------------------------------------------------------ X14
    // TPC-H Q16 shape: distinct supplier counts per part attribute group,
    // excluding a blacklist (NOT IN → left-anti). The supplier relation
    // here is lineitem's (partkey, suppkey) pairs (the fixture has no
    // partsupp). Scale shape: the blacklist is a tiny broadcast anti
    // join on the fact BEFORE the distinct aggregate; the (group,
    // suppkey) dedup and the final count share one group-keyed shuffle
    // (partial dedup map-side); part attributes broadcast in.
    QueryDef("x14_workload_q16", (s, dir) => {
      val bad = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#45" && col("p_size") <= 20)
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc_nulls_last,
          col("p_type").asc_nulls_last, col("p_size").asc_nulls_last)
        .limit(25)
    }, Some(
      """SELECT p_brand, p_type, p_size,
                CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#45' AND p_size <= 20
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand ASC NULLS LAST,
                  p_type ASC NULLS LAST, p_size ASC NULLS LAST
         LIMIT 25""")),

    // ------------------------------------------------------------------ X15
    // TPC-H Q6 shape: the forecast-revenue scan — filter + single-row
    // aggregate with NO join. The point at scale: all three predicates
    // (date range, discount band, quantity cap) push into the parquet
    // scan, so the exchange carries exactly ONE partial-agg row per task
    // — the query is scan-bandwidth-bound, the floor any engine should
    // hit.
    QueryDef("x15_workload_q6", (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg((round((sum(col("l_extendedprice") * col("l_discount")))*100)/100)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    }, Some(
      """SELECT (round((sum(l_extendedprice * l_discount))*100)/100) AS revenue,
                count(*) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""")),

    // ------------------------------------------------------------------ X16
    // TPC-H Q14 shape: promo revenue share — a conditional aggregate
    // ratio. Parity: both the promo slice and the total sum as BIGINT
    // cents (per-row round BEFORE the sum), so the ratio divides two
    // exact integers and cannot drift with summation order; the part
    // type broadcast-joins into the month-bounded fact scan.
    QueryDef("x16_workload_q14", (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .select(
          expr("CAST(round((l_extendedprice*(1-l_discount))*100) AS BIGINT)")
            .as("net_c"),
          col("p_type"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("net_c")).otherwise(0L))
            .as("promo_c"),
          sum(col("net_c")).as("total_c"))
        .select(
          (round((col("promo_c").cast("double") * 100.0
            / col("total_c").cast("double")) * 10000) / 10000)
            .as("promo_share_pct"),
          (round((col("total_c").cast("double") / 100.0)*100)/100)
            .as("total_revenue"))
    }, Some(
      """WITH l AS (
           SELECT CAST(round((l_extendedprice*(1-l_discount))*100) AS BIGINT)
                    AS net_c,
                  p_type
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'),
         a AS (
           SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN net_c ELSE 0 END)
                    AS BIGINT) AS promo_c,
                  CAST(sum(net_c) AS BIGINT) AS total_c
           FROM l)
         SELECT (round((CAST(promo_c AS DOUBLE) * 100.0
                  / CAST(total_c AS DOUBLE))*10000)/10000) AS promo_share_pct,
                (round((CAST(total_c AS DOUBLE) / 100.0)*100)/100)
                  AS total_revenue
         FROM a""")),

    // ------------------------------------------------------------------ X17
    // TPC-H Q8 shape: national market share — NATION_3's slice of
    // Europe's STANDARD-part import revenue per year. The two-level
    // conditional-ratio aggregate runs over ONE pass of the multiply
    // filtered star join (every dimension broadcasts; customer-side
    // region filter and part-type filter push before the fact join), and
    // the per-year ratio divides two exact BIGINT-cents sums.
    QueryDef("x17_workload_q8", (s, dir) => {
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val custEu = t(s, dir, "customer")
        .join(broadcast(nat.filter(col("n_regionkey") === 3)
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val suppNat = t(s, dir, "supplier")
        .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val pStd = t(s, dir, "part")
        .filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      t(s, dir, "lineitem")
        .join(broadcast(pStd), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custEu), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          expr("CAST(round((l_extendedprice*(1-l_discount))*100) AS BIGINT)")
            .as("net_c"),
          col("supp_nation"))
        .groupBy(col("yr"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("net_c"))
            .otherwise(0L)).as("nation_c"),
          sum(col("net_c")).as("total_c"))
        .select(col("yr"),
          (round((col("nation_c").cast("double")
            / col("total_c").cast("double")) * 10000) / 10000)
            .as("mkt_share"),
          (round((col("total_c").cast("double") / 100.0)*100)/100)
            .as("total_revenue"))
        .orderBy(col("yr").asc_nulls_last)
    }, Some(
      """WITH l AS (
           SELECT year(o_orderdate) AS yr,
                  CAST(round((l_extendedprice*(1-l_discount))*100) AS BIGINT)
                    AS net_c,
                  sn.n_name AS supp_nation
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation cn ON c_nationkey = cn.n_nationkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation sn ON s_nationkey = sn.n_nationkey
           WHERE p_type = 'STANDARD' AND cn.n_regionkey = 3),
         a AS (
           SELECT yr,
                  CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                           THEN net_c ELSE 0 END) AS BIGINT) AS nation_c,
                  CAST(sum(net_c) AS BIGINT) AS total_c
           FROM l GROUP BY yr)
         SELECT yr,
                (round((CAST(nation_c AS DOUBLE)
                  / CAST(total_c AS DOUBLE))*10000)/10000) AS mkt_share,
                (round((CAST(total_c AS DOUBLE) / 100.0)*100)/100)
                  AS total_revenue
         FROM a ORDER BY yr ASC NULLS LAST""")),

    // ------------------------------------------------------------------ X18
    // TPC-H Q12 shape: shipping-class audit — per class (l_linestatus
    // standing in for the fixture's missing l_shipmode), count lines on
    // critical-priority orders vs the rest, over a ship-date year. The
    // CASE pair evaluates inside one partial+final aggregate over the
    // orderkey-keyed join; the date bounds push into the fact scan and
    // the orders side projects to (key, priority) only. With Q12 the
    // suite covers 19 of 22 TPC-H query shapes — q2/q9/q20 need the
    // partsupp table the fixtures do not carry.
    QueryDef("x18_workload_q12", (s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linestatus"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus").asc_nulls_last)
    }, Some(
      """SELECT l_linestatus,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY l_linestatus
         ORDER BY l_linestatus ASC NULLS LAST""")),

    // ------------------------------------------------------------------ X19
    // TPC-H Q2 shape: minimum-cost supplier per part (correlated MIN
    // subquery → aggregate-then-join-back on the (part, min) pair). The
    // fixtures carry no partsupp, so the part-supplier relation derives
    // from lineitem's distinct pairs with a DETERMINISTIC synthesized
    // integer cost — both engines compute identical values, so the
    // argmin set is exact. Plan: the min-cost table and the join-back
    // share one partkey-keyed shuffle; part/supplier/nation attributes
    // broadcast; the region filter lands before any fact-sized work.
    QueryDef("x19_workload_q2", (s, dir) => {
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .distinct()
        .withColumn("cost_c",
          expr("(partkey * 31 + suppkey * 17) % 1000"))
      val pf = broadcast(t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .select(col("p_partkey")))
      val suppEu = broadcast(t(s, dir, "supplier")
        .join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 3)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name")))
      // r19: `eligible` feeds BOTH the min-cost aggregate and the
      // join-back; the two branches materialize concurrently under AQE,
      // so exchange reuse misses and the whole distinct+join subtree ran
      // twice (JobTrace showed the pair of identical 0.75 s jobs). The
      // lazy lineage cut materializes it once inside the same action —
      // the g1 pattern; blocks free via the ContextCleaner.
      val eligible = ps
        .join(pf, col("partkey") === col("p_partkey"))
        .join(suppEu, col("suppkey") === col("s_suppkey"))
        .localCheckpoint(false)
      val minCost = eligible.groupBy(col("partkey").as("mk"))
        .agg(min(col("cost_c")).as("min_c"))
      eligible
        .join(minCost, col("partkey") === col("mk") &&
          col("cost_c") === col("min_c"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("partkey").as("p_partkey"), col("cost_c"))
        .orderBy(col("s_acctbal").desc_nulls_last, col("n_name").asc_nulls_last,
          col("s_name").asc_nulls_last, col("p_partkey").asc_nulls_last)
        .limit(20)
    }, Some(
      """WITH ps AS (
           SELECT partkey, suppkey,
                  (partkey * 31 + suppkey * 17) % 1000 AS cost_c
           FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
                 FROM lineitem)),
         elig AS (
           SELECT ps.partkey, ps.cost_c, s.s_name, s.s_acctbal, n.n_name
           FROM ps
           JOIN part ON ps.partkey = p_partkey
           JOIN supplier s ON ps.suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           WHERE p_size = 15 AND p_type = 'STANDARD' AND n.n_regionkey = 3),
         mc AS (SELECT partkey AS mk, min(cost_c) AS min_c
                FROM elig GROUP BY 1)
         SELECT s_acctbal, s_name, n_name, partkey AS p_partkey, cost_c
         FROM elig JOIN mc ON partkey = mk AND cost_c = min_c
         ORDER BY s_acctbal DESC NULLS LAST, n_name ASC NULLS LAST,
                  s_name ASC NULLS LAST, p_partkey ASC NULLS LAST
         LIMIT 20""")),

    // ------------------------------------------------------------------ X20
    // TPC-H Q9 shape: product-line profit per supplier nation per year —
    // the widest join in the suite (lineitem ⋈ part ⋈ supplier ⋈ nation
    // ⋈ orders) with profit = revenue − cost·quantity. Cost is the same
    // synthesized deterministic integer as Q2; revenue rounds to cents
    // per row; quantity is integral — so per-line profit is an exact
    // BIGINT and the nation×year sums are summation-order-free. Every
    // dimension broadcasts; the only fact-sized exchanges are the
    // orderkey join and the final tiny group-by.
    QueryDef("x20_workload_q9", (s, dir) => {
      val pf = broadcast(t(s, dir, "part")
        .filter(col("p_type") === "PROMO")
        .select(col("p_partkey")))
      val sn = broadcast(t(s, dir, "supplier")
        .join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation")))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      t(s, dir, "lineitem")
        .join(pf, col("l_partkey") === col("p_partkey"))
        .join(sn, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("nation"), col("o_year"),
          (expr("CAST(round((l_extendedprice*(1-l_discount))*100) AS BIGINT)")
            - expr("((l_partkey * 31 + l_suppkey * 17) % 1000)")
              * expr("CAST(round(l_quantity) AS BIGINT)")).as("amount_c"))
        .groupBy(col("nation"), col("o_year"))
        .agg((round((sum(col("amount_c")).cast("double") / 100.0)*100)/100)
          .as("sum_profit"))
        .orderBy(col("nation").asc_nulls_last, col("o_year").desc_nulls_last)
    }, Some(
      """WITH l AS (
           SELECT n_name AS nation, year(o_orderdate) AS o_year,
                  CAST(round((l_extendedprice*(1-l_discount))*100) AS BIGINT)
                    - ((l_partkey * 31 + l_suppkey * 17) % 1000)
                      * CAST(round(l_quantity) AS BIGINT) AS amount_c
           FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
           WHERE p_type = 'PROMO')
         SELECT nation, o_year,
                (round((CAST(sum(amount_c) AS DOUBLE) / 100.0)*100)/100)
                  AS sum_profit
         FROM l GROUP BY nation, o_year
         ORDER BY nation ASC NULLS LAST, o_year DESC NULLS LAST""")),

    // ------------------------------------------------------------------ X21
    // TPC-H Q20 shape: suppliers holding excess stock of promo parts —
    // the nested-IN chain (parts → part-supplier excess test → supplier
    // semi join). Availqty is the synthesized deterministic integer;
    // "excess" = availqty > half the 1996 shipped quantity for that
    // (part, supplier), compared in integers (availqty·2 > shipped). The
    // chain lowers to: per-(part,supp) shipped aggregate over the
    // date-pruned fact, integer filter, then a LEFT SEMI into supplier —
    // no correlated re-execution anywhere.
    QueryDef("x21_workload_q20", (s, dir) => {
      val promo = broadcast(t(s, dir, "part")
        .filter(col("p_type") === "PROMO")
        .select(col("p_partkey")))
      val shipped = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(promo, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(expr("CAST(round(sum(l_quantity)) AS BIGINT)").as("shipped_q"))
      val excess = shipped
        .withColumn("availqty",
          expr("(l_partkey * 7 + l_suppkey * 13) % 100 + 50"))
        .filter(col("availqty") * 2 > col("shipped_q"))
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 1)
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name").asc_nulls_last)
    }, Some(
      """WITH shipped AS (
           SELECT l_partkey, l_suppkey,
                  CAST(round(sum(l_quantity)) AS BIGINT) AS shipped_q
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_type = 'PROMO'
             AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           GROUP BY 1, 2),
         excess AS (
           SELECT l_suppkey FROM shipped
           WHERE ((l_partkey * 7 + l_suppkey * 13) % 100 + 50) * 2
                 > shipped_q)
         SELECT s_name, n_name
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_regionkey = 1
           AND s_suppkey IN (SELECT l_suppkey FROM excess)
         ORDER BY s_name ASC NULLS LAST""")),

    // ------------------------------------------------------------------ J13
    // Interval-overlap join via temporal bucketing — the scale-safe
    // rewrite of the classic `a.start <= b.end AND b.start <= a.end`
    // theta join. Each interval replicates to every day-bucket it
    // touches (map-side sequence+explode), the join becomes an EQUALITY
    // join on the bucket plus the overlap residual, and duplicate
    // matches from multi-bucket overlaps collapse in the final distinct
    // aggregate. At 100 TB the theta form is a cartesian per key-less
    // pair (O(n·m)); the bucketed form shuffles O(n·avg_span_buckets)
    // rows hash-distributed by day — the standard spatial-binning move.
    // Intervals derive from the fixtures: per-user-per-day activity
    // spans × per-type-per-day busy spans, bucket = epoch day.
    QueryDef("j13_interval_bucket", (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(date_trunc("second", col("ts"))).as("ts_e"))
      val ua = e.groupBy(col("user_id"),
          expr("CAST(ts_e div 86400 AS BIGINT)").as("a_day"))
        .agg(min(col("ts_e")).as("a_s"), max(col("ts_e")).as("a_e"))
        .filter(col("a_e") > col("a_s") + 1800)
      val tb = e.filter(col("event_type") === "purchase")
        .groupBy(expr("CAST(ts_e div 86400 AS BIGINT)").as("b_day"))
        .agg(min(col("ts_e")).as("b_s"), max(col("ts_e")).as("b_e"))
      val uaB = ua.select(col("user_id"), col("a_s"), col("a_e"),
        explode(sequence(expr("a_s div 86400"), expr("a_e div 86400")))
          .as("bucket"))
      val tbB = tb.select(col("b_s"), col("b_e"),
        explode(sequence(expr("b_s div 86400"), expr("b_e div 86400")))
          .as("bucket"))
      uaB.join(tbB, Seq("bucket"))
        .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select(col("user_id"), col("a_s"), col("b_s")).distinct()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_overlaps"))
        .orderBy(col("user_id").asc_nulls_last)
    }, Some(
      """WITH e AS (
           SELECT user_id, event_type,
                  CAST(epoch(CAST(date_trunc('second', CAST(ts AS TIMESTAMP))
                    AS TIMESTAMP)) AS BIGINT) AS ts_e
           FROM events),
         ua AS (
           SELECT user_id, ts_e // 86400 AS a_day,
                  min(ts_e) AS a_s, max(ts_e) AS a_e
           FROM e GROUP BY 1, 2
           HAVING max(ts_e) > min(ts_e) + 1800),
         tb AS (
           SELECT ts_e // 86400 AS b_day,
                  min(ts_e) AS b_s, max(ts_e) AS b_e
           FROM e WHERE event_type = 'purchase' GROUP BY 1)
         SELECT user_id, count(*) AS n_overlaps FROM (
           SELECT DISTINCT user_id, a_s, b_s
           FROM ua JOIN tb ON a_s <= b_e AND b_s <= a_e) t
         GROUP BY user_id
         ORDER BY user_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A21
    // One-pass distributed OLS by normal equations — the closed-form
    // multi-feature regression a 100-TB pipeline can actually run: the
    // ENTIRE fit is one partial-aggregable pass. Per-order features roll
    // up under the fact table's natural orderkey shuffle; the Gram matrix
    // (X^T X) and moment vector (X^T y) are ten mergeable sums computed
    // EXACTLY in DECIMAL (no float summation order anywhere — map-side
    // combine is free to reorder); the 3x3 solve is Cramer's rule on ONE
    // row in doubles, a fixed IEEE expression tree both engines evaluate
    // bit-identically, so coefficients AND R-squared are oracle-exact.
    // The same text runs verbatim on Spark and DuckDB. Extends A8/A14
    // (built-in regr_* are single-feature) to true multivariate fitting;
    // k features cost k(k+3)/2 sums — still one pass, no iteration, the
    // scalable alternative to gradient descent for linear models.
    QueryDef.sql("a21_normal_equations",
      spark =
        """WITH per_order AS (
  SELECT CAST(count(*) AS DECIMAL(18,0)) AS x1,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DECIMAL(18,0)) AS x2,
         CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS DECIMAL(18,0)) AS y
  FROM lineitem GROUP BY l_orderkey),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x1) AS DOUBLE) AS sx1, CAST(sum(x2) AS DOUBLE) AS sx2,
         CAST(sum(x1*x1) AS DOUBLE) AS sx11, CAST(sum(x1*x2) AS DOUBLE) AS sx12,
         CAST(sum(x2*x2) AS DOUBLE) AS sx22,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x1*y) AS DOUBLE) AS sx1y, CAST(sum(x2*y) AS DOUBLE) AS sx2y,
         CAST(sum(y*y) AS DOUBLE) AS syy,
         count(*) AS n_rows
  FROM per_order),
s AS (
  SELECT n_rows, n, sy, syy, sx1, sx2, sx11, sx12, sx22, sx1y, sx2y,
    (n*(sx11*sx22 - sx12*sx12) - sx1*(sx1*sx22 - sx12*sx2) + sx2*(sx1*sx12 - sx11*sx2)) AS det,
    (sy*(sx11*sx22 - sx12*sx12) - sx1*(sx1y*sx22 - sx12*sx2y) + sx2*(sx1y*sx12 - sx11*sx2y)) AS det0,
    (n*(sx1y*sx22 - sx12*sx2y) - sy*(sx1*sx22 - sx12*sx2) + sx2*(sx1*sx2y - sx1y*sx2)) AS det1,
    (n*(sx11*sx2y - sx1y*sx12) - sx1*(sx1*sx2y - sx1y*sx2) + sy*(sx1*sx12 - sx11*sx2)) AS det2
  FROM g),
b AS (
  SELECT n_rows, n, sy, syy, sx1, sx2, sx11, sx12, sx22, sx1y, sx2y,
         (det0/det) AS b0, (det1/det) AS b1, (det2/det) AS b2
  FROM s)
SELECT n_rows,
  (round((b0)*1000000)/1000000) AS beta0,
  (round((b1)*1000000)/1000000) AS beta1,
  (round((b2)*1000000)/1000000) AS beta2,
  (round((1 - (syy - 2*(b0*sy + b1*sx1y + b2*sx2y)
    + (b0*(b0*n + b1*sx1 + b2*sx2)
     + b1*(b0*sx1 + b1*sx11 + b2*sx12)
     + b2*(b0*sx2 + b1*sx12 + b2*sx22)))
    / (syy - sy*sy/n))*1000000)/1000000) AS r2
FROM b""",
      oracle =
        """WITH per_order AS (
  SELECT CAST(count(*) AS DECIMAL(18,0)) AS x1,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DECIMAL(18,0)) AS x2,
         CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS DECIMAL(18,0)) AS y
  FROM lineitem GROUP BY l_orderkey),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x1) AS DOUBLE) AS sx1, CAST(sum(x2) AS DOUBLE) AS sx2,
         CAST(sum(x1*x1) AS DOUBLE) AS sx11, CAST(sum(x1*x2) AS DOUBLE) AS sx12,
         CAST(sum(x2*x2) AS DOUBLE) AS sx22,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x1*y) AS DOUBLE) AS sx1y, CAST(sum(x2*y) AS DOUBLE) AS sx2y,
         CAST(sum(y*y) AS DOUBLE) AS syy,
         count(*) AS n_rows
  FROM per_order),
s AS (
  SELECT n_rows, n, sy, syy, sx1, sx2, sx11, sx12, sx22, sx1y, sx2y,
    (n*(sx11*sx22 - sx12*sx12) - sx1*(sx1*sx22 - sx12*sx2) + sx2*(sx1*sx12 - sx11*sx2)) AS det,
    (sy*(sx11*sx22 - sx12*sx12) - sx1*(sx1y*sx22 - sx12*sx2y) + sx2*(sx1y*sx12 - sx11*sx2y)) AS det0,
    (n*(sx1y*sx22 - sx12*sx2y) - sy*(sx1*sx22 - sx12*sx2) + sx2*(sx1*sx2y - sx1y*sx2)) AS det1,
    (n*(sx11*sx2y - sx1y*sx12) - sx1*(sx1*sx2y - sx1y*sx2) + sy*(sx1*sx12 - sx11*sx2)) AS det2
  FROM g),
b AS (
  SELECT n_rows, n, sy, syy, sx1, sx2, sx11, sx12, sx22, sx1y, sx2y,
         (det0/det) AS b0, (det1/det) AS b1, (det2/det) AS b2
  FROM s)
SELECT n_rows,
  (round((b0)*1000000)/1000000) AS beta0,
  (round((b1)*1000000)/1000000) AS beta1,
  (round((b2)*1000000)/1000000) AS beta2,
  (round((1 - (syy - 2*(b0*sy + b1*sx1y + b2*sx2y)
    + (b0*(b0*n + b1*sx1 + b2*sx2)
     + b1*(b0*sx1 + b1*sx11 + b2*sx12)
     + b2*(b0*sx2 + b1*sx12 + b2*sx22)))
    / (syy - sy*sy/n))*1000000)/1000000) AS r2
FROM b"""),

    // ------------------------------------------------------------------ A23
    // K-fold cross-validated regression in ONE corpus pass — the
    // sufficient-statistics trick: per-fold EXACT integer sums (n, Σx,
    // Σy, Σx², Σxy, Σy²) are the only thing the corpus contributes;
    // "train on k−1 folds" is then (totals − fold) arithmetic on the
    // 5-row fold frame, and the held-out RMSE expands algebraically as
    // Σ(y−b0−b1x)² = Σy² − 2b0Σy − 2b1Σxy + n·b0² + 2b0b1Σx + b1²Σx²
    // — so evaluation needs NO second data pass and NO per-row
    // prediction join. Fold assignment is deterministic (orderkey % 5).
    // Sums in x are BIGINT-exact; Σy² — the one sum that would wrap
    // BIGINT silently in Spark (non-ANSI) while DuckDB promotes to
    // HUGEINT — accumulates as DECIMAL(38,0) in BOTH engines, so the
    // engines agree at ANY scale factor, not just the tested ones;
    // the float math runs on a fixed expression tree over identical
    // integer inputs, same text in both engines (the a21 discipline).
    // At 100 TB: one partial-aggregable pass + 5-row math — the
    // distributed-CV idiom that replaces k training scans with one.
    QueryDef.sql("a23_kfold_cv",
      """WITH obs AS (
  SELECT l_orderkey % 5 AS fold,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_extendedprice) AS BIGINT) AS y
  FROM lineitem),
f AS (
  SELECT fold, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
         sum(CAST(y*y AS DECIMAL(38,0))) AS syy
  FROM obs GROUP BY fold),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(sx) AS BIGINT) AS tsx,
         CAST(sum(sy) AS BIGINT) AS tsy, CAST(sum(sxx) AS BIGINT) AS tsxx,
         CAST(sum(sxy) AS BIGINT) AS tsxy, sum(syy) AS tsyy
  FROM f),
lofo AS (
  SELECT fold, n, sx, sy, sxx, sxy, syy,
         CAST(tn - n AS DOUBLE) AS hn, CAST(tsx - sx AS DOUBLE) AS hsx,
         CAST(tsy - sy AS DOUBLE) AS hsy, CAST(tsxx - sxx AS DOUBLE) AS hsxx,
         CAST(tsxy - sxy AS DOUBLE) AS hsxy
  FROM f CROSS JOIN tot),
beta AS (
  SELECT fold, n, sx, sy, sxx, sxy, syy,
         (hn*hsxy - hsx*hsy) / (hn*hsxx - hsx*hsx) AS b1,
         (hsy - ((hn*hsxy - hsx*hsy) / (hn*hsxx - hsx*hsx)) * hsx) / hn AS b0
  FROM lofo)
SELECT fold, n AS n_eval,
  (round((b1)*1000000)/1000000) AS slope,
  (round((b0)*1000000)/1000000) AS intercept,
  (round((sqrt((CAST(syy AS DOUBLE) - 2*b0*CAST(sy AS DOUBLE)
    - 2*b1*CAST(sxy AS DOUBLE) + CAST(n AS DOUBLE)*b0*b0
    + 2*b0*b1*CAST(sx AS DOUBLE) + b1*b1*CAST(sxx AS DOUBLE))
    / CAST(n AS DOUBLE)))*1000000)/1000000) AS rmse
FROM beta
ORDER BY fold ASC NULLS LAST""",
      oracle =
        """WITH obs AS (
  SELECT l_orderkey % 5 AS fold,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_extendedprice) AS BIGINT) AS y
  FROM lineitem),
f AS (
  SELECT fold, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
         sum(CAST(y*y AS DECIMAL(38,0))) AS syy
  FROM obs GROUP BY fold),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(sx) AS BIGINT) AS tsx,
         CAST(sum(sy) AS BIGINT) AS tsy, CAST(sum(sxx) AS BIGINT) AS tsxx,
         CAST(sum(sxy) AS BIGINT) AS tsxy, sum(syy) AS tsyy
  FROM f),
lofo AS (
  SELECT fold, n, sx, sy, sxx, sxy, syy,
         CAST(tn - n AS DOUBLE) AS hn, CAST(tsx - sx AS DOUBLE) AS hsx,
         CAST(tsy - sy AS DOUBLE) AS hsy, CAST(tsxx - sxx AS DOUBLE) AS hsxx,
         CAST(tsxy - sxy AS DOUBLE) AS hsxy
  FROM f CROSS JOIN tot),
beta AS (
  SELECT fold, n, sx, sy, sxx, sxy, syy,
         (hn*hsxy - hsx*hsy) / (hn*hsxx - hsx*hsx) AS b1,
         (hsy - ((hn*hsxy - hsx*hsy) / (hn*hsxx - hsx*hsx)) * hsx) / hn AS b0
  FROM lofo)
SELECT fold, n AS n_eval,
  (round((b1)*1000000)/1000000) AS slope,
  (round((b0)*1000000)/1000000) AS intercept,
  (round((sqrt((CAST(syy AS DOUBLE) - 2*b0*CAST(sy AS DOUBLE)
    - 2*b1*CAST(sxy AS DOUBLE) + CAST(n AS DOUBLE)*b0*b0
    + 2*b0*b1*CAST(sx AS DOUBLE) + b1*b1*CAST(sxx AS DOUBLE))
    / CAST(n AS DOUBLE)))*1000000)/1000000) AS rmse
FROM beta
ORDER BY fold ASC NULLS LAST"""),

    // ------------------------------------------------------------------ P11
    // Stable contiguous global IDs WITHOUT a corpus-wide single-partition
    // window — the classic Spark scale killer is `row_number() OVER
    // (ORDER BY …)` with no PARTITION BY: every row funnels through one
    // task. The distributed idiom is two-phase: rank within a
    // deterministic shard (32-way here), count rows per shard, prefix-sum
    // the 32-row count frame into shard offsets (the ONLY single-partition
    // window, bounded at #shards rows), broadcast the offsets back, and
    // add. Total order = (shard, doc_id), reproducible run-over-run — the
    // property monotonically_increasing_id does NOT give you. This is how
    // a 100 TB corpus gets training-example IDs: one corpus shuffle on the
    // shard key, one bounded driver-free prefix sum, one broadcast join.
    QueryDef("p11_stable_ids", (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
      graft.operators.DistributedRank.withGlobalRank(d,
          expr("doc_id % 32"), Seq(col("doc_id").asc), "global_id")
        .select(col("doc_id"), col("global_id"))
        .orderBy(col("global_id").asc_nulls_last)
    }, Some(
      """SELECT doc_id,
                row_number() OVER (ORDER BY doc_id % 32, doc_id)
                  AS global_id
         FROM documents
         ORDER BY global_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------ P12
    // SYSTEMATIC SAMPLING (every k-th element of a stable total order)
    // — the survey-sampling method with guaranteed stratification-like
    // spread that Bernoulli (p6) and hash-band (p10) sampling don't
    // give: exactly ⌈n/k⌉ rows, evenly spaced over the order. Rides
    // p11's two-phase distributed global IDs (rank within 32 shards +
    // broadcast prefix offsets — no corpus-wide single-partition sort),
    // then the k-step is a pure map-side modulus. The census proves
    // spacing: per-modulus counts and the exact sampled id range.
    QueryDef("p12_systematic_sample", (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"))
      graft.operators.DistributedRank.withGlobalRank(d,
          expr("doc_id % 32"), Seq(col("doc_id").asc), "gid")
        .select(col("doc_id"), col("gid"))
        .filter(expr("gid % 25 = 1"))
        .agg(count(lit(1)).as("n_sampled"),
          min(col("gid")).as("first_gid"), max(col("gid")).as("last_gid"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          sum(col("doc_id")).as("sum_docs"))
    }, Some(
      """WITH ids AS (
           SELECT doc_id,
                  row_number() OVER (ORDER BY doc_id % 32, doc_id) AS gid
           FROM documents)
         SELECT count(*) AS n_sampled,
                CAST(min(gid) AS BIGINT) AS first_gid,
                CAST(max(gid) AS BIGINT) AS last_gid,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc,
                CAST(sum(doc_id) AS BIGINT) AS sum_docs
         FROM ids WHERE gid % 25 = 1""")),

    // ------------------------------------------------------------------ X22
    // TPC-DS q67 SHAPE over the star schema — the decision-support
    // pattern TPC-H lacks: a partial ROLLUP (per-nation totals at three
    // grain levels in ONE aggregate pass) feeding a per-group window
    // top-k over the combined lattice. grouping() columns disambiguate
    // rollup nulls from data nulls AND pin the rank tiebreak across
    // grains; money rides as cents-BIGINTs so ranking is integer-exact.
    // Scale: GROUPING SETS expand map-side (one shuffle keyed on the
    // group tuple), and the rank's PARTITION BY nation re-shuffles only
    // the lattice rows — never the fact table twice. Identical SQL text
    // on both engines.
    QueryDef.sql("x22_ds_rollup_topk",
      spark =
        """WITH base AS (
           SELECT n_name,
                  CAST(year(o_orderdate) AS INTEGER) AS yr,
                  o_orderstatus AS status,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey),
         agg AS (
           SELECT n_name, yr, status,
                  CAST(sum(cents) AS BIGINT) AS sum_cents,
                  count(*) AS n,
                  CAST(grouping(yr) AS INTEGER) AS g_yr,
                  CAST(grouping(status) AS INTEGER) AS g_st
           FROM base GROUP BY n_name, ROLLUP(yr, status)),
         rk AS (
           SELECT n_name, yr, status, sum_cents, n, g_yr, g_st,
                  CAST(row_number() OVER (PARTITION BY n_name
                    ORDER BY sum_cents DESC, g_yr ASC, g_st ASC,
                             yr ASC NULLS FIRST, status ASC NULLS FIRST)
                    AS INTEGER) AS rk
           FROM agg)
         SELECT n_name, yr, status, sum_cents, n, g_yr, g_st, rk
         FROM rk WHERE rk <= 5
         ORDER BY n_name ASC NULLS LAST, rk ASC NULLS LAST""",
      oracle =
        """WITH base AS (
           SELECT n_name,
                  CAST(year(o_orderdate) AS INTEGER) AS yr,
                  o_orderstatus AS status,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey),
         agg AS (
           SELECT n_name, yr, status,
                  CAST(sum(cents) AS BIGINT) AS sum_cents,
                  count(*) AS n,
                  CAST(grouping(yr) AS INTEGER) AS g_yr,
                  CAST(grouping(status) AS INTEGER) AS g_st
           FROM base GROUP BY n_name, ROLLUP(yr, status)),
         rk AS (
           SELECT n_name, yr, status, sum_cents, n, g_yr, g_st,
                  CAST(row_number() OVER (PARTITION BY n_name
                    ORDER BY sum_cents DESC, g_yr ASC, g_st ASC,
                             yr ASC NULLS FIRST, status ASC NULLS FIRST)
                    AS INTEGER) AS rk
           FROM agg)
         SELECT n_name, yr, status, sum_cents, n, g_yr, g_st, rk
         FROM rk WHERE rk <= 5
         ORDER BY n_name ASC NULLS LAST, rk ASC NULLS LAST"""),

    // ------------------------------------------------------------------- O9
    // Bag-semantics set ops — INTERSECT ALL / EXCEPT ALL keep
    // MULTIPLICITIES (o5's distinct forms collapse them): with ship-mode
    // keys occurring many times per month, "how many occurrences survive
    // the other month" is a bag question. Spark's intersectAll/exceptAll
    // compile to the same replicate-by-min/difference-of-counts shuffle
    // DuckDB runs. The census aggregates each result so the oracle
    // compare is order-free over exact counts.
    QueryDef("o9_set_ops_all", (s, dir) => {
      def keys(m: Int) = t(s, dir, "lineitem")
        .filter(expr(s"month(l_shipdate) = $m AND year(l_shipdate) = 1996"))
        .select(col("l_returnflag").as("k1"), col("l_linestatus").as("k2"))
      val jan = keys(1); val feb = keys(2)
      jan.intersectAll(feb).groupBy(col("k1"), col("k2"))
        .agg(count(lit(1)).as("n_intersect_all"))
        .join(jan.exceptAll(feb).groupBy(col("k1"), col("k2"))
          .agg(count(lit(1)).as("n_except_all")),
          Seq("k1", "k2"), "full_outer")
        .select(col("k1"), col("k2"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
        .orderBy(col("k1").asc_nulls_last, col("k2").asc_nulls_last)
    }, Some(
      """WITH jan AS (
           SELECT l_returnflag AS k1, l_linestatus AS k2 FROM lineitem
           WHERE month(l_shipdate) = 1 AND year(l_shipdate) = 1996),
         feb AS (
           SELECT l_returnflag AS k1, l_linestatus AS k2 FROM lineitem
           WHERE month(l_shipdate) = 2 AND year(l_shipdate) = 1996),
         ia AS (
           SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_intersect_all
           FROM (SELECT * FROM jan INTERSECT ALL SELECT * FROM feb)
           GROUP BY 1, 2),
         ea AS (
           SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_except_all
           FROM (SELECT * FROM jan EXCEPT ALL SELECT * FROM feb)
           GROUP BY 1, 2)
         SELECT coalesce(ia.k1, ea.k1) AS k1,
                coalesce(ia.k2, ea.k2) AS k2,
                coalesce(n_intersect_all, 0) AS n_intersect_all,
                coalesce(n_except_all, 0) AS n_except_all
         FROM ia FULL OUTER JOIN ea ON ia.k1 = ea.k1 AND ia.k2 = ea.k2
         ORDER BY k1 ASC NULLS LAST, k2 ASC NULLS LAST""")),

    // ------------------------------------------------------------------ J16
    // NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM) — the join
    // every SCD/merge pipeline needs when the business key is nullable:
    // plain `=` silently drops null-keyed rows on BOTH sides; null-safe
    // equality matches null TO null. Planted null keys on both sides
    // prove the difference: the census counts matches per key including
    // the NULL bucket, next to what a plain join would have produced.
    // Plan note: Spark hashes `<=>` keys like any equi-join (null is
    // just a hash value) — still a keyed shuffle, never a cartesian.
    QueryDef("j16_null_safe_join", (s, dir) => {
      import s.implicits._
      val a = t(s, dir, "orders")
        .select(when(col("o_orderpriority") === "5-LOW",
          lit(null).cast("string")).otherwise(col("o_orderpriority")))
        .toDF("k")
      val b = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        null.asInstanceOf[String]).toDF("bk")
      a.join(b, col("k") <=> col("bk"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_null_safe"))
        .withColumn("n_plain",
          when(col("k").isNull, 0L).otherwise(col("n_null_safe")))
        .orderBy(col("k").asc_nulls_first)
    }, Some(
      """WITH a AS (
           SELECT CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                       ELSE o_orderpriority END AS k
           FROM orders),
         b AS (
           SELECT unnest(['1-URGENT', '2-HIGH', '3-MEDIUM',
                          '4-NOT SPECIFIED', NULL]) AS bk)
         SELECT k, CAST(count(*) AS BIGINT) AS n_null_safe,
                CAST(CASE WHEN k IS NULL THEN 0 ELSE count(*) END
                  AS BIGINT) AS n_plain
         FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.bk
         GROUP BY k
         ORDER BY k ASC NULLS FIRST""")),

    // ------------------------------------------------------------------ X23
    // MARKET-BASKET association rules (support / confidence / lift)
    // over part co-purchases — the retail-analytics classic TPC misses.
    // Everything INTEGER: n_a (orders containing a), n_ab (orders
    // containing both), N (orders), conf_ppm = n_ab·1e6 div n_a,
    // lift_ppm = n_ab·N·1e6 div (n_a·n_b) — floor div ≡ DuckDB //, so
    // ranking is bit-exact. The ≥2-co-occurrence floor is the scale
    // control (the g5 move: prunes the Σdeg² wedge space before any
    // pair join); candidate pairs come from ONE order-keyed
    // self-equality join, never parts×parts.
    QueryDef("x23_market_basket", (s, dir) => {
      // r19 NOTE: a localCheckpoint cut on `lp` was measured 1.5× SLOWER
      // (2.25 → 3.30 s solo action) and rejected — unlike x19/x7/x11,
      // the self-join's two sides are canonically identical, so the
      // planner already reuses ONE (ok,pk) exchange for both, and the
      // cut replaced that reuse with fresh shuffles from checkpoint
      // blocks. Keep the plan-level reuse.
      val lp = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val nOrders = broadcast(lp.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n_orders")))
      val freq = lp.groupBy(col("pk")).agg(count(lit(1)).as("n_p"))
      val pairs = lp.alias("x").join(lp.alias("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
      pairs
        .join(freq.select(col("pk").as("a"), col("n_p").as("n_a")), "a")
        .join(freq.select(col("pk").as("b"), col("n_p").as("n_b")), "b")
        .crossJoin(nOrders)
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          expr("n_ab * 1000000L div n_a").as("conf_ppm"),
          expr("n_ab * n_orders * 1000000L div (n_a * n_b)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("a").asc, col("b").asc)
        .limit(15)
    }, Some(
      """WITH lp AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
         n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
               FROM lp),
         freq AS (
           SELECT pk, CAST(count(*) AS BIGINT) AS n_p
           FROM lp GROUP BY 1),
         pairs AS (
           SELECT x.pk AS a, y.pk AS b, CAST(count(*) AS BIGINT) AS n_ab
           FROM lp x JOIN lp y ON x.ok = y.ok AND x.pk < y.pk
           GROUP BY 1, 2
           HAVING count(*) >= 2)
         SELECT a, b, n_ab, fa.n_p AS n_a, fb.n_p AS n_b,
                CAST((n_ab * 1000000) // fa.n_p AS BIGINT) AS conf_ppm,
                CAST((n_ab * n.n_orders * 1000000)
                  // (fa.n_p * fb.n_p) AS BIGINT) AS lift_ppm
         FROM pairs
         JOIN freq fa ON fa.pk = a
         JOIN freq fb ON fb.pk = b
         CROSS JOIN n
         ORDER BY lift_ppm DESC, a ASC, b ASC
         LIMIT 15""")),

    // ------------------------------------------------------------------ X24
    // TPC-DS q53/q63 SHAPE — windowed share-of-average: monthly brand
    // sales vs that brand's average monthly sales, flagging months that
    // deviate >10% (the seasonality-outlier screen). INTEGER-exact
    // ratio: share_ppm = cents·n_months·1e6 div total_cents (the
    // window's avg cleared of its division), so the flag threshold
    // compares BIGINTs and can't ulp-flip. One (brand, month) agg over
    // the fact join + one brand-partitioned window over the bounded
    // lattice — the fact table shuffles once. Same SQL text on both
    // engines except the floor-div spelling.
    QueryDef("x24_ds_windowed_share", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """WITH m AS (
             SELECT p_brand AS brand,
                    CAST(year(l_shipdate) * 100 + month(l_shipdate)
                      AS INTEGER) AS ym,
                    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE year(l_shipdate) = 1997
             GROUP BY 1, 2),
           w AS (
             SELECT brand, ym, cents,
                    CAST(sum(cents) OVER (PARTITION BY brand) AS BIGINT)
                      AS total_cents,
                    CAST(count(*) OVER (PARTITION BY brand) AS BIGINT)
                      AS n_months
             FROM m)
           SELECT brand, ym, cents,
                  CAST(cents * n_months * 1000000 div total_cents
                    AS BIGINT) AS share_of_avg_ppm,
                  (cents * n_months * 1000000 div total_cents) > 1100000
                    OR (cents * n_months * 1000000 div total_cents)
                       < 900000 AS is_outlier
           FROM w
           ORDER BY brand ASC NULLS LAST, ym ASC NULLS LAST""")
    }, Some(
      """WITH m AS (
           SELECT p_brand AS brand,
                  CAST(year(l_shipdate) * 100 + month(l_shipdate)
                    AS INTEGER) AS ym,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE year(CAST(l_shipdate AS TIMESTAMP)) = 1997
           GROUP BY 1, 2),
         w AS (
           SELECT brand, ym, cents,
                  CAST(sum(cents) OVER (PARTITION BY brand) AS BIGINT)
                    AS total_cents,
                  CAST(count(*) OVER (PARTITION BY brand) AS BIGINT)
                    AS n_months
           FROM m)
         SELECT brand, ym, cents,
                CAST((cents * n_months * 1000000) // total_cents
                  AS BIGINT) AS share_of_avg_ppm,
                ((cents * n_months * 1000000) // total_cents) > 1100000
                  OR ((cents * n_months * 1000000) // total_cents)
                     < 900000 AS is_outlier
         FROM w
         ORDER BY brand ASC NULLS LAST, ym ASC NULLS LAST""")),

    // ------------------------------------------------------------------ X25
    // TPC-DS Q1 SHAPE — above-average returners per region: customers
    // whose total returned value exceeds 1.2× their NATION's average
    // returner (the correlated aggregate-vs-group-average pattern; DS
    // q1 does it over store returns, here lineitem R-flag returns map
    // the shape onto the TPC-H schema). Exactness: the 1.2 factor is
    // the rational 6/5, so the comparison is the cross-multiplied
    // integer form 5·n·cents > 6·sum_cents — no division, no float,
    // no ulp at the decision boundary. The products are evaluated in
    // WIDE integer space (Spark DECIMAL(38,0), DuckDB HUGEINT — both
    // exact below 1e38), so the decision cannot silently wrap at large
    // SFs where 5·n_ret·ret_cents exceeds BIGINT: even 1e12 returners
    // × 1e15 cents is 5e27, eleven orders inside the exact range, and
    // past 1e38 Spark's non-ANSI overflow yields NULL (row drops loud
    // in the count) rather than a wrapped comparison. Scale: one
    // returns rollup
    // (customer grain), a nation-keyed agg for the denominators, one
    // broadcast-sized join back — the correlated subquery never
    // re-executes per row (the decorrelated form Catalyst and DuckDB
    // both plan).
    QueryDef("x25_ds_returns_above_avg", (s, dir) => {
      val ret = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("ret_cents"))
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        col("c_name"), col("c_nationkey"))
      val byNation = ret.join(cust, col("o_custkey") === col("c_custkey"))
        // feeds the denominators AND the final join: cut, or the
        // returns rollup (the query's only fact pass) runs twice
        .localCheckpoint(false)
      val nationAvg = byNation.groupBy(col("c_nationkey"))
        .agg(sum(col("ret_cents")).as("sum_cents"),
          count(lit(1)).as("n_ret"))
      byNation.join(nationAvg, Seq("c_nationkey"))
        .filter(expr("""CAST(5 AS DECIMAL(38,0)) * n_ret * ret_cents
                        > CAST(6 AS DECIMAL(38,0)) * sum_cents"""))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("ret_cents"))
        .orderBy(col("ret_cents").desc, col("c_custkey").asc)
        .limit(100)
    }, Some(
      """WITH ret AS (
           SELECT o_custkey,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS ret_cents
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_returnflag = 'R'
           GROUP BY 1),
         bn AS (
           SELECT c.c_custkey, c.c_name, c.c_nationkey, r.ret_cents
           FROM ret r JOIN customer c ON r.o_custkey = c.c_custkey),
         na AS (
           SELECT c_nationkey,
                  CAST(sum(ret_cents) AS BIGINT) AS sum_cents,
                  CAST(count(*) AS BIGINT) AS n_ret
           FROM bn GROUP BY 1)
         SELECT bn.c_custkey, bn.c_name, bn.c_nationkey, bn.ret_cents
         FROM bn JOIN na ON bn.c_nationkey = na.c_nationkey
         WHERE 5::HUGEINT * na.n_ret * bn.ret_cents
               > 6::HUGEINT * na.sum_cents
         ORDER BY ret_cents DESC, c_custkey ASC
         LIMIT 100""")),

    // ------------------------------------------------------------------ X26
    // TPC-DS Q88 SHAPE — time-band traffic census: eight 3-hour-band
    // click counts as ONE ROW. DS q88 spells this as eight scalar
    // subqueries — eight scans of store_sales; the efficient plan (and
    // the whole point of carrying the shape) is ONE scan with eight
    // conditional aggregates, which both engines then execute as a
    // single pass with map-side partials. All counts BIGINT; bands
    // partition hour-of-day exactly, so the row also self-checks
    // (sum of bands = total clicks).
    QueryDef("x26_ds_timeband_counts", (s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("event_type") === "click")
        .select(hour(col("ts")).as("h"))
      e.agg(
        count(when(col("h").between(0, 2), 1)).as("h00_02"),
        count(when(col("h").between(3, 5), 1)).as("h03_05"),
        count(when(col("h").between(6, 8), 1)).as("h06_08"),
        count(when(col("h").between(9, 11), 1)).as("h09_11"),
        count(when(col("h").between(12, 14), 1)).as("h12_14"),
        count(when(col("h").between(15, 17), 1)).as("h15_17"),
        count(when(col("h").between(18, 20), 1)).as("h18_20"),
        count(when(col("h").between(21, 23), 1)).as("h21_23"))
    }, Some(
      """SELECT
           count(*) FILTER (WHERE h BETWEEN 0 AND 2) AS h00_02,
           count(*) FILTER (WHERE h BETWEEN 3 AND 5) AS h03_05,
           count(*) FILTER (WHERE h BETWEEN 6 AND 8) AS h06_08,
           count(*) FILTER (WHERE h BETWEEN 9 AND 11) AS h09_11,
           count(*) FILTER (WHERE h BETWEEN 12 AND 14) AS h12_14,
           count(*) FILTER (WHERE h BETWEEN 15 AND 17) AS h15_17,
           count(*) FILTER (WHERE h BETWEEN 18 AND 20) AS h18_20,
           count(*) FILTER (WHERE h BETWEEN 21 AND 23) AS h21_23
         FROM (SELECT hour(CAST(ts AS TIMESTAMP)) AS h FROM events
               WHERE event_type = 'click')""")),

    // ------------------------------------------------------------------ P16
    // SELECT * EXCLUDE / REPLACE — the DuckDB star-modifier surface a
    // reference user types daily (`SELECT * EXCLUDE (secret), REPLACE
    // (upper(name) AS name)`): Spark has no star modifiers, but the
    // SEMANTICS are exactly drop + withColumn on the DataFrame side —
    // position-preserving (REPLACE keeps the column's slot, EXCLUDE
    // closes the gap), which the hash compare enforces column-by-
    // column. Pure projection: zero shuffles, scan-pruned to the kept
    // columns.
    QueryDef("p16_star_modifiers", (s, dir) => {
      t(s, dir, "customer")
        .drop("c_acctbal")
        .withColumn("c_name", lower(col("c_name")))
        .orderBy(col("c_custkey").asc_nulls_last)
    }, Some(
      """SELECT * EXCLUDE (c_acctbal) REPLACE (lower(c_name) AS c_name)
         FROM customer
         ORDER BY c_custkey ASC NULLS LAST""")),

    // ------------------------------------------------------------------ W12
    // ROLLING REGRESSION SLOPE — the trend detector a moving average
    // lags on: per day, the least-squares slope of revenue over the
    // trailing 7 days, from FOUR windowed sufficient sums (k, Σx, Σy,
    // Σxy, Σx² with x = day index, y = cents — all exact BIGINT window
    // sums; the a21 sufficient-statistics discipline inside a window
    // frame). One day-keyed agg collapses the fact table; the windows
    // run over the bounded daily frame. Slope sign flips are the
    // trend-break signal t17's global changepoint doesn't localize.
    QueryDef.sql("w12_rolling_slope",
      spark =
        """WITH daily AS (
             SELECT CAST(l_shipdate AS DATE) AS day,
                    CAST(datediff(CAST(l_shipdate AS DATE),
                      DATE '1997-01-01') AS BIGINT) AS x,
                    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS y
             FROM lineitem
             WHERE year(l_shipdate) = 1997
             GROUP BY 1, 2),
           w AS (
             SELECT day, y,
                    CAST(count(*) OVER f AS BIGINT) AS k,
                    CAST(sum(x) OVER f AS BIGINT) AS sx,
                    CAST(sum(y) OVER f AS BIGINT) AS sy,
                    CAST(sum(x * y) OVER f AS BIGINT) AS sxy,
                    CAST(sum(x * x) OVER f AS BIGINT) AS sxx
             FROM daily
             WINDOW f AS (ORDER BY day ASC
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
           SELECT day, y AS cents,
                  CASE WHEN k >= 3 AND k * sxx - sx * sx <> 0
                       THEN round((CAST(k * sxy - sx * sy AS DOUBLE)
                         / CAST(k * sxx - sx * sx AS DOUBLE) / 100.0D)
                         * 10000) / 10000
                  END AS slope_7d
           FROM w
           ORDER BY day ASC NULLS LAST""",
      oracle =
        """WITH daily AS (
             SELECT CAST(l_shipdate AS DATE) AS day,
                    CAST(date_diff('day', DATE '1997-01-01',
                      CAST(l_shipdate AS DATE)) AS BIGINT) AS x,
                    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS y
             FROM lineitem
             WHERE year(CAST(l_shipdate AS TIMESTAMP)) = 1997
             GROUP BY 1, 2),
           w AS (
             SELECT day, y,
                    CAST(count(*) OVER f AS BIGINT) AS k,
                    CAST(sum(x) OVER f AS BIGINT) AS sx,
                    CAST(sum(y) OVER f AS BIGINT) AS sy,
                    CAST(sum(x * y) OVER f AS BIGINT) AS sxy,
                    CAST(sum(x * x) OVER f AS BIGINT) AS sxx
             FROM daily
             WINDOW f AS (ORDER BY day ASC
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
           SELECT day, y AS cents,
                  CASE WHEN k >= 3 AND k * sxx - sx * sx <> 0
                       THEN round((CAST(k * sxy - sx * sy AS DOUBLE)
                         / CAST(k * sxx - sx * sx AS DOUBLE) / 100.0)
                         * 10000) / 10000
                  END AS slope_7d
           FROM w
           ORDER BY day ASC NULLS LAST"""),

    // ------------------------------------------------------------------ A28
    // MANN-WHITNEY U (Wilcoxon rank-sum) — the nonparametric partner to
    // a24's Welch test: compares weekend vs weekday value DISTRIBUTIONS
    // with no normality assumption, on RANKS. Tie-averaged ranks are
    // half-integers, so everything rides DOUBLED ranks (2·rank sums
    // stay exact BIGINTs; ties resolved by the (low+high) closed form
    // from a per-value count+cumsum — no per-row float); U and the
    // normal-approximation z (with tie-corrected variance) are a fixed
    // IEEE tree over those integers. One value-keyed agg + one bounded
    // window pass over the distinct-value frame — the corpus never
    // sorts globally.
    QueryDef.sql("a28_mann_whitney",
      spark =
        """WITH g AS (
             SELECT CASE WHEN dayofweek(CAST(ts AS DATE)) IN (1, 7)
                         THEN 1 ELSE 0 END AS is_wknd,
                    CAST(round(value * 100) AS BIGINT) AS cents
             FROM events WHERE value IS NOT NULL),
           vc AS (
             SELECT cents, CAST(count(*) AS BIGINT) AS c,
                    CAST(sum(is_wknd) AS BIGINT) AS c_wknd
             FROM g GROUP BY cents),
           rk AS (
             SELECT cents, c, c_wknd,
                    CAST(coalesce(sum(c) OVER (ORDER BY cents ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS below
             FROM vc),
           st AS (
             SELECT CAST(sum(c_wknd * (2 * below + c + 1)) AS BIGINT)
                      AS r2_wknd,
                    CAST(sum(c_wknd) AS BIGINT) AS n1,
                    CAST(sum(c - c_wknd) AS BIGINT) AS n2,
                    CAST(sum(c * c * c - c) AS BIGINT) AS tie_term
             FROM rk),
           u AS (
             SELECT n1, n2,
                    (CAST(r2_wknd AS DOUBLE) / 2.0D
                      - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0D) AS u1
             FROM st),
           z AS (
             SELECT n1, n2, u1,
                    sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0D
                      * ((n1 + n2 + 1)
                        - CAST((SELECT tie_term FROM st) AS DOUBLE)
                          / ((n1 + n2) * (CAST(n1 + n2 AS DOUBLE) - 1))))
                      AS sd
             FROM u)
           SELECT n1 AS n_weekend, n2 AS n_weekday,
                  round(u1 * 100) / 100 AS u_stat,
                  round(((u1 - CAST(n1 AS DOUBLE) * n2 / 2.0D) / sd)
                    * 1000000) / 1000000 AS z_approx
           FROM z""",
      oracle =
        """WITH g AS (
             SELECT CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6)
                         THEN 1 ELSE 0 END AS is_wknd,
                    CAST(round(value * 100) AS BIGINT) AS cents
             FROM events WHERE value IS NOT NULL),
           vc AS (
             SELECT cents, CAST(count(*) AS BIGINT) AS c,
                    CAST(sum(is_wknd) AS BIGINT) AS c_wknd
             FROM g GROUP BY cents),
           rk AS (
             SELECT cents, c, c_wknd,
                    CAST(coalesce(sum(c) OVER (ORDER BY cents ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS below
             FROM vc),
           st AS (
             SELECT CAST(sum(c_wknd * (2 * below + c + 1)) AS BIGINT)
                      AS r2_wknd,
                    CAST(sum(c_wknd) AS BIGINT) AS n1,
                    CAST(sum(c - c_wknd) AS BIGINT) AS n2,
                    CAST(sum(c * c * c - c) AS BIGINT) AS tie_term
             FROM rk),
           u AS (
             SELECT n1, n2,
                    (CAST(r2_wknd AS DOUBLE) / 2.0
                      - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0) AS u1
             FROM st),
           z AS (
             SELECT n1, n2, u1,
                    sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                      * ((n1 + n2 + 1)
                        - CAST((SELECT tie_term FROM st) AS DOUBLE)
                          / ((n1 + n2) * (CAST(n1 + n2 AS DOUBLE) - 1))))
                      AS sd
             FROM u)
           SELECT n1 AS n_weekend, n2 AS n_weekday,
                  round(u1 * 100) / 100 AS u_stat,
                  round(((u1 - CAST(n1 AS DOUBLE) * n2 / 2.0) / sd)
                    * 1000000) / 1000000 AS z_approx
           FROM z"""),

    // ------------------------------------------------------------------ A27
    // POISSON BOOTSTRAP — the only bootstrap that scales: classic
    // resampling needs n draws WITH replacement (a global operation);
    // Poisson(1) weights are independent per row, so each of the 8
    // resamples is a MAP-SIDE weight column and the whole ensemble is
    // one pass. Weights are deterministic (inverse-CDF on a per-(row,
    // replicate) hash against fixed Poisson(1) pmf cutoffs — integer
    // compares, bit-identical engines), so the resample means and their
    // spread (the bootstrap standard error of mean order value) are
    // exact. replicate×row expansion via a literal 8-element array —
    // still one scan; at 100 TB this is THE way to put error bars on a
    // corpus statistic.
    QueryDef("a27_poisson_bootstrap", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """WITH reps AS (
             SELECT o_orderkey,
                    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                    r,
                    (o_orderkey * 1103515245 + r * 12345) % 1000000 AS u
             FROM orders
             LATERAL VIEW explode(sequence(0, 7)) AS r),
           wts AS (
             SELECT r, cents,
                    CAST(CASE WHEN u < 367879 THEN 0
                         WHEN u < 735759 THEN 1
                         WHEN u < 919699 THEN 2
                         WHEN u < 980994 THEN 3
                         ELSE 4 END AS BIGINT) AS w
             FROM reps),
           means AS (
             SELECT r, CAST(sum(w) AS BIGINT) AS n_eff,
                    round((CAST(sum(w * cents) AS DOUBLE) / sum(w)
                      / 100.0D) * 10000) / 10000 AS mean_value
             FROM wts GROUP BY r)
           SELECT CAST(r AS INTEGER) AS replicate, n_eff, mean_value,
                  round((stddev_samp(mean_value) OVER ()) * 10000) / 10000
                    AS bootstrap_se
           FROM means
           ORDER BY replicate ASC NULLS LAST""")
    }, Some(
      """WITH reps AS (
           SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CAST(u.r AS BIGINT) AS r,
                  (o_orderkey * 1103515245 + CAST(u.r AS BIGINT) * 12345)
                    % 1000000 AS u
           FROM orders, unnest(range(0, 8)) u(r)),
         wts AS (
           SELECT r, cents,
                  CAST(CASE WHEN u < 367879 THEN 0
                       WHEN u < 735759 THEN 1
                       WHEN u < 919699 THEN 2
                       WHEN u < 980994 THEN 3
                       ELSE 4 END AS BIGINT) AS w
           FROM reps),
         means AS (
           SELECT r, CAST(sum(w) AS BIGINT) AS n_eff,
                  round((CAST(sum(w * cents) AS DOUBLE) / sum(w)
                    / 100.0) * 10000) / 10000 AS mean_value
           FROM wts GROUP BY r)
         SELECT CAST(r AS INTEGER) AS replicate, n_eff, mean_value,
                round((stddev_samp(mean_value) OVER ()) * 10000) / 10000
                  AS bootstrap_se
         FROM means
         ORDER BY replicate ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A26
    // SKEWNESS / KURTOSIS from sufficient statistics — the two moment
    // stats a8 doesn't cover, and a PARITY TRAP dodged deliberately:
    // Spark's skewness/kurtosis builtins are the BIASED population
    // estimators while DuckDB's are bias-corrected sample estimators —
    // the builtins can never hash-match. Both sides therefore compute
    // the SAME population formulas from five exact BIGINT power sums
    // (n, Σx..Σx⁴ over whole-unit values so x⁴ stays far from
    // overflow): g1 = m3/m2^1.5, g2 = m4/m2² − 3, central moments
    // expanded algebraically from raw sums — one conditional-aggregate
    // pass, map-side partials, fixed IEEE tree, 6dp.
    QueryDef.sql("a26_higher_moments",
      spark =
        """WITH v AS (
             SELECT l_returnflag AS flag,
                    CAST(round(l_quantity) AS BIGINT) AS x
             FROM lineitem),
           st AS (
             SELECT flag, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS s1,
                    CAST(sum(x*x) AS BIGINT) AS s2,
                    CAST(sum(x*x*x) AS BIGINT) AS s3,
                    CAST(sum(x*x*x*x) AS BIGINT) AS s4
             FROM v GROUP BY flag),
           m AS (
             SELECT flag, n,
                    CAST(s1 AS DOUBLE) / n AS mu,
                    CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                      AS m2,
                    CAST(s3 AS DOUBLE) / n
                      - 3.0D * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s2 AS DOUBLE) / n)
                      + 2.0D * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n) AS m3,
                    CAST(s4 AS DOUBLE) / n
                      - 4.0D * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s3 AS DOUBLE) / n)
                      + 6.0D * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s2 AS DOUBLE) / n)
                      - 3.0D * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n) AS m4
             FROM st)
           SELECT flag, n,
                  round(mu * 1000000) / 1000000 AS mean_qty,
                  round((m3 / power(m2, 1.5D)) * 1000000) / 1000000
                    AS skewness_pop,
                  round((m4 / (m2 * m2) - 3.0D) * 1000000) / 1000000
                    AS kurtosis_excess
           FROM m ORDER BY flag ASC NULLS LAST""",
      oracle =
        """WITH v AS (
             SELECT l_returnflag AS flag,
                    CAST(round(l_quantity) AS BIGINT) AS x
             FROM lineitem),
           st AS (
             SELECT flag, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(x) AS BIGINT) AS s1,
                    CAST(sum(x*x) AS BIGINT) AS s2,
                    CAST(sum(x*x*x) AS BIGINT) AS s3,
                    CAST(sum(x*x*x*x) AS BIGINT) AS s4
             FROM v GROUP BY flag),
           m AS (
             SELECT flag, n,
                    CAST(s1 AS DOUBLE) / n AS mu,
                    CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                      AS m2,
                    CAST(s3 AS DOUBLE) / n
                      - 3.0 * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s2 AS DOUBLE) / n)
                      + 2.0 * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n) AS m3,
                    CAST(s4 AS DOUBLE) / n
                      - 4.0 * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s3 AS DOUBLE) / n)
                      + 6.0 * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s2 AS DOUBLE) / n)
                      - 3.0 * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n) AS m4
             FROM st)
           SELECT flag, n,
                  round(mu * 1000000) / 1000000 AS mean_qty,
                  round((m3 / power(m2, 1.5)) * 1000000) / 1000000
                    AS skewness_pop,
                  round((m4 / (m2 * m2) - 3.0) * 1000000) / 1000000
                    AS kurtosis_excess
           FROM m ORDER BY flag ASC NULLS LAST"""),

    // ------------------------------------------------------------------ W10
    // TIME-INTERVAL RANGE frames — `RANGE BETWEEN INTERVAL '6' DAY
    // PRECEDING AND CURRENT ROW` over a DATE ordering: the trailing-
    // 7-day rolling revenue, with the frame bound by CALENDAR TIME, not
    // row counts (w3's numeric ranges) — gaps in the series shrink the
    // window automatically, which row frames get wrong. Runs over the
    // bounded daily frame (t16 discipline); revenue rides as exact
    // cents so the rolling sums are order-insensitive BIGINTs.
    QueryDef.sql("w10_interval_range_frame",
      spark =
        """WITH daily AS (
             SELECT CAST(l_shipdate AS DATE) AS day,
                    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
             FROM lineitem
             WHERE year(l_shipdate) = 1997
             GROUP BY 1)
           SELECT day, cents,
                  CAST(sum(cents) OVER (ORDER BY day
                    RANGE BETWEEN INTERVAL '6' DAY PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS trailing_7d_cents,
                  CAST(count(*) OVER (ORDER BY day
                    RANGE BETWEEN INTERVAL '6' DAY PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS days_in_window
           FROM daily
           ORDER BY day ASC NULLS LAST""",
      oracle =
        """WITH daily AS (
             SELECT CAST(l_shipdate AS DATE) AS day,
                    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
             FROM lineitem
             WHERE year(CAST(l_shipdate AS TIMESTAMP)) = 1997
             GROUP BY 1)
           SELECT day, cents,
                  CAST(sum(cents) OVER (ORDER BY day
                    RANGE BETWEEN INTERVAL '6' DAY PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS trailing_7d_cents,
                  CAST(count(*) OVER (ORDER BY day
                    RANGE BETWEEN INTERVAL '6' DAY PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS days_in_window
           FROM daily
           ORDER BY day ASC NULLS LAST"""),

    // ------------------------------------------------------------------ A25
    // GINI COEFFICIENT of customer revenue concentration — the
    // inequality census behind every "top-N% of customers" claim.
    // Closed form over the ranked series: G = 2·Σ(i·xᵢ)/(n·Σx) −
    // (n+1)/n with xᵢ ascending — Σ(i·xᵢ) and Σx are EXACT BIGINTs over
    // ranked cents, so everything up to the final two divisions is
    // integer; per-customer revenue is one keyed agg and the rank is
    // a TWO-PHASE distributed rank over the aggregate (rank the
    // aggregate, not the facts — and never on one partition either).
    // Headroom note: Σ(i·xᵢ) peaks at ~n²·mean_cents — safe through
    // ~1e8 customers at these amounts; beyond that, scale cents→dollars
    // before ranking (both engines identically) to reclaim 100×.
    QueryDef("a25_gini", (s, dir) => {
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("cents"))
      // DISTRIBUTED exact rank (operators/DistributedRank — the p11
      // two-phase move, keyed on the SORT VALUE): bin customers by a
      // deterministic cents range —
      // bins are contiguous in the (cents, custkey) order because bin
      // is monotone in cents — rank within bins in parallel, then add
      // broadcast prefix-count offsets. Customer cardinality is
      // unbounded at 100 TB; the only single-partition frames here are
      // the ≤~few-hundred-row bin offsets and the final 1-row census.
      // Bin width 1e7 cents ($100k) bounds bins by the VALUE range
      // (amounts), never the row count; at other domains derive widths
      // from a percentile_approx sketch of the aggregate instead.
      graft.operators.DistributedRank.withGlobalRank(rev,
          expr("cents div 10000000L"),
          Seq(col("cents").asc, col("o_custkey").asc), "i")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("total_cents"),
          sum(col("i") * col("cents")).as("weighted"))
        .select(col("n_customers"), col("total_cents"),
          expr("""round((2.0D * weighted
                   / (CAST(n_customers AS DOUBLE) * total_cents)
                   - CAST(n_customers + 1 AS DOUBLE) / n_customers)
                  * 1000000) / 1000000""").as("gini"))
    }, Some(
      """WITH rev AS (
           SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         ranked AS (
           SELECT cents,
                  CAST(row_number() OVER (ORDER BY cents ASC,
                    o_custkey ASC) AS BIGINT) AS i
           FROM rev)
         SELECT CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(cents) AS BIGINT) AS total_cents,
                round((2.0 * sum(i * cents)
                  / (CAST(count(*) AS DOUBLE) * sum(cents))
                  - CAST(count(*) + 1 AS DOUBLE) / count(*))
                  * 1000000) / 1000000 AS gini
         FROM ranked""")),

    // ------------------------------------------------------------------ A29
    // SPEARMAN RANK CORRELATION between customer revenue and order
    // count — the robust (monotone, outlier-immune) dependence measure
    // next to Pearson: correlate the RANKS, not the values. Both rank
    // sides run as the two-phase DistributedRank over the customer
    // aggregate (value-monotone bins, custkey tiebreak — a TOTAL order,
    // so both engines rank identically with no tie-averaging ambiguity);
    // ranks are exact BIGINTs, all five sufficient sums (Σx, Σy, Σx²,
    // Σy², Σxy) are exact BIGINTs, and ρ is ONE closed IEEE expression
    // over them rounded at 6dp. Headroom: n·Σxy ≤ n⁴ — exact through
    // ~50k customers in ppm-safe territory, n^4 < 2^63 to ~55k; beyond
    // that compute the sums as DOUBLEs of exact ranks (both engines
    // identically) or Welford-style per shard.
    QueryDef("a29_spearman", (s, dir) => {
      val per = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("cents"), count(lit(1)).as("n_orders"))
      val rx = graft.operators.DistributedRank.withGlobalRank(per,
        expr("cents div 10000000L"),
        Seq(col("cents").asc, col("o_custkey").asc), "rx")
      val rxy = graft.operators.DistributedRank.withGlobalRank(rx,
        expr("n_orders div 4L"),
        Seq(col("n_orders").asc, col("o_custkey").asc), "ry")
      rxy.agg(count(lit(1)).as("n"),
          sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"),
          sum(col("rx") * col("ry")).as("sxy"))
        .select(col("n").as("n_customers"),
          expr("""round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
                  * 1000000) / 1000000""").as("spearman_rho"))
    }, Some(
      """WITH per AS (
           SELECT o_custkey,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1),
         ranked AS (
           SELECT CAST(row_number() OVER (ORDER BY cents ASC,
                    o_custkey ASC) AS BIGINT) AS rx,
                  CAST(row_number() OVER (ORDER BY n_orders ASC,
                    o_custkey ASC) AS BIGINT) AS ry
           FROM per),
         sums AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(rx) AS BIGINT) AS sx,
                  CAST(sum(ry) AS BIGINT) AS sy,
                  CAST(sum(rx * rx) AS BIGINT) AS sxx,
                  CAST(sum(ry * ry) AS BIGINT) AS syy,
                  CAST(sum(rx * ry) AS BIGINT) AS sxy
           FROM ranked)
         SELECT n AS n_customers,
                round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                       * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
                  * 1000000) / 1000000 AS spearman_rho
         FROM sums""")),

    // ------------------------------------------------------------------ A30
    // THEIL–SEN robust slope (lower-median variant) of daily revenue per
    // order priority over one month — the outlier-proof trend estimator
    // (Theil 1950 / Sen 1968): the slope is the median of all pairwise
    // slopes (y2-y1)/(d2-d1), so up to ~29% corrupted days cannot move
    // it (vs OLS, where one bad day owns the fit). Parity design: daily
    // revenue is exact BIGINT cents, each pairwise slope is ONE IEEE
    // double division of exact integers (bit-identical across engines),
    // and the median is the LOWER median — the exact order statistic at
    // rank (n+1) div 2 under a total order (slope, d1, d2) — never an
    // interpolated midpoint, whose a+(b-a)/2 vs (a+b)/2 forms differ in
    // ULPs between engines. Scale: the pair join is per-GROUP (a month
    // of days squared — bounded by calendar, not by corpus), the daily
    // rollup before it is the only pass over the fact table, and the
    // rank/census windows run per-priority (parallel across groups).
    QueryDef("a30_theil_sen", (s, dir) => {
      val daily = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
        .groupBy(col("o_orderpriority"),
          datediff(col("o_orderdate"), lit("1996-01-01")).as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      val a = daily.select(col("o_orderpriority").as("pri"),
        col("d").as("d1"), col("y").as("y1"))
      val b = daily.select(col("o_orderpriority").as("pri"),
        col("d").as("d2"), col("y").as("y2"))
      val pairs = a.join(b, Seq("pri"))
        .filter(col("d1") < col("d2"))
        .withColumn("slope",
          expr("CAST(y2 - y1 AS DOUBLE) / CAST(d2 - d1 AS DOUBLE)"))
      pairs
        .withColumn("rk", row_number().over(Window.partitionBy(col("pri"))
          .orderBy(col("slope").asc, col("d1").asc, col("d2").asc)))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("pri"))))
        .filter(expr("rk = (n + 1) div 2"))
        .select(col("pri").as("o_orderpriority"), col("n").as("n_pairs"),
          expr("round(slope * 100) / 100").as("slope_cents_per_day"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }, Some(
      """WITH daily AS (
           SELECT o_orderpriority AS pri,
                  CAST(o_orderdate AS DATE) - DATE '1996-01-01' AS d,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
           GROUP BY 1, 2),
         pairs AS (
           SELECT a.pri, a.d AS d1, b.d AS d2,
                  CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
                    AS slope
           FROM daily a JOIN daily b ON a.pri = b.pri AND a.d < b.d),
         ranked AS (
           SELECT pri, slope,
                  row_number() OVER (PARTITION BY pri
                    ORDER BY slope ASC, d1 ASC, d2 ASC) AS rk,
                  CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n
           FROM pairs)
         SELECT pri AS o_orderpriority, n AS n_pairs,
                round(slope * 100) / 100 AS slope_cents_per_day
         FROM ranked WHERE rk = (n + 1) // 2
         ORDER BY o_orderpriority ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A32
    // KENDALL'S TAU rank correlation (tau-a) — the pair-counting twin of
    // a29's Spearman: over each priority's daily (day, revenue) series,
    // count concordant vs discordant day-pairs; tau = (nc − nd) / pairs.
    // Pure COUNTING (no rank arithmetic, no tie-averaging), so the whole
    // statistic is integer-exact: the only division is the final ppm
    // integer division, whose numerator CAN be negative — measured on
    // this engine pair, BOTH Spark `div` and DuckDB's integer `//`
    // TRUNCATE toward zero (oracle −2000000 // 6 = −333333), so the
    // plain operators agree; define tau_ppm as the truncating quotient.
    // (g7's q_ppm now rides the same plain truncating quotient on both
    // sides — the measurement that fixed its earlier floor-assumption
    // bug; an explicit non-negative-mod floor form remains the safe
    // spelling whenever FLOORING specifically is part of a
    // contract.) The pair join is the a30 calendar-bounded frame
    // (days², never corpus²); revenue ties count as neither
    // (tau-a denominator = all pairs).
    QueryDef("a32_kendall_tau", (s, dir) => {
      val daily = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
        .groupBy(col("o_orderpriority"),
          datediff(col("o_orderdate"), lit("1996-01-01")).as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      val a = daily.select(col("o_orderpriority").as("pri"),
        col("d").as("d1"), col("y").as("y1"))
      val b = daily.select(col("o_orderpriority").as("pri"),
        col("d").as("d2"), col("y").as("y2"))
      a.join(b, Seq("pri")).filter(col("d1") < col("d2"))
        .groupBy(col("pri"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("y2") > col("y1"), 1L).otherwise(0L)).as("nc"),
          sum(when(col("y2") < col("y1"), 1L).otherwise(0L)).as("nd"))
        .withColumn("num", expr("(nc - nd) * 1000000L"))
        .select(col("pri").as("o_orderpriority"), col("n_pairs"),
          col("nc"), col("nd"),
          expr("num div n_pairs").as("tau_ppm"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }, Some(
      """WITH daily AS (
           SELECT o_orderpriority AS pri,
                  CAST(o_orderdate AS DATE) - DATE '1996-01-01' AS d,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
           GROUP BY 1, 2),
         g AS (
           SELECT a.pri, CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(CASE WHEN b.y > a.y THEN 1 ELSE 0 END)
                    AS BIGINT) AS nc,
                  CAST(sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
                    AS BIGINT) AS nd
           FROM daily a JOIN daily b ON a.pri = b.pri AND a.d < b.d
           GROUP BY 1)
         SELECT pri AS o_orderpriority, n_pairs, nc, nd,
                ((nc - nd) * 1000000) // n_pairs AS tau_ppm
         FROM g
         ORDER BY o_orderpriority ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A33
    // MANN-KENDALL trend TEST — the significance twin of a30's
    // Theil–Sen slope (the standard pairing in hydrology/climatology:
    // Theil–Sen estimates the trend, Mann-Kendall decides whether it
    // exists): S = nc − nd over the same calendar-bounded pair frame,
    // Var(S) with the TIE CORRECTION carried as an exact integer in
    // 1/18 units — var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5) over tie
    // groups of equal daily revenue — so the whole statistic stays
    // BIGINT until the single z expression. The continuity-corrected
    // z = (S ∓ 1) / sqrt(var18 / 18) is ONE identical IEEE tree on
    // both engines (cast, divide, sqrt, divide — the t26 float
    // discipline), rounded once to 1e-6 for display. Scale: the a30
    // daily rollup is the only fact pass; pairs are days², ties are a
    // second keyed agg over the daily frame.
    QueryDef("a33_mann_kendall", (s, dir) => {
      val daily = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
        .groupBy(col("o_orderpriority").as("pri"),
          datediff(col("o_orderdate"), lit("1996-01-01")).as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
        // referenced FOUR times (both pair sides, day count, tie
        // groups): cut, or the fact rollup runs four times
        .localCheckpoint(false)
      val a = daily.select(col("pri"), col("d").as("d1"), col("y").as("y1"))
      val b = daily.select(col("pri"), col("d").as("d2"), col("y").as("y2"))
      val sStat = a.join(b, Seq("pri")).filter(col("d1") < col("d2"))
        .groupBy(col("pri"))
        .agg((sum(when(col("y2") > col("y1"), 1L).otherwise(0L)) -
          sum(when(col("y2") < col("y1"), 1L).otherwise(0L))).as("s_stat"))
      val nDays = daily.groupBy(col("pri"))
        .agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy(col("pri"), col("y"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("pri"))
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie18"))
      sStat.join(nDays, Seq("pri")).join(ties, Seq("pri"))
        .withColumn("var18",
          expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie18"))
        .select(col("pri").as("o_orderpriority"), col("n_days"),
          col("s_stat"), col("var18"),
          expr("""round((CASE WHEN s_stat > 0 THEN
                    CAST(s_stat - 1 AS DOUBLE)
                      / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                  WHEN s_stat < 0 THEN
                    CAST(s_stat + 1 AS DOUBLE)
                      / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                  ELSE 0.0 END) * 1000000) / 1000000""").as("z"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }, Some(
      """WITH daily AS (
           SELECT o_orderpriority AS pri,
                  CAST(o_orderdate AS DATE) - DATE '1996-01-01' AS d,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
           GROUP BY 1, 2),
         s AS (
           SELECT a.pri,
                  CAST(sum(CASE WHEN b.y > a.y THEN 1 ELSE 0 END)
                    - sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
                    AS BIGINT) AS s_stat
           FROM daily a JOIN daily b ON a.pri = b.pri AND a.d < b.d
           GROUP BY 1),
         n AS (
           SELECT pri, CAST(count(*) AS BIGINT) AS n_days
           FROM daily GROUP BY 1),
         ties AS (
           SELECT pri, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                    AS tie18
           FROM (SELECT pri, y, CAST(count(*) AS BIGINT) AS t
                 FROM daily GROUP BY 1, 2)
           GROUP BY 1),
         v AS (
           SELECT s.pri, s.s_stat, n.n_days,
                  CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                    - ties.tie18 AS BIGINT) AS var18
           FROM s JOIN n ON s.pri = n.pri
                  JOIN ties ON s.pri = ties.pri)
         SELECT pri AS o_orderpriority, n_days, s_stat, var18,
                round((CASE WHEN s_stat > 0 THEN
                         CAST(s_stat - 1 AS DOUBLE)
                           / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                       WHEN s_stat < 0 THEN
                         CAST(s_stat + 1 AS DOUBLE)
                           / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                       ELSE 0.0 END) * 1000000) / 1000000 AS z
         FROM v
         ORDER BY o_orderpriority ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A34
    // TWO-SAMPLE KOLMOGOROV–SMIRNOV — the distribution-equality test
    // next to a28's Mann-Whitney (location) and d10's chi-square
    // (categorical): D = sup |F1 − F2| over returned vs non-returned
    // line price distributions. EXACT integer arithmetic end to end:
    // prices on the cents lattice, ECDF comparison cross-multiplied —
    // |cumA·n2 − cumB·n1| widened to DECIMAL(38,0) (Spark) / HUGEINT
    // (DuckDB), the x25 discipline: per-flag counts beyond ~3e9 rows
    // push the cross-products past BIGINT, where Spark's non-ANSI
    // multiply wraps SILENTLY — so the supremum and its location
    // carry no float and no wrap at any corpus size; the test
    // statistic displays as the (d_num, d_den = n1·n2) rational pair. Tie handling is the
    // textbook one-point-per-VALUE form: ECDFs step once per distinct
    // price, both samples evaluated at the same point set. Scale: the
    // per-value rollup collapses the corpus (one shuffle); the
    // cumulative window runs over DISTINCT cents — the domain-bounded
    // frame, orders of magnitude below row count (the t-family
    // global-window argument); argmax ties resolve to the smallest
    // price.
    QueryDef("a34_ks_test", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          .as("v"), col("l_returnflag"))
        .filter(col("l_returnflag").isin("R", "N"))
      val perV = li.groupBy(col("v")).agg(
          count(when(col("l_returnflag") === "R", 1)).as("ca"),
          count(when(col("l_returnflag") === "N", 1)).as("cb"))
        // feeds the cumulative window AND the n1/n2 totals — cut, or
        // the fact rollup runs twice
        .localCheckpoint(false)
      val tot = perV.agg(sum(col("ca")).as("n1"), sum(col("cb")).as("n2"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the diff frame feeds the supremum AND its argmin location —
      // cut, or the rollup + window run twice
      val d = perV
        .withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumb", sum(col("cb")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("diff", abs(
          expr("CAST(cuma AS DECIMAL(38,0)) * n2") -
          expr("CAST(cumb AS DECIMAL(38,0)) * n1")))
        .localCheckpoint(false)
      val mx = d.groupBy(col("n1"), col("n2"))
        .agg(max(col("diff")).as("d_num"))
      // DISPLAY discipline (x25, Relational x-family): the wide
      // DECIMAL(38,0)/HUGEINT arithmetic stays INTERNAL; the final
      // projection casts to BIGINT so the output schema carries no
      // decimal column (the one decimal-output query in the suite
      // hash-diverged on the driver's canonicalizer, r16). Exact at
      // fixture SFs — the 100 TB overflow protection lives in the
      // compute above, not the display.
      d.join(broadcast(mx), Seq("n1", "n2"))
        .filter(col("diff") === col("d_num"))
        .groupBy(col("n1"), col("n2"), col("d_num"))
        .agg(min(col("v")).as("at_cents"))
        .select(col("n1"), col("n2"),
          expr("CAST(d_num AS BIGINT)").as("d_num"),
          expr("CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS BIGINT)")
            .as("d_den"),
          col("at_cents"))
    }, Some(
      """WITH li AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                  l_returnflag AS rf
           FROM lineitem WHERE l_returnflag IN ('R', 'N')),
         pv AS MATERIALIZED (
           SELECT v,
                  CAST(count(*) FILTER (WHERE rf = 'R') AS BIGINT) AS ca,
                  CAST(count(*) FILTER (WHERE rf = 'N') AS BIGINT) AS cb
           FROM li GROUP BY 1),
         tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
                        CAST(sum(cb) AS BIGINT) AS n2 FROM pv),
         cum AS (
           SELECT v,
                  sum(ca) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS cuma,
                  sum(cb) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS cumb
           FROM pv),
         d AS (
           SELECT v, abs(CAST(cuma AS HUGEINT) * tot.n2
                         - CAST(cumb AS HUGEINT) * tot.n1) AS diff,
                  tot.n1 AS n1, tot.n2 AS n2
           FROM cum, tot)
         SELECT n1, n2, CAST(max(diff) AS BIGINT) AS d_num,
                CAST(CAST(n1 AS HUGEINT) * n2 AS BIGINT) AS d_den,
                CAST(min(v) FILTER (WHERE diff = (SELECT max(diff) FROM d))
                  AS BIGINT) AS at_cents
         FROM d GROUP BY 1, 2""")),

    // ------------------------------------------------------------------ A31
    // TRIMMED and WINSORIZED means — the other two classical robust
    // location estimators next to a22's MAD and a30's Theil–Sen: per
    // priority over exact order cents, drop (trimmed) or clamp
    // (winsorized) the k = n div 10 most extreme values on each side.
    // ALL integer: ranks are a total order (cents, orderkey — ties
    // deterministic), the trim boundaries are exact order statistics
    // (lo = min of the kept band, hi = max — the sort makes them the
    // rank-(k+1) and rank-(n−k) values), and winsorization needs NO
    // per-row clamp pass: clamping k values to each boundary is the
    // closed form trimmed_sum + k·(lo+hi), so one ranked window + one
    // grouped aggregate covers all three means. Floor-divs on positive
    // sums — engine-identical. Scale: one shuffle to rank within
    // groups, one grouped agg; no self-joins, no percentile sketches.
    QueryDef("a31_trimmed_winsorized", (s, dir) => {
      val ranked = t(s, dir, "orders")
        .select(col("o_orderpriority").as("pri"),
          col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("pri"))
          .orderBy(col("cents").asc, col("o_orderkey").asc)))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("pri"))))
        .withColumn("k", expr("n div 10"))
      ranked.groupBy(col("pri"))
        .agg(max(col("n")).as("n"), max(col("k")).as("k"),
          sum(col("cents")).as("sum_all"),
          sum(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
            col("cents"))).as("t_sum"),
          min(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
            col("cents"))).as("lo"),
          max(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
            col("cents"))).as("hi"))
        .select(col("pri").as("o_orderpriority"), col("n"),
          expr("sum_all div n").as("mean_cents"),
          expr("t_sum div (n - 2 * k)").as("trimmed_mean_cents"),
          expr("(t_sum + k * (lo + hi)) div n").as("winsor_mean_cents"))
        .orderBy(col("o_orderpriority").asc_nulls_last)
    }, Some(
      """WITH ranked AS (
           SELECT o_orderpriority AS pri, o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) ASC,
                             o_orderkey ASC) AS rk,
                  CAST(count(*) OVER (PARTITION BY o_orderpriority)
                    AS BIGINT) AS n
           FROM orders),
         g AS (
           SELECT pri, max(n) AS n, max(n // 10) AS k,
                  CAST(sum(cents) AS BIGINT) AS sum_all,
                  CAST(sum(CASE WHEN rk > n // 10
                        AND rk <= n - n // 10 THEN cents END)
                    AS BIGINT) AS t_sum,
                  min(CASE WHEN rk > n // 10
                        AND rk <= n - n // 10 THEN cents END) AS lo,
                  max(CASE WHEN rk > n // 10
                        AND rk <= n - n // 10 THEN cents END) AS hi
           FROM ranked GROUP BY 1)
         SELECT pri AS o_orderpriority, n,
                sum_all // n AS mean_cents,
                t_sum // (n - 2 * k) AS trimmed_mean_cents,
                (t_sum + k * (lo + hi)) // n AS winsor_mean_cents
         FROM g
         ORDER BY o_orderpriority ASC NULLS LAST""")),

    // ------------------------------------------------------------------ D11
    // BENFORD'S LAW first-digit audit on order amounts — the classic
    // fabricated-data screen: natural multi-scale amounts follow
    // P(d) = log10(1 + 1/d); uniform or hand-typed data does not (the
    // synthetic fixture amounts are uniform, so this census SHOWS the
    // deviation — the detector firing on non-Benford data is the
    // demonstration). First digit is string math over exact cents (no
    // float log tricks on the data side); expected shares and the
    // per-digit deviation are a fixed IEEE tree over exact counts.
    QueryDef("d11_benford", (s, dir) => {
      t(s, dir, "orders")
        .withColumn("d", expr(
          "CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS INTEGER)"))
        .filter(col("d") >= 1)
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
        .withColumn("total", sum(col("n")).over(Window.partitionBy()))
        .select(col("d"), col("n"),
          expr("round((CAST(n AS DOUBLE) / total) * 1000000) / 1000000")
            .as("observed"),
          expr("round(log10(1.0D + 1.0D / d) * 1000000) / 1000000")
            .as("benford"),
          expr("""round(abs(CAST(n AS DOUBLE) / total
                  - log10(1.0D + 1.0D / d)) * 1000000) / 1000000""")
            .as("abs_dev"))
        .orderBy(col("d").asc_nulls_last)
    }, Some(
      """WITH f AS (
           SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                    AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS d
           FROM orders),
         c AS (
           SELECT d, CAST(count(*) AS BIGINT) AS n
           FROM f WHERE d >= 1 GROUP BY 1),
         t AS (SELECT d, n, sum(n) OVER () AS total FROM c)
         SELECT d, n,
                round((CAST(n AS DOUBLE) / total) * 1000000) / 1000000
                  AS observed,
                round(log10(1.0 + 1.0 / d) * 1000000) / 1000000 AS benford,
                round(abs(CAST(n AS DOUBLE) / total
                  - log10(1.0 + 1.0 / d)) * 1000000) / 1000000 AS abs_dev
         FROM t ORDER BY d ASC NULLS LAST""")),

    // ------------------------------------------------------------------ A24
    // WELCH'S t-TEST (unequal variances) — weekend vs weekday event
    // values: the hypothesis test d10's chi-square is for categories,
    // this is for means. Everything derives from SIX exact BIGINTs (n,
    // Σcents, Σcents² per group — one conditional aggregate pass, the
    // a21/a23 sufficient-statistics discipline), so the t statistic and
    // Welch-Satterthwaite df are a fixed IEEE tree over identical
    // integers; 6dp rounding is display only. At 100 TB: one map-side
    // partial agg, a 1-row result, no second pass.
    QueryDef.sql("a24_welch_ttest",
      spark =
        """WITH g AS (
             SELECT CASE WHEN dayofweek(CAST(ts AS DATE)) IN (1, 7)
                         THEN 'weekend' ELSE 'weekday' END AS grp,
                    CAST(round(value * 100) AS BIGINT) AS cents
             FROM events WHERE value IS NOT NULL),
           st AS (
             SELECT
               CAST(sum(CASE WHEN grp = 'weekday' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1,
               CAST(sum(CASE WHEN grp = 'weekend' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n2,
               CAST(sum(CASE WHEN grp = 'weekday' THEN cents ELSE 0 END)
                 AS BIGINT) AS s1,
               CAST(sum(CASE WHEN grp = 'weekend' THEN cents ELSE 0 END)
                 AS BIGINT) AS s2,
               CAST(sum(CASE WHEN grp = 'weekday' THEN cents * cents
                 ELSE 0 END) AS BIGINT) AS q1,
               CAST(sum(CASE WHEN grp = 'weekend' THEN cents * cents
                 ELSE 0 END) AS BIGINT) AS q2
             FROM g),
           d AS (
             SELECT n1, n2,
                    CAST(s1 AS DOUBLE) / n1 / 100.0D AS m1,
                    CAST(s2 AS DOUBLE) / n2 / 100.0D AS m2,
                    (CAST(q1 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / 10000.0D
                      AS v1,
                    (CAST(q2 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / 10000.0D
                      AS v2
             FROM st)
           SELECT n1, n2,
                  round(m1 * 1000000) / 1000000 AS mean_weekday,
                  round(m2 * 1000000) / 1000000 AS mean_weekend,
                  round(((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) * 1000000)
                    / 1000000 AS t_stat,
                  round((
                    ((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)) /
                    ((v1 / n1) * (v1 / n1) / (n1 - 1)
                      + (v2 / n2) * (v2 / n2) / (n2 - 1))
                  ) * 10000) / 10000 AS df_welch
           FROM d""",
      oracle =
        """WITH g AS (
             SELECT CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) IN (0, 6)
                         THEN 'weekend' ELSE 'weekday' END AS grp,
                    CAST(round(value * 100) AS BIGINT) AS cents
             FROM events WHERE value IS NOT NULL),
           st AS (
             SELECT
               CAST(sum(CASE WHEN grp = 'weekday' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1,
               CAST(sum(CASE WHEN grp = 'weekend' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n2,
               CAST(sum(CASE WHEN grp = 'weekday' THEN cents ELSE 0 END)
                 AS BIGINT) AS s1,
               CAST(sum(CASE WHEN grp = 'weekend' THEN cents ELSE 0 END)
                 AS BIGINT) AS s2,
               CAST(sum(CASE WHEN grp = 'weekday' THEN cents * cents
                 ELSE 0 END) AS BIGINT) AS q1,
               CAST(sum(CASE WHEN grp = 'weekend' THEN cents * cents
                 ELSE 0 END) AS BIGINT) AS q2
             FROM g),
           d AS (
             SELECT n1, n2,
                    CAST(s1 AS DOUBLE) / n1 / 100.0 AS m1,
                    CAST(s2 AS DOUBLE) / n2 / 100.0 AS m2,
                    (CAST(q1 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / 10000.0
                      AS v1,
                    (CAST(q2 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / 10000.0
                      AS v2
             FROM st)
           SELECT n1, n2,
                  round(m1 * 1000000) / 1000000 AS mean_weekday,
                  round(m2 * 1000000) / 1000000 AS mean_weekend,
                  round(((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) * 1000000)
                    / 1000000 AS t_stat,
                  round((
                    ((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)) /
                    ((v1 / n1) * (v1 / n1) / (n1 - 1)
                      + (v2 / n2) * (v2 / n2) / (n2 - 1))
                  ) * 10000) / 10000 AS df_welch
           FROM d"""),
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped percentiles WITHOUT Spark's `percentile` aggregate.
  *
  * Why (optimization guide §4 — expression/operator choice): the native
  * exact `percentile` is a TypedImperativeAggregate that builds an
  * OpenHashMap of boxed value→count per partition, serializes the whole
  * map as partial state, and merges maps on the reducer. On a
  * mostly-distinct DOUBLE column the partial state is the COLUMN ITSELF
  * in boxed form — a8_stats_aggs/a12_percentiles measured 2.8-4.3 s solo
  * at sf0.1 (600 k rows, repeatable), with the added tax that ONE such
  * aggregate forces the whole Aggregate (including its codegen-friendly
  * min/stddev/corr siblings) onto the ObjectHashAggregate path.
  *
  * This helper computes the same numbers from rank arithmetic on a
  * sorted window: rank rows per group (one hash-partition exchange + a
  * per-group sort — the same data movement the native agg's map-merge
  * pays, in columnar unboxed form), keep ONLY the ≤2 rows per group
  * whose ranks can contribute to a requested percentile, and fold them
  * with Spark's own interpolation formula. Result parity is exact, node
  * for node with Percentile.getPercentile:
  *   position = p · (n−1); lower = floor(position); higher = ceil(position)
  *   lower == higher            → value at lower
  *   value(lower)==value(higher)→ that value (the lowerKey==higherKey
  *                                 shortcut — (hi−pos)·v + (pos−lo)·v can
  *                                 differ from v in the last ulp)
  *   else (higher−position)·value(lower) + (position−lower)·value(higher)
  * and for the discrete flavor: the smallest value whose cumulative
  * distribution rank/n ≥ p, i.e. the value at 1-based rank ceil(p·n)
  * (clamped to ≥1). Bit-equality against the native aggregates is pinned
  * by a seeded property test in OperatorSpec (ties, int/double inputs,
  * group sizes 1..n, p ∈ {0, …, 1}).
  *
  * Contract: null values are excluded (as the native agg does); a group
  * whose values are ALL null is absent from the output (the native agg
  * would return a null-valued row) — callers that need such groups must
  * left-join this frame.
  *
  * Scale shape (100 TB): identical reducer concentration to the native
  * agg — each group's distinct values land on one reducer either way —
  * but the sort path streams unboxed columns and spills gracefully,
  * where the map path builds one boxed hash map per group in reducer
  * memory. Either way exact percentile at unbounded group size is the
  * wrong tool at 100 TB; the sketch family (a3/a13 approx_percentile)
  * remains the documented scale path.
  */
object GroupedPercentile {

  /** Append exact percentile columns for `value` per `group`.
    *
    * @param cont (outputName, p) continuous percentiles — Spark
    *             `percentile(value, p)` parity
    * @param disc (outputName, p) discrete percentiles — Spark
    *             `percentile_disc(p) WITHIN GROUP (ORDER BY value)` parity
    * @return one row per group: group columns ++ cont ++ disc (double)
    */
  def of(df: DataFrame, group: Seq[String], value: String,
      cont: Seq[(String, Double)], disc: Seq[(String, Double)] = Nil)
      : DataFrame = {
    val gCols = group.map(col)
    val v = col("__v")
    // rank arithmetic in double — exact for any n < 2^53, and the same
    // widening the native agg applies (Long counts into double positions).
    // Group sizes ride the same sorted partition as an unbounded count
    // window: one exchange + one sort total (a separate count aggregate
    // broadcast-joined back was measured SLOWER — the extra pass and the
    // broadcast barrier cost more than the window's partition buffer at
    // any group size a sort-based exact percentile can serve anyway).
    // The count rides the SAME (partition, order) spec as the
    // row_number, with an explicit whole-partition frame: a full-frame
    // count is order-insensitive (same value as the partition-only
    // window), and sharing the spec lets Spark evaluate both functions
    // in ONE Window operator / one pass over the sorted buffer instead
    // of two stacked Window nodes (r19; plan diff 2 Window → 1 per call).
    val nonNull = df
      .filter(col(value).isNotNull)
      .select(gCols :+ col(value).cast("double").as("__v"): _*)
    val specced = Window.partitionBy(gCols: _*).orderBy(v.asc)
    val ranked = nonNull
      .withColumn("__rn0", row_number().over(specced)
        .cast("double") - 1.0)
      .withColumn("__n", count(lit(1)).over(specced.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("double"))
    def pos(p: Double): Column = lit(p) * (col("__n") - 1.0)
    def discRank0(p: Double): Column =
      greatest(lit(0.0), ceil(lit(p) * col("__n")).cast("double") - 1.0)
    // keep only rows that can contribute to some requested rank: ≤ 2 rows
    // per (group, percentile) survive into the final tiny aggregate
    val needed = (cont.map { case (_, p) =>
      col("__rn0") === floor(pos(p)).cast("double") ||
        col("__rn0") === ceil(pos(p)).cast("double")
    } ++ disc.map { case (_, p) => col("__rn0") === discRank0(p) })
      .reduce(_ || _)
    val kept = ranked.filter(needed)
    // per percentile: pull the lower- and higher-rank values, then fold
    // with the native interpolation (shortcuts included) in a projection
    val aggs =
      cont.flatMap { case (name, p) => Seq(
        max(when(col("__rn0") === floor(pos(p)).cast("double"), v))
          .as(s"__lo_$name"),
        max(when(col("__rn0") === ceil(pos(p)).cast("double"), v))
          .as(s"__hi_$name"))
      } ++ disc.map { case (name, p) =>
        max(when(col("__rn0") === discRank0(p), v)).as(name)
      } :+ max(col("__n")).as("__n")
    val folded = kept.groupBy(gCols: _*).agg(aggs.head, aggs.tail: _*)
    val outs = cont.map { case (name, p) =>
      val po = lit(p) * (col("__n") - 1.0)
      val lo = floor(po); val hi = ceil(po)
      val vlo = col(s"__lo_$name"); val vhi = col(s"__hi_$name")
      when(lo === hi, vlo)
        .when(vlo === vhi, vlo)
        .otherwise((hi - po) * vlo + (po - lo) * vhi)
        .as(name)
    } ++ disc.map { case (name, _) => col(name) }
    folded.select(gCols ++ outs: _*)
  }

  /** Continuous percentile folded over an ALREADY-SORTED array column —
    * the same interpolation and shortcuts as [[of]], for array-shaped
    * callers. Bit-equality with `percentile(v, p)` (incl. as a window
    * aggregate) is pinned by the OperatorSpec property test. NOTE for
    * SLIDING-frame use: measured 2.3× slower than the native windowed
    * percentile on w5 (both rebuild O(frame) state per row; the array
    * sort + per-row ArrayData copies cost more than the value-map
    * rebuild) — w5 keeps the native aggregate; this stays for callers
    * that already hold a sorted array. Null handling is the caller's:
    * collect_list drops nulls like the native agg. */
  def contOfSorted(vals: Column, p: Double): Column = {
    val pos = lit(p) * (size(vals).cast("double") - 1.0)
    val lo = floor(pos); val hi = ceil(pos)
    val vlo = element_at(vals, (lo + 1).cast("int"))
    val vhi = element_at(vals, (hi + 1).cast("int"))
    when(size(vals) === 0, lit(null).cast("double"))
      .when(lo === hi, vlo)
      .when(vlo === vhi, vlo)
      .otherwise((hi - pos) * vlo + (pos - lo) * vhi)
  }
}

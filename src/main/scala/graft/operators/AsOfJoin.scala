package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (DuckDB `ASOF JOIN` — SURVEY.md §2.3 J7), all three
  * directions plus a pandas-style max-gap tolerance:
  *
  *   - [[backward]]: latest build row with `buildTs <= probeTs`
  *     (DuckDB `ON p.ts >= b.ts`, the default ASOF direction)
  *   - [[forward]]:  earliest build row with `buildTs >= probeTs`
  *     (DuckDB `ON p.ts <= b.ts`)
  *   - [[nearest]]:  whichever of the two is closer; equal gaps prefer
  *     the backward match (pandas `merge_asof(direction='nearest')`)
  *
  * All left-join semantics: unmatched probes keep a null payload. With
  * `tolerance = Some(t)`, a match farther than `t` (in ordering-column
  * units; use a numeric ordering column) is nulled out — tolerance never
  * falls back to an older/newer row, because any other candidate is
  * farther still.
  *
  * Spark has no built-in as-of join, and the naive range-join
  * (`p.ts >= b.ts` non-equi) degenerates to a per-key cross product. This
  * implementation is the union + ordered-window rewrite:
  *
  *   1. union probe and build rows tagged with a side marker,
  *   2. one window partitioned by key, ordered by (ts, side) — build rows
  *      sort before probe rows at equal ts so the bound is inclusive;
  *      the forward pass orders ts DESCENDING so "preceding" rows are the
  *      later timestamps,
  *   3. `last(payload, ignoreNulls)` over the unbounded-preceding frame
  *      carries the nearest qualifying build payload (and its ts, for the
  *      tolerance check) to each probe row,
  *   4. keep probe rows.
  *
  * Scale: exactly ONE hash shuffle on the key (same cost as a regular
  * sort-merge join), no row explosion, no driver involvement; skewed keys
  * are handled by AQE like any other window. [[nearest]] runs BOTH window
  * passes over the same partitioning — still one shuffle, the second pass
  * is an in-partition re-sort. This is the plan a custom SparkStrategy
  * would produce anyway, so the rewrite *is* the Spark-native operator
  * (SURVEY §4: no custom strategy needed).
  *
  * Ties: multiple build rows with identical (key, ts) are ambiguous in any
  * as-of join — pre-aggregate the build side to one row per (key, ts)
  * (e.g. `max(struct(...))`) for deterministic results.
  */
object AsOfJoin {

  private sealed trait Direction
  private case object Backward extends Direction
  private case object Forward extends Direction
  private case object Nearest extends Direction

  /** @param probe     left side; all its columns are preserved
    * @param build     right side; only `payload` columns are attached
    * @param key       equality key column name (present on both sides)
    * @param probeTs   probe-side ordering column name
    * @param buildTs   build-side ordering column name
    * @param payload   build-side columns to attach (null when unmatched)
    * @param tolerance max |probeTs − buildTs| for a match to count
    */
  def backward(
      probe: DataFrame, build: DataFrame,
      key: String, probeTs: String, buildTs: String,
      payload: Seq[String], tolerance: Option[Column] = None): DataFrame =
    joined(probe, build, key, probeTs, buildTs, payload, Backward, tolerance)

  def forward(
      probe: DataFrame, build: DataFrame,
      key: String, probeTs: String, buildTs: String,
      payload: Seq[String], tolerance: Option[Column] = None): DataFrame =
    joined(probe, build, key, probeTs, buildTs, payload, Forward, tolerance)

  def nearest(
      probe: DataFrame, build: DataFrame,
      key: String, probeTs: String, buildTs: String,
      payload: Seq[String], tolerance: Option[Column] = None): DataFrame =
    joined(probe, build, key, probeTs, buildTs, payload, Nearest, tolerance)

  private def joined(
      probe: DataFrame, build: DataFrame,
      key: String, probeTs: String, buildTs: String,
      payload: Seq[String], direction: Direction,
      tolerance: Option[Column]): DataFrame = {

    val probeCols = probe.columns.toSeq
    val payloadStruct = struct(payload.map(build(_)): _*)
    val payloadType = {
      val tmp = build.select(payloadStruct.as("__p"))
      tmp.schema("__p").dataType
    }
    val tsType = build.schema(buildTs).dataType

    val probeU = probe.select(
      struct(probeCols.map(probe(_)): _*).as("__probe"),
      probe(key).as("__k"), probe(probeTs).as("__ts"),
      lit(1).as("__side"), lit(null).cast(payloadType).as("__payload"),
      lit(null).cast(tsType).as("__bts"))
    val buildU = build.select(
      lit(null).cast(probeU.schema("__probe").dataType).as("__probe"),
      build(key).as("__k"), build(buildTs).as("__ts"),
      lit(0).as("__side"), payloadStruct.as("__payload"),
      build(buildTs).as("__bts"))
    val u = probeU.unionByName(buildU)

    // one ordered pass: carry the nearest qualifying build payload + its
    // ts to every row. desc=false walks time forward (backward matches);
    // desc=true walks time backward (forward matches).
    def pass(df: DataFrame, desc: Boolean, m: String, mts: String): DataFrame = {
      val w = Window.partitionBy(col("__k"))
        .orderBy(if (desc) col("__ts").desc else col("__ts").asc,
          col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(m, last(col("__payload"), ignoreNulls = true).over(w))
        .withColumn(mts, last(col("__bts"), ignoreNulls = true).over(w))
    }

    val matched = direction match {
      case Backward => pass(u, desc = false, "__m", "__mts")
      case Forward => pass(u, desc = true, "__m", "__mts")
      case Nearest =>
        val both = pass(pass(u, desc = false, "__mb", "__mbts"),
          desc = true, "__mf", "__mfts")
        val backGap = col("__ts") - col("__mbts")
        val fwdGap = col("__mfts") - col("__ts")
        // closer side wins; equal gaps (and a missing forward match)
        // fall through to backward
        val useFwd = col("__mbts").isNull ||
          (col("__mfts").isNotNull && fwdGap < backGap)
        both
          .withColumn("__m", when(useFwd, col("__mf")).otherwise(col("__mb")))
          .withColumn("__mts", when(useFwd, col("__mfts")).otherwise(col("__mbts")))
      }

    val gap = abs(col("__ts") - col("__mts"))
    val kept = tolerance match {
      case None => matched
      case Some(t) => matched
        .withColumn("__m", when(gap <= t, col("__m")))
        .withColumn("__mts", when(gap <= t, col("__mts")))
    }

    val out: Seq[Column] =
      probeCols.map(c => col(s"__probe.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c))
    kept.filter(col("__side") === 1).select(out: _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join (DuckDB `ASOF JOIN` — SURVEY.md §2.3 J7): for each
  * probe row, attach the payload of the latest build row with the same key
  * and `buildTs <= probeTs` (left-join semantics: unmatched probes keep a
  * null payload).
  *
  * Spark has no built-in as-of join, and the naive range-join
  * (`p.ts >= b.ts` non-equi) degenerates to a per-key cross product. This
  * implementation is the union + ordered-window rewrite:
  *
  *   1. union probe and build rows tagged with a side marker,
  *   2. one window partitioned by key, ordered by (ts, side) — build rows
  *      sort before probe rows at equal ts so `<=` matches inclusively,
  *   3. `last(payload, ignoreNulls)` over the unbounded-preceding frame
  *      carries the latest build payload forward,
  *   4. keep probe rows.
  *
  * Scale: exactly ONE hash shuffle on the key (same cost as a regular
  * sort-merge join), no row explosion, no driver involvement; skewed keys
  * are handled by AQE like any other window. This is the plan a custom
  * SparkStrategy would produce anyway, so the rewrite *is* the
  * Spark-native operator (SURVEY §4: no custom strategy needed).
  *
  * Ties: multiple build rows with identical (key, ts) are ambiguous in any
  * as-of join — pre-aggregate the build side to one row per (key, ts)
  * (e.g. `max(struct(...))`) for deterministic results.
  */
object AsOfJoin {

  /** @param probe    left side; all its columns are preserved
    * @param build    right side; only `payload` columns are attached
    * @param key      equality key column name (present on both sides)
    * @param probeTs  probe-side ordering column name
    * @param buildTs  build-side ordering column name
    * @param payload  build-side columns to attach (null when unmatched)
    */
  def backward(
      probe: DataFrame, build: DataFrame,
      key: String, probeTs: String, buildTs: String,
      payload: Seq[String]): DataFrame = {

    val probeCols = probe.columns.toSeq
    val payloadStruct = struct(payload.map(build(_)): _*)
    val payloadType = {
      val tmp = build.select(payloadStruct.as("__p"))
      tmp.schema("__p").dataType
    }

    val probeU = probe.select(
      struct(probeCols.map(probe(_)): _*).as("__probe"),
      probe(key).as("__k"), probe(probeTs).as("__ts"),
      lit(1).as("__side"), lit(null).cast(payloadType).as("__payload"))
    val buildU = build.select(
      lit(null).cast(probeU.schema("__probe").dataType).as("__probe"),
      build(key).as("__k"), build(buildTs).as("__ts"),
      lit(0).as("__side"), payloadStruct.as("__payload"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = probeU.unionByName(buildU)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out: Seq[Column] =
      probeCols.map(c => col(s"__probe.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(c))
    matched.select(out: _*)
  }
}

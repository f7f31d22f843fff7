package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slowly-changing-dimension Type 2 snapshots — dbt's `dbt snapshot`
  * (SURVEY.md §2.1 S9): turn a keyed change stream into validity
  * intervals `[valid_from, valid_to)` with `valid_to IS NULL` marking the
  * current row.
  *
  * `build` compresses consecutive rows with unchanged tracked attributes
  * (dbt's check strategy) and derives each interval's end from the next
  * change via `lead` — two windows over one shuffle on the key.
  *
  * Invariants (property-tested in MedallionSpec): per key, intervals are
  * non-overlapping, ordered, gap-free, and exactly one is open.
  */
object Scd2 {

  /** @param changes change stream (one row per observation)
    * @param keys    entity key columns
    * @param ts      observation-time column name
    * @param attrs   tracked attribute columns (a change in any opens a row)
    */
  def build(changes: DataFrame, keys: Seq[String], ts: String,
      attrs: Seq[String]): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(ts).asc)

    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || lag(col(ts), 1).over(w).isNull

    changes
      .withColumn("__is_change", changed)
      .filter(col("__is_change"))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ attrs).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Run-aware SCD2 over SUCCESSIVE SOURCE STATES — dbt snapshot's other
    * half: `runs` holds one row per key per snapshot run in which the key
    * was PRESENT (the distinct values of `runTs` are the snapshot
    * instants). Two dbt strategies:
    *  - `check` (default of [[build]]): a change in any tracked attr
    *    opens an interval; `valid_from` = the run instant.
    *  - `timestamp` (dbt's default): the `updatedAt` column drives
    *    detection — an interval opens when it moves — and becomes
    *    `valid_from`, so validity reflects SOURCE time, not scan time.
    * `invalidateHardDeletes` (dbt `invalidate_hard_deletes`): a key
    * absent from a run while earlier runs carried it has its open
    * interval CLOSED at that run's instant; a later reappearance opens a
    * fresh interval (dbt's re-insert) even if the attrs match.
    *
    * Scale shape: the run registry (distinct instants + their successor,
    * for absence detection) is metadata-sized — one row per snapshot RUN
    * — so its global-order window and the broadcast join cost nothing;
    * every per-key computation (two windows + one aggregate) shuffles on
    * the key hash, exactly once, like [[build]]. */
  def buildRuns(runs: DataFrame, keys: Seq[String], runTs: String,
      attrs: Seq[String], strategy: String = "check",
      updatedAt: Option[String] = None,
      invalidateHardDeletes: Boolean = false): DataFrame = {
    require(strategy == "check" || strategy == "timestamp",
      s"unknown snapshot strategy '$strategy' (check | timestamp)")
    val ua = updatedAt.getOrElse(runTs)
    require(strategy == "check" || updatedAt.nonEmpty,
      "timestamp strategy requires updatedAt")
    val keyCols: Seq[Column] = keys.map(col)
    import org.apache.spark.sql.functions.broadcast
    // tiny: one row per snapshot run (the single-partition global-order
    // window is over this registry only, never the data)
    val instants = runs.select(col(runTs).as("__run_ts")).distinct()
      .withColumn("__run_idx",
        row_number().over(Window.orderBy(col("__run_ts").asc)))
      .withColumn("__next_run_ts",
        lead(col("__run_ts"), 1).over(Window.orderBy(col("__run_ts").asc)))
    val joined = runs.join(broadcast(instants), col(runTs) === col("__run_ts"))
    val wk = Window.partitionBy(keyCols: _*).orderBy(col("__run_idx").asc)
    val prevIdx = lag(col("__run_idx"), 1).over(wk)
    val gap = prevIdx.isNull || (col("__run_idx") =!= prevIdx + 1)
    val attrChanged = strategy match {
      case "check" =>
        attrs.map(a => !(col(a) <=> lag(col(a), 1).over(wk))).reduce(_ || _)
      case "timestamp" =>
        !(col(ua) <=> lag(col(ua), 1).over(wk))
    }
    // without hard-delete tracking, absence is invisible (dbt default):
    // only attr/timestamp movement — or the first sighting — opens rows
    val isChange =
      if (invalidateHardDeletes) gap || attrChanged
      else prevIdx.isNull || attrChanged
    val nextIdx = lead(col("__run_idx"), 1).over(wk)
    // the last run of a PRESENCE SEGMENT that a later run follows: the
    // key was missing at __next_run_ts — the hard-delete instant
    val gapClose = when(lit(invalidateHardDeletes) &&
      (nextIdx.isNull || nextIdx =!= col("__run_idx") + 1) &&
      col("__next_run_ts").isNotNull, col("__next_run_ts"))
    val validFrom = if (strategy == "timestamp") col(ua) else col(runTs)
    val marked = joined
      .withColumn("__chg", isChange)
      .withColumn("__gap_close", gapClose)
      .withColumn("__ivl", sum(col("__chg").cast("long")).over(wk))
      .withColumn("__vf", validFrom)
    // one row per interval: the opening (min-idx) row's values, plus the
    // deletion instant if the interval's segment ended in one
    val ivl = marked.groupBy(keyCols :+ col("__ivl"): _*)
      .agg(min(col("__run_idx")).as("__open_idx"),
        (min_by(col("__vf"), col("__run_idx")).as("valid_from") +:
          attrs.map(a => min_by(col(a), col("__run_idx")).as(a))) :+
          max(col("__gap_close")).as("__close_ts"): _*)
    val wk2 = Window.partitionBy(keyCols: _*).orderBy(col("__open_idx").asc)
    ivl
      .withColumn("valid_to",
        coalesce(col("__close_ts"), lead(col("valid_from"), 1).over(wk2)))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ attrs).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}

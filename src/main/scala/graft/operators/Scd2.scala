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
}

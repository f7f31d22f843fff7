package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO (upsert) semantics — Delta Lake `MERGE` / dbt incremental
  * `merge` strategy (SURVEY.md §2.1 S8) — as a full-outer-join rewrite:
  *
  *   WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *
  *   ≡ target FULL OUTER JOIN updates ON keys,
  *     each column = coalesce(updates.col, target.col)
  *     (update wins; unmatched target rows pass through; unmatched update
  *     rows insert).
  *
  * Requires both sides to share the target's schema and updates to be
  * unique per key (enforced — a MERGE with duplicate source keys is
  * non-deterministic in every engine, Delta raises the same error).
  *
  * Scale: one shuffle on the key for the outer join (sort-merge at fact
  * scale, broadcast when updates are small — Catalyst/AQE decide); no
  * driver materialization. With file-level logs (see DeltaLite scaladoc)
  * the same join runs against only the files whose key ranges overlap the
  * update set.
  */
object Merge {

  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge keys required")
    val cols = target.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"updates schema ${updates.columns.toSeq} must match target $cols")
    // Delta raises DELTA_MULTIPLE_SOURCE_ROW_MATCHING... on ambiguous
    // sources; same contract here. One small agg over the (small) update
    // side — cheap relative to the merge join it guards.
    val dup = updates.groupBy(keys.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"MERGE source has multiple rows for key ${dup.headOption.mkString} — " +
        "a merge with duplicate source keys is non-deterministic")

    val u = updates.select(cols.map(c => col(c).as(s"__u_$c")): _*)
    val joinCond = keys.map(k => col(k) <=> col(s"__u_$k")).reduce(_ && _)
    target.join(u, joinCond, "full_outer")
      .select(cols.map { c =>
        if (keys.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c)
        // matched → update value; unmatched-target → keep; unmatched-update
        // → insert. Key-presence (not value nullness) decides the branch.
        else when(keys.map(k => col(s"__u_$k").isNotNull).reduce(_ && _),
          col(s"__u_$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}

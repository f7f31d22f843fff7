package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // --------------------------------------------------- multi-clause MERGE

  /** One `WHEN ...` clause of a full Delta-style MERGE. Conditions and
    * SET/VALUES expressions reference TARGET columns by plain name
    * (`col("x")`) and SOURCE columns via [[Merge.src]]. A clause with no
    * condition always applies to its row class; among applicable clauses
    * the FIRST in declaration order wins (Delta's rule). A NULL condition
    * does not fire the clause (SQL CASE semantics). */
  sealed trait MergeClause
  /** WHEN MATCHED [AND cond] THEN UPDATE SET ...; empty `set` = SET *. */
  final case class MatchedUpdate(cond: Option[Column] = None,
      set: Map[String, Column] = Map.empty) extends MergeClause
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  final case class MatchedDelete(cond: Option[Column] = None) extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT ...; empty `values` =
    * INSERT * (the full source row); key columns default to the source
    * key, other omitted columns to NULL. */
  final case class NotMatchedInsert(cond: Option[Column] = None,
      values: Map[String, Column] = Map.empty) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... (target
    * rows whose key is absent from the source). */
  final case class NotMatchedBySourceUpdate(cond: Option[Column] = None,
      set: Map[String, Column] = Map.empty) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE. */
  final case class NotMatchedBySourceDelete(cond: Option[Column] = None)
    extends MergeClause

  /** Reference a SOURCE column inside a clause condition or SET/VALUES
    * expression (target columns are referenced by plain name). */
  def src(c: String): Column = col(s"__src_$c")

  /** Full multi-clause MERGE INTO as a single full-outer-join rewrite —
    * every clause family Delta supports (conditional UPDATE/DELETE/
    * INSERT, NOT MATCHED BY SOURCE), first-match-wins within a row class.
    *
    * Scale: ONE shuffle on the key for the outer join; clause resolution
    * is a codegen'd when-chain over the joined row — no second pass, no
    * driver materialization. The source may carry extra columns beyond
    * the target schema (legal in Delta — used by conditions); only
    * `keys` must exist on both sides. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      clauses: Seq[MergeClause]): DataFrame = {
    require(keys.nonEmpty, "merge keys required")
    require(clauses.nonEmpty, "at least one merge clause required")
    val cols = target.columns.toSeq
    require(keys.forall(source.columns.contains),
      s"source must carry the merge keys $keys; has ${source.columns.toSeq}")
    val hasMatched = clauses.exists {
      case _: MatchedUpdate | _: MatchedDelete => true; case _ => false
    }
    if (hasMatched) {
      // Delta's DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW guard: a
      // matched row hit by two source rows is non-deterministic.
      val dup = source.groupBy(keys.map(source.col): _*)
        .count().filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"MERGE source has multiple rows for key ${dup.headOption.mkString}")
    }

    val s2 = source.select(source.columns.toSeq.map(c =>
      source(c).as(s"__src_$c")) :+ lit(true).as("__s_p"): _*)
    val t2 = target.withColumn("__t_p", lit(true))
    val joinCond = keys.map(k => t2(k) <=> s2(s"__src_$k")).reduce(_ && _)
    val j = t2.join(s2, joinCond, "full_outer")

    val tP = coalesce(col("__t_p"), lit(false))
    val sP = coalesce(col("__s_p"), lit(false))
    val matched = tP && sP
    val onlySrc = sP && !tP
    val onlyTgt = tP && !sP
    def fires(c: Option[Column]): Column =
      coalesce(c.getOrElse(lit(true)), lit(false))
    def guard(cl: MergeClause): Column = cl match {
      case MatchedUpdate(c, _) => matched && fires(c)
      case MatchedDelete(c) => matched && fires(c)
      case NotMatchedInsert(c, _) => onlySrc && fires(c)
      case NotMatchedBySourceUpdate(c, _) => onlyTgt && fires(c)
      case NotMatchedBySourceDelete(c) => onlyTgt && fires(c)
    }
    // first-match-wins: a when-chain evaluates guards in clause order
    val action = clauses.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (cl, i)) =>
        Some(acc.map(_.when(guard(cl), i)).getOrElse(when(guard(cl), i)))
      }.get.otherwise(lit(-1))
    val withAction = j.withColumn("__action", action)

    val deleteIdx = clauses.zipWithIndex.collect {
      case (_: MatchedDelete, i) => i
      case (_: NotMatchedBySourceDelete, i) => i
    }
    // survivors: not claimed by a DELETE clause, and source-only rows die
    // unless an INSERT clause claimed them (un-matched target rows with no
    // applicable clause pass through unchanged — MERGE never drops them)
    val keep = (if (deleteIdx.isEmpty) lit(true)
                else !col("__action").isin(deleteIdx: _*)) &&
      !(col("__action") === -1 && onlySrc)

    val types = target.schema.fields.map(f => f.name -> f.dataType).toMap
    val out = cols.map { c =>
      val chain = clauses.zipWithIndex
        .foldLeft(Option.empty[Column]) { case (acc, (cl, i)) =>
          val value: Option[Column] = cl match {
            case MatchedUpdate(_, set) =>
              Some(if (set.isEmpty) col(s"__src_$c") else set.getOrElse(c, col(c)))
            case NotMatchedInsert(_, vals) =>
              Some(if (vals.isEmpty) col(s"__src_$c")
              else vals.getOrElse(c,
                if (keys.contains(c)) col(s"__src_$c")
                else lit(null).cast(types(c))))
            case NotMatchedBySourceUpdate(_, set) =>
              Some(set.getOrElse(c, col(c)))
            case _ => None // delete clauses: row is filtered, value moot
          }
          value.map(v =>
            acc.map(_.when(col("__action") === i, v))
              .getOrElse(when(col("__action") === i, v))).orElse(acc)
        }
      // KEEP rows: target value (for key columns the source side fills in
      // when the target side is a null-keyed source-only row)
      val base = if (keys.contains(c)) coalesce(col(c), col(s"__src_$c")) else col(c)
      chain.map(_.otherwise(base)).getOrElse(base).cast(types(c)).as(c)
    }
    withAction.filter(keep).select(out: _*)
  }
}

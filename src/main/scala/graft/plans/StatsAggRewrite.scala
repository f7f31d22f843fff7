package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.DeltaLite

/** METADATA-ONLY aggregates — Delta's OptimizeMetadataOnlyQuery /
  * parquet-footer-aggregation idea over the DeltaLite log: a global
  * `COUNT(*)` / `MIN(col)` / `MAX(col)` over a DeltaLite table scan is
  * answered from the PER-FILE statistics the log already holds, replacing
  * the whole scan with a one-row LocalRelation. At 100 TB this turns the
  * most common operational queries (row counts, freshness `max(ts)`,
  * watermark bounds) from a full-table pass into a driver-side log read
  * — zero executors, zero bytes of data I/O.
  *
  * Soundness (every check structural; ANY miss falls through to the
  * real scan — the rule can only decline, never corrupt):
  *  - fires only on a GLOBAL Aggregate (no grouping) directly over a
  *    bare parquet scan (optionally under an attribute-only Project). A
  *    logical Filter above the relation blocks the match, and pushed
  *    filters don't exist at this stage — so the file set IS the answer
  *    domain. DV reads, partitioned union-trees, and column-mapped
  *    tables never present as a bare relation, so they self-exclude.
  *  - the scanned files must ALL resolve in the table's CURRENT
  *    snapshot (files are immutable, so per-file stats are valid for
  *    any SUBSET of live files — a time-travel scan referencing
  *    vacuum-eligible files simply fails to resolve and declines).
  *  - any resolved file carrying a deletion vector declines COUNT
  *    (physical rows over-count) and min/max (a DV can delete the
  *    extremum); no DV anywhere is required.
  *  - MIN/MAX per column requires every scanned file to carry stats for
  *    it (a None is indistinguishable from "stat-ineligible type", so
  *    all-null files conservatively decline instead of being skipped).
  *    File min/max ignore nulls exactly like SQL MIN/MAX.
  *  - COUNT(*) = Σ physical rows; COUNT(col) (non-null semantics) is
  *    NOT answerable from min/max stats and declines.
  */
object StatsAggRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.statsAgg", "true").toBoolean)
      return plan
    plan.transformUp {
      case agg @ Aggregate(Seq(), aggExprs, child, _) =>
        (for {
          files <- scannedAddFiles(child)
          row <- answer(aggExprs, files)
        } yield {
          record(aggExprs, files.size, grouped = false)
          LocalRelation(agg.output.map(_.asInstanceOf[Attribute]),
            Seq(row))
        }).getOrElse(agg)
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if groupings.nonEmpty =>
        answerGrouped(groupings, aggExprs, child)
          .map { rows =>
            record(aggExprs, rows.size, grouped = true)
            LocalRelation(agg.output.map(_.asInstanceOf[Attribute]), rows)
          }
          .getOrElse(agg)
    }
  }

  /** EXPLAIN PRUNING surface (the shared DBP decision log): a
    * stats-only aggregate never scans data — the substitution must be
    * askable, like every other silent plan rewrite here. */
  private def record(aggExprs: Seq[NamedExpression], n: Int,
      grouped: Boolean): Unit =
    DynamicBranchPruning.recordDecisions(
      s"aggregate(${aggExprs.map(_.name).mkString(", ")})",
      Seq(if (grouped)
        s"StatsAggRewrite: $n group row(s) answered from log stats — " +
          "branch partition literals + per-file stats, no data scan"
      else
        s"StatsAggRewrite: answered from the log stats of $n file " +
          "entr(ies), no data scan"))

  /** GROUP BY over PARTITION columns of a partitioned DeltaLite scan —
    * the grouped twin of the global rewrite. A partitioned read presents
    * as a union tree whose branches each carry their partition values as
    * plan LITERALS (attached from the log, DeltaLite.readFiles); when
    * every grouping expression resolves to such a literal position, the
    * groups ARE the branches (merged when grouping on a partition-key
    * subset), and per-group COUNT(*)/MIN/MAX answer from each branch's
    * file stats — `SELECT day, count(*) ... GROUP BY day` over a
    * day-partitioned 100 TB table becomes a driver-side log read.
    * Decline rules inherit from the global path (DV anywhere, missing
    * stats, 32-char string bounds) plus: a grouping or measure position
    * that is a data column declines (grouping literals only), a measure
    * that is itself a partition literal declines (no cross-branch
    * literal ordering), and a branch with zero physical rows emits NO
    * group — matching SQL, where an empty partition produces no row. */
  private def answerGrouped(groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[Seq[InternalRow]] = {
    import org.apache.spark.sql.catalyst.plans.logical.Union
    val childOut = child.output
    val branchPlans: Seq[LogicalPlan] = child match {
      case u: Union => u.children
      case p: Project => Seq(p)
      case _ => return None
    }
    val branches: Seq[PBranch] = branchPlans.map {
      case Project(plist, lr: LogicalRelation)
          if plist.size == childOut.size =>
        val files = scannedAddFiles(lr).getOrElse(return None)
        PBranch(plist.map {
          case Alias(l: Literal, _) => l
          case a: AttributeReference => a
          case Alias(a: AttributeReference, _) => a
          case _ => return None
        }, files)
      case _ => return None
    }
    if (branches.exists(_.files.exists(_.dv.isDefined))) return None
    val posOf: Map[ExprId, Int] =
      childOut.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
    val gPos: Seq[Int] = groupings.map {
      case a: AttributeReference => posOf.getOrElse(a.exprId, return None)
      case _ => return None
    }
    if (!branches.forall(b =>
      gPos.forall(i => b.entries(i).isInstanceOf[Literal]))) return None
    val groups: Seq[(Seq[Literal], Seq[PBranch])] = branches
      .groupBy(b => gPos.map(i => b.entries(i).asInstanceOf[Literal]))
      .toSeq
    val rows = groups.flatMap { case (_, bs) =>
      val files = bs.flatMap(_.files)
      // an all-empty group would emit count=0 where SQL emits no row
      if (files.map(_.rows).sum == 0L) None
      else {
        val vals = aggExprs.map {
          case a: AttributeReference =>
            val i = posOf.getOrElse(a.exprId, return None)
            bs.head.entries(i) match {
              case l: Literal => l.value
              case _ => return None
            }
          case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
            fn match {
              case Count(Seq(Literal(1, _))) =>
                java.lang.Long.valueOf(files.map(_.rows).sum)
              case Min(ar: AttributeReference) =>
                groupExtremum(bs, posOf, ar, isMin = true)
                  .getOrElse(return None)
              case Max(ar: AttributeReference) =>
                groupExtremum(bs, posOf, ar, isMin = false)
                  .getOrElse(return None)
              case _ => return None
            }
          case _ => return None
        }
        Some(InternalRow.fromSeq(vals))
      }
    }
    Some(rows)
  }

  /** One partition branch of a unioned DeltaLite scan: position-aligned
    * projection entries (literal partition values / scan attributes) +
    * that branch's resolved log files. */
  private final case class PBranch(entries: Seq[Expression],
      files: Seq[DeltaLite.AddFile])

  /** Extremum of a DATA-column measure over a group's combined file set.
    * Every branch must present the measure as the SAME underlying scan
    * attribute name (one table ⇒ one physical column name); a measure
    * that is a partition literal in any branch declines. */
  private def groupExtremum(bs: Seq[PBranch], posOf: Map[ExprId, Int],
      ar: AttributeReference, isMin: Boolean): Option[Any] = {
    val i = posOf.getOrElse(ar.exprId, return None)
    val names = bs.map(_.entries(i) match {
      case a: AttributeReference => a.name
      case _ => return None
    })
    if (names.distinct.size != 1) return None
    statExtremum(bs.flatMap(_.files), names.head, ar.dataType, isMin)
  }

  /** The scanned files' log entries, when the subtree is a bare scan of
    * a DeltaLite table and every file resolves in the current snapshot. */
  private def scannedAddFiles(
      plan: LogicalPlan): Option[Seq[DeltaLite.AddFile]] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scannedAddFiles(child)
    case lr: LogicalRelation => lr.relation match {
      case hfs: HadoopFsRelation =>
        val roots = hfs.location.rootPaths.map(_.toUri.getPath)
        if (roots.isEmpty) return None
        // the table root is the ancestor dir holding _graft_log
        var dir = Paths.get(roots.head).getParent
        var hops = 0
        while (dir != null && hops < 4 &&
          !Files.isDirectory(dir.resolve("_graft_log"))) {
          dir = dir.getParent; hops += 1
        }
        if (dir == null || !Files.isDirectory(dir.resolve("_graft_log")))
          return None
        val snap = try DeltaLite.snapshot(dir.toString)
          catch { case _: Throwable => return None }
        val byAbs = snap.files.map(f =>
          dir.resolve(f.path).normalize.toString -> f).toMap
        val resolved = roots.map(r => byAbs.get(Paths.get(r).normalize.toString))
        if (resolved.forall(_.isDefined)) Some(resolved.map(_.get)) else None
      case _ => None
    }
    case _ => None
  }

  /** The one-row answer in INTERNAL representation, when every output
    * aggregate is derivable from the files' stats. */
  private def answer(aggExprs: Seq[NamedExpression],
      files: Seq[DeltaLite.AddFile]): Option[InternalRow] = {
    if (files.exists(_.dv.isDefined)) return None
    val values = aggExprs.map {
      case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
        fn match {
          case Count(Seq(Literal(1, _))) =>
            Some(java.lang.Long.valueOf(files.map(_.rows).sum))
          case Min(ar: AttributeReference) => statExtremum(files, ar.name,
            ar.dataType, isMin = true)
          case Max(ar: AttributeReference) => statExtremum(files, ar.name,
            ar.dataType, isMin = false)
          case _ => None
        }
      case _ => None
    }
    if (values.exists(_.isEmpty)) None
    else Some(InternalRow.fromSeq(values.map(_.get)))
  }

  /** Extremum over the files' stored bounds, converted to the column's
    * INTERNAL representation. The log stores timestamps as epoch-µs
    * longs, dates as epoch-day longs, integers widened to long, floats
    * widened to double, strings verbatim BUT truncated/adjusted at 32
    * chars (valid PRUNE bounds, not necessarily real values) — so a
    * 32-char string bound is ambiguous and declines. Decimals decline
    * (precision bookkeeping isn't worth the risk). */
  /** Also reused by the dbt docs catalog (Medallion.Pipeline
    * .generateCatalog) — same decline rules, zero data reads. */
  private[graft] def statExtremum(files: Seq[DeltaLite.AddFile], col: String,
      dt: org.apache.spark.sql.types.DataType, isMin: Boolean): Option[Any] = {
    import org.apache.spark.sql.types._
    // empty files (0 physical rows) contribute no extremum — skip them;
    // with ONLY empty files the SQL answer is NULL, which is expressible
    val nonEmpty = files.filter(_.rows > 0)
    if (nonEmpty.isEmpty) return Some(null)
    val bounds = nonEmpty.map(_.stats.get(col).flatMap(s =>
      if (isMin) s.min else s.max))
    if (bounds.exists(_.isEmpty)) return None
    val vs = bounds.map(_.get)
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        val ls = vs.map { case l: Long => l; case _ => return None }
        Some(java.lang.Long.valueOf(if (isMin) ls.min else ls.max))
      case IntegerType | DateType =>
        val ls = vs.map { case l: Long => l; case _ => return None }
        Some(java.lang.Integer.valueOf(
          (if (isMin) ls.min else ls.max).toInt))
      case ShortType =>
        val ls = vs.map { case l: Long => l; case _ => return None }
        Some(java.lang.Short.valueOf(
          (if (isMin) ls.min else ls.max).toShort))
      case DoubleType =>
        val ds = vs.map { case d: Double => d; case _ => return None }
        Some(java.lang.Double.valueOf(if (isMin) ds.min else ds.max))
      case FloatType =>
        val ds = vs.map { case d: Double => d; case _ => return None }
        Some(java.lang.Float.valueOf(
          (if (isMin) ds.min else ds.max).toFloat))
      case StringType =>
        val ss = vs.map { case s: String => s; case _ => return None }
        if (ss.exists(_.length >= DeltaLite.MaxStringStatLen)) return None
        val us = ss.map(org.apache.spark.unsafe.types.UTF8String.fromString)
        Some(if (isMin) us.min else us.max)
      case _ => None
    }
  }
}

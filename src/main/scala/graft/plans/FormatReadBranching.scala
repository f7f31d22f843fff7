package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.{DeltaLite, GraftDeltaRelation}

/** Branch-shape substitution for REGISTERED-FORMAT reads of PARTITIONED
  * tables — the rule that routes S59 join-driven pruning (and free
  * static branch folding) through `spark.read.format("graft-delta")`
  * and `CREATE TABLE ... USING graft-delta`.
  *
  * The V1 relation ([[GraftDeltaRelation]]) is a single opaque
  * `PrunedFilteredScan`: pushed filters prune FILES via log stats, but
  * a JOIN cannot reach per-partition structure through it, so
  * catalog-mounted tables silently lost the star-join partition
  * elimination `DeltaLite.read` gets (the round-13 scope pin). This
  * rule closes that gap the way delta-spark's analysis rewrites do —
  * substitute the relation node with the SAME logical plan the direct
  * read API builds:
  *
  *   LogicalRelation(GraftDeltaRelation(path))
  *     →  Project(aliases re-binding the relation's exprIds,
  *          <DeltaLite.read plan: Union of per-partition scan branches,
  *           partition column attached as a per-branch LITERAL>)
  *
  * The aliasing Project keeps the substitution transparent to every
  * parent operator (same names, types, exprIds). From there the
  * standard fixed point does the rest IN THIS SAME BATCH:
  * PushProjectionThroughUnion distributes the aliases into the
  * branches, CollapseProject + constant folding reduce each branch's
  * key slot to the `Alias(Literal)` shape, static partition filters
  * empty branches via PruneFilters, and [[DynamicBranchPruning]] — a
  * later rule of this batch — probes joins against the now-visible
  * literal domain. (DBP's "not yet a literal slot" declines are
  * retryable by design, so rule ordering inside the fixed point does
  * not matter.)
  *
  * Scope (all structural, decline-only). The branch shape and the V1
  * relation have COMPLEMENTARY strengths — the union exposes partition
  * structure, the relation pushes per-file min/max + bloom pruning on
  * arbitrary columns through `DeltaLite.scan` — so substitution
  * happens only where the trade wins:
  *  - only PARTITIONED tables (a partitionless table gains nothing);
  *  - only when the plan actually PREDICATES on a partition column — a
  *    Filter condition or Join condition referencing one (the
  *    substitution's entire payoff is partition elimination;
  *    [[BranchFilePruning]] now gives the branch shape min/max, bloom,
  *    AND derived generated-column file skipping — full scan()-path
  *    parity — so the scope stays conservative purely to avoid
  *    building an N-branch union on compiles that cannot benefit);
  *  - only batch reads (`isStreaming` declines — the streaming source
  *    never plans through LogicalRelation anyway);
  *  - governance is PRESERVED, not bypassed: the substituted plan is
  *    `DeltaLite.read`'s, which applies the S63 serving projection; a
  *    governed table's plan then carries Filter/mask nodes above the
  *    union, so DBP's union-shape match declines exactly as it does on
  *    the direct read path (masked partition pruning stays declined).
  *
  * Kill switch: `spark.graft.formatBranching.enabled=false` (the
  * relation path simply keeps its opaque-scan behavior). Cost: one log
  * snapshot read (cached by DeltaLite) per matched relation per
  * compile — the same class of plan-time metadata work the relation's
  * own buildScan does. */
object FormatReadBranching extends Rule[LogicalPlan] {

  /** Marks a relation checked-and-declined (unpartitioned), so
    * fixed-point reruns skip the per-iteration partition lookup. Tags
    * survive makeCopy, the DBP PROBED pattern. (The partition-predicate
    * check is NOT tagged: predicates referencing the relation can
    * appear or fold away between iterations, and the check is cheap.) */
  private val DECLINED =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.frb.declined")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.formatBranching.enabled", "true")
        .toBoolean) return plan
    // the union of every attribute referenced by a Filter or Join
    // condition anywhere in the plan — the surface partition
    // elimination can act through
    lazy val predicateRefs: AttributeSet = AttributeSet(
      plan.collect {
        case f: Filter => f.condition.references
        case j: Join => j.condition.map(_.references)
          .getOrElse(AttributeSet.empty)
      }.flatMap(_.iterator))
    plan.transformUp {
      case lr: LogicalRelation if !lr.isStreaming &&
          lr.getTagValue(DECLINED).isEmpty &&
          lr.relation.isInstanceOf[GraftDeltaRelation] =>
        val rel = lr.relation.asInstanceOf[GraftDeltaRelation]
        val partitionBy = DeltaLite.snapshot(rel.path, rel.asOf).partitionBy
        if (partitionBy.isEmpty) {
          lr.setTagValue(DECLINED, ()); lr
        } else if (!lr.output.exists(a =>
            partitionBy.contains(a.name) && predicateRefs.contains(a))) {
          // no partition predicate — the V1 relation's file pruning
          // wins; recorded so EXPLAIN PRUNING explains the kept shape
          DynamicBranchPruning.recordDecisions(
            s"<format read ${rel.path}>", Seq(
              "kept the V1 pruning relation (no Filter/Join predicate " +
                s"on partition column(s) ${partitionBy.mkString(", ")})"))
          lr
        } else {
          // the direct-read plan over the same snapshot; only ANALYZED
          // here — it joins this compile's fixed point for optimization
          val sub = DeltaLite.read(rel.spark, rel.path, rel.asOf)
            .queryExecution.analyzed
          DynamicBranchPruning.recordDecisions(
            s"<format read ${rel.path}>", Seq(
              "substituted the branch-union plan (partition predicate " +
                "present) — static folding and join-driven pruning now " +
                "apply"))
          BranchFilePruning.rebindToOutput(lr.output, sub)
        }
    }
  }
}

package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Automatic materialized-view QUERY REWRITE — the optimizer half of the
  * MV story (IncrementalMv is the maintenance half): a query that
  * aggregates the SOURCE table is transparently redirected onto a
  * registered MV that already holds the partial aggregates, re-grouping
  * MV rows instead of re-scanning the corpus. The user query does not
  * change; the plan does. At 100 TB this is the canonical
  * 10^4×-less-IO move: a daily rollup over a fact table becomes a scan
  * of the (keys-cardinality) MV.
  *
  * Soundness model (each condition checked structurally; ANY miss
  * falls through to the original plan — the rule can only ever decline,
  * never corrupt):
  *  - the aggregate's child is a scan of the registered source table,
  *    optionally under pruning Projects of plain attributes and
  *    deterministic Filters: detected by every scan root path living
  *    under the source dir. Filters referencing only MV KEY columns
  *    replay over the MV (they select whole groups, so surviving
  *    partials are exactly the surviving rows' partials); a filter
  *    touching any measure column disqualifies.
  *  - the query's GROUP BY attrs are a subset of the MV's key columns —
  *    re-aggregating the MV by fewer keys is exactly the partial-agg
  *    merge Spark itself performs, valid because sum/count/min/max are
  *    decomposable; avg derives as sum/count.
  *  - every output expression is a grouping attr, COUNT(*), or
  *    SUM/MIN/MAX/AVG over a registered measure column (no DISTINCT, no
  *    FILTER clauses). COUNT(*) maps to coalesce(SUM(cnt), 0) to keep
  *    the non-null LongType contract.
  *  - output names AND exprIds are preserved via aliases, so parent
  *    operators keep resolving untouched.
  *
  * The MV plan is resolved FRESH per rewrite (a metadata-only snapshot
  * load): each splice gets fresh exprIds (safe under self-joins of
  * rewritten queries) and the rewrite always serves the MV's CURRENT
  * version — refresh the MV (IncrementalMv) and queries see it on their
  * next planning, the Databricks/Oracle MV-rewrite freshness model for
  * the synchronous-maintenance case. Registered via
  * [[graft.GraftExtensions]] like any library rule; disabled per
  * session with `spark.graft.mv.autoRewrite=false`.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registered rewrite target.
    * @param sourcePath source table dir (DeltaLite path)
    * @param mvPath     MV table dir; its rows are one per key-tuple
    * @param keyMap     source group column -> MV column
    * @param sumMap     source measure column -> MV sum column
    * @param cntCol     MV count(*) column
    * @param minMap     source measure column -> MV min column
    * @param maxMap     source measure column -> MV max column
    * @param sourceVersion source version the MV reflects (stamped by
    *   [[register]]); the FRESHNESS GUARD — see below */
  final case class MvDef(sourcePath: String, mvPath: String,
      keyMap: Map[String, String], sumMap: Map[String, String],
      cntCol: String, minMap: Map[String, String] = Map.empty,
      maxMap: Map[String, String] = Map.empty,
      nnMap: Map[String, String] = Map.empty,
      sourceVersion: Long = -1L)

  private val registry = new ConcurrentHashMap[String, MvDef]()

  private def norm(p: String): String =
    java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString

  /** Register (or replace) the MV for a source table, stamping the
    * source version the MV was built from (the current one). The rule
    * rewrites ONLY while the source still sits at that version: any
    * later source commit silently disarms the rewrite (queries fall
    * back to the — always correct — source scan) until a refresh
    * re-registers. This also makes the MV's own maintenance query safe
    * by construction: a refresh reads the source AFTER it advanced, so
    * the stale-MV rewrite that would otherwise feed the MV back into
    * itself never fires. */
  def register(spark: SparkSession, mv: MvDef): Unit = {
    val v = graft.sources.DeltaLite.latestVersion(mv.sourcePath)
      .getOrElse(throw new IllegalArgumentException(
        s"MV source table does not exist: ${mv.sourcePath}"))
    registry.put(norm(mv.sourcePath), mv.copy(sourceVersion = v))
  }

  def deregister(sourcePath: String): Unit =
    registry.remove(norm(sourcePath))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty ||
      !conf.getConfString("spark.graft.mv.autoRewrite", "true").toBoolean)
      return plan
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        (for {
          (mv, filters) <- sourceMv(child)
          rewritten <- rewrite(groupings, aggExprs, mv, filters)
        } yield {
          // EXPLAIN PRUNING surface (the DBP/FRB/BFP decision log):
          // an answered-from-MV aggregate is exactly the kind of
          // silent plan substitution a user needs to be able to ask
          // about
          DynamicBranchPruning.recordDecisions(
            s"aggregate over ${mv.sourcePath}", Seq(
              s"MvRewrite: served from materialized view ${mv.mvPath} " +
                s"(source @ v${mv.sourceVersion}; " +
                s"${filters.size} filter(s) replayed over MV keys)"))
          rewritten
        }).getOrElse(agg)
    }
  }

  /** The registered MV whose SOURCE table this subtree scans — a bare
    * LogicalRelation, optionally under attribute-only Projects and
    * Filters. Filter conditions are collected for replay over the MV;
    * they are only SAFE there when every referenced column is an MV
    * grouping key (the filter then selects whole groups — the partial
    * aggregates of the surviving groups are exactly the partial
    * aggregates of the surviving source rows). [[rewrite]] enforces
    * that; a measure-column filter falls through to the source. */
  private def sourceMv(
      plan: LogicalPlan): Option[(MvDef, Seq[Expression])] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      sourceMv(child)
    case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
      sourceMv(child).map { case (mv, fs) => (mv, cond +: fs) }
    case lr: LogicalRelation => lr.relation match {
      case hfs: HadoopFsRelation =>
        val roots = hfs.location.rootPaths.map(_.toUri.getPath)
        if (roots.isEmpty) None
        else registry.values.asScalaSeq
          .find(mv => roots.forall(r =>
            r.startsWith(norm(mv.sourcePath) + "/")))
          // freshness guard: any source commit past the registered
          // version disarms the rewrite until re-registration
          .filter(mv => graft.sources.DeltaLite
            .latestVersion(mv.sourcePath).contains(mv.sourceVersion))
          .map(mv => (mv, Nil))
      case _ => None
    }
    case _ => None
  }

  private implicit class JCol[T](val c: java.util.Collection[T]) {
    def asScalaSeq: Seq[T] =
      scala.jdk.CollectionConverters.CollectionHasAsScala(c).asScala.toSeq
  }

  private def rewrite(groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], mv: MvDef,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    // fresh MV scan per rewrite: current snapshot, fresh exprIds
    val spark = SparkSession.active
    val mvScan = graft.sources.DeltaLite.read(spark, mv.mvPath)
      .queryExecution.analyzed
    val mvOut = mvScan.output.map(a => a.name -> a).toMap
    def mvAttr(n: String): Option[Attribute] = mvOut.get(n)

    // replay source filters over the MV — safe only when every
    // referenced column is a grouping KEY (whole-group selection);
    // deterministic-only, since the filter now runs once per GROUP, not
    // once per row
    val newFilters: Option[Seq[Expression]] = traverse(filters.map { f =>
      if (!f.deterministic) None
      else {
        val refs = f.references.toSeq
        val mapped = traverse(refs.map(a =>
          mv.keyMap.get(a.name).flatMap(mvAttr).map(a -> _)))
        mapped.map { pairs =>
          val sub = pairs.map { case (from, to) => from.exprId -> to }.toMap
          f.transform {
            case a: AttributeReference if sub.contains(a.exprId) =>
              sub(a.exprId)
          }
        }
      }
    })
    if (newFilters.isEmpty) return None
    val mvPlan = newFilters.get.foldLeft(mvScan: LogicalPlan)((p, c) =>
      org.apache.spark.sql.catalyst.plans.logical.Filter(c, p))

    // GROUP BY attrs must all be MV keys
    val newGroupings: Option[Seq[Attribute]] =
      traverse(groupings.map {
        case a: AttributeReference =>
          mv.keyMap.get(a.name).flatMap(mvAttr)
        case _ => None
      })

    def aggOf(f: AggregateFunction): AggregateExpression =
      f.toAggregateExpression()

    val newAggExprs: Option[Seq[NamedExpression]] =
      traverse(aggExprs.map {
        // grouping passthrough: same name, same exprId, MV key under it
        case a: AttributeReference =>
          mv.keyMap.get(a.name).flatMap(mvAttr)
            .map(k => Alias(k, a.name)(exprId = a.exprId))
        case al @ Alias(AggregateExpression(fn, Complete, false, None, _),
            name) =>
          val repl: Option[Expression] = fn match {
            case Count(Seq(Literal(1, _))) =>
              mvAttr(mv.cntCol).map(c =>
                Coalesce(Seq(aggOf(Sum(c)), Literal(0L, LongType))))
            case Sum(ar: AttributeReference, _) =>
              mv.sumMap.get(ar.name).flatMap(mvAttr).map(s => aggOf(Sum(s)))
            case Min(ar: AttributeReference) =>
              mv.minMap.get(ar.name).flatMap(mvAttr).map(m => aggOf(Min(m)))
            case Max(ar: AttributeReference) =>
              mv.maxMap.get(ar.name).flatMap(mvAttr).map(m => aggOf(Max(m)))
            case Average(ar: AttributeReference, _) =>
              // AVG divides by the NON-NULL count of the measure, not
              // COUNT(*) — the two diverge the moment the measure column
              // holds a NULL, and a rewrite using COUNT(*) would
              // silently shrink the average (breaking the can-only-
              // decline contract). Denominator resolution: a provably
              // non-null measure (rare — parquet scans type everything
              // nullable) may use COUNT(*); otherwise the MV must carry
              // a per-measure non-null count column (nnMap, i.e.
              // COUNT(measure) materialized alongside SUM) or AVG
              // declines.
              val denom: Option[Attribute] =
                if (!ar.nullable) mvAttr(mv.cntCol)
                else mv.nnMap.get(ar.name).flatMap(mvAttr)
              for {
                s <- mv.sumMap.get(ar.name).flatMap(mvAttr)
                c <- denom
              } yield Divide(
                Cast(aggOf(Sum(s)), DoubleType),
                Cast(aggOf(Sum(c)), DoubleType))
            case _ => None
          }
          repl.map(e => Alias(e, name)(exprId = al.exprId))
        case _ => None
      })

    for {
      g <- newGroupings
      a <- newAggExprs
    } yield Aggregate(g, a, mvPlan)
  }

  private def traverse[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}

package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Filter, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, Offset, Project, Sample, Tail, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types._

/** JOIN-DRIVEN PARTITION PRUNING for the log-driven union scan shape —
  * the dynamic-partition-pruning analogue for [[graft.sources.DeltaLite]]
  * partitioned tables.
  *
  * DeltaLite reads a Hive-layout table as a Union of one scan branch per
  * live partition, with the partition column attached as a per-branch
  * LITERAL from the log (readFiles) — so a STATIC filter on the
  * partition column constant-folds per branch and Catalyst's PruneFilters
  * empties non-matching branches for free. What static folding cannot
  * see is a JOIN: `fact JOIN dim ON fact.part = dim.key WHERE dim.f`
  * names the surviving partitions only through the DIMENSION'S DATA.
  * Spark's own DynamicPartitionPruning rule never fires here — it keys
  * on HadoopFsRelation partition columns, and these scans carry their
  * partition values as plan literals instead — and the row-level runtime
  * filters (bloom/semi-join) still SCAN every partition before
  * filtering. At 100 TB the difference is the whole game: a date-dim
  * filter selecting 3 of 3,000 daily partitions should read 3.
  *
  * The rewrite is the EAGER form of DPP (the same shape Spark plans when
  * broadcast reuse is unavailable: run the dimension as a subquery,
  * then prune): at optimization time, run
  *
  *   SELECT DISTINCT key FROM dim WHERE key IN (<branch literals>)
  *
  * once — the IN pushes the branch-literal domain into the dimension
  * scan, so the probe returns AT MOST one row per live partition no
  * matter how large the dimension is — and replace every union branch
  * whose partition literal is absent from the result with an empty
  * LocalRelation (exactly what PruneFilters leaves for a statically
  * pruned branch; the later LocalRelation batch collapses them away).
  * The pruned branches' scans simply never exist in the physical plan:
  * zero I/O, zero tasks, not even a footprint in the scan's split
  * planning.
  *
  * Soundness (every condition structural; any miss declines — the rule
  * can only decline, never corrupt):
  *  - the traced join-key slot must be a foldable LITERAL in EVERY
  *    non-empty union branch (the attachPartitionCols shape after
  *    constant folding), so a branch's rows ALL carry that key value;
  *  - a branch is removable iff its literal has no partner on the
  *    dimension side: `EqualTo` never matches NULL, and a value absent
  *    from the probe's result (which saw the FULL dimension — the IN
  *    only restricts to the branch domain, never drops a partner inside
  *    it) matches nothing. Removing rows that match nothing preserves
  *    Inner/LeftSemi joins and the pruned side of LeftOuter/RightOuter
  *    (unmatched preserved-side rows keep their match status — the
  *    pruned rows never matched anything);
  *  - prune sides follow Spark's own DPP eligibility: left under
  *    Inner/LeftSemi/RightOuter, right under Inner/LeftOuter (plus
  *    right under LeftAnti — an anti join's right side only acts
  *    through matches);
  *  - the dimension must be fully DETERMINISTIC and non-streaming (it
  *    executes twice: once for the probe, once in the join — a
  *    nondeterministic dimension could produce a partner at runtime the
  *    probe never saw), and small by plan stats (default: the
  *    auto-broadcast threshold — the probe costs the same class of work
  *    as the broadcast build the join was going to do anyway; with the
  *    S55 log stats attached, the bound compares real cardinalities);
  *  - float/double/binary join keys decline (set membership under
  *    -0.0/NaN/array equality differs from join equality; partition
  *    keys are never usefully floats).
  *
  * Two consumer shapes are matched: `Join` with an equality conjunct on
  * the literal-slotted column (both sides may prune — a co-partitioned
  * fact-fact join shrinks to the key overlap — and multiple equality
  * pairs chain for multi-column partitioning), and the per-branch
  * `Filter(lit IN (subquery))` residue of the SQL-first spelling
  * `WHERE part IN (SELECT ...)` — pushdown distributes that filter
  * into the branches with each partition literal substituted, and
  * RewritePredicateSubquery would later build one semi-join PER BRANCH;
  * [[evalConstantInSubqueries]] instead resolves every such conjunct
  * from one pooled probe per distinct subquery (provably-false filters
  * empty the branch, provably-true conjuncts drop along with their
  * would-be runtime semi-joins).
  *
  * Each Join/Filter is probed AT MOST ONCE per optimization (a
  * TreeNodeTag marks probed nodes; tags survive makeCopy, so
  * fixed-point reruns of the operator batch skip already-probed
  * nodes), and the probe's own compilation is re-entrancy-guarded.
  * Nothing is cached across queries: a fresh query re-probes, so a
  * dimension that changed between queries can never prune against
  * stale keys.
  *
  * Per-session kill switch: `spark.graft.dpp.enabled=false`. Size
  * bound: `spark.graft.dpp.maxDimBytes` (default
  * autoBroadcastJoinThreshold). Injected through
  * [[graft.GraftExtensions]].
  */
object DynamicBranchPruning extends Rule[LogicalPlan] with PredicateHelper {

  /** Set on a Join once its prune opportunity has been probed (or
    * structurally declined after a full shape match), so fixed-point
    * reruns of the operator batch never re-execute the dimension. */
  private val PROBED = TreeNodeTag[Unit]("graft.dbp.probed")

  /** Caller hint: mark the TOPMOST Join in `df`'s analyzed plan as
    * already probed, so this rule never runs its plan-time dim probe
    * on it. For callers that KNOW the dim side always spans the fact
    * side's whole branch domain — e.g. the dedup-index band join,
    * where a batch's band rows cover all band indexes by
    * construction — the probe is a guaranteed-no-prune job per
    * compile; this skips it without touching the session-wide kill
    * switch (which would race with concurrently-compiling queries
    * that DO benefit). Only the topmost Join: joins NESTED in the
    * operands (a DV anti-join inside a DeltaLite read, say) keep
    * their normal pruning eligibility — call this directly on the
    * join you mean, before stacking further operators. */
  private[graft] def skipProbes(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    df.queryExecution.analyzed.collectFirst {
      case j: Join => j.setTagValue(PROBED, ())
    }
    df
  }

  /** Human-readable decision record for every Join the rule CONSIDERED
    * (its fact side matched the literal-branch union shape): what was
    * pruned/materialized and why, or why it declined — the
    * inspectability parity the stats surface has via EXPLAIN COST.
    * Keyed WEAKLY by the compile's QueryPlanningTracker (a plan tag
    * would not survive later rules rebuilding the Join node via plain
    * case-class copies), so records die with their QueryExecution and
    * can never mix compiles. Purely informational: never consulted by
    * the rewrite itself. Read with [[decisions]] or
    * `EXPLAIN PRUNING <sql>`. */
  private val decisionLog = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, List[(String, String)]]())

  private[plans] def recordDecisions(joinCond: String, notes: Seq[String]): Unit =
    org.apache.spark.sql.catalyst.QueryPlanningTracker.get.foreach { t =>
      val prev = Option(decisionLog.get(t)).getOrElse(Nil)
      val merged = (prev ++ notes.map(n => (joinCond, n))).distinct
      decisionLog.put(t, merged)
      // the SESSION history receives only what this call actually
      // added (fixpoint re-records dedup per compile above, so the
      // ring never sees the same compile's decision twice)
      merged.drop(prev.length).foreach { case (j, n) =>
        history.addLast((historySeq.incrementAndGet(), j, n))
      }
      while (history.size > HistoryCap) history.pollFirst()
    }

  /** Session-global RING of recent decisions across compiles (newest
    * last), feeding `SHOW PRUNING HISTORY`: EXPLAIN PRUNING answers
    * "what would this query do", the history answers "what did my
    * recent queries actually decide" — the post-hoc audit surface.
    * Bounded at [[HistoryCap]] entries (drop-oldest); entries carry a
    * monotone sequence number instead of wall time so tests and
    * replays stay deterministic. */
  private val history =
    new java.util.concurrent.ConcurrentLinkedDeque[(Long, String, String)]()
  private val historySeq = new AtomicLong(0L)
  private val HistoryCap = 256
  private[plans] def historySnapshot(): Seq[(Long, String, String)] = {
    val b = Seq.newBuilder[(Long, String, String)]
    history.descendingIterator().forEachRemaining(e => b += e)
    b.result()
  }

  /** The prune decisions recorded while `qe` optimized (forces the
    * optimization if it hasn't run): (join condition, decision) pairs.
    * Joins whose fact side never matched the union-of-literal-branches
    * shape carry no record (the rule never considered them). */
  def decisions(qe: org.apache.spark.sql.execution.QueryExecution)
      : Seq[(String, String)] = {
    qe.optimizedPlan // force the compile that writes the log
    Option(decisionLog.get(qe.tracker)).getOrElse(Nil)
  }

  /** Probe executions — exposed for tests to pin the once-per-join
    * contract. The thread-local twin isolates a test's delta from
    * concurrently-running suites (optimization runs on the calling
    * thread, so a thread's own compilations are exactly what it
    * probed). */
  private[graft] val probeCount = new AtomicLong(0L)
  private[graft] val probeCountLocal = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }
  private def countProbe(): Unit = {
    probeCount.incrementAndGet()
    probeCountLocal.set(probeCountLocal.get() + 1L)
  }

  /** Re-entrancy guard: the probe's own query compilation runs this
    * rule again on the same thread. */
  private val inProbe = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Per-COMPILE memo for the constant IN-subquery probes: keyed
    * WEAKLY by the compile's QueryPlanningTracker (the decisionLog
    * pattern) so entries die with their compile — a ThreadLocal would
    * pin the LAST compile's subquery plans and tracker per pool thread
    * for the JVM's lifetime. Entries map a canonicalized subquery plan
    * to (domain probed, partner keys, contains-null when probed);
    * values hold no tracker reference, so the weak key stays
    * collectable. */
  private val subqMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef,
      scala.collection.mutable.Map[LogicalPlan,
        (Set[Any], Set[Any], Option[Boolean])]]())

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (inProbe.get()) return plan
    if (!conf.getConfString("spark.graft.dpp.enabled", "true").toBoolean)
      return plan
    val sess = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    if (sess.isEmpty) return plan
    val materialize = conf
      .getConfString("spark.graft.dpp.materializeDim", "true").toBoolean
    plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), _)
          if j.getTagValue(PROBED).isEmpty && !j.isStreaming =>
        // both sides may prune (a co-partitioned fact-fact join): a
        // left branch pruned for lack of a right partner implies no
        // right row carried that key, so the pruned left is an
        // equivalent — and cheaper — probe target for the right side.
        // The probe also captures the dimension's matching rows (when
        // bounded): the dimension-side ELIGIBILITY for materializing
        // them is the same prune-side predicate — a dim row whose key
        // is outside the fact's literal domain matches nothing, so
        // dropping it is sound exactly where pruning that side would be
        val l = if (canPruneLeft(jt))
          tryPrune(sess.get, left, right, cond,
            wantRows = materialize && canPruneRight(jt))
          else Pruned(None, None, probed = false)
        val newLeft = l.newFact.getOrElse(left)
        // dim rows captured → the dimension subtree already executed in
        // full (dim ⋉ domain): serve the join from the materialized
        // LocalRelation instead of executing it a second time. The
        // eligibility re-check is defensive: rows must NEVER replace a
        // side that pruning could not have touched
        val matRight = l.dimRows.filter(_ =>
          materialize && canPruneRight(jt)).map { rs =>
          logInfo(s"DynamicBranchPruning: materialized right dim side " +
            s"(${rs.size} rows)")
          LocalRelation(right.output, rs)
        }
        val r = if (matRight.isEmpty && canPruneRight(jt))
          tryPrune(sess.get, right, newLeft, cond,
            wantRows = materialize && canPruneLeft(jt))
          else Pruned(None, None, probed = false)
        val matLeft = r.dimRows.filter(_ =>
          materialize && canPruneLeft(jt)).map { rs =>
          logInfo(s"DynamicBranchPruning: materialized left dim side " +
            s"(${rs.size} rows)")
          LocalRelation(left.output, rs)
        }
        val newRight = matRight.orElse(r.newFact).getOrElse(right)
        val out = if (l.newFact.isEmpty && r.newFact.isEmpty &&
            matRight.isEmpty && matLeft.isEmpty) j
          else j.copy(left = matLeft.getOrElse(newLeft), right = newRight)
        // tag only once a probe EXECUTED: a structural decline (e.g. a
        // not-yet-folded literal slot) must stay retryable in later
        // fixed-point iterations, but the dimension never runs twice
        if (l.probed || r.probed) out.setTagValue(PROBED, ())
        // decision record (informational): side-labeled notes from both
        // prune attempts plus the materialization outcome
        val notes = l.notes.map(n => s"left: $n") ++
          r.notes.map(n => s"right: $n") ++
          matRight.map(m => s"right: materialized dim from probe rows " +
            s"(${m.data.size} rows, dim scan eliminated)") ++
          matLeft.map(m => s"left: materialized dim from probe rows " +
            s"(${m.data.size} rows, dim scan eliminated)")
        if (notes.nonEmpty) recordDecisions(cond.sql, notes)
        out
    } match { case p => evalConstantInSubqueries(sess.get, p) }
  }

  /** CONSTANT IN-subquery evaluation — the shape the SQL-first spelling
    * `WHERE part IN (SELECT key FROM dim ...)` reaches this rule in:
    * predicate pushdown distributes the filter into the per-partition
    * union branches and substitutes each branch's partition LITERAL for
    * the column, leaving `Filter(lit IN (subquery), branch)` — a
    * row-independent predicate Catalyst never evaluates at plan time
    * (RewritePredicateSubquery later turns EACH branch's copy into its
    * own semi-join build). One probe per DISTINCT subquery — all
    * branches' literals pool into a single IN-bounded domain, so 3,000
    * partition branches cost one plan-time job, not 3,000 — then every
    * conjunct resolves: literal absent from the result (or NULL) means
    * the filter keeps nothing (IN yields FALSE or NULL — never TRUE) →
    * the branch becomes an empty LocalRelation and its scan never
    * exists; literal present means the conjunct is provably TRUE → it
    * drops, and the per-branch runtime semi-join evaporates with it.
    * NOT IN declines structurally (its NULL semantics need a
    * contains-null probe this pass doesn't run). Guards and probe
    * bounds are [[pruneVia]]'s; matched conjuncts always transform
    * away, so fixed-point reruns find nothing to re-probe. */
  private def evalConstantInSubqueries(spark: SparkSession,
      plan: LogicalPlan): LogicalPlan = {
    // pass 1: pool literal domains per canonicalized subquery. NOT IN
    // conjuncts join the same pool but flag a contains-null probe —
    // `v NOT IN (sub)` is TRUE only when v ∉ sub AND sub carries no
    // NULL (three-valued IN: v ∉ sub with a NULL present yields NULL,
    // which a filter drops like FALSE).
    final case class Group(l: ListQuery, dt: DataType,
      domain: scala.collection.mutable.LinkedHashSet[Any],
      var needNull: Boolean)
    val groups =
      scala.collection.mutable.LinkedHashMap[LogicalPlan, Group]()
    def eligible(l: ListQuery, dt: DataType): Boolean =
      l.outerAttrs.isEmpty && l.joinCond.isEmpty &&
        l.plan.output.length == 1 && supportedKeyType(dt)
    def admit(l: ListQuery, dt: DataType, v: Any, negated: Boolean): Unit = {
      val g = groups.getOrElseUpdate(l.plan.canonicalized,
        Group(l, dt, scala.collection.mutable.LinkedHashSet[Any](),
          needNull = false))
      if (v != null) g.domain += v
      if (negated) g.needNull = true
    }
    plan.foreach {
      case Filter(cond, _) => splitConjunctivePredicates(cond).foreach {
        case InSubquery(Seq(Literal(v, dt)), l: ListQuery)
            if eligible(l, dt) && v != null =>
          admit(l, dt, v, negated = false)
        case Not(InSubquery(Seq(Literal(v, dt)), l: ListQuery))
            if eligible(l, dt) && v != null =>
          admit(l, dt, v, negated = true)
        case _ => ()
      }
      case _ => ()
    }
    if (groups.isEmpty) return plan
    // pass 2: probe each group under the standard guards; NOT IN groups
    // add a LIMIT-1 null-existence probe on the same (small) subquery.
    // PER-COMPILE MEMO: the PROBED tag only covers the Join path —
    // here, predicate pushdown can distribute NEW Filter(lit IN (sub))
    // copies into branches on a LATER fixed-point iteration of the
    // operator batch, which would re-run the pooled probe once per
    // iteration. The memo is scoped to ONE COMPILE via the compile's
    // QueryPlanningTracker identity (every QueryExecution optimizes
    // under its own tracker object; weak-keyed so entries die with it),
    // so a dimension that changed between queries can never be resolved
    // from a stale probe; no tracker on the thread → no caching at all.
    val memo: Option[scala.collection.mutable.Map[
        LogicalPlan, (Set[Any], Set[Any], Option[Boolean])]] =
      org.apache.spark.sql.catalyst.QueryPlanningTracker.get.map { t =>
        // computeIfAbsent INSIDE the synchronized map keeps the
        // get-or-create atomic; the inner mutable.Map itself is still
        // touched by one thread only — Spark optimizes a given compile
        // (one tracker) on a single thread, and this rule never hands
        // the map across threads. If that invariant ever broke the
        // inner map would need its own lock, not just this lookup.
        subqMemo.computeIfAbsent(t, _ =>
          scala.collection.mutable.Map[
            LogicalPlan, (Set[Any], Set[Any], Option[Boolean])]())
      }
    val partners: Map[LogicalPlan, (Set[Any], Boolean)] =
      groups.iterator.flatMap { case (canon, g) =>
        val dom = g.domain.toSet
        memo.flatMap(_.get(canon)).filter { case (cDom, _, cNull) =>
          dom.subsetOf(cDom) && (!g.needNull || cNull.isDefined)
        } match {
          case Some((_, keys, cNull)) =>
            // cache hit: this compile already probed a superset domain
            Some(canon -> (keys, cNull.getOrElse(false)))
          case None =>
            probeKeys(spark, g.l.plan, g.l.plan.output.head, g.dt,
              g.domain.toSeq).map { keys =>
              val hasNullOpt = if (!g.needNull) None else Some {
                inProbe.set(true)
                try org.apache.spark.sql.graft.PlanFrame.ofRows(spark,
                  Filter(IsNull(g.l.plan.output.head), g.l.plan))
                  .queryExecution.executedPlan.executeTake(1).nonEmpty
                finally inProbe.set(false)
              }
              memo.foreach { m =>
                // merge with any narrower prior entry: keys are exact
                // within their probed domain, so unions stay exact
                val merged = m.get(canon) match {
                  case Some((cDom, cKeys, cNull)) =>
                    (cDom ++ dom, cKeys ++ keys, hasNullOpt.orElse(cNull))
                  case None => (dom, keys, hasNullOpt)
                }
                m.update(canon, merged)
              }
              canon -> (keys, hasNullOpt.getOrElse(false))
            }
        }
      }.toMap
    if (partners.isEmpty) return plan
    // pass 3: resolve every matched conjunct
    var droppedTotal = 0
    var emptiedTotal = 0
    val rewritten = plan.transformUp {
      case f @ Filter(cond, child) =>
        val conj = splitConjunctivePredicates(cond)
        var emptied = false
        def resolve(truthy: Boolean): Boolean =
          if (truthy) false // provably TRUE — drop the conjunct
          else { emptied = true; true } // FALSE/NULL — keeps no rows
        // eligible() re-checked here (not just in pass 1): canonical
        // PLAN equality says nothing about the ListQuery wrapper — a
        // structurally different wrapper (correlated outerAttrs, a
        // joinCond, multi-column output) sharing a canonicalized plan
        // must never be resolved from another conjunct's probe
        val kept = conj.filter {
          case InSubquery(Seq(Literal(v, dt)), l: ListQuery)
              if eligible(l, dt) && partners.contains(l.plan.canonicalized) =>
            resolve(v != null && partners(l.plan.canonicalized)._1.contains(v))
          // v != null required: `NULL NOT IN (sub)` is TRUE when sub is
          // EMPTY but NULL otherwise, and the domain-restricted probe
          // cannot tell an empty sub from a disjoint one — decline
          case Not(InSubquery(Seq(Literal(v, dt)), l: ListQuery))
              if v != null && eligible(l, dt) &&
                partners.contains(l.plan.canonicalized) =>
            val (keys, hasNull) = partners(l.plan.canonicalized)
            resolve(!keys.contains(v) && !hasNull)
          case _ => true
        }
        if (kept.length != conj.length || emptied)
          logInfo(s"DynamicBranchPruning: constant IN-subquery conjuncts " +
            s"resolved — ${conj.length - kept.length} dropped as TRUE" +
            (if (emptied) ", branch emptied" else ""))
        if (emptied) emptiedTotal += 1
        droppedTotal += conj.length - kept.length
        if (emptied) LocalRelation(f.output, Nil)
        else if (kept.length == conj.length) f
        else kept.reduceOption(And).map(Filter(_, child)).getOrElse(child)
    }
    // the Filter-shape decision record (the Join shape records inside
    // apply): one summary per compile pass, same EXPLAIN PRUNING surface
    if (droppedTotal > 0 || emptiedTotal > 0)
      recordDecisions("<literal> IN (subquery)", Seq(
        s"constant IN-subquery resolution: $droppedTotal conjunct(s) " +
          s"provably TRUE dropped, $emptiedTotal branch(es) emptied " +
          s"(${groups.size} pooled probe group(s))"))
    rewritten
  }

  /** Spark's DPP side-eligibility (pruning removes only rows that match
    * nothing, so the REMOVED side must act only through matches), plus
    * LeftAnti's right side for the same reason. */
  private def canPruneLeft(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | RightOuter => true
    case _ => false
  }
  private def canPruneRight(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | LeftAnti => true
    case _ => false
  }

  /** Key types whose internal values compare consistently between join
    * equality and Set membership. */
  private def supportedKeyType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        StringType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Per-join prune outcome.
    * @param newFact  replacement fact side, when ≥1 branch pruned
    * @param dimRows  the dimension's full matching rows, when the probe
    *   captured them un-truncated (the caller may materialize the dim
    *   side from them — see [[probeFull]])
    * @param probed   whether a probe EXECUTED (drives the once-only tag)
    * @param notes    decision record lines for the [[DECISION]] tag —
    *   only emitted once the fact side matched the union shape (a
    *   considered candidate), so ordinary joins stay record-free */
  private final case class Pruned(newFact: Option[LogicalPlan],
      dimRows: Option[Seq[org.apache.spark.sql.catalyst.InternalRow]],
      probed: Boolean, notes: Seq[String] = Nil)

  /** Attempt to prune `fact` (a Union of literal-keyed branches) against
    * `dim` through the equality conjuncts of `cond`. */
  private def tryPrune(spark: SparkSession, fact: LogicalPlan,
      dim: LogicalPlan, cond: Expression, wantRows: Boolean): Pruned = {
    val pairs = splitConjunctivePredicates(cond).collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if fact.outputSet.contains(a) && dim.outputSet.contains(b) =>
        (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if fact.outputSet.contains(b) && dim.outputSet.contains(a) =>
        (b, a)
    }
    // chain across pairs: a multi-column-partitioned fact (several
    // literal-slotted keys in the condition) prunes through each key in
    // turn — the survivor union of one pass is the probe target of the
    // next. Dim rows are only captured in the single-pair case: rows
    // filtered by one key's domain are NOT `dim ⋉ (all keys)`.
    var probed = false
    var cur = fact
    var changed = false
    var rows: Option[Seq[org.apache.spark.sql.catalyst.InternalRow]] = None
    val notes = Seq.newBuilder[String]
    pairs.foreach { case (factKey, dimKey) =>
      val res = pruneVia(spark, cur, dim, factKey, dimKey,
        wantRows && pairs.size == 1)
      probed ||= res.probed
      rows = rows.orElse(res.dimRows)
      notes ++= res.notes
      res.newFact.foreach { nf => cur = nf; changed = true }
    }
    Pruned(if (changed) Some(cur) else None, rows, probed, notes.result())
  }

  private def pruneVia(spark: SparkSession, fact: LogicalPlan,
      dim: LogicalPlan, factKey: AttributeReference,
      dimKey: Attribute, wantRows: Boolean = false): Pruned = {
    val decline = Pruned(None, None, probed = false)
    def declined(reason: String) =
      Pruned(None, None, probed = false,
        notes = Seq(s"declined (key '${factKey.name}'): $reason"))
    val u = fact match {
      case u: Union => u
      case _ => return decline // not a candidate shape — no record
    }
    val idx = u.output.indexWhere(_.exprId == factKey.exprId)
    if (idx < 0) return decline
    if (!supportedKeyType(factKey.dataType))
      return declined(s"key type ${factKey.dataType.simpleString} has no " +
        "consistent set membership (float/binary keys decline)")
    // every non-empty branch must carry a literal in the key slot;
    // already-empty branches (prior static pruning) pass through
    sealed trait Slot
    case object EmptyBranch extends Slot
    final case class Lit(v: Any) extends Slot
    val slots: Seq[Option[Slot]] = u.children.map {
      case l: LocalRelation if l.data.isEmpty => Some(EmptyBranch)
      case Project(pl, _) if pl.length > idx =>
        pl(idx) match {
          case Alias(Literal(v, _), _) => Some(Lit(v))
          case _ => None
        }
      case _ => None
    }
    if (slots.exists(_.isEmpty)) return decline // may fold later — retryable, no record
    val live = slots.flatten.collect { case Lit(v) => v }
    if (live.size < 2)
      return declined("fewer than 2 live branches — nothing worth a probe")
    val domain = live.filter(_ != null).distinct
    val (partners, dimRows) =
      probeFull(spark, dim, dimKey, factKey.dataType, domain,
        wantRows) match {
        case scala.Right((keys, rows)) => (keys, rows)
        case scala.Left(reason) => return declined(reason)
      }
    // a NULL branch literal never equals anything; a live literal
    // without a probe partner matches nothing
    def keep(s: Slot): Boolean = s match {
      case EmptyBranch => true // nothing to remove
      case Lit(null) => false
      case Lit(v) => partners.contains(v)
    }
    val prunedN = slots.flatten.count(s => !keep(s) && s != EmptyBranch)
    if (prunedN == 0)
      return Pruned(None, dimRows, probed = true, notes = Seq(
        s"no branches pruned (key '${factKey.name}': all ${domain.size} " +
          "branch literals have dimension partners)"))
    val newChildren = u.children.zip(slots.flatten).map { case (c, s) =>
      if (keep(s)) c else LocalRelation(c.output, Nil)
    }
    // observability: a silent plan rewrite at warehouse scale must be
    // auditable from the driver log
    val note = s"pruned $prunedN of ${u.children.size} branches — key " +
      s"'${factKey.name}', domain ${domain.size}, partners ${partners.size}"
    logInfo(s"DynamicBranchPruning: $note")
    Pruned(Some(u.copy(children = newChildren)), dimRows, probed = true,
      notes = Seq(note))
  }

  /** Shared probe: the dimension's distinct keys WITHIN `domain` — at
    * most one result row per domain value regardless of dimension size.
    * None = a guard declined and NO job ran; Some(keys) = the probe
    * executed (an empty domain resolves without a job). Guards:
    * domain within `spark.graft.dpp.maxBranches` (1024), dimension
    * deterministic + non-streaming + within
    * `spark.graft.dpp.maxDimBytes` by plan stats (default
    * autoBroadcastJoinThreshold — probe work is broadcast-build-class). */
  private def probeKeys(spark: SparkSession, dim: LogicalPlan,
      dimKey: Attribute, dt: DataType, domain: Seq[Any]): Option[Set[Any]] =
    probeFull(spark, dim, dimKey, dt, domain, wantRows = false)
      .toOption.map(_._1)

  /** Like [[probeKeys]], but with `wantRows = true` the probe collects
    * the dimension's FULL matching rows (`dim WHERE key IN domain`)
    * instead of just distinct keys, bounded by
    * `spark.graft.dpp.maxDimRows` (65536): the rows are the join's
    * build side MATERIALIZED — [[apply]] swaps them in as a
    * LocalRelation so the dimension subtree executes ONCE (the probe)
    * instead of twice (probe + runtime build). If the row cap
    * truncates, the full key set is completed by the distinct-keys
    * probe and no rows are returned (pruning still proceeds). */
  private def probeFull(spark: SparkSession, dim: LogicalPlan,
      dimKey: Attribute, dt: DataType, domain: Seq[Any],
      wantRows: Boolean):
      Either[String,
        (Set[Any], Option[Seq[org.apache.spark.sql.catalyst.InternalRow]])] = {
    val maxBranches = conf
      .getConfString("spark.graft.dpp.maxBranches", "1024").toInt
    if (domain.size > maxBranches)
      return scala.Left(s"domain ${domain.size} exceeds " +
        s"spark.graft.dpp.maxBranches $maxBranches")
    if (dim.isStreaming) return scala.Left("dimension side is streaming")
    if (dim.exists(p => p.expressions.exists(e =>
        e.exists(!_.deterministic))))
      return scala.Left("dimension side is nondeterministic — the runtime " +
        "build could match keys the probe never saw")
    // ORDER-DEPENDENT operators make the dimension's row SET
    // run-dependent even when every expression is deterministic: an
    // unordered LIMIT/OFFSET/SAMPLE/TAIL can return different rows at
    // the plan-time probe than at the runtime join build, so a branch
    // could be pruned whose key the runtime build side actually
    // contains. Sound only if the probe's rows REPLACE the dim side —
    // but that guarantee threads through too many fallbacks
    // (materializeDim=false, row-cap truncation, multi-key chaining),
    // so decline the probe outright: decline-only discipline.
    if (dim.exists {
      case _: GlobalLimit | _: LocalLimit | _: Offset | _: Sample |
           _: Tail => true
      case _ => false
    }) return scala.Left("dimension side contains an order-dependent operator " +
      "(LIMIT/OFFSET/SAMPLE/TAIL) — its row set can differ between probe " +
      "and runtime build")
    val maxBytes = conf.getConfString("spark.graft.dpp.maxDimBytes",
      conf.autoBroadcastJoinThreshold.toString).toLong
    if (maxBytes >= 0 && dim.stats.sizeInBytes > BigInt(maxBytes))
      return scala.Left(s"dimension estimated ${dim.stats.sizeInBytes} bytes " +
        s"exceeds spark.graft.dpp.maxDimBytes $maxBytes — probe work " +
        "must stay broadcast-build-class")
    // rows only when the caller ASKED for them: an unconditional
    // Some(Nil) here would let apply() materialize a PRESERVED (non
    // prune-eligible) join side as an empty relation — e.g. a RIGHT
    // OUTER join probing its left side with wantRows=false — silently
    // dropping every preserved row
    if (domain.isEmpty)
      return scala.Right((Set.empty, if (wantRows) Some(Nil) else None))
    val lits = domain.map(v => Literal(v, dt))
    val keyOrd = dim.output.indexWhere(_.exprId == dimKey.exprId)
    inProbe.set(true)
    try {
      if (wantRows && keyOrd >= 0) {
        val cap = conf.getConfString("spark.graft.dpp.maxDimRows",
          "65536").toInt
        countProbe()
        val rows = org.apache.spark.sql.graft.PlanFrame.ofRows(spark,
          Filter(In(dimKey, lits), dim))
          .queryExecution.executedPlan.executeTake(cap + 1)
        if (rows.length <= cap)
          // un-truncated: the rows ARE dim ⋉ domain, and their key
          // column is the complete partner set
          return scala.Right((rows.map(_.get(keyOrd, dt)).toSet,
            Some(rows.toSeq)))
        // fall through: too many rows to materialize — complete the
        // key set with the cheap distinct probe below
      }
      countProbe()
      val probe = Distinct(Project(Seq(dimKey),
        Filter(In(dimKey, lits), dim)))
      scala.Right((org.apache.spark.sql.graft.PlanFrame.ofRows(spark, probe)
        .queryExecution.executedPlan.executeCollect()
        .map(_.get(0, dt)).toSet, None))
    } finally inProbe.set(false)
  }
}

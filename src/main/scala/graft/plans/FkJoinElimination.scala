package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** FOREIGN-KEY JOIN ELIMINATION — the RELY-constraint rewrite every
  * serious warehouse optimizer ships (Oracle/Snowflake "join
  * elimination", Databricks RELY FKs): an INNER equi-join from a fact's
  * foreign key to a dimension's primary key is DROPPED ENTIRELY when
  * the query consumes nothing from the dimension but the join key
  * itself. Star-schema marts hit this constantly — a semantic layer
  * that always emits `fact JOIN dim` templates, a BI tool projecting
  * only fact measures — and at 100 TB the eliminated operator is a
  * full dimension scan PLUS a fact-sized shuffle or broadcast probe:
  * the cheapest join is the one that never runs.
  *
  * Soundness model (every condition checked structurally; ANY miss
  * falls through to the original — the rule can only decline, never
  * corrupt). An inner PK-FK join is a no-op on the fact rows iff
  *  1. every non-null FK value has EXACTLY ONE partner: key containment
  *     (FK ⊆ PK) and PK uniqueness — both VERIFIED against the data at
  *     [[register]] time (one anti-join + one duplicate probe), then
  *     PINNED to that snapshot's live-file set. The FACT side may read
  *     any SUBSET of those files (every row of every registered file
  *     passed the containment check, so partition/stats-pruned scans,
  *     per-partition union branches, and time-travel reads whose files
  *     all survive into the registered snapshot carry only verified FK
  *     values); a scan touching any file OUTSIDE the set (a version
  *     with since-removed files, a different table nested under the
  *     registered dir) structurally declines. The DIMENSION side must
  *     read EXACTLY the registered set — a partial dimension could be
  *     missing keys. Any commit to EITHER table disarms until
  *     re-registration (the MvRewrite freshness discipline — trust is
  *     re-earned, never assumed);
  *  2. the dimension side is a COMPLETE bare scan of the registered
  *     parent table — a single relation or the partitioned-table union
  *     of per-partition branches with disjoint file sets covering the
  *     registered snapshot (row-preserving Projects allowed, filters
  *     NOT — a filtered dimension can drop keys and must keep joining);
  *  3. the join condition is exactly `fk = pk` with the FK attribute
  *     flowing UNCHANGED (same exprId) from a scan of the registered
  *     child table, so renames can't alias the guarantee;
  *  4. above the join, nothing from the dimension is referenced except
  *     possibly the PK — which rewrites to the FK (aliased under the
  *     PK's name AND exprId, so parents keep resolving).
  * The rewrite preserves inner-join row semantics by filtering
  * `fk IS NOT NULL` (an inner join drops null-FK facts); when the FK
  * column carries a NOT NULL constraint Spark folds the filter away.
  *
  * LEFT OUTER joins eliminate under the SAME verified relationship with
  * NO filter at all: every fact row survives a left join regardless of
  * match, and the PK output — NULL exactly when the FK is NULL (a null
  * FK never matches), the FK's value otherwise (containment) — IS the
  * FK column verbatim. This is the shape auto-generated BI/semantic
  * SQL emits most (`fact LEFT JOIN dim` templates projecting only fact
  * measures).
  *
  * Two consumer shapes are matched: `Project(Join)` (what Catalyst's
  * column pruning leaves when the dimension has unreferenced columns)
  * and `Aggregate(Join)` — the auto-generated BI shape
  * (`SELECT sum(m) FROM fact JOIN dim ON fk=pk GROUP BY fk`). The
  * Aggregate sits DIRECTLY on the Join whenever it references every
  * join output column (a key-only dimension), so pruning never
  * interposes the Project the first shape relies on.
  *
  * Registered per (session, child table, fk column) via [[register]] —
  * the registry is SESSION-SCOPED (a `newSession()` or any other
  * session in the JVM sees no FKs it did not register, so the
  * per-session `spark.graft.fk.joinElim=false` kill switch governs
  * exactly the sessions the registration does), with weak session keys
  * so discarded sessions' registrations die with them. Injected through
  * [[graft.GraftExtensions]].
  */
object FkJoinElimination extends Rule[LogicalPlan] {

  /** One verified FK relationship.
    * @param childPath  fact table dir (DeltaLite path)
    * @param fkCol      fact column holding the foreign key
    * @param parentPath dimension table dir
    * @param parentKey  dimension primary-key column
    * @param name       constraint name (DDL-declared or synthesized)
    * @param childVersion / parentVersion versions the verification ran
    *   against — the freshness guard
    * @param childFiles / parentFiles the live data-file sets of those
    *   versions — the scan-identity pin: a fact scan must read a SUBSET
    *   of childFiles (all verified rows), a dimension scan EXACTLY
    *   parentFiles, so a different table that happens to nest under the
    *   registered path can never borrow the verification */
  final case class FkDef(childPath: String, fkCol: String,
      parentPath: String, parentKey: String, name: String,
      childVersion: Long, parentVersion: Long,
      childFiles: Set[String], parentFiles: Set[String])

  /** session → (normalized child path, fk col) → FkDef. Weak session
    * keys: a discarded session's registrations die with it. */
  private val registry: java.util.Map[SparkSession, ConcurrentHashMap[(String, String), FkDef]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[(String, String), FkDef]]())

  private def norm(p: String): String =
    java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString

  /** Absolute paths of a version's live data files — the snapshot
    * identity the rewrite pins scans against. */
  private def liveFiles(path: String, version: Long): Set[String] = {
    val snap = graft.sources.DeltaLite.snapshot(path, Some(version))
    val r = java.nio.file.Paths.get(path).toAbsolutePath.normalize
    snap.files.map(f => norm(r.resolve(f.path).toString)).toSet
  }

  /** Verify the relationship AGAINST THE DATA, then arm the rewrite:
    *  - PK uniqueness: no parent key value occurs twice;
    *  - containment: every non-null child FK value exists in the
    *    parent (dbt's `relationships` test, run as one anti-join).
    * Both checks are column-pruned scans (two columns total read at any
    * table width). Throws on violation — an unverified FK never arms. */
  def register(spark: SparkSession, childPath: String, fkCol: String,
      parentPath: String, parentKey: String,
      name: String = ""): Unit = {
    import org.apache.spark.sql.functions._
    val D = graft.sources.DeltaLite
    val cv = D.latestVersion(childPath).getOrElse(throw
      new IllegalArgumentException(s"child table does not exist: $childPath"))
    val pv = D.latestVersion(parentPath).getOrElse(throw
      new IllegalArgumentException(s"parent table does not exist: $parentPath"))
    val parent = D.read(spark, parentPath).select(col(parentKey))
    val dup = parent.groupBy(col(parentKey)).count()
      .filter(col("count") > 1L).limit(1).count()
    require(dup == 0L,
      s"FK registration rejected: $parentPath.$parentKey is not unique")
    val orphans = D.read(spark, childPath).select(col(fkCol))
      .filter(col(fkCol).isNotNull)
      .join(parent, col(fkCol) === col(parentKey), "left_anti")
      .limit(1).count()
    require(orphans == 0L,
      s"FK registration rejected: $childPath.$fkCol has values absent " +
        s"from $parentPath.$parentKey")
    val cname = if (name.nonEmpty) name else s"fk_${fkCol}"
    sessionDefs(spark).put((norm(childPath), fkCol),
      FkDef(childPath, fkCol, parentPath, parentKey, cname, cv, pv,
        liveFiles(childPath, cv), liveFiles(parentPath, pv)))
  }

  private def sessionDefs(
      spark: SparkSession): ConcurrentHashMap[(String, String), FkDef] =
    registry.computeIfAbsent(spark,
      _ => new ConcurrentHashMap[(String, String), FkDef]())

  def deregister(spark: SparkSession, childPath: String,
      fkCol: String): Unit =
    sessionDefs(spark).remove((norm(childPath), fkCol))

  /** DROP by the name the constraint was DECLARED under — a drop naming
    * an unknown constraint is an error, never a silent no-op. */
  def deregisterByName(spark: SparkSession, childPath: String,
      name: String): Unit = {
    val defs = sessionDefs(spark)
    val child = norm(childPath)
    val key = defs.entrySet().asScalaSeq
      .find(e => e.getKey._1 == child && e.getValue.name == name)
      .map(_.getKey)
      .getOrElse(throw new IllegalArgumentException(
        s"no FOREIGN KEY constraint named '$name' on $childPath"))
    defs.remove(key)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val sess = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    if (sess.isEmpty) return plan
    val defs = registry.get(sess.get)
    if (defs == null || defs.isEmpty ||
      !conf.getConfString("spark.graft.fk.joinElim", "true").toBoolean)
      return plan
    val fks = defs.values.asScalaSeq
    plan.transformUp {
      case p @ Project(projList, j: Join) =>
        tryJoin(fks, j, projList).map { case (newChild, key, fk) =>
          Project(projList.map(rewriteNamed(key, fk)), newChild)
        }.getOrElse(p)
      case a @ Aggregate(groupExprs, aggExprs, j: Join, _) =>
        tryJoin(fks, j, groupExprs ++ aggExprs).map {
          case (newChild, key, fk) =>
            a.copy(
              groupingExpressions = groupExprs.map(rewriteExpr(key, fk)),
              aggregateExpressions = aggExprs.map(rewriteNamed(key, fk)),
              child = newChild)
        }.getOrElse(a)
    }
  }

  /** Both fact/dimension role assignments against `consumed` — the
    * expressions the single consumer above the join evaluates. */
  private def tryJoin(fks: Seq[FkDef], j: Join,
      consumed: Seq[Expression]): Option[(LogicalPlan, Attribute, Attribute)] =
    j match {
      case Join(left, right, jt @ (Inner | LeftOuter), Some(cond), _) =>
        // for LeftOuter only the LEFT side can be the fact; Inner is
        // symmetric
        eliminate(fks, consumed, left, right, cond, jt)
          .orElse(if (jt == Inner)
            eliminate(fks, consumed, right, left, cond, jt) else None)
      case _ => None
    }

  /** PK references rewrite to the FK, keeping the PK's name and exprId
    * so everything above keeps resolving. */
  private def rewriteNamed(key: Attribute, fk: Attribute)(
      ne: NamedExpression): NamedExpression = ne match {
    case a: AttributeReference if a.exprId == key.exprId =>
      Alias(fk, a.name)(exprId = a.exprId)
    case other => other.transform {
      case a: AttributeReference if a.exprId == key.exprId => fk
    }.asInstanceOf[NamedExpression]
  }

  private def rewriteExpr(key: Attribute, fk: Attribute)(
      e: Expression): Expression = e.transform {
    case a: AttributeReference if a.exprId == key.exprId => fk
  }

  /** Attempt elimination with `childSide` as the fact and `parentSide`
    * as the dimension. Returns the replacement child plan plus the
    * (pk attr, fk attr) rewrite pair. */
  private def eliminate(fks: Seq[FkDef], consumed: Seq[Expression],
      childSide: LogicalPlan, parentSide: LogicalPlan,
      cond: Expression, joinType: JoinType):
      Option[(LogicalPlan, Attribute, Attribute)] = {
    for {
      // single-equality condition between one attr of each side
      (fkAttr, keyAttr) <- (cond match {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          if (childSide.outputSet.contains(a) &&
            parentSide.outputSet.contains(b)) Some((a, b))
          else if (childSide.outputSet.contains(b) &&
            parentSide.outputSet.contains(a)) Some((b, a))
          else None
        case _ => None
      })
      // FK VALUE provenance: every value the attr can carry must come
      // from a data file of the registered child snapshot — a SUBSET of
      // the registered live set suffices (partition/stats-pruned scans,
      // one branch of a partitioned table's per-group union, a
      // time-travel read whose files all survive into the registered
      // snapshot): every row of every registered live file was seen by
      // the containment check, so any subset carries only verified FK
      // values. Unions descend POSITIONALLY — Union keeps its first
      // child's exprIds while merging other branches' VALUES, so each
      // branch's column at the FK position must itself ground out at
      // registered files.
      fk <- fks.find { d =>
        d.fkCol == fkAttr.name &&
          fkProvenance(childSide, fkAttr.exprId, d.fkCol, d.childFiles)
      }
      // the dimension side must be a COMPLETE bare scan of the
      // registered parent AT the registered version, producing the key
      // attr (no filters — they could drop keys; partitioned parents
      // read as a union of per-partition branches whose DISJOINT file
      // sets together equal the registered live set)
      _ <- Some(()).filter(_ =>
        completeParentScan(parentSide, keyAttr.exprId, fk.parentKey,
          fk.parentFiles))
      // freshness guard: any commit to either table disarms (belt over
      // the file-set pin's suspenders — also covers commits that leave
      // data files untouched, keeping the documented "any commit
      // disarms until re-registration" contract exact)
      _ <- Some(()).filter(_ => graft.sources.DeltaLite
        .latestVersion(fk.childPath).contains(fk.childVersion) &&
        graft.sources.DeltaLite
          .latestVersion(fk.parentPath).contains(fk.parentVersion))
      // nothing from the dimension referenced above except the key —
      // compared by exprId, never by Attribute equality: a left-outer
      // Join wraps right-side attrs with withNullability(true), and a
      // nullability-sensitive set intersect would MISS such a
      // reference and eliminate a join the projection still needs
      _ <- Some(()).filter { _ =>
        val parentIds = parentSide.outputSet.map(_.exprId).toSet
        consumed.flatMap(_.references)
          .filter(a => parentIds.contains(a.exprId))
          .forall(_.exprId == keyAttr.exprId)
      }
    } yield {
      // inner-join semantics: null-FK facts never matched — keep them
      // out; a LEFT join keeps every fact row, so no filter at all
      val newChild: LogicalPlan =
        if (joinType == Inner) Filter(IsNotNull(fkAttr), childSide)
        else childSide
      (newChild, keyAttr, fkAttr)
    }
  }

  /** The exact file set a file-source scan reads, normalized — the
    * identity compared against a registered snapshot's live files.
    * Metadata only (the paths are already in the relation); NO
    * filesystem access on the planning path. */
  private def scanFiles(lr: LogicalRelation): Option[Set[String]] =
    lr.relation match {
      case hfs: HadoopFsRelation =>
        val roots = hfs.location.rootPaths.map(p => norm(p.toUri.getPath))
        if (roots.nonEmpty) Some(roots.toSet) else None
      case _ => None
    }

  /** FK value provenance: true iff every value `id` can carry at this
    * point flows from a data file of the registered child snapshot.
    * exprIds are globally unique and Catalyst never rebinds an existing
    * exprId to a computed value, so following the exprId down to a
    * LogicalRelation proves the column arrived unchanged — with two
    * positional exceptions, handled explicitly: Union (keeps its first
    * child's exprIds while merging other branches' VALUES) and Expand
    * (its projections may place any expression under an output slot).
    * The leaf may read any SUBSET of the registered live set — every
    * row of every registered file passed the containment check, so a
    * pruned scan, a partition-branch scan, or a time-travel read whose
    * live files all survive into the registered snapshot carries only
    * verified values; files OUTSIDE the set (a version with since-
    * removed files, a different table) decline. */
  private def fkProvenance(plan: LogicalPlan, id: ExprId, fkCol: String,
      reg: Set[String]): Boolean = plan match {
    case u: Union if u.output.exists(_.exprId == id) =>
      val idx = u.output.indexWhere(_.exprId == id)
      u.children.forall(c => c.output.length > idx &&
        fkProvenance(c, c.output(idx).exprId, fkCol, reg))
    case e: Expand if e.output.exists(_.exprId == id) =>
      val idx = e.output.indexWhere(_.exprId == id)
      e.projections.forall(_.apply(idx) match {
        case a: AttributeReference =>
          fkProvenance(e.child, a.exprId, fkCol, reg)
        case _ => false
      })
    // a Project may re-alias the column under a new exprId (what
    // DeduplicateRelations does to union branches): follow the bare
    // attribute under the Alias — the LEAF name check below still pins
    // the grounded column to the registered fk, so a rename can never
    // smuggle a different column's values in under the fk's name
    case Project(pl, child) if pl.exists(_.exprId == id) =>
      pl.find(_.exprId == id).get match {
        case a: AttributeReference => fkProvenance(child, id, fkCol, reg)
        case Alias(a: AttributeReference, _) =>
          fkProvenance(child, a.exprId, fkCol, reg)
        case _ => false
      }
    case lr: LogicalRelation
        if lr.output.exists(o => o.exprId == id && o.name == fkCol) =>
      scanFiles(lr).exists(fs => fs.nonEmpty && fs.subsetOf(reg))
    // an EMPTY LocalRelation contributes no rows, hence no values — this
    // is what PruneFilters leaves in place of a partition-pruned union
    // branch during the operator batch (the branch only collapses away
    // in the later LocalRelation batch, after this rule's last chance)
    case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        if l.data.isEmpty =>
      true
    case p =>
      val carrying = p.children.filter(_.output.exists(_.exprId == id))
      carrying.nonEmpty &&
        carrying.forall(c => fkProvenance(c, id, fkCol, reg))
  }

  /** The dimension as a COMPLETE, row-faithful scan of the registered
    * parent snapshot: the key column (named `key`) must flow as a bare
    * attribute from LogicalRelation leaves whose file sets are pairwise
    * DISJOINT and together EQUAL the registered live set — a single
    * relation (the unpartitioned shape) or a Union of per-partition
    * branches (what [[graft.sources.DeltaLite]] builds for Hive-layout
    * tables). Projects are row-preserving and allowed (only the key slot
    * must be a bare attribute — attached partition-value literals in
    * OTHER slots are fine); Filters and anything else disqualify — they
    * could drop keys and break containment. Overlapping branches would
    * duplicate keys (breaking PK uniqueness in the joined-as shape), so
    * disjointness is required, not just coverage. */
  private def completeParentScan(plan: LogicalPlan, keyId: ExprId,
      key: String, reg: Set[String]): Boolean = {
    def walk(p: LogicalPlan, id: ExprId): Option[Seq[Set[String]]] =
      p match {
        case u: Union if u.output.exists(_.exprId == id) =>
          val idx = u.output.indexWhere(_.exprId == id)
          val parts = u.children.map(c =>
            if (c.output.length > idx) walk(c, c.output(idx).exprId)
            else None)
          if (parts.forall(_.isDefined)) Some(parts.flatMap(_.get))
          else None
        case Project(pl, child) =>
          pl.find(_.exprId == id) match {
            case Some(a: AttributeReference) => walk(child, a.exprId)
            // re-aliased key (union-branch deduplication): follow the
            // bare attribute — the leaf name check still applies
            case Some(Alias(a: AttributeReference, _)) =>
              walk(child, a.exprId)
            case _ => None
          }
        // IsNotNull on the traced key is the one row-dropping predicate
        // that cannot break containment: a NULL key never equals any FK
        // (equi-join null semantics), so dropping null-key rows never
        // removes a matching partner. Catalyst infers and pushes exactly
        // this filter from the join condition.
        case Filter(IsNotNull(a: AttributeReference), child)
            if a.exprId == id =>
          walk(child, id)
        case lr: LogicalRelation
            if lr.output.exists(o => o.exprId == id && o.name == key) =>
          scanFiles(lr).map(Seq(_))
        case _ => None
      }
    walk(plan, keyId).exists { sets =>
      sets.map(_.size).sum == reg.size &&
        sets.foldLeft(Set.empty[String])(_ ++ _) == reg
    }
  }

  private implicit class JCol[T](val c: java.util.Collection[T]) {
    def asScalaSeq: Seq[T] =
      scala.jdk.CollectionConverters.CollectionHasAsScala(c).asScala.toSeq
  }
}

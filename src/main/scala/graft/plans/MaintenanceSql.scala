package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._
import graft.sources.DeltaLite

/** Maintenance SQL for DeltaLite tables (the Delta-style statements every
  * table operator runs), injected via `SparkSessionExtensions
  * .injectParser` — graft-specific statements parse here, EVERYTHING else
  * delegates to Spark's own parser untouched:
  *
  *   DESCRIBE HISTORY '<path>' [LIMIT n]
  *   DESCRIBE DETAIL '<path>'
  *   VACUUM '<path>' [RETAIN n VERSIONS] [DRY RUN]
  *   VACUUM '<path>' LOGS [RETAIN n VERSIONS] [DRY RUN]
  *   VACUUM '<path>' USING INVENTORY (<sql>) [RETAIN n VERSIONS] [DRY RUN]
  *   OPTIMIZE '<path>' [MIN ROWS n] [WHERE <partCol> = '<value>']
  *   OPTIMIZE '<path>' [WHERE <partCol> = '<value>'] ZORDER BY (a, b)
  *   RESTORE '<path>' TO VERSION AS OF n
  *   RESTORE '<path>' TO TIMESTAMP AS OF '<instant>'
  *   CLONE '<src>' [VERSION AS OF n] TO '<dst>' [DEEP]
  *   CONVERT TO DELTA '<path>'
  *   CONVERT FROM DELTA '<path>' [VERSION AS OF n]
  *   REORG '<path>' APPLY (PURGE)
  *   ALTER '<path>' RENAME COLUMN old TO new
  *   ALTER '<path>' ADD COLUMN name <type>
  *   ALTER '<path>' DROP COLUMN name
  *   SHOW TBLPROPERTIES '<path>'
  *   ALTER '<path>' ALTER COLUMN name SET DEFAULT expr
  *   ALTER '<path>' ALTER COLUMN name DROP DEFAULT
  *   ALTER '<path>' ALTER COLUMN name TYPE <widerType>
  *   ALTER '<path>' SET TBLPROPERTIES ('k' = 'v', ...)
  *   ALTER '<path>' UNSET TBLPROPERTIES ('k')
  *   ALTER '<path>' ADD CONSTRAINT name CHECK (expr)
  *   ALTER '<path>' ADD CONSTRAINT name FOREIGN KEY (fk)
  *     REFERENCES '<path>' (key) RELY
  *   ALTER '<path>' DROP FOREIGN KEY (fk)
  *   ALTER '<path>' DROP CONSTRAINT name
  *   EXPLAIN COST '<path>'
  *   EXPLAIN PRUNING <query>
  *   SHOW PRUNING HISTORY [LIMIT n]
  *   DELETE FROM '<path>' WHERE <cond>
  *   UPDATE '<path>' SET a = e1[, b = e2 ...] WHERE <cond>
  *   INSERT INTO '<path>' <select>
  *   MERGE INTO '<path>' USING (<select>) ON (k[, ...])
  *     [WHEN MATCHED THEN UPDATE ALL | DELETE]
  *     [WHEN NOT MATCHED THEN INSERT ALL]
  *     [WHEN NOT MATCHED BY SOURCE THEN DELETE]
  *
  * Table paths are quoted string literals (a DeltaLite table is a
  * directory, not a catalog entry). Each statement is a
  * [[LeafRunnableCommand]]: driver-side log metadata work (plus the
  * rewrite jobs OPTIMIZE itself launches), rows back through the normal
  * command execution path, so results compose with `spark.sql(...)`
  * like any query. */
object MaintenanceSql {

  final case class DescribeHistoryCommand(path: String, limit: Option[Int])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("operation", StringType, nullable = false)(),
      AttributeReference("timestamp", TimestampType, nullable = false)(),
      AttributeReference("num_added_files", IntegerType, nullable = false)(),
      AttributeReference("num_removed_files", IntegerType, nullable = false)(),
      AttributeReference("rows_added", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      // STANDARD-DELTA DISPATCH (the read path's twin): DESCRIBE
      // HISTORY over a real _delta_log serves from the interop log walk
      if (DeltaLite.latestVersion(path).isEmpty &&
          graft.sources.DeltaInterop.isStandardDelta(path))
        return graft.sources.DeltaInterop.historyRows(path)
          .sortBy(-_._1)
          .map { case (v, op, ts, na, nr, rows) =>
            Row(v, op, new java.sql.Timestamp(ts), na, nr, rows) }
          .take(limit.getOrElse(Int.MaxValue))
      DeltaLite.history(spark, path, limit).collect().toSeq
    }
  }

  final case class DescribeDetailCommand(path: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("num_rows", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("num_files", IntegerType, nullable = false)(),
      AttributeReference("num_owned_files", IntegerType, nullable = false)(),
      AttributeReference("num_referenced_files", IntegerType, nullable = false)(),
      AttributeReference("partition_columns", StringType, nullable = false)(),
      AttributeReference("num_constraints", IntegerType, nullable = false)(),
      AttributeReference("generated_columns", StringType, nullable = false)(),
      AttributeReference("identity_columns", StringType, nullable = false)(),
      AttributeReference("properties", StringType, nullable = false)(),
      AttributeReference("schema_json", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      // standard-Delta dispatch: DETAIL serves from the interop replay
      if (DeltaLite.latestVersion(path).isEmpty &&
          graft.sources.DeltaInterop.isStandardDelta(path)) {
        val snap = graft.sources.DeltaInterop.snapshot(spark, path)
        return Seq(Row(snap.version, snap.totalRows, snap.totalBytes,
          snap.files.size, snap.files.size, snap.files.size,
          snap.partitionBy.mkString(","), 0, "", "",
          snap.properties.toSeq.sorted
            .map { case (k, v) => s"$k=$v" }.mkString(","),
          snap.schema.json))
      }
      DeltaLite.detail(spark, path).collect().toSeq
    }
  }

  final case class VacuumCommand(path: String, keepVersions: Int,
      dryRun: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("deleted_files", IntegerType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.vacuum(path, keepVersions, dryRun)))
  }

  /** Delta's `VACUUM … USING INVENTORY (subquery)`: the candidate file
    * census comes from the subquery (a storage-inventory report table)
    * instead of a recursive listing — the listing is the actual vacuum
    * bottleneck on 100 TB object stores. The subquery must yield a string
    * `path` column of table-root-relative paths. */
  final case class VacuumInventoryCommand(path: String, inventorySql: String,
      keepVersions: Int, dryRun: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("deleted_files", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.vacuumInventory(spark, path, spark.sql(inventorySql),
        keepVersions, dryRun)))
  }

  /** `DELETE FROM '<path>' WHERE cond` — stats-pruned copy-on-write
    * delete ([[DeltaLite.delete]]); returns the committed version. */
  final case class DeleteCommand(path: String, cond: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.delete(spark, path,
        org.apache.spark.sql.functions.expr(cond))))
  }

  /** `UPDATE '<path>' SET a = e1, b = e2 WHERE cond`. */
  final case class UpdateCommand(path: String, sets: Seq[(String, String)],
      cond: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.update(spark, path,
        org.apache.spark.sql.functions.expr(cond),
        sets.map { case (c, e) =>
          c -> org.apache.spark.sql.functions.expr(e) }.toMap)))
  }

  /** `INSERT INTO '<path>' <select>` — append the subquery's rows. */
  final case class InsertIntoCommand(path: String, selectSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.append(spark, path, spark.sql(selectSql))))
  }

  /** `MERGE INTO '<path>' USING (<select>) ON (k, ...)` with the
    * star-clause grammar (UPDATE ALL / INSERT ALL / DELETE — the dbt
    * incremental-merge shape); clause order is first-match-wins like the
    * full [[graft.operators.Merge]] API underneath. */
  final case class MergeIntoCommand(path: String, sourceSql: String,
      keys: Seq[String], matched: Option[String],
      insertAll: Boolean, bySourceDelete: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val clauses = Seq.newBuilder[graft.operators.Merge.MergeClause]
      matched.foreach {
        case "UPDATE ALL" => clauses += graft.operators.Merge.MatchedUpdate()
        case "DELETE" => clauses += graft.operators.Merge.MatchedDelete()
        case other => throw new IllegalArgumentException(
          s"unsupported WHEN MATCHED action: $other")
      }
      if (insertAll) clauses += graft.operators.Merge.NotMatchedInsert()
      if (bySourceDelete)
        clauses += graft.operators.Merge.NotMatchedBySourceDelete()
      Seq(Row(DeltaLite.mergeClauses(spark, path, spark.sql(sourceSql),
        keys, clauses.result())))
    }
  }

  /** `VACUUM '<path>' LOGS` — Delta's log-retention cleanup
    * (`logRetentionDuration`), version-addressed: prunes commit files and
    * checkpoints strictly below the newest checkpoint that anchors the
    * retained range. See [[DeltaLite.cleanupLogs]]. */
  final case class CleanupLogsCommand(path: String, keepVersions: Int,
      dryRun: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("deleted_log_files", IntegerType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.cleanupLogs(path, keepVersions, dryRun)))
  }

  final case class RestoreCommand(path: String, version: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.restore(spark, path, version)))
  }

  final case class RestoreTimestampCommand(path: String, ts: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.restoreAtTimestamp(spark, path,
        java.time.Instant.parse(ts.replace(" ", "T") +
          (if (ts.contains("Z") || ts.contains("+")) "" else "Z"))
          .toEpochMilli)))
  }

  final case class CloneCommand(source: String, target: String,
      deep: Boolean = false, asOf: Option[Long] = None)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(
        if (deep) DeltaLite.cloneDeep(spark, source, target, asOf)
        else DeltaLite.cloneShallow(spark, source, target, asOf)))
  }

  final case class RenameColumnCommand(path: String, oldName: String,
      newName: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.renameColumn(path, oldName, newName)))
  }

  final case class DropColumnCommand(path: String, name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.dropColumn(path, name)))
  }

  final case class SetColumnDefaultCommand(path: String, column: String,
      expr: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.setColumnDefault(spark, path, column, expr)))
  }

  final case class WidenColumnTypeCommand(path: String, column: String,
      typeName: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.widenColumnType(path, column,
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(typeName))))
  }

  final case class AddColumnCommand(path: String, column: String,
      typeName: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.addColumn(path, column,
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(typeName))))
  }

  /** `SHOW TBLPROPERTIES '<path>'` — the quoted-path twin of Spark's
    * catalog statement: every table property as (key, value) rows,
    * sorted by key. Log-metadata-only. */
  final case class ShowTblPropertiesCommand(path: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("key", StringType, nullable = false)(),
      AttributeReference("value", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      DeltaLite.snapshot(path).properties.toSeq.sortBy(_._1)
        .map { case (k, v) => Row(k, v) }
  }

  final case class DropColumnDefaultCommand(path: String, column: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.unsetColumnDefault(path, column)))
  }

  final case class AddConstraintCommand(path: String, name: String,
      check: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.addConstraint(spark, path, name, check)))
  }

  /** Databricks-style RELY foreign key: `ALTER '<child>' ADD CONSTRAINT
    * name FOREIGN KEY (fk) REFERENCES '<parent>' (key) RELY` — verifies
    * the relationship against the data (PK uniqueness + containment)
    * and ARMS [[graft.plans.FkJoinElimination]]; registration refuses
    * on violation, and any later commit to either table disarms the
    * rewrite until re-run. `DROP FOREIGN KEY (fk)` disarms by column;
    * `DROP FOREIGN KEY name` disarms by the DECLARED constraint name
    * and errors on an unknown name (never a silent no-op). */
  final case class AddForeignKeyCommand(childPath: String, name: String,
      fkCol: String, parentPath: String, parentKey: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("armed", BooleanType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      graft.plans.FkJoinElimination.register(
        spark, childPath, fkCol, parentPath, parentKey, name)
      Seq(Row(true))
    }
  }

  final case class DropForeignKeyCommand(childPath: String,
      fkCol: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("armed", BooleanType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      graft.plans.FkJoinElimination.deregister(spark, childPath, fkCol)
      Seq(Row(false))
    }
  }

  final case class DropForeignKeyByNameCommand(childPath: String,
      name: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("armed", BooleanType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      graft.plans.FkJoinElimination.deregisterByName(spark, childPath, name)
      Seq(Row(false))
    }
  }

  final case class DropConstraintCommand(path: String, name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.dropConstraint(path, name)))
  }

  final case class SetPropertiesCommand(path: String,
      props: Map[String, String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.setProperties(path, props)))
  }

  final case class UnsetPropertyCommand(path: String, key: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.unsetProperty(path, key)))
  }

  /** `ANALYZE TABLE '<path>' COMPUTE STATISTICS FOR ALL COLUMNS` (or
    * `FOR COLUMNS (a, b)`), optionally `WITH HISTOGRAM` — one aggregate
    * scan lands NDV/null-count column statistics in table properties
    * (plus 32-bin equi-height histograms + their mergeable quantile
    * digest under WITH HISTOGRAM); the read path merges them with live
    * file min/max into Catalyst ColumnStats under CBO. Optionally
    * `BY PARTITION` — one extra GROUPED pass lands partition-LOCAL
    * NDV/null stats, so partition-pruned scans price with the pruned
    * partition's own selectivity (bounded to 64 live partitions). */
  final case class AnalyzeTableCommand(path: String, columns: Seq[String],
      histogram: Boolean = false, byPartition: Boolean = false)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.analyzeTable(spark, path, columns,
        histogramBins = if (histogram) 32 else 0,
        byPartition = byPartition)))
  }

  /** `EXPLAIN COST '<path>'` — the optimizer-facing statistics of a
    * table as (entity, statistic, value) rows: log-derived size/row
    * count (what prices broadcasts), ANALYZE-maintained NDV/nulls, live
    * file-stat min/max, and the histogram's serving state (current /
    * rebinned from merged digest / disarmed). The inspection window
    * into the S55/S56 stats surface; metadata-only, never scans data.
    * (`EXPLAIN COST SELECT ...` stays Spark's own — this is the
    * quoted-path TABLE spelling Spark has no syntax for.) */
  final case class ExplainCostCommand(path: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("entity", StringType, nullable = false)(),
      AttributeReference("statistic", StringType, nullable = false)(),
      AttributeReference("value", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      DeltaLite.explainCost(spark, path).map {
        case (e, s, v) => Row(e, s, v)
      }
  }

  /** `EXPLAIN PRUNING <query>` — the join-driven partition-pruning
    * decisions ([[DynamicBranchPruning]]) for a query, one row per
    * decision: which branches each probed join pruned (key, domain,
    * partner count), whether the probe's rows materialized the
    * dimension side, or WHY the probe declined — the same
    * inspectability EXPLAIN COST gives the stats surface. Compiles the
    * query (the probe is plan-time work by design) but never executes
    * it. */
  final case class ExplainPruningCommand(sql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("join", StringType, nullable = false)(),
      AttributeReference("decision", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      // COMPILE-ONLY, enforced in two layers: (1) parse + executePlan
      // instead of spark.sql(...) — Dataset.ofRows eagerly executes
      // command plans; (2) command operands are REFUSED before anything
      // forces optimizedPlan, because QueryExecution.optimizedPlan is
      // built from the commandExecuted phase — forcing it on a DML/DDL
      // operand would run the command while the user believes they are
      // doing read-only plan inspection.
      val parsed = spark.sessionState.sqlParser.parsePlan(sql)
      val qe = spark.sessionState.executePlan(parsed)
      if (qe.analyzed.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.Command]))
        return Seq(Row("(refused)", "EXPLAIN PRUNING never executes " +
          "its operand, and a command (DML/DDL) only optimizes its " +
          "query during execution — pass the inner SELECT instead"))
      val ds = DynamicBranchPruning.decisions(qe)
      if (ds.isEmpty)
        Seq(Row("(none)", "no join was a pruning candidate (no " +
          "literal-branch union fact side found)"))
      else ds.map { case (j, d) => Row(j, d) }
    }
  }

  /** `SHOW PRUNING HISTORY [LIMIT n]` — the session's recent pruning
    * and rewrite decisions (DBP, FRB, BranchFilePruning, MvRewrite,
    * StatsAggRewrite), newest first, from the bounded ring
    * [[DynamicBranchPruning.historySnapshot]]. EXPLAIN PRUNING answers
    * "what would this query do"; this answers "what did my recent
    * queries actually decide" — the post-hoc audit after a batch ran
    * without anyone wrapping each statement. Sequence numbers are
    * session-monotone (not timestamps), so output is deterministic
    * under test. */
  final case class ShowPruningHistoryCommand(limit: Option[Int])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("seq", LongType, nullable = false)(),
      AttributeReference("target", StringType, nullable = false)(),
      AttributeReference("decision", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val all = DynamicBranchPruning.historySnapshot()
      // the placeholder states a fact about the SESSION, so it only
      // renders when the session truly has no history — LIMIT 0 over
      // a populated ring returns zero rows, not a false claim
      if (all.isEmpty) Seq(Row(0L, "(none)",
        "no pruning or rewrite decisions recorded in this session yet"))
      else limit.fold(all)(all.take)
        .map { case (seq, j, d) => Row(seq, j, d) }
    }
  }

  /** `COPY INTO '<table>' FROM '<dir>'` — idempotent landing-zone load;
    * reports the files loaded THIS run (0 = everything already loaded),
    * the Databricks COPY INTO result shape. */
  final case class CopyIntoCommand(path: String, source: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("num_files_loaded", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val (v, n) = DeltaLite.copyInto(spark, path, source)
      Seq(Row(v, n))
    }
  }

  final case class ConvertCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.convert(spark, path)))
  }

  /** `CONVERT FROM DELTA '<path>' [VERSION AS OF n]` — adopt a STANDARD
    * `_delta_log` table (the reference stack's on-disk format) as a
    * graft-delta table in place, zero copy ([[graft.sources.DeltaInterop
    * .convertFromDelta]]). */
  final case class ConvertFromDeltaCommand(path: String,
      asOf: Option[Long]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(graft.sources.DeltaInterop.convertFromDelta(spark, path, asOf)))
  }

  final case class ReorgCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(DeltaLite.reorgPurge(spark, path)))
  }

  final case class OptimizeCommand(path: String, minRows: Long,
      partitionEq: Option[(String, String)]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      // a clustered table (graft.clusterBy) re-routes plain OPTIMIZE onto
      // the incremental clustering path — the Databricks behavior for
      // liquid-clustered tables; partition-scoped OPTIMIZE keeps its
      // compaction meaning either way
      val clusterBy = DeltaLite.clusterByColumns(
        DeltaLite.snapshot(path).properties)
      val v = partitionEq match {
        case Some((c, value)) => DeltaLite.compactPartition(spark, path,
          Seq(DeltaLite.ColumnBound(c, Some(value), Some(value))))
        case None if clusterBy.nonEmpty =>
          DeltaLite.clusterIncremental(spark, path, clusterBy)
        case None => DeltaLite.compactSmall(spark, path, minRows)
      }
      Seq(Row(v))
    }
  }

  final case class ZOrderCommand(path: String,
      partitionEq: Option[(String, String)], colA: String, colB: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val v = partitionEq match {
        case Some((c, value)) => DeltaLite.clusterZPartition(spark, path,
          Seq(DeltaLite.ColumnBound(c, Some(value), Some(value))),
          colA, colB, numFiles = 4)
        case None => DeltaLite.clusterZ(spark, path, colA, colB, numFiles = 8)
      }
      Seq(Row(v))
    }
  }
}

/** Delegating parser: the four maintenance statements above, else Spark. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import MaintenanceSql._

  /** Split `a = f(x, y), b = 2` on commas at paren/quote depth 0 —
    * the UPDATE SET list's assignments may nest function calls. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach { ch =>
      if (inStr) { cur += ch; if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += ch
      }
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'(?:\s+LIMIT\s+(\d+))?\s*;?\s*""".r
  private val DetailRe =
    """(?is)\s*DESCRIBE\s+DETAIL\s+'([^']+)'\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+'([^']+)'\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val InsertIntoRe =
    """(?is)\s*INSERT\s+INTO\s+'([^']+)'\s+(SELECT\s.+?|WITH\s.+?)\s*;?\s*""".r
  // star-clause MERGE: USING (...) is greedy so a subquery containing
  // ") ON (" text would mis-split — acceptable for a path-literal
  // maintenance dialect (same trade VacuumInvRe makes)
  private val MergeIntoRe =
    ("""(?is)\s*MERGE\s+INTO\s+'([^']+)'\s+USING\s*\((.+)\)\s+ON\s*""" +
      """\(\s*([A-Za-z_][A-Za-z0-9_]*(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*)\s*\)""" +
      """(?:\s+WHEN\s+MATCHED\s+THEN\s+(UPDATE\s+ALL|DELETE))?""" +
      """(?:\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+(INSERT\s+ALL))?""" +
      """(?:\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+(DELETE))?\s*;?\s*""").r
  private val VacuumLogsRe =
    """(?is)\s*VACUUM\s+'([^']+)'\s+LOGS(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val VacuumInvRe =
    ("""(?is)\s*VACUUM\s+'([^']+)'\s+USING\s+INVENTORY\s*\((.+)\)""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+'([^']+)'(?:\s+MIN\s+ROWS\s+(\d+))?""" +
      """(?:\s+WHERE\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*'([^']*)')?\s*;?\s*""").r
  private val RestoreRe =
    """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTsRe =
    """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val CloneRe =
    ("""(?is)\s*CLONE\s+'([^']+)'(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """\s+TO\s+'([^']+)'(\s+DEEP)?\s*;?\s*""").r
  private val ConvertRe =
    """(?is)\s*CONVERT\s+TO\s+DELTA\s+'([^']+)'\s*;?\s*""".r
  private val ConvertFromRe =
    ("""(?is)\s*CONVERT\s+FROM\s+DELTA\s+'([^']+)'""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""").r
  private val ReorgRe =
    """(?is)\s*REORG\s+'([^']+)'\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  private val RenameColRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+RENAME\s+COLUMN\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""").r
  private val SetDefaultRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+ALTER\s+COLUMN\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+DEFAULT\s+(.+?)\s*;?\s*""").r
  private val WidenTypeRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+ALTER\s+COLUMN\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+TYPE\s+([A-Za-z0-9()]+)\s*;?\s*""").r
  private val DropDefaultRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+ALTER\s+COLUMN\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+DEFAULT\s*;?\s*""").r
  private val DropColRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+DROP\s+COLUMN\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""").r
  private val AddColRe =
    // the type charset admits nested types (ARRAY<STRING>, MAP<...>,
    // STRUCT<a: INT, ...>) — CatalystSqlParser.parseDataType does the
    // real validation; the regex only needs to not reject them
    ("""(?is)\s*ALTER\s+'([^']+)'\s+ADD\s+COLUMN\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+([A-Za-z0-9_(,)<>:\s]+?)\s*;?\s*""").r
  private val ShowPropsRe =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+'([^']+)'\s*;?\s*""".r
  private val AddConstraintRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val AddFkRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """\s+FOREIGN\s+KEY\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s+REFERENCES\s+""" +
      """'([^']+)'\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s+RELY\s*;?\s*""").r
  private val DropFkRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+DROP\s+FOREIGN\s+KEY\s*\(\s*""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*;?\s*""").r
  private val DropFkByNameRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+DROP\s+FOREIGN\s+KEY\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""").r
  private val DropConstraintRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""").r
  private val ZOrderRe =
    ("""(?is)\s*OPTIMIZE\s+'([^']+)'(?:\s+WHERE\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*'([^']*)')?""" +
      """\s+ZORDER\s+BY\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*;?\s*""").r
  private val SetPropsRe =
    """(?is)\s*ALTER\s+'([^']+)'\s+SET\s+TBLPROPERTIES\s*\(([^)]*)\)\s*;?\s*""".r
  private val UnsetPropRe =
    ("""(?is)\s*ALTER\s+'([^']+)'\s+UNSET\s+TBLPROPERTIES\s*\(\s*""" +
      """'([^']+)'\s*\)\s*;?\s*""").r
  // one `'k' = 'v'` pair inside SET TBLPROPERTIES (...)
  private val PropPairRe = """'([^']+)'\s*=\s*'([^']*)'""".r
  private val CopyIntoRe =
    """(?is)\s*COPY\s+INTO\s+'([^']+)'\s+FROM\s+'([^']+)'\s*;?\s*""".r
  private val ExplainCostRe =
    """(?is)\s*EXPLAIN\s+COST\s+'([^']+)'\s*;?\s*""".r
  private val ExplainPruningRe =
    """(?is)\s*EXPLAIN\s+PRUNING\s+(.+?)\s*;?\s*""".r
  private val ShowPruningHistoryRe =
    """(?is)\s*SHOW\s+PRUNING\s+HISTORY(?:\s+LIMIT\s+(\d+))?\s*;?\s*""".r
  private val AnalyzeAllRe =
    ("""(?is)\s*ANALYZE\s+TABLE\s+'([^']+)'\s+COMPUTE\s+STATISTICS\s+""" +
      """FOR\s+ALL\s+COLUMNS(\s+WITH\s+HISTOGRAM)?""" +
      """(\s+BY\s+PARTITION)?\s*;?\s*""").r
  private val AnalyzeColsRe =
    ("""(?is)\s*ANALYZE\s+TABLE\s+'([^']+)'\s+COMPUTE\s+STATISTICS\s+""" +
      """FOR\s+COLUMNS\s*\(\s*([A-Za-z_][A-Za-z0-9_]*""" +
      """(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*)\s*\)""" +
      """(\s+WITH\s+HISTOGRAM)?(\s+BY\s+PARTITION)?\s*;?\s*""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case HistoryRe(p, lim) =>
      DescribeHistoryCommand(p, Option(lim).map(_.toInt))
    case DetailRe(p) => DescribeDetailCommand(p)
    // the inventory form must match first: plain VacuumRe's path group
    // would otherwise swallow `VACUUM 'p' USING INVENTORY (...)` partially
    case DeleteRe(p, cond) => DeleteCommand(p, cond)
    case UpdateRe(p, setList, cond) =>
      UpdateCommand(p, splitTopLevel(setList).map { a =>
        val i = a.indexOf('=')
        require(i > 0, s"bad SET assignment: $a")
        a.substring(0, i).trim -> a.substring(i + 1).trim
      }, cond)
    case InsertIntoRe(p, sel) => InsertIntoCommand(p, sel)
    case MergeIntoRe(p, src, keys, matched, ins, bySrcDel) =>
      MergeIntoCommand(p, src.trim,
        keys.split(",").map(_.trim).toSeq,
        Option(matched).map(_.toUpperCase(java.util.Locale.ROOT)
          .replaceAll("\\s+", " ")),
        ins != null, bySrcDel != null)
    case VacuumLogsRe(p, keep, dry) =>
      // no RETAIN clause → -1 → cleanupLogs consults the table's
      // graft.retention.logKeepVersions property, falling back to 30
      CleanupLogsCommand(p, Option(keep).map(_.toInt).getOrElse(-1), dry != null)
    case VacuumInvRe(p, inv, keep, dry) =>
      VacuumInventoryCommand(p, inv.trim,
        Option(keep).map(_.toInt).getOrElse(-1), dry != null)
    case VacuumRe(p, keep, dry) =>
      // no RETAIN clause → -1 → vacuum consults the table's
      // graft.retention.keepVersions property, falling back to 1
      VacuumCommand(p, Option(keep).map(_.toInt).getOrElse(-1), dry != null)
    case ZOrderRe(p, c, v, a, b) =>
      ZOrderCommand(p, (Option(c), Option(v)) match {
        case (Some(cc), Some(vv)) => Some((cc, vv))
        case _ => None
      }, a, b)
    case OptimizeRe(p, minRows, c, v) =>
      OptimizeCommand(p, Option(minRows).map(_.toLong).getOrElse(100000L),
        (Option(c), Option(v)) match {
          case (Some(cc), Some(vv)) => Some((cc, vv))
          case _ => None
        })
    case RestoreRe(p, v) => RestoreCommand(p, v.toLong)
    case RestoreTsRe(p, ts) => RestoreTimestampCommand(p, ts)
    case CloneRe(src, v, dst, deep) => CloneCommand(src, dst, deep != null,
      Option(v).map(_.toLong))
    // FROM must match before TO: both contain "CONVERT ... DELTA"
    case ConvertFromRe(p, v) =>
      ConvertFromDeltaCommand(p, Option(v).map(_.toLong))
    case ConvertRe(p) => ConvertCommand(p)
    case CopyIntoRe(p, src) => CopyIntoCommand(p, src)
    case ExplainCostRe(p) => ExplainCostCommand(p)
    case ShowPruningHistoryRe(limit) =>
      ShowPruningHistoryCommand(Option(limit).map(_.toInt))
    case ExplainPruningRe(sql) => ExplainPruningCommand(sql)
    case ReorgRe(p) => ReorgCommand(p)
    case RenameColRe(p, o, n) => RenameColumnCommand(p, o, n)
    // the default variants must match BEFORE DROP COLUMN: `ALTER COLUMN c
    // DROP DEFAULT` contains no ambiguity, but keep order explicit
    case SetDefaultRe(p, c, e) => SetColumnDefaultCommand(p, c, e.trim)
    case WidenTypeRe(p, c, t) => WidenColumnTypeCommand(p, c, t.trim)
    case DropDefaultRe(p, c) => DropColumnDefaultCommand(p, c)
    case DropColRe(p, c) => DropColumnCommand(p, c)
    case AddColRe(p, c, t) => AddColumnCommand(p, c, t.trim)
    case ShowPropsRe(p) => ShowTblPropertiesCommand(p)
    case AddFkRe(child, name, fk, parent, key) =>
      AddForeignKeyCommand(child, name, fk, parent, key)
    case DropFkRe(child, fk) => DropForeignKeyCommand(child, fk)
    case DropFkByNameRe(child, name) =>
      DropForeignKeyByNameCommand(child, name)
    case AddConstraintRe(p, n, check) => AddConstraintCommand(p, n, check.trim)
    case DropConstraintRe(p, n) => DropConstraintCommand(p, n)
    case SetPropsRe(p, pairs) =>
      SetPropertiesCommand(p,
        PropPairRe.findAllMatchIn(pairs).map(m => m.group(1) -> m.group(2)).toMap)
    case UnsetPropRe(p, k) => UnsetPropertyCommand(p, k)
    case AnalyzeAllRe(p, hist, byPart) =>
      AnalyzeTableCommand(p, Nil, hist != null, byPart != null)
    case AnalyzeColsRe(p, cols, hist, byPart) =>
      AnalyzeTableCommand(p, cols.split(",").map(_.trim).toSeq,
        hist != null, byPart != null)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** DeltaLite as a REGISTERED Spark data source:
  *
  * {{{
  *   spark.read.format("graft-delta").load(path)                     // latest
  *   spark.read.format("graft-delta")
  *     .option("versionAsOf", 3).load(path)                          // S5
  *   spark.read.format("graft-delta")
  *     .option("timestampAsOf", "2026-08-12 00:00:00").load(path)
  * }}}
  *
  * Built on the V1 source API (`RelationProvider`/`PrunedFilteredScan`
  * — the stable public extension surface; delta-spark itself shipped on
  * it for years). Two pushdowns happen before Spark touches a row:
  *
  *   1. FILE pruning: pushed `Filter`s translate to [[DeltaLite.ColumnBound]]s
  *      and prune whole files via the log's min/max stats
  *      ([[GraftDeltaSource.boundsFromFilters]] — conservative: strict
  *      bounds widen to inclusive, unsupported filters prune nothing).
  *   2. ROW pushdown: supported filters are re-applied INSIDE the
  *      relation's parquet scan ([[GraftDeltaSource.filterToColumn]]),
  *      so parquet row-group stats and column pruning still engage.
  *
  * `unhandledFilters` returns every filter (the V1 contract allows
  * advisory handling), so Spark re-applies them above the scan — the
  * relation can therefore never return a wrong row, only open fewer
  * files. Deletion vectors, schema evolution and time travel come for
  * free from [[DeltaLite.scan]]. The `.rdd` boundary costs one
  * InternalRow→Row conversion; latency-critical code uses
  * [[DeltaLite.read]]/[[DeltaLite.scan]] directly (same plan, no
  * conversion) — this surface exists so generic Spark tooling that
  * speaks `format(...)` can read the table. */
class GraftDeltaSource extends RelationProvider
    with SchemaRelationProvider with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  // ----------------------------------------------------- streaming source

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    val path = GraftDeltaSource.localPath(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-delta source requires a path: readStream.format(\"graft-delta\").load(path)")))
    val base =
      if (DeltaLite.latestVersion(path).isEmpty &&
          DeltaInterop.isStandardDelta(path))
        DeltaInterop.snapshot(ctx.sparkSession, path).schema
      else DeltaLite.snapshot(path).schema
    val s =
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        GraftDeltaStreamSource.cdfSchema(base)
      else base
    (shortName(), s)
  }

  /** Streaming source: `spark.readStream.format("graft-delta").load(path)`.
    * Offsets ARE log versions — batch N..M reads exactly the files that
    * versions N+1..M added, so each committed row is delivered once (the
    * Delta streaming-source design; a glob-based file stream would
    * re-list and could not see through rewrites). Non-append commits in
    * a range (MERGE/DELETE rewrote a file) fail the stream unless
    * `.option("ignoreChanges", true)`, matching Delta's contract. */
  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val path = GraftDeltaSource.localPath(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-delta source requires a path: readStream.format(\"graft-delta\").load(path)")))
    // STANDARD-DELTA DISPATCH (the batch-read twin): a real _delta_log
    // with no graft log streams through the interop source — version
    // offsets, appends-only contract, and streaming CDF, same as the
    // native one
    if (DeltaLite.latestVersion(path).isEmpty &&
        DeltaInterop.isStandardDelta(path)) {
      val unsupported = Seq("maxFilesPerTrigger", "maxRowsPerTrigger",
        "maxBytesPerTrigger").filter(parameters.contains)
      require(unsupported.isEmpty,
        s"options ${unsupported.mkString(", ")} are not supported on " +
          "standard-Delta streams yet — silently ignoring a rate limit " +
          "would deliver one unbounded first batch; drop the option or " +
          "CONVERT FROM DELTA for the native source's admission control")
      val cdf = parameters.get("readChangeFeed").exists(_.toBoolean)
      return new DeltaInteropStreamSource(ctx.sparkSession, path,
        parameters.get("ignoreChanges").exists(_.toBoolean),
        cdf,
        startingVersion = parameters.get("startingVersion").map(_.toLong),
        // the engine hands back sourceSchema's result — reuse it
        // instead of a second full log replay (base schema only; the
        // CDF form appends the two change columns)
        baseSchemaHint = schema.filter(_ => !cdf))
    }
    // governance on a streaming read is enforced PER MICRO-BATCH inside
    // DeltaLite.readVersionAppends / DeltaLite.changes (the S63 serving
    // projection under the policy at each batch's end version), so a
    // governed table streams fine — no up-front refusal needed
    new GraftDeltaStreamSource(ctx.sparkSession, path,
      parameters.get("ignoreChanges").exists(_.toBoolean),
      parameters.get("readChangeFeed").exists(_.toBoolean),
      metadataPath = metadataPath,
      maxFilesPerTrigger = parameters.get("maxFilesPerTrigger").map(_.toLong),
      maxRowsPerTrigger = parameters.get("maxRowsPerTrigger").map(_.toLong),
      maxBytesPerTrigger = parameters.get("maxBytesPerTrigger").map(_.toLong),
      startingVersion = parameters.get("startingVersion").map(_.toLong))
  }

  /** Streaming sink: `events.writeStream.format("graft-delta")
    * .option("checkpointLocation", cp).start(path)`. Each micro-batch
    * lands via [[DeltaLite.appendOnce]] keyed on the batch id, so a
    * replayed batch after restart is a no-op — exactly-once into the
    * log on top of the checkpoint's at-least-once redelivery. */
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = GraftDeltaSource.localPath(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-delta sink requires a path: .start(path)")))
    require(partitionColumns.isEmpty,
      "graft-delta sink does not support partitionBy")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-delta sink supports Append output mode only, got $outputMode")
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long,
          data: org.apache.spark.sql.DataFrame): Unit = {
        val spark = data.sparkSession
        // The incoming DataFrame's logical plan is streaming-tagged, so a
        // fresh write job over it would be rejected; rebuild a batch frame
        // over the already-executed micro-batch rows (collect-free: the
        // physical rows are re-wrapped, not materialized on the driver).
        val deser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
          data.schema).resolveAndBind().createDeserializer()
        val rows = data.queryExecution.toRdd.map(ir => deser(ir.copy()))
        val batch = spark.createDataFrame(rows, data.schema)
        if (DeltaLite.latestVersion(path).isEmpty)
          DeltaLite.create(spark, path, batch.limit(0))
        DeltaLite.appendOnce(spark, path, batch,
          app = "graft-delta-sink", txnVersion = batchId)
        ()
      }
      override def toString: String = s"GraftDeltaSink[$path]"
    }
  }

  /** Write side: `df.write.format("graft-delta").mode(m).save(path)`.
    * ErrorIfExists/Ignore follow the SaveMode contract; Append lands a
    * log-committed batch (constraint/schema-enforced); Overwrite is a
    * `replaceWhere` over the full table — a new version whose live set
    * is just the batch, with history still time-travelable. Table-create
    * writes accept `tblproperty.<k>` options (e.g.
    * `.option("tblproperty.graft.bloom.columns", "id")`), mapped to the
    * new table's TBLPROPERTIES. */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: org.apache.spark.sql.DataFrame)
      : BaseRelation = {
    val path = GraftDeltaSource.localPath(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-delta requires a path: df.write.format(\"graft-delta\").save(path)")))
    val spark = ctx.sparkSession
    val exists = DeltaLite.latestVersion(path).isDefined
    val props = parameters.collect {
      case (k, v) if k.toLowerCase.startsWith("tblproperty.") =>
        k.substring("tblproperty.".length) -> v
    }
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"graft-delta table already exists at $path")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Overwrite if exists =>
        DeltaLite.replaceWhere(spark, path, lit(true), data)
      case SaveMode.Append if exists =>
        DeltaLite.append(spark, path, data)
      case _ =>
        DeltaLite.create(spark, path, data, properties = props)
    }
    GraftDeltaRelation(spark, path, None)
  }

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = GraftDeltaSource.localPath(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-delta requires a path: spark.read.format(\"graft-delta\").load(path)")))
    // STANDARD-DELTA DISPATCH: a directory with a real `_delta_log` and
    // no `_graft_log` reads through [[DeltaInterop]] — the reference
    // stack's tables load with the same one-liner (and the same file
    // pruning). A converted table has BOTH logs; graft's own log wins —
    // it is the one this engine's writes advance.
    if (DeltaLite.latestVersion(path).isEmpty &&
        DeltaInterop.isStandardDelta(path)) {
      val asOf = parameters.get("versionAsOf").map(_.toLong).orElse(
        parameters.get("timestampAsOf").map(ts =>
          DeltaInterop.versionAtTimestamp(
            path, java.sql.Timestamp.valueOf(ts).getTime)))
      return DeltaInteropRelation(ctx.sparkSession, path, asOf)
    }
    val asOf = parameters.get("versionAsOf").map(_.toLong).orElse(
      parameters.get("timestampAsOf").map(ts => DeltaLite.versionAtTimestamp(
        path, java.sql.Timestamp.valueOf(ts).getTime)))
    GraftDeltaRelation(ctx.sparkSession, path, asOf)
  }

  /** User-supplied schemas are not supported: the log IS the schema
    * authority (reading with a divergent schema would silently miscast). */
  override def createRelation(ctx: SQLContext, parameters: Map[String, String],
      schema: StructType): BaseRelation = {
    val rel = createRelation(ctx, parameters)
    require(rel.schema == schema,
      s"graft-delta tables own their schema (log: ${rel.schema.simpleString}); " +
        "drop the .schema(...) call")
    rel
  }
}

object GraftDeltaSource {

  /** The SQL catalog hands `path` as a `file:` URI (CREATE TABLE ...
    * USING `graft-delta`); the DataFrame API hands a plain path. DeltaLite
    * speaks local paths, so normalize the URI form down. */
  def localPath(p: String): String =
    if (p.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(p)).toString
    else p

  /** Source `Filter`s → stat bounds for file pruning. Conservative by
    * construction: strict inequalities widen to the inclusive
    * [[DeltaLite.ColumnBound]] (prunes slightly less, never wrongly),
    * disjunctions and exotic filters translate to nothing. */
  def boundsFromFilters(filters: Seq[Filter]): Seq[DeltaLite.ColumnBound] =
    filters.flatMap {
      case EqualTo(a, v) => Seq(DeltaLite.ColumnBound(a, Some(v), Some(v)))
      case GreaterThan(a, v) => Seq(DeltaLite.ColumnBound(a, lower = Some(v)))
      case GreaterThanOrEqual(a, v) => Seq(DeltaLite.ColumnBound(a, lower = Some(v)))
      case LessThan(a, v) => Seq(DeltaLite.ColumnBound(a, upper = Some(v)))
      case LessThanOrEqual(a, v) => Seq(DeltaLite.ColumnBound(a, upper = Some(v)))
      case And(l, r) => boundsFromFilters(Seq(l)) ++ boundsFromFilters(Seq(r))
      case _ => Nil
    }

  /** Source `Filter` → `Column` predicate for in-scan re-application
    * (parquet row-group pruning). None for filters without a faithful
    * Column form here — they are simply not pushed. */
  def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case And(l, r) => for (lc <- filterToColumn(l); rc <- filterToColumn(r))
      yield lc && rc
    case Or(l, r) => for (lc <- filterToColumn(l); rc <- filterToColumn(r))
      yield lc || rc
    case Not(c) => filterToColumn(c).map(!_)
    case _ => None
  }
}

/** Version-offset streaming source over a DeltaLite table (see
  * [[GraftDeltaSource.createSource]]). The schema pins at stream start;
  * offsets round-trip through the checkpoint as plain version longs.
  *
  * With `readChangeFeed` (Delta's streaming CDF read) each micro-batch
  * delivers the PER-COMMIT row-level changes of the versions it spans —
  * `_change_type` insert/delete plus `_commit_version` — computed from
  * only the files each commit touched ([[DeltaLite.changes]]); version 0
  * arrives as the initial contents tagged insert. A schema change
  * mid-stream fails the union, i.e. the stream — Delta's CDF contract
  * (restart to pick up the new schema). */
final class GraftDeltaStreamSource(spark: SparkSession, path: String,
    ignoreChanges: Boolean, cdf: Boolean = false,
    metadataPath: String = "",
    maxFilesPerTrigger: Option[Long] = None,
    maxRowsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    startingVersion: Option[Long] = None)
    extends org.apache.spark.sql.execution.streaming.Source {
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  private val tableSchema: StructType = DeltaLite.snapshot(path).schema

  private def rateLimited: Boolean =
    maxFilesPerTrigger.isDefined || maxRowsPerTrigger.isDefined ||
      maxBytesPerTrigger.isDefined

  // Admission-control position: the last log version this source has
  // SURFACED via getOffset/getBatch. Persisted under the stream's own
  // metadataPath so a restart resumes from it — without this, a
  // rate-limited getOffset on a fresh instance could construct an offset
  // BEHIND the checkpoint's committed one and re-admit versions the sink
  // already processed (the V1-source rate-limit restart hazard; Kafka
  // and the file source each keep equivalent state for the same reason).
  private val posFile: Option[java.nio.file.Path] =
    if (!rateLimited || metadataPath.isEmpty) None
    else Some(java.nio.file.Paths.get(
      GraftDeltaSource.localPath(metadataPath), "graft-source-position"))
  private var position: Option[Long] = posFile.filter(java.nio.file.Files.exists(_))
    .map(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong)

  private def storePos(v: Long): Unit = {
    if (position.forall(_ < v)) {
      position = Some(v)
      posFile.foreach { p =>
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, v.toString.getBytes("UTF-8"))
      }
    }
  }

  override def schema: StructType =
    if (cdf) GraftDeltaStreamSource.cdfSchema(tableSchema) else tableSchema

  /** Without rate limits: the latest log version. With
    * `maxFilesPerTrigger`/`maxRowsPerTrigger`: walk forward from the
    * current position, admitting whole versions (a commit is the atomic
    * unit of exactly-once delivery, so it never splits) until a cap is
    * reached — but always at least one version, or a single oversized
    * commit would stall the stream forever. The walk reads only commit
    * headers ([[DeltaLite.versionAddStats]]), no data files. */
  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] =
    DeltaLite.latestVersion(path).map { latest =>
      if (!rateLimited) LongOffset(latest)
      else {
        val base = position.getOrElse(-1L)
        if (latest <= base) LongOffset(base)
        else {
          var v = base
          var files = 0L
          var rows = 0L
          var bytes = 0L
          var continue = true
          while (continue && v < latest) {
            val (f, r, by) = DeltaLite.versionAddStats(path, v + 1)
            if (v > base &&
                (maxFilesPerTrigger.exists(files + f > _) ||
                 maxRowsPerTrigger.exists(rows + r > _) ||
                 maxBytesPerTrigger.exists(bytes + by > _))) continue = false
            else {
              v += 1; files += f; rows += r; bytes += by
              if (maxFilesPerTrigger.exists(files >= _) ||
                  maxRowsPerTrigger.exists(rows >= _) ||
                  maxBytesPerTrigger.exists(bytes >= _)) continue = false
            }
          }
          storePos(v)
          LongOffset(v)
        }
      }
    }

  private def version(o: org.apache.spark.sql.execution.streaming.Offset): Long =
    o match {
      case LongOffset(v) => v
      case other => other.json.trim.toLong // SerializedOffset after restart
    }

  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset)
      : org.apache.spark.sql.DataFrame = {
    // Seed/advance the admission position from the engine's own offsets
    // (covers restart replay of a logged-but-uncommitted batch).
    storePos(version(end))
    start.map(version).foreach(storePos)
    // Delta's `startingVersion`: subscribe WITHOUT the initial-snapshot
    // backfill — delivery begins at startingVersion. Combined with the
    // checkpointed offset by MAX on every batch: applied only to the
    // first batch it would go inert once an offset commits below it
    // and deliver versions the user excluded (review finding).
    val effStart: Option[Long] = Seq(start.map(version),
      startingVersion.filter(_ > 0).map(_ - 1)).flatten.maxOption
    // getBatch must return a STREAMING-tagged frame — see StreamingFrame.
    if (!cdf)
      org.apache.spark.sql.graft.StreamingFrame.tag(
        DeltaLite.readVersionAppends(spark, path,
          effStart, version(end), allowRewrites = ignoreChanges))
    else {
      val from = effStart.map(_ + 1).getOrElse(0L)
      val to = version(end)
      // the engine may replay getBatch with an empty version range
      // (start == end) after a restart — that is an empty CDF batch,
      // not an error
      val batch = (from to to).map(changesAt)
        .reduceOption(_ unionByName _)
        .getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          GraftDeltaStreamSource.cdfSchema(tableSchema)))
      org.apache.spark.sql.graft.StreamingFrame.tag(batch)
    }
  }

  /** Row-level changes committed by exactly version `v`. */
  private def changesAt(v: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    val base =
      if (v == 0L) DeltaLite.read(spark, path, asOf = Some(0L))
        .withColumn("_change_type", lit("insert"))
      else DeltaLite.changes(spark, path, v - 1, v)
    base.withColumn("_commit_version", lit(v))
  }

  override def stop(): Unit = ()
}

/** Version-offset streaming source over a STANDARD `_delta_log` table
  * — the streaming twin of [[DeltaInteropRelation]]: a pipeline that
  * consumed the reference stack's Delta tables as a stream keeps
  * running against the same directories. Offsets are log versions;
  * each batch delivers exactly the rows the versions in range ADDED
  * ([[DeltaInterop.readVersionAppends]] — one incremental replay per
  * batch, O(touched files)); a data-changing remove fails the stream
  * unless `ignoreChanges` (Delta's contract); `readChangeFeed` streams
  * [[DeltaInterop.tableChanges]] with version 0 as the initial inserts
  * (`_change_type`, `_commit_version` appended). */
final class DeltaInteropStreamSource(spark: SparkSession, path: String,
    ignoreChanges: Boolean, cdf: Boolean = false,
    startingVersion: Option[Long] = None,
    baseSchemaHint: Option[StructType] = None)
    extends org.apache.spark.sql.execution.streaming.Source {
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  private val tableSchema: StructType =
    baseSchemaHint.getOrElse(DeltaInterop.snapshot(spark, path).schema)

  override def schema: StructType =
    if (cdf) GraftDeltaStreamSource.cdfSchema(tableSchema) else tableSchema

  override def getOffset
      : Option[org.apache.spark.sql.execution.streaming.Offset] =
    DeltaInterop.latestVersion(path).map(LongOffset(_))

  private def version(
      o: org.apache.spark.sql.execution.streaming.Offset): Long =
    o match {
      case LongOffset(v) => v
      case other => other.json.trim.toLong // SerializedOffset on restart
    }

  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset)
      : org.apache.spark.sql.DataFrame = {
    // startingVersion combines with the checkpointed offset by MAX on
    // every batch — applied only to the first batch it would go inert
    // once an offset commits below it, delivering versions the user
    // excluded (review finding)
    val effStart: Option[Long] = Seq(start.map(version),
      startingVersion.filter(_ > 0).map(_ - 1)).flatten.maxOption
    val to = version(end)
    val batch =
      if (!cdf) {
        if (start.isEmpty && startingVersion.isEmpty)
          // Delta's initial-snapshot contract: batch 0 without an
          // offset delivers the table's CURRENT contents — never a
          // from-zero append replay, which would fail on (or with
          // ignoreChanges re-deliver) rows deleted BEFORE the stream
          // existed, and cannot start at all once early commit JSONs
          // are log-cleaned (review finding)
          DeltaInterop.read(spark, path, asOf = Some(to))
        else
          DeltaInterop.readVersionAppends(spark, path, effStart, to,
            allowRewrites = ignoreChanges,
            emptySchema = Some(tableSchema))
      } else {
        val from = effStart.map(_ + 1L).getOrElse(0L)
        if (from > to)
          spark.createDataFrame(
            new java.util.ArrayList[Row](),
            GraftDeltaStreamSource.cdfSchema(tableSchema))
        else DeltaInterop.tableChanges(spark, path, from, to)
      }
    org.apache.spark.sql.graft.StreamingFrame.tag(batch)
  }

  override def stop(): Unit = ()
}

object GraftDeltaStreamSource {
  /** The streaming CDF schema: table columns + change metadata. */
  def cdfSchema(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
}

/** The [[GraftDeltaRelation]] twin over a STANDARD `_delta_log` table
  * ([[DeltaInterop]]): same V1 pushdown contract — pushed filters prune
  * whole files via the Delta log's own `stats` min/max (through the
  * shared [[DeltaLite.pruneFiles]] core) and re-apply inside the
  * parquet scan; every filter is also re-applied above by Spark, so
  * conservative pruning can never change results. */
final case class DeltaInteropRelation(spark: SparkSession, path: String,
    asOf: Option[Long]) extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext
  // one replay per relation: schema AND every buildScan serve from it
  private val snap = DeltaInterop.snapshot(spark, path, asOf)
  override val schema: StructType = snap.schema

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pruned = DeltaInterop.scanSnapshot(spark, path, snap,
      GraftDeltaSource.boundsFromFilters(filters.toSeq))
    val filtered = filters.toSeq.flatMap(GraftDeltaSource.filterToColumn)
      .foldLeft(pruned)(_ filter _)
    val projected =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns.toSeq.map(col): _*)
    projected.rdd
  }
}

final case class GraftDeltaRelation(spark: SparkSession, path: String,
    asOf: Option[Long]) extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = DeltaLite.snapshot(path, asOf).schema

  // Advisory handling: Spark re-applies every filter above the scan, so
  // partial/conservative pushdown below can never change results.
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pruned = DeltaLite.scan(spark, path,
      GraftDeltaSource.boundsFromFilters(filters.toSeq), asOf)
    val filtered = filters.toSeq.flatMap(GraftDeltaSource.filterToColumn)
      .foldLeft(pruned)(_ filter _)
    val projected =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns.toSeq.map(col): _*)
    projected.rdd
  }
}

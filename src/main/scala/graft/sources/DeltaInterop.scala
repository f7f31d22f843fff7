package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** STANDARD Delta-protocol interop — the reference stack's actual
  * on-disk format. dbt-duckdb + delta-rs (the reference's declared
  * stack) write real Delta tables: parquet data files plus a
  * `_delta_log/<20-digit-version>.json` commit log of `add` / `remove`
  * / `metaData` / `protocol` actions (delta.io PROTOCOL.md — public
  * spec). A user arriving from the reference has those directories on
  * disk; this module lets the engine READ them natively, time-travel
  * them, adopt them zero-copy into graft-delta (`CONVERT FROM DELTA`),
  * and hand tables BACK as minimal-protocol Delta (`exportToDelta`) so
  * the reference stack can keep consuming the results.
  *
  * Scope, stated plainly (a declined feature must fail LOUDLY, never
  * read wrong rows):
  *   - protocol: minReaderVersion 1 and 2, including column mapping
  *     modes `name` (the physical names feed graft's own
  *     logical→physical read aliasing) and `id` (Delta's
  *     `delta.columnMapping.id` translates to `parquet.field.id`
  *     metadata and Spark's field-id reader resolves columns by id —
  *     file column names are free to differ from physicalName);
  *     minReaderVersion 3 only when every `readerFeatures` entry is in
  *     [[SupportedReaderFeatures]]. Everything else throws, naming the
  *     feature.
  *   - deletion vectors READ natively ([[DeletionVectors]] decodes the
  *     protocol's roaring-bitmap format — u/p/i storage): snapshot and
  *     pruned reads anti-filter the deleted row indexes, the change
  *     feed diffs DV flips into row-level deletes/restores, the
  *     streaming source treats a DV flip as the rewrite it is, and
  *     CONVERT adopts DVs by translating them into graft's native
  *     (path, row_index) DV dirs — still zero data-file copies.
  *     Unsupported DV STORAGE types decline loudly, naming them.
  *   - checkpoints: classic parquet checkpoints, single-part
  *     (`<v>.checkpoint.parquet`) and multi-part
  *     (`<v>.checkpoint.<i>.<n>.parquet`), AND v2/UUID checkpoints
  *     (`<v>.checkpoint.<uniqueStr>.{json|parquet}` manifests with
  *     `checkpointMetadata` validation and `_sidecars/` replay) all
  *     reconstruct snapshots — a log-cleaned table stays readable
  *     whichever checkpoint shape its writer left behind. A missing
  *     sidecar or multi-part piece throws; half a state never serves.
  *
  * Mechanics: the log replays into [[DeltaLite.Snapshot]] — the same
  * driver-side state model the native format uses — so EVERYTHING
  * downstream is shared, not re-implemented: the Hive-layout partition
  * re-attachment, the min/max stats file pruning ([[DeltaLite.pruneFiles]]
  * — Delta's `stats` JSON decodes into the same typed bounds), the
  * BranchFilePruning scan tagging, and the `graft-delta` V1 relation.
  * At 100 TB the replay is one driver pass over log JSON + at most one
  * Spark job over checkpoint parquet — metadata-proportional, exactly
  * delta-spark's own Snapshot cost shape.
  *
  * Write-side: the mutating exports commit through the SAME
  * claim-store OCC contract the native format uses — `<v>.json` is
  * CLAIMED (conditional-PUT semantics, exactly one winner, ambiguity
  * resolved by read-back compare), and a lost race re-replays and
  * REBUILDS the commit against the new state ([[occCommit]]) — so
  * concurrent writers (including the reference stack racing the
  * exporter) interleave instead of clobbering. Deletes are
  * partition-aligned only (remove actions, zero rewrite) — the
  * metadata-only shape that survives 100 TB; row-level deletes belong
  * to the native format's DV/MERGE machinery.
  */
object DeltaInterop {

  import DeltaLite.{AddFile, ColStats, Snapshot}

  private def root(path: String): Path =
    Paths.get(path).toAbsolutePath.normalize()
  private[graft] def logDir(path: String): Path =
    root(path).resolve("_delta_log")

  /** Reader features this module actually implements. `timestampNtz`
    * and `vacuumProtocolCheck`/`v2Checkpoint` gate nothing on our read
    * path (NTZ is a native Spark type; vacuum is write-side; v2
    * checkpoints are never REQUIRED while JSON commits are retained —
    * see the class doc for when their absence throws). */
  private[graft] val SupportedReaderFeatures: Set[String] =
    Set("timestampNtz", "vacuumProtocolCheck", "v2Checkpoint",
      "columnMapping", "deletionVectors")

  /** Foreign DV descriptors ride graft's `AddFile.dv` slot as
    * marker-prefixed JSON (native dv strings are parquet dir PATHS —
    * the marker keeps the two representations unmistakable; the native
    * read path never sees interop AddFiles, [[read]]/[[scanSnapshot]]
    * strip or translate the marker first). */
  private[sources] val DvMarker = "delta-dv:"

  private[sources] def dvDescriptor(f: AddFile)
      : Option[DeletionVectors.Descriptor] =
    f.dv.filter(_.startsWith(DvMarker))
      .map(s => DeletionVectors.fromJson(s.substring(DvMarker.length)))

  /** A deletion vector's reconciliation identity (PROTOCOL.md
    * `dvUniqueId` — storage type + payload + offset): the unit a
    * remove action names and the second half of the (path, DV)
    * logical-file key replay and tombstones match on. */
  private def dvIdentity(d: DeletionVectors.Descriptor)
      : (String, String, Option[Int]) =
    (d.storageType, d.pathOrInlineDv, d.offset)

  /** A directory is a standard Delta table iff `_delta_log/` holds at
    * least one versioned commit or checkpoint (classic or v2). */
  def isStandardDelta(path: String): Boolean = !listing(path).isEmpty

  private def listLog(path: String): Seq[String] = {
    val d = logDir(path)
    if (!Files.isDirectory(d)) return Nil
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
    finally s.close()
  }

  /** One directory listing, all three artifact views (review finding:
    * commitVersions + checkpoints + v2Checkpoints each re-listed
    * `_delta_log` — with latestVersion re-running all three, a replay
    * paid ~7 listings on the hottest metadata path; on an object
    * store each is a round trip). `v2s` is UNFILTERED here — replay
    * prefers the classic checkpoint at a shared version, but `latest`
    * must see every version either kind restates. */
  private final case class LogListing(jsons: Seq[Long],
      cps: Map[Long, Seq[Path]], v2s: Map[Long, Path]) {
    def isEmpty: Boolean = jsons.isEmpty && cps.isEmpty && v2s.isEmpty
    def latest: Option[Long] = (jsons ++ cps.keys ++ v2s.keys).maxOption
  }

  private def listing(path: String): LogListing = {
    val names = listLog(path)
    LogListing(commitVersionsOf(names), checkpointsOf(path, names),
      v2CheckpointsOf(path, names))
  }

  private def commitVersionsOf(names: Seq[String]): Seq[Long] =
    names.filter(_.matches("""\d{20}\.json"""))
      .map(_.stripSuffix(".json").toLong).sorted

  /** The commit-range walkers (CDF, history, streaming) need only the
    * JSON commit versions — one listing each. */
  private def commitVersions(path: String): Seq[Long] =
    commitVersionsOf(listLog(path))

  /** Classic parquet checkpoints present AND COMPLETE in the log,
    * version → parts. A multi-part checkpoint (`<v>.checkpoint.<i>.<n>
    * .parquet`) counts only when ALL n parts are present — replaying a
    * partial one would silently drop the missing parts' add actions
    * (wrong rows, the one outcome this module must never produce), so
    * an incomplete set is treated as no checkpoint at that version and
    * replay falls back to JSON commits or an older checkpoint. */
  private def checkpointsOf(path: String,
      names: Seq[String]): Map[Long, Seq[Path]] = {
    val d = logDir(path)
    val single = """(\d{20})\.checkpoint\.parquet""".r
    val multi = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    val singles = names.collect { case n @ single(v) =>
      v.toLong -> Seq(d.resolve(n)) }.toMap
    val multis = names.collect { case n @ multi(v, i, t) =>
      (v.toLong, i.toInt, t.toInt, d.resolve(n)) }
      .groupBy(_._1).flatMap { case (v, parts) =>
        val total = parts.head._3
        val complete = parts.map(_._3).forall(_ == total) &&
          parts.map(_._2).toSet == (1 to total).toSet
        if (complete) Some(v -> parts.sortBy(_._2).map(_._4)) else None
      }
    singles ++ multis
  }

  /** V2 (UUID-named) checkpoints — PROTOCOL.md "V2 Checkpoints":
    * `<v>.checkpoint.<uniqueStr>.{json|parquet}` manifests carrying a
    * `checkpointMetadata` action, the snapshot actions, and optional
    * `sidecar` references into `_delta_log/_sidecars/`. Version →
    * manifest (newest uniqueStr arbitrary — any manifest at a version
    * restates the same state, per spec). The classic multi-part
    * pattern (`<v>.checkpoint.<i>.<n>.parquet`) cannot collide: its
    * uniqueStr would need an interior dot. */
  private def v2CheckpointsOf(path: String,
      names: Seq[String]): Map[Long, Path] = {
    val d = logDir(path)
    val v2 = """(\d{20})\.checkpoint\.([A-Za-z0-9_-]+)\.(json|parquet)""".r
    names.collect {
      case n @ v2(v, _, _) => v.toLong -> d.resolve(n)
    }.toMap
  }

  def latestVersion(path: String): Option[Long] = listing(path).latest

  // ------------------------------------------------------------- replay

  /** Mutable replay state — one pass over checkpoint rows + JSON lines. */
  private final class State {
    var schema: StructType = null
    var partitionBy: Seq[String] = Nil
    var config: Map[String, String] = Map.empty
    var minReader: Int = 1
    var readerFeatures: Seq[String] = Nil
    var minWriter: Int = 1
    var writerFeatures: Seq[String] = Nil
    /** Column mapping `name` mode: logical → physical parquet name,
      * from `delta.columnMapping.physicalName` field metadata. */
    private var physicalV: Map[String, String] = Map.empty
    private var p2l: Map[String, String] = Map.empty
    def physical: Map[String, String] = physicalV
    def physical_=(m: Map[String, String]): Unit = {
      physicalV = m
      p2l = m.map(_.swap) // cached: consulted once per add action
    }
    def physToLogical: Map[String, String] = p2l
    val live = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    val txns = scala.collection.mutable.HashMap.empty[String, Long]
    /** Remove TOMBSTONES still inside the retention window's reach:
      * PROTOCOL.md checkpoints carry them so foreign VACUUM (which
      * scans the checkpoint, not cleaned-up JSON) can still distinguish
      * recently-removed files from untracked garbage.
      *
      * Keyed by the LOGICAL FILE identity — (path, DV identity) — the
      * same key Delta reconciliation uses, NOT by path alone: a DV
      * flip is remove(path, oldDV) + add(path, newDV), and under a
      * path key the re-add erased (or pre-empted) the superseded
      * identity's tombstone, so a checkpoint written after the flip
      * dropped the remove that keeps the superseded deletion_vector
      * file safe from foreign VACUUM inside the retention window
      * (review finding — the r17 known limitation, now closed). Value
      * = (deletionTimestamp, the full DV descriptor for checkpoint
      * restatement). */
    val tombstones = scala.collection.mutable.LinkedHashMap
      .empty[(String, Option[(String, String, Option[Int])]),
        (Long, Option[DeletionVectors.Descriptor])]
    /** metaData.id — restated verbatim by checkpoints (a fresh random
      * id per checkpoint would change table identity under foreign
      * streaming queries that pin it; review finding). */
    var tableId: String = null
  }

  /** Delta `add.path`/`remove.path` are RFC 2396 percent-encoded
    * relative URIs (PROTOCOL.md "Add File and Remove File"). */
  private def decodePath(p: String): String =
    try new java.net.URI(p).getPath catch { case _: Exception => p }

  private def encodePath(p: String): String =
    new java.net.URI(null, null, p, null).getRawPath

  /** metaData/protocol actions first — add actions need the schema to
    * type their stats (and, under column mapping, to translate
    * partitionValues keys to logical names). PROTOCOL.md does NOT
    * guarantee metaData precedes add within a commit's line order, so
    * BOTH the checkpoint replay and the JSON commit replay reorder
    * (review finding: only the checkpoint path did — an
    * add-before-metaData commit 0 silently dropped stats typing and
    * re-attached mapped partition columns as NULL). Classified on the
    * PARSED key set: a substring test would hoist an add row whose
    * stats VALUES contain the text "metaData". */
  private def isMeta(jv: JValue): Boolean = jv match {
    case JObject(fs) => fs.exists { case (k, v) =>
      (k == "metaData" || k == "protocol") && v != JNull }
    case _ => false
  }

  private def applyActionsMetaFirst(st: State, actions: Seq[JValue],
      where: String): Unit = {
    val (meta, rest) = actions.partition(isMeta)
    (meta ++ rest).foreach(applyParsedAction(st, _, where))
  }

  private def applyParsedAction(st: State, jv: JValue,
      where: String): Unit =
    jv match {
      case JObject(fields) => fields.foreach {
        case ("metaData", JObject(m)) => applyMetaData(st, m.toMap, where)
        case ("protocol", JObject(p)) =>
          val pm = p.toMap
          st.minReader = pm.get("minReaderVersion").collect {
            case JInt(i) => i.toInt; case JLong(l) => l.toInt
          }.getOrElse(1)
          st.readerFeatures = pm.get("readerFeatures").collect {
            case JArray(fs) => fs.collect { case JString(f) => f }
          }.getOrElse(Nil)
          st.minWriter = pm.get("minWriterVersion").collect {
            case JInt(i) => i.toInt; case JLong(l) => l.toInt
          }.getOrElse(1)
          st.writerFeatures = pm.get("writerFeatures").collect {
            case JArray(fs) => fs.collect { case JString(f) => f }
          }.getOrElse(Nil)
        case ("add", JObject(a)) =>
          val am = a.toMap
          // deletionVector descriptors parse into the AddFile.dv slot
          // (marker-prefixed JSON — graft's native dv strings are
          // parquet dir paths, never "delta-dv:…"); the read paths
          // anti-filter the decoded row indexes. Unsupported STORAGE
          // types still fail loudly — at bitmapBytes time, naming them.
          val dvDesc = am.get("deletionVector") match {
            case Some(o @ JObject(_)) =>
              Some(DeletionVectors.parseJValue(o, where))
            case Some(JNull) | None => None
            case Some(_) => sys.error(
              s"$where: malformed deletionVector on add action")
          }
          val rel = decodePath(am.get("path").collect {
            case JString(s) => s
          }.getOrElse(sys.error(s"$where: add action without path")))
          val p2l = st.physToLogical
          val pv = am.get("partitionValues") match {
            // JSON null value = null partition (absent key reads as
            // null through attachPartitionCols, same as Hive default).
            // Under column mapping Delta keys partitionValues by the
            // PHYSICAL name; graft's model (pruneFiles' pv fallback,
            // attachPartitionCols) wants LOGICAL keys — translate.
            case Some(JObject(vals)) =>
              vals.collect { case (c, JString(s)) =>
                p2l.getOrElse(c, c) -> s }.toMap
            case _ => Map.empty[String, String]
          }
          val bytes = am.get("size").collect {
            case JLong(l) => l; case JInt(i) => i.toLong
          }.getOrElse(0L)
          val (rows, stats) = am.get("stats") match {
            case Some(JString(s)) if s.nonEmpty =>
              parseStats(s, st.schema, st.partitionBy, st.physical)
            case _ => (0L, Map.empty[String, ColStats])
          }
          val mtime = am.get("modificationTime").collect {
            case JLong(l) => l; case JInt(i) => i.toLong
          }
          st.live(rel) = AddFile(rel, rows, stats,
            dvDesc.map(d => DvMarker + DeletionVectors.toJson(d)),
            pv, bytes = bytes, mtime = mtime)
          // resurrect exactly THIS logical file (path + DV identity);
          // a tombstone for the same path under a different DV
          // identity refers to a superseded logical file and must
          // survive the re-add (DV-flip checkpoint restatement)
          st.tombstones.remove((rel, dvDesc.map(dvIdentity)))
        case ("remove", JObject(r)) =>
          val rm = r.toMap
          rm.get("path").collect { case JString(p) => p }.foreach { p =>
            val rel = decodePath(p)
            // Delta reconciliation identifies a LOGICAL file by (path,
            // deletionVector.uniqueId), and line order within a commit
            // is not guaranteed — a DV-flip commit may order
            // [add(path, newDV), remove(path, oldDV-or-none)]. A
            // remove evicts the live entry only when their DV
            // identities MATCH EXACTLY (none matches none): if the
            // add landed first, the live entry's identity differs and
            // the remove refers to the superseded logical file — a
            // path-only removal there silently dropped the whole file
            // (wrong rows; review finding). Strict matching is correct
            // for every spec-legal order; only a spec-violating remove
            // (evicting a DV'd file without naming its DV) is
            // mis-replayed, and in the safe direction across commits.
            val rmDv = rm.get("deletionVector") match {
              case Some(o @ JObject(_)) =>
                Some(DeletionVectors.parseJValue(o, where))
              case _ => None
            }
            val liveDv = st.live.get(rel).flatMap(dvDescriptor)
            if (liveDv.map(dvIdentity) == rmDv.map(dvIdentity))
              st.live.remove(rel)
            // Tombstone the removed LOGICAL identity unconditionally:
            // keyed by (path, DV identity), a tombstone can never
            // shadow the live entry — when identities differ, the live
            // file under the same path is a DIFFERENT logical file
            // (the post-flip one), and a spec-conformant foreign
            // replay reconciles on the same compound key, so a
            // checkpoint restating both rows round-trips. This is what
            // closes the r17 limitation: the flip's superseded
            // identity now restates into checkpoints regardless of
            // remove/add line order. deletionTimestamp is optional; an
            // absent one defaults to 0 (already aged out) — defaulting
            // to wall-clock would make replays non-deterministic and
            // pin the tombstone in every future checkpoint (review
            // finding)
            st.tombstones((rel, rmDv.map(dvIdentity))) =
              (rm.get("deletionTimestamp").collect {
                case JLong(l) => l; case JInt(i) => i.toLong
              }.getOrElse(0L), rmDv)
          }
        case ("txn", JObject(t)) =>
          val tm = t.toMap
          for {
            app <- tm.get("appId").collect { case JString(a) => a }
            ver <- tm.get("version").collect {
              case JLong(l) => l; case JInt(i) => i.toLong
            }
          } st.txns(app) = math.max(ver, st.txns.getOrElse(app, Long.MinValue))
        // commitInfo / cdc / domainMetadata carry no snapshot state; a
        // table REQUIRING them to read gates via protocol features
        case _ => ()
      }
      case _ => ()
    }

  private def applyMetaData(st: State, m: Map[String, JValue],
      where: String): Unit = {
    m.get("id").foreach { case JString(i) => st.tableId = i; case _ => () }
    m.get("format").foreach {
      case JObject(f) => f.toMap.get("provider").foreach {
        case JString(p) => require(p.equalsIgnoreCase("parquet"),
          s"$where: unsupported data format '$p' (parquet only)")
        case _ => ()
      }
      case _ => ()
    }
    m.get("schemaString").foreach {
      case JString(s) =>
        // Delta's schemaString IS Spark's StructType JSON dialect —
        // including the column-mapping field metadata
        st.schema = DataType.fromJson(s).asInstanceOf[StructType]
        st.physical = st.schema.fields.flatMap { f =>
          if (f.metadata.contains("delta.columnMapping.physicalName"))
            Some(f.name ->
              f.metadata.getString("delta.columnMapping.physicalName"))
          else None
        }.toMap
      case _ => ()
    }
    st.partitionBy = m.get("partitionColumns").collect {
      case JArray(ps) => ps.collect { case JString(p) => p }
    }.getOrElse(st.partitionBy)
    st.config = m.get("configuration").collect {
      case JObject(cs) => cs.collect { case (k, JString(v)) => k -> v }.toMap
    }.getOrElse(st.config)
    // `id` mapping mode: parquet columns resolve by FIELD ID, not name
    // (the file's column names are free to differ from physicalName —
    // iceberg-converted tables do). Spark's reader speaks field ids
    // natively when the read schema carries `parquet.field.id`
    // metadata, so translate Delta's `delta.columnMapping.id` into it
    // once here — every downstream read (snapshot scans, row-position
    // DV reads, CDF) inherits the id-resolving schema through the
    // shared physSchema copy.
    if (st.config.get("delta.columnMapping.mode").contains("id") &&
        st.schema != null)
      st.schema = StructType(st.schema.fields.map { f =>
        if (f.metadata.contains("delta.columnMapping.id") &&
            !f.metadata.contains("parquet.field.id"))
          f.copy(metadata = new MetadataBuilder()
            .withMetadata(f.metadata)
            .putLong("parquet.field.id",
              f.metadata.getLong("delta.columnMapping.id"))
            .build())
        else f
      })
  }

  /** Delta per-file `stats` JSON → (numRecords, typed graft ColStats).
    * Values land in the DECODED representation [[DeltaLite]] prunes on
    * (epoch-day / epoch-micros longs for temporal types), so
    * `pruneFiles` treats an interop snapshot exactly like a native one.
    * Unparseable or unknown-typed values drop to no-stat (pruning is
    * only ever an optimization). Delta may truncate string maxValues to
    * a 32-char prefix with the last char incremented — still a valid
    * upper bound, used as-is. Nested-struct stats are skipped (we never
    * prune on nested fields). */
  private def parseStats(statsJson: String, schema: StructType,
      partitionBy: Seq[String],
      physical: Map[String, String] = Map.empty)
      : (Long, Map[String, ColStats]) = {
    // stats are keyed by the PHYSICAL column name (identity when the
    // table has no mapping) — exactly how graft's own AddFile.stats
    // are keyed, so the decoded map feeds pruneFiles unchanged
    val types: Map[String, DataType] =
      if (schema == null) Map.empty
      else schema.fields.filterNot(f => partitionBy.contains(f.name))
        .map(f => physical.getOrElse(f.name, f.name) -> f.dataType).toMap
    try {
      val o = JsonMethods.parse(statsJson) match {
        case JObject(fs) => fs.toMap
        case _ => return (0L, Map.empty)
      }
      val rows = o.get("numRecords").collect {
        case JLong(l) => l; case JInt(i) => i.toLong
      }.getOrElse(0L)
      def side(key: String): Map[String, Any] = o.get(key) match {
        case Some(JObject(cols)) => cols.flatMap { case (c, v) =>
          types.get(c).flatMap(dt => decodeDeltaStat(dt, v)).map(c -> _)
        }.toMap
        case _ => Map.empty
      }
      val mins = side("minValues")
      val maxs = side("maxValues")
      val stats = (mins.keySet ++ maxs.keySet).map(c =>
        c -> ColStats(mins.get(c), maxs.get(c))).toMap
      (rows, stats)
    } catch { case _: Exception => (0L, Map.empty) }
  }

  /** One Delta-JSON stat value → graft's decoded representation.
    * PROTOCOL.md "Per-file statistics": dates as `yyyy-MM-dd` strings,
    * timestamps as ISO-8601 strings (with offset for TIMESTAMP, naive
    * for TIMESTAMP_NTZ), numbers as JSON numbers. */
  private def decodeDeltaStat(dt: DataType, j: JValue): Option[Any] =
    try (dt, j) match {
      case (_, JNull | JNothing) => None
      case (ByteType | ShortType | IntegerType | LongType, JInt(i)) =>
        Some(i.toLong)
      case (ByteType | ShortType | IntegerType | LongType, JLong(l)) =>
        Some(l)
      case (FloatType | DoubleType, JDouble(d)) => Some(d)
      case (FloatType | DoubleType, JDecimal(d)) => Some(d.toDouble)
      case (FloatType | DoubleType, JInt(i)) => Some(i.toDouble)
      case (FloatType | DoubleType, JLong(l)) => Some(l.toDouble)
      case (_: DecimalType, JDecimal(d)) => Some(d)
      case (_: DecimalType, JInt(i)) => Some(BigDecimal(i))
      case (_: DecimalType, JLong(l)) => Some(BigDecimal(l))
      case (_: DecimalType, JDouble(d)) => Some(BigDecimal(d))
      case (_: DecimalType, JString(s)) => Some(BigDecimal(s))
      case (StringType, JString(s)) => Some(s)
      case (DateType, JString(s)) =>
        Some(java.time.LocalDate.parse(s).toEpochDay)
      case (TimestampType | TimestampNTZType, JString(s)) =>
        Some(parseIsoMicros(s))
      case _ => None
    } catch { case _: Exception => None }

  /** ISO-8601 (with or without offset) → epoch micros. */
  private def parseIsoMicros(s: String): Long = {
    val inst =
      try java.time.OffsetDateTime.parse(s).toInstant
      catch { case _: Exception =>
        java.time.LocalDateTime.parse(s)
          .toInstant(java.time.ZoneOffset.UTC)
      }
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** Replay the standard log to (and including) `asOf` (default
    * latest) into graft's snapshot model. Starts from the newest
    * classic checkpoint ≤ target when the JSON commits alone don't
    * reach back to version 0; throws — naming what's missing — when
    * neither can reconstruct the state. */
  def snapshot(spark: SparkSession, path: String,
      asOf: Option[Long] = None): Snapshot = {
    val (target, st) = replayState(spark, path, asOf)
    toSnapshot(target, st)
  }

  private def toSnapshot(version: Long, st: State): Snapshot =
    Snapshot(version, st.schema, st.live.values.toSeq,
      txns = st.txns.toMap, partitionBy = st.partitionBy,
      physical = st.physical, properties = st.config)

  /** The full replay including the parts [[DeltaLite.Snapshot]] has no
    * slot for (writer protocol) — the export surfaces gate on it. */
  private def replayState(spark: SparkSession, path: String,
      asOf: Option[Long] = None): (Long, State) = {
    val log = listing(path)
    val jsons = log.jsons
    val cps = log.cps
    // a version with BOTH a classic and a v2 checkpoint restates the
    // same state — prefer the classic one (single read, no sidecars)
    val v2s = log.v2s.filterNot(kv => cps.contains(kv._1))
    val latest = log.latest.getOrElse(
      sys.error(s"no standard Delta log at $path"))
    val target = asOf.getOrElse(latest)
    require(target <= latest && (jsons.contains(target) ||
        cps.contains(target) || v2s.contains(target)),
      s"version $target does not exist at $path (latest: $latest)")
    val st = new State
    // JSON-only replay when commits cover 0..target; otherwise replay
    // the newest checkpoint ≤ target whose tail commits are all present
    val fromCp: Option[Long] =
      if (jsons.headOption.contains(0L) &&
          jsons.takeWhile(_ <= target) == (0L to target)) None
      else {
        val cp = (cps.keySet ++ v2s.keySet).filter(_ <= target).maxOption
          .getOrElse(
            sys.error(s"cannot reconstruct version $target at $path: JSON " +
              s"commits ${jsons.headOption.getOrElse("none")}..${jsons.lastOption
                .getOrElse("none")} do not reach version 0 and no " +
              "checkpoint (classic or v2) ≤ target exists"))
        require(((cp + 1) to target).forall(jsons.contains),
          s"cannot reconstruct version $target at $path: commits after " +
            s"checkpoint $cp are incomplete")
        Some(cp)
      }
    fromCp.foreach { cp =>
      // a checkpoint restates the complete state at cp as action rows
      // — one Spark job (plus one per sidecar set), metadata-proportional
      val rows: Seq[JValue] =
        if (cps.contains(cp))
          spark.read.parquet(cps(cp).map(_.toString): _*)
            .toJSON.collect().toSeq.map(JsonMethods.parse(_))
        else v2CheckpointActions(spark, path, cp, v2s(cp))
      applyActionsMetaFirst(st, rows, s"checkpoint $cp")
    }
    ((fromCp.map(_ + 1L).getOrElse(0L)) to target).foreach { v =>
      val f = logDir(path).resolve(f"$v%020d.json")
      applyActionsMetaFirst(st,
        Files.readAllLines(f).asScala.filter(_.nonEmpty).toSeq
          .map(JsonMethods.parse(_)), s"commit $v")
    }
    require(st.schema != null,
      s"no metaData action found replaying $path to version $target")
    checkProtocol(path, st)
    (target, st)
  }

  /** One v2 checkpoint manifest → the full action row set: validates
    * the mandatory `checkpointMetadata` (its declared version must
    * match the file name — a copied manifest must never replay as the
    * wrong version), then appends the referenced sidecar files'
    * add/remove rows. A MISSING sidecar fails loudly — replaying
    * without it would silently drop its file actions, the wrong-rows
    * outcome this module never produces. `checkpointMetadata` and
    * `sidecar` keys are inert in [[applyParsedAction]], so the
    * combined row set replays through the one shared path. */
  private def v2CheckpointActions(spark: SparkSession, path: String,
      cp: Long, manifest: Path): Seq[JValue] = {
    val raw: Seq[JValue] =
      if (manifest.toString.endsWith(".json"))
        Files.readAllLines(manifest).asScala.filter(_.nonEmpty).toSeq
          .map(JsonMethods.parse(_))
      else spark.read.parquet(manifest.toString)
        .toJSON.collect().toSeq.map(JsonMethods.parse(_))
    def field(jv: JValue, k: String): Option[Map[String, JValue]] =
      jv match {
        case JObject(fs) => fs.collectFirst {
          case (`k`, JObject(o)) => o.toMap }
        case _ => None
      }
    val metas = raw.flatMap(field(_, "checkpointMetadata"))
    require(metas.nonEmpty,
      s"v2 checkpoint $manifest carries no checkpointMetadata action " +
        "(mandatory per spec) — refusing to replay an unidentified " +
        "manifest")
    metas.foreach { m =>
      val v = m.get("version").collect {
        case JInt(i) => i.toLong; case JLong(l) => l }
      require(v.contains(cp),
        s"v2 checkpoint $manifest declares version " +
          s"${v.getOrElse("<none>")} but is named for version $cp")
    }
    val sidecarActions: Seq[JValue] = {
      val refs = raw.flatMap(field(_, "sidecar")).map(s =>
        s.get("path").collect { case JString(p) => p }.getOrElse(
          sys.error(s"v2 checkpoint $manifest: sidecar action " +
            "without a path")))
      if (refs.isEmpty) Nil
      else {
        val sdir = logDir(path).resolve("_sidecars")
        val files = refs.map { p =>
          val cand = Paths.get(decodePath(p))
          val resolved = if (cand.isAbsolute) cand else sdir.resolve(cand)
          require(Files.isRegularFile(resolved),
            s"sidecar '$p' of v2 checkpoint $manifest is missing — " +
              "replaying without it would silently drop its file actions")
          resolved.toString
        }
        spark.read.parquet(files: _*)
          .toJSON.collect().toSeq.map(JsonMethods.parse(_))
      }
    }
    raw ++ sidecarActions
  }

  private def checkProtocol(path: String, st: State): Unit = {
    val mappingMode = st.config.getOrElse("delta.columnMapping.mode", "none")
    // `name` mode reads natively: the physical names feed the SAME
    // logical→physical aliasing graft's own RENAME COLUMN machinery
    // uses in readFiles. `id` mode reads by parquet FIELD ID (the
    // translated parquet.field.id metadata + Spark's field-id reader —
    // see applyMetaData); anything else declines loudly.
    require(mappingMode == "none" || mappingMode == "name" ||
        mappingMode == "id",
      s"$path requires column mapping mode '$mappingMode' — unsupported")
    require(mappingMode == "none" || (st.schema != null &&
        st.schema.fields.forall(f =>
          f.metadata.contains("delta.columnMapping.physicalName"))),
      s"$path declares column mapping mode '$mappingMode' but not EVERY " +
        "field carries delta.columnMapping.physicalName metadata — a " +
        "partially-mapped schema would silently resolve the unmapped " +
        "columns by the wrong (logical) name")
    require(mappingMode != "id" ||
        st.schema.fields.forall(f =>
          f.metadata.contains("delta.columnMapping.id")),
      s"$path declares column mapping mode 'id' but not EVERY field " +
        "carries delta.columnMapping.id metadata — field-id resolution " +
        "would silently miss the unmapped columns")
    if (st.minReader >= 3) {
      val unsupported = st.readerFeatures.filterNot(SupportedReaderFeatures)
      require(unsupported.isEmpty,
        s"$path requires reader features ${unsupported.mkString(", ")} — " +
          s"unsupported (this reader implements: " +
          s"${SupportedReaderFeatures.toSeq.sorted.mkString(", ")})")
    } else require(st.minReader <= 2,
      s"$path requires minReaderVersion ${st.minReader} — unsupported")
  }

  // -------------------------------------------------------------- reads

  /** Snapshot read of a standard Delta table — one parquet scan over
    * exactly the live files, schema from the log, Hive-partition
    * columns re-attached as typed literals from `partitionValues`
    * (all via [[DeltaLite.readFiles]] — shared machinery, not a port). */
  def read(spark: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, path, asOf)
    stripFieldIds(readLive(spark, path, snap.schema, snap.files,
      snap.partitionBy, snap.physical, snap.properties))
  }

  /** DVs small enough broadcast their positions to the anti-join;
    * larger ones fall back to a shuffled anti-join, the plan that
    * survives a mostly-deleted 100 TB table. The decision weighs
    * BYTES, not row count (each position row carries the file's full
    * path string — a 4M-row broadcast of date-partitioned paths is
    * hundreds of MB; review finding), estimated from the log alone
    * (cardinality × path length — no decode needed to decide). */
  private val BroadcastDvMaxBytes = 64L << 20

  /** Snapshot-file read with deletion vectors applied: DV-free files
    * take the untouched fast path ([[DeltaLite.readFiles]], no
    * row_index plumbing); DV-carrying files read position-aware and
    * anti-join their decoded deleted positions. The DV side holds only
    * compact roaring BYTES on the driver; position expansion happens
    * on executors. */
  /** Spark's parquet reader resolves columns by FIELD ID (instead of
    * name) only under this conf; flip it on lazily the first time an
    * id-mapped schema (carrying the translated `parquet.field.id`
    * metadata — see applyMetaData) reaches a read. The conf is
    * SESSION-GLOBAL and consumed at plan time (ParquetFileFormat
    * re-sets the hadoopConf key from the session conf, so a per-read
    * option cannot scope it) — schemas without the metadata keep
    * resolving by name, and [[stripFieldIds]] keeps the metadata from
    * leaking out through returned frames, so the only reads whose
    * semantics change are ones whose requested schema EXPLICITLY
    * carries `parquet.field.id` — i.e. callers who opted into id
    * resolution (review finding). */
  private def ensureFieldIdRead(spark: SparkSession,
      schema: StructType): Unit =
    if (schema != null && schema.fields.exists(
        _.metadata.contains("parquet.field.id")))
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

  /** The translated `parquet.field.id` metadata must not LEAK out of
    * the interop read: [[ensureFieldIdRead]] leaves the session's
    * field-id reader on, so a caller who copies a returned frame's
    * schema to read OTHER parquet would silently switch that read from
    * by-name to by-id resolution (erroring on id-less files, or worse,
    * resolving different columns — review finding). Aliases with
    * explicit stripped metadata; identity when nothing to strip. */
  private def stripFieldIds(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(_.metadata.contains("parquet.field.id")))
      df
    else {
      import org.apache.spark.sql.functions.col
      df.select(df.schema.fields.map { f =>
        val m = new MetadataBuilder().withMetadata(f.metadata)
          .remove("parquet.field.id").build()
        col(f.name).as(f.name, m)
      }.toSeq: _*)
    }

  private def readLive(spark: SparkSession, path: String,
      schema: StructType, files: Seq[AddFile], partitionBy: Seq[String],
      physical: Map[String, String], props: Map[String, String])
      : DataFrame = {
    ensureFieldIdRead(spark, schema)
    val (dvFiles, plain) = files.partition(f => dvDescriptor(f).isDefined)
    val plainDf = DeltaLite.readFiles(spark, path, schema, plain,
      partitionBy, physical, props)
    if (dvFiles.isEmpty) plainDf
    else plainDf.unionByName(readMinusOwnDv(spark, path, schema, dvFiles,
      partitionBy, physical, props))
  }

  /** Rows of `dvFiles` MINUS each file's own deletion vector. */
  private def readMinusOwnDv(spark: SparkSession, path: String,
      schema: StructType, dvFiles: Seq[AddFile], partitionBy: Seq[String],
      physical: Map[String, String], props: Map[String, String])
      : DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    requireNoPosCollision(schema, physical, "deletion-vector read")
    val (pos, estBytes) = dvPositionsFrame(spark, path,
      dvFiles.flatMap(f => dvDescriptor(f).map(f.path -> _)))
    val withPos = DeltaLite.readFilesWithPos(spark, path, schema,
      dvFiles.map(_.copy(dv = None)), partitionBy, physical, props)
    val dvSide =
      if (estBytes <= BroadcastDvMaxBytes) broadcast(pos) else pos
    withPos.join(dvSide,
      col("path") === col("__dv_path") &&
        col("row_index") === col("__dv_ri"), "left_anti")
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Rows of `files` AT the given positions only (the change-feed's
    * "exactly the newly-deleted/restored rows" read). */
  private def readOnlyPositions(spark: SparkSession, path: String,
      schema: StructType, files: Seq[AddFile], partitionBy: Seq[String],
      physical: Map[String, String], props: Map[String, String],
      pos: DataFrame, estBytes: Long): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    ensureFieldIdRead(spark, schema)
    requireNoPosCollision(schema, physical, "deletion-vector change feed")
    val withPos = DeltaLite.readFilesWithPos(spark, path, schema,
      files.map(_.copy(dv = None)), partitionBy, physical, props)
    val dvSide =
      if (estBytes <= BroadcastDvMaxBytes) broadcast(pos) else pos
    withPos.join(dvSide,
      col("path") === col("__dv_path") &&
        col("row_index") === col("__dv_ri"), "left_semi")
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** The row-position reads inject `path`/`row_index` columns (the
    * shared [[DeltaLite.readFilesWithPos]] plumbing); a FOREIGN table
    * whose own columns use either name would collide and misread —
    * decline loudly instead (the pre-DV behavior for such tables),
    * never serve the file path as the user's data. */
  private def requireNoPosCollision(schema: StructType,
      physical: Map[String, String], what: String): Unit = {
    val taken = schema.fieldNames.toSet ++ physical.values
    val clash = Seq("path", "row_index").filter(taken)
    require(clash.isEmpty,
      s"$what: the table has a column named ${clash.mkString("/")}, " +
        "which collides with the row-position plumbing the DV " +
        "anti-filter rides — this reader declines rather than risk " +
        "serving wrong values; OPTIMIZE/VACUUM the source to " +
        "materialize its deletes first")
  }

  /** (`__dv_path`, `__dv_ri`) frame of the given descriptors' deleted
    * positions. The driver holds (path, roaring bytes, cardinality)
    * triples — metadata-proportional, like the log itself; executors
    * decode and expand, and each decode is cardinality-checked against
    * the log's declared count (a short decode would silently resurrect
    * rows). Returns the frame plus an estimated materialized byte
    * weight (the broadcast decision input — path strings dominate). */
  private def dvPositionsFrame(spark: SparkSession, path: String,
      descs: Seq[(String, DeletionVectors.Descriptor)])
      : (DataFrame, Long) = {
    val r = root(path)
    val payload: Seq[(String, Array[Byte], Long)] = descs.map {
      case (rel, d) => (rel, DeletionVectors.bitmapBytes(r, d),
        d.cardinality)
    }
    val total = descs.map { case (rel, d) =>
      d.cardinality * (rel.length.toLong * 2 + 24) }.sum
    import spark.implicits._
    val df = spark.sparkContext
      .parallelize(payload, math.max(1, math.min(payload.size, 32)))
      .flatMap { case (rel, bytes, card) =>
        val ps = DeletionVectors.positions(bytes)
        require(ps.length == card,
          s"deletion vector of '$rel' decodes to ${ps.length} " +
            s"positions but the log declares cardinality $card " +
            "(corrupt DV)")
        ps.iterator.map(ri => (rel, ri))
      }
      .toDF("__dv_path", "__dv_ri")
    (df, total)
  }

  /** Stats-pruned read: files whose logged min/max (or partition
    * values) prove no row can match `bounds` are never opened — Delta's
    * `stats` JSON feeds the exact same [[DeltaLite.pruneFiles]] core
    * the native format uses. */
  def scan(spark: SparkSession, path: String,
      bounds: Seq[DeltaLite.ColumnBound],
      asOf: Option[Long] = None): DataFrame =
    scanSnapshot(spark, path, snapshot(spark, path, asOf), bounds)

  /** [[scan]] over an ALREADY-REPLAYED snapshot — the V1 relation
    * replays once for its schema and reuses that state for every
    * buildScan instead of re-walking the log per scan (review
    * finding: the interop path paid two full replays per query while
    * the native twin served from its snapshot cache). */
  private[sources] def scanSnapshot(spark: SparkSession, path: String,
      snap: Snapshot, bounds: Seq[DeltaLite.ColumnBound]): DataFrame =
    // DV files' rows/stats are PHYSICAL upper bounds (a DV only ever
    // removes rows), so stats pruning stays sound before the DV
    // anti-filter applies
    readLive(spark, path, snap.schema,
      DeltaLite.pruneFiles(snap, bounds),
      snap.partitionBy, snap.physical, snap.properties)

  // ------------------------------------------------- per-commit folding

  /** Per-THREAD commits-parsed counter — the O(range)-not-O(range²)
    * pin's measurement hook: the fold-pin test diffs it around a call
    * (suites run in parallel, so a global counter would absorb other
    * threads' folds; construction runs on the calling thread, so the
    * thread-local sees exactly this call's work). */
  private[graft] val foldedCommitsLocal = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }

  /** One parsed add/remove/cdc action of a commit (raw partition-value
    * keys — PHYSICAL under column mapping; consumers translate). `dv`
    * is the add action's deletionVector descriptor, when present. */
  private final case class CommitAct(kind: String, rel: String,
      rawPv: Map[String, String], dataChange: Boolean,
      dv: Option[DeletionVectors.Descriptor] = None)

  /** THE per-commit fold both [[tableChanges]] and
    * [[readVersionAppends]] run on (review finding: two drifting
    * copies of the replay skeleton): verifies the range's commit JSONs
    * still exist (a checkpoint restates STATE, not per-commit
    * changes), seeds the state at `from - 1` (one snapshot — uses a
    * checkpoint when available), then per commit parses the action
    * lines ONCE, hands the consumer the pre-commit live-file map plus
    * the commit's visible actions, advances the state through the
    * commit, and re-gates the protocol. O(total touched files) for
    * any range. The consumer sees `st` AFTER the commit applied (the
    * at-v schema/partition/physical view). */
  private def foldCommitRange[A](spark: SparkSession, path: String,
      from: Long, to: Long, what: String)(
      consume: (Long, State, Map[String, AddFile], Seq[CommitAct]) => A)
      : Seq[A] = {
    val jsons = commitVersions(path)
    val jsonSet = jsons.toSet
    (from to to).foreach(v => require(jsonSet.contains(v),
      s"$what unavailable for version $v at $path: its commit JSON " +
        "has been cleaned up (a checkpoint restates STATE, not " +
        "per-commit changes); earliest JSON commit: " +
        s"${jsons.headOption.getOrElse(-1L)}"))
    val st = new State
    if (from > 0) {
      val base = snapshot(spark, path, Some(from - 1))
      base.files.foreach(f => st.live(f.path) = f)
      st.schema = base.schema
      st.partitionBy = base.partitionBy
      st.physical = base.physical
      st.config = base.properties
    }
    (from to to).map { v =>
      foldedCommitsLocal.set(foldedCommitsLocal.get() + 1L)
      val parsed = Files.readAllLines(
        logDir(path).resolve(f"$v%020d.json")).asScala
        .filter(_.nonEmpty).map(JsonMethods.parse(_))
      val prevFiles: Map[String, AddFile] = st.live.toMap
      val acts = parsed.flatMap {
        case JObject(fields) => fields.collectFirst {
          case (k @ ("add" | "remove" | "cdc"), JObject(a)) =>
            val am = a.toMap
            CommitAct(k,
              decodePath(am.get("path").collect { case JString(x) => x }
                .getOrElse(sys.error(
                  s"commit $v at $path: $k action without a path"))),
              am.get("partitionValues") match {
                case Some(JObject(vals)) =>
                  vals.collect { case (c, JString(x)) => c -> x }.toMap
                case _ => Map.empty[String, String]
              },
              am.get("dataChange") match {
                case Some(JBool(b)) => b
                case _ => true // absent = data-changing
              },
              dv = if (k != "add") None
                else am.get("deletionVector").collect {
                  case o @ JObject(_) =>
                    DeletionVectors.parseJValue(o, s"commit $v")
                })
        }
        case _ => None
        // cdc actions carry dataChange=false BY SPEC (they describe
        // the change, they don't change the table) — the flag only
        // gates add/remove visibility
      }.filter(a => a.kind == "cdc" || a.dataChange).toSeq
      applyActionsMetaFirst(st, parsed.toSeq, s"commit $v")
      checkProtocol(path, st)
      consume(v, st, prevFiles, acts)
    }
  }

  // ---------------------------------------------------------------- CDF

  /** Row-level CHANGE FEED over a standard Delta table — Delta's
    * `table_changes(from, to)` semantics (both bounds inclusive;
    * version 0 delivers the initial contents as inserts):
    *
    *   - a commit's `add` actions with `dataChange = true` surface as
    *     `insert` rows; its `remove` actions (dataChange = true) as
    *     `delete` rows, read from the files' pre-commit content;
    *   - `dataChange = false` actions are INVISIBLE — an OPTIMIZE /
    *     compaction rewrite moves bytes, not rows, and a feed that
    *     re-emitted them would double-apply every row downstream;
    *   - when a commit carries `cdc` actions (a writer materialized
    *     change files under `_change_data/`), those files are the ONLY
    *     source for that commit (PROTOCOL.md's CDF rule — the
    *     add/remove actions of an UPDATE don't distinguish
    *     update_preimage from delete).
    *
    * Output: table columns + `_change_type` + `_commit_version`.
    * Scale: per commit one pass over only the files that commit
    * touched — the same O(changed files) shape as the native
    * [[DeltaLite.changes]]; schema/partition context replays per
    * version (driver-side log work). */
  def tableChanges(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion >= 0 && fromVersion <= toVersion,
      s"invalid change range [$fromVersion, $toVersion]")
    import org.apache.spark.sql.functions.{col, lit}
    var lastSchema: StructType = null
    val perCommit = foldCommitRange(spark, path, fromVersion, toVersion,
        "change feed") { (v, st, prevFiles, acts) =>
      val schema = st.schema
      lastSchema = schema
      val partitionBy = st.partitionBy
      val physical = st.physical
      def phys(c: String) = physical.getOrElse(c, c)
      val cdcs = acts.filter(_.kind == "cdc")
      if (cdcs.nonEmpty) {
        // cdc files carry the table columns + _change_type as DATA;
        // their partitionValues are raw (physical under mapping)
        ensureFieldIdRead(spark, schema)
        val p2l = st.physToLogical
        val dataFields = schema.fields
          .filterNot(f => partitionBy.contains(f.name))
          .map(f => f.copy(name = phys(f.name)))
        val cdcSchema = StructType(dataFields :+
          StructField("_change_type", StringType))
        val r = root(path)
        val frames = cdcs
          .map(a => a.copy(rawPv = a.rawPv.map { case (k, x) =>
            p2l.getOrElse(k, k) -> x }))
          .groupBy(_.rawPv).toSeq.sortBy(_._1.toString)
          .map { case (pv, group) =>
            val base = spark.read.schema(cdcSchema)
              .parquet(group.map(a => r.resolve(a.rel).toString): _*)
              .select(schema.fields
                .filterNot(f => partitionBy.contains(f.name))
                .map(f => col(phys(f.name)).as(f.name)).toSeq :+
                col("_change_type"): _*)
            partitionBy.foldLeft(base) { (d, c) =>
              val dt = schema(c).dataType
              d.withColumn(c, pv.get(c)
                .map(x => lit(x).cast(dt)).getOrElse(lit(null).cast(dt)))
            }.select(schema.fieldNames.map(col).toSeq :+
              col("_change_type"): _*)
          }
        Some(frames.reduce(_ unionByName _)
          .withColumn("_commit_version", lit(v)))
      } else {
        val addActs = acts.filter(_.kind == "add")
        val addRelSet = addActs.map(_.rel).toSet
        // a path that was live at v-1 and is RE-ADDED here is a DV flip
        // (or an idempotent re-add): its row-level changes are the DV
        // DIFF, not a wholesale re-insert — re-emitting the surviving
        // rows would double-apply them downstream, the same failure
        // class as surfacing a compaction
        val (readds, freshActs) =
          addActs.partition(a => prevFiles.contains(a.rel))
        val freshRels = freshActs.map(_.rel).toSet
        val fresh = st.live.values
          .filter(f => freshRels.contains(f.path)).toSeq
        val removedOnly = acts
          .filter(a => a.kind == "remove" && !addRelSet.contains(a.rel))
          .map { a =>
            prevFiles.getOrElse(a.rel, sys.error(
              s"commit $v at $path removes '${a.rel}', which is not a " +
                s"live file at version ${v - 1} — the change feed cannot " +
                "reconstruct its deleted rows (corrupt or externally " +
                "modified log)"))
          }
        // fresh inserts and whole-file deletes apply each file's own DV
        // (an added file can be BORN with a DV; a removed file's
        // pre-commit content excludes its already-deleted rows)
        def readAs(files: Seq[AddFile], label: String) =
          readLive(spark, path, schema, files, partitionBy, physical,
            st.config)
            .withColumn("_change_type", lit(label))
        val flipFrames: Seq[DataFrame] = if (readds.isEmpty) Nil else {
          val flipFiles = readds.map(a => prevFiles(a.rel))
          val (newPos, newBytes) = dvPositionsFrame(spark, path,
            readds.flatMap(a => a.dv.map(a.rel -> _)))
          val (oldPos, oldBytes) = dvPositionsFrame(spark, path,
            flipFiles.flatMap(f => dvDescriptor(f).map(f.path -> _)))
          def diff(a: DataFrame, b: DataFrame): DataFrame =
            a.join(b.withColumnRenamed("__dv_path", "__o_p")
                .withColumnRenamed("__dv_ri", "__o_r"),
              col("__dv_path") === col("__o_p") &&
                col("__dv_ri") === col("__o_r"), "left_anti")
          // newly-deleted rows (in the new DV, not the old) are deletes;
          // restored rows (dropped from the DV) are inserts
          Seq(
            readOnlyPositions(spark, path, schema, flipFiles, partitionBy,
              physical, st.config, diff(newPos, oldPos), newBytes)
              .withColumn("_change_type", lit("delete")),
            readOnlyPositions(spark, path, schema, flipFiles, partitionBy,
              physical, st.config, diff(oldPos, newPos), oldBytes)
              .withColumn("_change_type", lit("insert")))
        }
        (if (fresh.nonEmpty) Some(readAs(fresh, "insert")) else None)
          .toSeq ++
          (if (removedOnly.nonEmpty)
            Some(readAs(removedOnly, "delete")) else None) ++
          flipFrames match {
          case Nil => None
          case fs => Some(fs.reduce(_ unionByName _)
            .withColumn("_commit_version", lit(v)))
        }
      }
    }
    stripFieldIds(perCommit.flatten.reduceOption(_ unionByName _).getOrElse {
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(lastSchema.fields ++ Seq(
          StructField("_change_type", StringType, nullable = false),
          StructField("_commit_version", LongType, nullable = false))))
    })
  }

  /** The files version `v`'s commit ADDED (dataChange only), read as
    * rows with the at-v schema — the streaming-source batch unit over
    * a standard log. `allowRewrites=false` (Delta's streaming default)
    * throws on a data-changing remove in range: a MERGE/DELETE rewrote
    * rows the stream already delivered, and silently re-reading the
    * rewritten files would duplicate them downstream. Returns per
    * version so the caller controls batching; one pass over each
    * commit's own actions — O(touched files), like [[tableChanges]]. */
  def readVersionAppends(spark: SparkSession, path: String,
      fromExclusive: Option[Long], toVersion: Long,
      allowRewrites: Boolean = false,
      emptySchema: Option[StructType] = None): DataFrame = {
    val from = fromExclusive.map(_ + 1L).getOrElse(0L)
    if (from > toVersion) {
      // empty range (restart replays, startingVersion ahead of the
      // log): serve the caller-cached schema instead of paying a full
      // snapshot replay per empty micro-batch (review finding)
      val sch = emptySchema.getOrElse(
        snapshot(spark, path, Some(toVersion)).schema)
      return stripFieldIds(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), sch))
    }
    foldCommitRange(spark, path, from, toVersion, "streaming read") {
        (v, st, prevFiles, acts) =>
      // a DV flip on an already-live path IS a rewrite: the stream
      // delivered those rows already and the new add re-describes them
      val dvFlip = acts.exists(a =>
        a.kind == "add" && prevFiles.contains(a.rel))
      require((!acts.exists(_.kind == "remove") && !dvFlip) ||
          allowRewrites,
        s"version $v at $path rewrote or deleted rows mid-stream — a " +
          "version-offset stream would re-deliver or lose them; pass " +
          "ignoreChanges=true to accept re-delivered rewritten rows " +
          "(Delta's contract)")
      val addRels = acts.iterator.filter(_.kind == "add").map(_.rel).toSet
      val files = st.live.values.filter(f => addRels.contains(f.path)).toSeq
      // files carry their DV markers — delivery excludes deleted rows
      readLive(spark, path, st.schema, files,
        st.partitionBy, st.physical, st.config)
    }.reduce(_ unionByName _).transform(stripFieldIds)
  }

  /** `TIMESTAMP AS OF`: the last version committed at or before `tsMs`
    * — `commitInfo.timestamp` when the commit carries one, else the
    * commit file's modification time (Delta's documented fallback). */
  def versionAtTimestamp(path: String, tsMs: Long): Long = {
    val vs = commitVersions(path)
    require(vs.nonEmpty, s"no standard Delta log at $path")
    val stamped = vs.map(v => v -> commitTimestamp(path, v))
    val at = stamped.filter(_._2 <= tsMs).map(_._1)
    require(at.nonEmpty,
      s"no commit at or before timestamp $tsMs at $path " +
        s"(earliest: ${stamped.head._2})")
    at.max
  }

  private def commitTimestamp(path: String, v: Long): Long = {
    val f = logDir(path).resolve(f"$v%020d.json")
    val fromInfo = Files.readAllLines(f).asScala.iterator
      .filter(_.contains("\"commitInfo\""))
      .map(JsonMethods.parse(_)).collectFirst {
        case JObject(fs) => fs.collectFirst {
          case ("commitInfo", JObject(ci)) => ci.collectFirst {
            case ("timestamp", JLong(t)) => t
            case ("timestamp", JInt(t)) => t.toLong
          }
        }.flatten
      }.flatten
    fromInfo.getOrElse(Files.getLastModifiedTime(f).toMillis)
  }

  /** `DESCRIBE HISTORY` rows for a standard Delta table — per commit:
    * version, operation, timestamp, add/remove action counts, and the
    * rows added (sum of the adds' stats numRecords; 0 when the writer
    * recorded no stats). One driver pass over each commit's JSON. */
  private[graft] def historyRows(path: String)
      : Seq[(Long, String, Long, Int, Int, Long)] =
    commitVersions(path).map { v =>
      val lines = Files.readAllLines(
        logDir(path).resolve(f"$v%020d.json")).asScala.filter(_.nonEmpty)
      var op = ""
      var ts = -1L
      var nAdd = 0
      var nRemove = 0
      var rowsAdded = 0L
      lines.foreach(l => JsonMethods.parse(l) match {
        case JObject(fields) => fields.foreach {
          case ("commitInfo", JObject(ci)) =>
            val cm = ci.toMap
            cm.get("operation").foreach {
              case JString(o) => op = o; case _ => () }
            cm.get("timestamp").foreach {
              case JLong(t) => ts = t
              case JInt(t) => ts = t.toLong
              case _ => () }
          case ("add", JObject(a)) =>
            nAdd += 1
            a.toMap.get("stats").foreach {
              case JString(x) if x.nonEmpty =>
                rowsAdded += parseStats(x, null, Nil)._1
              case _ => ()
            }
          case ("remove", _) => nRemove += 1
          case _ => ()
        }
        case _ => ()
      })
      (v, op, if (ts >= 0) ts else commitTimestamp(path, v),
        nAdd, nRemove, rowsAdded)
    }

  /** Commit history of a standard Delta table: (version, timestamp,
    * operation) — operation from `commitInfo` when present. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    commitVersions(path).map { v =>
      val op = Files.readAllLines(logDir(path).resolve(f"$v%020d.json"))
        .asScala.iterator.filter(_.contains("\"commitInfo\""))
        .map(JsonMethods.parse(_)).collectFirst {
          case JObject(fs) => fs.collectFirst {
            case ("commitInfo", JObject(ci)) => ci.collectFirst {
              case ("operation", JString(o)) => o
            }
          }.flatten
        }.flatten.getOrElse("")
      (v, new java.sql.Timestamp(commitTimestamp(path, v)), op)
    }.toDF("version", "timestamp", "operation")
  }

  // ---------------------------------------------- CONVERT FROM DELTA

  /** Adopt a standard Delta table as a graft-delta table IN PLACE —
    * zero copy: graft's version 0 re-states the Delta snapshot's live
    * file set (stats, partition values, sizes and all; `txn` app
    * versions carry over so idempotent-append dedup survives the
    * switch). The `_delta_log` stays untouched beside the new
    * `_graft_log`; after convert the table has graft's FULL write
    * surface — nothing distinguishes adopted files from written ones.
    * The 100 TB migration path: one driver-side log replay, no data
    * movement. */
  def convertFromDelta(spark: SparkSession, path: String,
      asOf: Option[Long] = None): Long = {
    require(DeltaLite.latestVersion(path).isEmpty,
      s"a graft-delta table already exists at $path")
    val (v, st) = replayState(spark, path, asOf)
    // `id`-mapped adoption declines: the native read path resolves
    // parquet columns by (physical) NAME, and id-mode files are free
    // to name columns anything (iceberg-converted tables do) — an
    // adopted table could silently read NULLs. Reading/streaming the
    // table through the interop surfaces keeps working.
    require(!st.config.get("delta.columnMapping.mode").contains("id"),
      s"CONVERT FROM DELTA on $path: the table uses column mapping " +
        "mode 'id' — graft's native reader resolves by physical name, " +
        "which id-mode files do not guarantee; keep reading it through " +
        "the interop surfaces instead")
    val snap = toSnapshot(v, st)
    // foreign deletion vectors ADOPT by translation, not data rewrite:
    // the roaring positions decode once into ONE graft-native DV dir
    // (the (path, row_index) parquet every native read path
    // anti-joins), data files untouched — the convert stays zero-copy
    // on the 100 TB side and pays only O(deleted positions) once
    val dvCarrying = snap.files.filter(f => dvDescriptor(f).isDefined)
    val (files, props) =
      if (dvCarrying.isEmpty) (snap.files, snap.properties)
      else {
        import org.apache.spark.sql.functions.col
        val (pos, _) = dvPositionsFrame(spark, path,
          dvCarrying.flatMap(f => dvDescriptor(f).map(f.path -> _)))
        val dvRel = "dv-00000-adopt-" +
          java.util.UUID.randomUUID.toString.take(8)
        pos.select(col("__dv_path").as("path"),
            col("__dv_ri").as("row_index"))
          .write.mode("errorifexists")
          .parquet(root(path).resolve(dvRel).toString)
        (snap.files.map(f =>
          if (dvDescriptor(f).isDefined) f.copy(dv = Some(dvRel)) else f),
          DeltaLite.withFeature(snap.properties, "deletionVectors",
            reader = true))
      }
    DeltaLite.writeCommit(path, 0L, "CONVERT_FROM_DELTA", snap.schema,
      files, Nil, None, Map.empty, snap.partitionBy, snap.physical,
      Map.empty, Map.empty,
      // delta.* table configuration is provenance, not behavior, on
      // the graft side — carried so SHOW TBLPROPERTIES tells the story
      properties = props,
      txns = snap.txns.toSeq)
  }

  // ------------------------------------------------------------ export

  /** Create a standard Delta table at `path` from `df` — the
    * interchange EXPORT: protocol (1, 2) + metaData + stats-bearing
    * adds, readable by delta-rs/dbt-duckdb/delta-spark (and
    * round-trip-tested against this module's own reader). Single-writer
    * by contract (see class doc). Returns version 0. */
  def exportToDelta(spark: SparkSession, df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Long = {
    require(!isStandardDelta(path) && DeltaLite.latestVersion(path).isEmpty,
      s"a table already exists at $path")
    val dir = root(path)
    Files.createDirectories(dir)
    val adds = writeDataFiles(spark, df, dir, partitionBy)
    val schema = df.schema
    val metaData = JObject(List(
      "id" -> JString(java.util.UUID.randomUUID.toString),
      "format" -> JObject(List("provider" -> JString("parquet"),
        "options" -> JObject(Nil))),
      "schemaString" -> JString(schema.json),
      "partitionColumns" -> JArray(partitionBy.map(JString(_)).toList),
      "configuration" -> JObject(Nil),
      "createdTime" -> JLong(System.currentTimeMillis())))
    val lines =
      Seq(JsonMethods.compact(JObject(List("protocol" -> JObject(List(
          "minReaderVersion" -> JInt(1), "minWriterVersion" -> JInt(2))))))) ++
        Seq(JsonMethods.compact(JObject(List("metaData" -> metaData)))) ++
        adds.map(a => JsonMethods.compact(encodeDeltaAdd(a, schema))) :+
        commitInfoLine("WRITE")
    // a lost CREATE claim is not rebase-able — another writer owns the
    // table now; say so instead of surfacing a raw claim collision
    try writeCommitFile(path, 0L, lines)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"exportToDelta on $path: a concurrent writer created the " +
            "table first", e)
    }
    0L
  }

  /** Append `df` to a standard Delta table — one adds-only commit
    * (Delta does not restate metaData per commit). */
  def exportAppend(spark: SparkSession, df: DataFrame, path: String): Long = {
    val (v0, st0) = replayState(spark, path)
    requireWritable(st0, path, "exportAppend", removesRows = false)
    requireUnmapped(st0, path, "exportAppend")
    requireSchemaMatch(df, st0, path, "exportAppend")
    val adds = writeDataFiles(spark, df, root(path), st0.partitionBy)
    occCommit(spark, path, "exportAppend", Some((v0, st0))) { st =>
      requireWritable(st, path, "exportAppend", removesRows = false)
      requireUnmapped(st, path, "exportAppend")
      requireSchemaMatch(df, st, path, "exportAppend")
      requireSameLayout(st, st0, path, "exportAppend")
      adds.map(a => JsonMethods.compact(encodeDeltaAdd(a, st.schema))) :+
        commitInfoLine("WRITE")
    }
  }

  /** OCC-rebase gate twin of the writability checks: the staged data
    * files were laid out (Hive directories + per-add partitionValues)
    * under the PRE-STAGING partitioning — if a racing foreign writer
    * changed the table's partitioning (overwriteSchema with the same
    * columns passes the schema gate), committing the staged adds would
    * attach stale partitionValues and foreign readers would re-attach
    * the partition columns as NULL (review finding). Decline loudly;
    * the caller re-stages against fresh state. */
  private def requireSameLayout(st: State, st0: State, path: String,
      op: String): Unit =
    require(st.partitionBy == st0.partitionBy,
      s"$op on $path: the table's partitioning changed concurrently " +
        s"(${st0.partitionBy.mkString(",")} -> " +
        s"${st.partitionBy.mkString(",")}) — the staged files follow " +
        "the old layout; re-run the export against the new state")

  /** OVERWRITE the table's contents in one commit — delta-rs's
    * `mode="overwrite"` (the reference stack's most common write):
    * the new batch's adds plus a data-changing remove of every
    * previously-live file, atomically versioned, history still
    * time-travelable. Schema must match (overwrite-with-evolution is
    * the native format's job). */
  def exportOverwrite(spark: SparkSession, df: DataFrame,
      path: String): Long = {
    val (v0, st0) = replayState(spark, path)
    requireWritable(st0, path, "exportOverwrite", removesRows = true)
    requireUnmapped(st0, path, "exportOverwrite")
    requireSchemaMatch(df, st0, path, "exportOverwrite")
    val adds = writeDataFiles(spark, df, root(path), st0.partitionBy)
    occCommit(spark, path, "exportOverwrite", Some((v0, st0))) { st =>
      requireWritable(st, path, "exportOverwrite", removesRows = true)
      requireUnmapped(st, path, "exportOverwrite")
      requireSchemaMatch(df, st, path, "exportOverwrite")
      requireSameLayout(st, st0, path, "exportOverwrite")
      val now = System.currentTimeMillis()
      // the CURRENT live set per attempt — a rebase removes the racing
      // writer's files too, which is exactly what overwrite means
      adds.map(a => JsonMethods.compact(encodeDeltaAdd(a, st.schema))) ++
        st.live.values.map(f => removeLine(f, now)) :+
        commitInfoLine("WRITE")
    }
  }

  /** Partition-aligned DELETE on a standard Delta table: every live
    * file whose `partitionValues` carry `column = value` is removed in
    * one metadata-only commit — zero data rewritten, the delete shape
    * that stays O(log) at 100 TB. Row-level deletes are deliberately
    * NOT offered here (they need DVs or rewrite machinery — the native
    * format's job). */
  def exportDeletePartition(spark: SparkSession, path: String,
      column: String, value: String): Long = {
    occCommit(spark, path, "exportDeletePartition") { st =>
      requireWritable(st, path, "exportDeletePartition", removesRows = true,
        writesRows = false)
      require(st.partitionBy.contains(column),
        s"'$column' is not a partition column of $path " +
          s"(partitioned by: ${st.partitionBy.mkString(", ")})")
      val doomed = st.live.values.filter(_.pv.get(column).contains(value))
        .toSeq
      require(doomed.nonEmpty, s"no live files with $column=$value at $path")
      val now = System.currentTimeMillis()
      doomed.map(removeLine(_, now)) :+ commitInfoLine("DELETE")
    }
  }

  /** Row-level DELETE on a standard Delta table via DELETION VECTORS —
    * the delete shape that stays metadata-proportional at 100 TB: zero
    * data files rewritten; each touched file's deleted row positions
    * land in one packed roaring DV file and the commit flips
    * (remove(old identity) + add(same path, new DV)). The bitmaps
    * build on EXECUTORS (per-file sorted positions → portable roaring
    * bytes); the driver holds only (path, compact bytes, cardinality)
    * — the same metadata-proportional contract the DV READ side keeps.
    * A file already carrying a DV gets the UNION (old ∪ new) — never a
    * DV that forgets prior deletes. First DV on a legacy-protocol
    * table upgrades it in the same commit (minReader 3 / minWriter 7,
    * restating the legacy-implied features per PROTOCOL.md). On an OCC
    * rebase the build re-verifies every touched file is still live
    * under the SAME DV identity the union was computed against — a
    * concurrent flip or file removal declines loudly (delta-spark's
    * concurrent-delete conflict), never commits a DV that would
    * resurrect or double-count rows. Returns the committed version, or
    * the current version unchanged when no live row matches. */
  def exportDeleteWhere(spark: SparkSession, path: String,
      predicate: String): Long = {
    import org.apache.spark.sql.functions.{col, collect_set, expr, sort_array}
    val (v0, st0) = replayState(spark, path)
    requireWritable(st0, path, "exportDeleteWhere", removesRows = true,
      writesRows = false)
    requireUnmapped(st0, path, "exportDeleteWhere")
    requireNoPosCollision(st0.schema, st0.physical,
      "deletion-vector delete")
    val live = st0.live.values.toSeq
    if (live.isEmpty) return v0
    // log-stats candidate pruning — the 100 TB lever: a selective
    // delete must not OPEN every file. The predicate's simple
    // conjuncts translate to stat bounds through the SAME machinery
    // the read path prunes with (BranchFilePruning.boundsOf →
    // DeltaLite.pruneFiles); a file whose logged min/max disprove the
    // predicate holds no matching live row (a DV'd file's stats are
    // PHYSICAL bounds — deletion only shrinks the live set, so
    // pruning stays sound). Analyzing the filter over an empty frame
    // also validates the predicate's names/types before any I/O.
    val probe = spark.createDataFrame(
      new java.util.ArrayList[Row](), st0.schema).filter(expr(predicate))
    val conds = probe.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition -> f.child.outputSet
    }
    // a nondeterministic predicate (rand()-based sampling deletes)
    // cannot produce a consistent DV: the matching scan and any
    // re-evaluation would disagree — delta-spark declines these too
    require(conds.forall(_._1.deterministic),
      s"exportDeleteWhere on $path: predicate '$predicate' is " +
        "nondeterministic — a deletion vector must name a stable row " +
        "set; materialize the choice into a column first")
    val bounds = conds.flatMap { case (c, out) =>
      graft.plans.BranchFilePruning.boundsOf(c, out) }
    val candidates =
      if (bounds.isEmpty) live
      else DeltaLite.pruneFiles(toSnapshot(v0, st0), bounds)
    if (candidates.isEmpty) return v0
    // physical row positions of rows matching the predicate (DV-less
    // read: positions are per-file PHYSICAL indexes, the DV's domain)
    val withPos = DeltaLite.readFilesWithPos(spark, path, st0.schema,
      candidates.map(_.copy(dv = None)), st0.partitionBy, st0.physical,
      st0.config)
    val matches = withPos.filter(expr(predicate))
      .select(col("path"), col("row_index"))
    val oldDvs = candidates.flatMap(f => dvDescriptor(f).map(f.path -> _))
    val (oldPos, _) = dvPositionsFrame(spark, path, oldDvs)
    // rows already deleted must not count as fresh matches (they would
    // make an untouched file look touched and inflate cardinality);
    // the CUT matters: `fresh` feeds BOTH union branches (directly and
    // through `touched`) — uncut, the predicate scan and DV anti-join
    // would execute twice per delete (review finding)
    val fresh = graft.Frames.cut(matches.join(oldPos,
      col("path") === col("__dv_path") &&
        col("row_index") === col("__dv_ri"), "left_anti"))
    dvFlipCommit(spark, path, "exportDeleteWhere", "DELETE", v0, st0,
      fresh, oldPos, () => Nil,
      () => Some(withPos.filter(expr(predicate))
        .join(fresh, Seq("path", "row_index"), "left_semi")
        .drop("path", "row_index")
        .withColumn("_change_type",
          org.apache.spark.sql.functions.lit("delete"))))
  }

  /** Row-level UPDATE via deletion vectors on the export path: DV the
    * matched rows out of their files (zero data-file rewrites of
    * survivors) and append the rewritten rows as fresh files, in ONE
    * OCC commit. `set` maps column name → SQL expression; every
    * expression evaluates against the row's OLD values (standard
    * UPDATE semantics) and casts to the column's declared type.
    * Updating a partition column is allowed — the rewritten rows land
    * in their new partitions through the partitioned stage write.
    * Matching, pruning, DV union, rebase and serializability rules
    * are [[exportDeleteWhere]]'s (shared machinery); the appended
    * files additionally pass the row-writing gates (CHECK/generated/
    * identity/invariants, non-null enforcement). CDF tables get
    * update_preimage/update_postimage change files. */
  def exportUpdateWhere(spark: SparkSession, path: String,
      predicate: String, set: Map[String, String]): Long = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val (v0, st0) = replayState(spark, path)
    requireWritable(st0, path, "exportUpdateWhere", removesRows = true,
      writesRows = true)
    requireUnmapped(st0, path, "exportUpdateWhere")
    requireNoPosCollision(st0.schema, st0.physical,
      "deletion-vector update")
    require(set.nonEmpty, s"exportUpdateWhere on $path: empty SET")
    val unknown = set.keySet -- st0.schema.fieldNames
    require(unknown.isEmpty,
      s"exportUpdateWhere on $path: SET names unknown column(s) " +
        s"${unknown.toSeq.sorted.mkString(", ")}")
    val live = st0.live.values.toSeq
    if (live.isEmpty) return v0
    val emptyT = spark.createDataFrame(
      new java.util.ArrayList[Row](), st0.schema)
    val probe = emptyT.filter(expr(predicate))
    val conds = probe.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition -> f.child.outputSet
    }
    require(conds.forall(_._1.deterministic),
      s"exportUpdateWhere on $path: predicate '$predicate' is " +
        "nondeterministic — a deletion vector must name a stable row " +
        "set; materialize the choice into a column first")
    // SET expressions re-evaluate on rebase retries and feed cdc
    // postimages — nondeterminism would let the three disagree
    val setProbe = emptyT.select(
      set.toSeq.map { case (k, e) => expr(e).as(k) }: _*)
    require(setProbe.queryExecution.analyzed.expressions
        .forall(_.deterministic),
      s"exportUpdateWhere on $path: a SET expression is " +
        "nondeterministic — materialize the choice into a column first")
    val bounds = conds.flatMap { case (c, out) =>
      graft.plans.BranchFilePruning.boundsOf(c, out) }
    val candidates =
      if (bounds.isEmpty) live
      else DeltaLite.pruneFiles(toSnapshot(v0, st0), bounds)
    if (candidates.isEmpty) return v0
    val withPos = DeltaLite.readFilesWithPos(spark, path, st0.schema,
      candidates.map(_.copy(dv = None)), st0.partitionBy, st0.physical,
      st0.config)
    val oldDvs = candidates.flatMap(f => dvDescriptor(f).map(f.path -> _))
    val (oldPos, _) = dvPositionsFrame(spark, path, oldDvs)
    // matched LIVE rows with their data — multi-referenced (positions,
    // rewrite source, cdc preimage), so cut once
    val matchedData = graft.Frames.cut(withPos.filter(expr(predicate))
      .join(oldPos, col("path") === col("__dv_path") &&
        col("row_index") === col("__dv_ri"), "left_anti")
      .drop("__dv_path", "__dv_ri"))
    val fresh = matchedData.select(col("path"), col("row_index"))
    // every SET expression sees the OLD row (one select, not chained
    // withColumn — a chained form would let one SET read another's
    // result); the cast to the declared type is UPDATE's implicit cast
    val rewritten = matchedData.select(st0.schema.fields.map(f =>
      set.get(f.name)
        .map(e => expr(e).cast(f.dataType).as(f.name))
        .getOrElse(col(f.name))).toSeq: _*)
    requireSchemaMatch(rewritten, st0, path, "exportUpdateWhere")
    dvFlipCommit(spark, path, "exportUpdateWhere", "UPDATE", v0, st0,
      fresh, oldPos,
      () => if (matchedData.isEmpty) Nil
        else writeDataFiles(spark, rewritten, root(path), st0.partitionBy),
      () => Some(
        matchedData.drop("path", "row_index")
          .withColumn("_change_type", lit("update_preimage"))
          .unionByName(rewritten
            .withColumn("_change_type", lit("update_postimage")))))
  }

  /** MERGE (upsert) on the export path — the reference stack's
    * bread-and-butter shape (dbt incremental `merge` materialized to
    * a shared Delta table): target rows matching a source row on
    * `keys` are rewritten with the source row's values (WHEN MATCHED
    * THEN UPDATE SET *), source rows matching no live target row
    * insert (WHEN NOT MATCHED THEN INSERT *). Matched target rows DV
    * out of their files; the source batch's rewrites + inserts append
    * as fresh files; ONE OCC commit carries both. Source keys must be
    * unique (two source rows matching one target row is ambiguous —
    * delta-spark's multiple-source-match error). Candidate files
    * prune by the source's per-key min/max against log stats — a
    * selective merge into a 100 TB table opens only key-overlapping
    * files. CDF tables get update_preimage/update_postimage/insert
    * change files. */
  def exportMerge(spark: SparkSession, path: String,
      source: DataFrame, keys: Seq[String]): Long = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val (v0, st0) = replayState(spark, path)
    requireWritable(st0, path, "exportMerge", removesRows = true,
      writesRows = true)
    requireUnmapped(st0, path, "exportMerge")
    requireNoPosCollision(st0.schema, st0.physical,
      "deletion-vector merge")
    requireSchemaMatch(source, st0, path, "exportMerge")
    require(keys.nonEmpty, s"exportMerge on $path: empty key list")
    val unknown = keys.toSet -- st0.schema.fieldNames
    require(unknown.isEmpty,
      s"exportMerge on $path: unknown key column(s) " +
        s"${unknown.toSeq.sorted.mkString(", ")}")
    val src = graft.Frames.cut(source)
    require(src.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(1).count() == 0L,
      s"exportMerge on $path: duplicate source keys — a target row " +
        "matched by two source rows is ambiguous (delta-spark's " +
        "multiple-source-match error); de-duplicate the source first")
    val live = st0.live.values.toSeq
    if (src.isEmpty) return v0 // empty source: nothing matches, nothing inserts
    // key-bound candidate pruning — the 100 TB lever: a merge's
    // touchable files are those whose logged per-key min/max overlap
    // the SOURCE's key ranges (one small agg over the source); a
    // pruned-out file has some key column's range disjoint from every
    // source value, so no row in it can match
    val keyTypes = keys.map(k => k -> st0.schema(k).dataType)
    val aggExprs = keyTypes.zipWithIndex.flatMap { case ((k, _), i) =>
      Seq(min(col(k)).as(s"mn$i"), max(col(k)).as(s"mx$i")) }
    val mm = src.agg(aggExprs.head, aggExprs.tail: _*).collect().head
    val bounds = keyTypes.zipWithIndex.flatMap { case ((k, dt), i) =>
      (decodedBoundValue(dt, mm.get(2 * i)),
        decodedBoundValue(dt, mm.get(2 * i + 1))) match {
        case (lo @ Some(_), hi @ Some(_)) =>
          Some(DeltaLite.ColumnBound(k, lower = lo, upper = hi))
        case _ => None
      }
    }
    val candidates =
      if (bounds.isEmpty) live
      else DeltaLite.pruneFiles(toSnapshot(v0, st0), bounds)
    val withPos = DeltaLite.readFilesWithPos(spark, path, st0.schema,
      candidates.map(_.copy(dv = None)), st0.partitionBy, st0.physical,
      st0.config)
    val oldDvs = candidates.flatMap(f => dvDescriptor(f).map(f.path -> _))
    val (oldPos, _) = dvPositionsFrame(spark, path, oldDvs)
    // matched LIVE target rows (deleted rows must neither flip again
    // nor block a source row from inserting) — multi-referenced, cut
    val matchedData = graft.Frames.cut(withPos
      .join(src.select(keys.map(col): _*), keys, "left_semi")
      .join(oldPos, col("path") === col("__dv_path") &&
        col("row_index") === col("__dv_ri"), "left_anti")
      .drop("__dv_path", "__dv_ri"))
    val fresh = matchedData.select(col("path"), col("row_index"))
    // WHEN MATCHED: each matched target row takes its source row's
    // values (a key shared by N target rows yields N identical
    // rewrites — delta-spark's multi-target-match semantics)
    val rewritten = matchedData.select(keys.map(col): _*)
      .join(src, keys, "inner")
      .select(st0.schema.fieldNames.map(col).toSeq: _*)
    // WHEN NOT MATCHED: source rows whose key matches no LIVE target
    // row (candidate pruning is sound for this anti-join too — a
    // non-candidate file cannot hold a matching key)
    val inserts = src.join(matchedData.select(keys.map(col): _*),
      keys, "left_anti").select(st0.schema.fieldNames.map(col).toSeq: _*)
    val appendDf = rewritten.unionByName(inserts)
    dvFlipCommit(spark, path, "exportMerge", "MERGE", v0, st0,
      fresh, oldPos,
      () => if (appendDf.isEmpty) Nil
        else writeDataFiles(spark, appendDf, root(path), st0.partitionBy),
      () => Some(
        matchedData.drop("path", "row_index")
          .withColumn("_change_type", lit("update_preimage"))
          .unionByName(rewritten
            .withColumn("_change_type", lit("update_postimage")))
          .unionByName(inserts
            .withColumn("_change_type", lit("insert")))))
  }

  /** A collected external value → the decoded representation
    * [[DeltaLite.pruneFiles]] compares stats in (epoch-day /
    * epoch-micros longs for temporal types). None = no bound for this
    * type (pruning is only an optimization). */
  private def decodedBoundValue(dt: DataType, v: Any): Option[Any] =
    (dt, v) match {
      case (_, null) => None
      case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
        Some(n.longValue)
      case (FloatType | DoubleType, n: Number) => Some(n.doubleValue)
      case (StringType, s: String) => Some(s)
      case (_: DecimalType, d: java.math.BigDecimal) => Some(BigDecimal(d))
      case (DateType, d: java.sql.Date) => Some(d.toLocalDate.toEpochDay)
      case (DateType, d: java.time.LocalDate) => Some(d.toEpochDay)
      case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
        Some(t.getTime / 1000L * 1000000L + t.getNanos / 1000L)
      case (TimestampType | TimestampNTZType, i: java.time.Instant) =>
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case (TimestampNTZType, l: java.time.LocalDateTime) =>
        Some(l.toInstant(java.time.ZoneOffset.UTC).getEpochSecond
          * 1000000L + l.getNano / 1000L)
      case _ => None
    }

  /** The shared COMMIT TAIL of the row-level DV write surfaces
    * (DELETE / UPDATE / MERGE): per-file DV union (fresh positions ∪
    * the file's existing deletes, touched files only — untouched DV
    * files keep their descriptor), packed DV file write, cdc staging
    * when CDF is enabled, and the OCC commit with rebase-identity +
    * concurrent-append serializability checks. `fresh` is the
    * (path, row_index) frame of freshly-deleted positions (already
    * anti-joined against existing DVs, already cut); `stageAdds`
    * stages the op's appended data files (empty for DELETE) and runs
    * only when the commit will actually be attempted; `cdcFrame`
    * builds the change rows (table columns + _change_type) and runs
    * only when delta.enableChangeDataFeed=true. cdc files stage
    * pre-claim like the DV file: uncommitted files are invisible, and
    * the rebase declines any concurrent append/flip, so the staged
    * rows stay exactly the commit's change set on every attempt. */
  private def dvFlipCommit(spark: SparkSession, path: String,
      op: String, commitOp: String, v0: Long, st0: State,
      fresh: DataFrame, oldPos: DataFrame,
      stageAdds: () => Seq[AddFile],
      cdcFrame: () => Option[DataFrame]): Long = {
    import org.apache.spark.sql.functions.{col, collect_set, sort_array}
    val touched = fresh.select(col("path")).distinct()
    val finalPos = fresh.unionByName(
      oldPos.toDF("path", "row_index")
        .join(touched, Seq("path"), "left_semi"))
    import spark.implicits._
    val perFile: Seq[(String, Array[Byte], Long)] = finalPos
      .groupBy(col("path"))
      .agg(sort_array(collect_set(col("row_index"))).as("pos"))
      .as[(String, Array[Long])]
      .map { case (p, pos) =>
        (p, DeletionVectors.serialize(pos), pos.length.toLong) }
      .collect().toSeq.sortBy(_._1)
    val newAdds = stageAdds()
    if (perFile.isEmpty && newAdds.isEmpty) return v0 // no-op
    // delta.enableChangeDataFeed=true obliges ROW-LEVEL change files:
    // a foreign CDF reader sees remove+re-add of the same path as a
    // file rewrite, so the change rows materialize under
    // _change_data/ and the commit carries cdc actions — which CDF
    // readers then use as the ONLY change source for this commit
    // (PROTOCOL.md "Change Data Files"; dataChange=false BY SPEC)
    val cdcActs: Seq[String] =
      if (!st0.config.get("delta.enableChangeDataFeed")
          .exists(_.equalsIgnoreCase("true"))) Nil
      else cdcFrame().map(stageCdcFiles(spark, path, _, st0))
        .getOrElse(Nil)
    val descs =
      if (perFile.isEmpty) Nil
      else DeletionVectors.writeDvFilePacked(root(path),
        perFile.map(e => (e._2, e._3)))
    val newDv: Map[String, DeletionVectors.Descriptor] =
      perFile.map(_._1).zip(descs).toMap
    def dvIdent(f: AddFile): Option[(String, String, Option[Int])] =
      dvDescriptor(f).map(dvIdentity)
    val oldIdent: Map[String, Option[(String, String, Option[Int])]] =
      perFile.map { case (p, _, _) => p -> dvIdent(st0.live(p)) }.toMap
    occCommit(spark, path, op, Some((v0, st0))) { st =>
      requireWritable(st, path, op, removesRows = true,
        writesRows = newAdds.nonEmpty)
      requireUnmapped(st, path, op)
      // rebase safety: every touched file must still be live under the
      // EXACT DV identity the union was computed against — a foreign
      // flip in the race window means our union misses its deletes
      // (committing would RESURRECT them); a foreign removal means the
      // file is gone (committing would resurrect the whole file)
      perFile.foreach { case (p, _, _) =>
        val cur = st.live.get(p).getOrElse(sys.error(
          s"$op on $path: file '$p' was removed by a concurrent " +
            "writer — re-run against fresh state"))
        require(dvIdent(cur) == oldIdent(p),
          s"$op on $path: the deletion vector of '$p' changed " +
            "concurrently — re-run against fresh state (committing a " +
            "stale union would resurrect rows)")
      }
      // serializability: a file APPENDED in the race window may hold
      // rows matching the predicate/keys this op never evaluated —
      // committing over it yields a history no serial order explains
      // (delta-spark's ConcurrentAppendException). Decline every
      // concurrent add; re-running re-evaluates the full live set.
      val appended = st.live.keySet -- st0.live.keySet
      require(appended.isEmpty,
        s"$op on $path: file(s) " +
          s"${appended.toSeq.sorted.take(3).mkString(", ")} were " +
          "appended concurrently and may match — re-run against " +
          "fresh state")
      val now = System.currentTimeMillis()
      (if (perFile.isEmpty) None else dvProtocolUpgrade(st)).toSeq ++
        perFile.flatMap { case (p, _, _) =>
          val old = st.live(p)
          val upd = old.copy(dv =
            Some(DvMarker + DeletionVectors.toJson(newDv(p))))
          Seq(removeLine(old, now),
            JsonMethods.compact(encodeDeltaAdd(upd, st.schema)))
        } ++
        newAdds.map(a => JsonMethods.compact(
          encodeDeltaAdd(a, st.schema))) ++
        cdcActs :+ commitInfoLine(commitOp)
    }
  }

  /** Stage `df` (table columns + _change_type) as change-data parquet
    * under `_change_data/` — per-partition files when the table is
    * partitioned — and return the commit's cdc action lines. */
  private def stageCdcFiles(spark: SparkSession, path: String,
      df: DataFrame, st0: State): Seq[String] = {
    val stage = root(path).resolve("_change_data")
      .resolve("cdc-" + java.util.UUID.randomUUID.toString.take(12))
    val writer = if (st0.partitionBy.nonEmpty)
      df.write.partitionBy(st0.partitionBy: _*) else df.write
    writer.parquet(stage.toString)
    val cdcSchema = StructType(st0.schema.fields :+
      StructField("_change_type", StringType))
    DeltaLite.footerAdds(spark, root(path), stage, cdcSchema,
      st0.partitionBy, Map.empty).map(a =>
      JsonMethods.compact(JObject(List("cdc" -> JObject(List(
        "path" -> JString(encodePath(a.path)),
        "partitionValues" -> JObject(a.pv.toList.sortBy(_._1)
          .map { case (k, v) => k -> JString(v) }),
        "size" -> JLong(a.bytes),
        "dataChange" -> JBool(false)))))))
  }

  /** The `deletionVectors` protocol upgrade, when the table's current
    * protocol does not already carry it: one protocol action in the
    * same commit as the first DV flip — minReader 3 / minWriter 7 with
    * reader/writer feature lists that RESTATE the legacy versions'
    * implied features (PROTOCOL.md: a table-features upgrade must name
    * everything the table uses). */
  private def dvProtocolUpgrade(st: State): Option[String] = {
    val has = st.minReader >= 3 &&
      st.readerFeatures.contains("deletionVectors") &&
      st.minWriter >= 7 && st.writerFeatures.contains("deletionVectors")
    if (has) None
    else {
      val readerFeats = (if (st.minReader >= 3) st.readerFeatures.toSet
        else if (st.minReader == 2) Set("columnMapping")
        else Set.empty[String]) + "deletionVectors"
      val writerFeats = effectiveWriterFeatures(st) + "deletionVectors"
      Some(JsonMethods.compact(JObject(List("protocol" -> JObject(List(
        "minReaderVersion" -> JInt(3),
        "minWriterVersion" -> JInt(7),
        "readerFeatures" -> JArray(
          readerFeats.toList.sorted.map(JString(_))),
        "writerFeatures" -> JArray(
          writerFeats.toList.sorted.map(JString(_)))))))))
    }
  }

  /** THE remove-action encoder — one definition for the overwrite,
    * partition-delete, and DV-flip commits (review finding: verbatim
    * copies drift). A remove of a DV-carrying file MUST name the DV:
    * Delta reconciliation identifies a logical file by (path, DV
    * uniqueId), so a path-only remove of a DV'd file would fail to
    * evict it under strict-identity replay (our own reader's rule). */
  private def removeLine(f: AddFile, now: Long): String =
    JsonMethods.compact(JObject(List(
      "remove" -> JObject(List(
        "path" -> JString(encodePath(f.path)),
        "deletionTimestamp" -> JLong(now),
        "dataChange" -> JBool(true),
        "extendedFileMetadata" -> JBool(true),
        "partitionValues" -> JObject(f.pv.toList.sortBy(_._1)
          .map { case (k, v) => k -> JString(v) }),
        "size" -> JLong(f.bytes)) ++
        dvDescriptor(f).map(d => "deletionVector" ->
          JsonMethods.parse(DeletionVectors.toJson(d))).toList))))

  /** WRITER-side protocol gate (review finding: the reader gate
    * accepting a table says nothing about writing it). This exporter
    * implements writer version ≤ 2 minus invariants: it declines
    * loudly on
    *   - `delta.appendOnly = true` when the commit would remove rows
    *     (overwrite/partition-delete on an append-only table breaks
    *     the contract downstream consumers rely on);
    *   - any column carrying a `delta.invariants` expression (writer
    *     v2 requires ENFORCING it on write — we don't evaluate them);
    *   - minWriterVersion > 2 or any `writerFeatures` (v7 tables
    *     demand per-feature write obligations — row tracking, DVs,
    *     CDC files — this minimal exporter does not meet). */
  /** Legacy minWriterVersions imply fixed feature sets (PROTOCOL.md
    * "Table Features" — a version-7 upgrade must restate them); the
    * uniform gate below reasons about FEATURES, so translate once. */
  private def effectiveWriterFeatures(st: State): Set[String] =
    if (st.minWriter >= 7) st.writerFeatures.toSet
    else Seq(
      2 -> Seq("appendOnly", "invariants"),
      3 -> Seq("checkConstraints"),
      4 -> Seq("changeDataFeed", "generatedColumns"),
      5 -> Seq("columnMapping"),
      6 -> Seq("identityColumns"))
      .filter(_._1 <= st.minWriter).flatMap(_._2).toSet

  /** Writer features whose per-commit obligations these exporters MEET
    * (each conditionally — the checks in [[requireWritable]] are the
    * honoring): appendOnly/invariants/checkConstraints/generated/
    * identity gate on the table actually USING them; changeDataFeed is
    * safe for append/overwrite/partition-delete (foreign CDF readers
    * derive those correctly from dataChange add/remove actions) and
    * gates only the DV flip; columnMapping is gated separately by
    * [[requireUnmapped]] on every exporter; deletionVectors is honored
    * by DV-identified removes + [[exportDeleteWhere]]'s own machinery;
    * the rest carry no write-side obligation this exporter can
    * violate. Anything NOT here (rowTracking's baseRowIds,
    * domainMetadata, icebergCompat*, unknowns) declines by name. */
  private[graft] val HonoredWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "changeDataFeed",
    "generatedColumns", "identityColumns", "columnMapping",
    "deletionVectors", "timestampNtz", "typeWidening",
    "typeWidening-preview", "vacuumProtocolCheck", "v2Checkpoint")

  private def requireWritable(st: State, path: String, op: String,
      removesRows: Boolean, writesRows: Boolean = true): Unit = {
    val feats = effectiveWriterFeatures(st)
    val unmet = (feats -- HonoredWriterFeatures).toSeq.sorted
    require(unmet.isEmpty,
      s"$op on $path: the table requires minWriterVersion " +
        s"${st.minWriter} with writer features ${unmet.mkString(", ")} " +
        "whose write obligations this exporter does not meet; use the " +
        "native format (CONVERT FROM DELTA) for full write semantics")
    require(!removesRows ||
        !st.config.get("delta.appendOnly").exists(_.equalsIgnoreCase("true")),
      s"$op on $path: the table declares delta.appendOnly=true — a " +
        "row-removing commit would break the append-only contract " +
        "downstream consumers rely on")
    // checkConstraints: a CHECK gates only commits that WRITE rows (a
    // delete cannot create a violating row) — and only when the table
    // actually declares one
    require(!writesRows ||
        !st.config.keys.exists(_.startsWith("delta.constraints.")),
      s"$op on $path: the table declares CHECK constraints " +
        s"(${st.config.keys.filter(_.startsWith("delta.constraints."))
          .mkString(", ")}) this exporter does not enforce — writing " +
        "without enforcement would violate the writer contract")
    // generated/identity columns oblige the writer to PRODUCE
    // conforming values on new rows — gate row-writing commits when
    // the schema actually carries the metadata
    if (writesRows && st.schema != null) {
      val special = st.schema.fields.collect {
        case f if f.metadata.contains("delta.generationExpression") =>
          s"${f.name} (generated)"
        case f if f.metadata.contains("delta.identity.start") ||
            f.metadata.contains("delta.identity.step") =>
          s"${f.name} (identity)"
      }
      require(special.isEmpty,
        s"$op on $path: column(s) ${special.mkString(", ")} oblige the " +
          "writer to produce conforming values — this exporter writes " +
          "the caller's batch verbatim and declines instead")
    }
    // invariants gate ONLY commits that write rows (a remove-only
    // partition delete adds no data, so any invariant is vacuously
    // preserved — review finding); the scan is RECURSIVE, Delta allows
    // invariants on nested fields (review finding)
    def invariantIn(dt: DataType, at: String): Option[String] = dt match {
      case stct: StructType => stct.fields.view.flatMap { f =>
        if (f.metadata.contains("delta.invariants"))
          Some(s"$at${f.name}")
        else invariantIn(f.dataType, s"$at${f.name}.")
      }.headOption
      case ArrayType(et, _) => invariantIn(et, at)
      case MapType(_, vt, _) => invariantIn(vt, at)
      case _ => None
    }
    if (writesRows && st.schema != null)
      invariantIn(st.schema, "").foreach(c => sys.error(
        s"$op on $path: column '$c' carries a delta.invariants " +
          "expression this exporter does not enforce — writing without " +
          "enforcement would violate the writer contract"))
  }

  /** Shared write-side schema gate: names and types must match
    * EXACTLY, and a nullable batch column cannot land in a column the
    * table declares non-nullable (review finding: the log would then
    * promise non-null while the files carry nulls — foreign readers
    * trust the schema). A batch whose column provably holds no nulls
    * declares it non-nullable and passes. */
  private def requireSchemaMatch(df: DataFrame, st: State, path: String,
      op: String): Unit = {
    require(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        st.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"$op schema ${df.schema.simpleString} does not match table " +
        s"schema ${st.schema.simpleString}")
    // Non-nullable table columns enforce on the DATA (the actual
    // writer-v2 obligation), not the batch's nullable flag — every
    // file-sourced frame reads back nullable=true even when it holds
    // no nulls, so a flag check would decline all round-trips (review
    // finding). One cheap existence probe per affected column; usually
    // none are.
    val suspect = st.schema.fields
      .filter(tf => !tf.nullable &&
        df.schema.fields.exists(bf => bf.name == tf.name && bf.nullable))
      .map(_.name)
    if (suspect.nonEmpty) {
      import org.apache.spark.sql.functions.col
      val offending = suspect.find(c =>
        df.filter(col(c).isNull).limit(1).count() > 0)
      offending.foreach(c => sys.error(
        s"$op on $path: column '$c' contains nulls but the table " +
          "schema declares it non-nullable — foreign readers trust " +
          "the schema; drop the null rows or fix the table schema"))
    }
  }

  /** The export surfaces write LOGICAL-named parquet, logical-keyed
    * stats, and logical-keyed partitionValues — on a column-mapped
    * table those are corrupt artifacts (physical-name readers resolve
    * them to NULLs), so the artifact-writing exports decline loudly
    * (review finding: widening the READ gate to name mode silently
    * un-gated these). [[exportDeletePartition]] stays allowed — remove
    * actions carry only paths, no name-bearing artifact — as do
    * reading and CONVERT FROM DELTA. */
  private def requireUnmapped(st: State, path: String,
      op: String): Unit =
    require(st.physical.isEmpty,
      s"$op on $path: the table uses column mapping — this exporter " +
        "writes logical-named artifacts, which a mapped table's " +
        "readers would resolve to NULLs; read/convert the table " +
        "instead (write-side mapping is the native format's job)")

  /** Write `df` into a FRESH per-commit subdirectory of the table root
    * (Hive layout inside it when partitioned) and footer-decode exactly
    * that subdirectory — commit cost stays O(batch) no matter how many
    * files the table holds (the earlier root-walk diff re-opened every
    * standing file's footer per append; review finding). Delta `add`
    * paths are arbitrary root-relative URIs, so foreign readers are
    * indifferent to the layout. */
  private def writeDataFiles(spark: SparkSession, df: DataFrame,
      dir: Path, partitionBy: Seq[String]): Seq[AddFile] = {
    val stage = dir.resolve(
      "data-" + java.util.UUID.randomUUID.toString.take(12))
    val writer = if (partitionBy.nonEmpty)
      df.write.partitionBy(partitionBy: _*) else df.write
    writer.mode("overwrite").parquet(stage.toString)
    DeltaLite.footerAdds(spark, dir, stage, df.schema, partitionBy,
      Map.empty)
  }

  /** graft decoded stats → PROTOCOL.md's per-file `stats` JSON — the
    * ONE encoder both commit adds and checkpoint rows go through (two
    * drifting copies would let a commit and its checkpoint disagree on
    * the same file's stats; review finding). */
  private def deltaStatsJson(f: AddFile, schema: StructType): String = {
    val types = schema.fields.map(fd => fd.name -> fd.dataType).toMap
    def enc(c: String, v: Any): Option[JValue] = types.get(c).map {
      case DateType => JString(java.time.LocalDate
        .ofEpochDay(v.asInstanceOf[Long]).toString)
      case TimestampType => JString(microsToIso(v.asInstanceOf[Long], "Z"))
      case TimestampNTZType => JString(microsToIso(v.asInstanceOf[Long], ""))
      case FloatType | DoubleType => JDouble(v.asInstanceOf[Double])
      case _: DecimalType => JDecimal(v.asInstanceOf[BigDecimal])
      case StringType => JString(v.asInstanceOf[String])
      case _ => JLong(v.asInstanceOf[Long])
    }
    def side(pick: ColStats => Option[Any]): JObject = JObject(
      f.stats.toList.sortBy(_._1).flatMap { case (c, cs) =>
        pick(cs).flatMap(enc(c, _)).map(c -> _) })
    JsonMethods.compact(JObject(List(
      "numRecords" -> JLong(f.rows),
      "minValues" -> side(_.min),
      "maxValues" -> side(_.max)) ++
      // a DV'd file's stats describe the PHYSICAL file: numRecords is
      // the physical row count and min/max are valid but possibly not
      // tight for the LIVE rows — PROTOCOL.md's tightBounds=false
      // (absent means true, so emit only the false case)
      (if (f.dv.isDefined) List("tightBounds" -> JBool(false)) else Nil)))
  }

  /** graft AddFile → standard Delta `add` action (stats re-encoded
    * from the decoded representation into PROTOCOL.md's JSON forms;
    * a marker-carried DV descriptor re-emits as the `deletionVector`
    * struct). Restatement fidelity (review findings): a replayed
    * `modificationTime` is preserved (foreign consumers key
    * incremental processing on it — a metadata-only DV flip must not
    * re-stamp a years-old file as just-modified), and a file whose
    * ORIGINAL add carried no stats re-emits WITHOUT stats — `stats`
    * is optional in the protocol, and fabricating `numRecords:0` next
    * to a positive DV cardinality would violate the
    * cardinality ≤ numRecords invariant foreign readers check (a
    * non-empty flipped file with rows==0 && stats.isEmpty can ONLY be
    * a stats-less replay: a genuinely empty file has no positions to
    * delete). */
  private def encodeDeltaAdd(f: AddFile, schema: StructType): JObject =
    JObject(List("add" -> JObject(List(
      "path" -> JString(encodePath(f.path)),
      "partitionValues" -> JObject(f.pv.toList.sortBy(_._1)
        .map { case (k, v) => k -> JString(v) }),
      "size" -> JLong(f.bytes),
      "modificationTime" -> JLong(
        f.mtime.getOrElse(System.currentTimeMillis())),
      "dataChange" -> JBool(true)) ++
      (if (f.stats.isEmpty && f.rows == 0L) Nil
       else List("stats" -> JString(deltaStatsJson(f, schema)))) ++
      dvDescriptor(f).map(d => "deletionVector" ->
        JsonMethods.parse(DeletionVectors.toJson(d))).toList)))

  private def microsToIso(micros: Long, suffix: String): String = {
    val inst = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)
    val ldt = java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
    ldt.format(java.time.format.DateTimeFormatter
      .ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSSSSS")) + suffix
  }

  private def commitInfoLine(op: String): String =
    JsonMethods.compact(JObject(List("commitInfo" -> JObject(List(
      "timestamp" -> JLong(System.currentTimeMillis()),
      "operation" -> JString(op))))))

  /** Claim `<version>.json` through the SAME claim-store contract the
    * native format uses ([[DeltaLite.claimCommit]]: conditional PUT
    * semantics, exactly one winner, ambiguity resolved by read-back
    * compare) — one attempt; the OCC REBASE on a lost race is
    * [[occCommit]]'s loop. Log READS on the interop side stay on the
    * filesystem layer (the standard `_delta_log` is the foreign
    * stack's directory); the claim store guards the one mutation. */
  private def writeCommitFile(path: String, version: Long,
      lines: Seq[String]): Unit = {
    val d = logDir(path)
    Files.createDirectories(d)
    DeltaLite.claimCommit(d.resolve(f"$version%020d.json"), lines)
  }

  /** OCC commit loop for the mutating export surfaces — the same
    * contract the native format's commitExclusive gives: build the
    * commit lines against a FRESH replay, claim `<v+1>.json`, and on
    * a lost race re-replay and rebuild. The exports' semantics are
    * all rebase-safe by construction (append re-encodes the same
    * already-written files against the new schema state; overwrite
    * re-removes the CURRENT live set; partition delete re-selects the
    * CURRENT doomed set), and `build` re-runs the writability gates so
    * a concurrent protocol upgrade or appendOnly flip declines instead
    * of laundering through a stale check. Bounded attempts keep a
    * runaway-writer table loud. `first` lets a caller that already
    * replayed for its pre-staging gates hand that state to the first
    * attempt — halving the pre-commit replay cost (each replay is O(log)
    * plus a Spark checkpoint-read job on checkpointed tables; review
    * finding); the claim still arbitrates, and any lost race replays
    * fresh. */
  private def occCommit(spark: SparkSession, path: String, op: String,
      first: Option[(Long, State)] = None)(
      build: State => Seq[String]): Long = {
    var attempts = 0
    var pre = first
    while (true) {
      val (version, st) = pre.getOrElse(replayState(spark, path))
      pre = None
      val lines = build(st)
      try {
        writeCommitFile(path, version + 1, lines)
        return version + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          require(attempts < 16,
            s"$op on $path lost $attempts consecutive commit claims — " +
              "a livelocked or runaway-writer table; giving up loudly")
      }
    }
    -1L // unreachable
  }

  /** The classic checkpoint parquet schema (PROTOCOL.md "Checkpoints"),
    * declared explicitly so `partitionValues`/`configuration` land as
    * parquet MAPs (JSON inference would make them structs and break
    * foreign readers). One action per row; absent actions are null. */
  private val CheckpointSchema: StructType = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      // PROTOCOL.md checkpoints RESTATE per-add deletionVector structs
      // — without this column a checkpoint of a DV table would
      // silently resurrect every deleted row on fast-start (the decline
      // this column lifts; see CheckpointSafeWriterFeatures)
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType),
      // the removed logical file's DV identity rides along so foreign
      // VACUUM can associate the superseded deletion_vector file with
      // its retention window after JSON cleanup (review finding)
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))),
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType))))))

  /** Writer features whose mandated state this classic checkpointer
    * provably RESTATES (schema-/configuration-carried, plus the add
    * struct's `deletionVector` column). Anything else declines: a
    * checkpoint of a `domainMetadata` / `rowTracking` table would
    * restate the protocol but silently DROP the feature's state
    * (domainMetadata actions, per-add baseRowId fields), and a
    * foreign reader fast-starting from `_last_checkpoint` after JSON
    * cleanup loses it without any error (review finding).
    * `changeDataFeed` is safe: PROTOCOL.md excludes cdc actions from
    * checkpoints by design. */
  private[graft] val CheckpointSafeWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "changeDataFeed",
    "generatedColumns", "columnMapping", "identityColumns",
    "timestampNtz", "typeWidening", "typeWidening-preview",
    "vacuumProtocolCheck", "v2Checkpoint",
    // restatable since the add struct gained its deletionVector column
    // — a DV table under repeated exportDeleteWhere can now checkpoint
    // and survive JSON log cleanup
    "deletionVectors")

  /** `delta.deletedFileRetentionDuration` ("interval N unit [N unit
    * ...]" — Delta parses a full CalendarInterval, so multi-unit
    * values like "interval 1 day 12 hours" are legal; default one
    * week, delta.io's documented default) → milliseconds (units sum). */
  private def tombstoneRetentionMs(config: Map[String, String]): Long = {
    val spec = config.getOrElse("delta.deletedFileRetentionDuration",
      "interval 1 week")
    val pair = """(\d+)\s+([a-zA-Z]+)""".r
    require(spec.trim.toLowerCase.startsWith("interval"),
      s"unparseable delta.deletedFileRetentionDuration '$spec'")
    val pairs = pair.findAllMatchIn(spec).toSeq
    require(pairs.nonEmpty,
      s"unparseable delta.deletedFileRetentionDuration '$spec'")
    pairs.map { m =>
      val per = m.group(2).toLowerCase.stripSuffix("s") match {
        case "week" => 7L * 24 * 3600 * 1000
        case "day" => 24L * 3600 * 1000
        case "hour" => 3600L * 1000
        case "minute" => 60L * 1000
        case "second" => 1000L
        case "millisecond" => 1L
        case other => sys.error(
          s"unsupported retention unit '$other' in '$spec'")
      }
      m.group(1).toLong * per
    }.sum
  }

  /** Classic single-part parquet checkpoint at the latest version + the
    * `_last_checkpoint` pointer — the fast-start handle foreign readers
    * look for, and the fixture this module's own checkpoint replay path
    * is tested against. */
  def exportCheckpoint(spark: SparkSession, path: String): Long = {
    val (v0, st0) = replayState(spark, path)
    requireUnmapped(st0, path, "exportCheckpoint")
    // WRITER-side gate (review finding: the read path accepting a
    // feature says nothing about CHECKPOINTING it — a checkpoint that
    // restates the protocol but drops a feature's mandated state is
    // worse than declining, because foreign readers fast-starting from
    // _last_checkpoint after JSON cleanup lose that state silently).
    val unsafe = st0.writerFeatures.filterNot(CheckpointSafeWriterFeatures)
    require(unsafe.isEmpty,
      s"exportCheckpoint on $path: writer features " +
        s"${unsafe.mkString(", ")} mandate state (actions or per-add " +
        "fields) this classic checkpointer does not restate — a " +
        "checkpoint would silently drop it; checkpoint with the " +
        "feature-aware writer that owns the table instead")
    val snap = Snapshot(v0, st0.schema, st0.live.values.toSeq,
      txns = st0.txns.toMap, partitionBy = st0.partitionBy,
      physical = st0.physical, properties = st0.config)
    def statsJson(f: AddFile): String = deltaStatsJson(f, snap.schema)
    def dvRow(d: DeletionVectors.Descriptor): Row =
      Row(d.storageType, d.pathOrInlineDv,
        d.offset.map(java.lang.Integer.valueOf).orNull,
        java.lang.Integer.valueOf(d.sizeInBytes), d.cardinality)
    val now = System.currentTimeMillis()
    // remove tombstones still inside the retention window ride along —
    // foreign VACUUM resolves "recently removed, don't collect yet"
    // from the checkpoint once the JSON commits are cleaned up
    val keepSince = now - tombstoneRetentionMs(st0.config)
    val tombs = st0.tombstones.toSeq.filter(_._2._1 >= keepSince)
    // the checkpoint RESTATES the table's protocol — hardcoding (1,2)
    // would falsify a higher-versioned table's requirements once the
    // JSON commits are cleaned up, and launder writes past the
    // requireWritable gate on replay-from-checkpoint (review finding)
    val rows: Seq[Row] =
      Seq(Row(Row(st0.minReader, st0.minWriter,
          if (st0.readerFeatures.isEmpty) null else st0.readerFeatures,
          if (st0.writerFeatures.isEmpty) null else st0.writerFeatures),
        null, null, null, null),
        // restate the table's OWN id — a fresh random id per checkpoint
        // would change table identity under foreign streaming queries
        // that pin metaData.id (review finding); random only for a
        // spec-violating foreign log that never declared one
        Row(null, Row(Option(st0.tableId)
            .getOrElse(java.util.UUID.randomUUID.toString), Row("parquet"),
          snap.schema.json, snap.partitionBy, snap.properties), null,
          null, null)) ++
        snap.files.map(f => Row(null, null,
          Row(encodePath(f.path), f.pv, f.bytes,
            // same restatement fidelity as encodeDeltaAdd: preserve
            // the original modificationTime; stats-less adds restate
            // WITHOUT stats (null slot) instead of fabricating
            // numRecords:0 (review finding); DV descriptors restate as
            // the protocol's struct (replay's toJSON round-trip feeds
            // the same parseJValue path the JSON commits use)
            // dataChange=false: checkpoint rows are RESTATEMENTS, not
            // data changes — PROTOCOL.md's checkpoint contract, and
            // what strict foreign validators check (review finding;
            // the tombstone rows below already wrote false)
            java.lang.Long.valueOf(f.mtime.getOrElse(now)), false,
            if (f.stats.isEmpty && f.rows == 0L) null else statsJson(f),
            dvDescriptor(f).map(dvRow).orNull),
          null, null)) ++
        tombs.map { case ((p, _), (ts, dv)) => Row(null, null, null,
          Row(encodePath(p), ts, false, dv.map(dvRow).orNull), null) } ++
        snap.txns.toSeq.sortBy(_._1).map { case (app, v) =>
          Row(null, null, null, null, Row(app, v)) }
    val d = logDir(path)
    val tmpDir = Files.createTempDirectory(d, ".cp-")
    spark.createDataFrame(rows.asJava, CheckpointSchema).coalesce(1)
      .write.mode("overwrite").parquet(tmpDir.toString)
    val part = {
      val w = Files.list(tmpDir)
      try w.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error("checkpoint write produced no parquet"))
      finally w.close()
    }
    val target = d.resolve(f"${snap.version}%020d.checkpoint.parquet")
    Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
    val s = Files.walk(tmpDir)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { val _ = Files.deleteIfExists(p) })
    finally s.close()
    // the pointer write must be ATOMIC (overwrite is fine — newer
    // checkpoints legitimately replace it — but a plain Files.write
    // left a truncated-pointer window a crashed writer or concurrent
    // foreign checkpointer could expose; review finding): temp file +
    // rename, the same discipline as every other log artifact
    val ptrTmp = Files.createTempFile(d, ".tmp-lastcp-", ".json")
    Files.write(ptrTmp,
      JsonMethods.compact(JObject(List(
        "version" -> JLong(snap.version),
        "size" -> JLong((rows.size).toLong)))).getBytes("UTF-8"))
    Files.move(ptrTmp, d.resolve("_last_checkpoint"),
      StandardCopyOption.ATOMIC_MOVE)
    snap.version
  }
}

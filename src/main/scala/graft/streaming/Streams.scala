package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming executions of the incremental shapes (SURVEY.md
  * §2.8 T2-T7). The reference is batch (dbt has no streaming; its
  * incremental models are the analogue), so these are the [N]-tagged
  * forward-looking surface: the same transformations as
  * graft.queries.Incremental, but runnable as micro-batch pipelines with
  * watermarks and state. Verified in StreamingSpec via MemoryStream
  * micro-batches (a DuckDB oracle cannot run a stateful pipeline — SURVEY
  * §2.8 T7).
  *
  * Scale: all stateful operators key their state by a grouping column →
  * state is hash-partitioned across executors; watermarks bound state
  * size (late rows are dropped, closed windows/sessions are evicted).
  */
object Streams {

  /** T2 streaming twin: tumbling 1-hour counts with a 10-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** T4 streaming twin: native session windows (30-minute gap). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Stream-static enrichment join: a streaming fact side joined to a
    * static (batch) dimension. No streaming state is involved — the
    * static side is (re)resolved per micro-batch and broadcast, so this
    * is the zero-shuffle dimension-enrichment path a bronze→silver hop
    * uses; at scale the dim stays under the broadcast threshold and the
    * stream is never repartitioned. */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream inner join: impressions ⋈ conversions on user_id
    * within a 30-minute event-time interval. Both inputs carry
    * watermarks AND the join condition bounds event time in both
    * directions — that pair is what lets Spark evict each side's join
    * buffer once the watermark passes the interval (without the time
    * bound, both buffers grow forever). State is hash-partitioned by
    * the join key, so at scale each executor holds only its key range's
    * open interval. */
  def clickConversions(impressions: DataFrame, conversions: DataFrame): DataFrame = {
    val i = impressions.withWatermark("imp_ts", "10 minutes")
    val c = conversions.withWatermark("conv_ts", "10 minutes")
    i.join(c,
        i("user_id") === c("user_id") &&
        c("conv_ts") >= i("imp_ts") &&
        c("conv_ts") <= i("imp_ts") + expr("INTERVAL 30 MINUTES"),
        "inner")
      .select(i("user_id").as("user_id"), col("imp_id"), col("conv_id"),
        col("imp_ts"), col("conv_ts"))
  }

  /** Stream-stream LEFT OUTER interval join: like [[clickConversions]]
    * but unmatched impressions must still be REPORTED (the ad-attribution
    * "no conversion" row). The engine can only emit a null-padded left
    * row once the conversion-side watermark has passed the end of that
    * impression's interval — proof no match can still arrive — so outer
    * results trail the watermark by the interval length; state for both
    * sides is evicted on the same boundary. That watermark-bounded state
    * is the 100 TB contract: without it an outer stream join buffers the
    * full history. */
  def clickConversionsOuter(impressions: DataFrame,
      conversions: DataFrame): DataFrame = {
    val i = impressions.withWatermark("imp_ts", "10 minutes")
    val c = conversions.withWatermark("conv_ts", "10 minutes")
    i.join(c,
        i("user_id") === c("user_id") &&
        c("conv_ts") >= i("imp_ts") &&
        c("conv_ts") <= i("imp_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(i("user_id").as("user_id"), col("imp_id"), col("conv_id"),
        col("imp_ts"), col("conv_ts"))
  }

  /** Stream-stream FULL OUTER interval join — both unmatched sides must
    * surface: impressions that never converted AND conversions whose
    * impression was lost (attribution's orphan-conversion audit). Each
    * side's null-padded rows emit only once the OTHER side's watermark
    * proves no partner can still arrive, so the emission lag is bounded
    * by watermark + interval on both sides and state eviction stays
    * symmetric — the same watermark-bounded-state contract as the left
    * outer form, applied in both directions. */
  def clickConversionsFullOuter(impressions: DataFrame,
      conversions: DataFrame): DataFrame = {
    val i = impressions.withWatermark("imp_ts", "10 minutes")
    val c = conversions.withWatermark("conv_ts", "10 minutes")
    i.join(c,
        i("user_id") === c("user_id") &&
        c("conv_ts") >= i("imp_ts") &&
        c("conv_ts") <= i("imp_ts") + expr("INTERVAL 30 MINUTES"),
        "full_outer")
      .select(coalesce(i("user_id"), c("user_id")).as("user_id"),
        col("imp_id"), col("conv_id"), col("imp_ts"), col("conv_ts"))
  }

  /** T6 streaming twin: exactly-once dedup on the event id, with state
    * bounded by the watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming medallion ingestion: land each micro-batch in a DeltaLite
    * table as a file-level APPEND commit — the bronze-layer write path of
    * a streaming medallion pipeline. Each commit adds only the batch's
    * files (O(batch)) and records the batchId as a Delta-style `txn`
    * action via [[graft.sources.DeltaLite.appendOnce]], so a restarted
    * query that replays a batch is a no-op — exactly-once at the commit
    * level, the Delta streaming sink's idempotence contract. The first
    * batch creates the table (empty commit 0, then the idempotent
    * append). Returns a started query writing to `path`. */
  def toDeltaLite(df: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (graft.sources.DeltaLite.latestVersion(path).isEmpty)
          graft.sources.DeltaLite.create(batch.sparkSession, path, batch.limit(0))
        graft.sources.DeltaLite.appendOnce(batch.sparkSession, path, batch,
          app = s"graft-stream", txnVersion = batchId)
        ()
      }
      .start()

  /** Streaming MERGE sink (the CDC-apply hop): each micro-batch upserts
    * into a DeltaLite table by key via foreachBatch, so the table
    * converges to latest-per-key. In-batch duplicates are pre-reduced to
    * the row with the highest `seq` (MERGE's unique-source-key
    * contract); a restart that replays a batch re-MERGEs it to the same
    * end state — idempotent apply, the standard foreachBatch upsert
    * contract. At scale the MERGE itself rewrites only key-overlapping
    * files (see [[graft.sources.DeltaLite.merge]]). */
  def upsertStream(df: DataFrame, path: String, checkpoint: String,
      keys: Seq[String], seq: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(batch.col): _*)
          .orderBy(batch.col(seq).desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        if (graft.sources.DeltaLite.latestVersion(path).isEmpty)
          graft.sources.DeltaLite.create(batch.sparkSession, path, latest)
        else
          graft.sources.DeltaLite.merge(batch.sparkSession, path, latest, keys)
        ()
      }
      .start()

  /** Streaming CRAWL-DEDUP GATE: each micro-batch of documents is
    * judged against EVERYTHING ingested before it (and against the
    * batch itself, keep-min-id) through the persisted
    * [[graft.operators.DedupIndex]], then becomes part of the standing
    * corpus — the ingest loop of a continuously-fed training-data lake:
    *  1. probe: batch bands ⋈ standing index + batch bands ⋈ batch
    *     bands (equality joins, candidate-only exact-Jaccard verify);
    *  2. verdicts (id, near_dup_of, batch id) append to a DeltaLite
    *     audit table — downstream mixes filter on it;
    *  3. the batch's text appends to the corpus table and its bands to
    *     the index: O(batch) growth, no rebuild, the NEXT batch sees
    *     this one.
    * Every write is REPLAY-IDEMPOTENT: the three tables are created as
    * data-free shells on first contact (safe to re-create-check any
    * time), and each batch's appends ride
    * [[graft.sources.DeltaLite.appendOnce]] keyed on this gate's app id
    * + the batchId — a restart after a partial batch re-runs only the
    * missing appends and never duplicates verdicts, bands, or corpus
    * rows (the Delta streaming-sink txn discipline, applied to all
    * three tables of the gate). At 100 TB every step is a keyed join
    * or an O(batch) append — nothing rescans the corpus. */
  def dedupGate(docs: DataFrame, id: String, text: String,
      corpusPath: String, indexPath: String, verdictsPath: String,
      checkpoint: String, threshold: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, batchId, id, text, corpusPath, indexPath,
          verdictsPath, threshold)
      }
      .start()

  /** One gate micro-batch — package-visible so the replay contract is
    * directly testable (call it twice with the same batchId: the second
    * run must be a no-op on all three tables). */
  private[graft] def gateBatch(batch: DataFrame, batchId: Long,
      id: String, text: String, corpusPath: String, indexPath: String,
      verdictsPath: String, threshold: Double): Unit =
    // one micro-batch = one frame lifetime: every lineage cut below
    // (and inside DedupIndex.probe, built on this thread) is dead once
    // the three sinks land — the scope releases replicated-mode cache
    // entries so an always-on gate stays O(1) in CacheManager state
    graft.Frames.scoped {
    gateBatchBody(batch, batchId, id, text, corpusPath, indexPath,
      verdictsPath, threshold)
  }

  private def gateBatchBody(batch: DataFrame, batchId: Long,
      id: String, text: String, corpusPath: String, indexPath: String,
      verdictsPath: String, threshold: Double): Unit = {
    val s = batch.sparkSession
    val D = graft.sources.DeltaLite
    // phase timings at INFO (logger "graft.Streams") — the gate is the
    // bench suite's wall; attribution must be one log flip away
    val log = org.slf4j.LoggerFactory.getLogger("graft.Streams")
    var t0 = System.nanoTime()
    def lap(phase: String): Unit = {
      val t1 = System.nanoTime()
      log.info(f"gateBatch[$batchId] $phase ${(t1 - t0) / 1e9}%.2fs")
      offerLap((batchId, phase, (t1 - t0) / 1e9))
      t0 = t1
    }
    // data-free shells OVERLAP the batch cuts below (independent work:
    // shells need only the batch's SCHEMA, never its rows — measured
    // ~1 s of first-batch wall reclaimed). Still idempotent on any
    // replay interleaving (a crash between creates just re-checks
    // existence next time). The worker re-sets the caller's scheduler
    // locals, same as the append workers.
    val shells: Option[scala.concurrent.Future[Unit]] =
      if (D.latestVersion(corpusPath).nonEmpty &&
          D.latestVersion(indexPath).nonEmpty &&
          D.latestVersion(verdictsPath).nonEmpty) None
      else Some {
        import scala.concurrent.Future
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        val empty = batch.select(col(id), col(text)).limit(0)
        val sc = s.sparkContext
        val pool = sc.getLocalProperty("spark.scheduler.pool")
        val group = sc.getLocalProperty("spark.jobGroup.id")
        Future {
          // the shared EC reuses this thread for arbitrary later
          // callers — clear the borrowed locals on exit or their
          // Spark actions inherit the gate's pool/job group (review
          // finding: skewed Bench's per-query job attribution)
          sc.setLocalProperty("spark.scheduler.pool", pool)
          sc.setLocalProperty("spark.jobGroup.id", group)
          try {
            if (D.latestVersion(corpusPath).isEmpty)
              D.create(s, corpusPath, empty)
            if (D.latestVersion(indexPath).isEmpty)
              graft.operators.DedupIndex.build(s, empty, id, text, indexPath)
            if (D.latestVersion(verdictsPath).isEmpty)
              // near_dup_of carries DOC IDS — typed as the id column,
              // whatever that is (string crawl ids work as well as longs)
              D.create(s, verdictsPath, empty.select(col(id),
                lit(null).cast(empty.schema(id).dataType).as("near_dup_of"),
                lit(0L).as("batch_id")))
            ()
          } finally {
            sc.setLocalProperty("spark.scheduler.pool", null)
            sc.setLocalProperty("spark.jobGroup.id", null)
          }
        }
      }
    // the deduped batch feeds the probe (shingles, 3 referencing joins)
    // and two of the three appends — a LAZY cut: the banding job below
    // materializes b's blocks as its parent (one job barrier instead
    // of two), and by the time the overlapped append threads read b it
    // is a materialized snapshot all consumers share. Dedup is
    // max-by-text, NOT dropDuplicates: the surviving row must be
    // DETERMINISTIC (Frames.cut's replicated mode may recompute this
    // frame after block eviction — an order-dependent survivor could
    // then diverge between the already-run probe and a later append)
    val b = graft.Frames.cut(
      batch.select(col(id), col(text)).groupBy(col(id))
        .agg(max(col(text)).as(text)))
    // ONE shingling pass for the whole micro-batch (r17 fusion): this
    // eager cut materializes b's blocks as its parent AND produces the
    // shingle rows that feed BOTH the probe's verify joins (preSets —
    // the probe previously planned its own shingling cut) and the
    // banding below (which previously re-shingled inside
    // bandedSignatures). Two planned trees and one explode drop out of
    // every micro-batch.
    val inSets = graft.Frames.cut(
      graft.functions.TextFunctions.shingleSets(b, id, text),
      eager = true)
    lap("cut_sets")
    // minhash + banding FROM the materialized shingles — the probe's
    // candidate joins and the index append consume the same rows
    val banded = graft.Frames.cut(graft.functions.Dedup
      .bandedSignaturesFromSets(inSets, id, 32, 8), eager = true)
    lap("cut_bands")
    // the probe below reads index + corpus, and the appends need the
    // tables — the shells must exist from here on
    shells.foreach(f => scala.concurrent.Await.result(f,
      scala.concurrent.duration.Duration.Inf))
    lap("shells")
    // probe BEFORE this batch's index/corpus appends (the in-batch pass
    // covers batch-internal dups). Replay safety does NOT depend on the
    // append order below: the probe is blind to the current batch's own
    // prior partial appends (index partners in the batch are anti-joined
    // out of the candidate set; corpus text for batch ids loses to batch
    // text — both in DedupIndex.probe), so a replay after ANY crash
    // point recomputes the same verdicts, and the txn guards drop
    // whichever appends already landed.
    val corpus = D.read(s, corpusPath)
    val verdicts = graft.operators.DedupIndex.probe(
        s, b, corpus, id, text, indexPath, threshold,
        preBands = Some(banded), preSets = Some(inSets),
        lap = phase => lap(phase))
      .withColumn("batch_id", lit(batchId))
    lap("probe_built")
    // the three sink appends are MUTUALLY INDEPENDENT (verdicts from
    // the finished probe; index bands and corpus text both from `b`) —
    // they target different tables, so their write jobs + commit fsyncs
    // OVERLAP instead of forming a serial chain (the gate's wall is
    // commit latency; measured ~16 s solo serial). Each worker re-sets
    // the caller's scheduler-pool/job-group locals: the shared EC's
    // threads are reused across callers and would otherwise carry a
    // stale pool or misattribute jobs.
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val sc = s.sparkContext
      val pool = sc.getLocalProperty("spark.scheduler.pool")
      val group = sc.getLocalProperty("spark.jobGroup.id")
      def sink[T](body: => T): Future[T] = Future {
        sc.setLocalProperty("spark.scheduler.pool", pool)
        sc.setLocalProperty("spark.jobGroup.id", group)
        // clear on exit: the shared EC thread outlives this batch and
        // must not leak the gate's pool/job group into later callers
        try body
        finally {
          sc.setLocalProperty("spark.scheduler.pool", null)
          sc.setLocalProperty("spark.jobGroup.id", null)
        }
      }
      def timed[T](nm: String)(body: => T): T = {
        val a0 = System.nanoTime()
        val r = body
        val dt = (System.nanoTime() - a0) / 1e9
        log.info(f"gateBatch[$batchId] append_$nm $dt%.2fs")
        offerLap((batchId, s"append_$nm", dt))
        r
      }
      val appends: Seq[Future[Any]] = Seq(
        sink[Any](timed("verdicts")(
          D.appendOnce(s, verdictsPath, verdicts, GateApp, batchId))),
        sink[Any](timed("index")(graft.operators.DedupIndex.appendBands(s,
          banded.withColumnRenamed(id, "doc_id"),
          indexPath, app = GateApp, txnVersion = batchId))),
        sink[Any](timed("corpus")(
          D.appendOnce(s, corpusPath, b, GateApp, batchId))))
      appends.foreach(Await.result(_, Duration.Inf))
      lap("appends")
    }
    ()
  }

  /** Phase timings from [[gateBatch]] runs in this JVM — (batchId,
    * phase, seconds), drop-oldest capped at [[GateLapsCap]] so an
    * always-on gate holds O(1) driver state; tests and profiling
    * harnesses read attribution here without a log flip. */
  private[graft] val gateLaps =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Double)]()
  private val GateLapsCap = 256
  private def offerLap(t: (Long, String, Double)): Unit = {
    gateLaps.offer(t)
    // drop-oldest cap — an always-on gate must not grow driver state
    while (gateLaps.size > GateLapsCap) gateLaps.poll()
  }

  /** The gate's `txn` app id on all three tables. */
  private[graft] val GateApp = "graft-dedup-gate"

  /** Streaming source over an APPEND-ONLY DeltaLite table: Spark's file
    * stream source watches the table's data-file glob, so each
    * committed append batch becomes a micro-batch downstream — the
    * read side of a streaming medallion hop (bronze table → silver
    * stream). Append-only is the contract (like Delta's streaming reads
    * without CDF): compaction/DML rewrites would re-surface rows; run
    * maintenance on the sink side of the hop instead. */
  def fromDeltaLite(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema)
      .parquet(java.nio.file.Paths.get(path).toAbsolutePath.toString + "/files-*")

  // ------------------------------------------------------------- T7 (new)
  final case class UserTotal(user_id: Long, n: Long, total: Double)

  /** T7 on Spark 4's `transformWithState` API (the successor to
    * flatMapGroupsWithState): per-user running event count + value total
    * held in a typed `ValueState`, emitting the updated total on every
    * micro-batch. Requires the RocksDB state store provider (the API is
    * implemented only there) — state lives off-heap per key partition, so
    * at 100 TB state size is bounded by distinct keys × 16 bytes and
    * spills to local SST files, not executor heap. */
  class RunningTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotal] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      state = getHandle.getValueState[(Long, Double)]("agg", enc, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotal] = {
      var (n, t) = if (state.exists()) state.get() else (0L, 0.0)
      rows.foreach { e => n += 1; t += e.value }
      state.update((n, t))
      Iterator.single(UserTotal(key, n, t))
    }
  }

  /** Wire [[RunningTotalProcessor]] over a stream of [[Event]]s. */
  def runningTotals(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[UserTotal] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  // ------------------------------------------------------------------- T7
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, start: Timestamp,
      n_events: Int, dur_sec: Long)

  /** T7: arbitrary stateful processing — explicit per-user session
    * tracking via flatMapGroupsWithState; a session is emitted when a
    * later event arrives past the 30-minute gap (event-time-driven close;
    * a production pipeline would add an event-time timeout keyed to the
    * watermark to also flush trailing sessions). The hand-rolled form of
    * session_window, demonstrating custom keyed state. */
  def statefulSessions(events: Dataset[Event])(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= 30 * 60 * 1000 =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                closed ::= SessionOut(userId, new Timestamp(s.start), s.n,
                  (s.last - s.start) / 1000)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  final case class PatternState(st: Int, done: Long,
      partialStartMs: Long = 0L, lastSeenMs: Long = 0L)
  final case class PatternOut(user_id: Long, n_matches: Long, state: Int)

  /** STREAMING row-pattern matching — [[graft.operators.SeqPattern]]'s
    * compiled DFA carried across micro-batches as keyed state (the CEP
    * deployment shape of t30): per user, each micro-batch's events
    * fold through `Compiled.step` — the SAME transition table the
    * batch query and its oracle render as a CASE tree — starting from
    * the state the PREVIOUS batch left, so a match spanning a batch
    * boundary completes exactly as it would in one batch. Emits the
    * running (user, n_matches, state) per batch touched (Update-mode
    * semantics). `classOf` maps an event to its single-letter class;
    * events sort by (event time, event_id) WITHIN a batch — cross-
    * batch order is arrival order, the standard mapGroupsWithState
    * contract (a production pipeline feeding from an ordered log
    * satisfies it by construction; out-of-order sources need a
    * watermark-driven buffer first). State is one (int, long) per
    * user, hash-partitioned — O(keys) total, never O(events). */
  def matchPattern(events: Dataset[Event], pattern: String,
      classOf: String => Char)(
      implicit spark: SparkSession): Dataset[PatternOut] =
    matchPatternWithin(events, pattern, classOf, withinMs = None,
      idleEvictMs = None)

  /** [[matchPattern]] with the two bounds an ALWAYS-ON deployment
    * needs (without them, stale partial matches linger forever and
    * per-key state grows with the key universe):
    *
    *  - `withinMs` — the CEP `WITHIN` clause: a partial match older
    *    than this (event time from its FIRST committed row to the
    *    current row) expires BEFORE the current row is offered, and
    *    the row may then start a fresh match (the restart rule). A
    *    "V then C+ then P" funnel with within=30min no longer
    *    credits a purchase to a view from last month.
    *
    *  - `idleEvictMs` — event-time state eviction: a key whose last
    *    event is more than this behind the stream's watermark has its
    *    state REMOVED (a final tombstone row with state = -1 emits so
    *    downstream sees the counter's last value). Requires a
    *    watermark on `ts`. This is what bounds total state to the
    *    ACTIVE key set instead of every key ever seen — the 100 TB
    *    always-on contract.
    *
    * Both bounds are event-time; processing time never decides
    * semantics (replays and backfills behave identically). */
  def matchPatternWithin(events: Dataset[Event], pattern: String,
      classOf: String => Char, withinMs: Option[Long],
      idleEvictMs: Option[Long])(
      implicit spark: SparkSession): Dataset[PatternOut] = {
    import spark.implicits._
    val pat = graft.operators.SeqPattern.compile(pattern)
    val timeoutKind =
      if (idleEvictMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[PatternState, PatternOut](timeoutKind) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[PatternState]) =>
          if (state.hasTimedOut) {
            // idle key: free the state, emit the final tombstone
            val last = state.getOption.getOrElse(PatternState(0, 0L))
            state.remove()
            PatternOut(userId, last.done, -1)
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption.getOrElse(PatternState(0, 0L))
            sorted.foreach { e =>
              val ms = e.ts.getTime
              // WITHIN: expire a stale partial before offering the row.
              // Keep the persisted lastSeenMs through the expiry — a
              // LATE row tripping this branch must not re-anchor the
              // idle deadline to its own (older) timestamp, or a
              // recently active key gets a premature tombstone when
              // withinMs and idleEvictMs are combined (review finding).
              if (s.st > 0 && withinMs.exists(w =>
                  ms - s.partialStartMs > w))
                s = PatternState(0, s.done, 0L, s.lastSeenMs)
              val cls = classOf(e.event_type)
              val (n, emits) = pat.step(s.st, cls)
              val start =
                if (n == 0) 0L // completed or reset — no open partial
                else if (s.st == 0 || pat.isRestart(s.st, cls))
                  ms // partial opened (or re-based) at this row
                else s.partialStartMs // partial continues
              s = PatternState(n, if (emits) s.done + 1 else s.done,
                start, math.max(s.lastSeenMs, ms))
            }
            state.update(s)
            // the idle deadline derives from the key's last event EVER
            // SEEN (persisted in state) — re-basing from the current
            // batch alone would let one LATE batch shrink the deadline
            // and tombstone a recently active key (review finding).
            // The watermark clamp only guards Spark's requirement that
            // the timeout sit above the current watermark.
            idleEvictMs.foreach(idle => state.setTimeoutTimestamp(
              math.max(s.lastSeenMs + idle,
                state.getCurrentWatermarkMs() + 1)))
            PatternOut(userId, s.done, s.st)
          }
      }
  }
}

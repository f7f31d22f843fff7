package graft

import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming executions (SURVEY.md §2.8): MemoryStream
  * micro-batches through the Streams transformations, asserting the
  * streamed results equal the batch equivalents. */
class StreamingSpec extends AnyFunSuite with TestSpark {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("tumbling window counts with watermark (streaming == batch)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")

    val q = Streams.tumblingCounts(events).writeStream
      .format("memory").queryName("tumbling").outputMode("complete").start()
    try {
      input.addData(
        (1L, ts(5), "click", 1.0), (2L, ts(20), "click", 2.0),
        (3L, ts(65), "view", 3.0), (4L, ts(70), "click", 4.0))
      q.processAllAvailable()
      val out = spark.table("tumbling")
        .select(col("hour").cast("string"), col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(out === Set(
        ("2024-01-01 00:00:00", "click", 2L),
        ("2024-01-01 01:00:00", "view", 1L),
        ("2024-01-01 01:00:00", "click", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = Streams.dedupStream(events).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((1L, ts(1), "a"), (1L, ts(1), "a"), (2L, ts(2), "b"))
      q.processAllAvailable()
      input.addData((1L, ts(3), "a"), (3L, ts(4), "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming MERGE sink converges the table to latest-per-key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_upsert_tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_ckpt").toString
    val input = MemoryStream[(Long, String, Long)]
    val changes = input.toDF().toDF("user_id", "status", "seq")
    val q = Streams.upsertStream(changes, path, ckpt, Seq("user_id"), "seq")
    try {
      // batch 0 has an in-batch duplicate for key 1 — highest seq wins
      input.addData((1L, "a", 1L), (2L, "b", 1L), (1L, "c", 2L))
      q.processAllAvailable()
      input.addData((2L, "d", 3L), (3L, "e", 1L))
      q.processAllAvailable()
      val got = graft.sources.DeltaLite.read(spark, path)
        .select("user_id", "status").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(got === Seq((1L, "c"), (2L, "d"), (3L, "e")))
    } finally q.stop()
  }

  test("stream-static enrichment join broadcasts the dimension per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("event_id", "user_id")
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val q = Streams.enrichStream(events, dim, "user_id").writeStream
      .format("memory").queryName("enriched").outputMode("append").start()
    try {
      input.addData((1L, 7L), (2L, 8L), (3L, 99L))
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("event_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
      assert(got.sorted === Seq((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
    } finally q.stop()
  }

  test("stream-stream interval join matches conversions within 30 minutes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val convs = MemoryStream[(Long, Long, Timestamp)]
    val i = imps.toDF().toDF("imp_id", "user_id", "imp_ts")
    val c = convs.toDF().toDF("conv_id", "user_id", "conv_ts")
    val q = Streams.clickConversions(i, c).writeStream
      .format("memory").queryName("conv_join").outputMode("append").start()
    try {
      // user 1: impression at t0, conversion at t20 (inside interval) and
      // t50 (outside). user 2: conversion with no impression. user 3:
      // conversion BEFORE its impression (interval is one-directional).
      imps.addData((10L, 1L, ts(0)), (11L, 3L, ts(30)))
      convs.addData((20L, 1L, ts(20)), (21L, 1L, ts(50)),
        (22L, 2L, ts(15)), (23L, 3L, ts(10)))
      q.processAllAvailable()
      val got = spark.table("conv_join")
        .select("imp_id", "conv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted === Seq((10L, 20L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits unmatched rows after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val convs = MemoryStream[(Long, Long, Timestamp)]
    val i = imps.toDF().toDF("imp_id", "user_id", "imp_ts")
    val c = convs.toDF().toDF("conv_id", "user_id", "conv_ts")
    val q = Streams.clickConversionsOuter(i, c).writeStream
      .format("memory").queryName("conv_outer").outputMode("append").start()
    try {
      // user 1 converts inside the interval; user 2 never converts — its
      // null-padded row may only surface once the conversion watermark
      // proves no match can still arrive
      imps.addData((10L, 1L, ts(0)), (11L, 2L, ts(1)))
      convs.addData((20L, 1L, ts(20)))
      q.processAllAvailable()
      val matched = spark.table("conv_outer")
        .select("imp_id", "conv_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(matched.toSeq.contains((10L, 20L)))
      assert(!matched.toSeq.contains((11L, -1L)),
        "the unmatched row must NOT surface before the watermark passes")
      // advance both watermarks far past imp 11's interval end
      imps.addData((12L, 9L, ts(600)))
      convs.addData((29L, 9L, ts(600)))
      q.processAllAvailable()
      // one more micro-batch so the new watermark takes effect
      imps.addData((13L, 9L, ts(660)))
      convs.addData((30L, 9L, ts(660)))
      q.processAllAvailable()
      val after = spark.table("conv_outer")
        .select("imp_id", "conv_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(after.toSeq.contains((11L, -1L)),
        s"unmatched impression must emit null-padded after eviction, got ${after.toSeq}")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER interval join surfaces both unmatched sides") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val convs = MemoryStream[(Long, Long, Timestamp)]
    val i = imps.toDF().toDF("imp_id", "user_id", "imp_ts")
    val c = convs.toDF().toDF("conv_id", "user_id", "conv_ts")
    val q = Streams.clickConversionsFullOuter(i, c).writeStream
      .format("memory").queryName("conv_full").outputMode("append").start()
    try {
      // user 1 matches; impression 11 never converts; conversion 21 has
      // no impression (the orphan-conversion case left outer cannot see)
      imps.addData((10L, 1L, ts(0)), (11L, 2L, ts(1)))
      convs.addData((20L, 1L, ts(20)), (21L, 3L, ts(5)))
      q.processAllAvailable()
      def rows() = spark.table("conv_full")
        .select("imp_id", "conv_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      assert(rows().contains((10L, 20L)))
      assert(!rows().contains((11L, -1L)) && !rows().contains((-1L, 21L)),
        "neither unmatched side may surface before its watermark proof")
      // advance both watermarks far past every open interval, then one
      // more micro-batch so the new watermark takes effect
      imps.addData((12L, 9L, ts(600))); convs.addData((29L, 9L, ts(600)))
      q.processAllAvailable()
      imps.addData((13L, 9L, ts(660))); convs.addData((30L, 9L, ts(660)))
      q.processAllAvailable()
      assert(rows().contains((11L, -1L)),
        s"unmatched impression must emit null-padded, got ${rows()}")
      assert(rows().contains((-1L, 21L)),
        s"orphan conversion must emit null-padded, got ${rows()}")
    } finally q.stop()
  }

  test("native session windows group by inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val events = input.toDF().toDF("event_id", "ts", "user_id")
    val q = Streams.sessionCounts(events).writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    try {
      // user 7: events at 0,10,20 (one session), then 120 (new session)
      input.addData((1L, ts(0), 7L), (2L, ts(10), 7L), (3L, ts(20), 7L),
        (4L, ts(120), 7L))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .filter(col("user_id") === 7).collect()
      assert(sessions.length === 2)
      assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("file source -> transform -> file sink micro-batch pipeline") {
    // the production shape: readStream over arriving files, checkpointed
    // append sink — MemoryStream covers semantics, this covers the I/O path
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val e = Tables.t(spark, sf, "events")
      .withColumn("ts_sec", date_trunc("second", col("ts"))).drop("ts")
    // three "arriving" batches
    e.filter(col("event_id") % 3 === 0).write.parquet(s"$in/b0")
    e.filter(col("event_id") % 3 === 1).write.parquet(s"$in/b1")
    e.filter(col("event_id") % 3 === 2).write.parquet(s"$in/b2")
    val stream = spark.readStream
      .schema(e.schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(s"$in/*")
      .filter(col("value") > 50)
    val q = stream.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out).count()
    val batch = e.filter(col("value") > 50).count()
    assert(streamed === batch, "streamed result must equal the batch run")
  }

  test("readStream.format(graft-delta): version offsets deliver each commit once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_source")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val q = spark.readStream.format("graft-delta").load(table)
      .writeStream.format("memory").queryName("fmt_src")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // initial snapshot = first batch
      assert(spark.sql("SELECT k FROM fmt_src").as[Long].collect().sorted.toSeq
        === Seq(1L, 2L))
      // an append lands as its own micro-batch, exactly the new rows
      graft.sources.DeltaLite.append(spark, table, Seq((3L, "c")).toDF("k", "s"))
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM fmt_src").as[Long].collect().sorted.toSeq
        === Seq(1L, 2L, 3L))
      // a non-append commit (MERGE rewrites a file) fails the stream:
      // the append-only contract, same as Delta without ignoreChanges
      graft.sources.DeltaLite.merge(spark, table,
        Seq((1L, "A")).toDF("k", "s"), Seq("k"))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
    } finally q.stop()
  }

  test("graft-delta source with ignoreChanges streams through a rewrite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_src_ic")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    // rewrite BEFORE the stream starts consuming post-snapshot versions:
    // the initial snapshot carries v0; the merge rewrites a file in v1
    graft.sources.DeltaLite.merge(spark, table,
      Seq((1L, "A")).toDF("k", "s"), Seq("k"))
    val q = spark.readStream.format("graft-delta")
      .option("ignoreChanges", true).load(table)
      .writeStream.format("memory").queryName("fmt_src_ic")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // initial offset is the LATEST version at start → post-merge state
      assert(spark.sql("SELECT s FROM fmt_src_ic WHERE k = 1")
        .as[String].head() === "A")
      // a further rewrite does NOT fail the stream under ignoreChanges;
      // the rewritten file re-emits its surviving rows (at-least-once)
      graft.sources.DeltaLite.merge(spark, table,
        Seq((2L, "B")).toDF("k", "s"), Seq("k"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM fmt_src_ic WHERE s = 'B'")
        .head().getLong(0) >= 1L)
    } finally q.stop()
  }

  test("DV deletes break the append-only stream contract loudly, not silently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_dv_guard")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"))
    val q = spark.readStream.format("graft-delta").load(table)
      .writeStream.format("memory").queryName("fmt_dv_guard")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM fmt_dv_guard").head().getLong(0) === 3L)
      // a deletion-vector delete keeps every file path — a path-only diff
      // would stream through silently while the table lost rows; the
      // source must refuse exactly like a rewrite
      graft.sources.DeltaLite.deleteVectorized(spark, table, $"k" === 2L)
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      assert(causes(err).exists(_.getMessage != null) &&
        causes(err).exists(c => Option(c.getMessage).exists(
          _.contains("DV-deleted"))),
        s"expected the append-only guard to name DV deletes, got: $err")
    } finally q.stop()
  }

  test("ignoreChanges streams through a DV delete by re-delivering survivors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_dv_ic")
    val table = dir.resolve("tbl").toString
    // one data file, so the DV lands on the file holding ALL three rows
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s").coalesce(1))
    val q = spark.readStream.format("graft-delta")
      .option("ignoreChanges", true).load(table)
      .writeStream.format("memory").queryName("fmt_dv_ic")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      graft.sources.DeltaLite.deleteVectorized(spark, table, $"k" === 2L)
      q.processAllAvailable()
      // the DV'd file re-delivers its SURVIVING rows (at-least-once, like
      // a rewrite under ignoreChanges); the deleted row never re-appears
      assert(spark.sql("SELECT count(*) FROM fmt_dv_ic WHERE k = 1")
        .head().getLong(0) === 2L)
      assert(spark.sql("SELECT count(*) FROM fmt_dv_ic WHERE k = 2")
        .head().getLong(0) === 1L, "the deleted row must not re-deliver")
    } finally q.stop()
  }

  test("readChangeFeed surfaces a DV delete as row-level delete events") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_dv_cdf")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"))
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", true).load(table)
      .writeStream.format("memory").queryName("fmt_dv_cdf")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // the soft delete commits ONLY a deletion vector — no file removed,
      // no file rewritten — yet the change feed must emit exactly the
      // deleted row as a delete event
      graft.sources.DeltaLite.deleteVectorized(spark, table, $"k" === 2L)
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT k, s FROM fmt_dv_cdf WHERE _change_type = 'delete' AND _commit_version = 1")
        .as[(Long, String)].collect().toSeq === Seq((2L, "b")))
      // a second DV on the SAME file (cumulative vectors) emits only the
      // newly-deleted row
      graft.sources.DeltaLite.deleteVectorized(spark, table, $"k" === 3L)
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT k FROM fmt_dv_cdf WHERE _change_type = 'delete' AND _commit_version = 2")
        .as[Long].collect().toSeq === Seq(3L))
    } finally q.stop()
  }

  test("graft-delta source admission control: maxFilesPerTrigger bounds each micro-batch") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_rate")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((0L, "v0")).toDF("k", "s").coalesce(1))
    (1L to 3L).foreach(i => graft.sources.DeltaLite.append(spark, table,
      Seq((i, s"v$i")).toDF("k", "s").coalesce(1)))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream.format("graft-delta")
      .option("maxFilesPerTrigger", 1).load(table)
      .writeStream
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.select("k").as[Long].collect().toSeq.sorted); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // 4 one-file versions under a 1-file cap -> one version per batch, in
    // commit order, union exactly-once (vs ONE batch without the cap:
    // the initial offset would swallow the whole table)
    assert(batches.asScala.toSeq === Seq(Seq(0L), Seq(1L), Seq(2L), Seq(3L)))
    // the admission position persists under the stream's own metadata dir,
    // so a restarted source can never construct a regressed offset
    val pos = java.nio.file.Files.walk(dir.resolve("ckpt"))
      .iterator().asScala.find(_.getFileName.toString == "graft-source-position")
    assert(pos.isDefined)
    assert(new String(java.nio.file.Files.readAllBytes(pos.get), "UTF-8").trim === "3")
    // byte-based admission splits the same way (every version is larger
    // than a 1-byte budget, and ≥1 version is always admitted)
    val batches2 = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q2 = spark.readStream.format("graft-delta")
      .option("maxBytesPerTrigger", 1).load(table)
      .writeStream
      .option("checkpointLocation", dir.resolve("ckpt2").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches2.add(df.select("k").as[Long].collect().toSeq.sorted); ()
      }
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(batches2.asScala.toSeq === Seq(Seq(0L), Seq(1L), Seq(2L), Seq(3L)))
  }

  test("graft-delta source with startingVersion skips the initial-snapshot backfill") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_startv")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table, Seq((1L, "a")).toDF("k", "s"))
    graft.sources.DeltaLite.append(spark, table, Seq((2L, "b")).toDF("k", "s"))
    graft.sources.DeltaLite.append(spark, table, Seq((3L, "c")).toDF("k", "s"))
    val q = spark.readStream.format("graft-delta")
      .option("startingVersion", 2).load(table)
      .writeStream.format("memory").queryName("fmt_startv")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // only version 2's rows arrive — no v0/v1 backfill
      assert(spark.sql("SELECT k FROM fmt_startv").as[Long].collect().toSeq
        === Seq(3L))
      // later commits stream normally
      graft.sources.DeltaLite.append(spark, table, Seq((4L, "d")).toDF("k", "s"))
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM fmt_startv").as[Long].collect().sorted.toSeq
        === Seq(3L, 4L))
    } finally q.stop()
  }

  test("graft-delta source with Trigger.AvailableNow drains the backlog then stops") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_avnow")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table, Seq((1L, "a")).toDF("k", "s"))
    graft.sources.DeltaLite.append(spark, table, Seq((2L, "b")).toDF("k", "s"))
    graft.sources.DeltaLite.append(spark, table, Seq((3L, "c")).toDF("k", "s"))
    val out = dir.resolve("out").toString
    def drain(): Unit = {
      // parquet sink: resumable from the checkpoint (the memory sink is
      // not), which is exactly the batch-like rerun AvailableNow is for
      val q = spark.readStream.format("graft-delta").load(table)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      // AvailableNow = batch-like run: the query terminates ITSELF once
      // the offset captured at start is reached — no stop() needed
      assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    }
    def landed(): Seq[Long] =
      spark.read.parquet(out).select("k").as[Long].collect().sorted.toSeq
    drain()
    assert(landed() === Seq(1L, 2L, 3L))
    // data landing AFTER termination stays un-consumed until the next run,
    // which resumes from the checkpoint and drains ONLY the new commit
    graft.sources.DeltaLite.append(spark, table, Seq((4L, "d")).toDF("k", "s"))
    assert(landed() === Seq(1L, 2L, 3L))
    drain()
    assert(landed() === Seq(1L, 2L, 3L, 4L))
  }

  test("CDF getBatch tolerates an empty version range (restart replay)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val dir = java.nio.file.Files.createTempDirectory("graft_cdf_empty")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "a")).toDF("k", "s"))
    val src = new graft.sources.GraftDeltaStreamSource(spark, table,
      ignoreChanges = false, cdf = true)
    // the engine may replay getBatch with start == end after a restart:
    // that is an EMPTY CDF batch, not an error
    val batch = src.getBatch(Some(LongOffset(0L)), LongOffset(0L))
    assert(batch.isStreaming, "getBatch must return a streaming-tagged frame")
    assert(batch.schema.fieldNames.toSeq ===
      Seq("k", "s", "_change_type", "_commit_version"))
    // streaming-tagged frames refuse batch execution — count through the
    // underlying RDD of the LogicalRDD the tag wraps
    val rdd = batch.queryExecution.logical
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
    assert(rdd.count() === 0L)
  }

  test("graft-delta source with readChangeFeed streams per-commit row changes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_cdf")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", true).load(table)
      .writeStream.format("memory").queryName("fmt_cdf")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // v0 arrives as the initial contents tagged insert
      assert(spark.sql(
        "SELECT k FROM fmt_cdf WHERE _change_type = 'insert' AND _commit_version = 0")
        .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
      // an UPDATE-shaped merge yields the pre-image delete + post-image
      // insert at its commit version
      graft.sources.DeltaLite.merge(spark, table,
        Seq((1L, "A")).toDF("k", "s"), Seq("k"))
      q.processAllAvailable()
      val v1 = spark.sql(
        "SELECT _change_type, s FROM fmt_cdf WHERE _commit_version = 1")
        .as[(String, String)].collect().sorted.toSeq
      assert(v1 === Seq(("delete", "a"), ("insert", "A")))
      // a DELETE yields exactly the removed row
      graft.sources.DeltaLite.delete(spark, table, $"k" === 2L)
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT _change_type, s FROM fmt_cdf WHERE _commit_version = 2")
        .as[(String, String)].collect().toSeq === Seq(("delete", "b")))
      // an append is inserts only
      graft.sources.DeltaLite.append(spark, table, Seq((3L, "c")).toDF("k", "s"))
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT _change_type, k FROM fmt_cdf WHERE _commit_version = 3")
        .as[(String, Long)].collect().toSeq === Seq(("insert", 3L)))
      // an UPDATE commit carries Delta's pre/post-image labels
      graft.sources.DeltaLite.update(spark, table, $"k" === 3L,
        Map("s" -> org.apache.spark.sql.functions.lit("C")))
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT _change_type, s FROM fmt_cdf WHERE _commit_version = 4")
        .as[(String, String)].collect().sorted.toSeq ===
        Seq(("update_postimage", "C"), ("update_preimage", "c")))
    } finally q.stop()
  }

  test("a GOVERNED table streams: each micro-batch serves the S63 projection; policy changes govern from their version on") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gov_stream")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "25-989-741-2988", 100.0), (2L, "13-555-123-4567", -5.0))
        .toDF("k", "phone", "bal"),
      properties = Map(
        "graft.rowFilter" -> "bal >= 0.0", "graft.mask.phone" -> "last4"))
    val q = spark.readStream.format("graft-delta").load(table)
      .writeStream.format("memory").queryName("gov_src")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.sql("SELECT k, phone FROM gov_src")
        .as[(Long, String)].collect().toSeq
      assert(first === Seq((1L, "***********2988")),
        "the initial-snapshot batch must filter rows and mask columns")
      // an append batch is governed the same way
      graft.sources.DeltaLite.append(spark, table,
        Seq((3L, "999", 50.0), (4L, "888", -1.0)).toDF("k", "phone", "bal"))
      q.processAllAvailable()
      assert(spark.sql("SELECT k FROM gov_src").as[Long].collect().sorted
        .toSeq === Seq(1L, 3L), "k=4 is hidden by the row filter")
      // POLICY CHANGE MID-STREAM: dropping the policy governs every
      // batch whose end version no longer carries it — new rows serve
      // raw; rows hidden in ALREADY-DELIVERED batches do not
      // retro-deliver (append-only offsets never re-read old versions)
      graft.sources.DeltaLite.unsetProperty(table, "graft.rowFilter")
      graft.sources.DeltaLite.unsetProperty(table, "graft.mask.phone")
      graft.sources.DeltaLite.append(spark, table,
        Seq((5L, "777-111", -2.0)).toDF("k", "phone", "bal"))
      q.processAllAvailable()
      val after = spark.sql("SELECT k, phone FROM gov_src")
        .as[(Long, String)].collect().toMap
      assert(after.keySet === Set(1L, 3L, 5L),
        "post-drop batches serve raw; hidden rows from governed " +
          "batches stay undelivered")
      assert(after(5L) === "777-111", "no mask after the policy drop")
      assert(after(1L) === "***********2988",
        "already-delivered rows keep the shape they were served with")
    } finally q.stop()
  }

  test("a GOVERNED CDF stream: hidden rows' events never leak; images mask consistently; exemptions apply per batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gov_cdf")
    val table = dir.resolve("tbl").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, "alpha", 10.0), (2L, "beta", -5.0)).toDF("k", "s", "bal"),
      properties = Map(
        "graft.rowFilter" -> "bal >= 0.0", "graft.mask.s" -> "md5",
        "graft.maskExempt.s" -> "etl"))
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", true).load(table)
      .writeStream.format("memory").queryName("gov_cdf")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val v0 = spark.sql(
        "SELECT k, s FROM gov_cdf WHERE _commit_version = 0")
        .as[(Long, String)].collect().toSeq
      assert(v0.map(_._1) === Seq(1L),
        "the hidden row's initial insert must not leak")
      assert(v0.head._2.matches("[0-9a-f]{32}"), "events serve masked")
      // deleting a row the filter hides emits NOTHING — a delete event
      // would leak the row's existence
      graft.sources.DeltaLite.delete(spark, table, $"k" === 2L)
      q.processAllAvailable()
      assert(spark.sql(
        "SELECT * FROM gov_cdf WHERE _commit_version = 1").count() === 0,
        "a hidden row's delete must not surface")
      // an update moving a row OUT of the governed view surfaces only
      // the pre-image (the row left the view); the filtered post-image
      // must not appear
      graft.sources.DeltaLite.update(spark, table, $"k" === 1L,
        Map("bal" -> org.apache.spark.sql.functions.lit(-1.0)))
      q.processAllAvailable()
      val v2 = spark.sql(
        "SELECT _change_type FROM gov_cdf WHERE _commit_version = 2")
        .as[String].collect().toSeq
      assert(v2 === Seq("update_preimage"),
        s"expected just the departing pre-image, got $v2")
      // EXEMPTION PRINCIPALS apply per batch: etl (on graft.maskExempt.s)
      // sees the masked column raw in batches served while it is the
      // session principal
      spark.conf.set("spark.graft.principal", "etl")
      try {
        graft.sources.DeltaLite.append(spark, table,
          Seq((3L, "gamma", 7.0)).toDF("k", "s", "bal"))
        q.processAllAvailable()
        assert(spark.sql(
          "SELECT s FROM gov_cdf WHERE _commit_version = 3")
          .as[String].collect().toSeq === Seq("gamma"),
          "the exempted principal's batch serves the column raw")
      } finally spark.conf.unset("spark.graft.principal")
    } finally q.stop()
  }

  test("writeStream.format(graft-delta) lands exactly-once commits via the registered sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_sink")
    val table = dir.resolve("tbl").toString
    val input = MemoryStream[(Long, Double)]
    val q = input.toDF().toDF("k", "v")
      .writeStream.format("graft-delta")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .outputMode("append")
      .start(table)
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      input.addData((3L, 3.0))
      q.processAllAvailable()
      assert(spark.read.format("graft-delta").load(table)
        .select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
      // batch ids are txn-logged: replaying batch 0 is a no-op
      val before = graft.sources.DeltaLite.snapshot(table).version
      graft.sources.DeltaLite.appendOnce(spark, table,
        Seq((9L, 9.0)).toDF("k", "v"), app = "graft-delta-sink", txnVersion = 0L)
      assert(graft.sources.DeltaLite.snapshot(table).version === before)
    } finally q.stop()
  }

  test("streaming micro-batches land as DeltaLite file-level commits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_streamdelta")
    val table = dir.resolve("bronze").toString
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = Streams.toDeltaLite(events, table, dir.resolve("ckpt").toString)
    try {
      input.addData((1L, ts(1), "click", 1.0), (2L, ts(2), "view", 2.0))
      q.processAllAvailable()
      val v0Files = graft.sources.DeltaLite.snapshot(table).files.map(_.path).toSet
      input.addData((3L, ts(3), "click", 3.0))
      q.processAllAvailable()
      val snap = graft.sources.DeltaLite.snapshot(table)
      // second batch appended files; first batch's files survive by reference
      assert(snap.version >= 1L)
      assert(v0Files.subsetOf(snap.files.map(_.path).toSet))
      assert(graft.sources.DeltaLite.read(spark, table).count() === 3)
      // restart idempotence: replaying an already-landed batchId is a
      // no-op (the txn action in the log rejects the duplicate)
      val before = graft.sources.DeltaLite.snapshot(table)
      graft.sources.DeltaLite.appendOnce(spark, table,
        Seq((99L, ts(9), "dup", 99.0)).toDF("event_id", "ts", "event_type", "value"),
        app = "graft-stream", txnVersion = 0L)
      val after = graft.sources.DeltaLite.snapshot(table)
      assert(after.version === before.version)
      assert(graft.sources.DeltaLite.read(spark, table).count() === 3)
      // a NEW txn version still lands
      graft.sources.DeltaLite.appendOnce(spark, table,
        Seq((4L, ts(4), "click", 4.0)).toDF("event_id", "ts", "event_type", "value"),
        app = "graft-stream", txnVersion = 100L)
      assert(graft.sources.DeltaLite.read(spark, table).count() === 4)
    } finally q.stop()
  }

  test("streaming source over an append-only DeltaLite table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_deltasrc")
    val table = dir.resolve("bronze").toString
    graft.sources.DeltaLite.create(spark, table,
      Seq((1L, 10.0)).toDF("k", "v").coalesce(1))
    val schema = graft.sources.DeltaLite.snapshot(table).schema
    val q = Streams.fromDeltaLite(spark, table, schema)
      .groupBy().agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .writeStream.format("memory").queryName("deltasrc")
      .outputMode("complete")
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      graft.sources.DeltaLite.append(spark, table,
        Seq((2L, 20.0), (3L, 30.0)).toDF("k", "v").coalesce(1))
      q.processAllAvailable()
      val r = spark.table("deltasrc").as[(Long, Double)].collect().head
      assert(r === ((3L, 60.0)), s"stream must see both commits, got $r")
    } finally q.stop()
  }

  test("streaming medallion hop: DeltaLite source -> transform -> DeltaLite sink") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hop")
    val bronze = dir.resolve("bronze").toString
    val silver = dir.resolve("silver").toString
    graft.sources.DeltaLite.create(spark, bronze,
      Seq((1L, "click", 1.0), (2L, "view", -5.0)).toDF("event_id", "event_type", "value")
        .coalesce(1))
    val schema = graft.sources.DeltaLite.snapshot(bronze).schema
    // silver = cleaned bronze (drop non-positive values), streamed
    val q = Streams.toDeltaLite(
      Streams.fromDeltaLite(spark, bronze, schema).filter(col("value") > 0),
      silver, dir.resolve("ckpt").toString)
    try {
      q.processAllAvailable()
      assert(graft.sources.DeltaLite.read(spark, silver).count() === 1)
      // a new bronze append flows through the hop as its own micro-batch
      graft.sources.DeltaLite.append(spark, bronze,
        Seq((3L, "click", 3.0), (4L, "view", 0.0)).toDF("event_id", "event_type", "value")
          .coalesce(1))
      q.processAllAvailable()
      val out = graft.sources.DeltaLite.read(spark, silver)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(out === Seq(1L, 3L))
      // SQL surface over the landed silver table
      graft.sources.DeltaLite.registerView(spark, "silver_hop", silver)
      assert(spark.sql("SELECT count(*) FROM silver_hop").as[Long].head() === 2L)
    } finally q.stop()
  }

  test("transformWithState running totals (T7, Spark 4 API, RocksDB state)") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Streams.Event]
    val q = Streams.runningTotals(input.toDS()).writeStream
      .format("memory").queryName("twstotals").outputMode("append").start()
    try {
      input.addData(
        Streams.Event(1L, ts(0), 7L, "click", 1.5),
        Streams.Event(2L, ts(1), 7L, "click", 2.5),
        Streams.Event(3L, ts(2), 9L, "view", 10.0))
      q.processAllAvailable()
      input.addData(Streams.Event(4L, ts(3), 7L, "click", 6.0))
      q.processAllAvailable()
      val rows = spark.table("twstotals").as[Streams.UserTotal].collect()
      // batch 1 emits (7 -> 2, 4.0) and (9 -> 1, 10.0); batch 2 emits the
      // carried-forward (7 -> 3, 10.0) — state survived the batch boundary
      assert(rows.toSet === Set(
        Streams.UserTotal(7L, 2L, 4.0), Streams.UserTotal(9L, 1L, 10.0),
        Streams.UserTotal(7L, 3L, 10.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState checkpoint restore pins parallelism: a changed shuffle conf cannot re-shard state") {
    // The common ops mistake: bump spark.sql.shuffle.partitions on a
    // restart and expect the state store to re-shard. Structured
    // Streaming PINS the state partition count in the checkpoint's
    // offset log at first start and silently keeps it on every restart
    // — state stays correct, the conf change is a no-op for the
    // stateful operator. This test pins that contract: totals carry
    // across a restart under a DIFFERENT session conf, and both offset
    // log entries record the ORIGINAL partition count. (A real re-shard
    // requires a fresh checkpoint + state rebuild — at 100 TB of RocksDB
    // state that is a planned migration, never a conf flip.)
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_tws_out").toString
    val input = MemoryStream[Streams.Event]
    def start() = Streams.runningTotals(input.toDS()).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val q1 = start()
      input.addData(
        Streams.Event(1L, ts(0), 7L, "click", 1.5),
        Streams.Event(2L, ts(1), 7L, "click", 2.5),
        Streams.Event(3L, ts(2), 9L, "view", 10.0))
      q1.processAllAvailable()
      q1.stop()
      // restart the SAME checkpoint under a different parallelism
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      val q2 = start()
      input.addData(Streams.Event(4L, ts(3), 7L, "click", 6.0))
      q2.processAllAvailable()
      q2.stop()
      // state survived the restart: user 7's total carries 2+1 events
      val rows = spark.read.parquet(out).as[Streams.UserTotal].collect()
      assert(rows.contains(Streams.UserTotal(7L, 3L, 10.0)),
        s"restored state must carry totals across the restart, got ${rows.toSeq}")
      // both offset entries pin the ORIGINAL partition count — the
      // restarted query ignored the session's 16 and kept 4
      def offsetConf(batch: Int): String = new String(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(ckpt, "offsets", batch.toString)), "UTF-8")
      assert(offsetConf(0).contains("\"spark.sql.shuffle.partitions\":\"4\""))
      assert(offsetConf(1).contains("\"spark.sql.shuffle.partitions\":\"4\""),
        "the restart must keep the checkpointed partition count, not the new conf")
    } finally {
      spark.streams.active.foreach(_.stop())
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState custom sessionization (T7)") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.statefulSessions(input.toDS()).writeStream
      .format("memory").queryName("stateful").outputMode("append").start()
    try {
      // two bursts 2h apart → first session closes when the second arrives
      input.addData(
        Streams.Event(1L, ts(0), 7L, "click", 1.0),
        Streams.Event(2L, ts(10), 7L, "click", 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(3L, ts(130), 7L, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("stateful").as[Streams.SessionOut].collect()
      assert(out.length === 1) // first session emitted, second still open
      assert(out.head.n_events === 2)
      assert(out.head.dur_sec === 600L)
    } finally q.stop()
  }

  test("streaming row-pattern matching: the compiled DFA state carries across micro-batch boundaries") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def cls(t: String): Char = t match {
      case "view" => 'V'
      case "click" => 'C'
      case "purchase" => 'P'
      case _ => 'X'
    }
    val q = Streams.matchPattern(input.toDS(), "V C+ P", cls).writeStream
      .format("memory").queryName("cep_pattern").outputMode("update")
      .start()
    try {
      // batch 1 ends MID-PATTERN for user 7 (V C — state 2, no match);
      // user 9 sees only noise
      input.addData(
        Streams.Event(1L, ts(0), 7L, "view", 1.0),
        Streams.Event(2L, ts(1), 7L, "click", 1.0),
        Streams.Event(3L, ts(1), 9L, "error", 1.0))
      q.processAllAvailable()
      // batch 2: the purchase COMPLETES the match across the boundary —
      // only possible if state 2 survived the batch edge; the trailing
      // V P cannot match (P fails at state 1 and is not a start)
      input.addData(
        Streams.Event(4L, ts(2), 7L, "purchase", 1.0),
        Streams.Event(5L, ts(3), 7L, "view", 1.0),
        Streams.Event(6L, ts(4), 7L, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("cep_pattern").as[Streams.PatternOut]
        .collect().toSet
      assert(rows.contains(Streams.PatternOut(7L, 0L, 2)),
        s"batch 1 must leave user 7 mid-pattern: $rows")
      assert(rows.contains(Streams.PatternOut(7L, 1L, 0)),
        s"batch 2 must complete the cross-boundary match exactly once: " +
          s"$rows")
      assert(rows.contains(Streams.PatternOut(9L, 0L, 0)),
        s"noise-only keys stay at state 0 with zero matches: $rows")
    } finally q.stop()
  }

  test("streaming pattern WITHIN: a stale partial expires before the row is offered; a fresh one still matches") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def cls(t: String): Char = t match {
      case "view" => 'V'; case "click" => 'C'; case "purchase" => 'P'
      case _ => 'X'
    }
    val q = Streams.matchPatternWithin(input.toDS(), "V C+ P", cls,
        withinMs = Some(30L * 60 * 1000), idleEvictMs = None)
      .writeStream.format("memory").queryName("cep_within")
      .outputMode("update").start()
    try {
      // user 7: V C at t0..t1, P at t+60min — the partial (started at
      // the V) is older than 30min when the P arrives, so it expires
      // and no match fires. user 8: the same shape inside the window.
      input.addData(
        Streams.Event(1L, ts(0), 7L, "view", 1.0),
        Streams.Event(2L, ts(1), 7L, "click", 1.0),
        Streams.Event(3L, ts(0), 8L, "view", 1.0),
        Streams.Event(4L, ts(1), 8L, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        Streams.Event(5L, ts(60), 7L, "purchase", 1.0),
        Streams.Event(6L, ts(10), 8L, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("cep_within").as[Streams.PatternOut]
        .collect().toSet
      assert(rows.contains(Streams.PatternOut(7L, 0L, 0)),
        s"the 60-minute-late purchase must find the partial expired: " +
          s"$rows")
      assert(rows.contains(Streams.PatternOut(8L, 1L, 0)),
        s"the in-window purchase must complete its match: $rows")
      // the WITHIN clock re-bases on a RULE-3 RESTART specifically —
      // the expiry branch must NOT fire first, or isRestart is never
      // consulted and a broken restarts table would pass (review
      // finding): V@120 C@121, then V@140 arrives 20 min into the
      // 30-min window (no expiry; step at state 2 reading V is the
      // rule-3 restart), C@141, P@165 — 25 min after the SECOND V
      // (match iff the window re-based there) but 45 min after the
      // first (expiry would kill it had start stayed put)
      input.addData(
        Streams.Event(7L, ts(120), 7L, "view", 1.0),
        Streams.Event(8L, ts(121), 7L, "click", 1.0),
        Streams.Event(9L, ts(140), 7L, "view", 1.0),
        Streams.Event(10L, ts(141), 7L, "click", 1.0),
        Streams.Event(11L, ts(165), 7L, "purchase", 1.0))
      q.processAllAvailable()
      val rows2 = spark.table("cep_within").as[Streams.PatternOut]
        .collect().toSet
      assert(rows2.contains(Streams.PatternOut(7L, 1L, 0)),
        s"the rule-3-re-based partial completes within ITS OWN " +
          s"window: $rows2")
    } finally q.stop()
  }

  test("streaming pattern idle eviction: a key behind the watermark is tombstoned and its state removed") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def cls(t: String): Char = t match {
      case "view" => 'V'; case "click" => 'C'; case "purchase" => 'P'
      case _ => 'X'
    }
    val q = Streams.matchPatternWithin(
        input.toDS().withWatermark("ts", "1 minute").as[Streams.Event],
        "V C+ P", cls, withinMs = None,
        idleEvictMs = Some(10L * 60 * 1000))
      .writeStream.format("memory").queryName("cep_evict")
      .outputMode("update").start()
    try {
      // key 7 opens a partial, then only key 9 keeps the stream moving;
      // once the watermark passes 7's last event + 10min, 7's state is
      // evicted with a final tombstone (state = -1)
      input.addData(Streams.Event(1L, ts(0), 7L, "view", 1.0),
        Streams.Event(2L, ts(1), 7L, "click", 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(3L, ts(30), 9L, "view", 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(4L, ts(40), 9L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("cep_evict").as[Streams.PatternOut]
        .collect().toSet
      assert(rows.contains(Streams.PatternOut(7L, 0L, -1)),
        s"key 7 must be tombstoned once the watermark passes its " +
          s"idle bound: $rows")
      // the evicted key starts OVER (state was removed, not parked):
      // a full V C P after eviction matches from scratch
      input.addData(Streams.Event(5L, ts(50), 7L, "view", 1.0),
        Streams.Event(6L, ts(51), 7L, "click", 1.0),
        Streams.Event(7L, ts(52), 7L, "purchase", 1.0))
      q.processAllAvailable()
      val rows2 = spark.table("cep_evict").as[Streams.PatternOut]
        .collect().toSet
      assert(rows2.contains(Streams.PatternOut(7L, 1L, 0)),
        s"post-eviction events rebuild state from zero and match: $rows2")
    } finally q.stop()
  }

  test("streaming pattern WITHIN + idle eviction combined: a late row tripping expiry must not shrink the idle deadline") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    def cls(t: String): Char = t match {
      case "view" => 'V'; case "click" => 'C'; case "purchase" => 'P'
      case _ => 'X'
    }
    // The trap needs lastSeen − partialStart > within, which only a
    // rule-3 restart on a LATE row can produce: V@40 C@41 (start 40,
    // lastSeen 41), then late V@0 re-bases start to 0 while lastSeen
    // stays 41. A late C@35 then trips WITHIN expiry (35−0 > 30) —
    // the expiry rebuild must carry the persisted lastSeen (41)
    // forward, or the idle deadline collapses to 35+idle and the key
    // is tombstoned while still inside its true idle window.
    val q = Streams.matchPatternWithin(
        input.toDS().withWatermark("ts", "120 minutes").as[Streams.Event],
        "V C+ P", cls, withinMs = Some(30L * 60 * 1000),
        idleEvictMs = Some(360L * 60 * 1000))
      .writeStream.format("memory").queryName("cep_within_evict")
      .outputMode("update").start()
    try {
      input.addData(Streams.Event(1L, ts(40), 7L, "view", 1.0),
        Streams.Event(2L, ts(41), 7L, "click", 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(3L, ts(0), 7L, "view", 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(4L, ts(35), 7L, "click", 1.0))
      q.processAllAvailable()
      // drive the watermark to 397 min — past the BUGGY deadline
      // (35+360 = 395) but short of the true one (41+360 = 401); the
      // extra batch lets the new watermark take effect for timeouts
      input.addData(Streams.Event(5L, ts(517), 9L, "view", 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(6L, ts(518), 9L, "click", 1.0))
      q.processAllAvailable()
      val mid = spark.table("cep_within_evict").as[Streams.PatternOut]
        .collect().toSet
      assert(!mid.exists(r => r.user_id == 7L && r.state == -1),
        s"key 7 is still inside its true idle window (last seen " +
          s"t41, deadline t401 > watermark t397) — a tombstone here " +
          s"means the late expiry row re-anchored the deadline: $mid")
      // the un-evicted key completes a fresh match from its kept state
      input.addData(Streams.Event(7L, ts(520), 7L, "view", 1.0),
        Streams.Event(8L, ts(521), 7L, "click", 1.0),
        Streams.Event(9L, ts(522), 7L, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("cep_within_evict").as[Streams.PatternOut]
        .collect().toSet
      assert(rows.contains(Streams.PatternOut(7L, 1L, 0)),
        s"the surviving key must complete its post-expiry match: $rows")
      assert(!rows.exists(r => r.user_id == 7L && r.state == -1),
        s"key 7 must never have been tombstoned in this run: $rows")
    } finally q.stop()
  }

  test("streaming dedup gate: every batch is judged against all prior batches; index grows O(batch)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = graft.sources.DeltaLite
    val base = graft.TempDirs.fresh("stream_dedup_gate")
    val corpus = s"$base/corpus"; val idx = s"$base/index"
    val verdicts = s"$base/verdicts"; val ckpt = s"$base/ckpt"
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val common = (1 to 40).map(i => s"w$i")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.dedupGate(docs, "doc_id", "text",
      corpus, idx, verdicts, ckpt)
    try {
      // batch 0 bootstraps: two distinct docs, both "new"
      input.addData(doc(1L, common), doc(2L, (1 to 40).map(i => s"b$i")))
      q.processAllAvailable()
      // batch 1: 11 near-dups batch-0's doc 1; 12 is fresh
      input.addData(doc(11L, common.dropRight(1) :+ "zzz"),
        doc(12L, (1 to 40).map(i => s"f$i")))
      q.processAllAvailable()
      // batch 2: 21 duplicates 12 — proof the PREVIOUS batch already
      // serves as history (the index grew without a rebuild)
      input.addData(doc(21L, (1 to 40).map(i => s"f$i")))
      q.processAllAvailable()
      val v = D.read(spark, verdicts).collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(v === Map(1L -> -1L, 2L -> -1L,
        11L -> 1L, 12L -> -1L, 21L -> 12L))
      // corpus holds every ingested doc; index holds 8 bands per doc
      assert(D.read(spark, corpus).count() === 5L)
      assert(D.read(spark, idx).count() === 5L * 8)
      // growth is append-only: no index rewrite ever happened
      val ops = D.history(spark, idx).select("operation")
        .collect().map(_.getString(0)).toSet
      assert(!ops.exists(o => o.contains("OPTIMIZE") || o.contains("REPLACE")),
        s"index maintenance must be pure appends, got $ops")
    } finally q.stop()
  }

  test("dedup gate: STRING doc ids work end-to-end; batch-internal dups resolve keep-min-id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = graft.sources.DeltaLite
    val base = graft.TempDirs.fresh("stream_gate_str")
    val corpus = s"$base/corpus"; val idx = s"$base/index"
    val verdicts = s"$base/verdicts"; val ckpt = s"$base/ckpt"
    val common = (1 to 40).map(i => s"w$i")
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streams.dedupGate(docs, "doc_id", "text",
      corpus, idx, verdicts, ckpt)
    try {
      // batch 0: two fresh docs — with crawl-style STRING ids (this
      // shape used to die on the bootstrap's hardcoded long cast)
      input.addData(("docA", common.mkString(" ")),
        ("docB", (1 to 40).map(i => s"b$i").mkString(" ")))
      q.processAllAvailable()
      // batch 1: x1/x2 duplicate EACH OTHER only (keep-min-id in-batch);
      // z9 near-dups history docA
      input.addData(
        ("x1", (1 to 40).map(i => s"p$i").mkString(" ")),
        ("x2", ((1 to 39).map(i => s"p$i") :+ "zzz").mkString(" ")),
        ("z9", (common.dropRight(1) :+ "qqq").mkString(" ")))
      q.processAllAvailable()
      val v = D.read(spark, verdicts).collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) "-" else r.getString(1))).toMap
      assert(v === Map("docA" -> "-", "docB" -> "-",
        "x1" -> "-", "x2" -> "x1", "z9" -> "docA"))
      // near_dup_of is typed as the id column (string), not long
      assert(D.read(spark, verdicts).schema("near_dup_of").dataType ===
        org.apache.spark.sql.types.StringType)
    } finally q.stop()
  }

  test("dedup gate replay: re-running a batch — fully or after a partial failure — is a no-op") {
    import spark.implicits._
    val D = graft.sources.DeltaLite
    val base = graft.TempDirs.fresh("stream_gate_replay")
    val corpus = s"$base/corpus"; val idx = s"$base/index"
    val verdicts = s"$base/verdicts"
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val common = (1 to 40).map(i => s"w$i")
    val b0 = Seq(doc(1L, common), doc(2L, (1 to 40).map(i => s"b$i")))
      .toDF("doc_id", "text")
    Streams.gateBatch(b0, 0L, "doc_id", "text", corpus, idx, verdicts, 0.5)
    def counts() = (D.read(spark, corpus).count(),
      D.read(spark, idx).count(), D.read(spark, verdicts).count())
    val after0 = counts()
    assert(after0 === ((2L, 16L, 2L)))
    // FULL replay of batch 0 (restart before the checkpoint recorded
    // it): every write is txn-guarded — nothing lands twice
    Streams.gateBatch(b0, 0L, "doc_id", "text", corpus, idx, verdicts, 0.5)
    assert(counts() === after0, "a replayed batch must change nothing")
    // PARTIAL failure: batch 1's verdicts AND index appends landed, the
    // corpus append did not (the advisor's crash point — the replay
    // re-probes with the batch's own bands already indexed)
    val b1 = Seq(doc(11L, common.dropRight(1) :+ "zzz"),
      doc(12L, (1 to 40).map(i => s"f$i"))).toDF("doc_id", "text")
    val v1 = graft.operators.DedupIndex.probe(
        spark, b1, D.read(spark, corpus), "doc_id", "text", idx, 0.5)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(1L))
    D.appendOnce(spark, verdicts, v1, Streams.GateApp, 1L)
    graft.operators.DedupIndex.append(spark, b1, "doc_id", "text", idx,
      app = Streams.GateApp, txnVersion = 1L)
    // ... crash here; the stream replays batch 1 in full
    Streams.gateBatch(b1, 1L, "doc_id", "text", corpus, idx, verdicts, 0.5)
    assert(counts() === ((4L, 32L, 4L)),
      "replay must complete ONLY the missing corpus append")
    val v = D.read(spark, verdicts).collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v === Map(1L -> -1L, 2L -> -1L, 11L -> 1L, 12L -> -1L),
      "landed verdicts survive the replay unchanged")
    // REVERSED partial failure (the overlapped-appends crash point):
    // batch 2's INDEX and CORPUS appends landed, the verdicts append did
    // NOT — the replay's probe sees the batch's own bands in the index
    // and its own text in the corpus. Without the probe's batch-member
    // anti-join the index hit adds the reversed pair (21 flagged as a
    // dup of 22), both copies drop downstream, and the document is lost.
    val b2words = (1 to 40).map(i => s"g$i")
    val b2 = Seq(doc(21L, b2words), doc(22L, b2words.dropRight(1) :+ "qqq"))
      .toDF("doc_id", "text")
    graft.operators.DedupIndex.append(spark, b2, "doc_id", "text", idx,
      app = Streams.GateApp, txnVersion = 2L)
    D.appendOnce(spark, corpus, b2, Streams.GateApp, 2L)
    // ... crash here (verdicts never committed); full replay of batch 2
    Streams.gateBatch(b2, 2L, "doc_id", "text", corpus, idx, verdicts, 0.5)
    assert(counts() === ((6L, 48L, 6L)),
      "replay must complete ONLY the missing verdicts append")
    val v2 = D.read(spark, verdicts).collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v2 === Map(1L -> -1L, 2L -> -1L, 11L -> 1L, 12L -> -1L,
      21L -> -1L, 22L -> 21L),
      "index-first replay must still produce keep-min-id verdicts")
  }
}

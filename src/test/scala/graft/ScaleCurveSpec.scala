package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EMPIRICAL scale curve — the measured counterpart to the per-operator
  * 100 TB scale ARGUMENTS (PlanSpec pins shapes; this measures the
  * growth SLOPE). A deterministic ~4× fixture is synthesized from
  * sf0.1 (see the `base` note: sf0.01's fixed costs drown the data
  * term) by replicating every fact table with RE-KEYED ids (each copy
  * joins within itself, so join cardinalities — and therefore work —
  * grow linearly; naive replication without re-keying would square
  * them), and the heaviest operators run at both scales:
  * wall-clock must grow ≲ ~1.5× the data ratio and the driver heap must
  * stay flat. This is the cheapest way to catch a hidden driver-side
  * O(rows) bottleneck (an accidental collect, a per-row driver loop)
  * that no plan-shape pin can see.
  *
  * Methodology notes:
  *  - 1× is the SAME synthesized layout (re-keyed copy 0, proportional
  *    file counts), never the raw fixture — both scales pay identical
  *    per-file constants, so the ratio isolates the data slope;
  *  - each operator measures 1× and 4× BACK-TO-BACK so host-load drift
  *    (this box's documented slow modes are uniform) hits both sides of
  *    the ratio alike; the assertion is on the SUM across operators
  *    (per-op ratios at seconds-scale are scheduler-noise-bound);
  *  - one retry: a transient load spike fails the first pass, a real
  *    superlinear operator fails both. */
class ScaleCurveSpec extends AnyFunSuite with TestSpark {

  // sf0.1: at sf0.01 the per-op fixed costs (commit lifecycles, job
  // setup) drown the data term and the measured slope degenerates to
  // ~1.0 regardless of complexity — sf0.1 is the smallest base where
  // 4x data visibly moves the needle
  private val base = "/root/testdata/sf0.1"
  private val Copies = 4

  /** (table, column) → key domain; columns in one domain share an
    * offset so referential integrity holds within each copy. Dims
    * (region/nation and the *_nationkey refs) are NOT replicated — a
    * 4× fact world shares its dimensions, like a real lake. */
  private val domainOf: Map[String, Seq[(String, String)]] = Map(
    "lineitem" -> Seq(("l_orderkey", "orderkey"), ("l_partkey", "partkey"),
      ("l_suppkey", "suppkey")),
    "orders" -> Seq(("o_orderkey", "orderkey"), ("o_custkey", "custkey")),
    "customer" -> Seq(("c_custkey", "custkey")),
    "supplier" -> Seq(("s_suppkey", "suppkey")),
    "part" -> Seq(("p_partkey", "partkey")),
    "events" -> Seq(("event_id", "eventid"), ("user_id", "userid")),
    "documents" -> Seq(("doc_id", "docid")),
    "embeddings" -> Seq(("vec_id", "vecid")))

  private lazy val (dir1x, dir4x): (String, String) = {
    val out1 = TempDirs.fresh("curve_1x")
    val out4 = TempDirs.fresh("curve_4x")
    // one offset per key DOMAIN: max over every column in the domain +1
    val offsets: Map[String, Long] = domainOf.toSeq
      .flatMap { case (t, cols) =>
        val df = spark.read.parquet(s"$base/$t.parquet")
        val mx = df.agg(cols.map { case (c, _) => max(col(c)) }.head,
          cols.map { case (c, _) => max(col(c)) }.tail: _*).head()
        cols.zipWithIndex.map { case ((_, d), i) => d -> mx.getLong(i) }
      }.groupBy(_._1).map { case (d, xs) => d -> (xs.map(_._2).max + 1L) }
    def writeScaled(t: String, copies: Int, out: String): Unit = {
      val df = spark.read.parquet(s"$base/$t.parquet")
      val keyed = (0 until copies).map { i =>
        domainOf(t).foldLeft(df) { case (d, (c, dom)) =>
          d.withColumn(c, col(c) + lit(i * offsets(dom)))
        }
      }.reduce(_ unionAll _)
      // proportional file counts: per-file constants scale WITH the
      // data, as a real 4× table's layout would
      keyed.repartition(2 * copies).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }
    Seq("region", "nation").foreach { t =>
      val df = spark.read.parquet(s"$base/$t.parquet")
      df.coalesce(1).write.mode("overwrite").parquet(s"$out1/$t.parquet")
      df.coalesce(1).write.mode("overwrite").parquet(s"$out4/$t.parquet")
    }
    domainOf.keys.foreach { t =>
      writeScaled(t, 1, out1)
      writeScaled(t, Copies, out4)
    }
    (out1, out4)
  }

  // t27_holt_keyed is here for a specific claim: the re-keyed fixture
  // multiplies the USER domain 4× (same days per user), so its slope
  // measures that the keyed recursion fold scales with KEYS inside
  // executors — the many-series design the t13/t19/t26 driver loops
  // point at — and never with the driver.
  // l3_mp_ivf is here for a specific claim: the hubness family's
  // bucketed twin holds per-cell occupancy ~constant (k scales with
  // the corpus), so its candidate frame — the thing that made the
  // exact twin the last data-quadratic plan — grows ~linearly with
  // the re-keyed 4× vector domain.
  private val Ops = Seq(
    "l2_minhash_lsh", "l2_dedup_groups", "l3_ann_index", "l4_tfidf",
    "l7_pipeline", "s8_merge_upsert", "s9_scd2_snapshot",
    "s25_incremental_mv", "s26_mv_minmax", "s33_join_mv",
    "t27_holt_keyed", "l3_mp_ivf")

  private def runOp(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    // noop sink: full execution, zero driver-side result materialization
    SparkEntry.queries(name)(spark, dir)
      .write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def usedHeapMb(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  test("4x data costs ~4x wall on the heaviest operators; driver heap stays flat") {
    // force fixture synthesis outside the timed region
    val (d1, d4) = (dir1x, dir4x)
    val ratio = spark.read.parquet(s"$d4/lineitem.parquet").count().toDouble /
      spark.read.parquet(s"$d1/lineitem.parquet").count().toDouble
    assert(ratio > 3.9 && ratio < 4.1, s"fixture ratio must be ~4x: $ratio")
    val heap0 = usedHeapMb()
    // WARM-UP pass (untimed): codegen compilation, JIT, first-scan
    // footprint — without it the 1x pass absorbs every fixed cost and
    // the measured slope degenerates below 1 (observed 0.66x on the
    // first un-warmed run), hiding any real superlinearity
    Ops.foreach(runOp(_, d1))
    // the 4x side of l3_mp_ivf must pre-pay its one-time per-dir
    // quantizer memo (count + seeded k-means) like the 1x side just
    // did, or pass 1 measures training, not the candidate frame
    runOp("l3_mp_ivf", d4)
    def pass(): (Double, Double, Seq[(String, Double, Double)]) = {
      val per = Ops.map { op =>
        val w1 = runOp(op, d1)
        val w4 = runOp(op, d4)
        info(f"$op%-20s 1x ${w1}%6.2fs  4x ${w4}%6.2fs  slope ${w4 / w1}%4.2fx")
        (op, w1, w4)
      }
      (per.map(_._2).sum, per.map(_._3).sum, per)
    }
    // bound: wall grows at most ~1.5x the data ratio, plus a fixed
    // allowance for per-run constants (commit lifecycles, job setup)
    // and the queue distortion of PARALLEL suite execution — this spec
    // shares the JVM and its 32 cores with every other suite in `sbt
    // test`, so individual ops can stall behind another suite's stage
    def ok(s1: Double, s4: Double): Boolean = s4 <= s1 * ratio * 1.5 + 15.0
    var (f1, f4, _) = pass()
    var retries = 0
    while (!ok(f1, f4) && retries < 2) {
      // retries: a transient load spike (host or sibling suite) fails a
      // single pass; a real superlinear operator fails every pass
      info(f"retrying: pass sum 1x $f1%.1fs -> 4x $f4%.1fs")
      retries += 1
      val (r1, r4, _) = pass(); f1 = r1; f4 = r4
    }
    info(f"scale curve: sum 1x $f1%.1fs -> 4x $f4%.1fs " +
      f"(slope ${f4 / f1}%.2fx over ${ratio}%.1fx data)")
    assert(ok(f1, f4),
      f"wall must scale ~linearly: 1x $f1%.1fs -> 4x $f4%.1fs " +
        f"(${f4 / f1}%.2fx over ${ratio}%.1fx data)")
    // driver heap SMOKE bound: a gross O(rows) driver materialization
    // of the 4x batch would show here. The bound is deliberately loose
    // — the JVM is shared with concurrently-running suites whose
    // allocations pollute any tight delta (a 1.5 GiB bound flaked under
    // full-suite parallelism)
    val heapGrowth = usedHeapMb() - heap0
    info(s"driver heap growth across the scale-up: ${heapGrowth} MB")
    assert(heapGrowth < 6144,
      s"driver heap grew ${heapGrowth} MB across the scale-up — gross " +
        "driver-side materialization")
  }

  test("file-pruning rules: 4x files under a selective filter costs ~flat wall (the skip is O(metadata), not O(files))") {
    // The measured counterpart to the BranchFilePruning / Format-
    // ReadBranching PlanSpec pins: two table shapes, each built at 4
    // and 16 files with PROPORTIONAL data, queried with a filter that
    // keeps exactly one file/partition. If the skip really is log-
    // metadata work, wall stays ~flat while data and file count grow
    // 4x; a rule that silently fell back to scanning would track the
    // data ratio instead.
    import org.apache.spark.sql.functions._
    val D = graft.sources.DeltaLite
    def scanFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.inputFiles.length
            case _ => 0
          }
      }.sum
    val rowsPerFile = 2000000L
    // flat shape (BranchFilePruning): one commit, range-partitioned
    // writer → disjoint per-file v ranges in the log's stats
    def mkFlat(nFiles: Int): String = {
      val p = TempDirs.fresh(s"curve_bfp_$nFiles") + "/t"
      D.create(spark, p, spark.range(nFiles * rowsPerFile)
        .select(col("id").as("v"), (col("id") % 97L).as("w"))
        .repartitionByRange(nFiles, col("v")))
      p
    }
    // partitioned shape (FormatReadBranching): one partition per file;
    // 4x = 4x partitions of the same per-partition volume
    def mkPart(nParts: Int): String = {
      val p = TempDirs.fresh(s"curve_frb_$nParts") + "/t"
      D.create(spark, p, spark.range(nParts * rowsPerFile)
        .select(col("id").as("v"),
          concat(lit("p"), (col("id") % nParts).cast("string")).as("pt"))
        .repartition(nParts, col("pt")),
        partitionBy = Seq("pt"))
      p
    }
    val (flat1, flat4) = (mkFlat(4), mkFlat(16))
    val (part1, part4) = (mkPart(4), mkPart(16))
    def qFlat(p: String) = D.read(spark, p)
      .filter(col("v") >= 1000L && col("v") < 900000L)
    def qPart(p: String) = spark.read.format("graft-delta").load(p)
      .filter(col("pt") === "p2" && col("v") >= 0L)
    // plan evidence first: both rules prune to exactly one file at
    // BOTH scales — the wall bound below then measures only metadata
    Seq(qFlat(flat1), qFlat(flat4), qPart(part1), qPart(part4))
      .foreach(q => assert(scanFiles(q) === 1,
        s"selective filter must keep exactly 1 file:\n" +
          q.queryExecution.optimizedPlan))
    def time(q: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      q.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up (codegen/JIT), then timed passes with the suite's retry
    // discipline (shared JVM — a sibling suite's stage can stall one
    // pass)
    Seq(time(qFlat(flat1)), time(qPart(part1)))
    def pass(): (Double, Double) = {
      val w1 = time(qFlat(flat1)) + time(qPart(part1))
      val w4 = time(qFlat(flat4)) + time(qPart(part4))
      info(f"pruned-query wall: 1x $w1%5.2fs  4x(files) $w4%5.2fs")
      (w1, w4)
    }
    def ok(w1: Double, w4: Double): Boolean = w4 <= w1 * 2.0 + 10.0
    var (w1, w4) = pass()
    var retries = 0
    while (!ok(w1, w4) && retries < 2) {
      retries += 1; val r = pass(); w1 = r._1; w4 = r._2
    }
    assert(ok(w1, w4),
      f"pruned wall must stay ~flat over 4x files: 1x $w1%.2fs -> " +
        f"4x $w4%.2fs")
  }
}

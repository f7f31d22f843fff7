package graft

import graft.functions.{Dedup, GraftFunctions, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-based dedup & ANN correctness (SURVEY.md §2.9 L2/L3): recall
  * against brute-force ground truth on sf0.001 — the checks a DuckDB
  * oracle can't express for xxhash64-based sketches. */
class DedupSpec extends AnyFunSuite with TestSpark {

  private def corpus = {
    val d = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
    val mutated = d.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000).as("doc_id"),
        array_join(expr("slice(split(text,' '), 1, size(split(text,' ')) - 1)"), " ")
          .as("text"))
    d.unionByName(mutated)
  }

  test("minhash_agg signatures are bit-identical to the 32-column expression form") {
    GraftFunctions.register(spark)
    val sets = TextFunctions.shingleSets(corpus, "doc_id", "text")
    val aggs = (0 until 32).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    val viaExprs = sets.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val viaSketch = Dedup.minHashSignature(sets, "doc_id", 32)
    assert(viaExprs.count() === viaSketch.count())
    assert(viaExprs.exceptAll(viaSketch).count() === 0,
      "minhash_agg must reproduce Spark's xxhash64 chain exactly")
  }

  test("MinHash-LSH candidates achieve full recall at jaccard >= 0.8") {
    val sets = TextFunctions.shingleSets(corpus, "doc_id", "text")
    // brute-force ground truth: all pairs sharing >= 1 shingle
    val a = sets.select(col("doc_id").as("ida"), col("shingle").as("sha"))
    val b = sets.select(col("doc_id").as("idb"), col("shingle").as("shb"))
    val allPairs = a.join(b, col("sha") === col("shb") && col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    val truth = TextFunctions.exactJaccard(allPairs, sets, "doc_id")
      .filter(col("jaccard") >= 0.8)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 20, "planted near-dups must be in the ground truth")

    val found = Dedup.minHashNearDups(corpus, "doc_id", "text", threshold = 0.8)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with 8 bands x 4 rows, P(miss at j>=0.8) = (1-0.8^4)^8 < 1.3%;
    // require >= 95% recall and exact precision (verified pairs only)
    val recall = truth.intersect(found).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall; missed ${truth.diff(found)}")
    assert(found.subsetOf(truth), "exact-jaccard verification must kill false positives")
  }

  test("SimHash finds the planted near-dup pairs") {
    // measured: planted pairs sit at hamming 0-9 on sf0.001; 8x8-bit
    // banding guarantees candidates to hamming 7 (pigeonhole)
    val found = Dedup.simHashNearDups(corpus, "doc_id", "text", maxHamming = 10)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 20L).map(i => (i, i + 1000000)).toSet
    val hit = planted.intersect(found).size
    assert(hit >= 18, s"only $hit/20 planted pairs found: missing ${planted.diff(found)}")
  }

  test("vec_dot (codegen) equals the higher-order-function fold exactly") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val diff = e.select(
      call_function("vec_dot", col("embedding"), col("embedding")).as("native"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)").as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff === 0, "codegen dot product must be bit-identical to the HOF fold")
  }

  test("hyperplane-LSH ANN recovers planted near-duplicate vectors") {
    // Raw gaussian embeddings have no cluster structure (top-1 cosine
    // ~0.35 → LSH enrichment ≈ 1, measured), so the correctness property
    // is tested on planted near-dups: a slightly perturbed copy of each
    // of 50 vectors must land in the same bucket as its original with the
    // sign-agreement probability (1 - θ/π)^planes ≈ 0.95 for θ ≈ 2°.
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("embedding"))
    val all = e.select(col("vec_id"), col("embedding")).unionByName(queries)
      .withColumn("bucket", Dedup.lshBucket(col("embedding"), 4, 64))
    val buckets = all.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hits = (0L until 50L).count(i => buckets(i) == buckets(i + 10000))
    assert(hits >= 35, s"only $hits/50 perturbed vectors kept their bucket")
  }

  test("JL random projection: deterministic, bounded distortion, near-dups preserved") {
    GraftFunctions.register(spark)
    val m = 16
    def project(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("p", expr(
        s"""transform(sequence(0, ${m - 1}), k ->
              aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE),
                (acc, j) -> acc + CAST(embedding[j] AS DOUBLE) *
                  CASE WHEN pmod(xxhash64(j, k), 2) = 0
                       THEN CAST(1.0 AS DOUBLE)
                       ELSE CAST(-1.0 AS DOUBLE) END))"""))
    val e = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 100)
    // determinism: the sign matrix regenerates identically on every run
    val p1 = project(e).select("vec_id", "p").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = project(e).select("vec_id", "p").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 === p2)
    // JL distortion: projected cosine tracks exact cosine for all pairs
    // among 40 vectors (780 pairs) within the ~1/sqrt(m) band
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact = e.filter(col("vec_id") < 40)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val deltas = for {
      i <- 0L until 40L; j <- (i + 1) until 40L
    } yield math.abs(cos(p1(i), p1(j)) - cos(exact(i), exact(j)))
    // per-pair std is ~1/sqrt(m) = 0.25; the max over 780 pairs sits in
    // the ~3σ tail (measured 0.72 on these fixtures) — the JL guarantee
    // is about the BAND, not the extreme order statistic
    assert(deltas.max < 0.85, s"worst-case distortion ${deltas.max}")
    assert(deltas.sum / deltas.size < 0.22,
      s"mean distortion ${deltas.sum / deltas.size} exceeds the 1/sqrt(16) band")
    // planted near-dups: projection is linear, so a 2% perturbation stays
    // a near-dup in the projected space
    val planted = project(e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("embedding")))
      .select("vec_id", "p").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val sims = (0L until 50L).map(i => cos(p1(i), planted(i + 10000)))
    assert(sims.forall(_ > 0.95),
      s"planted pair projected similarity floor ${sims.min}")
  }

  test("IVF ANN: perturbed near-dup vectors land in their original's cell") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("embedding"))
    val all = e.select(col("vec_id"), col("embedding")).unionByName(queries)
    val assigned = Dedup.ivfAssign(all, "embedding", k = 16)
      .select("vec_id", "centroid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hits = (0L until 50L).count(i => assigned(i) == assigned(i + 10000))
    assert(hits >= 40, s"only $hits/50 perturbed vectors share their cell")
  }

  test("PQ-ADC ranks each planted near-dup's original as its top-1 neighbor") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val cb = Dedup.pqTrain(e, "embedding")
    val codes = Dedup.pqEncode(e.select(col("vec_id"), col("embedding")),
      "embedding", cb)
    // queries = 2%-perturbed copies of 50 corpus vectors; under ADC the
    // unperturbed original should be the nearest code almost always
    // (quantization error ≫ perturbation only in pathological cells)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("vec_id").asc)
    val top1 = codes.crossJoin(broadcast(q))
      .withColumn("d2", Dedup.pqAdcDistance(col("qe"), cb))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("qid", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0L until 50L).count(i => top1(i) == i)
    assert(hits >= 45, s"only $hits/50 perturbed queries ranked their original top-1")
    // sanity: codes are within range and all m columns materialized
    val mx = codes.agg(max(col("pq0")), min(col("pq7"))).head()
    assert(mx.getInt(0) <= 15 && mx.getInt(1) >= 0)
  }

  test("IVF-PQ composition: probed cells + ADC rank the original top-1 for planted near-dups") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val centers = Dedup.ivfTrain(e, "embedding", k = 16)
    val cb = Dedup.pqTrain(e, "embedding")
    val corpus = Dedup.pqEncode(
      Dedup.ivfAssign(e.select(col("vec_id"), col("embedding")),
        "embedding", centers),
      "embedding", cb)
      .select(col("vec_id") +: col("centroid").as("cc") +:
        cb.indices.map(j => col(s"pq$j")): _*)
    val q = Dedup.ivfProbes(
      e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"),
          expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
            .as("qe")),
      "qe", centers, probes = 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2").asc, col("vec_id").asc)
    val top1 = q.join(corpus, col("centroid") === col("cc"))
      .withColumn("d2", Dedup.pqAdcDistance(col("qe"), cb))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("qid", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recall through BOTH approximations (cell gating + quantized codes):
    // the unperturbed original should still surface as top-1 for most
    val hits = (0L until 50L).count(i => top1.get(i).contains(i))
    assert(hits >= 40,
      s"only $hits/50 perturbed queries ranked their original top-1 via IVF-PQ")
  }

  test("AnnIndex: persisted build+append serves deterministic top-k with partition pruning") {
    import graft.operators.AnnIndex
    import graft.sources.DeltaLite
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") >= 50).select(col("vec_id"), col("embedding"))
    val root1 = java.nio.file.Files.createTempDirectory("graft_annidx1").toString
    val root2 = java.nio.file.Files.createTempDirectory("graft_annidx2").toString
    // build half, append the other half under the frozen model
    AnnIndex.build(spark, root1, corpus.filter(pmod(col("vec_id"), lit(2)) === 0),
      "vec_id", "embedding")
    AnnIndex.append(spark, root1, corpus.filter(pmod(col("vec_id"), lit(2)) === 1),
      "vec_id", "embedding")
    // the codes table is partitioned by cell, append landed as version 1
    val snap = DeltaLite.snapshot(s"$root1/codes")
    assert(snap.partitionBy === Seq("cell"))
    assert(snap.version === 1L)
    assert(DeltaLite.read(spark, s"$root1/codes").count() === corpus.count())
    // identical rebuild => identical results (everything is seeded)
    AnnIndex.build(spark, root2, corpus.filter(pmod(col("vec_id"), lit(2)) === 0),
      "vec_id", "embedding")
    AnnIndex.append(spark, root2, corpus.filter(pmod(col("vec_id"), lit(2)) === 1),
      "vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("qe"))
    val r1 = AnnIndex.query(spark, root1, queries, "qid", "qe").collect()
    val r2 = AnnIndex.query(spark, root2, queries, "qid", "qe").collect()
    assert(r1.toSet === r2.toSet)
    assert(r1.nonEmpty)
    // near-dup recall through the PERSISTED index: a perturbed query of a
    // corpus vector should usually rank its original first
    val planted = e.filter(col("vec_id").between(50, 99))
      .select(col("vec_id").as("qid"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("qe"))
    val top1 = AnnIndex.query(spark, root1, planted, "qid", "qe")
      .filter(col("rk") === 1).select("qid", "nid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (50L until 100L).count(i => top1.get(i).contains(i))
    assert(hits >= 40,
      s"only $hits/50 perturbed corpus vectors ranked their original top-1 via the persisted index")
    // serve-path pruning: a single-cell probe opens ONLY that cell's files
    val one = AnnIndex.query(spark, root1,
      e.filter(col("vec_id") === 60)
        .select(col("vec_id").as("qid"), col("embedding").as("qe")),
      "qid", "qe", probes = 1, topK = 1)
    val cell = one.collect() // forces probe; result's cell via codes join
    assert(cell.length === 1)
    val probedCell = Dedup.ivfProbes(
      e.filter(col("vec_id") === 60)
        .select(col("vec_id").as("qid"), col("embedding").as("qe")),
      "qe", AnnIndex.loadCenters(spark, root1), probes = 1)
      .select("centroid").head().getInt(0)
    val cellFiles = snap.files.count(_.pv.get("cell").contains(probedCell.toString))
    val scanned = DeltaLite.scan(spark, s"$root1/codes",
      Seq(DeltaLite.ColumnBound("cell", Some(probedCell), Some(probedCell))))
    assert(scanned.inputFiles.length === cellFiles,
      "single-cell serve must open only the probed cell's partition files")
    assert(cellFiles < snap.files.size)

    // IN-set serve-path pruning: a NON-contiguous probe set {lo, hi}
    // must open exactly those two cells' files — not the covering
    // [lo, hi] range (which at 100 TB would read every cell in between)
    val present = snap.files.flatMap(_.pv.get("cell")).map(_.toInt).distinct.sorted
    val (lo, hi) = (present.head, present.last)
    assert(hi - lo >= 2 && present.length >= 3,
      "fixture needs a 3+-cell spread to observe set-vs-range pruning")
    val setFiles = snap.files.count(_.pv.get("cell").exists(v =>
      v == lo.toString || v == hi.toString))
    val inScan = DeltaLite.scan(spark, s"$root1/codes",
      Seq(DeltaLite.ColumnBound.in("cell", Seq(lo, hi))))
    assert(inScan.inputFiles.length === setFiles,
      "IN-set scan must open exactly the probed cells' files")
    val rangeScan = DeltaLite.scan(spark, s"$root1/codes",
      Seq(DeltaLite.ColumnBound("cell", Some(lo), Some(hi))))
    assert(rangeScan.inputFiles.length > setFiles,
      "the covering range opens strictly more files than the exact set")
    // and the pruned scan still returns exactly the two cells' rows
    assert(inScan.count() ===
      DeltaLite.read(spark, s"$root1/codes")
        .filter(col("cell").isin(lo, hi)).count())
  }

  test("AnnIndex drift maintenance: append touches only the new batch; occupancy skew triggers retrain; rebuild rebalances") {
    import graft.operators.AnnIndex
    import graft.sources.DeltaLite
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") >= 50)
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft_anndrift").toString
    AnnIndex.build(spark, root, corpus, "vec_id", "embedding")
    // balanced fixture: well under the retrain threshold
    val skew0 = AnnIndex.occupancySkew(spark, root)
    assert(!AnnIndex.needsRetrain(spark, root, maxSkew = 4.0),
      s"fixture corpus must start balanced, skew $skew0")
    // --- APPEND TOUCHES ONLY THE NEW BATCH (the refresh-path pin):
    // every file live before the append is still live after, and the
    // commit's adds are exactly the batch's new files — no rewrite, no
    // re-encode of the standing corpus
    val before = DeltaLite.snapshot(s"$root/codes")
    val batch = e.filter(col("vec_id").between(20, 49))
      .select(col("vec_id"), col("embedding"))
    AnnIndex.append(spark, root, batch, "vec_id", "embedding")
    val after = DeltaLite.snapshot(s"$root/codes")
    assert(after.version === before.version + 1)
    val beforePaths = before.files.map(_.path).toSet
    val afterPaths = after.files.map(_.path).toSet
    assert(beforePaths.subsetOf(afterPaths),
      "append must leave every standing codes file live (no rewrite)")
    assert((after.files.map(_.rows).sum - before.files.map(_.rows).sum) ===
      batch.count(), "the adds must carry exactly the batch's rows")
    // occupancy comes from the LOG alone and agrees with the data
    val occ = AnnIndex.cellOccupancy(spark, root)
    val real = DeltaLite.read(spark, s"$root/codes").groupBy(col("cell"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(occ === real, "log-metadata occupancy must equal the data's")
    // --- DRIFT: a batch massed on ONE existing vector's neighborhood
    // piles into one cell; the skew trigger fires without reading data
    val anchor = corpus.filter(col("vec_id") === 60)
      .select(col("embedding")).head().getSeq[Float](0)
    val drifted = Seq.tabulate(600)(i =>
      (100000L + i, anchor.map(x => x * (1.0f + 0.0005f * (i % 7)))))
      .toDF("vec_id", "embedding")
    AnnIndex.append(spark, root, drifted, "vec_id", "embedding")
    val skewDrift = AnnIndex.occupancySkew(spark, root)
    assert(AnnIndex.needsRetrain(spark, root, maxSkew = 4.0),
      s"600 vectors massed on one neighborhood must trip the skew " +
        s"trigger, got $skewDrift (was $skew0)")
    // --- REBUILD retrains on the current corpus: the new centroids
    // split the massed region, occupancy rebalances, history keeps the
    // pre-rebuild index readable
    val full = corpus.unionByName(batch).unionByName(drifted)
    AnnIndex.rebuild(spark, root, full, "vec_id", "embedding")
    val skewAfter = AnnIndex.occupancySkew(spark, root)
    assert(skewAfter < skewDrift,
      s"retraining must reduce occupancy skew: $skewDrift → $skewAfter")
    assert(DeltaLite.read(spark, s"$root/codes").count() === full.count())
    // serve still works on the rebuilt index and time travel still
    // reads the pre-rebuild code set
    val served = AnnIndex.query(spark, root,
      e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe")),
      "qid", "qe", probes = 2, topK = 3)
    assert(served.count() > 0)
    val preRebuild = DeltaLite.read(spark, s"$root/codes",
      asOf = Some(after.version + 1))
    assert(preRebuild.count() === full.count())
  }

  test("multi-probe IVF raises cell recall over single-probe") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("embedding"))
    val all = e.select(col("vec_id"), col("embedding")).unionByName(queries)
    val model = Dedup.ivfTrain(all, "embedding", k = 16)
    def cells(probes: Int): Map[Long, Set[Int]] =
      Dedup.ivfProbes(all, "embedding", model, probes)
        .select("vec_id", "centroid").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSet).toMap
    val single = cells(1)
    val multi = cells(2)
    def hits(m: Map[Long, Set[Int]]): Int =
      (0L until 50L).count(i => (m(i) & m(i + 10000)).nonEmpty)
    val h1 = hits(single)
    val h2 = hits(multi)
    assert(h2 >= h1, s"2-probe recall $h2 must not trail 1-probe $h1")
    assert(h2 >= 45, s"2-probe: only $h2/50 perturbed vectors share a cell")
    // probe rank 1 is a valid primary-cell assignment (same cardinality)
    assert(single.values.forall(_.size == 1) && multi.values.forall(_.size == 2))
  }

  test("bitextMineIvf: planted translation pairs survive the IVF bucketing (recall proof)") {
    GraftFunctions.register(spark)
    // Plant translations: 30 "en" docs are corpus vectors, their "de"
    // partners are 2%-perturbed copies (cos ≈ 0.9997 — far above the
    // ~0.35 top-1 cosine of the unclustered gaussian noise), plus 100
    // noise docs on the de side. The exact miner would find every pair
    // by construction; the proof is that the IVF CANDIDATE BUCKETING
    // does not lose them — each pair must co-bucket within the query's
    // 4 probes and emerge mutual-top-1 with its margin.
    val e = Tables.t(spark, sf, "embeddings")
    val en = e.filter(col("vec_id") < 30)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<float>").as("qe"))
      .withColumn("qn", sqrt(call_function("vec_dot", col("qe"), col("qe"))))
    val trans = e.filter(col("vec_id") < 30)
      .select((col("vec_id") + 10000).as("nid"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("ne"))
    val noise = e.filter(col("vec_id") >= 30 && col("vec_id") < 130)
      .select(col("vec_id").as("nid"),
        col("embedding").cast("array<float>").as("ne"))
    val de = trans.unionByName(noise)
      .withColumn("nn", sqrt(call_function("vec_dot", col("ne"), col("ne"))))
    val centers = Dedup.ivfTrain(e, "embedding", k = 8)
    val mined = Dedup.bitextMineIvf(en, de, centers, probes = 4)
      .select("qid", "nid", "margin_ppm").collect()
    val pairOf = mined.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0L until 30L).count(i => pairOf.get(i).contains(i + 10000))
    assert(hits >= 28,
      s"only $hits/30 planted pairs mined through the bucketing: $pairOf")
    // margin sanity: a planted pair's sim dominates its candidate
    // neighborhood, so the ratio margin must clear the uninformative
    // 1_000_000 ppm level (sim == neighborhood mean) decisively
    val margins = mined.filter(r => pairOf.get(r.getLong(0))
      .contains(r.getLong(0) + 10000)).map(_.getLong(2))
    assert(margins.forall(_ > 1100000L),
      s"planted pairs must carry a decisive margin: ${margins.toSeq}")
  }

  test("mpScoreFrameIvf: bucketed MP top-3 agrees with the exact block frame on planted neighborhood structure") {
    GraftFunctions.register(spark)
    // Planted structure: 40 anchor vectors, each with 4 perturbed
    // copies (cos ≈ 0.999 inside a family, ~0.35 across) — the regime
    // real embeddings live in (clustered neighborhoods), where the
    // whole IVF premise holds. Every vector's true MP top-3 is its
    // family; the proof is that the (label, cell) candidate bucketing
    // preserves the exact frame's decisions: families co-bucket, so
    // candidate-list ranks reproduce block ranks at the top. (On
    // structureless gaussian noise NO candidate method can agree with
    // all-pairs — that is a property of the data, not the operator.)
    val base = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 40)
    val anchors = base.select(col("vec_id"),
      col("embedding").cast("array<float>").as("embedding"))
    val copies = (1 to 4).map(j => anchors.select(
      (col("vec_id") + j * 1000L).as("vec_id"),
      expr(s"""transform(embedding, (x, i) ->
           x * CAST(1.0 + 0.005 * (((i + $j) % 3) - 1) AS FLOAT))""")
        .as("embedding")))
    val e = copies.foldLeft(anchors)(_ unionByName _)
      .withColumn("label", (col("vec_id") % 1000L % 5L).cast("int"))
      .withColumn("norm",
        sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
      .localCheckpoint(false)
    def top3(frame: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      frame.filter(col("rkm") <= 3).select(col("qid"), col("nid"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = top3(graft.queries.Llm.mpScoreFrame(e))
    val centers = Dedup.ivfTrain(e, "embedding", k = 8)
    val bucketed = top3(graft.queries.Llm.mpScoreFrameIvf(e, centers,
      probes = 4))
    val qids = exact.keySet
    assert(qids.size === 200, s"every vector must rank (got ${qids.size})")
    val agree = qids.count(q =>
      (exact(q) & bucketed.getOrElse(q, Set.empty)).size >= 2)
    assert(agree >= (qids.size * 9) / 10,
      s"bucketed MP top-3 must share >=2 of 3 with exact on >=90% of " +
        s"queries: $agree/${qids.size}")
    // family-recall floor: the bucketed top-1 is a family member for
    // nearly every query (the decision the MP correction exists for)
    def family(q: Long): Set[Long] = {
      val a = q % 1000L
      (0 to 4).map(j => a + j * 1000L).toSet - q
    }
    val top1Fam = qids.count(q => bucketed.getOrElse(q, Set.empty)
      .exists(family(q).contains))
    assert(top1Fam >= (qids.size * 95) / 100,
      s"bucketed top-3 must hit the family on >=95%: $top1Fam/${qids.size}")
  }

  test("connected components groups near-dup pairs into duplicate clusters") {
    import spark.implicits._
    // two chains and a singleton pair: {1-2-3-4}, {10-11}, {20-21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("ida", "idb")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    // keep-one-per-group = the component representatives
    assert(cc.filter { case (id, comp) => id == comp }.keySet === Set(1L, 10L, 20L))
    // the distributed hash-min + pointer-jump path (forced by a zero
    // driver bound) must agree exactly with the union-find fast path
    val ccDist = Dedup.connectedComponents(pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(ccDist === cc)
    // end-to-end with real candidates: every minhash near-dup pair lands
    // in one component
    val nd = Dedup.minHashNearDups(corpus, "doc_id", "text", threshold = 0.8)
    val comp = Dedup.connectedComponents(nd)
      .as[(Long, Long)].collect().toMap
    val offenders = nd.select("ida", "idb").as[(Long, Long)].collect()
      .filter { case (a, b) => comp(a) != comp(b) }
    assert(offenders.isEmpty, s"pairs split across components: ${offenders.take(5).toSeq}")
  }

  test("exact dedup: md5 grouping is a fixpoint") {
    val d = Tables.t(spark, sf, "documents")
    val once = d.withColumn("h", md5(col("text").cast("binary")))
      .groupBy("h").agg(min(col("doc_id")).as("doc_id"))
    val twice = once.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
    assert(once.count() === twice.count())
  }

  test("SemDeDup removes planted semantic duplicates; decisions verify vs brute force") {
    GraftFunctions.register(spark)
    val e = Tables.t(spark, sf, "embeddings")
    // plant near-identical copies of the first 50 vectors (cos ≈ 0.9998)
    val perturbed = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, (x, i) -> x * CAST(1.0 + 0.02 * ((i % 3) - 1) AS FLOAT))")
          .as("embedding"), col("label"))
    val all = e.select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(perturbed)
      .withColumn("norm",
        sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
    val centers = Dedup.ivfTrain(all, "embedding", 16)
    val asg = Dedup.ivfAssign(all, "embedding", centers)
    val a = asg.select(col("centroid"), col("vec_id").as("ida"),
      col("embedding").as("ea"), col("norm").as("na"))
    val b = asg.select(col("centroid"), col("vec_id").as("idb"),
      col("embedding").as("eb"), col("norm").as("nb"))
    val removed = a.join(b, Seq("centroid")).filter(col("ida") < col("idb"))
      .withColumn("sim",
        call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("sim") > 0.9)
      .groupBy(col("idb").as("removed_id"))
      .agg(min(col("ida")).as("kept_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a planted copy is removed iff it co-clustered with its original
    // (the IVF cell test pins that rate ≥ 40/50); keep-first points back
    val hits = (0L until 50L).count(i => removed.get(i + 10000).contains(i))
    assert(hits >= 40, s"only $hits/50 planted duplicates were removed")
    // every removal is justified by exact cosine (within-cell verify is
    // exact, so semdedup can only UNDER-remove, never over-remove)
    val brute = all.select(col("vec_id").as("ida"), col("embedding").as("ea"),
        col("norm").as("na"))
      .join(all.select(col("vec_id").as("idb"), col("embedding").as("eb"),
        col("norm").as("nb")), col("ida") < col("idb"))
      .withColumn("sim",
        call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("sim") > 0.9)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    removed.foreach { case (rm, kept) =>
      assert(brute.contains((kept, rm)) ||
        brute.exists { case (x, y) => y == rm && x < rm },
        s"removal $rm (kept $kept) has no brute-force justification")
    }
    // the declared query is deterministic run-to-run (seeded k-means)
    val q1 = SparkEntry.queries("l2_semdedup")(spark, sf).collect().toSeq
    val q2 = SparkEntry.queries("l2_semdedup")(spark, sf).collect().toSeq
    assert(q1 === q2)
  }

  test("ivfTrain/pqTrain tolerate non-float embedding columns (array<double>)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 64).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextDouble())))
      .toDF("id", "embedding")
    assert(df.schema("embedding").dataType.simpleString === "array<double>")
    val centers = graft.functions.Dedup.ivfTrain(df, "embedding", k = 4)
    assert(centers.length === 4 && centers.forall(_.length === 8))
    val cb = graft.functions.Dedup.pqTrain(df, "embedding", m = 2, k = 4, dim = 8)
    assert(cb.length === 2)
  }

  test("DedupIndex: persisted band index — probe verdicts, O(batch) append, freshness") {
    import spark.implicits._
    import graft.operators.DedupIndex
    val D = graft.sources.DeltaLite
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val common = (1 to 40).map(i => s"w$i")
    // corpus: three distinct docs; batch: 101 ≈ near-dup of 2 (same
    // word stream with a one-word tail change), 102 unrelated
    val corpus = Seq(
      doc(1L, (1 to 40).map(i => s"a$i")),
      doc(2L, common),
      doc(3L, (1 to 40).map(i => s"c$i"))).toDF("doc_id", "text")
    val batch = Seq(
      doc(101L, common.dropRight(1) :+ "zzz"),
      doc(102L, (1 to 40).map(i => s"q$i"))).toDF("doc_id", "text")
    val idx = graft.TempDirs.fresh("dedup_idx")
    DedupIndex.build(spark, corpus, "doc_id", "text", idx)
    val rowsPerDoc = D.read(spark, idx)
      .groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowsPerDoc.keySet === Set(1L, 2L, 3L))
    assert(rowsPerDoc.values.forall(_ === 8L), "8 bands per doc")
    // probe: 101 resolves to 2, 102 is new
    val v1 = DedupIndex.probe(spark, batch, corpus, "doc_id", "text",
        idx, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v1 === Map(101L -> 2L, 102L -> -1L))
    // append is O(batch): exactly the batch's band rows land
    val before = D.read(spark, idx).count()
    DedupIndex.append(spark, batch, "doc_id", "text", idx)
    assert(D.read(spark, idx).count() === before + 2 * 8)
    // freshness: a doc duplicating batch member 102 now resolves to it
    val batch2 = Seq(doc(201L, (1 to 40).map(i => s"q$i")))
      .toDF("doc_id", "text")
    val corpusNow = corpus.unionByName(batch)
    val v2 = DedupIndex.probe(spark, batch2, corpusNow, "doc_id", "text",
        idx, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v2 === Map(201L -> 102L))
    // the index table is a real DeltaLite table: the build commit and
    // the append commit are both in history (time-travelable)
    assert(D.latestVersion(idx).get === 1L)
  }

  test("Frames.cut replicated mode: probe verdicts identical under persist-with-replication (the cluster-liveness switch)") {
    import spark.implicits._
    import graft.operators.DedupIndex
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val common = (1 to 40).map(i => s"m$i")
    val corpus = Seq(doc(1L, (1 to 40).map(i => s"a$i")),
      doc(2L, common)).toDF("doc_id", "text")
    val batch = Seq(doc(101L, common.dropRight(1) :+ "zzz"),
      doc(102L, (1 to 40).map(i => s"q$i")),
      doc(103L, (1 to 40).map(i => s"q$i"))).toDF("doc_id", "text")
    val idx = graft.TempDirs.fresh("dedup_idx_repl")
    DedupIndex.build(spark, corpus, "doc_id", "text", idx)
    val local = DedupIndex.probe(spark, batch, corpus, "doc_id", "text",
        idx, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // the mode flip rides a SEPARATE session: the conf is session-
    // scoped and suites run in parallel — flipping the shared
    // session's conf would switch every concurrent suite's cuts
    // mid-test (review finding)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.cut.mode", "replicated")
    val repl = DedupIndex.probe(s2,
        s2.createDataFrame(batch.collectAsList(), batch.schema),
        s2.createDataFrame(corpus.collectAsList(), corpus.schema),
        "doc_id", "text", idx, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(repl === local, "the cut mode must not change any verdict")
    assert(repl === Map(101L -> 2L, 102L -> -1L, 103L -> 102L))
  }

  test("Frames.scoped releases replicated cuts at scope exit; local mode and other threads are untouched") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.cut.mode", "replicated")
    val df = s2.createDataFrame(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s").collectAsList(),
      Seq((1L, "a")).toDF("k", "s").schema)
    var inner: org.apache.spark.sql.DataFrame = null
    graft.Frames.scoped {
      inner = graft.Frames.cut(df, eager = true)
      assert(inner.storageLevel != StorageLevel.NONE,
        "inside the scope the replicated cut is persisted")
      assert(inner.count() === 2L)
    }
    assert(inner.storageLevel == StorageLevel.NONE,
      "scope exit must unpersist the replicated cut (the always-on " +
        "gate leaks one CacheManager entry per cut per batch otherwise)")
    // local mode: scoped is a no-op wrapper (nothing tracked, nothing
    // to release — localCheckpoint blocks free via the ContextCleaner)
    var local: org.apache.spark.sql.DataFrame = null
    graft.Frames.scoped {
      local = graft.Frames.cut(
        Seq((1L, "a")).toDF("k", "s"), eager = true)
    }
    assert(local.count() === 1L,
      "a local-mode cut stays readable after scope exit")
    // thread isolation: a cut made on ANOTHER thread inside the scope
    // is NOT tracked (the crawl gate's worker threads only run
    // actions, but the contract must hold if one ever constructs) —
    // a tracked-set that went global would unpersist frames out from
    // under concurrent workers
    var other: org.apache.spark.sql.DataFrame = null
    graft.Frames.scoped {
      val th = new Thread(() => {
        other = graft.Frames.cut(
          s2.createDataFrame(
            Seq((5L, "w")).toDF("k", "s").collectAsList(),
            Seq((5L, "w")).toDF("k", "s").schema), eager = true)
      })
      th.start(); th.join()
    }
    assert(other.storageLevel != StorageLevel.NONE &&
      other.count() === 1L,
      "a cut from another thread survives this thread's scope exit")
    other.unpersist()
    // a cut made OUTSIDE any scope is never tracked or released
    val unscoped = graft.Frames.cut(
      s2.createDataFrame(Seq((9L, "z")).toDF("k", "s").collectAsList(),
        Seq((9L, "z")).toDF("k", "s").schema), eager = true)
    assert(unscoped.storageLevel != StorageLevel.NONE &&
      unscoped.count() === 1L,
      "unscoped replicated cuts are the caller's to manage")
    unscoped.unpersist()
  }

  test("DedupIndex.probe flags BATCH-INTERNAL near-dups keep-min-id") {
    import spark.implicits._
    import graft.operators.DedupIndex
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val corpus = Seq(doc(1L, (1 to 40).map(i => s"a$i")))
      .toDF("doc_id", "text")
    val idx = graft.TempDirs.fresh("dedup_idx_self")
    DedupIndex.build(spark, corpus, "doc_id", "text", idx)
    val common = (1 to 40).map(i => s"s$i")
    // 55 and 66 duplicate EACH OTHER but nothing in the corpus: the
    // smaller id survives as new, the larger resolves to it (keep-min);
    // 77 is genuinely fresh
    val batch = Seq(doc(55L, common),
      doc(66L, common.dropRight(1) :+ "zzz"),
      doc(77L, (1 to 40).map(i => s"t$i"))).toDF("doc_id", "text")
    val v = DedupIndex.probe(spark, batch, corpus, "doc_id", "text",
        idx, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v === Map(55L -> -1L, 66L -> 55L, 77L -> -1L))
    // an in-batch dup whose partner ALSO matches the corpus resolves to
    // the overall minimum id (corpus doc 1 < batch partner)
    val batch2 = Seq(doc(91L, (1 to 40).map(i => s"a$i")),
      doc(92L, ((1 to 39).map(i => s"a$i")) :+ "zzz"))
      .toDF("doc_id", "text")
    val v2 = DedupIndex.probe(spark, batch2, corpus, "doc_id", "text",
        idx, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v2 === Map(91L -> 1L, 92L -> 1L),
      "corpus id 1 is the minimum partner for both batch docs")
  }

  test("DedupIndex.probe: a RE-CRAWLED id verifies against its batch text, not a corpus/batch shingle union") {
    import spark.implicits._
    import graft.operators.DedupIndex
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    // corpus: doc 1 with text A (long, disjoint from everything below)
    val corpus = Seq(doc(1L, (1 to 40).map(i => s"old$i")))
      .toDF("doc_id", "text")
    val idx = graft.TempDirs.fresh("dedup_idx_recrawl")
    DedupIndex.build(spark, corpus, "doc_id", "text", idx)
    // batch RE-CRAWLS doc 1 with entirely new text B, and doc 2 carries
    // a near-copy of B. Partner text for eid=1 must be the BATCH text:
    // unioning shingles(A) ∪ shingles(B) would halve the Jaccard
    // (|B∩(A∪B)| / |A∪B| ≈ 0.5) and miss the duplicate at 0.7
    val fresh = (1 to 40).map(i => s"new$i")
    val batch = Seq(doc(1L, fresh),
      doc(2L, fresh.dropRight(1) :+ "zzz")).toDF("doc_id", "text")
    val v = DedupIndex.probe(spark, batch, corpus, "doc_id", "text",
        idx, threshold = 0.7)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v === Map(1L -> -1L, 2L -> 1L),
      "doc 2 must resolve to the re-crawled doc 1 via its BATCH text")
  }
}

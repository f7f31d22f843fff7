package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{Dedup, GraftFunctions, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators (SURVEY.md §2.9 L1-L6 + builder
  * prompt): exact & near-duplicate detection, vector similarity search,
  * text analysis. Oracle-checked wherever the computation is
  * ANSI-SQL-expressible; hash-based sketches (MinHash/SimHash/LSH buckets
  * use Spark's xxhash64, which DuckDB lacks) are declared without an
  * oracle and verified by the scalatest suites instead (candidate-set
  * recall vs brute force on sf0.001).
  *
  * The fixture word-soup has no natural near-duplicates (500/500 distinct
  * texts, pairwise Jaccard ≈ 0.001 — verified empirically), so the
  * near-dup queries inject deterministic mutated copies (doc_id+1000000,
  * last token dropped) to demonstrate detection; the injection is part of
  * the declared query, fully reproducible.
  */
object Llm {

  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** documents ∪ mutated copies of the first 20 (near-dup planted pairs). */
  private def corpusWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val mutated = d.filter(col("doc_id") < 20)
      .select((col("doc_id") + 1000000).as("doc_id"),
        array_join(expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"), " ")
          .as("text"))
    d.unionByName(mutated)
  }

  /** embeddings with vec_dot registered + precomputed L2 norm. */
  private def emb(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, dir, "embeddings")
      .withColumn("norm", sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
  }

  /** Shared label-block MUTUAL-PROXIMITY frame for the hubness-
    * correction family (`l3_mutual_proximity`, `l3_rbo_agreement`) —
    * ONE definition so both queries provably score the SAME pairs (the
    * Graph.coPurchasePairs discipline). Pairs inside label blocks
    * (equality join, never corpus²), sims on the 1e6 integer lattice
    * computed ONCE (lineage-cut) feeding both rank directions, block
    * size joined back, mp = (bn − rkf)·(bn − rkb), and rkm = the MP
    * re-ranking per query (mp desc, nid asc). Columns:
    * (label, qid, nid, ssim, rkf, rkb, bn, mp, rkm).
    *
    * Scale scope: this is the EXACT frame — pairs grow quadratically
    * in per-label block size, so it stays the small-block ORACLE
    * ANCHOR (the l6_bitext_mining role). The corpus-scale twin is
    * [[mpScoreFrameIvf]]. Package-visible so DedupSpec can run both
    * definitions over one planted fixture for the agreement proof. */
  private[graft] def mpScoreFrame(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = e.select(col("vec_id").as("qid"), col("label"),
      col("embedding").as("qe"), col("norm").as("qn"))
    val b = e.select(col("vec_id").as("nid"), col("label"),
      col("embedding").as("ne"), col("norm").as("nn"))
    val pairs = a.join(b, Seq("label"))
      .filter(col("qid") =!= col("nid"))
      .select(col("label"), col("qid"), col("nid"),
        expr("""CAST(round((vec_dot(qe, ne) / (qn * nn) + 1.0D)
                * 1000000) AS BIGINT)""").as("ssim"))
      .localCheckpoint(false)
    val rk = pairs
      .withColumn("rkf", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("ssim").desc, col("nid").asc)))
      .withColumn("rkb", row_number().over(Window.partitionBy(col("nid"))
        .orderBy(col("ssim").desc, col("qid").asc)))
    val bsize = e.groupBy(col("label")).agg(count(lit(1)).as("bn"))
    rk.join(bsize, Seq("label"))
      .withColumn("mp", (col("bn") - col("rkf")) * (col("bn") - col("rkb")))
      .withColumn("rkm", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("mp").desc, col("nid").asc)))
  }

  private def mpScored(s: SparkSession, dir: String): DataFrame =
    mpScoreFrame(emb(s, dir).select(col("vec_id"), col("label"),
      col("embedding"), col("norm")))

  /** The 100 TB twin of [[mpScoreFrame]] — same MP machinery, the
    * within-label ALL-PAIRS frame replaced by IVF CANDIDATE LISTS
    * (the l6_bitext_ivf pattern): queries multi-probe their `probes`
    * nearest coarse cells map-side ([[Dedup.ivfProbes]]), neighbors
    * sit in their primary cell ([[Dedup.ivfAssign]]), and candidate
    * pairs come from the (label, cell) EQUALITY join — per-label cost
    * O(B·probes·B/k) instead of B², with the cell count k trained to
    * scale with the corpus, so block growth no longer squares the
    * frame. Each (qid, nid) pair appears at most once (probe cells
    * are distinct; one primary cell per neighbor). Complement ranks
    * use a FIXED truncation depth `kDepth` as the common base —
    * mp = max(K+1−rkf, 1)·max(K+1−rkb, 1), the kNN-list form of MP —
    * where the exact frame uses the block size: the base must be
    * CONSTANT across neighbors or the product compares list sizes
    * instead of ranks (a hub with a long candidate list would beat a
    * true neighbor with a short one — measured as exactly that
    * failure before the fix; ranks past K floor at 1, the exact
    * frame's own minimum). DedupSpec pins top-3 agreement with the
    * exact frame on planted neighborhood structure. Columns:
    * (label, qid, nid, ssim, rkf, rkb, mp, rkm). */
  private[graft] def mpScoreFrameIvf(e: DataFrame,
      centers: Array[Array[Float]], probes: Int,
      kDepth: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the candidate frame is lineage-cut (it feeds both rank
    // directions), which HIDES its join shape from the final plan —
    // PlanSpec therefore pins the UNCUT [[mpCandidatePairsIvf]]
    // directly (the stronger form of the l6_bitext no-cartesian pin)
    val pairs = graft.Frames.cut(mpCandidatePairsIvf(e, centers, probes))
    val kk = lit(kDepth.toLong + 1L)
    pairs
      .withColumn("rkf", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("ssim").desc, col("nid").asc)))
      .withColumn("rkb", row_number().over(Window.partitionBy(col("nid"))
        .orderBy(col("ssim").desc, col("qid").asc)))
      .withColumn("mp",
        greatest(kk - col("rkf"), lit(1L)) *
        greatest(kk - col("rkb"), lit(1L)))
      .withColumn("rkm", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("mp").desc, col("nid").asc)))
  }

  /** The IVF candidate frame [[mpScoreFrameIvf]] ranks over, UNCUT —
    * (label, qid, nid, ssim): query probes expand map-side, neighbors
    * sit in their primary cell, pairs come from the (label, cell)
    * equality join. Package-visible so PlanSpec can pin the join
    * shape that the lineage cut hides from the declared queries'
    * final plans. */
  private[graft] def mpCandidatePairsIvf(e: DataFrame,
      centers: Array[Array[Float]], probes: Int): DataFrame = {
    val q = Dedup.ivfProbes(e.select(col("vec_id").as("qid"), col("label"),
        col("embedding").as("qe"), col("norm").as("qn")),
        "qe", centers, probes)
      .drop("probe_rk")
    val n = Dedup.ivfAssign(e.select(col("vec_id").as("nid"),
        col("label").as("__nl"), col("embedding").as("ne"),
        col("norm").as("nn")), "ne", centers)
      .withColumnRenamed("centroid", "cc")
    q.join(n, col("label") === col("__nl") &&
        col("centroid") === col("cc") && col("qid") =!= col("nid"))
      .select(col("label"), col("qid"), col("nid"),
        expr("""CAST(round((vec_dot(qe, ne) / (qn * nn) + 1.0D)
                * 1000000) AS BIGINT)""").as("ssim"))
  }

  /** Declared-query instantiation of [[mpScoreFrameIvf]]: seeded
    * driver-side k-means (one sample collect, plan-literal centroid
    * table), 4 probes. The cell count SCALES WITH THE CORPUS
    * (k ≈ n/125, clamped to [16, 256]) — this is the whole scale
    * argument: with k fixed, 4× vectors is still 16× candidate pairs
    * (quadratic at a smaller constant); with per-cell occupancy held
    * ~constant, candidates grow ~linearly (ScaleCurveSpec measures
    * the slope). The count is one driver-side aggregate; training
    * stays sample-bounded regardless of k. */
  /** Per-fixture-dir memo for the MP twin's coarse quantizer: three
    * declared queries (l3_mp_ivf / l3_hubness_ivf / l3_rbo_ivf) share
    * the identical embeddings frame, so the count job (sizes k) and
    * the seeded k-means sample+train run ONCE per dir instead of once
    * per query (and per plan-only inspection). Fixture dirs are
    * immutable and the training is seeded, so the cache can never
    * serve stale or divergent centers. */
  /** Shared shingle-candidate core of l2_ngram_jaccard and
    * l2_containment — ONE definition of the candidate window, the
    * shingle sets, the equality-join pair generation, and the size
    * rollup, in both engines (review finding: two drifting copies ×
    * two engines = four places one fixture-window edit must hit).
    * `directed` = emit both orientations (containment) vs one
    * unordered pair (Jaccard). Returns (pairs(ida, idb, inter),
    * sizes(doc_id, sz)). */
  private def shingleCandidates(s: SparkSession, dir: String,
      directed: Boolean): (DataFrame, DataFrame) = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 40)
    val sets = TextFunctions.shingleSets(docs, "doc_id", "text")
    val a = sets.select(col("doc_id").as("ida"), col("shingle"))
    val b = sets.select(col("doc_id").as("idb"), col("shingle").as("shb"))
    val cond = if (directed) col("ida") =!= col("idb")
      else col("ida") < col("idb")
    val pairs = a.join(b, col("shingle") === col("shb") && cond)
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("inter"))
    val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    (pairs, sizes)
  }

  /** The DuckDB twin of [[shingleCandidates]]: docs/sets/sizes/pairs
    * CTEs with the pair condition injected — callers append their
    * SELECT. */
  private def shingleCandidatesSql(pairCond: String): String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
         sets AS (
           SELECT DISTINCT doc_id, shingle FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                           i -> string_split(text,' ')[i] || ' ' ||
                                string_split(text,' ')[i+1] || ' ' ||
                                string_split(text,' ')[i+2])
                    ELSE [] END) AS shingle
             FROM docs)),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
           FROM sets a JOIN sets b
             ON a.shingle = b.shingle AND $pairCond
           GROUP BY 1, 2)"""

  /** The drift query's UNCUT vocabulary rollup — package-visible so
    * PlanSpec pins ITS shape (the declared query lineage-cuts it,
    * which hides the rollup from the final plan — the mpScoreFrameIvf
    * pin discipline). */
  private[graft] def driftPerTok(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select((pmod(col("doc_id"), lit(2)) === 0).as("slice_a"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(
        sum(when(col("slice_a"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("slice_a"), 1L).otherwise(0L)).as("b"))

  private val mpCenters = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Float]]]()

  /** The scored frame itself is ALSO memoized per (session, dir):
    * [[mpScoreFrameIvf]] lineage-cuts its candidate frame, and under
    * replicated cut mode each cut registers a session CacheManager
    * entry that nothing ever unpersists — three twin queries × N runs
    * would grow the cache unboundedly (review finding). One shared
    * entry per fixture dir bounds that to O(dirs) AND serves all
    * three twins (and repeat runs) from a single persisted candidate
    * frame instead of three. Fixture dirs are immutable and the
    * quantizer is memoized/seeded, so a cached frame can never be
    * stale; the session in the key stops a dead session's frame from
    * being served to a live one. Direct mpScoreFrameIvf callers
    * (tests) own their frame's lifetime — declared queries go
    * through this memo. */
  private final case class MpScored(owner: SparkSession, df: DataFrame)
  private val mpScoredCache = new java.util.concurrent.ConcurrentHashMap[
    String, MpScored]()

  private def mpScoredIvf(s: SparkSession, dir: String): DataFrame = {
    // sweep entries owned by STOPPED sessions first — a cached frame
    // strongly references its session, so without eviction a
    // create/stop session cycle grows the map (and pins dead session
    // graphs) forever; the sweep bounds it to live sessions × dirs
    // (review finding)
    mpScoredCache.forEach((k, v) =>
      if (v.owner.sparkContext.isStopped) { mpScoredCache.remove(k, v); () })
    val key = s"${System.identityHashCode(s)}|$dir"
    val hit = mpScoredCache.get(key)
    // identity hashes are not unique: serve a hit only when the owner
    // IS this session, else rebuild and replace (review finding — a
    // collision must never hand session B a frame bound to session A)
    if (hit != null && (hit.owner eq s)) hit.df
    else {
      val e = emb(s, dir).select(col("vec_id"), col("label"),
        col("embedding"), col("norm"))
      val centers = mpCenters.computeIfAbsent(dir, { _ =>
        val k = math.max(16L, math.min(256L, e.count() / 125L)).toInt
        Dedup.ivfTrain(e, "embedding", k = k)
      })
      val df = mpScoreFrameIvf(e, centers, probes = 4)
      mpScoredCache.put(key, MpScored(s, df))
      df
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------- L1
    // Exact dedup by content hash (md5 — engine-portable). count(DISTINCT)
    // is the safety census; the dedup itself is the groupBy-keep-min shape
    // used by the medallion silver layer.
    QueryDef("l1_exact_dedup", (s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keeper"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("copies")).as("n_docs"),
          (sum(col("copies")) - count(lit(1))).as("n_dup_rows"))
    }, Some(
      """SELECT count(*) AS n_unique,
                CAST(sum(copies) AS BIGINT) AS n_docs,
                CAST(sum(copies) - count(*) AS BIGINT) AS n_dup_rows
         FROM (SELECT md5(text) AS h, count(*) AS copies, min(doc_id) AS keeper
               FROM documents GROUP BY md5(text))""")),

    // ------------------------------------------------------------- L2 (a)
    // Exact n-gram (3-shingle) Jaccard over a bounded candidate window —
    // the ground-truth near-dup measure. Oracle-checked. At scale the
    // candidate set comes from LSH (below), never from an n² window.
    QueryDef("l2_ngram_jaccard", (s, dir) => {
      val (pairs, sizes) = shingleCandidates(s, dir, directed = false)
      pairs
        .join(sizes.select(col("doc_id").as("ida"), col("sz").as("sza")), "ida")
        .join(sizes.select(col("doc_id").as("idb"), col("sz").as("szb")), "idb")
        .select(col("ida"), col("idb"), col("inter"),
          expr("round((CAST(inter AS DOUBLE) / (sza + szb - inter))*10000)/10000")
            .as("jaccard"))
        .orderBy(col("ida").asc_nulls_last, col("idb").asc_nulls_last)
    }, Some(shingleCandidatesSql("a.doc_id < b.doc_id") +
      """
         SELECT ida, idb, inter,
                (round((CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter))*10000)/10000)
                  AS jaccard
         FROM pairs
         JOIN sizes sa ON sa.doc_id = ida
         JOIN sizes sb ON sb.doc_id = idb
         ORDER BY ida ASC NULLS LAST, idb ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (c2)
    // DIRECTED CONTAINMENT — the asymmetric near-dup Jaccard misses:
    // containment(A→B) = |A∩B| / |A| flags a document whose shingles
    // are (mostly) a SUBSET of another's — quotes, boilerplate
    // inclusion, truncated re-crawls — where symmetric Jaccard stays
    // low because B is much larger. Both directions emitted per
    // sharing pair; the high flag is an INTEGER cross-multiply
    // (4·inter ≥ 3·|A| ⟺ containment ≥ 0.75 — no division decides
    // anything), and the display ratio is the one final float both
    // engines compute from the same exact integers. Scale: candidates
    // come from the shingle-equality join (bucketed by shingle value,
    // never all-pairs); at corpus scale the LSH gate upstream bounds
    // the pair fan-out exactly as in the Jaccard family.
    // (Named _directed: the symmetric-threshold l2_containment below
    // at L2 (k) predates this variant; the r16 cut shipped both under
    // ONE name and Seq.toMap silently dropped this one — SparkEntry
    // now `require`s distinct names so a collision can never ship.)
    QueryDef("l2_containment_directed", (s, dir) => {
      val (pairs, sizes) = shingleCandidates(s, dir, directed = true)
      pairs
        .join(sizes.select(col("doc_id").as("ida"), col("sz").as("sza")), "ida")
        .select(col("ida"), col("idb"), col("inter"), col("sza"),
          (col("inter") * 4 >= col("sza") * 3).as("high"),
          expr("round((CAST(inter AS DOUBLE) / sza)*10000)/10000")
            .as("containment"))
        .orderBy(col("ida").asc_nulls_last, col("idb").asc_nulls_last)
    }, Some(shingleCandidatesSql("a.doc_id <> b.doc_id") +
      """
         SELECT ida, idb, inter, sa.sz AS sza,
                (inter * 4 >= sa.sz * 3) AS high,
                (round((CAST(inter AS DOUBLE) / sa.sz)*10000)/10000)
                  AS containment
         FROM pairs JOIN sizes sa ON sa.doc_id = ida
         ORDER BY ida ASC NULLS LAST, idb ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (f)
    // DISTRIBUTION DRIFT between two corpus slices — the
    // training-data health check ("did this week's crawl change the
    // token distribution?") as two metrics chosen for HASH-EXACTNESS,
    // not fashion: KL/JS need log(), a LIBRARY function with no
    // cross-engine rounding guarantee — one ulp at a lattice boundary
    // breaks the oracle. Instead:
    //   * TOTAL VARIATION distance: TV = ½·Σ|pₜ − qₜ| — cross-multiply
    //     to |aₜ·n₂ − bₜ·n₁| and the whole statistic is the exact
    //     BIGINT rational (tv_num, 2·n₁·n₂);
    //   * BHATTACHARYYA / HELLINGER affinity: BC = Σ√(pₜqₜ) — per
    //     token √(aₜ·bₜ) is ONE sqrt over an exact integer, and IEEE
    //     754 REQUIRES sqrt to be correctly rounded, so both engines
    //     produce bit-identical doubles; each term rounds once onto
    //     the 1e6 lattice and sums in BIGINT (aggregation-order-proof;
    //     Hellinger² = 1 − BC/√(n₁n₂) derives outside the gate).
    // Counts stay far inside BIGINT: products ≤ (corpus tokens)² ≤
    // ~1e14 at sf0.1. One token rollup per slice, one full-outer
    // vocabulary join — two keyed shuffles total.
    QueryDef("l4_dist_drift", (s, dir) => {
      // feeds the totals AND the per-token terms — cut, or the token
      // rollup runs twice (PlanSpec pins the UNCUT driftPerTok)
      val perTok = driftPerTok(s, dir).localCheckpoint(false)
      val tot = perTok.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
      // Cross-products widen to DECIMAL(38,0)/HUGEINT (the a34/x25/s64
      // discipline): aₜ·n₂ wraps SILENTLY in Spark's non-ANSI BIGINT
      // multiply once slice token counts pass ~2e9 (tv_den = 2·n₁·n₂
      // first). Display casts back to BIGINT — exact at fixture SFs,
      // and the output schema stays decimal-free (driver-hasher rule).
      perTok.crossJoin(broadcast(tot))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          sum(abs(expr("CAST(a AS DECIMAL(38,0)) * n2") -
                  expr("CAST(b AS DECIMAL(38,0)) * n1")))
            .as("tv_num_w"),
          sum(expr(
            "CAST(round(sqrt(CAST(CAST(a AS DECIMAL(38,0)) * b AS DOUBLE))" +
              " * 1000000) AS BIGINT)"))
            .as("bc_sum_micro"))
        .select(col("n1"), col("n2"),
          expr("CAST(tv_num_w AS BIGINT)").as("tv_num"),
          expr("CAST(CAST(n1 AS DECIMAL(38,0)) * n2 * 2 AS BIGINT)")
            .as("tv_den"),
          col("bc_sum_micro"))
    }, Some(
      """WITH toks AS (
           SELECT doc_id % 2 = 0 AS slice_a, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         per_tok AS MATERIALIZED (
           SELECT tok,
                  CAST(sum(CASE WHEN slice_a THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(sum(CASE WHEN NOT slice_a THEN 1 ELSE 0 END) AS BIGINT) AS b
           FROM toks GROUP BY 1),
         tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
                        CAST(sum(b) AS BIGINT) AS n2 FROM per_tok)
         SELECT max(tot.n1) AS n1, max(tot.n2) AS n2,
                CAST(sum(abs(CAST(a AS HUGEINT) * tot.n2
                             - CAST(b AS HUGEINT) * tot.n1)) AS BIGINT)
                  AS tv_num,
                CAST(CAST(max(tot.n1) AS HUGEINT) * max(tot.n2) * 2
                  AS BIGINT) AS tv_den,
                CAST(sum(CAST(round(sqrt(CAST(CAST(a AS HUGEINT) * b
                  AS DOUBLE)) * 1000000)
                  AS BIGINT)) AS BIGINT) AS bc_sum_micro
         FROM per_tok, tot""")),

    // ------------------------------------------------------------- L2 (j)
    // INCREMENTAL dedup — the production shape: a new batch dedups
    // against the EXISTING corpus (and itself), never corpus×corpus.
    // Verdicts per incoming doc, first match wins: exact-dup (md5
    // equality against existing hashes — at 100 TB that map is a
    // pre-built hash table, here derived in-query), near-dup (shared
    // 3-gram shingle candidates + Jaccard ≥ 0.5 verify, candidates from
    // an EQUALITY join so the incoming batch touches only colliding
    // existing docs), else new. The asymmetric join is the point: cost
    // scales with |batch| × collision fan-out, not |corpus|² — rerunning
    // yesterday's dedup never reopens the deduped corpus.
    // ------------------------------------------------------------- L2 (i2)
    // PERSISTED dedup index (operators/DedupIndex): the production
    // lifecycle l2_incremental_dedup's per-run recompute becomes at
    // crawl scale — build the band index ONCE from the standing corpus
    // (DeltaLite table partitioned by band), probe the new batch with
    // one band-equality join + candidate-only exact-Jaccard verify,
    // append the batch's bands O(batch), and prove freshness by
    // probing a doc that duplicates a batch member AFTER the append.
    // Census of the full cycle in one row. Rows-only (minhash_agg is
    // engine-specific); DedupSpec pins verdicts, O(batch) maintenance,
    // and index freshness.
    QueryDef("l2_dedup_index", (s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 120)
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") < 80)
      val batch = docs.filter(col("doc_id") >= 80)
      val idx = graft.TempDirs.fresh("l2_dedup_index")
      graft.operators.DedupIndex.build(s, corpus, "doc_id", "text", idx)
      // one banding pass serves the probe AND the append (the gateBatch
      // shared-work shape)
      val banded = graft.functions.Dedup
        .bandedSignatures(batch, "doc_id", "text", 32, 8)
        .localCheckpoint(false)
      val verdicts = graft.operators.DedupIndex.probe(
        s, batch, corpus, "doc_id", "text", idx, threshold = 0.5,
        preBands = Some(banded))
      graft.operators.DedupIndex.appendBands(s, banded, idx)
      val idxRows = graft.sources.DeltaLite.read(s, idx)
      verdicts.agg(
          count(lit(1)).as("n_probed"),
          sum(when(col("near_dup_of").isNotNull, 1L).otherwise(0L))
            .as("n_near_dups"))
        .crossJoin(broadcast(idxRows.agg(
          countDistinct(col("doc_id")).as("n_indexed_docs"),
          count(lit(1)).as("n_index_rows"))))
    }, None),

    // ------------------------------------------------------------- L2 (i3)
    // CRAWL GATE over the persisted index (streaming/Streams.gateBatch —
    // the exact foreachBatch body the dedupGate stream runs): two
    // deterministic micro-batches arrive in order, the second judged
    // against everything the first ingested — it carries near-dup
    // mutations of batch-0 docs (last word dropped) AND exact copies of
    // batch-0 docs under new ids — and each batch's verdicts/index/
    // corpus appends ride the replay-idempotent txn guard. Census: per
    // batch, flagged vs admitted. Nothing ever rescans the corpus:
    // probe = band-equality join over the partitioned index, append =
    // O(batch). Rows-only (minhash_agg is engine-specific);
    // StreamingSpec pins the streaming twin over THREE batches (replay
    // no-ops, string ids, transitivity); two batches here keep the
    // declared query a short lifecycle chain under the bench's
    // concurrency (three measured 20 s solo — all commit latency).
    QueryDef("l2_crawl_gate", (s, dir) => {
      val base = graft.TempDirs.fresh("l2_crawl_gate")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val near = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(expr(
            "slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"), " ")
            .as("text"))
      val exact = docs.filter(col("doc_id") >= 40 && col("doc_id") < 60)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val batches = Seq(
        docs.filter(col("doc_id") < 80),
        docs.filter(col("doc_id") >= 80 && col("doc_id") < 160)
          .unionByName(near).unionByName(exact))
      batches.zipWithIndex.foreach { case (b, i) =>
        graft.streaming.Streams.gateBatch(b, i.toLong, "doc_id", "text",
          s"$base/corpus", s"$base/index", s"$base/verdicts",
          threshold = 0.5)
      }
      graft.sources.DeltaLite.read(s, s"$base/verdicts")
        .groupBy(col("batch_id"))
        .agg(count(lit(1)).as("n_judged"),
          sum(when(col("near_dup_of").isNotNull, 1L).otherwise(0L))
            .as("n_flagged"),
          sum(when(col("near_dup_of").isNull, 1L).otherwise(0L))
            .as("n_admitted"))
        .orderBy(col("batch_id").asc_nulls_last)
    }, None),

    QueryDef("l2_incremental_dedup", (s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 120)
      val existing = docs.filter(col("doc_id") < 80)
      val incoming = docs.filter(col("doc_id") >= 80)
      val exHash = existing.select(md5(col("text").cast("binary")).as("eh"),
        col("doc_id").as("eid"))
      val inHash = incoming.select(col("doc_id"), col("lang"),
        md5(col("text").cast("binary")).as("ih"))
      val exact = inHash.join(exHash, col("ih") === col("eh"), "left")
        .groupBy(col("doc_id"), col("lang"))
        .agg(min(col("eid")).as("exact_dup_of"))
      val exSets = TextFunctions.shingleSets(existing, "doc_id", "text")
        .select(col("doc_id").as("eid"), col("shingle"))
      val inSets = TextFunctions.shingleSets(incoming, "doc_id", "text")
      val inter = inSets.join(exSets, Seq("shingle"))
        .groupBy(col("doc_id"), col("eid")).agg(count(lit(1)).as("inter"))
      val szE = exSets.groupBy(col("eid")).agg(count(lit(1)).as("sze"))
      val szI = inSets.groupBy(col("doc_id")).agg(count(lit(1)).as("szi"))
      val near = inter.join(szE, "eid").join(szI, "doc_id")
        .filter(expr("CAST(inter AS DOUBLE) / (szi + sze - inter) >= 0.5"))
        .groupBy(col("doc_id")).agg(min(col("eid")).as("near_dup_of"))
      exact.join(near, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          when(col("exact_dup_of").isNotNull, "exact_dup")
            .when(col("near_dup_of").isNotNull, "near_dup")
            .otherwise("new").as("verdict"),
          coalesce(col("exact_dup_of"), col("near_dup_of")).as("dup_of"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH docs AS (SELECT doc_id, lang, text FROM documents
                       WHERE doc_id < 120),
         ex AS (SELECT * FROM docs WHERE doc_id < 80),
         inc AS (SELECT * FROM docs WHERE doc_id >= 80),
         exact AS (
           SELECT i.doc_id, i.lang, min(e.doc_id) AS exact_dup_of
           FROM inc i LEFT JOIN ex e ON md5(i.text) = md5(e.text)
           GROUP BY 1, 2),
         exsets AS (
           SELECT DISTINCT doc_id AS eid, shingle FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                           i -> string_split(text,' ')[i] || ' ' ||
                                string_split(text,' ')[i+1] || ' ' ||
                                string_split(text,' ')[i+2])
                    ELSE [] END) AS shingle
             FROM ex)),
         insets AS (
           SELECT DISTINCT doc_id, shingle FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                           i -> string_split(text,' ')[i] || ' ' ||
                                string_split(text,' ')[i+1] || ' ' ||
                                string_split(text,' ')[i+2])
                    ELSE [] END) AS shingle
             FROM inc)),
         sze AS (SELECT eid, count(*) AS sze FROM exsets GROUP BY 1),
         szi AS (SELECT doc_id, count(*) AS szi FROM insets GROUP BY 1),
         itab AS (
           SELECT i.doc_id, e.eid, count(*) AS ic
           FROM insets i JOIN exsets e ON i.shingle = e.shingle
           GROUP BY 1, 2),
         near AS (
           SELECT n.doc_id, min(n.eid) AS near_dup_of
           FROM (SELECT itab.doc_id, itab.eid
                 FROM itab
                 JOIN sze ON itab.eid = sze.eid
                 JOIN szi ON itab.doc_id = szi.doc_id
                 WHERE CAST(ic AS DOUBLE) / (szi + sze - ic) >= 0.5) n
           GROUP BY 1)
         SELECT e.doc_id, e.lang,
                CASE WHEN e.exact_dup_of IS NOT NULL THEN 'exact_dup'
                     WHEN n.near_dup_of IS NOT NULL THEN 'near_dup'
                     ELSE 'new' END AS verdict,
                COALESCE(e.exact_dup_of, n.near_dup_of) AS dup_of
         FROM exact e LEFT JOIN near n ON e.doc_id = n.doc_id
         ORDER BY e.doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (g)
    // EXACT substring dedup (the suffix-array dedup of "Deduplicating
    // Training Data Makes Language Models Better", reformulated for a
    // cluster): two docs are substring-dups when they share a VERBATIM
    // run of k=8 tokens. Every token position contributes its k-gram's
    // content hash (map-only, O(tokens)); candidates come from an
    // EQUALITY join on the gram hash — never an all-pairs compare — and
    // a document-frequency cap (grams in >20 docs are boilerplate) bounds
    // the join's fan-out, the standard guard against quadratic blowup on
    // common phrases at corpus scale. Pairs sharing ≥5 distinct grams
    // (≥ a 12-token verbatim run) are the dup report, keep-first by id.
    // The oracle mirrors gram extraction + join literally in DuckDB.
    QueryDef("l2_substring_dedup", (s, dir) => {
      val k = 8
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= k)
        // gh is INTERNAL (never projected to output): carry the md5 as
        // its 16-byte binary (unhex) instead of the 32-char hex string —
        // a bijection of the same 128-bit identity, so every distinct /
        // df-count / join decision is unchanged while the key that rides
        // all three shuffles halves (guide §2.3 "narrower types").
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(toks) - ${k - 1}), " +
            s"p -> unhex(md5(array_join(slice(toks, p, $k), ' '))))")).as("gh"))
        .distinct()
      // r19 NOTE: a lazy cut here was tried against the twin 1.07 s
      // materializations of this subtree (df-cap branch + join branch)
      // and measured FLAT solo (3.71 -> 3.85 s total): the twins run in
      // PARALLEL on idle cores, so deduping them buys CPU, not wall, at
      // this plan's width — and the lazy checkpoint doesn't even dedup
      // when both consumers materialize concurrently (they race it).
      // Rejected; kept as the boundary note for the x19-style cuts.
      val eligible = grams.groupBy(col("gh"))
        .agg(count(lit(1)).as("df_docs"))
        .filter(col("df_docs").between(2, 20))
        .select(col("gh"))
      val cand = grams.join(eligible, "gh")
      cand.as("a")
        .join(cand.as("b"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("shared_grams"))
        .filter(col("shared_grams") >= 5)
        .orderBy(col("a_id").asc_nulls_last, col("b_id").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 8),
         g AS (
           SELECT doc_id, unnest(generate_series(1, len(toks) - 7, 1)) AS p,
                  toks
           FROM d),
         h AS (
           SELECT DISTINCT doc_id,
                  md5(array_to_string(list_slice(toks, p, p + 7), ' ')) AS gh
           FROM g),
         e AS (SELECT gh FROM h GROUP BY gh HAVING count(*) BETWEEN 2 AND 20),
         c AS (SELECT h.doc_id, h.gh FROM h JOIN e USING (gh))
         SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared_grams
         FROM c a JOIN c b ON a.gh = b.gh AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 5
         ORDER BY a_id ASC NULLS LAST, b_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (b)
    // MinHash+LSH near-dup detection (shingle → 32 minhashes → 8 bands →
    // band-collision join → exact-Jaccard verify ≥ 0.5). Finds the 20
    // planted near-dup pairs. xxhash64-based ⇒ rows-only check here;
    // recall/precision property-tested in DedupSpec.
    QueryDef("l2_minhash_lsh", (s, dir) => {
      Dedup.minHashNearDups(corpusWithDups(s, dir), "doc_id", "text", threshold = 0.5)
        .select(col("ida"), col("idb"),
          expr("round(jaccard*10000)/10000").as("jaccard"))
        .orderBy(col("ida").asc_nulls_last, col("idb").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L2 (c)
    // SimHash near-dup detection (64-bit fingerprint, 16-bit chunk bands,
    // hamming ≤ 6 verify) over the same planted corpus. Rows-only.
    QueryDef("l2_simhash", (s, dir) => {
      Dedup.simHashNearDups(corpusWithDups(s, dir), "doc_id", "text", maxHamming = 6)
        .orderBy(col("ida").asc_nulls_last, col("idb").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L2 (e)
    // Edit-distance (Levenshtein) near-dup verify over equality-generated
    // candidates: same 64-char length bucket, ida < idb — the fuzzy-match
    // family's exact verifier, oracle-checked (both engines define
    // levenshtein as unit-cost insert/delete/substitute). At scale the
    // candidate set comes from LSH bands exactly like exact-Jaccard; the
    // length bucket here stands in for the band key so the join is
    // equality-shaped, never n².
    QueryDef("l2_edit_distance", (s, dir) => {
      val d = corpusWithDups(s, dir)
        .filter(col("doc_id") % 1000000 < 40)
        .select(col("doc_id"), col("text"),
          (length(col("text")) / lit(64)).cast("int").as("bucket"))
      val a = d.select(col("doc_id").as("ida"), col("text").as("ta"), col("bucket"))
      val b = d.select(col("doc_id").as("idb"), col("text").as("tb"),
        col("bucket").as("bb"))
      a.join(b, col("bucket") === col("bb") && col("ida") < col("idb"))
        .select(col("ida"), col("idb"),
          levenshtein(col("ta"), col("tb")).as("edit_dist"))
        .filter(col("edit_dist") <= 30)
        .orderBy(col("ida").asc_nulls_last, col("idb").asc_nulls_last)
    }, Some(
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
         mut AS (
           SELECT doc_id + 1000000 AS doc_id,
                  array_to_string(list_slice(string_split(text, ' '), 1,
                    len(string_split(text, ' ')) - 1), ' ') AS text
           FROM documents WHERE doc_id < 20),
         d AS (SELECT doc_id, text,
                      CAST(length(text) // 64 AS INTEGER) AS bucket
               FROM (SELECT * FROM base UNION ALL SELECT * FROM mut))
         SELECT a.doc_id AS ida, b.doc_id AS idb,
                CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist
         FROM d a JOIN d b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         WHERE levenshtein(a.text, b.text) <= 30
         ORDER BY ida ASC NULLS LAST, idb ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (a)
    // Brute-force cosine similarity pairs above a threshold (0.35 ≈ p99.9
    // of the fixture distribution → a handful of rows). vec_dot is the
    // codegen'd custom expression; norms precomputed per side so the join
    // computes one dot per pair. Oracle recomputes in double with the same
    // index-ordered summation.
    QueryDef("l3_cosine_pairs", (s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"), col("norm"))
      val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"), col("norm").as("na"))
      val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"), col("norm").as("nb"))
      a.join(b, col("ida") < col("idb"))
        .withColumn("sim",
          call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("sim") > 0.35)
        .select(col("ida"), col("idb"), expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("ida").asc_nulls_last, col("idb").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT a.vec_id AS ida, b.vec_id AS idb,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM embeddings a
           JOIN embeddings b ON a.vec_id < b.vec_id
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2)
         SELECT ida, idb, (round((dot / (sqrt(qa) * sqrt(qb)))*10000)/10000) AS sim
         FROM d WHERE dot / (sqrt(qa) * sqrt(qb)) > 0.35
         ORDER BY ida ASC NULLS LAST, idb ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (e)
    // Embedding-cosine near-dup (builder prompt §dedup): duplicate
    // DECISION over vector similarity — every doc that has a
    // higher-similarity earlier twin maps to its canonical (lowest-id)
    // match, the keep-first dedup policy. Exactness baseline like
    // l3_cosine_pairs (the pair space is explicit); at 100 TB the
    // identical groupBy runs over LSH/IVF-bucketed candidates
    // (l3_ann_lsh / l3_ann_ivf) instead of the full pair join —
    // candidates change, the decision operator does not.
    QueryDef("l2_embedding_neardup", (s, dir) => {
      val e = emb(s, dir)
      val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"), col("norm").as("na"))
      val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"), col("norm").as("nb"))
      a.join(b, col("ida") < col("idb"))
        .withColumn("sim",
          call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("sim") > 0.35)
        .groupBy(col("idb").as("dup_id"))
        .agg(min(col("ida")).as("canonical_id"),
          count(lit(1)).as("n_matches"),
          expr("round((max(sim))*10000)/10000").as("best_sim"))
        .orderBy(col("dup_id").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT a.vec_id AS ida, b.vec_id AS idb,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM embeddings a
           JOIN embeddings b ON a.vec_id < b.vec_id
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2),
         sims AS (
           SELECT ida, idb, dot / (sqrt(qa) * sqrt(qb)) AS sim
           FROM d WHERE dot / (sqrt(qa) * sqrt(qb)) > 0.35)
         SELECT idb AS dup_id, min(ida) AS canonical_id,
                count(*) AS n_matches,
                (round((max(sim))*10000)/10000) AS best_sim
         FROM sims GROUP BY idb
         ORDER BY dup_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (h)
    // SemDeDup (semantic dedup via embedding clusters): cluster the
    // corpus with sample-trained k-means, then compare vectors only
    // WITHIN their cell — the cluster assignment replaces the quadratic
    // all-pairs compare with an equality join on centroid id, turning
    // O(n²) cosine work into Σ|cell|². At 100 TB: centroids train once
    // on a bounded driver-side sample (ivfTrain), assignment is a
    // map-only codegen'd argmin, and cells hash-partition the pair join.
    // A removed row names its kept canonical (min id in the dup set) —
    // keep-first, same decision rule as the exact-dedup family. Seeded
    // Scala k-means ⇒ rows-only here; DedupSpec pins determinism and
    // recall vs the brute-force all-pairs decisions.
    QueryDef("l2_semdedup", (s, dir) => {
      val e = emb(s, dir)
      val centers = Dedup.ivfTrain(e, "embedding", 16)
      val asg = Dedup.ivfAssign(e, "embedding", centers)
      val a = asg.select(col("centroid"), col("vec_id").as("ida"),
        col("embedding").as("ea"), col("norm").as("na"))
      val b = asg.select(col("centroid"), col("vec_id").as("idb"),
        col("embedding").as("eb"), col("norm").as("nb"))
      a.join(b, Seq("centroid")).filter(col("ida") < col("idb"))
        .withColumn("sim",
          call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("sim") > 0.35)
        .groupBy(col("centroid"), col("idb").as("removed_id"))
        .agg(min(col("ida")).as("kept_id"),
          expr("round((max(sim))*10000)/10000").as("best_sim"))
        .orderBy(col("removed_id").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L3 (b)
    // Brute-force top-5 cosine neighbors for the first 10 query vectors —
    // the exactness baseline for ANN. Window top-k, not a global sort.
    QueryDef("l3_cosine_topk", (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("norm").as("qn"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("embedding").as("ne"), col("norm").as("nn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      q.crossJoin(c)
        .withColumn("sim",
          call_function("vec_dot", col("qe"), col("ne")) / (col("qn") * col("nn")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM embeddings a
           JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2),
         ranked AS (
           SELECT qid, nid, dot / (sqrt(qa) * sqrt(qb)) AS sim,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY dot / (sqrt(qa) * sqrt(qb)) DESC, nid ASC) AS rk
           FROM d)
         SELECT qid, CAST(rk AS INTEGER) AS rk, nid,
                (round(sim*10000)/10000) AS sim
         FROM ranked WHERE rk <= 5
         ORDER BY qid ASC NULLS LAST, rk ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (c)
    // ANN via hyperplane LSH buckets: 8 deterministic hyperplanes → 256
    // sign buckets; neighbors searched only within the query's bucket
    // (equality join — the 100 TB path; brute force above is the recall
    // baseline). Rows-only; recall measured in DedupSpec.
    QueryDef("l3_ann_lsh", (s, dir) => {
      val e = emb(s, dir)
        .withColumn("bucket", Dedup.lshBucket(col("embedding"), 8, 64))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"), col("bucket"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("embedding").as("ne"),
          col("norm").as("nn"), col("bucket").as("cbucket"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      q.join(c, col("bucket") === col("cbucket"))
        .withColumn("sim",
          call_function("vec_dot", col("qe"), col("ne")) / (col("qn") * col("nn")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L3 (d)
    // ANN via IVF centroids: seeded k-means partitions the vector space
    // into 16 cells; neighbors are searched only inside the query's cell
    // (equality join on centroid id — same scale shape as LSH buckets but
    // data-adaptive). Rows-only; recall property-tested in DedupSpec.
    QueryDef("l3_ann_ivf", (s, dir) => {
      // Train the coarse quantizer ONCE on a bounded driver-side sample
      // (FAISS pattern), then assign via a pure codegen'd argmin over the
      // plan-literal centroid table — at 100 TB the train set is a
      // sample, the assign is the corpus; the fit never re-runs per
      // batch and costs zero Spark jobs beyond the sample collect.
      val e = emb(s, dir)
      val centers = Dedup.ivfTrain(e, "embedding", k = 16)
      val assigned = Dedup.ivfAssign(e, "embedding", centers)
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"), col("centroid"))
      val c = assigned.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("embedding").as("ne"),
          col("norm").as("nn"), col("centroid").as("cc"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      q.join(c, col("centroid") === col("cc"))
        .withColumn("sim",
          call_function("vec_dot", col("qe"), col("ne")) / (col("qn") * col("nn")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L6 (c)
    // Contrastive hard-negative mining — the batch-construction step of
    // CLIP/DPR-style training: for each anchor document, the best
    // negatives are the most-similar embeddings that are NOT valid pairs
    // (here: same language, different source — semantically close but
    // provably wrong), because random negatives are too easy and teach
    // nothing. The language block is the scale lever: candidate
    // generation is a lang-equality join (never corpus squared), the
    // source-mismatch residual evaluates inside the hash join, and
    // WindowGroupLimit bounds each anchor to its top-3 below the
    // shuffle. Cosines round to 4dp in both engines (l3-family rule).
    QueryDef("l6_hard_negatives", (s, dir) => {
      val d = t(s, dir, "documents")
      val e = emb(s, dir)
      val de = d.join(e, col("doc_id") === col("vec_id"))
      val anchors = de.filter(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("lang"),
          col("source").as("qsrc"), col("embedding").as("qe"), col("norm").as("qn"))
      val cands = de.select(col("doc_id").as("nid"), col("lang"),
        col("source").as("nsrc"), col("embedding").as("ne"), col("norm").as("nn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      anchors.join(cands, Seq("lang"))
        .where(col("qsrc") =!= col("nsrc"))
        .withColumn("sim",
          call_function("vec_dot", col("qe"), col("ne")) / (col("qn") * col("nn")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"), col("lang"),
          expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, Some(
      """WITH de AS (
           SELECT doc_id, lang, source, embedding
           FROM documents JOIN embeddings ON doc_id = vec_id),
         d AS (
           SELECT a.doc_id AS qid, b.doc_id AS nid, a.lang AS lang,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM de a
           JOIN de b ON a.lang = b.lang AND a.source <> b.source
                    AND a.doc_id < 10
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2, 3),
         ranked AS (
           SELECT qid, nid, lang, dot / (sqrt(qa) * sqrt(qb)) AS sim,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY dot / (sqrt(qa) * sqrt(qb)) DESC, nid ASC) AS rk
           FROM d)
         SELECT qid, CAST(rk AS INTEGER) AS rk, nid, lang,
                (round(sim*10000)/10000) AS sim
         FROM ranked WHERE rk <= 3
         ORDER BY qid ASC NULLS LAST, rk ASC NULLS LAST""")),

    // ------------------------------------------------------------- L6 (d)
    // Margin-scored bitext mining (Artetxe & Schwenk 2019) — the
    // translation-pair miner behind CCMatrix-style parallel corpora: for
    // documents in two languages, a pair (x, y) is kept when each is the
    // other's nearest neighbor (mutual top-1) and scored by the RATIO
    // margin cos(x,y) / mean(top-k neighborhood sims of both sides) —
    // absolute cosine thresholds fail because "hubness" makes some
    // vectors near-everything; the margin normalizes by each point's own
    // neighborhood density. Parity design: each pairwise cosine is the
    // l3-family IEEE tree (bit-identical across engines), then shifted
    // (+1, always positive) and rounded ONCE into a 1e6 integer lattice;
    // ranks, top-4 sums, and the final margin are pure BIGINT ops — no
    // float aggregation anywhere. Scale: the pairwise frame is computed
    // ONCE (lineage-cut) and feeds both rank directions. This EXACT
    // variant is the small-corpus oracle anchor (all-pairs cross join —
    // certifiable against DuckDB, like l3_cosine_pairs next to the
    // l3_ann_* family); the corpus-scale path is `l6_bitext_ivf` below
    // (Dedup.bitextMineIvf): identical rank/margin machinery over
    // IVF-bucketed cell-equality candidates, no cartesian anywhere —
    // PlanSpec pins the shape, DedupSpec pins planted-pair recall.
    // Window ranks and the top-4 sums are per-doc partitions — parallel
    // across the corpus.
    QueryDef("l6_bitext_mining", (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val e = emb(s, dir)
      val de = d.join(e, col("doc_id") === col("vec_id"))
      val src = de.filter(col("lang") === "en")
        .select(col("doc_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"))
      val tgt = de.filter(col("lang") === "de")
        .select(col("doc_id").as("nid"), col("embedding").as("ne"),
          col("norm").as("nn"))
      val sims = src.crossJoin(tgt)
        .select(col("qid"), col("nid"),
          expr("""CAST(round((vec_dot(qe, ne) / (qn * nn) + 1.0D)
                  * 1000000) AS BIGINT)""").as("ssim"))
        .localCheckpoint(false)
      val rk = sims
        .withColumn("rkf", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("ssim").desc, col("nid").asc)))
        .withColumn("rkb", row_number().over(Window.partitionBy(col("nid"))
          .orderBy(col("ssim").desc, col("qid").asc)))
      val f4 = rk.filter(col("rkf") <= 4)
        .groupBy(col("qid")).agg(sum(col("ssim")).as("s4f"))
      val b4 = rk.filter(col("rkb") <= 4)
        .groupBy(col("nid")).agg(sum(col("ssim")).as("s4b"))
      rk.filter(col("rkf") === 1 && col("rkb") === 1)
        .join(f4, Seq("qid")).join(b4, Seq("nid"))
        .select(col("qid"), col("nid"), col("ssim"),
          expr("(ssim * 8000000L) div (s4f + s4b)").as("margin_ppm"))
        .orderBy(col("margin_ppm").desc, col("qid").asc)
    }, Some(
      """WITH de AS (
           SELECT d.doc_id, d.lang, e.embedding
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         p AS (
           SELECT a.doc_id AS qid, b.doc_id AS nid,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM de a JOIN de b ON a.lang = 'en' AND b.lang = 'de'
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2),
         s AS (
           SELECT qid, nid,
                  CAST(round((dot / (sqrt(qa) * sqrt(qb)) + 1.0)
                    * 1000000) AS BIGINT) AS ssim
           FROM p),
         r AS (
           SELECT qid, nid, ssim,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY ssim DESC, nid ASC) AS rkf,
                  row_number() OVER (PARTITION BY nid
                    ORDER BY ssim DESC, qid ASC) AS rkb
           FROM s),
         f4 AS (
           SELECT qid, CAST(sum(ssim) AS BIGINT) AS s4f
           FROM r WHERE rkf <= 4 GROUP BY 1),
         b4 AS (
           SELECT nid, CAST(sum(ssim) AS BIGINT) AS s4b
           FROM r WHERE rkb <= 4 GROUP BY 1)
         SELECT r.qid, r.nid, r.ssim,
                CAST((r.ssim * 8000000) // (f4.s4f + b4.s4b) AS BIGINT)
                  AS margin_ppm
         FROM r JOIN f4 USING (qid) JOIN b4 USING (nid)
         WHERE rkf = 1 AND rkb = 1
         ORDER BY margin_ppm DESC, qid ASC""")),

    // ------------------------------------------------------------- L6 (d')
    // IVF-BUCKETED bitext mining — the corpus-scale candidate plan for
    // the exact miner above (the l3_cosine_pairs / l3_ann_* pattern:
    // exact twin carries the oracle, bucketed twin carries the scale).
    // Candidates come from a cell-equality join (source side multi-
    // probes 4 cells, target side sits in its primary cell), so the
    // plan has NO cartesian — PlanSpec pins that, and DedupSpec proves
    // planted-translation-pair recall through the bucketing. Margins
    // normalize by CANDIDATE neighborhoods (the mined-corpus
    // approximation); rows-only check by design — the quantizer's
    // xxhash-free but engine-specific float argmin has no DuckDB twin.
    QueryDef("l6_bitext_ivf", (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val e = emb(s, dir)
      val de = d.join(e, col("doc_id") === col("vec_id"))
      val centers = Dedup.ivfTrain(e, "embedding", k = 8)
      val src = de.filter(col("lang") === "en")
        .select(col("doc_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"))
      val tgt = de.filter(col("lang") === "de")
        .select(col("doc_id").as("nid"), col("embedding").as("ne"),
          col("norm").as("nn"))
      Dedup.bitextMineIvf(src, tgt, centers, probes = 4)
    }, None),

    // ------------------------------------------------------------- L3 (h)
    // HUBNESS census (Radovanović 2010) — the high-dimensional kNN
    // pathology diagnostic: some vectors ("hubs") appear in far more
    // k-neighborhoods than average while "antihubs" appear in none,
    // and a skewed in-degree distribution silently degrades every
    // kNN-based step downstream (dedup recall, retrieval, margin
    // scoring — the reason l6_bitext_mining normalizes by neighborhood
    // density). The census: build the k=5 NN graph INSIDE label blocks
    // (the ANN-bucket analogue — candidate generation is a label
    // equality join, never corpus²), count each vector's kNN in-degree,
    // and emit the in-degree histogram INCLUDING the 0 bucket (antihubs
    // only exist if you left-join the full vector set back). Same
    // 1e6-lattice cosine parity as l6_bitext; ranks/degrees all BIGINT.
    QueryDef("l3_hubness", (s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("label"),
        col("embedding"), col("norm"))
      val a = e.select(col("vec_id").as("qid"), col("label"),
        col("embedding").as("qe"), col("norm").as("qn"))
      val b = e.select(col("vec_id").as("nid"), col("label"),
        col("embedding").as("ne"), col("norm").as("nn"))
      val nn = a.join(b, Seq("label"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          expr("""CAST(round((vec_dot(qe, ne) / (qn * nn) + 1.0D)
                  * 1000000) AS BIGINT)""").as("ssim"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("ssim").desc, col("nid").asc)))
        .filter(col("rk") <= 5)
      val indeg = e.select(col("vec_id").as("nid"))
        .join(nn.groupBy(col("nid")).agg(count(lit(1)).as("d")),
          Seq("nid"), "left")
        .select(coalesce(col("d"), lit(0L)).as("in_deg"))
      indeg.groupBy(col("in_deg"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("in_deg").asc_nulls_last)
    }, Some(
      """WITH p AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2),
         nn AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
                    row_number() OVER (PARTITION BY qid ORDER BY
                      CAST(round((dot / (sqrt(qa) * sqrt(qb)) + 1.0)
                        * 1000000) AS BIGINT) DESC, nid ASC) AS rk
             FROM p)
           WHERE rk <= 5),
         indeg AS (
           SELECT COALESCE(d.d, 0) AS in_deg
           FROM embeddings e LEFT JOIN (
             SELECT nid, CAST(count(*) AS BIGINT) AS d
             FROM nn GROUP BY 1) d ON e.vec_id = d.nid)
         SELECT CAST(in_deg AS BIGINT) AS in_deg,
                CAST(count(*) AS BIGINT) AS n_vecs
         FROM indeg GROUP BY 1
         ORDER BY in_deg ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (h2)
    // MUTUAL-PROXIMITY kNN rescaling (Schnitzer et al. 2012) — the
    // CORRECTION for the pathology l3_hubness measures: a hub vector
    // ranks high in everyone's neighbor list while ranking few of them
    // back, so raw-cosine kNN graphs skew toward hubs. MP rescores a
    // pair by the product of its 1-OFFSET COMPLEMENT RANKS: with block
    // size B, mp(q,n) = (B − rank_q(n)) · (B − rank_n(q)) — each
    // factor counts the same-block vectors ranked NO NEARER than the
    // partner, plus the partner itself (rank 1 → B−1, the best; last
    // rank B−1 → 1, never zero, so one hostile direction dampens
    // rather than annihilates — the multiplicative analogue of the
    // original P(d > d_xy) product, integer-EXACT, no distribution
    // fit). A hub's poor reverse ranks collapse its mp, demoting it
    // without any distance-model assumption. Frame = [[mpScored]],
    // shared verbatim with l3_rbo_agreement (one definition, the
    // coPurchasePairs discipline); top-3 by mp per query.
    QueryDef("l3_mutual_proximity", (s, dir) => {
      mpScored(s, dir)
        .filter(col("rkm") <= 3)
        .select(col("qid"), col("rkm").cast("int").as("rk"), col("nid"),
          col("mp"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, Some(
      """WITH p AS (
           SELECT a.label, a.vec_id AS qid, b.vec_id AS nid,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2, 3),
         ss AS (
           SELECT label, qid, nid,
                  CAST(round((dot / (sqrt(qa) * sqrt(qb)) + 1.0)
                    * 1000000) AS BIGINT) AS ssim
           FROM p),
         r AS (
           SELECT label, qid, nid, ssim,
                  CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY ssim DESC, nid ASC) AS BIGINT) AS rkf,
                  CAST(row_number() OVER (PARTITION BY nid
                    ORDER BY ssim DESC, qid ASC) AS BIGINT) AS rkb
           FROM ss),
         bs AS (
           SELECT label, CAST(count(*) AS BIGINT) AS bn
           FROM embeddings GROUP BY 1),
         m AS (
           SELECT r.qid, r.nid,
                  (bs.bn - r.rkf) * (bs.bn - r.rkb) AS mp,
                  row_number() OVER (PARTITION BY r.qid
                    ORDER BY (bs.bn - r.rkf) * (bs.bn - r.rkb) DESC,
                      r.nid ASC) AS rk
           FROM r JOIN bs ON r.label = bs.label)
         SELECT qid, CAST(rk AS INTEGER) AS rk, nid,
                CAST(mp AS BIGINT) AS mp
         FROM m WHERE rk <= 3
         ORDER BY qid ASC NULLS LAST, rk ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (h3)
    // RANK-BIASED OVERLAP (Webber et al. 2010) between the RAW-cosine
    // and MUTUAL-PROXIMITY neighbor rankings, per query — the ranker-
    // agreement metric that tells you WHICH queries the hubness
    // correction actually re-ordered (low RBO = a hub-dominated
    // neighborhood; high = the correction was a no-op there). RBO's
    // top-weighted geometric series is float by definition, but at
    // p = 0.9 truncated to depth 5 every term is RATIONAL with small
    // denominators, so the whole sum is EXACT INTEGER arithmetic:
    // weight w_d = (1−p)p^(d−1) scaled by 1e12 is 9^(d−1)·10^(12−d),
    // the 1/d factors clear through LCM(1..5) = 60, and a pair seen at
    // ranks (rkf, rkm) contributes the closed-form tail
    // C(m) = Σ_{d≥m} (60/d)·w_d for m = max(rkf, rkm) ≤ 5 — five
    // BIGINT constants, no float ever aggregates (sum order cannot
    // ulp-drift a hash compare). Normalized to the full-agreement
    // maximum 60·Σw_d = 24,570,600,000,000 in basis points. Same
    // label-block frame as l3_mutual_proximity; singleton blocks (no
    // pairs) report 0 via the full-vector left join.
    QueryDef("l3_rbo_agreement", (s, dir) => {
      // frame = mpScored, shared verbatim with l3_mutual_proximity —
      // the agreement metric must score the SAME rankings it compares
      val agreed = mpScored(s, dir)
        .withColumn("dmax", greatest(col("rkf"), col("rkm")))
        .filter(col("dmax") <= 5)
        .withColumn("contrib", expr(
          """CASE dmax WHEN 1 THEN CAST(12200820000000 AS BIGINT)
                       WHEN 2 THEN CAST(6200820000000 AS BIGINT)
                       WHEN 3 THEN CAST(3500820000000 AS BIGINT)
                       WHEN 4 THEN CAST(1880820000000 AS BIGINT)
                       ELSE CAST(787320000000 AS BIGINT) END"""))
        .groupBy(col("qid")).agg(sum(col("contrib")).as("rbo_scaled"))
      emb(s, dir).select(col("vec_id").as("qid"))
        .join(agreed, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("rbo_scaled"), lit(0L)).as("rbo_scaled"))
        .withColumn("rbo_bp",
          expr("(rbo_scaled * 10000) div 24570600000000"))
        .orderBy(col("qid").asc_nulls_last)
    }, Some(
      """WITH p AS (
           SELECT a.label, a.vec_id AS qid, b.vec_id AS nid,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2, 3),
         ss AS (
           SELECT label, qid, nid,
                  CAST(round((dot / (sqrt(qa) * sqrt(qb)) + 1.0)
                    * 1000000) AS BIGINT) AS ssim
           FROM p),
         r AS (
           SELECT label, qid, nid, ssim,
                  CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY ssim DESC, nid ASC) AS BIGINT) AS rkf,
                  CAST(row_number() OVER (PARTITION BY nid
                    ORDER BY ssim DESC, qid ASC) AS BIGINT) AS rkb
           FROM ss),
         bs AS (
           SELECT label, CAST(count(*) AS BIGINT) AS bn
           FROM embeddings GROUP BY 1),
         m AS (
           SELECT r.qid, r.nid, r.rkf,
                  CAST(row_number() OVER (PARTITION BY r.qid
                    ORDER BY (bs.bn - r.rkf) * (bs.bn - r.rkb) DESC,
                      r.nid ASC) AS BIGINT) AS rkm
           FROM r JOIN bs ON r.label = bs.label),
         c AS (
           SELECT qid,
                  CAST(sum(CASE greatest(rkf, rkm)
                    WHEN 1 THEN 12200820000000
                    WHEN 2 THEN 6200820000000
                    WHEN 3 THEN 3500820000000
                    WHEN 4 THEN 1880820000000
                    ELSE 787320000000 END) AS BIGINT) AS rbo_scaled
           FROM m WHERE greatest(rkf, rkm) <= 5
           GROUP BY 1)
         SELECT e.vec_id AS qid,
                CAST(COALESCE(c.rbo_scaled, 0) AS BIGINT) AS rbo_scaled,
                CAST((COALESCE(c.rbo_scaled, 0) * 10000)
                  // 24570600000000 AS BIGINT) AS rbo_bp
         FROM embeddings e LEFT JOIN c ON e.vec_id = c.qid
         ORDER BY qid ASC NULLS LAST""")),

    // ------------------------------------------------------------ L3 (h4)
    // IVF-BUCKETED mutual proximity — the corpus-scale twin of
    // l3_mutual_proximity (the l6_bitext_ivf exact-anchor + bucketed-
    // twin pattern applied to the hubness-correction family): the
    // within-label all-pairs frame grows quadratically with block
    // size, so at scale MP evaluates over IVF CANDIDATE LISTS instead
    // — (label, cell)-equality candidates, ranks and complement
    // counts within the lists. Rows-only (the candidate sets ride
    // engine-side k-means cells); exactness of the MP arithmetic is
    // carried by the exact twin's oracle, the bucketing's fidelity by
    // DedupSpec's planted-structure agreement pin, the plan shape
    // (no all-pairs, map-side probes) by PlanSpec.
    QueryDef("l3_mp_ivf", (s, dir) => {
      mpScoredIvf(s, dir)
        .filter(col("rkm") <= 3)
        .select(col("qid"), col("rkm").cast("int").as("rk"), col("nid"),
          col("mp"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------ L3 (h5)
    // IVF-BUCKETED hubness census — l3_hubness's corpus-scale twin
    // over the same candidate frame as l3_mp_ivf (one definition, the
    // mpScored discipline): k=5 NN in-degrees within candidate lists,
    // antihubs (in-degree 0) included via the full-vector left join.
    QueryDef("l3_hubness_ivf", (s, dir) => {
      val frame = mpScoredIvf(s, dir)
      emb(s, dir).select(col("vec_id").as("nid"))
        .join(frame.filter(col("rkf") <= 5)
          .groupBy(col("nid")).agg(count(lit(1)).as("d")),
          Seq("nid"), "left")
        .select(coalesce(col("d"), lit(0L)).as("in_deg"))
        .groupBy(col("in_deg"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("in_deg").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------ L3 (h6)
    // IVF-BUCKETED RBO agreement — l3_rbo_agreement's corpus-scale
    // twin: the raw-cosine vs MP ranking comparison over the SAME
    // candidate frame as l3_mp_ivf, with the identical p=0.9 depth-5
    // closed-form BIGINT tail constants (see l3_rbo_agreement for the
    // derivation; the integer arithmetic is unchanged, only the pair
    // universe is the candidate lists).
    QueryDef("l3_rbo_ivf", (s, dir) => {
      val agreed = mpScoredIvf(s, dir)
        .withColumn("dmax", greatest(col("rkf"), col("rkm")))
        .filter(col("dmax") <= 5)
        .withColumn("contrib", expr(
          """CASE dmax WHEN 1 THEN CAST(12200820000000 AS BIGINT)
                       WHEN 2 THEN CAST(6200820000000 AS BIGINT)
                       WHEN 3 THEN CAST(3500820000000 AS BIGINT)
                       WHEN 4 THEN CAST(1880820000000 AS BIGINT)
                       ELSE CAST(787320000000 AS BIGINT) END"""))
        .groupBy(col("qid")).agg(sum(col("contrib")).as("rbo_scaled"))
      emb(s, dir).select(col("vec_id").as("qid"))
        .join(agreed, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("rbo_scaled"), lit(0L)).as("rbo_scaled"))
        .withColumn("rbo_bp",
          expr("(rbo_scaled * 10000) div 24570600000000"))
        .orderBy(col("qid").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L3 (k)
    // Greedy k-CENTER diverse-subset selection (farthest-point
    // traversal, the 2-approximation of Gonzalez 1985; SemDeDup's
    // complement — semdedup removes redundancy, this PICKS the maximally
    // spread exemplars for curation/eval-set seeding): start from the
    // min-id point, then 4 rounds of "take the point farthest from every
    // chosen center". Exact-integer distances: dims quantize to a 1e-3
    // lattice (the l6_embedding_drift move — float·1000 can never land
    // on an exact .5, so the rounding is parity-safe), squared L2 is a
    // BIGINT sum, argmax ties break on vec_id. Scale: each round is ONE
    // distributed pass (min-dist update against the single new center +
    // a TakeOrdered top-1); centers are O(k) driver metadata — the same
    // bounded-collect discipline as l4_bpe's argmax rounds. The oracle
    // unrolls the 4 rounds as chained CTEs (each round's center is a
    // 1-row CTE, min-dist folds via least).
    QueryDef("l3_kcenter_diversity", (s, dir) => {
      val e = emb(s, dir)
      val q = e.select(col("vec_id"),
          expr("""transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))""")
            .as("qv"))
        .localCheckpoint(false)
      def distTo(center: Seq[Long]): String =
        s"""aggregate(zip_with(qv, array(${center.mkString("L,")}L),
            (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"""
      val c0 = q.orderBy(col("vec_id").asc).limit(1).collect()(0)
      val picks = scala.collection.mutable.ArrayBuffer(
        (0, c0.getLong(0), 0L))
      var cur = q.withColumn("md", expr(distTo(c0.getSeq[Long](1))))
      for (r <- 1 to 4) {
        val top = cur.select(col("vec_id"), col("qv"), col("md"))
          .orderBy(col("md").desc, col("vec_id").asc).limit(1).collect()(0)
        picks += ((r, top.getLong(0), top.getLong(2)))
        cur = cur.withColumn("md",
          least(col("md"), expr(distTo(top.getSeq[Long](1)))))
      }
      import s.implicits._
      picks.toSeq.toDF("round", "vec_id", "min_dist_at_pick")
        .orderBy(col("round").asc_nulls_last)
    }, Some(
      """WITH qd AS (
           SELECT vec_id, CAST(i AS INTEGER) AS i,
                  CAST(round(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                    * 1000) AS BIGINT) AS qx
           FROM embeddings CROSS JOIN range(1, 65) r(i)),
         c0 AS (SELECT min(vec_id) AS id FROM embeddings),
         d0 AS (
           SELECT a.vec_id,
                  CAST(sum((a.qx - b.qx) * (a.qx - b.qx)) AS BIGINT) AS md
           FROM qd a JOIN qd b
             ON b.vec_id = (SELECT id FROM c0) AND a.i = b.i
           GROUP BY 1),
         c1 AS (SELECT vec_id, md FROM d0
                ORDER BY md DESC, vec_id ASC LIMIT 1),
         e1 AS (
           SELECT a.vec_id,
                  CAST(sum((a.qx - b.qx) * (a.qx - b.qx)) AS BIGINT) AS d
           FROM qd a JOIN qd b
             ON b.vec_id = (SELECT vec_id FROM c1) AND a.i = b.i
           GROUP BY 1),
         d1 AS (SELECT d0.vec_id, least(d0.md, e1.d) AS md
                FROM d0 JOIN e1 USING (vec_id)),
         c2 AS (SELECT vec_id, md FROM d1
                ORDER BY md DESC, vec_id ASC LIMIT 1),
         e2 AS (
           SELECT a.vec_id,
                  CAST(sum((a.qx - b.qx) * (a.qx - b.qx)) AS BIGINT) AS d
           FROM qd a JOIN qd b
             ON b.vec_id = (SELECT vec_id FROM c2) AND a.i = b.i
           GROUP BY 1),
         d2 AS (SELECT d1.vec_id, least(d1.md, e2.d) AS md
                FROM d1 JOIN e2 USING (vec_id)),
         c3 AS (SELECT vec_id, md FROM d2
                ORDER BY md DESC, vec_id ASC LIMIT 1),
         e3 AS (
           SELECT a.vec_id,
                  CAST(sum((a.qx - b.qx) * (a.qx - b.qx)) AS BIGINT) AS d
           FROM qd a JOIN qd b
             ON b.vec_id = (SELECT vec_id FROM c3) AND a.i = b.i
           GROUP BY 1),
         d3 AS (SELECT d2.vec_id, least(d2.md, e3.d) AS md
                FROM d2 JOIN e3 USING (vec_id)),
         c4 AS (SELECT vec_id, md FROM d3
                ORDER BY md DESC, vec_id ASC LIMIT 1)
         SELECT CAST(0 AS INTEGER) AS round,
                (SELECT id FROM c0) AS vec_id,
                CAST(0 AS BIGINT) AS min_dist_at_pick
         UNION ALL SELECT 1, vec_id, md FROM c1
         UNION ALL SELECT 2, vec_id, md FROM c2
         UNION ALL SELECT 3, vec_id, md FROM c3
         UNION ALL SELECT 4, vec_id, md FROM c4
         ORDER BY round ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (k)
    // Bloom-accelerated incremental dedup — the two-tier membership shape
    // a streaming ingest runs at 100 TB: the corpus's fingerprint set is
    // summarized into ONE ~100 KB bloom filter (a single mergeable
    // aggregate over the corpus, built once per epoch, broadcast free),
    // every incoming doc probes it map-side, and only the bloom-POSITIVE
    // sliver pays the exact verification join. False positives are
    // corrected by that join and false negatives are impossible, so the
    // approximation NEVER leaks into the answer — the final verdicts are
    // deterministic and oracle-gated even though the bloom itself is
    // engine-specific. Probe-set reduction is asserted in FunctionsSpec.
    // Fingerprint = md5 of the 100-char prefix (l4_fingerprint's key).
    QueryDef("l2_bloom_dedup", (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      graft.Tables.registerAll(s, dir)
      // might_contain requires the filter side as a SCALAR SUBQUERY (or
      // constant) — Spark plans it as one broadcast-able aggregate job
      s.sql(
        """WITH d AS (
             SELECT doc_id,
                    md5(CAST(substring(text, 1, 100) AS BINARY)) AS h
             FROM documents),
           c AS (SELECT h FROM d WHERE doc_id % 7 <> 0),
           b AS (SELECT doc_id, h FROM d WHERE doc_id % 7 = 0),
           probed AS (
             SELECT doc_id, h,
                    might_contain(
                      (SELECT bloom_agg(xxhash64(h),
                         CAST(100000 AS BIGINT), CAST(800000 AS BIGINT))
                       FROM c),
                      xxhash64(h)) AS maybe
             FROM b),
           dups AS (
             SELECT p.doc_id
             FROM (SELECT doc_id, h FROM probed WHERE maybe) p
             LEFT SEMI JOIN (SELECT DISTINCT h FROM c) cd ON p.h = cd.h)
           SELECT b.doc_id,
                  CASE WHEN dups.doc_id IS NOT NULL THEN 'dup' ELSE 'new'
                  END AS verdict
           FROM b LEFT JOIN dups ON b.doc_id = dups.doc_id
           ORDER BY b.doc_id ASC NULLS LAST""")
    }, Some(
      """WITH d AS (
           SELECT doc_id, md5(substr(text, 1, 100)) AS h FROM documents),
         c AS (SELECT DISTINCT h FROM d WHERE doc_id % 7 <> 0),
         b AS (SELECT doc_id, h FROM d WHERE doc_id % 7 = 0)
         SELECT b.doc_id,
                CASE WHEN EXISTS (SELECT 1 FROM c WHERE c.h = b.h)
                     THEN 'dup' ELSE 'new' END AS verdict
         FROM b ORDER BY b.doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (j)
    // Johnson-Lindenstrauss random projection: 64-dim vectors compress to
    // m=16 via a DETERMINISTIC ±1 sign matrix derived from xxhash64(j,k)
    // — no stored projection matrix, any executor regenerates it from the
    // lambda, so the reduce is a pure map-only pass (zero shuffle, zero
    // broadcast) and re-runs bit-identically. JL guarantees pairwise
    // geometry survives within ~1/√m distortion, so downstream search
    // runs 4× cheaper per dot product; at 100 TB the projected column is
    // what gets stored/scanned, with exact vectors only touching the
    // final re-rank (same split as PQ, but distance math stays plain
    // cosine). Brute-force top-k here runs IN THE PROJECTED SPACE over
    // the documented broadcast-tiny query set. Rows-only; the distortion
    // bound and planted-near-dup preservation are property-tested in
    // DedupSpec.
    QueryDef("l3_random_projection", (s, dir) => {
      val m = 16
      val e = emb(s, dir)
        .withColumn("p", expr(
          s"""transform(sequence(0, ${m - 1}), k ->
                aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE),
                  (acc, j) -> acc + CAST(embedding[j] AS DOUBLE) *
                    CASE WHEN pmod(xxhash64(j, k), 2) = 0
                         THEN CAST(1.0 AS DOUBLE)
                         ELSE CAST(-1.0 AS DOUBLE) END))"""))
        .withColumn("pn",
          expr("sqrt(aggregate(p, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("p").as("qp"), col("pn").as("qn"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("p").as("np"), col("pn").as("nn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      q.crossJoin(c)
        .withColumn("sim",
          expr("aggregate(zip_with(qp, np, (a, b) -> a * b), " +
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x)") / (col("qn") * col("nn")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L3 (g)
    // ANN via product quantization (the FAISS-style compressed-codes
    // path): codebooks train once on a deterministic 1-in-5 sample, the
    // corpus encodes to m=8 small codes (256 B → 8 ints, memory-resident
    // at any scale), and queries rank candidates by asymmetric distance
    // — exact query subvectors vs quantized codewords, all codegen'd
    // expressions over plan-literal codebooks. Rows-only (quantization
    // isn't SQL-expressible); top-1 recall on planted near-dups is
    // property-tested in DedupSpec. At 100 TB this composes as IVF-PQ:
    // IVF cells cut candidates, ADC re-ranks inside cells.
    QueryDef("l3_ann_pq", (s, dir) => {
      val e = emb(s, dir)
      val cb = Dedup.pqTrain(e.filter(pmod(col("vec_id"), lit(5)) === 0),
        "embedding")
      val codes = Dedup.pqEncode(
        e.filter(col("vec_id") >= 10).select(col("vec_id"), col("embedding")),
        "embedding", cb)
        .select(col("vec_id").as("nid") +:
          cb.indices.map(j => col(s"pq$j")): _*)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("d2").asc, col("nid").asc)
      codes.crossJoin(broadcast(q))
        .withColumn("d2", Dedup.pqAdcDistance(col("qe"), cb))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(d2*10000)/10000").as("d2"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L3 (h)
    // IVF-PQ composition — the documented 100 TB ANN path: coarse IVF
    // cells (sample-trained centroids) cut the candidate set via an
    // EQUALITY join on cell id, queries probe their 2 nearest cells
    // (multi-probe recall), and ADC re-ranks candidates inside the
    // probed cells against PQ codes — exact query subvectors vs
    // quantized codewords, all codegen'd expressions over plan-literal
    // tables. At scale the corpus holds 8 small code ints + 1 cell int
    // per vector (memory-resident at any corpus size); neither training
    // step runs distributed jobs. Rows-only (quantization isn't
    // SQL-expressible); top-1 recall vs brute force in DedupSpec.
    QueryDef("l3_ann_ivfpq", (s, dir) => {
      val e = emb(s, dir)
      val centers = Dedup.ivfTrain(e, "embedding", k = 16)
      val cb = Dedup.pqTrain(e.filter(pmod(col("vec_id"), lit(5)) === 0),
        "embedding")
      val corpus = Dedup.pqEncode(
        Dedup.ivfAssign(e.filter(col("vec_id") >= 10), "embedding", centers)
          .select(col("vec_id"), col("embedding"), col("centroid")),
        "embedding", cb)
        .select(col("vec_id").as("nid") +: col("centroid").as("cc") +:
          cb.indices.map(j => col(s"pq$j")): _*)
      val q = Dedup.ivfProbes(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe")),
        "qe", centers, probes = 2)
        .select(col("qid"), col("qe"), col("centroid"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("d2").asc, col("nid").asc)
      q.join(corpus, col("centroid") === col("cc"))
        .withColumn("d2", Dedup.pqAdcDistance(col("qe"), cb))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(d2*10000)/10000").as("d2"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L3 (i)
    // PERSISTED ANN index — the build-once / query-many serving split the
    // in-query paths above compose into at 100 TB: `AnnIndex.build` runs
    // the expensive pipeline once (sample-trained centroids + codebooks,
    // distributed encode) into DeltaLite tables with the codes table
    // PARTITIONED BY IVF CELL; `append` encodes a later corpus batch
    // under the frozen model (O(batch) maintenance, no retrain);
    // `query` reads ONLY the probed cells' partitions (log-level
    // pruning) and ADC-re-ranks — no training or corpus encode on the
    // serve path. Rows-only (quantization isn't SQL-expressible);
    // determinism/recall/pruning are property-tested in DedupSpec.
    QueryDef("l3_ann_index", (s, dir) => {
      val root = graft.TempDirs.fresh("l3_index")
      val e = emb(s, dir)
      val corpus = e.filter(col("vec_id") >= 10)
      graft.operators.AnnIndex.build(s, root,
        corpus.filter(pmod(col("vec_id"), lit(2)) === 0), "vec_id", "embedding")
      graft.operators.AnnIndex.append(s, root,
        corpus.filter(pmod(col("vec_id"), lit(2)) === 1), "vec_id", "embedding")
      graft.operators.AnnIndex.query(s, root,
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding").as("qe")),
          "qid", "qe", probes = 2, topK = 3)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(d2*10000)/10000").as("d2"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------------- L4
    // Corpus token statistics per language (whitespace + BPE-ish token
    // counts, char stats).
    QueryDef("l4_text_stats", (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks"))).as("total_tokens"),
          expr("round((avg(size(toks)))*10000)/10000").as("avg_tokens"),
          expr("round((avg(n_chars))*10000)/10000").as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang").asc_nulls_last)
    }, Some(
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                (round((avg(len(string_split(text, ' '))))*10000)/10000) AS avg_tokens,
                (round((avg(n_chars))*10000)/10000) AS avg_chars,
                min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY lang ORDER BY lang ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (b)
    // Language-ID heuristic confusion counts (stopword-ratio rule; the
    // shared fixture vocabulary makes this weakly discriminative by
    // construction — see Llm scaladoc).
    QueryDef("l4_lang_id", (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .withColumn("predicted", TextFunctions.langIdPredict("toks"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang").asc_nulls_last, col("predicted").asc_nulls_last)
    }, Some(
      """SELECT lang,
                CASE WHEN len(list_filter(string_split(text, ' '),
                       t -> t = 'the' OR t = 'a')) >= 3
                     THEN 'en' ELSE 'unk' END AS predicted,
                count(*) AS n
         FROM documents GROUP BY 1, 2
         ORDER BY lang ASC NULLS LAST, predicted ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (n)
    // C4-style line+document filtering (Raffel et al. 2020, the cleaning
    // recipe behind C4): line rule — keep only lines that end in terminal
    // punctuation AND carry ≥5 words; document rule — drop any document
    // containing code braces or the 'lorem ipsum' boilerplate marker, and
    // require ≥2 surviving lines. The fixtures carry no dirt, so the
    // query plants a deterministic multi-line header per doc (same
    // expression both engines — the l5_pii_redact pattern) and then
    // cleans it. Shape at 100 TB: explode lines (map-side) → line
    // predicate (map) → ONE doc-keyed re-aggregate → tiny source census;
    // no joins, no driver state.
    QueryDef("l4_c4_filters", (s, dir) => {
      val nl = "\n"
      val dirty = concat(
        when(col("doc_id") % 7 === 0, lit("function() { var x = 1; }" + nl))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("Lorem ipsum dolor sit amet." + nl))
          .otherwise(lit("")),
        lit("First sentence of document "), col("doc_id").cast("string"),
        lit(" is long enough to keep."), lit(nl),
        lit("too short" + nl),
        lit("no terminal punctuation on this line at all" + nl),
        concat(substring(col("text"), 1, 80), lit(".")))
      val lines = t(s, dir, "documents")
        .withColumn("line", explode(split(dirty, nl)))
      val keep = (col("line").endsWith(".") || col("line").endsWith("!") ||
        col("line").endsWith("?")) && size(split(col("line"), " ")) >= 5
      val perDoc = lines.groupBy(col("doc_id"), col("source"))
        .agg(max(col("line").contains("{") ||
            lower(col("line")).contains("lorem ipsum")).as("bad"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept_lines"),
          sum(when(keep, length(col("line"))).otherwise(0L)).as("kept_chars"))
        .withColumn("kept", !col("bad") && col("n_kept_lines") >= 2)
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept_docs"),
          sum(when(col("kept"), col("n_kept_lines")).otherwise(0L))
            .as("n_kept_lines"),
          sum(when(col("kept"), col("kept_chars")).otherwise(0L))
            .as("kept_chars"))
        .orderBy(col("source").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT doc_id, source,
                  concat(
                    CASE WHEN doc_id % 7 = 0
                         THEN 'function() { var x = 1; }' || chr(10) ELSE '' END,
                    CASE WHEN doc_id % 5 = 0
                         THEN 'Lorem ipsum dolor sit amet.' || chr(10) ELSE '' END,
                    'First sentence of document ', CAST(doc_id AS VARCHAR),
                    ' is long enough to keep.', chr(10),
                    'too short', chr(10),
                    'no terminal punctuation on this line at all', chr(10),
                    substring(text, 1, 80), '.') AS dirty
           FROM documents),
         lines AS (
           SELECT doc_id, source, unnest(string_split(dirty, chr(10))) AS line
           FROM d),
         per_doc AS (
           SELECT doc_id, source,
                  max(CASE WHEN line LIKE '%{%'
                           OR lower(line) LIKE '%lorem ipsum%'
                           THEN TRUE ELSE FALSE END) AS bad,
                  sum(CASE WHEN (line LIKE '%.' OR line LIKE '%!'
                                 OR line LIKE '%?')
                            AND len(string_split(line, ' ')) >= 5
                           THEN 1 ELSE 0 END) AS n_kept_lines,
                  sum(CASE WHEN (line LIKE '%.' OR line LIKE '%!'
                                 OR line LIKE '%?')
                            AND len(string_split(line, ' ')) >= 5
                           THEN length(line) ELSE 0 END) AS kept_chars
           FROM lines GROUP BY 1, 2),
         flagged AS (
           SELECT *, (NOT bad) AND n_kept_lines >= 2 AS kept FROM per_doc)
         SELECT source,
                count(*) AS n_docs,
                CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_docs,
                CAST(sum(CASE WHEN kept THEN n_kept_lines ELSE 0 END) AS BIGINT) AS n_kept_lines,
                CAST(sum(CASE WHEN kept THEN kept_chars ELSE 0 END) AS BIGINT) AS kept_chars
         FROM flagged GROUP BY source
         ORDER BY source ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (o)
    // Hashed-feature linear classifier INFERENCE (the fastText /
    // production quality-classifier pattern): tokens hash into 256
    // buckets (two md5 nibbles — engine-portable), each bucket carries a
    // deterministic integer weight (Knuth multiplicative hash — the
    // "trained model", a pure function so the oracle can restate it),
    // a document's margin is the exact BIGINT sum of its token weights,
    // and the score is one sigmoid of that exact rational — the ONLY
    // transcendental per doc, rounded to 6dp for engine portability.
    // At 100 TB: model scoring is explode → map (hash+weight lookup) →
    // one doc-keyed sum — no UDF, no model file, no driver state; a real
    // weight table would broadcast-join on bucket instead of inlining
    // the weight formula, same shape.
    QueryDef("l4_linear_classifier", (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("h", md5(concat(lit("feat:"), col("tok"))))
        .withColumn("bucket",
          (expr("instr('0123456789abcdef', substring(h, 1, 1))") - 1) * 16 +
            (expr("instr('0123456789abcdef', substring(h, 2, 1))") - 1))
        .withColumn("w",
          (col("bucket").cast("bigint") * lit(2654435761L)) % 1000L - 500L)
      val scored = toks.groupBy(col("doc_id"), col("source"))
        .agg(sum(col("w")).as("margin_milli"))
        .withColumn("score",
          round((lit(1.0) / (lit(1.0) +
            exp(-col("margin_milli").cast("double") / 1000.0))) * 1000000)
            / 1000000)
      scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") > 0.5, 1L).otherwise(0L)).as("n_positive"),
          (round(avg(col("score"))*10000)/10000).as("avg_score"),
          sum(col("margin_milli")).as("sum_margin"))
        .orderBy(col("source").asc_nulls_last)
    }, Some(
      """WITH toks AS (
           SELECT doc_id, source,
                  unnest(string_split(text, ' ')) AS tok
           FROM documents),
         hashed AS (
           SELECT doc_id, source, md5('feat:' || tok) AS h FROM toks),
         feat AS (
           SELECT doc_id, source,
                  (strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 +
                  (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) AS bucket
           FROM hashed),
         w AS (
           SELECT doc_id, source,
                  (CAST(bucket AS BIGINT) * 2654435761) % 1000 - 500 AS w
           FROM feat),
         scored AS (
           SELECT doc_id, source,
                  CAST(sum(w) AS BIGINT) AS margin_milli,
                  (round((1.0 / (1.0 +
                    exp(-CAST(sum(w) AS DOUBLE) / 1000.0)))*1000000)/1000000)
                    AS score
           FROM w GROUP BY 1, 2)
         SELECT source, count(*) AS n_docs,
                CAST(sum(CASE WHEN score > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_positive,
                (round((avg(score))*10000)/10000) AS avg_score,
                CAST(sum(margin_milli) AS BIGINT) AS sum_margin
         FROM scored GROUP BY source ORDER BY source ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (p)
    // BPE tokenizer training, merge-step statistics (Sennrich et al.
    // 2016): the first merge of byte-pair encoding is the most frequent
    // adjacent character pair, counted over words WEIGHTED by word
    // frequency. The scale shape is the point — real BPE trainers never
    // rescan the corpus per merge: one corpus pass builds the word-count
    // table (map-side-combined explode → groupBy word), and the pair
    // explode then runs over the VOCABULARY (distinct words × their
    // lengths), which is sublinear in corpus size at 100 TB. Counts are
    // exact integers, top-20 pinned by (freq DESC, pair ASC).
    QueryDef("l4_bpe_pairs", (s, dir) => {
      val words = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      words
        .select(col("wc"), explode(
          expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("pair").asc)
        .limit(20)
    }, Some(
      """WITH words AS (
           SELECT tok AS w, count(*) AS wc
           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           WHERE len(tok) >= 2 GROUP BY 1),
         pos AS (
           SELECT w, wc, unnest(range(1, len(w))) AS i FROM words),
         pairs AS (
           SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, wc FROM pos)
         SELECT pair, CAST(sum(wc) AS BIGINT) AS freq
         FROM pairs GROUP BY pair
         ORDER BY freq DESC, pair ASC LIMIT 20""")),

    // ------------------------------------------------------------- L4 (q)
    // URL parsing + domain-level blocklist census (the RefinedWeb /
    // CCNet URL-filtering stage): each doc gets a deterministic planted
    // source URL (fixtures carry none — the l5_pii_redact pattern), the
    // host and query param come from Spark's codegen'd parse_url, the
    // registrable domain from the same regexp both engines run, and the
    // census rolls up per domain with a blocklist flag — the
    // domain-aggregation shape URL dedup and blocklist filtering share.
    // Map-only until one domain-keyed aggregate; at 100 TB the domain
    // census is the tiny side that then broadcast-joins back as the
    // filter.
    QueryDef("l4_url_extract", (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("url", concat(
          lit("https://host"), (col("doc_id") % 50).cast("string"),
          lit(".example"), (col("doc_id") % 7).cast("string"),
          lit(".com/p/"), col("doc_id").cast("string"),
          lit("?q=w"), (col("doc_id") % 13).cast("string")))
      docs
        .withColumn("host", parse_url(col("url"), lit("HOST")))
        .withColumn("domain",
          regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
        .withColumn("qparam", parse_url(col("url"), lit("QUERY"), lit("q")))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"),
          countDistinct(col("qparam")).as("n_queries"),
          max((col("domain") === "example0.com").cast("int")).as("blocked"))
        .orderBy(col("domain").asc_nulls_last)
    }, Some(
      """WITH u AS (
           SELECT doc_id,
                  'https://host' || CAST(doc_id % 50 AS VARCHAR) ||
                  '.example' || CAST(doc_id % 7 AS VARCHAR) ||
                  '.com/p/' || CAST(doc_id AS VARCHAR) ||
                  '?q=w' || CAST(doc_id % 13 AS VARCHAR) AS url
           FROM documents),
         parsed AS (
           SELECT doc_id,
                  regexp_extract(url, 'https://([^/]+)/', 1) AS host,
                  regexp_extract(url, '\?q=([^&]+)$', 1) AS qparam,
                  regexp_extract(regexp_extract(url, 'https://([^/]+)/', 1),
                    '([^.]+\.[^.]+)$', 1) AS domain
           FROM u)
         SELECT domain, count(*) AS n_docs,
                count(DISTINCT host) AS n_hosts,
                count(DISTINCT qparam) AS n_queries,
                CAST(max(CASE WHEN domain = 'example0.com'
                         THEN 1 ELSE 0 END) AS INTEGER) AS blocked
         FROM parsed GROUP BY domain
         ORDER BY domain ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (c)
    // Per-document quality scoring: token count, distinct-token ratio,
    // mean word length, stopword ratio → quality bucket.
    // ------------------------------------------------------------- L4 (k)
    // Perplexity-bucket quality filtering (the CCNet recipe): score every
    // doc by its negative mean log-likelihood under a unigram LM trained
    // on the corpus ITSELF (add-one smoothing), then split the corpus
    // into 4 equal-frequency buckets — head/middle/tail selection for
    // training mixes. The LM "training" is one token-frequency aggregate;
    // scoring joins tokens to frequencies (shuffle keyed by token, the
    // corpus-stat scalars broadcast) — no driver state, no model file.
    // The equal-frequency split is a DISTRIBUTED exact ntile: docs bin
    // by a deterministic nll value range (bins are contiguous in the
    // (nll, doc_id) order), rank within bins in parallel, add broadcast
    // prefix offsets (p11 two-phase), then apply ntile's closed form
    // bucket(r, n) map-side — identical semantics to a global ntile(4)
    // with NO corpus-cardinality frame on one partition. Bin count is
    // bounded by the nll VALUE range (LM statistics), not corpus size.
    // Scores are rounded to 6dp BEFORE ranking so the tie order is
    // engine-portable.
    QueryDef("l4_perplexity", (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      val corpus = toks.agg(count(lit(1)).as("n_total"),
        countDistinct(col("tok")).as("v_size"))
      val nll = toks.join(freq, "tok").crossJoin(broadcast(corpus))
        .groupBy(col("doc_id"))
        .agg((round(-avg(log((col("tf") + lit(1.0)) /
          (col("n_total") + col("v_size")))) * 1000000) / 1000000).as("nll"))
      // ntile(4)'s closed form: the first n%4 buckets hold ⌈n/4⌉ rows,
      // the rest ⌊n/4⌋ — computable per-row from the exact global rank
      // r (operators/DistributedRank over nll value bins; n rides the
      // broadcast offsets frame). CASE keeps the ⌊n/4⌋=0 small-n edge
      // out of the divisor.
      graft.operators.DistributedRank.withGlobalRank(nll,
          expr("CAST(floor(nll * 100.0D) AS BIGINT)"),
          Seq(col("nll").asc, col("doc_id").asc), "r", totalOut = Some("n"))
        .withColumn("bucket", expr(
          """CAST(CASE WHEN r <= (n % 4L) * ((n div 4L) + 1L)
             THEN ((r - 1L) div ((n div 4L) + 1L)) + 1L
             ELSE (n % 4L)
                  + ((r - 1L - (n % 4L) * ((n div 4L) + 1L)) div (n div 4L))
                  + 1L
             END AS INT)"""))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          (round(avg(col("nll"))*10000)/10000).as("avg_nll"),
          min(col("nll")).as("min_nll"),
          max(col("nll")).as("max_nll"))
        .orderBy(col("bucket").asc_nulls_last)
    }, Some(
      """WITH t AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         f AS (SELECT tok, count(*) AS tf FROM t GROUP BY 1),
         c AS (SELECT count(*) AS n_total, count(DISTINCT tok) AS v_size
               FROM t),
         s AS (
           SELECT doc_id,
                  (round((-avg(ln((tf + 1.0) / (n_total + v_size))))*1000000)/1000000)
                    AS nll
           FROM t JOIN f USING (tok) CROSS JOIN c GROUP BY doc_id),
         b AS (
           SELECT doc_id, nll,
                  CAST(ntile(4) OVER (ORDER BY nll ASC, doc_id ASC) AS INTEGER)
                    AS bucket
           FROM s)
         SELECT bucket, count(*) AS n_docs,
                (round((avg(nll))*10000)/10000) AS avg_nll,
                min(nll) AS min_nll, max(nll) AS max_nll
         FROM b GROUP BY bucket ORDER BY bucket ASC NULLS LAST""")),

    QueryDef("l4_quality_score", (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          expr("round((CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks))*10000)/10000")
            .as("uniq_ratio"),
          expr("round((CAST(n_chars - (size(toks) - 1) AS DOUBLE) / size(toks))*10000)/10000")
            .as("avg_word_len"),
          expr("round((size(filter(toks, x -> x = 'the' OR x = 'a' OR x = 'of')) / size(toks))*10000)/10000")
            .as("stop_ratio"))
        .withColumn("quality",
          when(col("n_tokens") < 20, "short")
            .when(col("uniq_ratio") < 0.25, "repetitive")
            .otherwise("ok"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
                (round((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / len(string_split(text, ' ')))*10000)/10000) AS uniq_ratio,
                (round((CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                        / len(string_split(text, ' ')))*10000)/10000) AS avg_word_len,
                (round((CAST(len(list_filter(string_split(text, ' '),
                         x -> x = 'the' OR x = 'a' OR x = 'of')) AS DOUBLE)
                        / len(string_split(text, ' ')))*10000)/10000) AS stop_ratio,
                CASE WHEN len(string_split(text, ' ')) < 20 THEN 'short'
                     WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                          / len(string_split(text, ' ')) < 0.25 THEN 'repetitive'
                     ELSE 'ok' END AS quality
         FROM documents ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (d)
    // Rolling polynomial fingerprint (order-sensitive content hash, mod
    // 1e9+7). Same left-fold in both engines (list_reduce with a
    // prepended zero accumulator mirrors Spark's aggregate-with-init).
    QueryDef("l4_fingerprint", (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .select(col("doc_id"), TextFunctions.fingerprint("toks").as("fingerprint"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(text, ' '),
                      t -> CAST(length(t)*131 + ascii(substr(t,1,1)) AS BIGINT))),
                  (acc, x) -> (acc*131 + x) % 1000000007) AS fingerprint
         FROM documents ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (e)
    // n-gram (bigram) frequency analysis across the corpus — the n>1
    // companion of the unigram counts in f8_explode.
    QueryDef("l4_ngram_freq", (s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .select(explode(expr(
          """CASE WHEN size(toks) >= 2
             THEN transform(sequence(0, size(toks) - 2),
                            i -> concat_ws(' ', toks[i], toks[i+1]))
             ELSE array() END""")).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc_nulls_last, col("bigram").asc_nulls_last)
        .limit(50)
    }, Some(
      """SELECT bigram, count(*) AS n
         FROM (SELECT unnest(
                 CASE WHEN len(string_split(text,' ')) >= 2
                      THEN list_transform(range(1, len(string_split(text,' '))),
                             i -> string_split(text,' ')[i] || ' ' ||
                                  string_split(text,' ')[i+1])
                      ELSE [] END) AS bigram
               FROM documents)
         GROUP BY bigram
         ORDER BY n DESC NULLS LAST, bigram ASC NULLS LAST
         LIMIT 50""")),

    // ------------------------------------------------------------- L4 (j)
    // Gopher-style repetition filters: fraction of a document's bigrams
    // taken by its single most-frequent bigram, and the fraction covered
    // by ANY repeated bigram — the standard "remove boilerplate /
    // degenerate repetition" quality gates (the fixtures' docs are
    // single-line, so the line-dedup variants of these rules have no
    // signal here; the n-gram variants are the discriminating ones).
    // Scale shape: explode → per-(doc, bigram) count → per-doc agg is two
    // partial-agg shuffles keyed on (doc_id, bigram) then doc_id — pure
    // map-side-combine aggregation, no driver work, no skew (bigram
    // counts are bounded by doc length). At 100 TB this is one corpus
    // read + two exchanges of the much smaller count table.
    QueryDef("l4_repetition", (s, dir) => {
      val bg = t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(toks) - 2),
                       i -> concat_ws(' ', toks[i], toks[i+1]))""")).as("b"))
      bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(
          expr("round((CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE))*10000)/10000")
            .as("top_bigram_frac"),
          expr("round((CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE))*10000)/10000")
            .as("dup_bigram_frac"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH bg AS (
           SELECT doc_id,
                  unnest(list_transform(range(1, len(string_split(text,' '))),
                    i -> string_split(text,' ')[i] || ' ' ||
                         string_split(text,' ')[i+1])) AS b
           FROM documents WHERE len(string_split(text,' ')) >= 2),
         c AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY 1, 2)
         SELECT doc_id,
                (round((CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE))*10000)/10000)
                  AS top_bigram_frac,
                (round((CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
                        / CAST(sum(cnt) AS DOUBLE))*10000)/10000)
                  AS dup_bigram_frac
         FROM c GROUP BY doc_id ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (k)
    // Eval-set contamination check — the decontamination pass every
    // LLM training pipeline runs before training: training documents
    // sharing ≥1 word n-gram with a benchmark/eval document are flagged
    // (the GPT-3/PaLM-style overlap rule; production pipelines use
    // n ≈ 8-13 — on the 31-token fixture vocabulary trigrams are the
    // discriminating scale, and n only shifts the transform indexes). Eval set here is a
    // deterministic slice of the corpus (doc_id % 97 == 0). Scale shape:
    // eval sets are tiny by construction, so the deduped eval-gram table
    // BROADCASTS and the training side streams map-side through a
    // broadcast semi-join — no shuffle of the training grams; the only
    // exchange is the final per-language distinct-doc agg. At 100 TB
    // the corpus is read once, filtered in place.
    QueryDef("l4_contamination", (s, dir) => {
      val toks = t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(col("text")))
      def grams(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("lang"), explode(expr(
          """CASE WHEN size(toks) >= 3
             THEN transform(sequence(0, size(toks) - 3),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             ELSE array() END""")).as("gram"))
      val evalGrams = grams(toks.filter(col("doc_id") % 97 === 0))
        .select("gram").distinct()
      val contaminated = grams(toks.filter(col("doc_id") % 97 =!= 0))
        .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      contaminated.groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_contaminated"),
          countDistinct(col("gram")).as("n_shared_grams"))
        .orderBy(col("lang").asc_nulls_last)
    }, Some(
      """WITH toks AS (
           SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
         grams AS (
           SELECT doc_id, lang, unnest(
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE [] END) AS gram
           FROM toks),
         evalg AS (
           SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
         SELECT lang, count(DISTINCT doc_id) AS n_contaminated,
                count(DISTINCT gram) AS n_shared_grams
         FROM grams g
         WHERE doc_id % 97 <> 0
           AND EXISTS (SELECT 1 FROM evalg e WHERE e.gram = g.gram)
         GROUP BY lang ORDER BY lang ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (e)
    // Euclidean (L2) distance pairs — the metric companion of cosine,
    // computed from the same codegen'd dot products:
    // |a-b|^2 = |a|^2 + |b|^2 - 2<a,b>.
    QueryDef("l3_l2_distance", (s, dir) => {
      val e = emb(s, dir).filter(col("vec_id") < 40)
        .withColumn("sq", call_function("vec_dot", col("embedding"), col("embedding")))
      val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"), col("sq").as("sqa"))
      val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"), col("sq").as("sqb"))
      a.join(b, col("ida") < col("idb"))
        .withColumn("dist", sqrt(greatest(
          col("sqa") + col("sqb") -
            lit(2.0) * call_function("vec_dot", col("ea"), col("eb")), lit(0.0))))
        .select(col("ida"), col("idb"), expr("round(dist*10000)/10000").as("dist"))
        .orderBy(col("ida").asc_nulls_last, col("idb").asc_nulls_last)
    }, Some(
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40),
         d AS (
           SELECT a.vec_id AS ida, b.vec_id AS idb,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb
           FROM e a JOIN e b ON a.vec_id < b.vec_id
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2)
         SELECT ida, idb,
                (round((sqrt(greatest(qa + qb - 2*dot, 0)))*10000)/10000) AS dist
         FROM d ORDER BY ida ASC NULLS LAST, idb ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (f)
    // Per-label embedding centroids — the cluster-prototype primitive
    // (class means for probing, IVF codebook refresh, diversity
    // sampling). posexplode → keyed avg: partial aggregation collapses
    // each partition to |labels|×64 (sum, count) cells, so the shuffle
    // is O(labels × dim) regardless of corpus size — the right 100 TB
    // shape. Output one row per (label, dim) with the mean rounded to
    // 6 dp (float-sum order differs across engines below the ulp).
    QueryDef("l3_centroid", (s, dir) => {
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("pos", col("pos") + lit(1))
        .groupBy(col("label"), col("pos"))
        .agg(expr("round((avg(CAST(x AS DOUBLE)))*1000000)/1000000").as("c"),
          count(lit(1)).as("n"))
        .orderBy(col("label").asc_nulls_last, col("pos").asc_nulls_last)
    }, Some(
      """SELECT label, CAST(pos AS INTEGER) AS pos,
                (round((avg(CAST(x AS DOUBLE)))*1000000)/1000000) AS c,
                CAST(count(*) AS BIGINT) AS n
         FROM (SELECT label,
                      unnest(embedding) AS x,
                      unnest(range(1, len(embedding) + 1)) AS pos
               FROM embeddings)
         GROUP BY label, pos
         ORDER BY label ASC NULLS LAST, pos ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (f)
    // Cluster-level dedup decision: MinHash-LSH near-dup pairs →
    // connected components → one row per duplicate GROUP with its keep
    // representative (min doc id) and members. Rows-only (iterative
    // label propagation isn't SQL-expressible); component/pair
    // consistency is property-tested in DedupSpec.
    QueryDef("l2_dedup_groups", (s, dir) => {
      val pairs = Dedup.minHashNearDups(
        corpusWithDups(s, dir), "doc_id", "text", threshold = 0.8)
      Dedup.connectedComponents(pairs)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          concat_ws(",", array_sort(collect_list(col("id")))).as("members"))
        .orderBy(col("component").asc_nulls_last)
    }, None),

    // ------------------------------------------------------------- L4 (g)
    // BPE-ish token counting (builder prompt: "whitespace + a BPE-ish
    // regex"): per-language corpus totals under BOTH tokenizations. The
    // extraction regex is lookaround-free so Java regex (Spark) and RE2
    // (DuckDB) agree symbol for symbol. Map-only + one small agg.
    QueryDef("l4_token_count", (s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"),
          size(split(col("text"), " ")).as("ws_tokens"),
          TextFunctions.tokenCount(col("text")).as("bpe_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("total_ws"),
          sum(col("bpe_tokens")).as("total_bpe"),
          expr("round((avg(bpe_tokens))*10000)/10000").as("avg_bpe"))
        .orderBy(col("lang").asc_nulls_last)
    }, Some(
      """SELECT lang, count(*) AS n_docs,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws,
                CAST(sum(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS total_bpe,
                (round((avg(len(regexp_extract_all(text, '\w+|[^\w\s]'))))*10000)/10000) AS avg_bpe
         FROM documents GROUP BY lang ORDER BY lang ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (f)
    // TF-IDF top terms per document — the classic relevance weighting a
    // curation pipeline uses for keyword extraction / topic balance.
    // Pure joins + aggs: tf per (doc, term), df per term, the corpus size
    // as a lazy 1-row cross join (never a driver action), ln rounded to 6
    // decimals for engine parity (HANDOFF rule 6). At 100 TB every stage
    // is a keyed shuffle; the df table is tiny (|vocab|) and broadcasts.
    QueryDef("l4_tfidf", (s, dir) => {
      val docs = t(s, dir, "documents")
      val terms = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      // document frequency FROM tf (one row per (doc, term) already):
      // count(*) ≡ count(DISTINCT doc_id) over raw terms. Both the df
      // branch and the probe side hang off the SAME (doc_id, term)
      // shuffle, which ReuseExchange dedups — the corpus scan+explode
      // (the dominant cost at 100 TB) runs ONCE, vs the old shape's
      // second explode + distinct-aggregate.
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      tf.join(broadcast(df), "term")
        .crossJoin(broadcast(n))
        .withColumn("score",
          expr("round((tf * ln((n_docs + 1) / (df + 1.0)))*1000000)/1000000"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("score"))
        .orderBy(col("doc_id").asc_nulls_last, col("rk").asc_nulls_last)
    }, Some(
      """WITH terms AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         df AS (
           SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term,
                  (round((tf.tf * ln((n.n_docs + 1) / (df.df + 1.0)))*1000000)/1000000) AS score
           FROM tf JOIN df USING (term) CROSS JOIN n),
         ranked AS (
           SELECT doc_id, term, score,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term ASC) AS rk
           FROM scored)
         SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, score
         FROM ranked WHERE rk <= 3
         ORDER BY doc_id ASC NULLS LAST, rk ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (t)
    // TEXTRANK keyword extraction (Mihalcea & Tarau 2004): PageRank over
    // the word CO-OCCURRENCE graph — the graph-centrality alternative to
    // tf-idf (frequency) and RAKE (degree/freq): a word matters when it
    // neighbors words that matter. Edges = distinct adjacent-word pairs
    // (window 2) from ONE lead() pass per document — a single doc-keyed
    // window shuffle, never a token self-join; the graph then collapses
    // to the VOCABULARY (tiny vs the corpus — the p_name lesson), and
    // three damped supersteps run in g1's scaled-BIGINT floor-div
    // lattice, so the iteration is bit-exact vs the unrolled-CTE oracle.
    // At 100 TB: tokenize+lead is the only corpus pass; the supersteps
    // iterate a vocab-sized frame.
    QueryDef("l4_textrank", (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("p", "w")))
      val adj = toks
        .withColumn("w2", lead(col("w"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("p"))))
        .filter(col("w2").isNotNull && col("w") =!= col("w2"))
      val pairs = adj
        .select(least(col("w"), col("w2")).as("a"),
          greatest(col("w"), col("w2")).as("b"))
        .distinct()
        .localCheckpoint(false)
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(false)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .localCheckpoint(false)
      val nf = broadcast(deg.agg(count(lit(1)).as("n")))
      var ranks = deg.crossJoin(nf)
        .select(col("src").as("node"), expr("1000000000000 div n").as("pr"))
        .localCheckpoint(false)
      for (_ <- 1 to 3) {
        ranks = edges
          .join(ranks, edges("src") === ranks("node"))
          .join(deg, Seq("src"))
          .select(col("dst"), expr("pr div d").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
          .crossJoin(nf)
          .select(col("dst").as("node"),
            expr("150000000000 div n + (sc * 85) div 100").as("pr"))
          .localCheckpoint(false)
      }
      ranks.select(col("node").as("word"), col("pr"))
        .orderBy(col("pr").desc, col("word").asc).limit(10)
    }, Some(
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         toks AS (
           SELECT doc_id, unnest(generate_series(1, len(l), 1)) AS p, l
           FROM d),
         t2 AS (SELECT doc_id, p, l[p] AS w FROM toks),
         adj AS (
           SELECT w, lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
           FROM t2),
         pairs AS (
           SELECT DISTINCT least(w, w2) AS a, greatest(w, w2) AS b
           FROM adj WHERE w2 IS NOT NULL AND w <> w2),
         edges AS (
           SELECT a AS src, b AS dst FROM pairs
           UNION ALL SELECT b AS src, a AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         nn AS (SELECT count(*) AS n FROM deg),
         r0 AS (SELECT src AS node, 1000000000000 // (SELECT n FROM nn) AS pr
                FROM deg),
         r1 AS (SELECT e.dst AS node,
                       150000000000 // (SELECT n FROM nn)
                         + (sum(r.pr // dg.d) * 85) // 100 AS pr
                FROM edges e JOIN r0 r ON e.src = r.node
                     JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst),
         r2 AS (SELECT e.dst AS node,
                       150000000000 // (SELECT n FROM nn)
                         + (sum(r.pr // dg.d) * 85) // 100 AS pr
                FROM edges e JOIN r1 r ON e.src = r.node
                     JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst),
         r3 AS (SELECT e.dst AS node,
                       150000000000 // (SELECT n FROM nn)
                         + (sum(r.pr // dg.d) * 85) // 100 AS pr
                FROM edges e JOIN r2 r ON e.src = r.node
                     JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst)
         SELECT node AS word, CAST(pr AS BIGINT) AS pr FROM r3
         ORDER BY pr DESC, word ASC LIMIT 10""")),

    // ------------------------------------------------------------- L4 (h)
    // Heavy hitters — corpus-wide frequent tokens via approx_top_k
    // (DataSketches frequent-items, Spark 4.1 builtin). THE scale path
    // for "top terms over 100 TB": a constant-memory mergeable sketch
    // per partition + a single-row merge, vs l4_ngram_freq's full
    // (term → count) shuffle whose reduce side is O(vocab). At fixture
    // scale the vocab (31 tokens) is far below the 1024 tracked slots,
    // so the sketch is provably exact (frequent-items sketches have zero
    // error until the map overflows) — which is why this sketch query
    // can sit under the hard hash oracle, unlike a3/a13. k=40 > vocab so
    // the sketch returns every token and the top-20 cutoff is pinned by
    // the explicit (n DESC, tok ASC) sort, not sketch-internal tie order.
    QueryDef("l4_heavy_hitters", (s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
        .filter(col("tok") =!= "")
        .agg(expr("approx_top_k(tok, 40, 1024)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("tok"), col("e.count").as("n"))
        .orderBy(col("n").desc_nulls_last, col("tok").asc_nulls_last)
        .limit(20)
    }, Some(
      """SELECT tok, CAST(count(*) AS BIGINT) AS n
         FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
               FROM documents)
         WHERE tok <> ''
         GROUP BY tok
         ORDER BY n DESC NULLS LAST, tok ASC NULLS LAST
         LIMIT 20""")),

    // ------------------------------------------------------------- L4 (i)
    // BM25 relevance scoring (Robertson/Sparck-Jones, the Okapi form) for
    // a fixed query against the corpus — the standard retrieval scorer a
    // curation pipeline uses for query-targeted subset selection. Same
    // scale shape as TF-IDF: doc-length and tf are keyed aggs over the
    // exploded terms, df/N/avgdl are tiny one-row or |vocab|-row
    // broadcasts, the scoring join never shuffles the big side twice.
    // Per-term scores round to 6 dp before the sum (ln parity, HANDOFF
    // rule 6); the summed score rounds to 4 dp.
    QueryDef("l4_bm25", (s, dir) => {
      val k1 = 1.2; val b = 0.75
      val docs = t(s, dir, "documents")
      val terms = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val qt = terms.filter(col("term").isin("join", "hash", "scan"))
      val tf = qt.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfT = qt.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
      tf.join(dl, "doc_id")
        .join(broadcast(dfT), "term")
        .crossJoin(broadcast(n))
        .crossJoin(broadcast(avgdl))
        .withColumn("score", expr(
          s"""round((ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                 * tf * ($k1 + 1)
                 / (tf + $k1 * (1 - $b + $b * dl / avgdl)))*1000000)/1000000"""))
        .groupBy(col("doc_id"))
        .agg(expr("round((sum(score))*10000)/10000").as("bm25"),
          count(lit(1)).as("n_terms"))
        .orderBy(col("bm25").desc_nulls_last, col("doc_id").asc_nulls_last)
        .limit(100)
    }, Some(
      """WITH terms AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
         qt AS (SELECT * FROM terms WHERE term IN ('join', 'hash', 'scan')),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2),
         df AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         a AS (SELECT avg(dl) AS avgdl FROM dl),
         scored AS (
           SELECT tf.doc_id,
                  (round((ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                      * tf.tf * (1.2 + 1)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / a.avgdl)))*1000000)/1000000) AS score
           FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
                CROSS JOIN n CROSS JOIN a)
         SELECT doc_id, (round((sum(score))*10000)/10000) AS bm25,
                CAST(count(*) AS BIGINT) AS n_terms
         FROM scored GROUP BY doc_id
         ORDER BY bm25 DESC NULLS LAST, doc_id ASC NULLS LAST
         LIMIT 100""")),

    // ------------------------------------------------------------- L5 (b)
    // Document chunking: fixed 200-char windows on a 150-char stride
    // (overlapping chunks with stable ids) — the standard pre-embedding
    // splitter in a training/RAG pipeline. One generator per doc row
    // (sequence + explode), no shuffle until the output sort; at 100 TB
    // chunking is map-only.
    // ------------------------------------------------------------- L5 (n)
    // CORPUS-LEVEL LINE DEDUP WITH REASSEMBLY — the C4/RefinedWeb step
    // that exact-doc dedup (l1) misses: boilerplate SEGMENTS repeating
    // across documents (nav bars, license headers) are removed from
    // every document but their FIRST occurrence (global keep-first by
    // (doc_id, position) — deterministic, so the oracle is hash-exact),
    // and each document is REASSEMBLED from its surviving segments in
    // original order. Segments here are fixed 8-word windows (the
    // fixture has no line breaks; swap the segmenter for split('\n')
    // on real text — everything downstream is unchanged). Plan shape
    // at 100 TB: one explode, ONE shuffle keyed on segment text for the
    // keep-first window (content cardinality ≈ corpus, no hot keys),
    // one doc-keyed agg to rebuild — never all-pairs, never a sort of
    // the corpus. Output: per-doc before/after segment census + md5 of
    // the rebuilt text (the oracle proves byte-exact reassembly).
    QueryDef("l5_line_dedup", (s, dir) => {
      val segs = t(s, dir, "documents")
        .select(col("doc_id"), expr("split(text, ' ')").as("w"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, CAST(ceil(size(w) / 8.0D) AS INT) - 1),
             i -> named_struct('i', i,
                  's', array_join(slice(w, i * 8 + 1, 8), ' ')))"""))
          .as("seg"))
        .select(col("doc_id"), col("seg.i").as("seg_idx"),
          col("seg.s").as("seg_text"))
      val w = Window.partitionBy(col("seg_text"))
        .orderBy(col("doc_id").asc, col("seg_idx").asc)
      segs.withColumn("kept", row_number().over(w) === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs_before"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_segs_after"),
          md5(expr(
            """coalesce(array_join(transform(array_sort(
                 collect_list(CASE WHEN kept
                   THEN named_struct('i', seg_idx, 's', seg_text) END)),
                 x -> x.s), ' '), '')""")).as("rebuilt_md5"))
        .filter(col("doc_id") < 30)
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH wl AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         segs AS (
           SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
                  array_to_string(list_slice(w, i*8 + 1, i*8 + 8), ' ')
                    AS seg_text
           FROM (SELECT doc_id, w,
                        unnest(range(0, CAST(ceil(len(w) / 8.0)
                          AS BIGINT))) AS i
                 FROM wl)),
         flag AS (
           SELECT doc_id, seg_idx, seg_text,
                  (row_number() OVER (PARTITION BY seg_text
                     ORDER BY doc_id, seg_idx) = 1) AS kept
           FROM segs)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs_before,
                CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_segs_after,
                md5(coalesce(string_agg(CASE WHEN kept THEN seg_text END,
                  ' ' ORDER BY seg_idx), '')) AS rebuilt_md5
         FROM flag
         WHERE doc_id < 30
         GROUP BY 1 ORDER BY doc_id ASC NULLS LAST""")),

    QueryDef("l5_chunking", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(
          expr("transform(sequence(1, length(text), 150), p -> substr(text, p, 200))"))
          .as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx"),
          length(col("chunk")).as("chunk_len"),
          md5(col("chunk").cast("binary")).as("chunk_md5"))
        .orderBy(col("doc_id").asc_nulls_last, col("chunk_idx").asc_nulls_last)
    }, Some(
      """WITH c AS (
           SELECT doc_id, text,
                  unnest(generate_series(1, length(text), 150)) AS p
           FROM documents)
         SELECT doc_id, CAST((p - 1) / 150 AS INTEGER) AS chunk_idx,
                CAST(length(substr(text, CAST(p AS INTEGER), 200)) AS INTEGER) AS chunk_len,
                md5(substr(text, CAST(p AS INTEGER), 200)) AS chunk_md5
         FROM c
         ORDER BY doc_id ASC NULLS LAST, chunk_idx ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (d)
    // Training-mix assembly under a token budget: per language, keep
    // documents in a deterministic content-independent order (md5 of the
    // doc id — an unbiased engine-portable shuffle) until the cumulative
    // token count reaches the language's budget. This is the data-mix
    // step that turns a filtered corpus into a training set with chosen
    // language proportions. One window pass per language partition; at
    // 100 TB the same shape runs per (lang, shard) with per-shard budget
    // allocation so no single partition sorts the whole language.
    QueryDef("l5_training_mix", (s, dir) => {
      val budget = 4000L
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("h").asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).as("toks"),
          md5(col("doc_id").cast("string").cast("binary")).as("h"))
        .withColumn("cum", sum(col("toks")).over(w))
        // a doc is taken if its PREDECESSORS left budget headroom — the
        // standard greedy knapsack cut, deterministic given the order
        .filter(col("cum") - col("toks") < budget)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .orderBy(col("lang").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT lang, doc_id, len(string_split(text, ' ')) AS toks,
                  md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (
           SELECT *, sum(toks) OVER (PARTITION BY lang
                       ORDER BY h ASC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM d)
         SELECT lang, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
         FROM c WHERE cum - toks < 4000
         GROUP BY lang ORDER BY lang ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (g)
    // Temperature-based multilingual sampling (the XLM-R / mT5 mix
    // recipe, alpha = 0.3): each language's sampling probability is its
    // token share raised to alpha and renormalized — upsampling the tail
    // languages, flattening the head — and `epochs` is how many times a
    // language's data is traversed under a fixed token budget. All the
    // heavy work is ONE map-side-combined per-language aggregate; the
    // temperature arithmetic runs over the tiny language frame (window
    // sums over ≤ tens of rows). The only transcendental (pow) is
    // pre-rounded to 6dp so the renormalization is engine-portable.
    QueryDef("l5_temperature_mix", (s, dir) => {
      val all = Window.partitionBy(lit(1))
      t(s, dir, "documents")
        .select(col("lang"), size(split(col("text"), " ")).as("toks"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .withColumn("tot", sum(col("n_tokens")).over(all))
        .withColumn("pwv",
          round(pow(col("n_tokens").cast("double") / col("tot").cast("double"),
            0.3) * 1000000) / 1000000)
        .withColumn("psum", sum(col("pwv")).over(all))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          (round((col("n_tokens").cast("double") / col("tot").cast("double"))
            * 1000000) / 1000000).as("share"),
          (round((col("pwv") / col("psum")) * 1000000) / 1000000).as("p_temp"),
          (round(((round((col("pwv") / col("psum")) * 1000000) / 1000000)
            * 1000000 / col("n_tokens").cast("double")) * 10000) / 10000)
            .as("epochs"))
        .orderBy(col("lang").asc_nulls_last)
    }, Some(
      """WITH st AS (
           SELECT lang, count(*) AS n_docs,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         tt AS (SELECT *, sum(n_tokens) OVER () AS tot FROM st),
         pw AS (SELECT *,
                  (round((pow(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE),
                    0.3))*1000000)/1000000) AS pwv
                FROM tt),
         ps AS (SELECT *, sum(pwv) OVER () AS psum FROM pw)
         SELECT lang, n_docs, n_tokens,
                (round((CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE))*1000000)/1000000)
                  AS share,
                (round((pwv / psum)*1000000)/1000000) AS p_temp,
                (round(((round((pwv / psum)*1000000)/1000000)
                  * 1000000 / CAST(n_tokens AS DOUBLE))*10000)/10000) AS epochs
         FROM ps ORDER BY lang ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (e)
    // Sequence packing (the GPT-pretraining concatenate-and-split step):
    // documents stream in a deterministic order, token counts cumulate,
    // and each doc lands in packed sequence floor(preceding_tokens / L)
    // — fixed-length training sequences with no padding waste between
    // docs. Sharded BY LANGUAGE: one window per shard, shards pack in
    // parallel; at 100 TB the same shape runs per (lang, shard-hash) so
    // no single partition orders a whole language. The per-sequence
    // fill report is the packing QA artifact.
    QueryDef("l5_sequence_pack", (s, dir) => {
      val seqLen = 512
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("seq_id",
          floor((col("cum") - col("n_tokens")) / seqLen))
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("seq_tokens"))
        .orderBy(col("lang").asc_nulls_last, col("seq_id").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
         c AS (
           SELECT *, sum(n_tokens) OVER (PARTITION BY lang
                       ORDER BY doc_id ASC) AS cum
           FROM d)
         SELECT lang, CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_id,
                count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
         FROM c GROUP BY lang, seq_id
         ORDER BY lang ASC NULLS LAST, seq_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (f)
    // Deterministic global shuffle + sharding (the last step before
    // training): every doc gets a content-independent pseudo-random key
    // (keyed md5 of its id — reshuffling = changing the seed string), a
    // shard from the key's first hex digit, and a within-shard position
    // from the full key order. This is a seeded permutation of the corpus
    // with NO global sort: at 100 TB shards are written with
    // repartition(shard) + sortWithinPartitions(key) — each shard orders
    // only its own slice, shard count scales with the data. The per-shard
    // report (count, bytes, md5 of the exact doc order) is the QA
    // artifact that makes the permutation reproducible across engines;
    // the ordered-concat agg is per-shard bounded at test SF and becomes
    // the shard file write at scale.
    QueryDef("l5_global_shuffle", (s, dir) => {
      val nShards = 8
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          md5(concat(lit("shuf42:"), col("doc_id").cast("string")).cast("binary")).as("h"))
        .withColumn("shard",
          ((expr("instr('0123456789abcdef', substring(h, 1, 1))") - 1) % nShards)
            .cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("shard_chars"),
          md5(array_join(
            transform(array_sort(collect_list(struct(col("h"), col("doc_id")))),
              x => x.getField("doc_id").cast("string")), ",").cast("binary"))
            .as("order_md5"))
        .orderBy(col("shard").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT doc_id, n_chars,
                  md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         s AS (
           SELECT *, CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) % 8
                     AS BIGINT) AS shard
           FROM d)
         SELECT shard, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS shard_chars,
                md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY h ASC, doc_id ASC))
                  AS order_md5
         FROM s GROUP BY shard ORDER BY shard ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (c)
    // PII redaction: emails and phone-shaped tokens replaced with typed
    // placeholders, with per-doc redaction counts. The fixtures carry no
    // PII, so the query plants a deterministic contaminated header per
    // doc (same expression in both engines) and then scrubs it — the
    // assertable property is that redaction is exact and count-correct.
    // Map-only at any scale.
    QueryDef("l5_pii_redact", (s, dir) => {
      val email = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
      val phone = "555-[0-9]{4}"
      t(s, dir, "documents")
        .withColumn("dirty",
          concat(lit("contact user"), col("doc_id"), lit("@corp.example.com or 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now. "),
            col("text")))
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(dirty, '$email', 0)")).as("n_emails"),
          size(expr(s"regexp_extract_all(dirty, '$phone', 0)")).as("n_phones"),
          md5(regexp_replace(regexp_replace(col("dirty"), email, "<EMAIL>"),
            phone, "<PHONE>").cast("binary")).as("clean_md5"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT doc_id,
                  concat('contact user', doc_id, '@corp.example.com or 555-',
                         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' now. ',
                         text) AS dirty
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(dirty, '[a-z0-9.]+@[a-z0-9.]+[a-z]')) AS INTEGER) AS n_emails,
                CAST(len(regexp_extract_all(dirty, '555-[0-9]{4}')) AS INTEGER) AS n_phones,
                md5(regexp_replace(regexp_replace(dirty, '[a-z0-9.]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
                    '555-[0-9]{4}', '<PHONE>', 'g')) AS clean_md5
         FROM d ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------------- L5
    // Text normalization chain: lower → collapse whitespace → trim, plus
    // the content-address (md5) of the normalized text and a 5-token head.
    QueryDef("l5_text_normalize", (s, dir) => {
      t(s, dir, "documents")
        .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .select(col("doc_id"),
          md5(col("norm").cast("binary")).as("norm_md5"),
          array_join(slice(split(col("norm"), " "), 1, 5), " ").as("head5"),
          length(col("norm")).as("norm_len"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """SELECT doc_id,
                md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_md5,
                array_to_string((string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))[1:5], ' ') AS head5,
                CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS INTEGER) AS norm_len
         FROM documents ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (f)
    // Deterministic train/val/test split: membership is a pure function of
    // a salted content-key hash (md5 band on the first two hex chars —
    // 13/256 ≈ 5.1% test, 5.1% val, the rest train), NOT of rand() — so
    // the split is reproducible run-to-run, stable under re-partitioning,
    // needs no seed synchronization across 1000 executors, and any row's
    // assignment can be re-derived for audit. Map-only assignment at any
    // scale; the per-(source, split) census is the only shuffle.
    QueryDef("l5_train_split", (s, dir) => {
      val h2 = substring(
        md5(concat(lit("split42:"), col("doc_id").cast("string"))
          .cast("binary")), 1, 2)
      t(s, dir, "documents")
        .withColumn("split",
          when(h2 < "0d", "test").when(h2 < "1a", "val").otherwise("train"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("source").asc_nulls_last, col("split").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT *, substring(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2
           FROM documents)
         SELECT source,
                CASE WHEN h2 < '0d' THEN 'test'
                     WHEN h2 < '1a' THEN 'val'
                     ELSE 'train' END AS split,
                count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(doc_id) AS first_doc
         FROM d GROUP BY 1, 2
         ORDER BY source ASC NULLS LAST, split ASC NULLS LAST""")),

    // ------------------------------------------------------------------- L6
    // Multimodal join: documents ⋈ embeddings (text + vector modalities of
    // the same entity), aggregated per (lang, label).
    QueryDef("l6_doc_embedding_join", (s, dir) => {
      val d = t(s, dir, "documents")
      val e = emb(s, dir)
      d.join(e, col("doc_id") === col("vec_id"))
        .groupBy(col("lang"), col("label"))
        .agg(count(lit(1)).as("n"),
          expr("round((avg(n_chars))*100)/100").as("avg_chars"),
          expr("round((avg(norm))*10000)/10000").as("avg_norm"))
        .orderBy(col("lang").asc_nulls_last, col("label").asc_nulls_last)
    }, Some(
      """WITH n AS (
           SELECT vec_id, label,
                  sqrt(sum(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                           * CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE))) AS norm
           FROM embeddings CROSS JOIN range(1, 65) r(i)
           GROUP BY vec_id, label)
         SELECT lang, label, count(*) AS n,
                (round((avg(n_chars))*100)/100) AS avg_chars,
                (round((avg(norm))*10000)/10000) AS avg_norm
         FROM documents JOIN n ON doc_id = vec_id
         GROUP BY lang, label
         ORDER BY lang ASC NULLS LAST, label ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (m)
    // MMR diversified re-rank (Carbonell & Goldstein 1998): after
    // retrieval, pick k=4 results greedily maximizing λ·rel(c) −
    // (1−λ)·max_{s∈S} sim(c, s) with λ=0.7 — the standard fix for
    // retrieval sets that are all near-duplicates of each other (RAG
    // context packing, eval-set selection). Engine parity: relevance and
    // candidate-pair similarities pre-round to scaled BIGINTs (×10⁴), so
    // every greedy comparison is INTEGER (score = 7·rel − 3·maxsim; ties
    // pinned by nid) — the unrolled oracle matches bit-for-bit. Scale
    // shape: the greedy loop runs over the per-query TOP-8 candidate
    // frame (retrieval output, k² pair sims per query — never the
    // corpus); candidates and sims are lineage-cut once and every step
    // reuses them: one anti-join + one selected-keyed max + one 8-row
    // window pick per step, all bounded by |queries|·topN.
    QueryDef("l3_mmr_rerank", (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 2)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("embedding").as("ne"),
          col("norm").as("nn"))
      val wRel = Window.partitionBy(col("qid"))
        .orderBy(col("reli").desc, col("nid").asc)
      val cand = q.crossJoin(c)
        .withColumn("reli",
          expr("CAST(round(vec_dot(qe, ne) / (qn * nn) * 10000) AS BIGINT)"))
        .withColumn("rk", row_number().over(wRel))
        .filter(col("rk") <= 8)
        .select(col("qid"), col("nid"), col("reli"), col("ne"), col("nn"))
      // r18: the greedy selection was a 3-round DataFrame loop (self-join
      // sims + per-round max-window + localCheckpoint) over frames of ≤8
      // rows per query — ~30 AQE stage jobs of pure fixed overhead,
      // measured 6.0 s solo at sf0.1. MMR over a top-k candidate set is a
      // per-QUERY fold over O(k²) integers: collect the k candidates per
      // qid into one aggregate row and run the identical integer greedy
      // (pairwise sims = round(vec_dot/(norms)·1e4) with vec_dot's exact
      // left-to-right float→double fold; score = reli·7 − maxsim·3; ties
      // to the lower nid) in a per-row fold — one shuffle, one pass, and
      // at any scale the state is k·dim floats per served query, exactly
      // the serve-path rerank shape. The corpus-sized work (relevance
      // cosines + top-k) stays fully distributed above. Output is
      // bit-identical (same integer arithmetic; oracle-gated).
      val mmrPick = udf((rows: Seq[org.apache.spark.sql.Row]) => {
        val cs = rows.map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Float](2).toArray, r.getDouble(3))).sortBy(_._1).toArray
        def dot(x: Array[Float], y: Array[Float]): Double = {
          val n = math.min(x.length, y.length)
          var acc = 0.0; var i = 0
          while (i < n) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
          acc
        }
        val k = cs.length
        val simi = Array.tabulate(k, k)((i, j) =>
          if (i == j) 0L
          else math.round(dot(cs(i)._3, cs(j)._3) / (cs(i)._4 * cs(j)._4) * 10000))
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
        (1 to math.min(4, k)).foreach { step =>
          var best = -1; var bestScore = 0L
          (0 until k).foreach { i =>
            if (!selected.contains(i)) {
              val score =
                if (step == 1) cs(i)._2 * 7
                else cs(i)._2 * 7 - selected.map(j => simi(i)(j)).max * 3
              // pick max score; ties to the lower nid (cs is nid-sorted,
              // so strict > keeps the earlier = lower nid on ties)
              if (best < 0 || score > bestScore) { best = i; bestScore = score }
            }
          }
          selected += best
          out += ((cs(best)._1, step, bestScore))
        }
        out.toSeq
      })
      cand.groupBy(col("qid"))
        .agg(collect_list(struct(col("nid"), col("reli"), col("ne"),
          col("nn"))).as("cands"))
        .select(col("qid"), explode(mmrPick(col("cands"))).as("pick"))
        .select(col("qid"), col("pick._1").as("nid"),
          col("pick._2").as("step"), col("pick._3").as("score"))
        .orderBy(col("qid").asc_nulls_last, col("step").asc_nulls_last)
    }, Some(
      """WITH rel AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  CAST(round(
                    sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE))
                    / (sqrt(sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)))
                       * sqrt(sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                  * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE))))
                    * 10000) AS BIGINT) AS reli
           FROM embeddings a
           JOIN embeddings b ON a.vec_id < 2 AND b.vec_id >= 10
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2),
         cand AS (
           SELECT qid, nid, reli FROM (
             SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY reli DESC, nid ASC) AS rk FROM rel)
           WHERE rk <= 8),
         sims AS (
           SELECT ca.qid, ca.nid AS a, cb.nid AS b,
                  CAST(round(
                    sum(CAST(ea.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(eb.embedding[CAST(i AS INTEGER)] AS DOUBLE))
                    / (sqrt(sum(CAST(ea.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                * CAST(ea.embedding[CAST(i AS INTEGER)] AS DOUBLE)))
                       * sqrt(sum(CAST(eb.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                  * CAST(eb.embedding[CAST(i AS INTEGER)] AS DOUBLE))))
                    * 10000) AS BIGINT) AS simi
           FROM cand ca
           JOIN cand cb ON ca.qid = cb.qid AND ca.nid <> cb.nid
           JOIN embeddings ea ON ea.vec_id = ca.nid
           JOIN embeddings eb ON eb.vec_id = cb.nid
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2, 3),
         s1 AS (
           SELECT qid, nid, 1 AS step, reli * 7 AS score FROM (
             SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY reli * 7 DESC, nid ASC) AS rk FROM cand)
           WHERE rk = 1),
         st2 AS (
           SELECT qid, nid, 2 AS step, score FROM (
             SELECT qid, nid, score,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY score DESC, nid ASC) AS rk
             FROM (SELECT c.qid, c.nid, 7 * c.reli - 3 * max(si.simi) AS score
                   FROM cand c
                   JOIN sims si ON si.qid = c.qid AND si.a = c.nid
                   JOIN s1 ON s1.qid = c.qid AND si.b = s1.nid
                   WHERE NOT EXISTS (SELECT 1 FROM s1 x
                                     WHERE x.qid = c.qid AND x.nid = c.nid)
                   GROUP BY c.qid, c.nid, c.reli))
           WHERE rk = 1),
         sel2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM st2),
         st3 AS (
           SELECT qid, nid, 3 AS step, score FROM (
             SELECT qid, nid, score,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY score DESC, nid ASC) AS rk
             FROM (SELECT c.qid, c.nid, 7 * c.reli - 3 * max(si.simi) AS score
                   FROM cand c
                   JOIN sims si ON si.qid = c.qid AND si.a = c.nid
                   JOIN sel2 ON sel2.qid = c.qid AND si.b = sel2.nid
                   WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                                     WHERE x.qid = c.qid AND x.nid = c.nid)
                   GROUP BY c.qid, c.nid, c.reli))
           WHERE rk = 1),
         sel3 AS (SELECT * FROM sel2 UNION ALL SELECT * FROM st3),
         st4 AS (
           SELECT qid, nid, 4 AS step, score FROM (
             SELECT qid, nid, score,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY score DESC, nid ASC) AS rk
             FROM (SELECT c.qid, c.nid, 7 * c.reli - 3 * max(si.simi) AS score
                   FROM cand c
                   JOIN sims si ON si.qid = c.qid AND si.a = c.nid
                   JOIN sel3 ON sel3.qid = c.qid AND si.b = sel3.nid
                   WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                                     WHERE x.qid = c.qid AND x.nid = c.nid)
                   GROUP BY c.qid, c.nid, c.reli))
           WHERE rk = 1),
         sel4 AS (SELECT * FROM sel3 UNION ALL SELECT * FROM st4)
         SELECT qid, nid, step, score FROM sel4
         ORDER BY qid ASC NULLS LAST, step ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (k)
    // Reciprocal-rank fusion (Cormack et al.) of two retrievers for the
    // same queries: the full 64-dim cosine ranking fused with a truncated
    // 32-dim ("matryoshka" prefix) ranking — the cheap-projection /
    // full-precision split real retrieval stacks fuse. RRF score =
    // Σ 1/(60 + rank) over the lists that returned the doc (k=60, the
    // paper constant). Parity: ranks are integers, each doc's score is a
    // sum of at most TWO floats (IEEE-commutative — order can't perturb
    // it), rounded to 6dp before the fused ordering. Scale: each
    // retriever is the l3_cosine_topk shape (pair scores → per-query
    // window top-10), the fusion is one (qid, nid)-keyed outer join over
    // two 10-row-per-query frames — fusion cost is O(queries·k), corpus
    // cost stays inside the retrievers.
    QueryDef("l3_rrf_fusion", (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"))
      val c = e.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("nid"), col("embedding").as("ne"),
          col("norm").as("nn"))
      val pairs = q.crossJoin(c)
        .withColumn("sim_full",
          call_function("vec_dot", col("qe"), col("ne"))
            / (col("qn") * col("nn")))
        .withColumn("sim_trunc",
          expr("""aggregate(zip_with(slice(qe, 1, 32), slice(ne, 1, 32),
                    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
                / (sqrt(aggregate(transform(slice(qe, 1, 32),
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
                 * sqrt(aggregate(transform(slice(ne, 1, 32),
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))"""))
      val wf = Window.partitionBy(col("qid"))
        .orderBy(col("sim_full").desc, col("nid").asc)
      val wt = Window.partitionBy(col("qid"))
        .orderBy(col("sim_trunc").desc, col("nid").asc)
      val rf = pairs.withColumn("rk", row_number().over(wf))
        .filter(col("rk") <= 10).select(col("qid"), col("nid"), col("rk"))
      val rt = pairs.withColumn("rk", row_number().over(wt))
        .filter(col("rk") <= 10)
        .select(col("qid").as("tqid"), col("nid").as("tnid"),
          col("rk").as("trk"))
      val wo = Window.partitionBy(col("fq"))
        .orderBy(col("rrf").desc, col("fn").asc)
      rf.join(rt, col("qid") === col("tqid") && col("nid") === col("tnid"),
          "full_outer")
        .select(coalesce(col("qid"), col("tqid")).as("fq"),
          coalesce(col("nid"), col("tnid")).as("fn"),
          (round((coalesce(lit(1.0) / (lit(60) + col("rk")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("trk")), lit(0.0)))
            * 1000000) / 1000000).as("rrf"))
        .withColumn("frk", row_number().over(wo))
        .filter(col("frk") <= 5)
        .select(col("fq").as("qid"), col("frk").as("fused_rank"),
          col("fn").as("nid"), col("rrf"))
        .orderBy(col("qid").asc_nulls_last, col("fused_rank").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS dot,
                  sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qa,
                  sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS qb,
                  sum(CASE WHEN i <= 32
                      THEN CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                           * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      ELSE 0.0 END) AS tdot,
                  sum(CASE WHEN i <= 32
                      THEN CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                           * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      ELSE 0.0 END) AS ta,
                  sum(CASE WHEN i <= 32
                      THEN CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                           * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      ELSE 0.0 END) AS tb
           FROM embeddings a
           JOIN embeddings b ON a.vec_id < 8 AND b.vec_id >= 8
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2),
         rf AS (
           SELECT qid, nid, rk FROM (
             SELECT qid, nid,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY dot / (sqrt(qa) * sqrt(qb)) DESC, nid ASC)
                      AS rk
             FROM d) WHERE rk <= 10),
         rt AS (
           SELECT qid AS tqid, nid AS tnid, rk AS trk FROM (
             SELECT qid, nid,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY tdot / (sqrt(ta) * sqrt(tb)) DESC, nid ASC)
                      AS rk
             FROM d) WHERE rk <= 10),
         fused AS (
           SELECT COALESCE(qid, tqid) AS fq, COALESCE(nid, tnid) AS fn,
                  (round((COALESCE(1.0 / (60 + rk), 0.0)
                        + COALESCE(1.0 / (60 + trk), 0.0))*1000000)/1000000)
                    AS rrf
           FROM rf FULL OUTER JOIN rt ON qid = tqid AND nid = tnid),
         ranked AS (
           SELECT fq, fn, rrf,
                  row_number() OVER (PARTITION BY fq
                    ORDER BY rrf DESC, fn ASC) AS frk
           FROM fused)
         SELECT fq AS qid, CAST(frk AS INTEGER) AS fused_rank, fn AS nid,
                rrf
         FROM ranked WHERE frk <= 5
         ORDER BY qid ASC NULLS LAST, fused_rank ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (l)
    // DSIR-style importance weighting (Xie et al. 2023): score each doc
    // by the mean log-likelihood RATIO between a target-domain unigram LM
    // (here: the English slice) and the raw-corpus LM, both add-one
    // smoothed over the SHARED vocabulary — the data-selection signal
    // that upweights target-looking documents. Same engine-parity recipe
    // as l4_perplexity: both LMs are one token-frequency aggregate, the
    // corpus scalars ride a broadcast 1-row frame, scoring is a
    // token-keyed join + per-doc avg rounded to 6dp. At 100 TB the
    // target LM trains on the (small) target slice, the raw LM partials
    // map-side, and the per-token log-ratio table broadcasts into a
    // map-only scoring pass.
    QueryDef("l4_dsir", (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
      val rawF = toks.groupBy(col("tok")).agg(count(lit(1)).as("rf"))
      val tgtF = toks.filter(col("lang") === "en")
        .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      val corpus = broadcast(toks.agg(
        count(lit(1)).as("n_raw"),
        countDistinct(col("tok")).as("v_size"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_tgt")))
      val scored = toks
        .join(rawF, "tok")
        .join(tgtF, Seq("tok"), "left")
        .crossJoin(corpus)
        .groupBy(col("doc_id"), col("lang"))
        .agg((round(avg(
          log((coalesce(col("tf"), lit(0L)) + lit(1.0))
            / (col("n_tgt") + col("v_size")))
            - log((col("rf") + lit(1.0)) / (col("n_raw") + col("v_size"))))
          * 1000000) / 1000000).as("dsir_score"))
      scored
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (round(avg(col("dsir_score"))*10000)/10000).as("avg_score"),
          min(col("dsir_score")).as("min_score"),
          max(col("dsir_score")).as("max_score"),
          sum(when(col("dsir_score") > 0, 1L).otherwise(0L)).as("n_selected"))
        .orderBy(col("lang").asc_nulls_last)
    }, Some(
      """WITH t AS (
           SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         rawf AS (SELECT tok, count(*) AS rf FROM t GROUP BY 1),
         tgtf AS (SELECT tok, count(*) AS tf FROM t WHERE lang = 'en'
                  GROUP BY 1),
         c AS (SELECT count(*) AS n_raw, count(DISTINCT tok) AS v_size,
                      CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tgt
               FROM t),
         s AS (
           SELECT doc_id, lang,
                  (round((avg(ln((COALESCE(tf, 0) + 1.0)
                                 / (n_tgt + v_size))
                             - ln((rf + 1.0) / (n_raw + v_size))))
                    *1000000)/1000000) AS dsir_score
           FROM t
           JOIN rawf USING (tok)
           LEFT JOIN tgtf USING (tok)
           CROSS JOIN c
           GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
                (round((avg(dsir_score))*10000)/10000) AS avg_score,
                min(dsir_score) AS min_score,
                max(dsir_score) AS max_score,
                CAST(sum(CASE WHEN dsir_score > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_selected
         FROM s GROUP BY lang
         ORDER BY lang ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (h)
    // Length-bucketed batching — the dynamic-padding efficiency move:
    // batches of 8 padded to their longest member waste
    // 8·max(len)−Σlen tokens, so sorting docs by length BEFORE batching
    // (within each source shard) collapses the per-batch spread. The
    // query builds both batchings — arrival order vs length order, each
    // ONE window pass over the same per-source sort key space — and
    // reports the padding bill per strategy plus the savings ratio
    // (integer token counts; the only division is the final rounded
    // ratio). At 100 TB this runs per shard, embarrassingly parallel,
    // and the savings ratio is the number that justifies the sort.
    QueryDef("l5_length_buckets", (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).as("len").cast("long"))
      val wNaive = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      val wSorted = Window.partitionBy(col("source"))
        .orderBy(col("len").asc, col("doc_id").asc)
      def pad(df: org.apache.spark.sql.DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
          out: String) =
        df.withColumn("b", ((row_number().over(w) - 1) / 8).cast("long"))
          .groupBy(col("source"), col("b"))
          .agg((max(col("len")) * count(lit(1)) - sum(col("len"))).as("p"))
          .groupBy(col("source"))
          .agg(sum(col("p")).as(out))
      val naive = pad(toks, wNaive, "naive_pad")
      val sorted = pad(toks, wSorted, "sorted_pad")
      val totals = toks.groupBy(col("source"))
        .agg(sum(col("len")).as("total_tokens"))
      totals.join(naive, Seq("source")).join(sorted, Seq("source"))
        .select(col("source"), col("total_tokens"),
          col("naive_pad"), col("sorted_pad"),
          (round((lit(1.0) - col("sorted_pad").cast("double")
            / col("naive_pad").cast("double")) * 10000) / 10000)
            .as("savings"))
        .orderBy(col("source").asc_nulls_last)
    }, Some(
      """WITH toks AS (
           SELECT source, doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS len
           FROM documents),
         naive AS (
           SELECT source, CAST(sum(p) AS BIGINT) AS naive_pad FROM (
             SELECT source,
                    CAST(max(len) * count(*) - sum(len) AS BIGINT) AS p
             FROM (SELECT source, len,
                          (row_number() OVER (PARTITION BY source
                             ORDER BY doc_id ASC) - 1) // 8 AS b
                   FROM toks)
             GROUP BY source, b)
           GROUP BY source),
         srt AS (
           SELECT source, CAST(sum(p) AS BIGINT) AS sorted_pad FROM (
             SELECT source,
                    CAST(max(len) * count(*) - sum(len) AS BIGINT) AS p
             FROM (SELECT source, len,
                          (row_number() OVER (PARTITION BY source
                             ORDER BY len ASC, doc_id ASC) - 1) // 8 AS b
                   FROM toks)
             GROUP BY source, b)
           GROUP BY source),
         tot AS (SELECT source, CAST(sum(len) AS BIGINT) AS total_tokens
                 FROM toks GROUP BY source)
         SELECT source, total_tokens, naive_pad, sorted_pad,
                (round((1.0 - CAST(sorted_pad AS DOUBLE)
                  / CAST(naive_pad AS DOUBLE))*10000)/10000) AS savings
         FROM tot JOIN naive USING (source) JOIN srt USING (source)
         ORDER BY source ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (o)
    // Corpus novelty curve — the diminishing-returns diagnostic for data
    // collection: in doc_id (ingestion) order, what fraction of each
    // slice's 3-gram shingles has never appeared in any earlier doc?
    // first-occurrence attribution is ONE gram-keyed min aggregate (the
    // same shuffle key the dedup family uses) joined back to the gram
    // list; the per-slice census is integer counts + one rounded ratio.
    // A flattening curve says new data is mostly repetition — the
    // measurement behind dataset-scaling decisions. At 100 TB the gram
    // space shards by hash; the first-seen map is exactly the structure
    // incremental dedup (l2_incremental_dedup) maintains across batches.
    QueryDef("l4_novelty", (s, dir) => {
      val grams = TextFunctions.shingleSets(
        t(s, dir, "documents"), "doc_id", "text")
      val first = grams.groupBy(col("shingle"))
        .agg(min(col("doc_id")).as("first_doc"))
      grams.join(first, Seq("shingle"))
        .groupBy((col("doc_id") / 100).cast("long").as("slice"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"),
          (round((sum(when(col("first_doc") === col("doc_id"), 1L)
            .otherwise(0L)).cast("double") / count(lit(1)).cast("double"))
            * 10000) / 10000).as("novelty"))
        .orderBy(col("slice").asc_nulls_last)
    }, Some(
      """WITH sets AS (
           SELECT DISTINCT doc_id, shingle FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                           i -> string_split(text,' ')[i] || ' ' ||
                                string_split(text,' ')[i+1] || ' ' ||
                                string_split(text,' ')[i+2])
                    ELSE [] END) AS shingle
             FROM documents)),
         first AS (
           SELECT shingle, min(doc_id) AS first_doc
           FROM sets GROUP BY 1)
         SELECT CAST(doc_id // 100 AS BIGINT) AS slice,
                count(*) AS n_grams,
                CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel,
                (round((CAST(sum(CASE WHEN first_doc = doc_id
                           THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE))*10000)/10000) AS novelty
         FROM sets JOIN first USING (shingle)
         GROUP BY 1
         ORDER BY slice ASC NULLS LAST""")),

    // ------------------------------------------------------------- L6 (b)
    // Interleaved multimodal sequence packing — the vision-language
    // training assembly step: each document contributes its TEXT tokens
    // plus its image's ViT patch tokens (m4's geometry over typed
    // metadata — no pixel decode) plus two separator tokens, and
    // documents pack greedily into 2048-token context windows per source
    // shard via the l5_sequence_pack window-cumsum (shards pack in
    // parallel at 100 TB; all arithmetic integer-exact). The per-sequence
    // report splits the budget into text vs image tokens — the mix
    // statistic a multimodal data pipeline monitors.
    QueryDef("l6_mm_pack", (s, dir) => {
      val ctx = 2048
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).as("text_toks"),
          length(col("text").cast("binary")).as("n_bytes"))
        .withColumn("w", expr("CAST(64 + n_bytes % 100 AS INT)"))
        .withColumn("h", expr("CAST(48 + n_bytes % 77 AS INT)"))
        .withColumn("img_toks",
          expr("CAST(((w + 15) div 16) * ((h + 15) div 16) AS INT)"))
        .withColumn("toks", col("text_toks") + col("img_toks") + 2)
        .withColumn("cum", sum(col("toks")).over(w))
        .withColumn("seq_id", floor((col("cum") - col("toks")) / ctx))
        .groupBy(col("source"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("text_toks")).as("text_tokens"),
          sum(col("img_toks")).as("image_tokens"),
          sum(col("toks")).as("seq_tokens"))
        .orderBy(col("source").asc_nulls_last, col("seq_id").asc_nulls_last)
    }, Some(
      """WITH d AS (
           SELECT source, doc_id,
                  len(string_split(text, ' ')) AS text_toks,
                  CAST(64 + octet_length(encode(text)) % 100 AS INTEGER) AS w,
                  CAST(48 + octet_length(encode(text)) % 77 AS INTEGER) AS h
           FROM documents),
         t AS (
           SELECT source, doc_id, text_toks,
                  CAST(((w + 15) // 16) * ((h + 15) // 16) AS INTEGER)
                    AS img_toks,
                  text_toks + CAST(((w + 15) // 16) * ((h + 15) // 16)
                    AS INTEGER) + 2 AS toks
           FROM d),
         c AS (
           SELECT *, sum(toks) OVER (PARTITION BY source
                       ORDER BY doc_id ASC) AS cum
           FROM t)
         SELECT source, CAST(floor((cum - toks) / 2048) AS BIGINT) AS seq_id,
                count(*) AS n_docs,
                CAST(sum(text_toks) AS BIGINT) AS text_tokens,
                CAST(sum(img_toks) AS BIGINT) AS image_tokens,
                CAST(sum(toks) AS BIGINT) AS seq_tokens
         FROM c GROUP BY source, seq_id
         ORDER BY source ASC NULLS LAST, seq_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (k)
    // Scalar-quantized (int8) similarity — the memory-compression path a
    // serving tier runs before exact re-rank: each vector quantizes to
    // per-vector-scaled int8 codes (64 B vs 256 B float32 — 4× smaller,
    // SIMD-friendly integer dots), and cosine over the QUANTIZED codes is
    // scale-invariant (the per-vector scale cancels), so ranking needs
    // only integer sums + one sqrt. All sums are integer-exact (|q| ≤ 127,
    // dim 64 → well under 2^53), so Spark and DuckDB agree bit-for-bit on
    // dot/norm products — the whole query is oracle-gated, unlike the
    // float-sum paths that need rounding tolerance. At 100 TB the codes
    // column replaces the float vectors in the candidate-generation scan;
    // exact vectors are fetched only for the final top-k re-rank.
    QueryDef("l3_ann_sq8", (s, dir) => {
      val e = t(s, dir, "embeddings")
      val qv = e
        .withColumn("scale",
          expr("aggregate(embedding, CAST(0 AS DOUBLE), " +
            "(m, y) -> greatest(m, abs(CAST(y AS DOUBLE)))) / 127.0"))
        .withColumn("q",
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT))"))
        .withColumn("q2",
          expr("aggregate(transform(q, x -> x * x), 0L, (a, v) -> a + v)"))
      val qs = qv.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("q").as("qa"), col("q2").as("qa2"))
      val cs = qv.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("q").as("qb"), col("q2").as("qb2"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      qs.crossJoin(cs)
        .withColumn("dotq",
          expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (a, v) -> a + v)"))
        .withColumn("sim",
          col("dotq") / sqrt((col("qa2") * col("qb2")).cast("double")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, Some(
      """WITH sc AS (
           SELECT vec_id, embedding,
                  list_max(list_transform(embedding,
                    y -> abs(CAST(y AS DOUBLE)))) / 127.0 AS scale
           FROM embeddings),
         qv AS (
           SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)) AS q
           FROM sc),
         n AS (
           SELECT vec_id, q,
                  list_aggregate(list_transform(q, x -> x * x), 'sum') AS q2
           FROM qv),
         d AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  sum(a.q[CAST(i AS INTEGER)] * b.q[CAST(i AS INTEGER)]) AS dotq,
                  any_value(a.q2) AS qa2, any_value(b.q2) AS qb2
           FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id >= 10
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2),
         ranked AS (
           SELECT qid, nid,
                  dotq / sqrt(CAST(qa2 * qb2 AS DOUBLE)) AS sim,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY dotq / sqrt(CAST(qa2 * qb2 AS DOUBLE)) DESC,
                             nid ASC) AS rk
           FROM d)
         SELECT qid, CAST(rk AS INTEGER) AS rk, nid,
                (round(sim*10000)/10000) AS sim
         FROM ranked WHERE rk <= 5
         ORDER BY qid ASC NULLS LAST, rk ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (k)
    // Shingle CONTAINMENT — the asymmetric near-dup measure (|S(A)∩S(B)|
    // / |S(A)|) that catches "A is a quoted/truncated copy inside B",
    // which symmetric Jaccard under-scores when the container is much
    // longer. The planted mutated copies (last token dropped) have
    // containment exactly 1.0 in their originals — S(mutated) ⊂ S(orig).
    // Candidates come from the shared-shingle EQUALITY join (the LSH
    // shape at scale), never all-pairs.
    QueryDef("l2_containment", (s, dir) => {
      val corpus = corpusWithDups(s, dir)
        .filter(col("doc_id") < 40 || col("doc_id") >= 1000000)
      val sets = TextFunctions.shingleSets(corpus, "doc_id", "text")
      val a = sets.select(col("doc_id").as("ida"), col("shingle"))
      val b = sets.select(col("doc_id").as("idb"), col("shingle").as("shb"))
      val pairs = a.join(b, col("shingle") === col("shb") && col("ida") =!= col("idb"))
        .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("inter"))
      val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      pairs
        .join(sizes.select(col("doc_id").as("ida"), col("sz").as("sza")), "ida")
        .filter(expr("CAST(inter AS DOUBLE) / sza >= 0.6"))
        .select(col("ida"), col("idb"), col("inter"),
          expr("round((CAST(inter AS DOUBLE) / sza)*10000)/10000")
            .as("containment"))
        .orderBy(col("ida").asc_nulls_last, col("idb").asc_nulls_last)
    }, Some(
      """WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 40
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id,
                  array_to_string(list_slice(string_split(text, ' '), 1,
                    len(string_split(text, ' ')) - 1), ' ') AS text
           FROM documents WHERE doc_id < 20),
         sets AS (
           SELECT DISTINCT doc_id, shingle FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_transform(range(1, len(string_split(text,' ')) - 1),
                           i -> string_split(text,' ')[i] || ' ' ||
                                string_split(text,' ')[i+1] || ' ' ||
                                string_split(text,' ')[i+2])
                    ELSE [] END) AS shingle
             FROM corpus)),
         sizes AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY 1),
         pairs AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
           FROM sets a JOIN sets b
             ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT ida, idb, inter,
                (round((CAST(inter AS DOUBLE) / sa.sz)*10000)/10000)
                  AS containment
         FROM pairs JOIN sizes sa ON sa.doc_id = ida
         WHERE CAST(inter AS DOUBLE) / sa.sz >= 0.6
         ORDER BY ida ASC NULLS LAST, idb ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (gt)
    // FREQUENCY SPECTRUM + GOOD–TURING UNSEEN MASS (Gale & Sampson
    // 1995) — the corpus-coverage diagnostic next to l4_zipf's rank
    // law: V_f = how many distinct tokens occur exactly f times; the
    // Good–Turing estimate of the probability mass on UNSEEN tokens is
    // P0 = V_1 / N (singleton share of all token occurrences) — the
    // number that says whether a tokenizer/vocab was trained on enough
    // data. ALL integer: the spectrum is counts-of-counts, N and V_1
    // are BIGINTs, P0 reports in ppm via truncating div (identical in
    // both engines). Scale: token rollup (one shuffle) → spectrum
    // rollup (tiny domain); the summary broadcast-joins onto the
    // spectrum rows (first 10 frequencies — the GT-smoothing band).
    QueryDef("l4_freq_spectrum", (s, dir) => {
      val freq = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
        // feeds the spectrum AND the totals — cut, or the token
        // rollup runs twice
        .localCheckpoint(false)
      val spectrum = freq.groupBy(col("f"))
        .agg(count(lit(1)).as("v_f"))
      // V1 as a CONDITIONAL SUM, not a filtered subframe: a corpus
      // with no singletons must still report its spectrum with
      // p0_ppm = 0 — an empty-frame cross join would vanish every row
      val tot = freq.agg(sum(col("f")).as("n_tokens"),
        count(lit(1)).as("v_distinct"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("v1"))
      // the 10 SMALLEST frequencies present (not f <= 10): the
      // GT-smoothing band stays informative on any corpus shape —
      // the fixture soup's rarest tokens sit far above 10
      spectrum.orderBy(col("f").asc).limit(10)
        .crossJoin(broadcast(tot))
        .select(col("f"), col("v_f"), col("n_tokens"),
          col("v_distinct"),
          expr("(v1 * 1000000) div n_tokens").as("p0_ppm"))
        .orderBy(col("f").asc_nulls_last)
    }, Some(
      """WITH toks AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         freq AS MATERIALIZED (
           SELECT tok, CAST(count(*) AS BIGINT) AS f FROM toks
           WHERE tok <> '' GROUP BY 1),
         spectrum AS MATERIALIZED (
           SELECT f, CAST(count(*) AS BIGINT) AS v_f
           FROM freq GROUP BY 1),
         band AS (SELECT f, v_f FROM spectrum ORDER BY f ASC LIMIT 10),
         tot AS (SELECT CAST(sum(f) AS BIGINT) AS n_tokens,
                        CAST(count(*) AS BIGINT) AS v_distinct,
                        CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS v1
                 FROM freq)
         SELECT b.f, b.v_f, tot.n_tokens, tot.v_distinct,
                CAST((tot.v1 * 1000000) // tot.n_tokens AS BIGINT)
                  AS p0_ppm
         FROM band b, tot
         ORDER BY b.f ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (r)
    // Zipf fit — the corpus-health diagnostic: natural text follows
    // freq ∝ rank^s with s ≈ -1; template spam and boilerplate bend the
    // log-log line. Slope/R² come from regr aggregates over the top-100
    // ranks. Scale shape: the vocabulary census is one keyed agg; the
    // top-100 cut is TakeOrderedAndProject (never a global sort), and the
    // regression runs on 100 rows.
    QueryDef("l4_zipf", (s, dir) => {
      val freq = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      val top = freq.orderBy(col("freq").desc, col("tok").asc).limit(100)
      top
        .withColumn("rk", row_number().over(
          Window.orderBy(col("freq").desc, col("tok").asc)))
        .agg(count(lit(1)).as("n_terms"),
          expr("round(regr_slope(ln(freq), ln(rk)) * 10000)/10000")
            .as("zipf_slope"),
          expr("round(regr_r2(ln(freq), ln(rk)) * 10000)/10000")
            .as("fit_r2"))
    }, Some(
      """WITH toks AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         freq AS (
           SELECT tok, count(*) AS freq FROM toks
           WHERE tok <> '' GROUP BY 1),
         ranked AS (
           SELECT freq, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rk
           FROM freq ORDER BY freq DESC, tok ASC LIMIT 100)
         SELECT count(*) AS n_terms,
                (round(regr_slope(ln(freq), ln(rk)) * 10000)/10000)
                  AS zipf_slope,
                (round(regr_r2(ln(freq), ln(rk)) * 10000)/10000) AS fit_r2
         FROM ranked"""))
  ,

    // ------------------------------------------------------------------ L7
    // END-TO-END preprocessing pipeline — the composite workload the
    // whole L-family exists for, as ONE declarative DAG: language gate →
    // length gate → exact dedup (keep-first per content hash) → token
    // census + mean-word-length quality band → per-language sequence
    // packing → per-language yield report (docs in → docs surviving →
    // tokens → packed 2048-token sequences). Catalyst fuses the gates
    // into the scan; the only shuffles are the dedup hash and the
    // per-language pack window — at 100 TB both key by content-hash /
    // language, so the pipeline is two exchanges end to end, and every
    // stage is the same operator the standalone queries certify.
    // ------------------------------------------------------------- L4 (x)
    // SELF-BLEU diversity probe — the genai-data health metric: how
    // much does each document's n-gram content overlap the REST of the
    // sample? High self-BLEU = mode collapse / template spam; the
    // number curation teams track when synthetic data enters the mix.
    // Per sampled doc: distinct bigrams, the fraction found in ANY
    // other sampled doc (bigram EQUALITY semi-join — never pairwise
    // text compare), ratio as exact ppm ints, and the sample mean as
    // one more integer div. The ≤20-doc sample bound is the scale
    // contract (the l3 query-set discipline); corpus-wide diversity
    // tracks the same ratio over hash-bucketed bigram joins.
    QueryDef("l4_self_bleu", (s, dir) => {
      val bg = t(s, dir, "documents").filter(col("doc_id") < 20)
        .withColumn("arr", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(arr) >= 2
             THEN transform(sequence(1, size(arr) - 1),
                  i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))
             ELSE array() END""")).as("bigram"))
        .distinct()
      val other = bg.select(col("doc_id").as("od"), col("bigram").as("ob"))
      val matched = bg.join(other,
          col("bigram") === col("ob") && col("doc_id") =!= col("od"),
          "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matched"))
      val per = bg.groupBy(col("doc_id")).agg(count(lit(1)).as("n_bigrams"))
        .join(matched, Seq("doc_id"), "left_outer")
        .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)))
        .withColumn("self_bleu_ppm",
          expr("n_matched * 1000000L div n_bigrams"))
      per.select(col("doc_id"), col("n_bigrams"), col("n_matched"),
          col("self_bleu_ppm"),
          expr("CAST(sum(self_bleu_ppm) OVER () div count(*) OVER () AS BIGINT)")
            .as("sample_mean_ppm"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH bg AS (
           SELECT DISTINCT doc_id, bigram FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(string_split(text, ' ')) >= 2
                    THEN list_transform(range(1, len(string_split(text, ' '))),
                         i -> string_split(text, ' ')[i] || ' ' ||
                              string_split(text, ' ')[i + 1])
                    ELSE [] END) AS bigram
             FROM documents WHERE doc_id < 20)),
         matched AS (
           SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_matched
           FROM bg b
           WHERE EXISTS (SELECT 1 FROM bg o
                         WHERE o.bigram = b.bigram
                           AND o.doc_id <> b.doc_id)
           GROUP BY 1),
         per AS (
           SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                  CAST(coalesce(any_value(m.n_matched), 0) AS BIGINT)
                    AS n_matched
           FROM bg LEFT JOIN matched m ON bg.doc_id = m.doc_id
           GROUP BY 1),
         r AS (
           SELECT doc_id, n_bigrams, n_matched,
                  CAST((n_matched * 1000000) // n_bigrams AS BIGINT)
                    AS self_bleu_ppm
           FROM per)
         SELECT doc_id, n_bigrams, n_matched, self_bleu_ppm,
                CAST((sum(self_bleu_ppm) OVER ()) // (count(*) OVER ())
                  AS BIGINT) AS sample_mean_ppm
         FROM r
         ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L6 (e)
    // CHAT/SFT CONVERSATION PACKING — assemble multi-turn training
    // conversations from raw event streams: sessionize per user (the
    // t4 30-minute-gap discipline), map event kinds to chat roles,
    // render turns in order into one conversation string, and report
    // the per-conversation turn mix + a chars/4 token estimate (the
    // budget number an SFT packer bins on). The ordered fold is the
    // struct-sort idiom; money renders as exact cents so turn content
    // is engine-identical. ONE user-keyed window sort (sessionize +
    // order turns) then a session-keyed aggregate — the t4 shuffle
    // shape end to end; at 100 TB conversations build map-side within
    // each user's sorted run.
    QueryDef("l6_chat_pack", (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      val cum = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      t(s, dir, "events")
        .withColumn("ts_sec", date_trunc("second", col("ts")))
        .withColumn("prev_ts", lag(col("ts_sec"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts_sec"))
              - unix_timestamp(col("prev_ts"))) > 1800, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(cum))
        .withColumn("role",
          when(col("event_type").isin("view", "click"), "user")
            .when(col("event_type").isin("purchase", "signup"), "assistant")
            .otherwise("system"))
        .withColumn("turn", concat(col("role"), lit(": "),
          col("event_type"), lit(" "),
          expr("CAST(CAST(round(value * 100) AS BIGINT) AS STRING)")))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts_sec")).as("session_start"),
          count(lit(1)).as("n_turns"),
          sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
          sum(when(col("role") === "assistant", 1L).otherwise(0L))
            .as("n_assistant"),
          expr("""substring(array_join(transform(
              array_sort(collect_list(struct(ts_sec, event_id, turn))),
              x -> x.turn), ' | '), 1, 120)""").as("convo_head"),
          expr("CAST(sum(length(turn) + 3) div 4 AS BIGINT)")
            .as("est_tokens"))
        .select(col("user_id"), col("session_start"), col("n_turns"),
          col("n_user"), col("n_assistant"), col("convo_head"),
          col("est_tokens"))
        .orderBy(col("user_id").asc_nulls_last,
          col("session_start").asc_nulls_last)
    }, Some(
      """WITH e AS (
           SELECT event_id, user_id, event_type, value,
                  CAST(date_trunc('second', CAST(ts AS TIMESTAMP))
                    AS TIMESTAMP) AS ts_sec
           FROM events),
         sess AS (
           SELECT *,
                  sum(CASE WHEN prev_ts IS NULL OR
                      date_diff('second', prev_ts, ts_sec) > 1800
                      THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id
                      ORDER BY ts_sec ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS sess_id
           FROM (SELECT *, lag(ts_sec) OVER (PARTITION BY user_id
                   ORDER BY ts_sec ASC, event_id ASC) AS prev_ts
                 FROM e)),
         turns AS (
           SELECT user_id, sess_id, ts_sec, event_id,
                  (CASE WHEN event_type IN ('view', 'click') THEN 'user'
                        WHEN event_type IN ('purchase', 'signup')
                          THEN 'assistant'
                        ELSE 'system' END) AS role,
                  (CASE WHEN event_type IN ('view', 'click') THEN 'user'
                        WHEN event_type IN ('purchase', 'signup')
                          THEN 'assistant'
                        ELSE 'system' END) || ': ' || event_type || ' '
                    || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
                    AS turn
           FROM sess)
         SELECT user_id, min(ts_sec) AS session_start,
                count(*) AS n_turns,
                CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_user,
                CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_assistant,
                substr(string_agg(turn, ' | '
                  ORDER BY ts_sec ASC, event_id ASC), 1, 120)
                  AS convo_head,
                CAST(sum(length(turn) + 3) // 4 AS BIGINT) AS est_tokens
         FROM turns
         GROUP BY user_id, sess_id
         ORDER BY user_id ASC NULLS LAST, session_start ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (p)
    // CLASS-BALANCED DOWNSAMPLING — equalize label counts to the
    // minority class (the classifier-data staple; naive random
    // sampling keeps the imbalance): rank within each label by a
    // deterministic hash order (so the kept subset is stable and
    // engine-identical, the p10 consistent-sampling discipline) and
    // keep rank ≤ min class size. One label-keyed window + a broadcast
    // 1-row min; census proves exact balance. At 100 TB the same rank
    // cutoff runs per label partition — no global sort, no collect.
    QueryDef("l5_balanced_downsample", (s, dir) => {
      val e = t(s, dir, "embeddings")
      val minN = broadcast(e.groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("min_n")))
      val w = Window.partitionBy(col("label"))
        .orderBy(expr("(vec_id * 2654435761L) % 1000003").asc,
          col("vec_id").asc)
      GraftFunctions.register(s)
      e.withColumn("rk", row_number().over(w))
        .crossJoin(minN)
        .filter(col("rk") <= col("min_n"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("vec_id")).as("first_kept"),
          expr("CAST(sum(vec_id) AS BIGINT)").as("sum_kept_ids"))
        .orderBy(col("label").asc_nulls_last)
    }, Some(
      """WITH n AS (
           SELECT CAST(min(cnt) AS BIGINT) AS min_n FROM (
             SELECT label, count(*) AS cnt FROM embeddings GROUP BY 1)),
         rk AS (
           SELECT label, vec_id,
                  row_number() OVER (PARTITION BY label
                    ORDER BY (vec_id * 2654435761) % 1000003 ASC,
                             vec_id ASC) AS rk
           FROM embeddings)
         SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
                min(vec_id) AS first_kept,
                CAST(sum(vec_id) AS BIGINT) AS sum_kept_ids
         FROM rk CROSS JOIN n
         WHERE rk <= min_n
         GROUP BY label
         ORDER BY label ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (o)
    // FILL-IN-THE-MIDDLE (FIM) transform — the code-model pretraining
    // staple (PSM format): split each doc into prefix/middle/suffix at
    // two HASH-CHOSEN token boundaries (deterministic integer split
    // points from doc_id — bit-identical engines, and uniform-ish over
    // the doc like the real random transform), then render
    // `<PRE> prefix <SUF> suffix <MID> middle` so the model learns to
    // infill with right context. Map-only slicing lambdas per row; the
    // census reports split-point stats + rendered heads. At 100 TB FIM
    // is a map stage in the packing pipeline — zero shuffles of its
    // own (the census agg here is the demo's reporting).
    QueryDef("l5_fim_transform", (s, dir) => {
      t(s, dir, "documents")
        .withColumn("arr", split(col("text"), " "))
        .withColumn("n", size(col("arr")))
        .filter(col("n") >= 10)
        // two ordered cut points in [1, n-1], hash-derived
        .withColumn("c1", expr(
          "CAST(1 + (doc_id * 2654435761L) % (n - 2) AS INT)"))
        .withColumn("c2raw", expr(
          "CAST(1 + (doc_id * 40503L + 7) % (n - 2) AS INT)"))
        .withColumn("lo", least(col("c1"), col("c2raw")))
        .withColumn("hi", greatest(col("c1"), col("c2raw")) + 1)
        .withColumn("fim", expr(
          """concat('<PRE> ', array_join(slice(arr, 1, lo), ' '),
             ' <SUF> ', array_join(slice(arr, hi + 1, n - hi), ' '),
             ' <MID> ', array_join(slice(arr, lo + 1, hi - lo), ' '))"""))
        .select(col("doc_id"), col("n").as("n_tokens"),
          col("lo").as("prefix_end"), col("hi").as("middle_end"),
          (col("hi") - col("lo")).as("middle_len"),
          expr("substring(fim, 1, 120)").as("fim_head"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH b AS (
           SELECT doc_id, string_split(text, ' ') AS arr,
                  CAST(len(string_split(text, ' ')) AS INTEGER) AS n
           FROM documents),
         cuts AS (
           SELECT doc_id, arr, n,
                  CAST(1 + (doc_id * 2654435761) % (n - 2) AS INTEGER)
                    AS c1,
                  CAST(1 + (doc_id * 40503 + 7) % (n - 2) AS INTEGER)
                    AS c2raw
           FROM b WHERE n >= 10),
         lh AS (
           SELECT doc_id, arr, n,
                  least(c1, c2raw) AS lo,
                  greatest(c1, c2raw) + 1 AS hi
           FROM cuts)
         SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
                CAST(lo AS INTEGER) AS prefix_end,
                CAST(hi AS INTEGER) AS middle_end,
                CAST(hi - lo AS INTEGER) AS middle_len,
                substr('<PRE> ' || array_to_string(list_slice(arr, 1, lo), ' ')
                  || ' <SUF> '
                  || array_to_string(list_slice(arr, hi + 1, n), ' ')
                  || ' <MID> '
                  || array_to_string(list_slice(arr, lo + 1, hi), ' '),
                  1, 120) AS fim_head
         FROM lh
         ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (n)
    // SOFT DEDUP via sampling weights — the alternative to dropping
    // duplicates: keep every copy but weight it 1/cluster_size so the
    // training distribution matches the deduplicated one in expectation
    // (the "document-level downweighting" recipe; preserves within-
    // cluster variation hard dedup destroys). Clusters are exact-hash
    // groups (the l1 shuffle); weights are exact ppm integers; the
    // census reports, per cluster-size bucket, how much effective
    // probability mass survives vs raw — the number that says whether
    // soft and hard dedup would even differ on this corpus. One hash
    // shuffle + one bounded bucket agg.
    QueryDef("l5_soft_dedup_weights", (s, dir) => {
      val sized = corpusWithDups(s, dir)
        .withColumn("h", md5(col("text").cast("binary")))
        .withColumn("toks", size(split(col("text"), " ")))
      val clusters = sized.groupBy(col("h"))
        .agg(count(lit(1)).as("csize"), sum(col("toks")).as("ctoks"))
      clusters
        .withColumn("w_ppm", expr("1000000L div csize"))
        .groupBy(col("csize"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("csize")).as("n_docs"),
          sum(col("ctoks")).as("n_tokens"),
          first(col("w_ppm")).as("weight_ppm"))
        .select(col("csize"), col("n_clusters"), col("n_docs"),
          col("n_tokens"), col("weight_ppm"),
          expr("n_clusters * 1000000L").as("effective_mass_ppm"))
        .orderBy(col("csize").asc_nulls_last)
    }, Some(
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id,
                  array_to_string(list_slice(string_split(text, ' '), 1,
                    len(string_split(text, ' ')) - 1), ' ') AS text
           FROM documents WHERE doc_id < 20),
         clusters AS (
           SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS csize,
                  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                    AS ctoks
           FROM corpus GROUP BY 1)
         SELECT csize,
                CAST(count(*) AS BIGINT) AS n_clusters,
                CAST(sum(csize) AS BIGINT) AS n_docs,
                CAST(sum(ctoks) AS BIGINT) AS n_tokens,
                CAST((1000000 // csize) AS BIGINT) AS weight_ppm,
                CAST(count(*) * 1000000 AS BIGINT) AS effective_mass_ppm
         FROM clusters
         GROUP BY csize
         ORDER BY csize ASC NULLS LAST""")),

    // ------------------------------------------------------------- L7 (d)
    // DATA CARD — the "datasheets for datasets" summary artifact (Gebru
    // et al. 2021) every released corpus ships with: one pass computes
    // the composition (docs/sources/languages), size (chars, whitespace
    // tokens, mean and LOWER-MEDIAN doc length — the exact order
    // statistic, a30's rule), balance (max/min language share — the
    // skew a mixture-weights pass reads first), duplication (exact-dup
    // rows beyond each keeper) and short-doc mass, emitted as ordered
    // (section, metric, value) BIGINT rows. Integer-exact throughout —
    // shares/means are ppm/floor divs of exact counts. Scale: two
    // corpus passes (per-doc token census; md5 dedup census — the same
    // shuffles l1/l4_token_count already pay), everything else
    // aggregates tiny frames; the card itself is O(metrics).
    QueryDef("l7_data_card", (s, dir) => {
      val docs = t(s, dir, "documents")
      val per = docs.select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"),
          (size(split(col("text"), " "))).cast("long").as("toks"),
          md5(col("text")).as("h"))
        .localCheckpoint(false)
      val agg = per.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("toks")).as("total_tokens"),
        sum(when(col("toks") < 50L, 1L).otherwise(0L)).as("short_docs"))
      val med = per
        .withColumn("rk", row_number().over(
          Window.orderBy(col("toks").asc, col("doc_id").asc)))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .filter(expr("rk = (n + 1) div 2"))
        .select(col("toks").as("median_toks"))
      val langShare = per.groupBy(col("lang"))
        .agg(count(lit(1)).as("ln"))
        .agg(max(col("ln")).as("max_lang"), min(col("ln")).as("min_lang"))
      val dups = per.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c - 1")).as("n_dup_rows"))
      val one = agg.crossJoin(med).crossJoin(langShare).crossJoin(dups)
      one.selectExpr(
        "stack(11, " +
          "'composition', 'n_docs', n_docs, " +
          "'composition', 'n_sources', n_sources, " +
          "'composition', 'n_langs', n_langs, " +
          "'size', 'total_chars', total_chars, " +
          "'size', 'total_tokens', total_tokens, " +
          "'size', 'mean_doc_tokens', total_tokens div n_docs, " +
          "'size', 'median_doc_tokens', median_toks, " +
          "'balance', 'max_lang_share_ppm', (max_lang * 1000000L) div n_docs, " +
          "'balance', 'min_lang_share_ppm', (min_lang * 1000000L) div n_docs, " +
          "'duplication', 'exact_dup_rows', n_dup_rows, " +
          "'quality', 'short_docs_ppm', (short_docs * 1000000L) div n_docs" +
          ") AS (section, metric, value)")
        .orderBy(col("section").asc_nulls_last, col("metric").asc_nulls_last)
    }, Some(
      """WITH per AS (
           SELECT doc_id, lang, source, n_chars,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
                  md5(text) AS h
           FROM documents),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                  CAST(sum(n_chars) AS BIGINT) AS total_chars,
                  CAST(sum(toks) AS BIGINT) AS total_tokens,
                  CAST(sum(CASE WHEN toks < 50 THEN 1 ELSE 0 END)
                    AS BIGINT) AS short_docs
           FROM per),
         med AS (
           SELECT toks AS median_toks FROM (
             SELECT toks,
                    row_number() OVER (ORDER BY toks ASC, doc_id ASC) AS rk,
                    CAST(count(*) OVER () AS BIGINT) AS n
             FROM per)
           WHERE rk = (n + 1) // 2),
         ls AS (
           SELECT CAST(max(ln) AS BIGINT) AS max_lang,
                  CAST(min(ln) AS BIGINT) AS min_lang
           FROM (SELECT count(*) AS ln FROM per GROUP BY lang)),
         dups AS (
           SELECT CAST(sum(c - 1) AS BIGINT) AS n_dup_rows
           FROM (SELECT count(*) AS c FROM per GROUP BY h)),
         one AS (SELECT * FROM agg CROSS JOIN med
                 CROSS JOIN ls CROSS JOIN dups)
         SELECT section, metric, value FROM (
           SELECT 'composition' AS section, 'n_docs' AS metric,
                  n_docs AS value FROM one
           UNION ALL SELECT 'composition', 'n_sources', n_sources FROM one
           UNION ALL SELECT 'composition', 'n_langs', n_langs FROM one
           UNION ALL SELECT 'size', 'total_chars', total_chars FROM one
           UNION ALL SELECT 'size', 'total_tokens', total_tokens FROM one
           UNION ALL SELECT 'size', 'mean_doc_tokens',
                  total_tokens // n_docs FROM one
           UNION ALL SELECT 'size', 'median_doc_tokens', median_toks
                  FROM one
           UNION ALL SELECT 'balance', 'max_lang_share_ppm',
                  (max_lang * 1000000) // n_docs FROM one
           UNION ALL SELECT 'balance', 'min_lang_share_ppm',
                  (min_lang * 1000000) // n_docs FROM one
           UNION ALL SELECT 'duplication', 'exact_dup_rows', n_dup_rows
                  FROM one
           UNION ALL SELECT 'quality', 'short_docs_ppm',
                  (short_docs * 1000000) // n_docs FROM one)
         ORDER BY section ASC NULLS LAST, metric ASC NULLS LAST""")),

    // ------------------------------------------------------------- L7 (b)
    // CURATION FUNNEL census — the dashboard number every data team
    // watches: survivors (docs AND tokens) after each successive gate,
    // raw → language → quality → exact-dedup → decontamination. Each
    // doc computes its deepest surviving stage in ONE pass (gates are
    // cumulative booleans; dedup = keep-first over the hash window
    // among stage-3 survivors; decontamination = anti-match against the
    // eval split's exact hashes via a broadcast-scale set), then ONE
    // stack aggregate emits the per-stage rows with share-of-raw. At
    // 100 TB: the same single corpus pass + hash shuffle l7_pipeline
    // uses — the funnel is free metadata on top of the pipeline run.
    QueryDef("l7_curation_funnel", (s, dir) => {
      val docs = t(s, dir, "documents")
      val eval = docs.filter(col("doc_id") < 10)
        .select(md5(col("text").cast("binary")).as("eh")).distinct()
      val wDedup = Window.partitionBy(col("h")).orderBy(col("doc_id").asc)
      val staged = docs
        .withColumn("toks", size(split(col("text"), " ")))
        .withColumn("g2", col("lang").isin("en", "de", "fr"))
        .withColumn("mean_wl",
          (length(col("text")) - col("toks") + 1).cast("double") / col("toks"))
        .withColumn("g3", col("g2") && length(col("text")) >= 50 &&
          col("toks") >= 10 && col("mean_wl").between(3.0, 10.0))
        .withColumn("h", md5(col("text").cast("binary")))
        .withColumn("rn", row_number().over(wDedup))
        .withColumn("g4", col("g3") && col("rn") === 1)
      val contaminated = staged.join(broadcast(eval),
          col("h") === col("eh"), "left_outer")
        .withColumn("g5", col("g4") && col("eh").isNull && col("doc_id") >= 10)
      contaminated.agg(
          count(lit(1)).as("s1_docs"), sum(col("toks")).as("s1_toks"),
          sum(when(col("g2"), 1L).otherwise(0L)).as("s2_docs"),
          sum(when(col("g2"), col("toks")).otherwise(0L)).as("s2_toks"),
          sum(when(col("g3"), 1L).otherwise(0L)).as("s3_docs"),
          sum(when(col("g3"), col("toks")).otherwise(0L)).as("s3_toks"),
          sum(when(col("g4"), 1L).otherwise(0L)).as("s4_docs"),
          sum(when(col("g4"), col("toks")).otherwise(0L)).as("s4_toks"),
          sum(when(col("g5"), 1L).otherwise(0L)).as("s5_docs"),
          sum(when(col("g5"), col("toks")).otherwise(0L)).as("s5_toks"))
        .selectExpr("""stack(5,
            'stage1_raw', s1_docs, CAST(s1_toks AS BIGINT),
            'stage2_lang', s2_docs, CAST(s2_toks AS BIGINT),
            'stage3_quality', s3_docs, CAST(s3_toks AS BIGINT),
            'stage4_dedup', s4_docs, CAST(s4_toks AS BIGINT),
            'stage5_decontaminated', s5_docs, CAST(s5_toks AS BIGINT))
          AS (stage, n_docs, n_tokens)""", "s1_docs")
        .select(col("stage"), col("n_docs"), col("n_tokens"),
          expr("CAST(n_docs * 1000000L div s1_docs AS BIGINT)")
            .as("share_ppm"))
        .orderBy(col("stage").asc_nulls_last)
    }, Some(
      """WITH staged AS (
           SELECT doc_id, lang, text,
                  len(string_split(text, ' ')) AS toks,
                  md5(text) AS h,
                  lang IN ('en', 'de', 'fr') AS g2,
                  CAST(length(text) - len(string_split(text, ' ')) + 1
                    AS DOUBLE) / len(string_split(text, ' ')) AS mean_wl
           FROM documents),
         g3s AS (
           SELECT *,
                  g2 AND length(text) >= 50 AND toks >= 10
                     AND mean_wl BETWEEN 3.0 AND 10.0 AS g3
           FROM staged),
         g4s AS (
           SELECT *,
                  g3 AND row_number() OVER (PARTITION BY h
                    ORDER BY doc_id ASC) = 1 AS g4
           FROM g3s),
         ev AS (SELECT DISTINCT md5(text) AS eh FROM documents
                WHERE doc_id < 10),
         g5s AS (
           SELECT g4s.*,
                  g4 AND ev.eh IS NULL AND doc_id >= 10 AS g5
           FROM g4s LEFT JOIN ev ON g4s.h = ev.eh),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS s1_docs,
                  CAST(sum(toks) AS BIGINT) AS s1_toks,
                  CAST(sum(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT)
                    AS s2_docs,
                  CAST(sum(CASE WHEN g2 THEN toks ELSE 0 END) AS BIGINT)
                    AS s2_toks,
                  CAST(sum(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT)
                    AS s3_docs,
                  CAST(sum(CASE WHEN g3 THEN toks ELSE 0 END) AS BIGINT)
                    AS s3_toks,
                  CAST(sum(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT)
                    AS s4_docs,
                  CAST(sum(CASE WHEN g4 THEN toks ELSE 0 END) AS BIGINT)
                    AS s4_toks,
                  CAST(sum(CASE WHEN g5 THEN 1 ELSE 0 END) AS BIGINT)
                    AS s5_docs,
                  CAST(sum(CASE WHEN g5 THEN toks ELSE 0 END) AS BIGINT)
                    AS s5_toks
           FROM g5s),
         rows_ AS (
           SELECT 'stage1_raw' AS stage, s1_docs AS n_docs,
                  s1_toks AS n_tokens, s1_docs FROM agg
           UNION ALL SELECT 'stage2_lang', s2_docs, s2_toks, s1_docs
           FROM agg
           UNION ALL SELECT 'stage3_quality', s3_docs, s3_toks, s1_docs
           FROM agg
           UNION ALL SELECT 'stage4_dedup', s4_docs, s4_toks, s1_docs
           FROM agg
           UNION ALL SELECT 'stage5_decontaminated', s5_docs, s5_toks,
                  s1_docs FROM agg)
         SELECT stage, n_docs, n_tokens,
                CAST((n_docs * 1000000) // s1_docs AS BIGINT) AS share_ppm
         FROM rows_
         ORDER BY stage ASC NULLS LAST""")),

    QueryDef("l7_pipeline", (s, dir) => {
      val docs = t(s, dir, "documents")
      val kept = docs
        .filter(col("lang").isin("en", "de", "fr"))
        .filter(length(col("text")) >= 50)
      val wDedup = Window.partitionBy(col("h")).orderBy(col("doc_id").asc)
      val deduped = kept
        .withColumn("h", md5(col("text").cast("binary")))
        .withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
      val scored = deduped
        .withColumn("toks", size(split(col("text"), " ")))
        .withColumn("mean_wl",
          (length(col("text")) - col("toks") + 1).cast("double") / col("toks"))
        .filter(col("toks") >= 10 && col("mean_wl").between(3.0, 10.0))
      val wPack = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
      val packed = scored
        .withColumn("cum", sum(col("toks") + 1).over(wPack))
        .withColumn("seq_id", floor((col("cum") - (col("toks") + 1)) / 2048))
      packed.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          (max(col("seq_id")) + 1).as("n_sequences"))
        .join(docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs_in")),
          Seq("lang"))
        .select(col("lang"), col("n_docs_in"), col("n_docs"),
          col("n_tokens"), col("n_sequences"))
        .orderBy(col("lang").asc_nulls_last)
    }, Some(
      """WITH kept AS (
           SELECT doc_id, lang, text FROM documents
           WHERE lang IN ('en','de','fr') AND length(text) >= 50),
         dedup AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY md5(text)
                         ORDER BY doc_id ASC) AS rn
             FROM kept) WHERE rn = 1),
         scored AS (
           SELECT doc_id, lang,
                  len(string_split(text, ' ')) AS toks,
                  CAST(length(text) - len(string_split(text, ' ')) + 1
                    AS DOUBLE) / len(string_split(text, ' ')) AS mean_wl
           FROM dedup),
         band AS (
           SELECT * FROM scored
           WHERE toks >= 10 AND mean_wl BETWEEN 3.0 AND 10.0),
         packed AS (
           SELECT lang, toks,
                  CAST(floor((sum(toks + 1) OVER (PARTITION BY lang
                      ORDER BY doc_id ASC) - (toks + 1)) / 2048) AS BIGINT)
                    AS seq_id
           FROM band),
         summary AS (
           SELECT lang, count(*) AS n_docs,
                  CAST(sum(toks) AS BIGINT) AS n_tokens,
                  CAST(max(seq_id) + 1 AS BIGINT) AS n_sequences
           FROM packed GROUP BY 1),
         input AS (SELECT lang, count(*) AS n_docs_in
                   FROM documents GROUP BY 1)
         SELECT s.lang, i.n_docs_in, s.n_docs, s.n_tokens, s.n_sequences
         FROM summary s JOIN input i USING (lang)
         ORDER BY s.lang ASC NULLS LAST""")),

    // ------------------------------------------------------------------- L5
    // Preference-pair construction — the chosen/rejected dataset shape
    // RLHF/DPO training consumes: within each source, rank documents by
    // an integer-exact quality score (vocabulary richness minus length —
    // no float anywhere, so ranking is engine-identical), then zip the
    // best k against the worst k rank-for-rank. Self-pairs and
    // non-positive score gaps are dropped (a group too small for
    // disjoint top/bottom halves never emits a degenerate pair).
    // Scale: scoring is map-only; both rankings come from ONE
    // source-keyed shuffle (two window passes over the same partitioning,
    // top-k bounded by WindowGroupLimit); the rank-equality self-join is
    // k-row-per-group tiny. At 100 TB the candidate set per source stays
    // k regardless of corpus size — pair construction is never corpus².
    QueryDef("l5_preference_pairs", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val scored = t(s, dir, "documents").select(
        col("doc_id"), col("source"),
        (size(array_distinct(split(col("text"), " "))).cast("long") * 1000L
          - size(split(col("text"), " ")).cast("long")).as("score"))
      val best = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("doc_id").asc)
      val worst = Window.partitionBy(col("source"))
        .orderBy(col("score").asc, col("doc_id").desc)
      val ranked = scored
        .withColumn("rb", row_number().over(best))
        .withColumn("rw", row_number().over(worst))
      val b = ranked.select(col("source"), col("rb"),
        col("doc_id").as("chosen_id"), col("score").as("chosen_score"))
      val w = ranked.select(col("source"), col("rw"),
        col("doc_id").as("rejected_id"), col("score").as("rejected_score"))
      b.join(w, b("source") === w("source") && b("rb") === w("rw"))
        .where(col("rb") <= 4 && col("chosen_id") =!= col("rejected_id") &&
          col("chosen_score") > col("rejected_score"))
        .select(b("source"), col("rb").cast("long").as("pair_rank"),
          col("chosen_id"), col("rejected_id"),
          col("chosen_score"), col("rejected_score"),
          (col("chosen_score") - col("rejected_score")).as("gap"))
        .orderBy(col("source").asc_nulls_last, col("pair_rank").asc_nulls_last)
    }, Some(
      """WITH scored AS (
           SELECT doc_id, source,
                  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000
                    - CAST(len(string_split(text, ' ')) AS BIGINT) AS score
           FROM documents),
         ranked AS (
           SELECT doc_id, source, score,
                  row_number() OVER (PARTITION BY source
                    ORDER BY score DESC, doc_id ASC) AS rb,
                  row_number() OVER (PARTITION BY source
                    ORDER BY score ASC, doc_id DESC) AS rw
           FROM scored)
         SELECT b.source AS source, CAST(b.rb AS BIGINT) AS pair_rank,
                b.doc_id AS chosen_id, w.doc_id AS rejected_id,
                b.score AS chosen_score, w.score AS rejected_score,
                b.score - w.score AS gap
         FROM ranked b JOIN ranked w
           ON b.source = w.source AND b.rb = w.rw
         WHERE b.rb <= 4 AND b.doc_id <> w.doc_id AND b.score > w.score
         ORDER BY source ASC NULLS LAST, pair_rank ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (s)
    // Inverted-index build — the materialized posting-list table a
    // sparse-retrieval serving tier reads (the BM25 query, l4_bm25, is
    // the probe side; THIS is the index it would probe instead of
    // re-exploding the corpus). Per term: document frequency, total
    // term frequency, and the doc_id-ordered posting-list head
    // ("doc:tf doc:tf …"). Shape: ONE (doc_id, term) shuffle for tf,
    // ONE term-keyed agg for the lists — at 100 TB the index is
    // written PARTITIONED BY a term-hash bucket so a query term opens
    // one partition (the s27/AnnIndex serving discipline), and the
    // posting head is bounded (slice 10) so no single hot term ("the")
    // materializes an unbounded row; full lists would stay distributed
    // as (term, doc, tf) rows. sort_array on (doc_id, tf) structs ≡
    // the oracle's ORDER BY doc_id (doc_id unique within a term).
    QueryDef("l4_inverted_index", (s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
          array_join(
            transform(
              slice(sort_array(collect_list(struct(col("doc_id"), col("tf")))),
                1, 10),
              p => concat(p.getField("doc_id"), lit(":"), p.getField("tf")))
            , " ").as("postings_head"))
        .orderBy(col("df").desc, col("term").asc)
        .limit(30)
    }, Some(
      """WITH terms AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         inv AS (
           SELECT term, count(*) AS df, sum(tf) AS total_tf,
                  (list(doc_id || ':' || tf ORDER BY doc_id ASC))[1:10]
                    AS plist
           FROM tf GROUP BY term)
         SELECT term, CAST(df AS BIGINT) AS df,
                CAST(total_tf AS BIGINT) AS total_tf,
                array_to_string(plist, ' ') AS postings_head
         FROM inv ORDER BY df DESC, term ASC LIMIT 30""")),

    // ------------------------------------------------------------- L3 (k)
    // Distributed Lloyd's k-means, TWO supersteps, integer-exact: coords
    // are quantized to shifted-and-CLAMPED BIGINTs
    // (greatest(0, round(x·1000)+32768) ⇒ all operands non-negative by
    // construction, so floor `div` ≡ DuckDB `//` with no
    // negative-division parity concern at any value range; the shift is
    // translation-invariant for squared distances). Seeds = the 8 lowest vec_ids;
    // assignment is MAP-ONLY — centroids ride a literal array column
    // (array_min over per-centroid (d2, cid) structs = argmin with the
    // cid tiebreak), never a corpus×K join; the update step is the
    // l3_centroid posexplode shape — one (cid, pos)-keyed agg whose
    // map-side partials bound the shuffle at K·dim rows per partition.
    // The only driver materialization is the K×dim centroid table
    // (8×64 longs per round — the Dedup.ivfTrain boundedness contract);
    // corpus rows never collect. At 100 TB each superstep costs one
    // corpus scan + one K·dim-wide shuffle — the textbook distributed
    // Lloyd profile; more supersteps = the same two jobs repeated.
    QueryDef("l3_kmeans_lloyd", (s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"),
        // greatest(0, …) clamp: the +32768 shift only guarantees
        // non-negative operands for |x| <= 32.768; embeddings are
        // ~N(0, σ) with no hard bound, and a negative operand would let
        // Spark's truncating `div` diverge from DuckDB's floor `//`.
        // Both engines clamp identically, so parity holds at ANY range.
        expr("""transform(embedding, x -> greatest(CAST(0 AS BIGINT),
                 CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) + 32768))""")
          .as("q"))
      def centsLit(cs: Seq[(Long, Seq[Long])]): org.apache.spark.sql.Column =
        array(cs.sortBy(_._1).map { case (cid, cq) =>
          struct(lit(cid).as("cid"), array(cq.map(lit(_)): _*).as("cq"))
        }: _*)
      def assign(df: DataFrame, cents: org.apache.spark.sql.Column): DataFrame =
        df.withColumn("cents", cents)
          .withColumn("best", expr(
            """array_min(transform(cents, c -> named_struct(
              'd2', aggregate(zip_with(q, c.cq, (a, b) -> (a - b) * (a - b)),
                              CAST(0 AS BIGINT), (s, v) -> s + v),
              'cid', c.cid)))"""))
          .select(col("vec_id"), col("q"),
            col("best.cid").as("cid"), col("best.d2").as("d2"))
      // seeds: bounded K×dim collect (8 rows), same contract as ivfTrain
      val c0 = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("long").as("cid"), col("q"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq
      val a1 = assign(e, centsLit(c0))
      // superstep update: per-(cid, dim) exact integer mean (floor div)
      val c1 = a1.select(col("cid"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"), expr("sv div n").as("cv"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (cid, rows) => cid -> rows.sortBy(_._2).map(_._3).toSeq }
        .toSeq
      val a2 = assign(e, centsLit(c1))
      val csum = map(c1.sortBy(_._1).flatMap { case (cid, cq) =>
        Seq(lit(cid), lit(cq.sum)) }: _*)
      a2.groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), sum(col("d2")).as("inertia"))
        .withColumn("c_sum", element_at(csum, col("cid")))
        .select(col("cid"), col("n"), col("inertia"), col("c_sum"))
        .orderBy(col("cid").asc_nulls_last)
    }, Some(
      """WITH qv AS (
           SELECT vec_id,
                  list_transform(embedding,
                    x -> greatest(CAST(0 AS BIGINT),
                         CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                         + 32768)) AS q
           FROM embeddings),
         qp AS (
           SELECT vec_id, CAST(i AS INTEGER) AS pos,
                  q[CAST(i AS INTEGER)] AS v
           FROM qv CROSS JOIN range(1, 65) r(i)),
         c0 AS (SELECT vec_id AS cid, pos, v AS cv FROM qp WHERE vec_id < 8),
         d1 AS (
           SELECT p.vec_id, c.cid,
                  sum((p.v - c.cv) * (p.v - c.cv)) AS d2
           FROM qp p JOIN c0 c ON p.pos = c.pos
           GROUP BY 1, 2),
         a1 AS (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2 ASC, cid ASC) AS rk
           FROM d1),
         c1 AS (
           SELECT a.cid, p.pos, CAST(sum(p.v) // count(*) AS BIGINT) AS cv
           FROM a1 a JOIN qp p ON a.vec_id = p.vec_id
           WHERE a.rk = 1
           GROUP BY 1, 2),
         dd2 AS (
           SELECT p.vec_id, c.cid,
                  sum((p.v - c.cv) * (p.v - c.cv)) AS d2
           FROM qp p JOIN c1 c ON p.pos = c.pos
           GROUP BY 1, 2),
         a2 AS (
           SELECT vec_id, cid, d2,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2 ASC, cid ASC) AS rk
           FROM dd2),
         cs AS (SELECT cid, CAST(sum(cv) AS BIGINT) AS c_sum
                FROM c1 GROUP BY cid)
         SELECT a.cid AS cid, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(a.d2) AS BIGINT) AS inertia,
                any_value(cs.c_sum) AS c_sum
         FROM a2 a JOIN cs ON a.cid = cs.cid
         WHERE a.rk = 1
         GROUP BY a.cid
         ORDER BY cid ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (t)
    // BPE tokenizer TRAINING — three greedy merge rounds (l4_bpe_pairs
    // counts one round's candidates; THIS learns the merge table, the
    // artifact a tokenizer ships). The classic scale shape: after ONE
    // corpus scan collapses text to the (distinct word, count) table,
    // every round runs on the VOCABULARY — pair counting weighted by
    // word count, argmax, merge application — so training cost is
    // O(vocab), never O(corpus), exactly why word-level BPE training
    // scales to 100 TB corpora. Words are char-tokenized as
    // space-joined strings; a merge rewrites ' a b ' → ' ab ' via
    // leftmost-non-overlap replace — greedy left-to-right in BOTH
    // engines, so the learned merges are bit-identical. The per-round
    // argmax is a 1-row bounded collect (the ivfTrain contract); the
    // oracle unrolls all three rounds as CTEs with scalar-subquery
    // argmaxes.
    QueryDef("l4_bpe_train", (s, dir) => {
      val vocab = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
        .select(expr(
          "concat(' ', array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), ' '), ' ')")
          .as("t"), col("wc"))
        .localCheckpoint(false)
      def pairCounts(v: DataFrame): DataFrame =
        v.select(col("wc"), expr("split(trim(t), ' ')").as("arr"))
          .select(col("wc"), explode(expr(
            """CASE WHEN size(arr) >= 2
               THEN transform(sequence(1, size(arr) - 1),
                    i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))
               ELSE array() END""")).as("pair"))
          .groupBy(col("pair")).agg(sum(col("wc")).as("freq"))
      var v = vocab
      val merges = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
      var r = 0
      var dry = false
      while (r < 3 && !dry) {
        r += 1
        // bounded 1-row argmax collect per round (freq desc, pair asc);
        // a round can yield NO pairs (corpus of single-char words after
        // earlier merges) — stop merging early instead of crashing
        val bestOpt = pairCounts(v)
          .orderBy(col("freq").desc, col("pair").asc).limit(1)
          .collect().headOption
        if (bestOpt.isEmpty) { dry = true } else {
        val best = bestOpt.get
        val (pair, freq) = (best.getString(0), best.getLong(1))
        // typed-column replace: the data-derived pair rides as a LITERAL
        // value, never interpolated into parsed SQL — a corpus token
        // containing a quote/backslash/metacharacter cannot break parsing
        // or shift semantics
        v = v.select(org.apache.spark.sql.functions.replace(col("t"),
            lit(s" $pair "), lit(s" ${pair.replace(" ", "")} ")).as("t"),
            col("wc"))
          .localCheckpoint(false)
        merges += ((r.toLong, pair, freq))
        }
      }
      s.createDataFrame(merges.toSeq).toDF("merge_rank", "pair", "freq")
        .orderBy(col("merge_rank").asc_nulls_last)
    }, Some(
      """WITH v0 AS (
           SELECT ' ' || array_to_string(
                    list_transform(range(1, len(w) + 1), i -> w[i]), ' ')
                  || ' ' AS t,
                  count(*) AS wc
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY 1),
         p1 AS (
           SELECT u.p AS pair, CAST(sum(v.wc) AS BIGINT) AS freq
           FROM v0 v, unnest(CASE WHEN len(string_split(trim(t), ' ')) >= 2
             THEN list_transform(range(1, len(string_split(trim(t), ' '))),
                  i -> string_split(trim(t), ' ')[i] || ' ' ||
                       string_split(trim(t), ' ')[i + 1])
             ELSE [] END) u(p)
           GROUP BY 1),
         b1 AS (SELECT pair, freq FROM p1
                ORDER BY freq DESC, pair ASC LIMIT 1),
         v1 AS (
           SELECT replace(t, ' ' || (SELECT pair FROM b1) || ' ',
                    ' ' || replace((SELECT pair FROM b1), ' ', '') || ' ')
                  AS t, wc
           FROM v0),
         p2 AS (
           SELECT u.p AS pair, CAST(sum(v.wc) AS BIGINT) AS freq
           FROM v1 v, unnest(CASE WHEN len(string_split(trim(t), ' ')) >= 2
             THEN list_transform(range(1, len(string_split(trim(t), ' '))),
                  i -> string_split(trim(t), ' ')[i] || ' ' ||
                       string_split(trim(t), ' ')[i + 1])
             ELSE [] END) u(p)
           GROUP BY 1),
         b2 AS (SELECT pair, freq FROM p2
                ORDER BY freq DESC, pair ASC LIMIT 1),
         v2 AS (
           SELECT replace(t, ' ' || (SELECT pair FROM b2) || ' ',
                    ' ' || replace((SELECT pair FROM b2), ' ', '') || ' ')
                  AS t, wc
           FROM v1),
         p3 AS (
           SELECT u.p AS pair, CAST(sum(v.wc) AS BIGINT) AS freq
           FROM v2 v, unnest(CASE WHEN len(string_split(trim(t), ' ')) >= 2
             THEN list_transform(range(1, len(string_split(trim(t), ' '))),
                  i -> string_split(trim(t), ' ')[i] || ' ' ||
                       string_split(trim(t), ' ')[i + 1])
             ELSE [] END) u(p)
           GROUP BY 1),
         b3 AS (SELECT pair, freq FROM p3
                ORDER BY freq DESC, pair ASC LIMIT 1)
         SELECT CAST(1 AS BIGINT) AS merge_rank, pair, freq FROM b1
         UNION ALL
         SELECT CAST(2 AS BIGINT), pair, freq FROM b2
         UNION ALL
         SELECT CAST(3 AS BIGINT), pair, freq FROM b3
         ORDER BY merge_rank ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (t)
    // BPE tokenizer ENCODING — the serving half of l4_bpe_train: apply
    // the learned merge table, in rank order, to tokenize a document
    // slice. Training is O(vocab) rounds with bounded 1-row argmax
    // collects (same three merges as l4_bpe_train, re-derived here so
    // the query is self-contained); ENCODING is the corpus-scale pass —
    // per word, char-tokenize then apply each merge as a
    // leftmost-non-overlap replace (greedy left-to-right in BOTH
    // engines), all inside codegen'd string expressions, map-only until
    // the final per-doc aggregate. Output: per-doc token count before/
    // after merges + the compression the merge table bought. At 100 TB
    // the merge table is a broadcast literal (vocab-bounded) and
    // encoding never shuffles until the doc-keyed count — the tokenizer
    // deployment shape.
    QueryDef("l4_bpe_encode", (s, dir) => {
      val vocabAll = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("wc"))
        .select(expr(
          "concat(' ', array_join(transform(sequence(1, length(w), 1), i -> substring(w, i, 1)), ' '), ' ')")
          .as("t"), col("wc"))
        .localCheckpoint(false)
      def pairCounts(v: DataFrame): DataFrame =
        v.select(col("wc"), expr("split(trim(t), ' ')").as("arr"))
          .select(col("wc"), explode(expr(
            """CASE WHEN size(arr) >= 2
               THEN transform(sequence(1, size(arr) - 1),
                    i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))
               ELSE array() END""")).as("pair"))
          .groupBy(col("pair")).agg(sum(col("wc")).as("freq"))
      var v = vocabAll
      // a merge round with NO remaining pairs (single-char-word corpus
      // after earlier merges) stops training early — headOption, never
      // a bare collect()(0) that would throw on the empty frame
      val merges = scala.collection.mutable.ArrayBuffer[String]()
      var dry = false
      while (merges.length < 3 && !dry) {
        pairCounts(v)
          .orderBy(col("freq").desc, col("pair").asc).limit(1)
          .collect().headOption.map(_.getString(0)) match {
          case None => dry = true
          case Some(best) =>
            v = v.select(org.apache.spark.sql.functions.replace(col("t"),
                lit(s" $best "), lit(s" ${best.replace(" ", "")} ")).as("t"),
                col("wc"))
              .localCheckpoint(false)
            merges += best
        }
      }
      val docs = t(s, dir, "documents").filter(col("doc_id") < 30)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .select(col("doc_id"), expr(
          "concat(' ', array_join(transform(sequence(1, length(w), 1), i -> substring(w, i, 1)), ' '), ' ')")
          .as("t"))
        .withColumn("n_chars", expr("size(split(trim(t), ' '))"))
      val encoded = merges.foldLeft(docs) { (d, pair) =>
        d.withColumn("t", org.apache.spark.sql.functions.replace(col("t"),
          lit(s" $pair "), lit(s" ${pair.replace(" ", "")} ")))
      }
      encoded
        .withColumn("n_tok", expr("size(split(trim(t), ' '))"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_chars").cast("long")).as("n_char_tokens"),
          sum(col("n_tok").cast("long")).as("n_bpe_tokens"))
        .withColumn("saved",
          col("n_char_tokens") - col("n_bpe_tokens"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH v0 AS (
           SELECT ' ' || array_to_string(
                    list_transform(range(1, len(w) + 1), i -> w[i]), ' ')
                  || ' ' AS t,
                  count(*) AS wc
           FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY 1),
         p1 AS (
           SELECT u.p AS pair, CAST(sum(v.wc) AS BIGINT) AS freq
           FROM v0 v, unnest(CASE WHEN len(string_split(trim(t), ' ')) >= 2
             THEN list_transform(range(1, len(string_split(trim(t), ' '))),
                  i -> string_split(trim(t), ' ')[i] || ' ' ||
                       string_split(trim(t), ' ')[i + 1])
             ELSE [] END) u(p)
           GROUP BY 1),
         b1 AS (SELECT pair FROM p1 ORDER BY freq DESC, pair ASC LIMIT 1),
         v1 AS (
           SELECT replace(t, ' ' || (SELECT pair FROM b1) || ' ',
                    ' ' || replace((SELECT pair FROM b1), ' ', '') || ' ')
                  AS t, wc
           FROM v0),
         p2 AS (
           SELECT u.p AS pair, CAST(sum(v.wc) AS BIGINT) AS freq
           FROM v1 v, unnest(CASE WHEN len(string_split(trim(t), ' ')) >= 2
             THEN list_transform(range(1, len(string_split(trim(t), ' '))),
                  i -> string_split(trim(t), ' ')[i] || ' ' ||
                       string_split(trim(t), ' ')[i + 1])
             ELSE [] END) u(p)
           GROUP BY 1),
         b2 AS (SELECT pair FROM p2 ORDER BY freq DESC, pair ASC LIMIT 1),
         v2 AS (
           SELECT replace(t, ' ' || (SELECT pair FROM b2) || ' ',
                    ' ' || replace((SELECT pair FROM b2), ' ', '') || ' ')
                  AS t, wc
           FROM v1),
         p3 AS (
           SELECT u.p AS pair, CAST(sum(v.wc) AS BIGINT) AS freq
           FROM v2 v, unnest(CASE WHEN len(string_split(trim(t), ' ')) >= 2
             THEN list_transform(range(1, len(string_split(trim(t), ' '))),
                  i -> string_split(trim(t), ' ')[i] || ' ' ||
                       string_split(trim(t), ' ')[i + 1])
             ELSE [] END) u(p)
           GROUP BY 1),
         b3 AS (SELECT pair FROM p3 ORDER BY freq DESC, pair ASC LIMIT 1),
         dw AS (
           SELECT doc_id,
                  ' ' || array_to_string(
                    list_transform(range(1, len(w) + 1), i -> w[i]), ' ')
                  || ' ' AS t
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents WHERE doc_id < 30)),
         enc AS (
           SELECT doc_id,
                  CAST(len(string_split(trim(t), ' ')) AS BIGINT) AS n_chars,
                  replace(
                    replace(
                      replace(t,
                        ' ' || (SELECT pair FROM b1) || ' ',
                        ' ' || replace((SELECT pair FROM b1), ' ', '') || ' '),
                      ' ' || (SELECT pair FROM b2) || ' ',
                      ' ' || replace((SELECT pair FROM b2), ' ', '') || ' '),
                    ' ' || (SELECT pair FROM b3) || ' ',
                    ' ' || replace((SELECT pair FROM b3), ' ', '') || ' ')
                  AS t2
           FROM dw)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(n_chars) AS BIGINT) AS n_char_tokens,
                CAST(sum(len(string_split(trim(t2), ' '))) AS BIGINT)
                  AS n_bpe_tokens,
                CAST(sum(n_chars) - sum(len(string_split(trim(t2), ' ')))
                  AS BIGINT) AS saved
         FROM enc GROUP BY doc_id
         ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (u)
    // PMI COLLOCATIONS — pointwise mutual information over adjacent
    // bigrams, the classic collocation miner (phrase detection for
    // tokenizer vocab seeding and data-quality probes). PMI(a,b) =
    // ln((c_ab/B) / ((c_a/N)(c_b/N))) from FOUR exact integer counts:
    // bigram count, both unigram counts, and the two corpus totals —
    // all keyed aggs with map-side partials; totals ride a broadcast
    // 1-row frame. The ≥5 count floor is the scale control (drops the
    // long random tail BEFORE the unigram joins) and the significance
    // filter in one. Float math is a fixed ln expression over identical
    // BIGINTs, 6dp-rounded; top-20 by (pmi, pair) is fully pinned.
    QueryDef("l4_pmi_collocations", (s, dir) => {
      val words = t(s, dir, "documents")
        .select(expr("split(text, ' ')").as("arr"))
      val uni = words.select(explode(col("arr")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val bi = words.select(explode(expr(
          """CASE WHEN size(arr) >= 2
             THEN transform(sequence(1, size(arr) - 1),
                  i -> struct(element_at(arr, i) AS a,
                              element_at(arr, i + 1) AS b))
             ELSE array() END""")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
      val totals = broadcast(words.select(
        sum(expr("size(arr)")).cast("long").as("n"),
        sum(expr("greatest(size(arr) - 1, 0)")).cast("long").as("nb")))
      bi.join(uni.select(col("w").as("a"), col("cw").as("ca")), "a")
        .join(uni.select(col("w").as("b"), col("cw").as("cb")), "b")
        .crossJoin(totals)
        .withColumn("pmi", expr(
          """round(ln((CAST(cab AS DOUBLE) / CAST(nb AS DOUBLE)) /
               ((CAST(ca AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))))
             * 1000000) / 1000000"""))
        .select(concat(col("a"), lit(" "), col("b")).as("pair"),
          col("cab"), col("ca"), col("cb"), col("pmi"))
        .orderBy(col("pmi").desc, col("pair").asc)
        .limit(20)
    }, Some(
      """WITH w AS (SELECT string_split(text, ' ') AS arr FROM documents),
         uni AS (
           SELECT u.w AS w, CAST(count(*) AS BIGINT) AS cw
           FROM w, unnest(arr) u(w) GROUP BY 1),
         bi AS (
           SELECT string_split(p, chr(1))[1] AS a,
                  string_split(p, chr(1))[2] AS b,
                  CAST(count(*) AS BIGINT) AS cab
           FROM w, unnest(CASE WHEN len(arr) >= 2
             THEN list_transform(range(1, len(arr)),
                  i -> arr[i] || chr(1) || arr[i + 1])
             ELSE [] END) u(p)
           GROUP BY 1, 2
           HAVING count(*) >= 5),
         totals AS (
           SELECT CAST(sum(len(arr)) AS BIGINT) AS n,
                  CAST(sum(greatest(len(arr) - 1, 0)) AS BIGINT) AS nb
           FROM w)
         SELECT bi.a || ' ' || bi.b AS pair, bi.cab, ua.cw AS ca,
                ub.cw AS cb,
                round(ln((CAST(cab AS DOUBLE) / CAST(nb AS DOUBLE)) /
                  ((CAST(ua.cw AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(ub.cw AS DOUBLE) / CAST(n AS DOUBLE))))
                  * 1000000) / 1000000 AS pmi
         FROM bi
         JOIN uni ua ON ua.w = bi.a
         JOIN uni ub ON ub.w = bi.b
         CROSS JOIN totals
         ORDER BY pmi DESC, pair ASC
         LIMIT 20""")),

    // ------------------------------------------------------------- L3 (m)
    // Retrieval EVALUATION metrics — the harness that grades every other
    // L3 retrieval path: per query (the documented broadcast-tiny ≤20
    // query set), rank the corpus by cosine and score precision@5,
    // reciprocal rank of the first relevant hit, and recall@10 against
    // label ground truth (same `label` = relevant). Similarities are
    // 6dp-rounded BEFORE ranking with an id tiebreak, so rank order —
    // and therefore every metric — is engine-identical (the
    // l4_perplexity tie-pinning rule). Shape: queries×corpus is the
    // exactness baseline (bounded by the query set, never corpus²); at
    // 100 TB the same metric aggregation runs over any ANN path's
    // top-k output instead — candidates change, the grader does not.
    // Window ranks + two conditional aggs per query; one qid shuffle.
    QueryDef("l3_retrieval_metrics", (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"), col("label").as("qlab"))
      val c = e.filter(col("vec_id") >= 20)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("norm").as("cn"), col("label").as("clab"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("cid").asc)
      q.crossJoin(c)
        .withColumn("sim", expr(
          "round((vec_dot(qe, ce) / (qn * cn)) * 1000000) / 1000000"))
        .withColumn("rk", row_number().over(w))
        .withColumn("rel", (col("qlab") === col("clab")).cast("long"))
        .groupBy(col("qid"))
        .agg(
          expr("round((sum(CASE WHEN rk <= 5 THEN rel ELSE 0 END) / 5.0D) * 10000) / 10000")
            .as("p_at_5"),
          expr("round((1.0D / min(CASE WHEN rel = 1 THEN rk END)) * 10000) / 10000")
            .as("rr"),
          sum(when(col("rk") <= 10, col("rel")).otherwise(0L))
            .as("rel_in_top10"),
          sum(col("rel")).as("n_rel"))
        .orderBy(col("qid").asc_nulls_last)
    }, Some(
      """WITH q AS (
           SELECT a.vec_id AS qid, a.label AS qlab, b.vec_id AS cid,
                  b.label AS clab,
                  round((sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                             * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE))
                    / (sqrt(sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)))
                       * sqrt(sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                  * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)))))
                    * 1000000) / 1000000 AS sim
           FROM embeddings a
           JOIN embeddings b ON a.vec_id < 20 AND b.vec_id >= 20
           CROSS JOIN range(1, 65) r(i)
           GROUP BY 1, 2, 3, 4),
         ranked AS (
           SELECT qid, clab = qlab AS rel,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY sim DESC, cid ASC) AS rk
           FROM q)
         SELECT qid,
                round((sum(CASE WHEN rk <= 5 AND rel THEN 1 ELSE 0 END) / 5.0)
                  * 10000) / 10000 AS p_at_5,
                round((1.0 / min(CASE WHEN rel THEN rk END)) * 10000) / 10000
                  AS rr,
                CAST(sum(CASE WHEN rk <= 10 AND rel THEN 1 ELSE 0 END)
                  AS BIGINT) AS rel_in_top10,
                CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
         FROM ranked
         GROUP BY qid
         ORDER BY qid ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (q)
    // BINARY QUANTIZATION + Hamming rerank — the 256×-compression serving
    // tier (64 float32 dims → 64 sign bits in two 32-bit words; the
    // modern vector-DB default for first-stage retrieval). Stage 1 ranks
    // candidates by Hamming distance — INTEGER-exact, so the candidate
    // cut is bit-identical across engines — keeping top-20 per query;
    // stage 2 reranks only those 20 with the exact float cosine. At
    // 100 TB the packed words are 16 bytes/vector (the whole corpus
    // index fits where 0.4% of the floats would), Hamming is two XOR+
    // popcount ALU ops inside codegen, and the expensive float pass
    // touches only queries×20 rows, never queries×corpus. Candidate
    // generation here is a cross join at test scale; the production path
    // buckets by the first word (equality join) exactly like l3_ann_lsh
    // — same sign bits, same recall math.
    QueryDef("l3_binary_quant", (s, dir) => {
      val e = emb(s, dir)
        .withColumn("w0", expr(
          """aggregate(sequence(0, 31), 0L, (a, i) ->
               a + IF(CAST(element_at(embedding, i + 1) AS DOUBLE) > 0D,
                      shiftleft(1L, i), 0L))"""))
        .withColumn("w1", expr(
          """aggregate(sequence(32, 63), 0L, (a, i) ->
               a + IF(CAST(element_at(embedding, i + 1) AS DOUBLE) > 0D,
                      shiftleft(1L, i - 32), 0L))"""))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"), col("w0").as("qw0"), col("w1").as("qw1"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("embedding").as("ne"),
          col("norm").as("nn"), col("w0").as("cw0"), col("w1").as("cw1"))
      val hw = Window.partitionBy(col("qid"))
        .orderBy(col("ham").asc, col("nid").asc)
      val rw = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      q.crossJoin(c)
        .withColumn("ham",
          expr("bit_count(qw0 ^ cw0) + bit_count(qw1 ^ cw1)"))
        .withColumn("hrk", row_number().over(hw))
        .filter(col("hrk") <= 20)
        .withColumn("sim", expr(
          "round((vec_dot(qe, ne) / (qn * nn)) * 1000000) / 1000000"))
        .withColumn("rk", row_number().over(rw))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("nid"), col("ham"),
          expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, Some(
      """WITH p AS (
           SELECT vec_id, embedding,
                  CAST(list_sum(list_transform(range(0, 32), i ->
                    CASE WHEN CAST(embedding[CAST(i + 1 AS INTEGER)]
                           AS DOUBLE) > 0
                         THEN (CAST(1 AS BIGINT) << i)
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS w0,
                  CAST(list_sum(list_transform(range(32, 64), i ->
                    CASE WHEN CAST(embedding[CAST(i + 1 AS INTEGER)]
                           AS DOUBLE) > 0
                         THEN (CAST(1 AS BIGINT) << (i - 32))
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS w1
           FROM embeddings),
         h AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  CAST(bit_count(xor(a.w0, b.w0))
                       + bit_count(xor(a.w1, b.w1)) AS INTEGER) AS ham
           FROM p a JOIN p b ON a.vec_id < 10 AND b.vec_id >= 10),
         cand AS (
           SELECT qid, nid, ham,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY ham ASC, nid ASC) AS hrk
           FROM h),
         d AS (
           SELECT c.qid, c.nid, c.ham,
                  round((sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE))
                    / (sqrt(sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)))
                     * sqrt(sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)))))
                    * 1000000) / 1000000 AS sim
           FROM cand c
           JOIN embeddings a ON a.vec_id = c.qid
           JOIN embeddings b ON b.vec_id = c.nid
           CROSS JOIN range(1, 65) r(i)
           WHERE c.hrk <= 20
           GROUP BY 1, 2, 3),
         ranked AS (
           SELECT qid, nid, ham, sim,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY sim DESC, nid ASC) AS rk
           FROM d)
         SELECT qid, CAST(rk AS INTEGER) AS rk, nid, ham,
                (round(sim*10000)/10000) AS sim
         FROM ranked WHERE rk <= 5
         ORDER BY qid ASC NULLS LAST, rk ASC NULLS LAST""")),

    // ------------------------------------------------------------- L3 (r)
    // MATRYOSHKA (MRL) two-stage retrieval — embeddings trained so every
    // prefix is itself an embedding: stage 1 scores with only the FIRST
    // 16 of 64 dims (4× less I/O and FLOPs — at 100 TB the short prefix
    // is a separate, hot, column-pruned projection of the vector store),
    // keeps top-20 per query, stage 2 reranks those with the full-width
    // cosine. Both stage scores pre-round to 6dp before ranking so the
    // candidate cut and the final order are engine-identical. Same
    // funnel shape as l3_binary_quant but the cheap metric is a prefix
    // cosine instead of Hamming — the two compose (binary-quantized
    // prefix) in production.
    QueryDef("l3_matryoshka", (s, dir) => {
      val e = emb(s, dir)
        .withColumn("p16", expr("slice(embedding, 1, 16)"))
        .withColumn("n16", expr(
          "sqrt(CAST(vec_dot(p16, p16) AS DOUBLE))"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("norm").as("qn"), col("p16").as("qp"), col("n16").as("qn16"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("embedding").as("ne"),
          col("norm").as("nn"), col("p16").as("np"), col("n16").as("nn16"))
      val pw = Window.partitionBy(col("qid"))
        .orderBy(col("sim16").desc, col("nid").asc)
      val rw = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid").asc)
      q.crossJoin(c)
        .withColumn("sim16", expr(
          "round((vec_dot(qp, np) / (qn16 * nn16)) * 1000000) / 1000000"))
        .withColumn("prk", row_number().over(pw))
        .filter(col("prk") <= 20)
        .withColumn("sim", expr(
          "round((vec_dot(qe, ne) / (qn * nn)) * 1000000) / 1000000"))
        .withColumn("rk", row_number().over(rw))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("nid"),
          expr("round(sim16*10000)/10000").as("sim16"),
          expr("round(sim*10000)/10000").as("sim"))
        .orderBy(col("qid").asc_nulls_last, col("rk").asc_nulls_last)
    }, Some(
      """WITH s16 AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  round((sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE))
                    / (sqrt(sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)))
                     * sqrt(sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)))))
                    * 1000000) / 1000000 AS sim16
           FROM embeddings a
           JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10
           CROSS JOIN range(1, 17) r(i)
           GROUP BY 1, 2),
         cand AS (
           SELECT qid, nid, sim16,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY sim16 DESC, nid ASC) AS prk
           FROM s16),
         d AS (
           SELECT c.qid, c.nid, c.sim16,
                  round((sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE))
                    / (sqrt(sum(CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)))
                     * sqrt(sum(CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)))))
                    * 1000000) / 1000000 AS sim
           FROM cand c
           JOIN embeddings a ON a.vec_id = c.qid
           JOIN embeddings b ON b.vec_id = c.nid
           CROSS JOIN range(1, 65) r(i)
           WHERE c.prk <= 20
           GROUP BY 1, 2, 3),
         ranked AS (
           SELECT qid, nid, sim16, sim,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY sim DESC, nid ASC) AS rk
           FROM d)
         SELECT qid, CAST(rk AS INTEGER) AS rk, nid,
                (round(sim16*10000)/10000) AS sim16,
                (round(sim*10000)/10000) AS sim
         FROM ranked WHERE rk <= 5
         ORDER BY qid ASC NULLS LAST, rk ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (l)
    // URL CANONICALIZATION dedup — the first dedup any web-crawl
    // pipeline runs (before any content hashing): tracking params
    // (utm_*), fragments, host case, and trailing slashes make the SAME
    // resource crawl as many URLs. Two deterministic variants per doc
    // (one decorated, one bare) canonicalize to one URL by PARSING —
    // lowercase host, path sans trailing slash, surviving query param —
    // rather than fragile replace-chains; regexp_extract_all counts the
    // stripped tracking params. Everything is per-row regexp codegen
    // until ONE canonical-keyed aggregate + the bounded domain census —
    // the l1 exact-dedup shuffle shape with the canonical key standing
    // in for the content hash. At 100 TB this replaces content-hashing
    // half the crawl: dedup BEFORE fetch/decode, on keys of ~100 bytes.
    QueryDef("l5_url_canonicalize", (s, dir) => {
      val urls = t(s, dir, "documents")
        .select(col("doc_id"), explode(array(
          concat(lit("https://Host"), (col("doc_id") % 50).cast("string"),
            lit(".Example"), (col("doc_id") % 7).cast("string"),
            lit(".com/p/"), col("doc_id").cast("string"),
            lit("/?q=w"), (col("doc_id") % 13).cast("string"),
            lit("&utm_source=feed&utm_campaign=c"),
            (col("doc_id") % 3).cast("string"), lit("#frag")),
          concat(lit("https://host"), (col("doc_id") % 50).cast("string"),
            lit(".example"), (col("doc_id") % 7).cast("string"),
            lit(".com/p/"), col("doc_id").cast("string"),
            lit("?q=w"), (col("doc_id") % 13).cast("string"))))
          .as("url"))
      urls
        .withColumn("host",
          lower(regexp_extract(col("url"), "https://([^/?#]+)", 1)))
        .withColumn("path", regexp_replace(
          regexp_extract(col("url"), "https://[^/?#]+([^?#]*)", 1),
          "/$", ""))
        .withColumn("q",
          regexp_extract(col("url"), "[?&]q=([^&#]+)", 1))
        .withColumn("canonical",
          concat(lit("https://"), col("host"), col("path"),
            lit("?q="), col("q")))
        .withColumn("n_utm",
          expr("size(regexp_extract_all(url, '[?&](utm_[a-z]+)=', 1))"))
        .withColumn("domain",
          regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canonical")).as("n_canonical"),
          sum(col("n_utm").cast("long")).as("n_tracking_params"))
        .withColumn("dup_urls", col("n_urls") - col("n_canonical"))
        .orderBy(col("domain").asc_nulls_last)
    }, Some(
      """WITH u AS (
           SELECT doc_id, unnest([
             'https://Host' || CAST(doc_id % 50 AS VARCHAR) ||
             '.Example' || CAST(doc_id % 7 AS VARCHAR) ||
             '.com/p/' || CAST(doc_id AS VARCHAR) ||
             '/?q=w' || CAST(doc_id % 13 AS VARCHAR) ||
             '&utm_source=feed&utm_campaign=c' ||
             CAST(doc_id % 3 AS VARCHAR) || '#frag',
             'https://host' || CAST(doc_id % 50 AS VARCHAR) ||
             '.example' || CAST(doc_id % 7 AS VARCHAR) ||
             '.com/p/' || CAST(doc_id AS VARCHAR) ||
             '?q=w' || CAST(doc_id % 13 AS VARCHAR)]) AS url
           FROM documents),
         c AS (
           SELECT doc_id, url,
                  lower(regexp_extract(url, 'https://([^/?#]+)', 1)) AS host,
                  regexp_replace(
                    regexp_extract(url, 'https://[^/?#]+([^?#]*)', 1),
                    '/$', '') AS path,
                  regexp_extract(url, '[\?&]q=([^&#]+)', 1) AS q,
                  CAST(len(regexp_extract_all(url, '[\?&](utm_[a-z]+)=', 1))
                    AS INTEGER) AS n_utm
           FROM u),
         k AS (
           SELECT doc_id, n_utm,
                  'https://' || host || path || '?q=' || q AS canonical,
                  regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
           FROM c)
         SELECT domain, count(*) AS n_urls,
                count(DISTINCT canonical) AS n_canonical,
                CAST(sum(n_utm) AS BIGINT) AS n_tracking_params,
                count(*) - count(DISTINCT canonical) AS dup_urls
         FROM k GROUP BY domain
         ORDER BY domain ASC NULLS LAST""")),

    // ------------------------------------------------------------- L4 (v)
    // RAKE KEYPHRASE extraction — the classic unsupervised phrase miner
    // (vocab seeding, doc tagging): candidate phrases are maximal
    // stopword-free token runs (gaps-and-islands on the stopword
    // breaks), word score = degree/frequency over phrase co-occurrence,
    // phrase score = Σ member word scores. Scores stay INTEGER: deg and
    // freq are exact counts, score_ppm = deg·1e6 div freq, and the
    // phrase sum is a BIGINT — no float summation, bit-identical
    // ranking. Shape: one doc-keyed window sort for islands, one
    // word-keyed agg for stats, one phrase-keyed agg for scores — at
    // 100 TB all keyed shuffles over token volume, no pair spaces.
    QueryDef("l4_rake_keyphrases", (s, dir) => {
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "tok")
        .withColumn("stop", col("tok").isin("the", "a", "of"))
        .withColumn("nsrn",
          count(when(!col("stop"), 1)).over(
            wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(!col("stop"))
        .withColumn("island", col("pos") - col("nsrn"))
      val phrases = toks
        .groupBy(col("doc_id"), col("island"))
        .agg(expr(
          """array_join(transform(array_sort(collect_list(struct(pos, tok))),
             x -> x.tok), ' ')""").as("phrase"),
          count(lit(1)).as("plen"))
        .filter(col("plen") >= 2)
      // r19 NOTE: a lazy cut here did NOT dedup the twin 0.99 s window
      // jobs — the word-stats and phrase-score branches materialize
      // concurrently and race the un-materialized checkpoint, each
      // computing it. Solo wall flat (parallel twins on idle cores).
      // Rejected, same boundary as l2_substring_dedup.
      val words = phrases
        .select(col("plen"), explode(split(col("phrase"), " ")).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .withColumn("score_ppm", expr("deg * 1000000L div freq"))
      phrases
        .groupBy(col("phrase")).agg(count(lit(1)).as("n_occ"),
          first(col("plen")).as("plen"))
        .select(col("phrase"), col("n_occ"),
          explode(split(col("phrase"), " ")).as("w"))
        .join(words.select(col("w"), col("score_ppm")), "w")
        .groupBy(col("phrase"), col("n_occ"))
        .agg(sum(col("score_ppm")).as("rake_ppm"))
        .orderBy(col("rake_ppm").desc, col("phrase").asc)
        .limit(20)
        .select(col("phrase"), col("n_occ"), col("rake_ppm"))
    }, Some(
      """WITH toks AS (
           SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
                  string_split(text, ' ')[CAST(u.pos AS INTEGER)] AS tok
           FROM documents,
                unnest(range(1, len(string_split(text, ' ')) + 1)) u(pos)),
         ns AS (
           SELECT doc_id, pos, tok,
                  tok IN ('the', 'a', 'of') AS stop,
                  count(CASE WHEN NOT (tok IN ('the', 'a', 'of'))
                    THEN 1 END) OVER
                    (PARTITION BY doc_id ORDER BY pos ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS nsrn
           FROM toks),
         isl AS (
           SELECT doc_id, pos, tok, pos - nsrn AS island
           FROM ns WHERE NOT stop),
         phrases AS (
           SELECT doc_id, island,
                  string_agg(tok, ' ' ORDER BY pos) AS phrase,
                  CAST(count(*) AS BIGINT) AS plen
           FROM isl GROUP BY 1, 2
           HAVING count(*) >= 2),
         words AS (
           SELECT u.w, CAST(count(*) AS BIGINT) AS freq,
                  CAST(sum(p.plen) AS BIGINT) AS deg
           FROM phrases p, unnest(string_split(p.phrase, ' ')) u(w)
           GROUP BY 1),
         ws AS (SELECT w, (deg * 1000000) // freq AS score_ppm FROM words),
         ph AS (
           SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ
           FROM phrases GROUP BY 1),
         pw AS (
           SELECT ph.phrase, ph.n_occ, u.w
           FROM ph, unnest(string_split(ph.phrase, ' ')) u(w))
         SELECT pw.phrase, pw.n_occ,
                CAST(sum(ws.score_ppm) AS BIGINT) AS rake_ppm
         FROM pw JOIN ws ON pw.w = ws.w
         GROUP BY pw.phrase, pw.n_occ
         ORDER BY rake_ppm DESC, phrase ASC
         LIMIT 20""")),

    // ------------------------------------------------------------- L4 (w)
    // JENSEN-SHANNON DIVERGENCE between two sources' unigram
    // distributions — the symmetric, bounded [0, ln 2] corpus
    // comparator (PSI diverges on empty buckets; JS is what mixture
    // curation actually optimizes). P and Q are Laplace-smoothed token
    // shares over the UNION vocabulary from exact counts; M = (P+Q)/2;
    // JS = (KL(P‖M) + KL(Q‖M))/2 with per-token contributions rounded
    // 6dp and the top movers reported alongside the whole-corpus
    // divergence. ONE token-keyed aggregate with conditional counts —
    // the d7 shuffle shape; vocab-sized frames after.
    QueryDef("l4_js_divergence", (s, dir) => {
      val toks = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w"))
        .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c0"),
          sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c1"))
      val tot = broadcast(toks.agg(sum(col("c0")).as("t0"),
        sum(col("c1")).as("t1"), count(lit(1)).as("v")))
      toks.crossJoin(tot)
        .withColumn("p", expr(
          "CAST(c0 + 1 AS DOUBLE) / CAST(t0 + v AS DOUBLE)"))
        .withColumn("q", expr(
          "CAST(c1 + 1 AS DOUBLE) / CAST(t1 + v AS DOUBLE)"))
        .withColumn("m", expr("(p + q) / 2.0D"))
        .withColumn("contrib", expr(
          "round(((p * ln(p / m) + q * ln(q / m)) / 2.0D) * 100000000) / 100000000"))
        .withColumn("js", expr(
          "round((sum(contrib) OVER ()) * 1000000) / 1000000"))
        .select(col("w"), col("c0"), col("c1"), col("contrib"), col("js"))
        .orderBy(col("contrib").desc, col("w").asc)
        .limit(20)
    }, Some(
      """WITH toks AS (
           SELECT w,
                  CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c0,
                  CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1
           FROM (SELECT source, unnest(string_split(text, ' ')) AS w
                 FROM documents WHERE source IN ('src0', 'src1'))
           GROUP BY 1),
         tot AS (
           SELECT CAST(sum(c0) AS BIGINT) AS t0,
                  CAST(sum(c1) AS BIGINT) AS t1,
                  CAST(count(*) AS BIGINT) AS v
           FROM toks),
         pq AS (
           SELECT w, c0, c1,
                  CAST(c0 + 1 AS DOUBLE) / CAST(t0 + v AS DOUBLE) AS p,
                  CAST(c1 + 1 AS DOUBLE) / CAST(t1 + v AS DOUBLE) AS q
           FROM toks CROSS JOIN tot),
         c AS (
           SELECT w, c0, c1,
                  round(((p * ln(p / ((p + q) / 2.0))
                    + q * ln(q / ((p + q) / 2.0))) / 2.0) * 100000000)
                    / 100000000 AS contrib
           FROM pq)
         SELECT w, c0, c1, contrib,
                round((sum(contrib) OVER ()) * 1000000) / 1000000 AS js
         FROM c
         ORDER BY contrib DESC, w ASC
         LIMIT 20""")),

    // ------------------------------------------------------------- L6 (d)
    // EMBEDDING DRIFT monitoring — d7's PSI lifted into vector space:
    // has the distribution of distances-to-centroid shifted between two
    // cohorts (labels 0-4 = reference, 5-9 = current)? The whole
    // pipeline is INTEGER-exact until the final PSI tree: dims quantize
    // to 1e-3-scaled BIGINTs, the global centroid is exact scaled dim
    // SUMS (never a float mean), each vector's squared distance is
    // Σ(qᵢ·n − Sᵢ)² in BIGINTs — order-insensitive, so the bucket
    // assignment (integer floor-div thresholds) is bit-identical across
    // engines with NO rounding leaps of faith. One posexplode dim agg
    // (64 rows) broadcast back as an array; per-row distance is a
    // codegen'd zip_with fold; ONE bucket-keyed shuffle; PSI = the d7
    // Laplace-smoothed float tree over exact counts. At 100 TB this is
    // the production embedding-health check: map-only scoring + a
    // 10-row report.
    QueryDef("l6_embedding_drift", (s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("q", expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      val dims = e.select(posexplode(col("q")))
        .groupBy(col("pos")).agg(sum(col("col")).as("sv"))
      val sArr = broadcast(dims.agg(
        expr("transform(array_sort(collect_list(struct(pos, sv))), x -> x.sv)")
          .as("sarr"))
        .crossJoin(broadcast(e.agg(count(lit(1)).as("n")))))
      val scored = e.crossJoin(sArr)
        .withColumn("dist2", expr(
          """aggregate(zip_with(q, sarr, (x, y) -> (x * n - y) * (x * n - y)),
             0L, (a, v) -> a + v)"""))
        // Headroom: dist2 ≤ 64·(2·1000·n)² — safe to n ≈ 2.6e6 vectors
        // per partition-of-analysis; larger corpora run the same census
        // per shard and merge counts (bucket sums are additive).
        // dist2 / (1000·n)² = squared L2; unit-ish vectors to a
        // near-zero centroid concentrate at ≈1 (measured 0.97-1.02), so
        // the bins window [0.96, 1.02) at 0.006 resolution:
        // bucket = clamp((1000·d² − 960) / 6)
        .withColumn("bucket", expr(
          """least(greatest((dist2 * 1000L - 960L * 1000000L * n * n)
               div (6L * 1000000L * n * n), 0L), 9L)"""))
        .withColumn("grp",
          when(col("label") < 5, "ref").otherwise("cur"))
      val b = scored.groupBy(col("bucket"))
        .agg(sum(when(col("grp") === "ref", 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("grp") === "cur", 1L).otherwise(0L)).as("n_cur"))
      val tot = broadcast(b.agg(sum(col("n_ref")).as("tot_ref"),
        sum(col("n_cur")).as("tot_cur"), count(lit(1)).as("nb")))
      b.crossJoin(tot)
        .withColumn("p", expr(
          "CAST(n_ref + 1 AS DOUBLE) / CAST(tot_ref + nb AS DOUBLE)"))
        .withColumn("qq", expr(
          "CAST(n_cur + 1 AS DOUBLE) / CAST(tot_cur + nb AS DOUBLE)"))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          expr("round(((p - qq) * ln(p / qq))*1000000)/1000000").as("contrib"),
          expr("round((sum((p - qq) * ln(p / qq)) OVER ())*1000000)/1000000")
            .as("psi"))
        .orderBy(col("bucket").asc_nulls_last)
    }, Some(
      """WITH q AS (
           SELECT vec_id, label,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                    AS q
           FROM embeddings),
         dims AS (
           SELECT u.pos,
                  CAST(sum(q.q[CAST(u.pos AS INTEGER)]) AS BIGINT) AS sv
           FROM q, unnest(range(1, 65)) u(pos)
           GROUP BY 1),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
         d AS (
           SELECT q.vec_id, q.label,
                  CAST(sum((q.q[CAST(dims.pos AS INTEGER)] * n.n - dims.sv)
                       * (q.q[CAST(dims.pos AS INTEGER)] * n.n - dims.sv))
                    AS BIGINT) AS dist2,
                  any_value(n.n) AS n
           FROM q CROSS JOIN n CROSS JOIN dims
           GROUP BY 1, 2),
         scored AS (
           SELECT CAST(least(greatest((dist2 * 1000 - 960 * 1000000 * n * n)
                      // (6 * 1000000 * n * n), 0), 9) AS BIGINT)
                    AS bucket,
                  CASE WHEN label < 5 THEN 'ref' ELSE 'cur' END AS grp
           FROM d),
         b AS (
           SELECT bucket,
                  CAST(sum(CASE WHEN grp = 'ref' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ref,
                  CAST(sum(CASE WHEN grp = 'cur' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cur
           FROM scored GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref,
                  CAST(sum(n_cur) AS BIGINT) AS tot_cur,
                  CAST(count(*) AS BIGINT) AS nb
           FROM b),
         c AS (
           SELECT bucket, n_ref, n_cur,
                  CAST(n_ref + 1 AS DOUBLE) / CAST(tot_ref + nb AS DOUBLE)
                    AS p,
                  CAST(n_cur + 1 AS DOUBLE) / CAST(tot_cur + nb AS DOUBLE)
                    AS qq
           FROM b CROSS JOIN tot)
         SELECT bucket, n_ref, n_cur,
                round(((p - qq) * ln(p / qq))*1000000)/1000000 AS contrib,
                round((sum((p - qq) * ln(p / qq)) OVER ())*1000000)/1000000
                  AS psi
         FROM c
         ORDER BY bucket ASC NULLS LAST""")),

    // ------------------------------------------------------------- L5 (m)
    // SPAN CORRUPTION (T5/UL2 denoising objective): mask ~15% of tokens
    // in hash-chosen positions, collapse CONSECUTIVE masked tokens into
    // one sentinel span, and emit the (corrupted input, span targets)
    // pair the seq2seq trainer consumes — corrupted = text with each
    // span replaced by <Xk>, targets = <Xk> followed by the span's
    // tokens. Mask choice is integer hashing (bit-identical engines);
    // span islands fall out of the classic gaps-and-islands trick
    // (pos − running-masked-count is constant exactly on a consecutive
    // masked run); reconstruction is an ordered string fold (the
    // struct-sort idiom / ORDER BY string_agg). ONE doc-keyed window
    // sort does everything — the same single-shuffle shape as l5
    // sequence packing; corpus-scale work is all per-row.
    QueryDef("l5_span_corruption", (s, dir) => {
      val wCum = Window.partitionBy(col("doc_id"))
        .orderBy(col("pos").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "tok")
        .withColumn("pos", col("pos") + 1)
        .withColumn("masked",
          expr("((doc_id * 1000003L + pos * 7919L) % 97) < 15"))
        .withColumn("mrn",
          sum(when(col("masked"), 1L).otherwise(0L)).over(wCum))
        .withColumn("span_start", col("masked") &&
          coalesce(!lag(col("masked"), 1).over(wDoc), lit(true)))
        .withColumn("span_id",
          sum(when(col("span_start"), 1L).otherwise(0L)).over(wCum))
        .withColumn("cpiece",
          when(!col("masked"), col("tok"))
            .when(col("span_start"),
              concat(lit("<X"), col("span_id").cast("string"), lit(">")))
            .otherwise(lit("")))
        .withColumn("tpiece",
          when(!col("masked"), lit(""))
            .when(col("span_start"),
              concat(lit("<X"), col("span_id").cast("string"), lit("> "),
                col("tok")))
            .otherwise(col("tok")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("masked").cast("long")).as("n_masked"),
          coalesce(max(col("span_id")), lit(0L)).as("n_spans"),
          expr("""substring(array_join(filter(
              transform(array_sort(collect_list(struct(pos, cpiece))),
                x -> x.cpiece), p -> p != ''), ' '), 1, 120)""")
            .as("corrupted_head"),
          expr("""substring(array_join(filter(
              transform(array_sort(collect_list(struct(pos, tpiece))),
                x -> x.tpiece), p -> p != ''), ' '), 1, 120)""")
            .as("targets_head"))
        .orderBy(col("doc_id").asc_nulls_last)
    }, Some(
      """WITH toks AS (
           SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
                  string_split(text, ' ')[CAST(u.pos AS INTEGER)] AS tok
           FROM documents,
                unnest(range(1, len(string_split(text, ' ')) + 1)) u(pos)),
         m AS (
           SELECT doc_id, pos, tok,
                  ((doc_id * 1000003 + pos * 7919) % 97) < 15 AS masked
           FROM toks),
         sp AS (
           SELECT doc_id, pos, tok, masked,
                  masked AND coalesce(NOT lag(masked) OVER w, TRUE)
                    AS span_start
           FROM m
           WINDOW w AS (PARTITION BY doc_id ORDER BY pos ASC)),
         ids AS (
           SELECT doc_id, pos, tok, masked, span_start,
                  sum(CASE WHEN span_start THEN 1 ELSE 0 END) OVER
                    (PARTITION BY doc_id ORDER BY pos ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS span_id
           FROM sp),
         pieces AS (
           SELECT doc_id, pos, masked, span_id,
                  CASE WHEN NOT masked THEN tok
                       WHEN span_start
                         THEN '<X' || CAST(span_id AS VARCHAR) || '>'
                       ELSE '' END AS cpiece,
                  CASE WHEN NOT masked THEN ''
                       WHEN span_start
                         THEN '<X' || CAST(span_id AS VARCHAR) || '> ' || tok
                       ELSE tok END AS tpiece
           FROM ids)
         SELECT doc_id, count(*) AS n_tokens,
                CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_masked,
                CAST(coalesce(max(span_id), 0) AS BIGINT) AS n_spans,
                substr(coalesce(string_agg(cpiece, ' ' ORDER BY pos)
                  FILTER (WHERE cpiece <> ''), ''), 1, 120)
                  AS corrupted_head,
                substr(coalesce(string_agg(tpiece, ' ' ORDER BY pos)
                  FILTER (WHERE tpiece <> ''), ''), 1, 120)
                  AS targets_head
         FROM pieces GROUP BY doc_id
         ORDER BY doc_id ASC NULLS LAST""")),

    // ------------------------------------------------------------- L2 (o)
    // CONTENT-DEFINED CHUNKING dedup (the rsync/FastCDC idea at the
    // token level): chunk boundaries are picked by a rolling hash over a
    // 3-token window (cut where h % 16 == 0), so an insertion or
    // deletion only perturbs the chunks it touches — unlike fixed-width
    // chunking, where one dropped token shifts EVERY later boundary and
    // kills dedup (exactly what the planted last-token-dropped mutants
    // demonstrate: their chunk sets re-align after the edit). The shared
    // chunk census then finds sub-document duplication that whole-doc
    // hashing misses. All integer hashing → boundaries are bit-identical
    // across engines; the pipeline is map-only lambda expressions until
    // ONE chunk-keyed aggregate. At 100 TB chunks are hashed to 16-byte
    // keys before the shuffle (here the text rides along for the
    // readable census) and the census join back to docs is a bounded
    // hot-chunk broadcast.
    QueryDef("l2_cdc_chunks", (s, dir) => {
      TextFunctions.cdcChunkRows(corpusWithDups(s, dir), "doc_id", "text")
        .groupBy(col("chunk"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= 2)
        .withColumn("n_toks", expr("size(split(chunk, ' '))"))
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("chunk").asc)
        .limit(20)
    }, Some(
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id,
                  array_to_string(list_slice(string_split(text, ' '), 1,
                    len(string_split(text, ' ')) - 1), ' ') AS text
           FROM documents WHERE doc_id < 20),
         base AS (
           SELECT doc_id, string_split(text, ' ') AS toks,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM corpus),
         tv AS (
           SELECT doc_id, toks, n,
                  list_transform(toks, w ->
                    CAST(length(w)*131 + ascii(substr(w,1,1)) AS BIGINT)) AS tv
           FROM base),
         cu AS (
           SELECT doc_id, toks,
                  list_concat(list_concat(
                    [CAST(0 AS BIGINT)],
                    CASE WHEN n >= 3 THEN
                      list_filter(list_transform(range(3, n + 1), i ->
                        CASE WHEN ((tv[CAST(i-2 AS INTEGER)]*131
                                    + tv[CAST(i-1 AS INTEGER)])*131
                                   + tv[CAST(i AS INTEGER)])
                                  % 1000000007 % 16 = 0
                                  AND i < n THEN i END),
                        x -> x IS NOT NULL)
                    ELSE [] END),
                    [n]) AS cuts
           FROM tv),
         chunks AS (
           SELECT doc_id, u.chunk FROM cu,
             unnest(list_transform(range(2, len(cuts) + 1), j ->
               array_to_string(list_slice(toks,
                 CAST(cuts[CAST(j-1 AS INTEGER)] + 1 AS INTEGER),
                 CAST(cuts[CAST(j AS INTEGER)] AS INTEGER)), ' ')))
             u(chunk))
         SELECT chunk, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(count(*) AS BIGINT) AS n_occ,
                CAST(len(string_split(chunk, ' ')) AS INTEGER) AS n_toks
         FROM chunks GROUP BY chunk
         HAVING count(DISTINCT doc_id) >= 2
         ORDER BY n_docs DESC, n_occ DESC, chunk ASC
         LIMIT 20"""))
  )
}

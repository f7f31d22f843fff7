package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED MinHash-LSH dedup index — the production shape of near-dup
  * detection over a growing corpus. The in-query form
  * ([[graft.functions.Dedup.minHashCandidates]]) re-hashes the whole
  * corpus per run; at crawl scale the corpus side must be a STANDING
  * INDEX: band signatures live in a DeltaLite table, a new batch probes
  * it with one band-equality join, and maintenance appends only the
  * batch's own bands. This is the AnnIndex build/serve split applied to
  * dedup:
  *  - build: one corpus pass → (id, band_idx, band_hash), a DeltaLite
  *    table partitioned by band_idx (bounded partition count = band
  *    count; probes shuffle on (band_idx, band_hash) equality);
  *  - probe: batch bands ⋈ index bands (equality only — never
  *    all-pairs), candidate ids verified by EXACT Jaccard computed over
  *    the CANDIDATE docs alone (a semi-join pulls just their text: the
  *    verify cost is O(candidates), not O(corpus));
  *  - append: O(batch) — the batch's band rows land as a partitioned
  *    append; the next probe sees them with zero rebuild. Commits ride
  *    the DeltaLite log, so index maintenance inherits time travel,
  *    OPTIMIZE, and concurrent-append resolution like any table.
  *
  * Signatures come from the minhash_agg TypedImperativeAggregate, so
  * index rows are engine-specific (rows-only correctness family: the
  * l2_dedup_index census + DedupSpec pin behavior). */
object DedupIndex {

  /** Build the index table from the corpus. Returns the table version.
    *
    * The table is deliberately UNPARTITIONED with `band_idx` as a plain
    * data column: every probe joins ALL bands by construction (a batch
    * emits one row per band), so band-partition pruning can never fire
    * on the serve path — while the Hive layout costs a per-partition
    * scan branch in every probe's plan (8 branches + a union planned
    * per micro-batch; measured as the dominant slice of the crawl
    * gate's warm per-batch plan time). One relation plans once. The
    * probe shuffles on (band_idx, band_hash) equality either way. */
  def build(spark: SparkSession, corpus: DataFrame, id: String,
      text: String, indexPath: String, numHashes: Int = 32,
      bands: Int = 8): Long = {
    val banded = graft.functions.Dedup
      .bandedSignatures(corpus, id, text, numHashes, bands)
      .withColumnRenamed(id, "doc_id")
    graft.sources.DeltaLite.create(spark, indexPath, banded)
  }

  /** Append a batch's bands — O(batch), no rebuild. With `app` set the
    * write is an idempotent [[graft.sources.DeltaLite.appendOnce]]
    * keyed on (app, txnVersion), so a streaming gate replaying a batch
    * after a partial failure never double-appends bands. */
  def append(spark: SparkSession, batch: DataFrame, id: String,
      text: String, indexPath: String, numHashes: Int = 32,
      bands: Int = 8, app: String = null,
      txnVersion: Long = -1L): Long =
    appendBands(spark, graft.functions.Dedup
      .bandedSignatures(batch, id, text, numHashes, bands)
      .withColumnRenamed(id, "doc_id"), indexPath, app, txnVersion)

  /** Append PRE-COMPUTED band rows (`doc_id`, `band_idx`, `band_hash`) —
    * the shared-work entry the crawl gate uses: one banding pass per
    * micro-batch feeds the probe AND this append instead of re-hashing
    * the batch per consumer. */
  def appendBands(spark: SparkSession, banded: DataFrame,
      indexPath: String, app: String = null, txnVersion: Long = -1L): Long =
    if (app == null)
      graft.sources.DeltaLite.append(spark, indexPath, banded)
    else
      graft.sources.DeltaLite.appendOnce(spark, indexPath, banded,
        app, txnVersion)

  /** Probe the index with a batch: per batch doc, the smallest doc id —
    * indexed OR earlier in the SAME batch — whose EXACT Jaccard clears
    * `threshold` (NULL = new). The in-batch pass is the crawl-gate
    * closure: two fresh documents that duplicate each other but nothing
    * in the corpus resolve keep-min-id (the smaller id survives as
    * "new", the larger points at it), so admitting the batch never
    * ingests both copies. Candidates stay equality-join generated on
    * both paths (batch bands ⋈ index bands, batch bands ⋈ batch bands —
    * never all-pairs); `corpusText` supplies indexed candidates' text
    * for the verify step — only rows matching a candidate id are read
    * (semi-join semantics), in-batch partners verify against the
    * batch's own text; at scale both are keyed lookups, not corpus
    * scans. Returns (id, near_dup_of). */
  def probe(spark: SparkSession, batch: DataFrame, corpusText: DataFrame,
      id: String, text: String, indexPath: String, threshold: Double,
      numHashes: Int = 32, bands: Int = 8,
      preBands: Option[DataFrame] = None,
      preSets: Option[DataFrame] = None,
      lap: String => Unit = _ => ()): DataFrame = {
    // The probe references the batch's band rows THREE times (index
    // candidates + both sides of the self-join) and its shingle sets
    // three more (verify, partner sets, sizes) — without a lineage cut
    // each reference re-shingles and re-minhashes the batch, and the
    // measured gate wall was exactly that recompute, not commit
    // latency. Both frames are batch-sized; the cut materializes each
    // once and every later reference reads blocks. Cuts go through
    // [[graft.Frames.cut]]: default localCheckpoint (snapshot-exact,
    // executor-liveness-bound), `spark.graft.cut.mode=replicated` for
    // clusters with executor churn — see Frames for the trade.
    // `preBands` lets the gate hand in bands it also appends — one
    // banding pass per micro-batch TOTAL.
    val probeBands = preBands.getOrElse(graft.Frames.cut(
      graft.functions.Dedup
        .bandedSignatures(batch, id, text, numHashes, bands)))
    val index = graft.sources.DeltaLite.read(spark, indexPath)
      .select(col("doc_id").as("__eid"), col("band_idx").as("__ebi"),
        col("band_hash").as("__ebh"))
    lap("probe_index_read") // snapshot replay + branch-scan construction
    // the batch's id set, shared by BOTH batch-membership rules below
    // (candidate-level and text-level) — one frame, so the two rules
    // stay provably identical and the dedup aggregate plans once
    val batchIds = batch.select(col(id).as("eid")).distinct()
    // Index partners that are THEMSELVES in the current batch are
    // excluded (keyed anti-join, O(candidates)): in-batch pairs belong
    // to the self-candidate path below, which enforces keep-min-id by
    // construction. The index can hold current-batch ids two ways — a
    // re-crawled id (indexed by an earlier batch) or a REPLAY after a
    // crash that committed the index append before the verdicts append
    // (the three sink appends overlap) — and in both cases the
    // undirected index hit would add the REVERSED pair (min-id doc
    // flagged as a dup of the max-id doc), marking both copies dup and
    // losing the document. This anti-join is the membership-level twin
    // of the "batch text wins" rule below, and it is what makes every
    // replay interleaving of the three overlapped appends safe.
    // DBP probe hint on the BAND JOIN alone: the batch side spans
    // ALL band indexes by construction (every doc emits one row per
    // band), so the plan-time dim probe on this join can never prune
    // an index branch — skip it (measured as pure per-compile job
    // overhead). Applied directly to the join so nested or downstream
    // joins (the batch-membership anti-join below) keep their normal
    // pruning eligibility.
    val bandJoin = graft.plans.DynamicBranchPruning.skipProbes(
      probeBands.join(index,
        col("band_idx") === col("__ebi") &&
          col("band_hash") === col("__ebh") &&
          col(id) =!= col("__eid")))
    val idxCand = bandJoin
      .select(col(id), col("__eid").as("eid"))
      .join(batchIds, Seq("eid"), "left_anti")
      // a using-column join moves the join column FIRST; restore (id,
      // eid) order or the positional union with selfCand swaps the pair
      .select(col(id), col("eid"))
    // in-batch candidates: band-equality self-join, strictly-smaller
    // partner ids only (keep-min-id; each unordered pair appears once)
    val selfCand = probeBands.join(
        probeBands.select(col(id).as("__sid"),
          col("band_idx").as("__sbi"), col("band_hash").as("__sbh")),
        col("band_idx") === col("__sbi") &&
          col("band_hash") === col("__sbh") &&
          col("__sid") < col(id))
      .select(col(id), col("__sid").as("eid"))
    // candidate pairs feed candIds, the verify join AND (through
    // candIds) two semi-joins — cut here or the whole candidate
    // cascade (two band joins + anti-join) recomputes per reference
    val cand = graft.Frames.cut(idxCand.union(selfCand).distinct())
    lap("probe_cand") // index-read + band-join subtree planned (cut)
    // verify with exact Jaccard over shingles of the candidates only:
    // indexed partners' text from the corpus, in-batch partners' text
    // from the batch itself (shingleSets rows are distinct, so the
    // union-distinct stays a true set even if an id existed in both)
    val candIds = cand.select(col("eid")).distinct()
    val candCorpus = corpusText
      .join(candIds, corpusText(id) === col("eid"), "left_semi")
    // `preSets` mirrors `preBands`: the gate hands in the one shingle
    // pass its banding already materialized — no second shingling tree
    val inSets = preSets.getOrElse(graft.Frames.cut(
      graft.functions.TextFunctions.shingleSets(batch, id, text)))
    if (preSets.isEmpty)
      lap("probe_in_sets") // batch shingling subtree planned (cut)
    // Partner text resolves per eid with BATCH text winning: a
    // re-crawled id (present in both the corpus and this batch, possibly
    // with different text) must verify against its current batch text
    // only — unioning both versions' shingles would inflate the partner
    // set size and deflate Jaccard, silently missing real near-dups.
    // Corpus text serves only ids absent from the batch (keyed
    // anti-join, O(candidates)).
    val exSets = graft.functions.TextFunctions
      .shingleSets(candCorpus, id, text)
      .select(col(id).as("eid"), col("shingle"))
      .join(batchIds, Seq("eid"), "left_anti")
    val selfSets = inSets
      .join(candIds, inSets(id) === col("eid"), "left_semi")
      .select(col(id).as("eid"), col("shingle"))
    // referenced by the intersection join and the size agg — cut, or
    // the corpus semi-join + shingling cascade runs twice
    val partnerSets = graft.Frames.cut(exSets.union(selfSets).distinct())
    lap("probe_partner_sets") // corpus semi-join + shingling planned (cut)
    val inter = inSets.join(cand, Seq(id))
      .join(partnerSets, Seq("eid", "shingle"))
      .groupBy(col(id), col("eid")).agg(count(lit(1)).as("__inter"))
    val szE = partnerSets.groupBy(col("eid")).agg(count(lit(1)).as("__sze"))
    val szI = inSets.groupBy(col(id)).agg(count(lit(1)).as("__szi"))
    val hits = inter.join(szE, "eid").join(szI, id)
      .filter(col("__inter").cast("double") /
        (col("__szi") + col("__sze") - col("__inter")) >= threshold)
      .groupBy(col(id)).agg(min(col("eid")).as("near_dup_of"))
    batch.select(col(id)).distinct()
      .join(hits, Seq(id), "left")
      .select(col(id), col("near_dup_of"))
  }
}

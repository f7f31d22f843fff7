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

  /** Build the index table from the corpus. Returns the table version. */
  def build(spark: SparkSession, corpus: DataFrame, id: String,
      text: String, indexPath: String, numHashes: Int = 32,
      bands: Int = 8): Long = {
    val banded = graft.functions.Dedup
      .bandedSignatures(corpus, id, text, numHashes, bands)
      .withColumnRenamed(id, "doc_id")
    graft.sources.DeltaLite.create(spark, indexPath, banded,
      partitionBy = Seq("band_idx"))
  }

  /** Append a batch's bands — O(batch), no rebuild. */
  def append(spark: SparkSession, batch: DataFrame, id: String,
      text: String, indexPath: String, numHashes: Int = 32,
      bands: Int = 8): Long = {
    val banded = graft.functions.Dedup
      .bandedSignatures(batch, id, text, numHashes, bands)
      .withColumnRenamed(id, "doc_id")
    graft.sources.DeltaLite.append(spark, indexPath, banded)
  }

  /** Probe the index with a batch: per batch doc, the smallest indexed
    * doc id whose EXACT Jaccard clears `threshold` (NULL = new).
    * `corpusText` supplies candidate docs' text for the verify step —
    * only rows matching a candidate id are read (semi-join semantics);
    * at scale that is a keyed lookup, not a corpus scan. Returns
    * (id, near_dup_of). */
  def probe(spark: SparkSession, batch: DataFrame, corpusText: DataFrame,
      id: String, text: String, indexPath: String, threshold: Double,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val probeBands = graft.functions.Dedup
      .bandedSignatures(batch, id, text, numHashes, bands)
    val index = graft.sources.DeltaLite.read(spark, indexPath)
      .select(col("doc_id").as("__eid"), col("band_idx").as("__ebi"),
        col("band_hash").as("__ebh"))
    val cand = probeBands.join(index,
        col("band_idx") === col("__ebi") &&
          col("band_hash") === col("__ebh") &&
          col(id) =!= col("__eid"))
      .select(col(id), col("__eid").as("eid")).distinct()
    // verify with exact Jaccard over shingles of the candidates only
    val candCorpus = corpusText
      .join(cand.select(col("eid")).distinct(),
        corpusText(id) === col("eid"), "left_semi")
    val exSets = graft.functions.TextFunctions
      .shingleSets(candCorpus, id, text)
      .select(col(id).as("eid"), col("shingle"))
    val inSets = graft.functions.TextFunctions.shingleSets(batch, id, text)
    val inter = inSets.join(cand, Seq(id))
      .join(exSets, Seq("eid", "shingle"))
      .groupBy(col(id), col("eid")).agg(count(lit(1)).as("__inter"))
    val szE = exSets.groupBy(col("eid")).agg(count(lit(1)).as("__sze"))
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

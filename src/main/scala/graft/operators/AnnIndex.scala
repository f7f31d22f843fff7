package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Dedup
import graft.sources.DeltaLite

/** Persisted ANN index — the build-once / query-many serving pattern the
  * in-query ANN paths (`l3_ann_ivf`, `l3_ann_pq`, `l3_ann_ivfpq`) compose
  * into for production: at 100 TB nobody retrains coarse cells or
  * re-encodes the corpus per query. `build` runs the expensive pipeline
  * ONCE — sample-trained IVF centroids + PQ codebooks, distributed
  * encode — and persists three DeltaLite tables under one index root:
  *
  *   <root>/codes      (nid, cell, pq0..pq{m-1})  PARTITIONED BY cell
  *   <root>/centroids  (cell, c_emb)              k rows
  *   <root>/codebooks  (subspace, code, cw)       m × kCodes rows
  *
  * Because `codes` is partitioned by the IVF cell, a query's probe list
  * becomes a partition BOUND: serving reads only the probed cells' files
  * straight from the commit log (log-level pruning, zero listing of the
  * other cells). `append` encodes a new corpus batch under the SAME
  * frozen centroids/codebooks and lands it as a partitioned append —
  * index maintenance is O(batch), no retrain, no rewrite; the log gives
  * the index snapshot isolation and time travel for free.
  *
  * Reference surface: the vector-search/dedup pipeline family of
  * `/root/reference/README.md:1-2` (no code in the snapshot); the
  * build/serve split is the standard FAISS/SCaNN deployment shape. */
object AnnIndex {

  private def codesPath(root: String) = s"$root/codes"
  private def centersPath(root: String) = s"$root/centroids"
  private def booksPath(root: String) = s"$root/codebooks"

  /** Train (bounded driver-side samples) + encode (distributed) + persist.
    * One pass over `corpus` for the encode; the only collect is the
    * training sample inside ivfTrain/pqTrain. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
      idCol: String, embCol: String, cells: Int = 16, m: Int = 8,
      kCodes: Int = 16, dim: Int = 64, seed: Long = 42L): Unit = {
    import spark.implicits._
    val centers = Dedup.ivfTrain(corpus, embCol, cells, seed)
    val cb = Dedup.pqTrain(corpus, embCol, m, kCodes, dim, seed)
    // optimized write: codes shuffle on `cell` before the write, so each
    // cell dir holds ONE file per commit instead of a sliver from every
    // encode task — the serve path then opens exactly one file per
    // probed cell. The property persists in the table metadata, so
    // incremental append() commits bin-pack the same way for free.
    DeltaLite.create(spark, codesPath(root),
      encode(corpus, idCol, embCol, centers, cb), partitionBy = Seq("cell"),
      properties = Map("graft.optimizeWrite" -> "true"))
    // float arrays land with containsNull=TRUE in the logged schema:
    // Spark's file sources force nullability on read, so a
    // containsNull=false log schema (toDF's default for Seq[Float])
    // can never round-trip through a read-modify-write (rebuild's
    // replaceWhere unions the read side with the replacement)
    DeltaLite.create(spark, centersPath(root),
      centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toSeq.toDF("cell", "c_emb")
        .select(col("cell"), col("c_emb").cast("array<float>")))
    DeltaLite.create(spark, booksPath(root),
      (for { j <- cb.indices; i <- cb(j).indices }
        yield (j, i, cb(j)(i).toSeq)).toDF("subspace", "code", "cw")
        .select(col("subspace"), col("code"), col("cw").cast("array<float>")))
    // the builder already holds the model it just persisted — seed the
    // serve-path cache so the first append/query skips the read-back
    seedModel(spark, root, centers, cb)
  }

  private def seedModel(spark: SparkSession, root: String,
      centers: Array[Array[Float]], cb: Array[Array[Array[Float]]]): Unit = {
    cachedAt(spark, centersPath(root))(centers)
    cachedAt(spark, booksPath(root))(cb)
  }

  /** Incremental index maintenance: encode a new batch under the FROZEN
    * centroids/codebooks and append it into the partitioned codes table —
    * O(batch) work, existing files untouched, no retraining. (Per the
    * IVF contract, cell balance degrades only if the data distribution
    * drifts far from the training sample — then rebuild.) */
  def append(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String, embCol: String): Unit =
    DeltaLite.append(spark, codesPath(root),
      encode(batch, idCol, embCol, loadCenters(spark, root),
        loadCodebooks(spark, root)))

  private def encode(corpus: DataFrame, idCol: String, embCol: String,
      centers: Array[Array[Float]],
      cb: Array[Array[Array[Float]]]): DataFrame =
    Dedup.pqEncode(
      Dedup.ivfAssign(corpus.select(col(idCol), col(embCol)), embCol, centers),
      embCol, cb)
      .select(col(idCol).as("nid") +: col("centroid").as("cell") +:
        cb.indices.map(j => col(s"pq$j")): _*)

  /** Serve top-k: probe each query's `probes` nearest cells (broadcast
    * centroid table), read ONLY the probed cells' partitions of the codes
    * table (the probe list is queries × probes ints — collecting it to
    * bound the scan is driver-side metadata work), ADC-re-rank inside
    * cells, keep k per query. No training, no corpus encode, no touch of
    * the un-probed partitions. Output: (qid, rk, nid, d2). */
  def query(spark: SparkSession, root: String, queries: DataFrame,
      qid: String, qEmbCol: String, probes: Int = 2,
      topK: Int = 3): DataFrame = {
    val centers = loadCenters(spark, root)
    val cb = loadCodebooks(spark, root)
    val probed = Dedup.ivfProbes(queries, qEmbCol, centers, probes)
      .select(col(qid), col(qEmbCol), col("centroid"))
    val wanted = probed.select(col("centroid")).distinct()
      .collect().map(_.getInt(0))
    require(wanted.nonEmpty, "no probe cells — empty query set?")
    // IN-set log-level pruning: the scan opens EXACTLY the probed cells'
    // partitions, not the covering [min, max] range — probing cells
    // {0, 7} must not read partitions 1..6 (at 100 TB with hundreds of
    // cells a covering range reads ~(max−min)/probes× more than needed).
    val codes = DeltaLite.scan(spark, codesPath(root),
      Seq(DeltaLite.ColumnBound.in("cell", wanted.toSeq.sorted)))
    val w = Window.partitionBy(col(qid))
      .orderBy(col("d2").asc, col("nid").asc)
    codes.join(probed, col("cell") === col("centroid"))
      .withColumn("d2", Dedup.pqAdcDistance(col(qEmbCol), cb))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col(qid), col("rk"), col("nid"), col("d2"))
  }

  // -------------------------------------------------- drift maintenance

  /** Per-cell vector counts from the COMMIT LOG ALONE — each codes file
    * carries its row count and `cell` partition value in its add
    * action, so occupancy is a driver-side fold over log metadata:
    * ZERO data files opened, O(files) not O(vectors). The 100 TB drift
    * check costs the same as a `DESCRIBE`. */
  def cellOccupancy(spark: SparkSession, root: String): Map[Int, Long] =
    DeltaLite.snapshot(codesPath(root)).files
      .groupBy(_.pv.getOrElse("cell", ""))
      .collect { case (c, fs) if c.nonEmpty && c != "__HIVE_DEFAULT_PARTITION__" =>
        c.toInt -> fs.map(_.rows).sum }

  /** Occupancy skew = max cell count / MEAN over ALL k trained cells
    * (k from the centroids table's own log row count — also metadata).
    * 1.0 = perfectly balanced; a never-assigned cell still drags the
    * mean down, so one-sided drift (every new vector landing in one
    * cell) inflates this fast. */
  def occupancySkew(spark: SparkSession, root: String): Double = {
    val occ = cellOccupancy(spark, root)
    val k = DeltaLite.snapshot(centersPath(root)).totalRows
    if (occ.isEmpty || k == 0L) return 1.0
    val mean = occ.values.sum.toDouble / k
    if (mean == 0.0) 1.0 else occ.values.max / mean
  }

  /** The MEASURED retrain trigger (the IVF contract: frozen quantizers
    * degrade only when the data distribution drifts from the training
    * sample — and drift shows up as cell-occupancy skew, because new
    * vectors pile into whichever cells sit nearest the drifted mass).
    * `append` freely until this fires; then [[rebuild]]. Pure log
    * metadata — safe to evaluate on every batch. */
  def needsRetrain(spark: SparkSession, root: String,
      maxSkew: Double = 4.0): Boolean =
    occupancySkew(spark, root) > maxSkew

  /** Retrain on the CURRENT corpus and re-encode — the drift response.
    * Lands as new VERSIONS of the same three tables (full-table
    * replaceWhere), so serving flips atomically per table and time
    * travel still reads the pre-rebuild index. The caller supplies the
    * raw vectors (PQ codes are lossy — an index cannot re-derive its
    * own training data). */
  def rebuild(spark: SparkSession, root: String, corpus: DataFrame,
      idCol: String, embCol: String, cells: Int = 16, m: Int = 8,
      kCodes: Int = 16, dim: Int = 64, seed: Long = 42L): Unit = {
    import spark.implicits._
    val centers = Dedup.ivfTrain(corpus, embCol, cells, seed)
    val cb = Dedup.pqTrain(corpus, embCol, m, kCodes, dim, seed)
    DeltaLite.replaceWhere(spark, codesPath(root), lit(true),
      encode(corpus, idCol, embCol, centers, cb))
    // the replacement frames are built AGAINST THE TABLES' OWN logged
    // schemas: a fresh toDF types float arrays containsNull=false while
    // the stored schema may differ only in that bit — an "identical"
    // type the alignment cast still rejects
    import scala.jdk.CollectionConverters._
    def rowsDf(path: String, rows: Seq[org.apache.spark.sql.Row]) =
      spark.createDataFrame(rows.asJava, DeltaLite.snapshot(path).schema)
    DeltaLite.replaceWhere(spark, centersPath(root), lit(true),
      rowsDf(centersPath(root), centers.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(i, c.toSeq) }.toSeq))
    DeltaLite.replaceWhere(spark, booksPath(root), lit(true),
      rowsDf(booksPath(root), (for { j <- cb.indices; i <- cb(j).indices }
        yield org.apache.spark.sql.Row(j, i, cb(j)(i).toSeq))))
    seedModel(spark, root, centers, cb)
  }

  // Model cache (r19): the serving pattern pins the quantizer in memory
  // instead of re-collecting it from the model tables on every append/
  // query — one lifecycle was paying FOUR serial collect jobs for a few
  // KB of floats it had just written. Keyed on (session, table path,
  // table VERSION): any append/rebuild advances the version and misses;
  // weak session keys let a stopped session unpin. Never keyed on input
  // data — this caches the persisted model, not results, and a fresh
  // index root (every query execution builds its own) starts cold.
  private val modelCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, Long), AnyRef]]())

  private def cachedAt[T <: AnyRef](spark: SparkSession, path: String)
      (load: => T): T = {
    val v = DeltaLite.snapshot(path).version
    val m = modelCache.synchronized {
      var c = modelCache.get(spark)
      if (c == null) {
        c = scala.collection.concurrent.TrieMap.empty[(String, Long), AnyRef]
        modelCache.put(spark, c)
      }
      c
    }
    m.getOrElseUpdate((path, v), load).asInstanceOf[T]
  }

  /** k × dim centroid table back from the index (KBs — plan-literal
    * sized, same shape ivfTrain returns). */
  def loadCenters(spark: SparkSession, root: String): Array[Array[Float]] =
    cachedAt(spark, centersPath(root)) {
      DeltaLite.read(spark, centersPath(root)).orderBy(col("cell"))
        .collect().map(_.getSeq[Float](1).toArray)
    }

  /** m × kCodes × (dim/m) PQ codebooks back from the index. */
  def loadCodebooks(spark: SparkSession,
      root: String): Array[Array[Array[Float]]] =
    cachedAt(spark, booksPath(root)) {
      val rows = DeltaLite.read(spark, booksPath(root))
        .orderBy(col("subspace"), col("code")).collect()
      val m = rows.map(_.getInt(0)).max + 1
      Array.tabulate(m)(j => rows.filter(_.getInt(0) == j)
        .map(_.getSeq[Float](2).toArray))
    }
}

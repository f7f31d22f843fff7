package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Near-duplicate detection for training-data curation (SURVEY.md §2.9 L2
  * and the builder prompt): MinHash+LSH and SimHash, both fully
  * shuffle-based and deterministic (hashes are seeded xxhash64 — never
  * rand()).
  *
  * Scale design (the point of these over exact jaccard): candidate
  * generation is an EQUALITY join on band/chunk hashes — shuffle cost
  * O(|docs| × bands), never the O(n²) pair space. At 100 TB: documents
  * hash-partition by band key; skew (a degenerate band bucket, e.g. empty
  * docs) is bounded by dropping buckets above a size cap, the standard
  * guard. Verification of candidates is exact Jaccard via
  * [[TextFunctions.exactJaccard]], also join-based.
  */
object Dedup {

  // ------------------------------------------------------------- MinHash-LSH

  /** MinHash signatures: `numHashes` permutations h_i(s) = xxhash64(i, s)
    * min-reduced per doc — ONE [[MinHashAgg]] typed-imperative aggregate
    * (primitive long[numHashes] buffer, merge = elementwise min),
    * bit-identical to the 32-column `min(xxhash64(lit(i), shingle))`
    * expression form it replaces (parity asserted in DedupSpec) without
    * the wide-projection codegen compile. Output keeps the m0..mN-1
    * column shape. */
  def minHashSignature(
      sets: DataFrame, id: String, numHashes: Int): DataFrame = {
    GraftFunctions.register(sets.sparkSession)
    sets.groupBy(col(id))
      .agg(call_function("minhash_agg", col("shingle"), lit(numHashes)).as("__sig"))
      .select(col(id) +:
        (0 until numHashes).map(i => col("__sig").getItem(i).as(s"m$i")): _*)
  }

  /** LSH banding: group the signature into `bands` bands of
    * numHashes/bands rows each, hash each band, and emit candidate pairs
    * that collide in ≥1 band. Probability of a collision ≈ 1-(1-j^r)^b for
    * true Jaccard j — with 32 hashes, 8 bands × 4 rows the S-curve
    * midpoint sits near j ≈ 0.6. */
  /** The long (id, band_idx, band_hash) frame behind LSH banding —
    * shared by in-query candidate generation ([[minHashCandidates]])
    * and the persisted dedup index ([[graft.operators.DedupIndex]]). */
  def bandedSignatures(corpus: DataFrame, id: String, text: String,
      numHashes: Int = 32, bands: Int = 8): DataFrame =
    bandedSignaturesFromSets(TextFunctions.shingleSets(corpus, id, text),
      id, numHashes, bands)

  /** [[bandedSignatures]] from ALREADY-COMPUTED shingle rows — the
    * shared-subtree entry the crawl gate uses: one shingling pass per
    * micro-batch feeds the probe's verify joins AND the banding (the
    * gate previously shingled twice — once for inSets, once inside the
    * banding — paying the explode and an extra planned tree). */
  def bandedSignaturesFromSets(sets: DataFrame, id: String,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val sig = minHashSignature(sets, id, numHashes)
    val bandCols = (0 until bands).map { b =>
      xxhash64(((b * rows) until ((b + 1) * rows)).map(j => col(s"m$j")) :+ lit(b): _*)
        .as(s"b$b")
    }
    sig.select(col(id) +: bandCols: _*)
      .unpivot(Array(col(id)), (0 until bands).map(b => col(s"b$b")).toArray,
        "band_idx", "band_hash")
  }

  def minHashCandidates(
      corpus: DataFrame, id: String, text: String,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val banded = bandedSignatures(corpus, id, text, numHashes, bands)
    banded.as("x")
      .join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("ida"), col(s"y.$id").as("idb"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → exact-Jaccard verify
    * → pairs above threshold. */
  def minHashNearDups(
      corpus: DataFrame, id: String, text: String,
      threshold: Double, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val sets = TextFunctions.shingleSets(corpus, id, text)
    val cand = minHashCandidates(corpus, id, text, numHashes, bands)
    TextFunctions.exactJaccard(cand, sets, id)
      .filter(col("jaccard") >= threshold)
  }

  // ----------------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc, carried as two 32-bit halves (`hi`, `lo`).
    * Feature hash = xxhash64(3-shingle) — shingles, not tokens: with a
    * small shared vocabulary token SETS collapse to near-identical
    * fingerprints for every doc (measured on the fixtures), while the
    * shingle space is |vocab|³ and discriminates. Bit j weight ±1; sign
    * of the per-bit sum forms the fingerprint. One explode + ONE
    * [[SimHashAgg]] typed-imperative aggregate (replacing a 64-aggregate
    * codegen'd projection that cost ~6-8 s of janino compile on first
    * run — see SimHashAgg scaladoc; output bit-identical). */
  def simHash(corpus: DataFrame, id: String, text: String): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    TextFunctions.shingleSets(corpus, id, text)
      .withColumn("h", xxhash64(col("shingle")))
      .groupBy(col(id))
      .agg(call_function("simhash_agg", col("h")).as("sh"))
      .select(col(id), col("sh.lo").as("lo"), col("sh.hi").as("hi"))
  }

  /** SimHash near-dup candidates: 8 × 8-bit chunk bands — by pigeonhole,
    * any pair within hamming distance ≤ 7 of 64 bits agrees on ≥1 chunk
    * EXACTLY (guaranteed recall), and ≤ 2·maxHamming pairs still collide
    * with high probability; chance collisions are filtered by the exact
    * hamming verify via bit_count(xor). Calibrated on the fixtures: 4 ×
    * 16-bit banding missed 3/20 planted pairs (hamming 7-9 spread across
    * all four chunks); 8 × 8-bit finds them. */
  def simHashNearDups(
      corpus: DataFrame, id: String, text: String,
      maxHamming: Int = 6): DataFrame = {
    val sh = simHash(corpus, id, text)
    val chunkExprs = (0 until 4).map(c =>
      shiftright(col("lo"), 8 * c).bitwiseAND(lit(0xFFL))) ++
      (0 until 4).map(c =>
        shiftright(col("hi"), 8 * c).bitwiseAND(lit(0xFFL)))
    val chunks = sh.select(col(id), col("lo"), col("hi"),
      array(chunkExprs: _*).as("chunks"))
      .select(col(id), col("lo"), col("hi"),
        posexplode(col("chunks")).as(Seq("chunk_idx", "chunk_val")))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("ida"), col(s"y.$id").as("idb"),
        (bit_count(col("x.lo").bitwiseXOR(col("y.lo"))) +
          bit_count(col("x.hi").bitwiseXOR(col("y.hi")))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over near-dup pairs — the CLUSTER-level dedup
    * decision: each doc gets the minimum doc-id of its duplicate group as
    * `component`, so "keep one per group" is `filter(id === component)`.
    * Iterative min-label propagation: labels flow along edges until a
    * fixpoint (≤ graph-diameter rounds; near-dup graphs are
    * small-diameter clusters, so a handful). Each round is one keyed
    * shuffle — at 100 TB this is the standard large-graph CC shape
    * (label propagation / hash-min), with the driver doing only the
    * convergence check. Caches the frontier per round and unpersists. */
  def connectedComponents(pairs: DataFrame, ida: String = "ida",
      idb: String = "idb", maxIter: Int = 20,
      maxDriverEdges: Long = 500000L): DataFrame = {
    // undirected edges, both directions
    val edges = pairs.select(col(ida).as("src"), col(idb).as("dst"))
      .unionByName(pairs.select(col(idb).as("src"), col(ida).as("dst")))
      .distinct().cache()
    // The near-dup graph is a SLIVER of the corpus (duplicate pairs, not
    // documents): when the deduped edge set is boundedly small, finish
    // with a driver-side union-find — O(E α(E)) in milliseconds versus
    // several sequential shuffle rounds, the same bounded-driver-work
    // pattern as pqTrain/ivfTrain. The count() below materializes the
    // edge cache either way, so the check costs one row-count action.
    // Above the bound (a genuinely huge dup graph at 100 TB) the
    // distributed hash-min + pointer-jump loop below is the scale path.
    val nEdges = edges.count()
    if (nEdges <= maxDriverEdges) {
      val idType = pairs.schema(pairs.columns.indexOf(ida)).dataType
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      def lt(a: Any, b: Any): Boolean =
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      edges.collect().foreach { row =>
        val a = row.get(0); val b = row.get(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        // union-by-min: the root of a set is always its minimum, so the
        // final representative needs no second pass
        if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      val out = parent.keySet().asScala.toSeq
        .map(id => org.apache.spark.sql.Row(id, find(id)))
      edges.unpersist()
      return pairs.sparkSession.createDataFrame(out.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("component", idType))))
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).cache()
    // Hash-min round = ONE join + ONE keyed agg (the node's own label
    // rides the union, so no second join to merge it back), then a
    // POINTER-JUMP: each node re-resolves its label through the label's
    // own label (component := label(component)). The jump doubles the
    // hop distance covered per round, so convergence is O(log diameter)
    // instead of O(diameter) — the Hash-to-Min trick; on the near-dup
    // graphs this roughly halves the sequential round count, which is
    // the whole cost at bench scale (per-round job overhead dominates).
    // Labels are always node ids (init = own id, min over node ids), so
    // the jump join always finds its target; left+coalesce keeps it
    // total regardless. Convergence is read off the label sum: labels
    // are non-increasing per node, so an unchanged sum IS the fixpoint —
    // a one-row action instead of a change-detection join. Decimal sum:
    // id-space may be 64-bit hashes, keep the witness overflow-free.
    def labelSum(df: DataFrame): Any =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head.get(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prop = edges.join(labels, col("dst") === col("id"))
        .select(col("src"), col("component"))
        .unionByName(labels.select(col("id").as("src"), col("component")))
        .groupBy(col("src")).agg(min(col("component")).as("component"))
        .select(col("src").as("id"), col("component"))
      val next = prop.as("a")
        .join(prop.select(col("id").as("cid"), col("component").as("ccomp")).as("b"),
          col("a.component") === col("b.cid"), "left")
        .select(col("a.id"), coalesce(col("ccomp"), col("a.component")).as("component"))
        .cache()
      val curSum = labelSum(next)
      converged = curSum == prevSum
      prevSum = curSum
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    // Hand back an eager localCheckpoint and drop the cache-manager entry:
    // a returned .cache() would pin its blocks in the cache manager until
    // an explicit unpersist that no caller can reasonably own (repeat
    // invocations were observed to degrade the whole session as leaked
    // blocks accumulated). Checkpoint blocks are freed by the
    // ContextCleaner as soon as the result is unreferenced.
    val out = labels.localCheckpoint(true)
    labels.unpersist()
    out
  }

  // ------------------------------------------------- Hyperplane-LSH ANN

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64-seeded — no
    * Math.random, reproducible across runs/JVMs). */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Float]] =
    Array.tabulate(nPlanes, dim)((j, i) =>
      (splitmix(j.toLong * dim + i).toDouble / Long.MaxValue).toFloat)

  /** Train the IVF coarse quantizer ONCE, DRIVER-SIDE, on a bounded
    * deterministic sample (the FAISS pattern, same as [[pqTrain]]):
    * k-means centroids converge on far less data than the full corpus, so
    * ≤ `sampleLimit` vectors come to the driver and `iters` seeded Lloyd
    * passes cost milliseconds — zero Spark jobs beyond the one sample
    * collect, vs dozens of distributed Lloyd jobs for an in-query mllib
    * `.fit` (measured 11.7 s solo / 140 s under concurrent load at
    * sf0.1). The k × dim float table then rides to executors as a plan
    * literal — train once, assign everywhere; never re-fit per
    * batch/query. */
  def ivfTrain(train: DataFrame, embCol: String, k: Int,
      seed: Long = 42L, sampleLimit: Int = 4096,
      iters: Int = 12): Array[Array[Float]] = {
    // cast up front: the embedding column may arrive as array<double> /
    // array<int> — without the cast the sample unboxing ClassCastExceptions
    val sample = train.select(col(embCol).cast("array<float>"))
      .limit(sampleLimit).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.nonEmpty, "ivfTrain needs a non-empty training sample")
    lloyd(sample, k, iters, seed).map(_.map(_.toFloat))
  }

  /** Assign every vector its nearest centroid id under pre-trained
    * centroids (no fit here — reuse one table across all batches). Pure
    * codegen'd expression: argmin over k (distance, idx) structs reduced
    * by array_min (lexicographic struct order → ties to the lower idx,
    * deterministic), distances via vec_dot with the row-constant ‖e‖²
    * term dropped. Search then probes only same-centroid candidates —
    * vectors hash-partition by centroid, each probe is an equality-join
    * lookup. Returns the input plus a `centroid` int column. */
  def ivfAssign(df: DataFrame, embCol: String,
      centers: Array[Array[Float]]): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.withColumn("centroid", argminCell(col(embCol), centers).getField("i"))
  }

  /** Shared argmin-over-centroids expression: ONE k×dim literal walked by
    * `transform((c, i) -> struct(d, i))` instead of k unrolled per-centroid
    * struct branches. Same arithmetic node for node (vec_dot(c,c) −
    * 2·vec_dot(e,c), index tiebreak via lexicographic struct array_min),
    * so scores and winners are bit-identical — but the expression tree is
    * O(1) in k, not O(k·dim): the unrolled form embedded k separate
    * vec_dot pairs + dim-float literals that Catalyst re-walked on every
    * rule pass and codegen inlined into one huge method (at k=16/dim=64,
    * pqEncode's 8 subspaces stacked 128 vec_dots into one Project;
    * measured 4.7 s/run of plan+compile overhead on l3_ann_pq at sf0.1,
    * repeatable — not a one-time JIT cost). The lambda runs interpreted
    * per element, but k·|rows| evals of an 8-64-dim dot are microseconds
    * of real work next to seconds of tree overhead (guide §4: expression
    * choice; §1.2: fix per-task work only after the shape is right). */
  private def argminCell(e: Column,
      centers: Array[Array[Float]]): Column =
    array_min(transform(typedLit(centers), (c, i) =>
      struct((call_function("vec_dot", c, c) -
        lit(2.0) * call_function("vec_dot", e, c)).as("d"),
        i.as("i"))))

  /** Convenience train-and-assign for demos/tests — production code calls
    * [[ivfTrain]] once and [[ivfAssign]] per batch. */
  def ivfAssign(df: DataFrame, embCol: String, k: Int,
      seed: Long = 42L): DataFrame =
    ivfAssign(df, embCol, ivfTrain(df, embCol, k, seed))

  /** Multi-probe IVF: each vector gets its `probes` nearest centroid ids
    * (probe rank 1 = the primary cell), so a query-side probe list joined
    * against corpus-side primary cells raises recall at the cost of
    * `probes`× candidates — still an equality join, never a scan. The
    * centroid table is k rows and broadcast; distances use the codegen'd
    * vec_dot (‖e−c‖² = e·e − 2e·c + c·c). Output: input + `centroid`
    * (probe cell) and `probe_rk` (1..probes). */
  def ivfProbes(df: DataFrame, embCol: String,
      centers: Array[Array[Float]], probes: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // MAP-SIDE expansion, zero joins and zero shuffles: the centroid
    // table rides as ONE plan literal (same argminCell transform shape as
    // [[ivfAssign]] — O(1) expression tree in k), each row scores all k
    // cells, array_sort picks its `probes` nearest (struct order:
    // distance, then cell id — ties deterministic), posexplode emits them
    // with their probe rank. The ‖e‖² term is row-constant and drops from
    // the ordering.
    val scored = transform(typedLit(centers), (c, i) =>
      struct((call_function("vec_dot", c, c) -
        lit(2.0) * call_function("vec_dot", col(embCol), c)).as("d"),
        i.as("i")))
    df.select(col("*"),
        posexplode(slice(array_sort(scored), 1, probes)).as(Seq("__pos", "__probe")))
      .withColumn("centroid", col("__probe").getField("i"))
      .withColumn("probe_rk", (col("__pos") + 1).cast("int"))
      .drop("__pos", "__probe")
  }

  /** Margin-scored bitext mining over IVF-BUCKETED candidates — the
    * 100 TB-shaped twin of the exact `l6_bitext_mining` query (same
    * margin/rank machinery, same 1e6 integer sim lattice), with the
    * corpus×corpus cartesian replaced by the FAISS-style candidate
    * plan every other similarity operator here uses: source docs
    * multi-probe their `probes` nearest coarse cells ([[ivfProbes]]),
    * target docs sit in their primary cell ([[ivfAssign]]), and
    * candidates come from the CELL-EQUALITY JOIN — shuffle cost
    * O(|src|·probes + |tgt|), never |src|×|tgt|. Ranks, top-4
    * neighborhood sums, and the ratio margin (Artetxe & Schwenk 2019)
    * then evaluate on the candidate frame: mutual-top-1 within
    * candidates, margins normalized by candidate neighborhoods — the
    * standard mined-corpus approximation, whose recall on true
    * translation pairs is pinned by DedupSpec's planted-pair proof
    * (pairs co-bucket because a translation pair's vectors are close,
    * and multi-probe covers cell-boundary splits).
    *
    * `src` carries (qid, qe, qn), `tgt` (nid, ne, nn) — embedding +
    * precomputed L2 norm per side. Output: (qid, nid, ssim, margin_ppm)
    * for mutual-top-1 pairs, best margin first. */
  def bitextMineIvf(src: DataFrame, tgt: DataFrame,
      centers: Array[Array[Float]], probes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qp = ivfProbes(src, "qe", centers, probes).drop("probe_rk")
    val cp = ivfAssign(tgt, "ne", centers).withColumnRenamed("centroid", "cc")
    // each (qid, nid) pair appears AT MOST ONCE: the query side's probe
    // cells are distinct and the target side has one primary cell
    val sims = qp.join(cp, col("centroid") === col("cc"))
      .select(col("qid"), col("nid"),
        expr("""CAST(round((vec_dot(qe, ne) / (qn * nn) + 1.0D)
                * 1000000) AS BIGINT)""").as("ssim"))
      .localCheckpoint(false) // computed once, feeds both rank directions
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
  }

  // ------------------------------------------------- product quantization

  /** Product-quantization codebooks: split the `dim`-D space into `m`
    * subspaces of dim/m dims and train `k` codewords PER subspace (seeded
    * k-means over the subvector slices — train ONCE, on a sample at
    * scale). The result is an m × k × (dim/m) float table, a few KB,
    * shipped to executors as a plan literal. 64-dim float vectors (256 B)
    * encode to m=8 nibble-sized codes: the code table for a billion
    * vectors fits in executor memory, and an asymmetric-distance (ADC)
    * scan reads m small ints + m table lookups per candidate instead of
    * 64 cold floats — the FAISS-style third ANN scale path next to
    * hyperplane LSH and IVF. At full scale this composes as IVF-PQ:
    * coarse cells from [[ivfTrain]] cut the candidate set, ADC re-ranks
    * inside the probed cells. */
  def pqTrain(train: DataFrame, embCol: String, m: Int = 8, k: Int = 16,
      dim: Int = 64, seed: Long = 42L, sampleLimit: Int = 4096,
      iters: Int = 12): Array[Array[Array[Float]]] = {
    val sub = dim / m
    require(m * sub == dim, s"dim $dim must split evenly into $m subspaces")
    // Codebooks train DRIVER-SIDE on a bounded sample (the FAISS
    // pattern: a few thousand vectors saturate 16-codeword subspace
    // quantizers). The sample is the ONLY data that reaches the driver
    // — m seeded Lloyd runs over ≤ sampleLimit × dim floats cost
    // milliseconds, vs seconds of per-fit job overhead for distributed
    // k-means at this size. Encode and ADC stay fully distributed.
    // cast for type tolerance (array<double>/array<int> inputs), as ivfTrain
    val sample = train.select(col(embCol).cast("array<float>"))
      .limit(sampleLimit).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "pqTrain needs a non-empty training sample")
    Array.tabulate(m) { j =>
      val pts = sample.map(v =>
        java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub).map(_.toDouble))
      lloyd(pts, k, iters, seed + j).map(_.map(_.toFloat))
    }
  }

  /** Standard Lloyd iterations with splitmix-seeded init (deterministic
    * across runs/JVMs — no Math.random); empty clusters re-seed from a
    * seeded point pick. */
  private def lloyd(pts: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    val n = pts.length
    val d = pts(0).length
    def pick(s: Long): Array[Double] =
      pts((((splitmix(s) % n) + n) % n).toInt).clone()
    var cs = Array.tabulate(k)(i => pick(seed + i))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k, d)(0.0)
      val counts = new Array[Long](k)
      var p = 0
      while (p < n) {
        val v = pts(p)
        var best = 0; var bd = Double.MaxValue; var i = 0
        while (i < k) {
          var dist = 0.0; var x = 0
          while (x < d) { val t = v(x) - cs(i)(x); dist += t * t; x += 1 }
          if (dist < bd) { bd = dist; best = i }
          i += 1
        }
        var x = 0
        while (x < d) { sums(best)(x) += v(x); x += 1 }
        counts(best) += 1
        p += 1
      }
      cs = Array.tabulate(k) { i =>
        if (counts(i) == 0) pick(seed + 1000 + it * k + i)
        else {
          val c = new Array[Double](d)
          var x = 0
          while (x < d) { c(x) = sums(i)(x) / counts(i); x += 1 }
          c
        }
      }
      it += 1
    }
    cs
  }

  /** Encode every vector as its per-subspace nearest-codeword ids
    * (columns `pq0..pq{m-1}`). argmin is a pure expression: an array of
    * (distance, idx) structs reduced by `array_min` (struct ordering is
    * lexicographic, so ties break on the lower idx — deterministic).
    * The ‖s‖² term is constant per subvector and dropped from the argmin. */
  def pqEncode(df: DataFrame, embCol: String,
      codebooks: Array[Array[Array[Float]]]): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    // per subspace: one k×sub literal + the shared argminCell transform
    // (see its doc) instead of k unrolled struct branches — m=8, k=16
    // unrolled stacked 128 vec_dot nodes into ONE Project, whose per-run
    // plan+codegen overhead dominated l3_ann_pq/_ivfpq/_index.
    val codeCols = (0 until m).map { j =>
      val s = slice(col(embCol), j * sub + 1, sub)
      argminCell(s, codebooks(j)).getField("i").as(s"pq$j")
    }
    df.select(df.columns.map(col).toSeq ++ codeCols: _*)
  }

  /** ADC (asymmetric distance): exact query subvectors against the
    * candidate's quantized codewords — Σ_j ‖q_j − c_j[code_j]‖². The
    * codebook rides as a nested literal; `element_at` resolves the
    * codeword per row, vec_dot (codegen) does the arithmetic. */
  def pqAdcDistance(query: Column, codebooks: Array[Array[Array[Float]]],
      codePrefix: String = "pq"): Column = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    (0 until m).map { j =>
      val s = slice(query, j * sub + 1, sub)
      val c = element_at(typedLit(codebooks(j)), col(s"$codePrefix$j") + 1)
      call_function("vec_dot", s, s) -
        lit(2.0) * call_function("vec_dot", s, c) +
        call_function("vec_dot", c, c)
    }.reduce(_ + _)
  }

  /** Sign-bucket id for an embedding column under `nPlanes` hyperplanes —
    * the IVF/LSH scale path for ANN (SURVEY §2.9 L3): candidates are
    * restricted to equal buckets, turning top-k search into an equality
    * join. Recall vs brute force is property-tested in the suite.
    * Requires [[GraftFunctions.register]] on the session (vec_dot). */
  def lshBucket(embedding: Column, nPlanes: Int, dim: Int): Column = {
    val planes = hyperplanes(nPlanes, dim)
    (0 until nPlanes).map { j =>
      when(call_function("vec_dot", embedding, typedLit(planes(j))) > 0,
        lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }
}

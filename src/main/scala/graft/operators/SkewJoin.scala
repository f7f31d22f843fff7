package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md "Partitioning & shuffle";
  * builder prompt "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split (on by default) handles MOST skew at runtime by
  * splitting oversized shuffle partitions — that is the first line of
  * defense and costs nothing here. Salting is the explicit fallback for
  * the case AQE can't fix: a SINGLE key so hot that one reducer's hash
  * bucket still explodes (e.g. a null-ish default key owning 10% of a
  * 100 TB fact table).
  *
  *   fact side:  salt = pmod(xxhash64(whole row id-ish cols), S)
  *               — deterministic, no rand(), spreads the hot key over S
  *               reducers
  *   dim side:   replicated S× (explode over 0..S-1)
  *   join on     (key, salt) — perfectly partitionable, no hot bucket.
  *
  * Cost model: dim side payload grows S×; use only when |dim| ≪ |fact|
  * (the usual skew shape). Result is row-identical to the plain join
  * (verified in OperatorSpec).
  */
object SkewJoin {

  /** @param fact      large, skewed side
    * @param dim       small side, replicated `salts`×
    * @param key       equality key column name (both sides)
    * @param salts     number of salt buckets (S)
    * @param saltFrom  fact columns that determine the salt (deterministic;
    *                  use high-cardinality cols, e.g. the row's id) */
  def salted(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltFrom: Seq[String]): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(salts.toLong)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim,
        saltedFact(key) === explodedDim(key) &&
          saltedFact("__salt") === explodedDim("__salt"))
      .drop(explodedDim(key)).drop("__salt")
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns, accumulating in
  * double with a strict left-to-right fold (index order) — the same
  * summation order as the higher-order-function form
  * `aggregate(zip_with(a,b,(x,y)->x*y),0D,+)` and as a sequential C++
  * loop, so results are bit-identical to the DuckDB oracle's per-index
  * sum (SURVEY.md §2.9 L3).
  *
  * Why a custom Catalyst Expression (SURVEY §2.10 preference order):
  * Spark's higher-order functions are interpreted per element
  * (CodegenFallback + lambda dispatch per item); for brute-force
  * similarity this expression is the hot inner loop over |pairs| × dim
  * elements, and doGenCode emits a tight primitive `for` loop inside
  * whole-stage codegen instead — no allocation, no virtual calls.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions; after
  * [[GraftFunctions.register]], `expr("vec_dot(a, b)")` resolves in SQL
  * and the DataFrame API alike. Sessions created with
  * `spark.sql.extensions=graft.GraftExtensions` get this automatically
  * ([[graft.GraftExtensions]]); register() remains as the idempotent
  * fallback for externally-created sessions. */
object GraftFunctions {
  // Per-session fast path (r19, same treatment as Tables.registerAll):
  // register() is called from every operator constructor that needs
  // vec_dot & co., 16-wide under the concurrent bench, and each call
  // paid the object-global lock plus 16 registry lookups. One weak map
  // hit skips all of it after the first registration; weak keys let a
  // stopped session unpin. Metadata only — no plans or data cached.
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = {
    if (registered.containsKey(spark)) return
    registerSlow(spark)
    registered.put(spark, java.lang.Boolean.TRUE)
  }

  private def registerSlow(spark: SparkSession): Unit = synchronized {
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "vec_dot",
        (exprs: Seq[Expression]) => FloatVectorDot(exprs.head, exprs(1)),
        "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_agg"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "simhash_agg",
        (exprs: Seq[Expression]) => SimHashAgg(exprs.head),
        "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_agg"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "minhash_agg",
        graft.GraftExtensions.minHashBuilder,
        "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("quantile_sketch_agg"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "quantile_sketch_agg",
        graft.GraftExtensions.quantileSketchBuilder,
        "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("interleave_bits"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "interleave_bits",
        (exprs: Seq[Expression]) => InterleaveBits(exprs.head, exprs(1)),
        "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("collate_key"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "collate_key", graft.GraftExtensions.collateKeyBuilder, "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("soundex_code"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "soundex_code",
        (exprs: Seq[Expression]) => SoundexCode(exprs.head),
        "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("nysiis_code"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nysiis_code", Nysiis.builder, "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("metaphone_code"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "metaphone_code", Metaphone.builder, "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("dmetaphone_code"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "dmetaphone_code", DoubleMetaphone.builder, "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("dmetaphone_alt"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "dmetaphone_alt", DoubleMetaphone.altBuilder, "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("hilbert_index"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "hilbert_index",
        (exprs: Seq[Expression]) => HilbertIndex(exprs.head, exprs(1)),
        "scala_udf")
    }
    // the probe side of the runtime-filter bloom pair: might_contain(
    // bloomBinary, xxhash64(v)) — internal to Spark's InjectRuntimeFilter,
    // surfaced here so two-tier bloom-then-verify joins are expressible
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("might_contain"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "might_contain",
        (exprs: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            exprs(0), exprs(1)),
        "scala_udf")
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "jaro_winkler",
        (exprs: Seq[Expression]) => JaroWinklerSimilarity(exprs.head, exprs(1)),
        "scala_udf")
    }
    // Spark's own runtime-filter bloom aggregate (the engine behind
    // InjectRuntimeFilter), surfaced for DeltaLite's per-file bloom
    // indexes: bloom_agg(xxhash64(col), estItems, numBits) -> binary
    // readable with org.apache.spark.util.sketch.BloomFilter.readFrom.
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_agg"))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bloom_agg",
        (exprs: Seq[Expression]) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            exprs(0), exprs(1), exprs(2)).toAggregateExpression(),
        "scala_udf")
    }
  }
}

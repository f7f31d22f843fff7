package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatVectorDot, InterleaveBits, MinHashAgg, SimHashAgg}

/** Spark extension entry point (SURVEY.md §2.10 / builder prompt: custom
  * operators register via `SparkSessionExtensions`). Activate with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * and graft's native expressions resolve in SQL and the DataFrame API on
  * every session of the application — the library-quality alternative to
  * per-session [[graft.functions.GraftFunctions.register]] (which remains
  * as an idempotent fallback for sessions created without the config). */
object GraftExtensions {
  /** `minhash_agg(shingle[, numHashes])` — the optional second argument
    * must be a foldable int literal (it sizes the signature buffer). */
  val minHashBuilder: Seq[Expression] => Expression = {
    case Seq(shingle) => MinHashAgg(shingle)
    case Seq(shingle, n) =>
      MinHashAgg(shingle, n.eval().asInstanceOf[Number].intValue())
    case exprs => throw new IllegalArgumentException(
      s"minhash_agg expects 1 or 2 arguments, got ${exprs.length}")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Maintenance SQL (DESCRIBE HISTORY/DETAIL, VACUUM, OPTIMIZE) — the
    // graft statements parse in GraftSqlParser, all other SQL delegates
    // to Spark's parser untouched.
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (exprs: Seq[Expression]) => SimHashAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      GraftExtensions.minHashBuilder))
    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (exprs: Seq[Expression]) => InterleaveBits(exprs.head, exprs(1))))
  }
}

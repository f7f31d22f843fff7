package graft.functions

import java.text.Collator
import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Locale-aware collation sort key (DuckDB's ICU `COLLATE`, Delta/Spark
  * 4 string collations): `collate_key(s, 'en', 'primary')` maps a string
  * to a BINARY key whose unsigned byte order IS the locale's collation
  * order — so ORDER BY / range partitioning / min-max file skipping on
  * the key give locale-correct ordering with zero changes to the sort
  * machinery. Strengths follow `java.text.Collator` (public JDK — no ICU
  * dependency): 'primary' ignores case+accents, 'secondary' adds
  * accents, 'tertiary' (default) adds case, 'identical' is bit-strict.
  *
  * The key is computed ONCE per row and then sorts as plain bytes — at
  * 100 TB that beats a comparator-based sort (which re-runs the collator
  * O(n log n) times) and composes with every keyed operator. Locale and
  * strength must be literals: they pin a single collator identity per
  * expression, keeping codegen branch-free. Collator instances are NOT
  * thread-safe → one per (locale, strength) per thread via ThreadLocal.
  */
case class CollateKey(child: Expression, localeTag: String, strength: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"collate_key requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "collate_key"

  override protected def nullSafeEval(s: Any): Any =
    CollateKey.key(s.asInstanceOf[UTF8String].toString, localeTag, strength)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.CollateKey.key(
         |  $c.toString(), "$localeTag", $strength);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CollateKey =
    copy(child = newChild)
}

object CollateKey {
  val strengths: Map[String, Int] = Map(
    "primary" -> Collator.PRIMARY, "secondary" -> Collator.SECONDARY,
    "tertiary" -> Collator.TERTIARY, "identical" -> Collator.IDENTICAL)

  private val local =
    new ThreadLocal[java.util.HashMap[(String, Int), Collator]] {
      override def initialValue() = new java.util.HashMap
    }

  def key(s: String, tag: String, strength: Int): Array[Byte] = {
    val cache = local.get()
    var c = cache.get((tag, strength))
    if (c == null) {
      c = Collator.getInstance(Locale.forLanguageTag(tag))
      c.setStrength(strength)
      cache.put((tag, strength), c)
    }
    c.getCollationKey(s).toByteArray
  }
}

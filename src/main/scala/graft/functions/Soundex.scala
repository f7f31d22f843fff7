package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** American Soundex as a codegen Catalyst expression — the phonetic
  * BLOCKING key for record linkage (the coarse partner to
  * [[JaroWinklerSimilarity]]'s fine score: block candidate pairs on
  * equal phonetic codes, then score only within blocks — the same
  * equality-candidates-then-verify discipline as every dedup path in
  * this engine, so name matching at 100 TB never goes all-pairs).
  *
  * The classic algorithm (public NARA spec):
  *   - first letter kept (uppercased);
  *   - remaining letters map B/F/P/V→1, C/G/J/K/Q/S/X/Z→2, D/T→3, L→4,
  *     M/N→5, R→6; A/E/I/O/U/Y are vowels (code 0, dropped), H/W are
  *     SKIPPED ENTIRELY (adjacent same-coded letters separated only by
  *     H/W still merge — the rule most reimplementations get wrong);
  *   - adjacent duplicate codes collapse (including against the first
  *     letter's own code);
  *   - pad/truncate to letter + 3 digits.
  * Non-ASCII-letter leading characters yield NULL (no phonetic code);
  * non-letter characters inside are ignored. Pure per-row byte loop as
  * a static method inside whole-stage codegen.
  */
case class SoundexCode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"soundex_code requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "soundex_code"

  override protected def nullSafeEval(v: Any): Any =
    Soundex.code(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Soundex.code($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    res
  }

  override protected def withNewChildInternal(
      newChild: Expression): SoundexCode = copy(child = newChild)
}

object Soundex {

  // letter -> soundex digit ('0' = vowel/Y, '7' = H/W sentinel)
  private val codes: Array[Char] = {
    val a = new Array[Char](26)
    "AEIOUY".foreach(c => a(c - 'A') = '0')
    "BFPV".foreach(c => a(c - 'A') = '1')
    "CGJKQSXZ".foreach(c => a(c - 'A') = '2')
    "DT".foreach(c => a(c - 'A') = '3')
    a('L' - 'A') = '4'
    "MN".foreach(c => a(c - 'A') = '5')
    a('R' - 'A') = '6'
    "HW".foreach(c => a(c - 'A') = '7')
    a
  }

  /** NULL (as Java null) unless the input STARTS with an ASCII letter —
    * a blocking key for a value with no phonetic head is noise, and a
    * null key drops the row out of the equality join naturally. */
  def code(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    if (bytes.isEmpty || !isLetter(bytes(0))) return null
    val out = new Array[Byte](4)
    val first = upper(bytes(i))
    out(0) = first
    var lastCode = codes(first - 'A')
    if (lastCode == '7') lastCode = '0' // H/W first letter: no merge seed
    var n = 1
    i += 1
    while (i < bytes.length && n < 4) {
      val b = bytes(i)
      if (isLetter(b)) {
        val c = codes(upper(b) - 'A')
        if (c == '7') {
          // H/W: skipped entirely — lastCode survives, so same-coded
          // letters around H/W still merge
        } else if (c == '0') {
          lastCode = '0' // vowel: breaks the merge chain
        } else {
          if (c != lastCode) {
            out(n) = c.toByte
            n += 1
          }
          lastCode = c
        }
      } else {
        // non-letters: skipped entirely (like H/W) — lastCode survives,
        // so same-coded letters straddling punctuation still merge
        // (e.g. hyphenated surnames: Sack-Zack → S220, the blocking-
        // recall-preserving behavior the scaladoc documents)
      }
      i += 1
    }
    while (n < 4) { out(n) = '0'; n += 1 }
    UTF8String.fromBytes(out)
  }

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  private def upper(b: Byte): Byte =
    if (b >= 'a') (b - 32).toByte else b
}

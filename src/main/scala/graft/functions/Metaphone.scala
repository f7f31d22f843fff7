package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Metaphone phonetic key (Philips 1990) as a codegen Catalyst
  * expression — the third blocking key of the phonetic family
  * ([[SoundexCode]] coarse, [[NysiisCode]] finer, Metaphone the
  * pronunciation-model middle ground: digraph-aware consonant classes
  * instead of NYSIIS's letter rewrites). Same contract as the other
  * two: equality-join candidate blocks, [[JaroWinklerSimilarity]]
  * verifies — name matching at 100 TB never goes all-pairs.
  *
  * Rules implemented (the classic public rule set; this scaladoc is the
  * BINDING SPEC for the FunctionsSpec vectors — hand-computable):
  *  1. keep ASCII letters only, uppercased; NULL unless the input
  *     STARTS with an ASCII letter (the family's shared null contract).
  *  2. collapse adjacent duplicate letters, EXCEPT C.
  *  3. head transforms: AE→E, GN/KN/PN→(drop first), WR→R, WH→W, X→S.
  *  4. scan left-to-right over the transformed string (prev/next read
  *     the SAME string); vowels AEIOU emit only at position 0; else:
  *     B → B, silent when final after M (BOMB→BM)
  *     C → X on CIA/CH (but SCH→K), S before I/E/Y, else K
  *     D → J on DGE/DGY/DGI, else T
  *     G → silent on GH-without-following-vowel, on GN at end, and
  *         inside DGE/DGY/DGI (the D already said J); K on GH before a
  *         vowel; J before E/I/Y; else K
  *     H → silent after C/S/P/T/G (the digraph emitters) and after a
  *         vowel with no vowel following; else H
  *     K → silent after C; else K
  *     P → F on PH; else P     ·  Q → K  ·  V → F  ·  Z → S
  *     S → X on SH/SIO/SIA; else S
  *     T → X on TIO/TIA; 0 on TH; silent in TCH; else T
  *     W/Y → themselves before a vowel, else silent
  *     X → KS  ·  F/J/L/M/N/R → themselves
  *  5. UNTRUNCATED (the common 4-char cut only coarsens blocking;
  *     `metaphone_code(x, n)` truncates, n <= 0 keeps the full key —
  *     the same length contract as [[NysiisCode]], whose default is the
  *     interop cut; Metaphone has no single canonical length, so the
  *     default here is the full key).
  *
  * Vectors reproduced by this spec: KNIGHT→NT, PHONE→FN, CHURCH→XRX,
  * SCHOOL→SKL, WRIGHT→RT, JUDGE→JJ, BOMB→BM, SCIENCE→SSNS,
  * THOMPSON→0MPSN, XAVIER→SFR. Pure per-row byte loop as a static
  * method inside whole-stage codegen.
  */
case class MetaphoneCode(child: Expression, maxLen: Int = 0)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"metaphone_code requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "metaphone_code"

  override protected def nullSafeEval(v: Any): Any =
    Metaphone.code(v.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Metaphone.code($c, $maxLen);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): MetaphoneCode = copy(child = newChild)
}

object Metaphone {

  /** SQL builder shared by the two registration sites (GraftExtensions
    * + GraftFunctions.register — keep in sync): `metaphone_code(s)` =
    * full untruncated key; `metaphone_code(s, n)` truncates at n. */
  val builder: Seq[Expression] => MetaphoneCode = (exprs: Seq[Expression]) =>
    {
      if (exprs.isEmpty || exprs.size > 2)
        throw new IllegalArgumentException(
          s"metaphone_code expects 1 or 2 arguments, got ${exprs.size}")
      MetaphoneCode(exprs.head,
        if (exprs.size < 2) 0
        else exprs(1) match {
          case l: org.apache.spark.sql.catalyst.expressions.Literal
              if l.value != null =>
            l.value match {
              case i: Int => i
              case lg: Long => lg.toInt
              case sh: Short => sh.toInt
              case b: Byte => b.toInt
              case other => throw new IllegalArgumentException(
                s"metaphone_code: maxLen must be an integer literal, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"metaphone_code: maxLen must be a non-null integer literal, got $other")
        })
    }

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  private def isVowel(c: Char): Boolean =
    c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U'

  def code(s: UTF8String, maxLen: Int): UTF8String = {
    val bytes = s.getBytes
    if (bytes.isEmpty || !isLetter(bytes(0))) return null
    // 1. uppercase ASCII letters only
    val up = new java.lang.StringBuilder(bytes.length)
    var bi = 0
    while (bi < bytes.length) {
      val b = bytes(bi)
      if (isLetter(b)) up.append((if (b >= 'a') b - 32 else b).toChar)
      bi += 1
    }
    // 2. collapse adjacent duplicates except C
    val dd = new java.lang.StringBuilder(up.length)
    var di = 0
    while (di < up.length) {
      val c = up.charAt(di)
      if (di == 0 || c == 'C' || c != up.charAt(di - 1)) dd.append(c)
      di += 1
    }
    var n = dd.toString
    // 3. head transforms
    if (n.startsWith("AE")) n = n.substring(1)
    else if (n.startsWith("GN") || n.startsWith("KN") || n.startsWith("PN"))
      n = n.substring(1)
    else if (n.startsWith("WR")) n = n.substring(1)
    else if (n.startsWith("WH")) n = "W" + n.substring(2)
    else if (n.startsWith("X")) n = "S" + n.substring(1)
    // 4. scan
    val len = n.length
    def at(i: Int): Char = if (i >= 0 && i < len) n.charAt(i) else ' '
    val key = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) {
      val c = at(i); val prev = at(i - 1)
      val next = at(i + 1); val next2 = at(i + 2)
      val out: String = c match {
        case 'A' | 'E' | 'I' | 'O' | 'U' => if (i == 0) String.valueOf(c) else ""
        case 'B' => if (i == len - 1 && prev == 'M') "" else "B"
        case 'C' =>
          if (next == 'I' && next2 == 'A') "X"
          else if (next == 'H') { if (prev == 'S') "K" else "X" }
          else if (next == 'I' || next == 'E' || next == 'Y') "S"
          else "K"
        case 'D' =>
          if (next == 'G' && (next2 == 'E' || next2 == 'Y' || next2 == 'I'))
            "J"
          else "T"
        case 'G' =>
          if (next == 'H') { if (isVowel(next2)) "K" else "" }
          else if (next == 'N' && i + 2 == len) ""
          else if (prev == 'D' &&
            (next == 'E' || next == 'Y' || next == 'I')) ""
          else if (next == 'E' || next == 'I' || next == 'Y') "J"
          else "K"
        case 'H' =>
          if (prev == 'C' || prev == 'S' || prev == 'P' || prev == 'T' ||
            prev == 'G') ""
          else if (isVowel(prev) && !isVowel(next)) ""
          else "H"
        case 'K' => if (prev == 'C') "" else "K"
        case 'P' => if (next == 'H') "F" else "P"
        case 'Q' => "K"
        case 'S' =>
          if (next == 'H') "X"
          else if (next == 'I' && (next2 == 'O' || next2 == 'A')) "X"
          else "S"
        case 'T' =>
          if (next == 'I' && (next2 == 'O' || next2 == 'A')) "X"
          else if (next == 'H') "0"
          else if (next == 'C' && next2 == 'H') ""
          else "T"
        case 'V' => "F"
        case 'W' => if (isVowel(next)) "W" else ""
        case 'X' => "KS"
        case 'Y' => if (isVowel(next)) "Y" else ""
        case 'Z' => "S"
        case other => String.valueOf(other) // F J L M N R
      }
      key.append(out)
      i += 1
    }
    var outS = key.toString
    if (outS.isEmpty) return null
    if (maxLen > 0 && outS.length > maxLen) outS = outS.substring(0, maxLen)
    UTF8String.fromString(outS)
  }
}

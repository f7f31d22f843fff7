package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NYSIIS phonetic key (Taft 1970, New York State Identification and
  * Intelligence System) as a codegen Catalyst expression — the finer
  * phonetic BLOCKING key next to [[SoundexCode]]: NYSIIS keeps more
  * consonant structure (soundex's 4-char digit code collapses ~30% more
  * names), so it trades recall for precision in the same
  * block-then-verify linkage discipline. Same contract as soundex_code:
  * equality-join candidate blocks, [[JaroWinklerSimilarity]] verifies —
  * name matching at 100 TB never goes all-pairs.
  *
  * Rules implemented (the classic public algorithm; this scaladoc is
  * the binding spec for the FunctionsSpec vectors):
  *  1. keep ASCII letters only, uppercased; NULL unless the input
  *     STARTS with an ASCII letter (same null contract as soundex).
  *  2. head transforms: MAC→MCC, KN→N, K→C, PH→FF, PF→FF, SCH→SSS.
  *  3. tail transforms: EE→Y, IE→Y, DT/RT/RD/NT/ND→D.
  *  4. key starts with the (transformed) first letter; scan the rest
  *     left-to-right producing transformed chars — `prev` below is the
  *     most recently PRODUCED char:
  *       EV→AF · vowel(AEIOU)→A · Q→G · Z→S · M→N · KN→N · K→C ·
  *       SCH→SSS · PH→FF ·
  *       H→prev when prev or the next input char is a non-vowel
  *       (a missing next char counts as non-vowel) ·
  *       W→prev when prev is a vowel · else the char itself.
  *     Each produced char appends to the key unless it equals the
  *     key's current last char (adjacent dedup).
  *  5. final: drop trailing S, rewrite trailing AY→Y, drop trailing A.
  *  6. truncate to `maxLen` chars. The DEFAULT is the classic Taft
  *     6-char cut — keys interoperate with NYSIIS output from other
  *     record-linkage systems. `nysiis_code(x, 0)` keeps the full
  *     untruncated key (finer blocking, NOT interop-portable);
  *     `nysiis_code(x, n)` truncates to n.
  *
  * Reference vectors reproduced by this spec (shown UNTRUNCATED, i.e.
  * the `nysiis_code(x, 0)` form; the 1-arg default cuts them at 6 —
  * PHILLIPSON→FALAPS, FERGUSON→FARGAS, WASHINGTON→WASANG):
  * BROWN→BRAN, KNUTH→NAT, MACINTOSH→MCANT, PHILLIPSON→FALAPSAN,
  * FERGUSON→FARGASAN, JACKSON→JACSAN, WASHINGTON→WASANGTAN,
  * LAWSON→LASAN, DAY→DY, SCHMIDT→SNAD. Pure per-row byte loop as a static method inside
  * whole-stage codegen.
  */
case class NysiisCode(child: Expression, maxLen: Int = 6)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nysiis_code requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "nysiis_code"

  override protected def nullSafeEval(v: Any): Any =
    Nysiis.code(v.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Nysiis.code($c, $maxLen);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): NysiisCode = copy(child = newChild)
}

object Nysiis {

  /** SQL builder shared by the two registration sites (GraftExtensions
    * + GraftFunctions.register — keep in sync): `nysiis_code(s)` = the
    * classic interop 6-char Taft key; `nysiis_code(s, n)` truncates at
    * n; n <= 0 keeps the full untruncated key. n must be an integer
    * literal. */
  val builder: Seq[Expression] => NysiisCode = (exprs: Seq[Expression]) =>
    {
      if (exprs.isEmpty || exprs.size > 2)
        throw new IllegalArgumentException(
          s"nysiis_code expects 1 or 2 arguments, got ${exprs.size}")
      NysiisCode(exprs.head,
        if (exprs.size < 2) 6
        else exprs(1) match {
          case l: org.apache.spark.sql.catalyst.expressions.Literal
              if l.value != null =>
            l.value match {
              case i: Int => i
              case lg: Long => lg.toInt
              case sh: Short => sh.toInt
              case b: Byte => b.toInt
              case other => throw new IllegalArgumentException(
                s"nysiis_code: maxLen must be an integer literal, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"nysiis_code: maxLen must be a non-null integer literal, got $other")
        })
    }

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  private def isVowel(c: Char): Boolean =
    c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U'

  /** Classic interop form: 6-char Taft truncation. */
  def code(s: UTF8String): UTF8String = code(s, 6)

  /** maxLen <= 0 keeps the full untruncated key. */
  def code(s: UTF8String, maxLen: Int): UTF8String = {
    val bytes = s.getBytes
    if (bytes.isEmpty || !isLetter(bytes(0))) return null
    // 1. uppercase ASCII letters only
    val sb = new java.lang.StringBuilder(bytes.length)
    var bi = 0
    while (bi < bytes.length) {
      val b = bytes(bi)
      if (isLetter(b)) sb.append((if (b >= 'a') b - 32 else b).toChar)
      bi += 1
    }
    var n = sb.toString
    // 2. head transforms (first match wins)
    if (n.startsWith("MAC")) n = "MCC" + n.substring(3)
    else if (n.startsWith("KN")) n = "N" + n.substring(2)
    else if (n.startsWith("K")) n = "C" + n.substring(1)
    else if (n.startsWith("PH") || n.startsWith("PF")) n = "FF" + n.substring(2)
    else if (n.startsWith("SCH")) n = "SSS" + n.substring(3)
    // 3. tail transforms
    if (n.endsWith("EE") || n.endsWith("IE"))
      n = n.substring(0, n.length - 2) + "Y"
    else if (n.endsWith("DT") || n.endsWith("RT") || n.endsWith("RD") ||
        n.endsWith("NT") || n.endsWith("ND"))
      n = n.substring(0, n.length - 2) + "D"
    // 4. scan: key = first char; `prev` = most recently PRODUCED char
    val key = new java.lang.StringBuilder(n.length)
    key.append(n.charAt(0))
    var prev = n.charAt(0)
    var i = 1
    while (i < n.length) {
      val c = n.charAt(i)
      val next = if (i + 1 < n.length) n.charAt(i + 1) else ' '
      var produced: String = null
      var consumed = 1
      if (c == 'E' && next == 'V') { produced = "AF"; consumed = 2 }
      else if (isVowel(c)) produced = "A"
      else if (c == 'Q') produced = "G"
      else if (c == 'Z') produced = "S"
      else if (c == 'M') produced = "N"
      else if (c == 'K') {
        if (next == 'N') { produced = "N"; consumed = 2 }
        else produced = "C"
      }
      else if (c == 'S' && next == 'C' && i + 2 < n.length &&
          n.charAt(i + 2) == 'H') { produced = "SSS"; consumed = 3 }
      else if (c == 'P' && next == 'H') { produced = "FF"; consumed = 2 }
      else if (c == 'H') {
        // missing next (end of name) reads as non-vowel ' ', matching
        // the common reference implementations
        produced = if (!isVowel(prev) || !isVowel(next))
          String.valueOf(prev) else "H"
      }
      else if (c == 'W') {
        produced = if (isVowel(prev)) String.valueOf(prev) else "W"
      }
      else produced = String.valueOf(c)
      var pi = 0
      while (pi < produced.length) {
        val pc = produced.charAt(pi)
        if (key.charAt(key.length - 1) != pc) key.append(pc)
        prev = pc
        pi += 1
      }
      i += consumed
    }
    // 5. final: trailing S, trailing AY → Y, trailing A
    var out = key.toString
    if (out.length > 1 && out.endsWith("S")) out = out.substring(0, out.length - 1)
    if (out.endsWith("AY")) out = out.substring(0, out.length - 2) + "Y"
    if (out.length > 1 && out.endsWith("A")) out = out.substring(0, out.length - 1)
    if (maxLen > 0 && out.length > maxLen) out = out.substring(0, maxLen)
    UTF8String.fromString(out)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Double Metaphone (Philips 2000) as a codegen Catalyst expression —
  * the interop blocking key of the phonetic family ([[SoundexCode]]
  * coarse, [[NysiisCode]] finer, [[MetaphoneCode]] the 1990
  * pronunciation model, this one its multi-lingual successor). Philips'
  * revision emits TWO keys per name — a PRIMARY and an ALTERNATE
  * pronunciation (Germanic/Slavic/Romance readings of the same
  * spelling) — and record linkage blocks on "any key matches", which
  * is what lets KNIGHT block with NIGHT and SCHMIDT with SMITH across
  * systems. Exposed as the PostgreSQL-fuzzystrmatch-shaped pair
  * `dmetaphone_code(s[, n])` / `dmetaphone_alt(s[, n])` so blocking
  * keys computed here join against keys computed by any engine
  * shipping the standard algorithm; both keys truncate at 4 chars by
  * default (the published default; n <= 0 keeps the full key).
  *
  * Rules implemented (the classic public rule set — Philips' C++
  * reference as mirrored by PostgreSQL/commons-codec; this scaladoc is
  * the BINDING SPEC for the FunctionsSpec vectors):
  *  - input: uppercase; keep ASCII letters and spaces (space contexts
  *    like `VAN ` matter); NULL unless the input starts with an ASCII
  *    letter (the family's shared null contract). Y counts as a vowel.
  *  - "Slavo-Germanic" flag: the word contains W, K, CZ or WITZ —
  *    gates several J/G/Z readings below.
  *  - head: silent first letter in GN/KN/PN/WR/PS; initial X → S;
  *    initial vowel → A.
  *  - B→P (PP-style doubles skip); Ç→S; D: DGE/DGI/DGY→J, DT/DD→T,
  *    else T; F/K/N/R→themselves (doubles skip; final -IER R after
  *    non-ME/MA is French-silent in the primary only); Q→K; V→F.
  *  - C: Germanic -ACH- → K (CHIA/CHAE and ORCHES/ARCHIT/ORCHID-class
  *    contexts read K; word-initial CH before HARAC/HOR/HYM/HIA/HEM →
  *    K; otherwise CH → X primary / K alternate word-internally, X/X
  *    initially; MC- keeps K); CZ → S/X outside -WICZ; CIA → X; CC
  *    before I/E/H (not HU) → KS or X by context; CK/CG/CQ → K;
  *    CI/CE/CY → S (CIO/CIE/CIA → S/X); else K.
  *  - G: GH word-initial → J before I else K, after a vowel-less
  *    letter → K, silent after B/H/D-class prefixes, -UGH after
  *    C/G/L/R/T → F; GN after initial vowel (non-Slavic) → KN/N, else
  *    N/KN when no EY follows; GLI → KL/L (non-Slavic); initial G
  *    before Y/ES/EP/EB/EL/EY/IB/IL/IN/IE/EI/ER → K/J; GER/GY outside
  *    DANGER/RANGER/MANGER and E/I/RGY/OGY contexts → K/J; G before
  *    E/I/Y (or AGGI/OGGI) → J/K (VAN /VON /SCH → K, -GIER → J/J);
  *    else K.
  *  - H: kept only between vowels or word-initial before a vowel.
  *  - J: JOSE/SAN contexts → H (J/H mid-word); initial J → J/A;
  *    vowel J vowel (A/O, non-Slavic) → J/H; final J → J/–; silent
  *    next to L/T/K/S/N/M/B/Z or after S/K/L.
  *  - L: -ILLO/-ILLA/-ALLE Spanish doubles → L in the primary only.
  *  - M: M (doubles and -UMB(ER) skip the B-side letter).
  *  - P: PH→F; PP/PB skip.
  *  - S: silent in ISL/YSL; initial SUGAR- → X/S; SH → X (Germanic
  *    SHEIM/SHOEK/SHOLM/SHOLZ → S); SIO/SIA → S primary / X alternate
  *    (S/S if Slavic); initial S before M/N/L/W and any SZ → S/X;
  *    SCH before ER/EN → X/SK, before OO/UY/ED/EM → SK, word-initial
  *    SCH before consonant → X/S; SC before I/E/Y → S, else SK; final
  *    S after AI/OI → –/S; else S.
  *  - T: TION → X; TIA/TCH → X; TH/TTH → 0 (T when followed by OM/AM
  *    or under VAN /VON /SCH); TT/TD skip.
  *  - W: WR → R; initial W before vowel → A/F, initial WH → A; final
  *    -W after vowel and -EWSKI/-OWSKY/SCH- contexts → –/F;
  *    WICZ/WITZ → TS/FX.
  *  - X: final X after IAU/EAU/AU/OU is French-silent; else KS.
  *  - Z: ZH → J; Z before O/I/A (or Slavic non-T-preceded) → S/TS;
  *    else S.
  *
  * Vectors reproduced by this spec (primary/alternate):
  * SMITH → SM0/XMT, SCHMIDT → XMT/SMT, KNIGHT → NT/NT,
  * JOSE → HS/HS, THOMAS → TMS/TMS, CHURCH → XRX/XRK,
  * CATHERINE → K0RN/KTRN, WRIGHT → RT/RT, XAVIER → SF/SFR (final
  * French R sounds only in the alternate), GNOME → NM/NM,
  * SZYMANSKI → SMNS/XMNS. Pure per-row char loop as a static method
  * inside whole-stage codegen.
  */
case class DoubleMetaphoneCode(child: Expression, alternate: Boolean,
    maxLen: Int = 4) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (alternate) "dmetaphone_alt" else "dmetaphone_code"

  override protected def nullSafeEval(v: Any): Any =
    DoubleMetaphone.code(v.asInstanceOf[UTF8String], alternate, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.DoubleMetaphone.code($c, $alternate, $maxLen);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): DoubleMetaphoneCode = copy(child = newChild)
}

object DoubleMetaphone {

  /** SQL builders shared by the two registration sites:
    * `dmetaphone_code(s[, n])` primary, `dmetaphone_alt(s[, n])`
    * alternate; n <= 0 keeps the full key, default 4. */
  private def mkBuilder(alternate: Boolean): Seq[Expression] => DoubleMetaphoneCode =
    (exprs: Seq[Expression]) => {
      val name = if (alternate) "dmetaphone_alt" else "dmetaphone_code"
      if (exprs.isEmpty || exprs.size > 2)
        throw new IllegalArgumentException(
          s"$name expects 1 or 2 arguments, got ${exprs.size}")
      DoubleMetaphoneCode(exprs.head, alternate,
        if (exprs.size < 2) 4
        else exprs(1) match {
          case l: org.apache.spark.sql.catalyst.expressions.Literal
              if l.value != null =>
            l.value match {
              case i: Int => i
              case lg: Long => lg.toInt
              case sh: Short => sh.toInt
              case b: Byte => b.toInt
              case other => throw new IllegalArgumentException(
                s"$name: maxLen must be an integer literal, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"$name: maxLen must be a non-null integer literal, got $other")
        })
    }
  val builder: Seq[Expression] => DoubleMetaphoneCode = mkBuilder(alternate = false)
  val altBuilder: Seq[Expression] => DoubleMetaphoneCode = mkBuilder(alternate = true)

  private def isAsciiLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  // Double Metaphone counts Y as a vowel
  private def isVowel(c: Char): Boolean =
    c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U' || c == 'Y'

  def code(s: UTF8String, alternate: Boolean, maxLen: Int): UTF8String = {
    val bytes = s.getBytes
    if (bytes.isEmpty || !isAsciiLetter(bytes(0))) return null
    // uppercase; keep letters and single spaces (space contexts matter)
    val up = new java.lang.StringBuilder(bytes.length)
    var bi = 0
    while (bi < bytes.length) {
      val b = bytes(bi)
      if (isAsciiLetter(b)) up.append((if (b >= 'a') b - 32 else b).toChar)
      else if (b == ' ' && up.length > 0 && up.charAt(up.length - 1) != ' ')
        up.append(' ')
      bi += 1
    }
    val w = up.toString
    val len = w.length
    val last = len - 1
    // padded lookups: anything past the end reads as ' '
    def at(i: Int): Char = if (i >= 0 && i < len) w.charAt(i) else ' '
    def in(start: Int, length: Int, any: String*): Boolean = {
      if (start < 0) return false
      var k = 0
      while (k < any.length) {
        val cand = any(k)
        if (cand.length == length) {
          var j = 0; var ok = true
          while (ok && j < length) { if (at(start + j) != cand.charAt(j)) ok = false; j += 1 }
          if (ok) return true
        }
        k += 1
      }
      false
    }
    val slavo = w.contains("W") || w.contains("K") ||
      w.contains("CZ") || w.contains("WITZ")
    val pri = new java.lang.StringBuilder(len)
    val alt = new java.lang.StringBuilder(len)
    def add(p: String, a: String): Unit = { pri.append(p); alt.append(a) }
    var i = 0
    // silent head letters; initial X reads S
    if (in(0, 2, "GN", "KN", "PN", "WR", "PS")) i = 1
    else if (at(0) == 'X') { add("S", "S"); i = 1 }
    while (i < len) {
      val c = at(i)
      c match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' =>
          if (i == 0) add("A", "A")
          i += 1
        case 'B' =>
          add("P", "P"); i += (if (at(i + 1) == 'B') 2 else 1)
        case 'C' =>
          // Germanic -ACH-
          if (i > 1 && !isVowel(at(i - 2)) && in(i - 1, 3, "ACH") &&
            at(i + 2) != 'I' &&
            (at(i + 2) != 'E' || in(i - 2, 6, "BACHER", "MACHER"))) {
            add("K", "K"); i += 2
          } else if (i == 0 && in(i, 6, "CAESAR")) { add("S", "S"); i += 2 }
          else if (in(i, 4, "CHIA")) { add("K", "K"); i += 2 }
          else if (in(i, 2, "CH")) {
            if (i > 0 && in(i, 4, "CHAE")) add("K", "X")
            else if (i == 0 &&
              (in(i + 1, 5, "HARAC", "HARIS") ||
                in(i + 1, 3, "HOR", "HYM", "HIA", "HEM")) &&
              !in(0, 5, "CHORE")) add("K", "K")
            else if (in(0, 4, "VAN ", "VON ") || in(0, 3, "SCH") ||
              in(i - 2, 6, "ORCHES", "ARCHIT", "ORCHID") ||
              in(i + 2, 1, "T", "S") ||
              ((in(i - 1, 1, "A", "O", "U", "E") || i == 0) &&
                (in(i + 2, 1, "L", "R", "N", "M", "B", "H", "F", "V", "W", " ") ||
                  i + 1 == last))) add("K", "K")
            else if (i > 0) { if (in(0, 2, "MC")) add("K", "K") else add("X", "K") }
            else add("X", "X")
            i += 2
          } else if (in(i, 2, "CZ") && !in(i - 2, 4, "WICZ")) {
            add("S", "X"); i += 2
          } else if (in(i + 1, 3, "CIA")) { add("X", "X"); i += 3 }
          else if (in(i, 2, "CC") && !(i == 1 && at(0) == 'M')) {
            if (in(i + 2, 1, "I", "E", "H") && !in(i + 2, 2, "HU")) {
              if ((i == 1 && at(i - 1) == 'A') ||
                in(i - 1, 5, "UCCEE", "UCCES")) add("KS", "KS")
              else add("X", "X")
              i += 3
            } else { add("K", "K"); i += 2 }
          } else if (in(i, 2, "CK", "CG", "CQ")) { add("K", "K"); i += 2 }
          else if (in(i, 2, "CI", "CE", "CY")) {
            if (in(i, 3, "CIO", "CIE", "CIA")) add("S", "X") else add("S", "S")
            i += 2
          } else {
            add("K", "K")
            if (in(i + 1, 2, " C", " Q", " G")) i += 3
            else if (in(i + 1, 1, "C", "K", "Q") &&
              !in(i + 1, 2, "CE", "CI")) i += 2
            else i += 1
          }
        case 'D' =>
          if (in(i, 2, "DG")) {
            if (in(i + 2, 1, "I", "E", "Y")) { add("J", "J"); i += 3 }
            else { add("TK", "TK"); i += 2 }
          } else if (in(i, 2, "DT", "DD")) { add("T", "T"); i += 2 }
          else { add("T", "T"); i += 1 }
        case 'F' =>
          add("F", "F"); i += (if (at(i + 1) == 'F') 2 else 1)
        case 'G' =>
          if (at(i + 1) == 'H') {
            if (i > 0 && !isVowel(at(i - 1))) add("K", "K")
            else if (i == 0) { if (at(i + 2) == 'I') add("J", "J") else add("K", "K") }
            else if ((i > 1 && in(i - 2, 1, "B", "H", "D")) ||
              (i > 2 && in(i - 3, 1, "B", "H", "D")) ||
              (i > 3 && in(i - 4, 1, "B", "H"))) { /* silent */ }
            else {
              if (i > 2 && at(i - 1) == 'U' &&
                in(i - 3, 1, "C", "G", "L", "R", "T")) add("F", "F")
              else if (i > 0 && at(i - 1) != 'I') add("K", "K")
            }
            i += 2
          } else if (at(i + 1) == 'N') {
            if (i == 1 && isVowel(at(0)) && !slavo) add("KN", "N")
            else if (!in(i + 2, 2, "EY") && at(i + 1) != 'Y' && !slavo)
              add("N", "KN")
            else add("KN", "KN")
            i += 2
          } else if (in(i + 1, 2, "LI") && !slavo) { add("KL", "L"); i += 2 }
          else if (i == 0 && (at(i + 1) == 'Y' ||
            in(i + 1, 2, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN",
              "IE", "EI", "ER"))) { add("K", "J"); i += 2 }
          else if ((in(i + 1, 2, "ER") || at(i + 1) == 'Y') &&
            !in(0, 6, "DANGER", "RANGER", "MANGER") &&
            !in(i - 1, 1, "E", "I") && !in(i - 1, 3, "RGY", "OGY")) {
            add("K", "J"); i += 2
          } else if (in(i + 1, 1, "E", "I", "Y") ||
            in(i - 1, 4, "AGGI", "OGGI")) {
            if (in(0, 4, "VAN ", "VON ") || in(0, 3, "SCH") ||
              in(i + 1, 2, "ET")) add("K", "K")
            else if (in(i + 1, 3, "IER")) add("J", "J")
            else add("J", "K")
            i += 2
          } else { add("K", "K"); i += (if (at(i + 1) == 'G') 2 else 1) }
        case 'H' =>
          if ((i == 0 || isVowel(at(i - 1))) && isVowel(at(i + 1))) {
            add("H", "H"); i += 2
          } else i += 1
        case 'J' =>
          if (in(i, 4, "JOSE") || in(0, 4, "SAN ")) {
            if ((i == 0 && at(i + 4) == ' ') || in(0, 4, "SAN "))
              add("H", "H")
            else add("J", "H")
            i += 1
          } else {
            if (i == 0) add("J", "A")
            else if (isVowel(at(i - 1)) && !slavo &&
              (at(i + 1) == 'A' || at(i + 1) == 'O')) add("J", "H")
            else if (i == last) add("J", "")
            else if (!in(i + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z") &&
              !in(i - 1, 1, "S", "K", "L")) add("J", "J")
            i += (if (at(i + 1) == 'J') 2 else 1)
          }
        case 'K' =>
          add("K", "K"); i += (if (at(i + 1) == 'K') 2 else 1)
        case 'L' =>
          if (at(i + 1) == 'L') {
            // Spanish -ILLO/-ILLA/-ALLE: L in the primary only
            if ((i == len - 3 && in(i - 1, 4, "ILLO", "ILLA", "ALLE")) ||
              ((in(last - 1, 2, "AS", "OS") || in(last, 1, "A", "O")) &&
                in(i - 1, 4, "ALLE"))) add("L", "")
            else add("L", "L")
            i += 2
          } else { add("L", "L"); i += 1 }
        case 'M' =>
          add("M", "M")
          i += (if ((in(i - 1, 3, "UMB") &&
            (i + 1 == last || in(i + 2, 2, "ER"))) ||
            at(i + 1) == 'M') 2 else 1)
        case 'N' =>
          add("N", "N"); i += (if (at(i + 1) == 'N') 2 else 1)
        case 'P' =>
          if (at(i + 1) == 'H') { add("F", "F"); i += 2 }
          else { add("P", "P"); i += (if (at(i + 1) == 'P' || at(i + 1) == 'B') 2 else 1) }
        case 'Q' =>
          add("K", "K"); i += (if (at(i + 1) == 'Q') 2 else 1)
        case 'R' =>
          if (i == last && !slavo && in(i - 2, 2, "IE") &&
            !in(i - 4, 2, "ME", "MA")) add("", "R")
          else add("R", "R")
          i += (if (at(i + 1) == 'R') 2 else 1)
        case 'S' =>
          if (in(i - 1, 3, "ISL", "YSL")) i += 1
          else if (i == 0 && in(i, 5, "SUGAR")) { add("X", "S"); i += 1 }
          else if (in(i, 2, "SH")) {
            if (in(i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ")) add("S", "S")
            else add("X", "X")
            i += 2
          } else if (in(i, 3, "SIO", "SIA") || in(i, 4, "SIAN")) {
            if (slavo) add("S", "S") else add("S", "X")
            i += 3
          } else if ((i == 0 && in(i + 1, 1, "M", "N", "L", "W")) ||
            in(i + 1, 1, "Z")) {
            add("S", "X"); i += (if (in(i + 1, 1, "Z")) 2 else 1)
          } else if (in(i, 2, "SC")) {
            if (at(i + 2) == 'H') {
              if (in(i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM")) {
                if (in(i + 3, 2, "ER", "EN")) add("X", "SK") else add("SK", "SK")
              } else {
                if (i == 0 && !isVowel(at(3)) && at(3) != 'W') add("X", "S")
                else add("X", "X")
              }
            } else if (in(i + 2, 1, "I", "E", "Y")) add("S", "S")
            else add("SK", "SK")
            i += 3
          } else {
            if (i == last && in(i - 2, 2, "AI", "OI")) add("", "S")
            else add("S", "S")
            i += (if (in(i + 1, 1, "S", "Z")) 2 else 1)
          }
        case 'T' =>
          if (in(i, 4, "TION")) { add("X", "X"); i += 3 }
          else if (in(i, 3, "TIA", "TCH")) { add("X", "X"); i += 3 }
          else if (in(i, 2, "TH") || in(i, 3, "TTH")) {
            if (in(i + 2, 2, "OM", "AM") || in(0, 4, "VAN ", "VON ") ||
              in(0, 3, "SCH")) add("T", "T")
            else add("0", "T")
            i += 2
          } else { add("T", "T"); i += (if (in(i + 1, 1, "T", "D")) 2 else 1) }
        case 'V' =>
          add("F", "F"); i += (if (at(i + 1) == 'V') 2 else 1)
        case 'W' =>
          if (in(i, 2, "WR")) { add("R", "R"); i += 2 }
          else if (i == 0 && (isVowel(at(i + 1)) || in(i, 2, "WH"))) {
            if (isVowel(at(i + 1))) add("A", "F") else add("A", "A")
            i += 1
          } else if ((i == last && isVowel(at(i - 1))) ||
            in(i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") ||
            in(0, 3, "SCH")) { add("", "F"); i += 1 }
          else if (in(i, 4, "WICZ", "WITZ")) { add("TS", "FX"); i += 4 }
          else i += 1
        case 'X' =>
          if (!(i == last && (in(i - 3, 3, "IAU", "EAU") ||
            in(i - 2, 2, "AU", "OU")))) add("KS", "KS")
          i += (if (in(i + 1, 1, "C", "X")) 2 else 1)
        case 'Z' =>
          if (at(i + 1) == 'H') { add("J", "J"); i += 2 }
          else {
            if (in(i + 1, 2, "ZO", "ZI", "ZA") ||
              (slavo && i > 0 && at(i - 1) != 'T')) add("S", "TS")
            else add("S", "S")
            i += (if (at(i + 1) == 'Z') 2 else 1)
          }
        case _ => i += 1 // spaces and anything else
      }
    }
    var out = (if (alternate) alt else pri).toString
    if (out.isEmpty) return null
    if (maxLen > 0 && out.length > maxLen) out = out.substring(0, maxLen)
    UTF8String.fromString(out)
  }
}

package graft.plans

import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: unfold `year(c) <op> N` into range bounds on
  * `c` itself, so the predicate reaches the parquet scan as a pushable
  * min/max filter. Spark leaves `year(cast(ts AS date)) = 1995` as an
  * opaque DataFilter — every row group is read and the function runs per
  * row; at 100 TB that is the difference between scanning one year and
  * scanning three decades. `year` is monotone non-decreasing in its
  * argument, so each comparison maps EXACTLY onto an interval:
  *
  *   year(c) =  N  ⇔  c ∈ [N-01-01, (N+1)-01-01)
  *   year(c) >= N  ⇔  c >= N-01-01         year(c) > N ⇔ c >= (N+1)-01-01
  *   year(c) <= N  ⇔  c < (N+1)-01-01      year(c) < N ⇔ c < N-01-01
  *
  * Null semantics are preserved (both forms are null ⇔ c is null, and
  * FALSE filters drop both). The rewrite fires only on plain attribute
  * arguments — the shapes the analyzer produces for `year(col)`:
  * a DateType attribute, or `Cast(tsAttr AS date)` where the timestamp
  * is NTZ (calendar arithmetic, zone-free) or LTZ (bounds built in the
  * cast's session zone, so scan-time semantics equal eval semantics —
  * the same zone-pinning discipline as DeltaLite's derived partition
  * bounds). Same idea as Delta's OptimizeMetadataOnly-style predicate
  * derivations, registered through SparkSessionExtensions like any
  * library rule. */
object UnfoldDatePredicates extends Rule[LogicalPlan] {

  /** (lower inclusive, upper exclusive) literals for calendar year `y`
    * over the argument's own type; None when the shape is not safe. */
  private def yearBounds(arg: Expression, y: Int): Option[(Literal, Literal)] = {
    if (y < 1 || y > 9998) return None
    def dateLit(ld: LocalDate) = Literal(ld.toEpochDay.toInt, DateType)
    def ntzLit(ld: LocalDate) = Literal(
      LocalDateTime.of(ld, java.time.LocalTime.MIDNIGHT)
        .toEpochSecond(ZoneOffset.UTC) * 1000000L, TimestampNTZType)
    def ltzLit(ld: LocalDate, zone: String) = Literal(
      ld.atStartOfDay(ZoneId.of(zone)).toInstant.getEpochSecond * 1000000L,
      TimestampType)
    val (lo, hi) = (LocalDate.of(y, 1, 1), LocalDate.of(y + 1, 1, 1))
    arg match {
      case a: Attribute if a.dataType == DateType =>
        Some((dateLit(lo), dateLit(hi)))
      case Cast(a: Attribute, DateType, _, _) if a.dataType == TimestampNTZType =>
        Some((ntzLit(lo), ntzLit(hi)))
      case Cast(a: Attribute, DateType, tz, _) if a.dataType == TimestampType =>
        tz.map(z => (ltzLit(lo, z), ltzLit(hi, z)))
      case _ => None
    }
  }

  /** The attribute-bearing expression the bounds compare against. */
  private def target(arg: Expression): Expression = arg match {
    case Cast(a: Attribute, DateType, _, _) => a
    case Cast(a: Attribute, TimestampType, _, _) => a
    case other => other
  }

  // -------------------------------------------------------- date_trunc

  /** Grain step for the date-grain formats date_trunc supports; None for
    * sub-day grains (those never map onto DATE attributes and buy little
    * over a timestamp range the user could write directly). */
  private def grainStep(fmt: String): Option[LocalDate => LocalDate] =
    fmt.toLowerCase match {
      case "year" | "yyyy" | "yy" => Some(_.plusYears(1))
      case "quarter" => Some(_.plusMonths(3))
      case "month" | "mon" | "mm" => Some(_.plusMonths(1))
      case "week" => Some(_.plusDays(7))
      case "day" | "dd" => Some(_.plusDays(1))
      case _ => None
    }

  /** Is `ldt` exactly a truncation boundary for `fmt`? An UNALIGNED
    * comparison literal declines (equality there is constant-false and
    * the range forms shift — leaving the original predicate is always
    * correct). */
  private def aligned(fmt: String, ldt: LocalDateTime): Boolean = {
    if (ldt.toLocalTime != java.time.LocalTime.MIDNIGHT) return false
    val d = ldt.toLocalDate
    fmt.toLowerCase match {
      case "year" | "yyyy" | "yy" => d.getDayOfYear == 1
      case "quarter" =>
        d.getDayOfMonth == 1 && Set(1, 4, 7, 10).contains(d.getMonthValue)
      case "month" | "mon" | "mm" => d.getDayOfMonth == 1
      case "week" => d.getDayOfWeek == java.time.DayOfWeek.MONDAY
      case "day" | "dd" => true
      case _ => false
    }
  }

  /** Unfold `date_trunc(fmt, c) <op> T` (T a grain-ALIGNED literal of
    * the trunc's output type) into range bounds on the underlying
    * attribute — same monotone-interval mapping as `year`, valid for
    * every date grain because date_trunc is monotone non-decreasing and
    * maps each aligned T to the interval [T, next_grain(T)). Shapes:
    * a TIMESTAMP attribute (boundaries interpreted in the trunc's
    * session zone — eval semantics), a TIMESTAMP_NTZ attribute
    * (zone-free calendar arithmetic), or `CAST(dateAttr AS TIMESTAMP)`
    * (the analyzer's shape for date_trunc over a DATE column; bounds
    * land back on the DATE attribute when T is midnight in the cast's
    * zone). */
  private def truncBounds(tt: TruncTimestamp,
      lit: Literal): Option[(Expression, Literal, Literal)] = {
    val fmt = tt.format match {
      case Literal(f: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        f.toString
      case _ => return None
    }
    val step = grainStep(fmt).getOrElse(return None)
    val micros = lit match {
      case Literal(v: Long, TimestampType) if lit.dataType == tt.dataType => v
      case Literal(v: Long, TimestampNTZType) if lit.dataType == tt.dataType => v
      case _ => return None
    }
    def ofMicros(zone: ZoneId): LocalDateTime = LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L), zone)
    tt.timestamp match {
      case a: Attribute if a.dataType == TimestampType =>
        val zone = ZoneId.of(tt.timeZoneId.getOrElse(return None))
        val ldt = ofMicros(zone)
        if (!aligned(fmt, ldt)) return None
        val next = step(ldt.toLocalDate)
        def tsLit(ld: LocalDate) = Literal(
          ld.atStartOfDay(zone).toInstant.getEpochSecond * 1000000L,
          TimestampType)
        Some((a, tsLit(ldt.toLocalDate), tsLit(next)))
      case a: Attribute if a.dataType == TimestampNTZType =>
        val ldt = ofMicros(ZoneOffset.UTC)
        if (!aligned(fmt, ldt)) return None
        val next = step(ldt.toLocalDate)
        def ntz(ld: LocalDate) = Literal(
          LocalDateTime.of(ld, java.time.LocalTime.MIDNIGHT)
            .toEpochSecond(ZoneOffset.UTC) * 1000000L, TimestampNTZType)
        Some((a, ntz(ldt.toLocalDate), ntz(next)))
      case Cast(a: Attribute, TimestampType, tz, _)
          if a.dataType == DateType =>
        val zone = ZoneId.of(tz.orElse(tt.timeZoneId).getOrElse(return None))
        val ldt = ofMicros(zone)
        if (!aligned(fmt, ldt)) return None
        val next = step(ldt.toLocalDate)
        def dLit(ld: LocalDate) = Literal(ld.toEpochDay.toInt, DateType)
        Some((a, dLit(ldt.toLocalDate), dLit(next)))
      case Cast(Cast(a: Attribute, DateType, tz1, _), TimestampType, tz2, _)
          if a.dataType == TimestampType =>
        // `date_trunc(grain, CAST(CAST(ts AS DATE) AS TIMESTAMP))` — the
        // analyzer's shape for a user-written date cast over a timestamp
        // column. Every supported grain is ≥ day, and the date cast only
        // drops sub-day detail the grain truncation would drop anyway,
        // so (in one zone) it equals date_trunc(grain, ts) — bounds land
        // on the RAW timestamp attribute. All three zones must agree.
        val zones = (tz1.toSeq ++ tz2.toSeq ++ tt.timeZoneId.toSeq).distinct
        if (zones.size != 1) return None
        val zone = ZoneId.of(zones.head)
        val ldt = ofMicros(zone)
        if (!aligned(fmt, ldt)) return None
        val next = step(ldt.toLocalDate)
        def tsLit2(ld: LocalDate) = Literal(
          ld.atStartOfDay(zone).toInstant.getEpochSecond * 1000000L,
          TimestampType)
        Some((a, tsLit2(ldt.toLocalDate), tsLit2(next)))
      case Cast(Cast(a: Attribute, DateType, _, _), TimestampType, tz2, _)
          if a.dataType == TimestampNTZType =>
        // NTZ inner column (this engine's normalized timestamp type):
        // NTZ→DATE is zone-free calendar truncation, DATE→TIMESTAMP pins
        // the cast zone — the trunc output is grainStart(date(ntz)) AT
        // that zone, so an aligned T maps back to the NTZ CALENDAR
        // interval [boundary, next) on the raw attribute.
        val zone = ZoneId.of(tz2.orElse(tt.timeZoneId).getOrElse(return None))
        val ldt = ofMicros(zone)
        if (!aligned(fmt, ldt)) return None
        val next = step(ldt.toLocalDate)
        def ntzL(ld: LocalDate) = Literal(
          LocalDateTime.of(ld, java.time.LocalTime.MIDNIGHT)
            .toEpochSecond(ZoneOffset.UTC) * 1000000L, TimestampNTZType)
        Some((a, ntzL(ldt.toLocalDate), ntzL(next)))
      case _ => None
    }
  }

  /** Normalize flipped comparisons (lit <op> f(c)) to f(c) <op'> lit. */
  private def opOf(cmp: BinaryComparison, flipped: Boolean): Option[String] =
    (cmp, flipped) match {
      case (_: EqualTo, _) => Some("=")
      case (_: GreaterThan, false) | (_: LessThan, true) => Some(">")
      case (_: GreaterThanOrEqual, false) |
           (_: LessThanOrEqual, true) => Some(">=")
      case (_: LessThan, false) | (_: GreaterThan, true) => Some("<")
      case (_: LessThanOrEqual, false) |
           (_: GreaterThanOrEqual, true) => Some("<=")
      case _ => None
    }

  private def buildRange(op: String, c: Expression,
      loLit: Literal, hiLit: Literal): Expression = op match {
    case "=" => And(GreaterThanOrEqual(c, loLit), LessThan(c, hiLit))
    case ">" => GreaterThanOrEqual(c, hiLit)
    case ">=" => GreaterThanOrEqual(c, loLit)
    case "<" => LessThan(c, loLit)
    case "<=" => LessThan(c, hiLit)
  }

  private def unfold(cmp: BinaryComparison): Option[Expression] = {
    val (fnExpr, lit, flipped) = (cmp.left, cmp.right) match {
      case (f, l: Literal)
          if f.isInstanceOf[Year] || f.isInstanceOf[TruncTimestamp] =>
        (f, l, false)
      case (l: Literal, f)
          if f.isInstanceOf[Year] || f.isInstanceOf[TruncTimestamp] =>
        (f, l, true)
      case _ => return None
    }
    val op = opOf(cmp, flipped).getOrElse(return None)
    fnExpr match {
      case yr: Year =>
        val y = lit match {
          case Literal(v: Int, IntegerType) => v
          case _ => return None
        }
        yearBounds(yr.child, y).map { case (loLit, hiLit) =>
          buildRange(op, target(yr.child), loLit, hiLit)
        }
      case tt: TruncTimestamp =>
        truncBounds(tt, lit).map { case (c, loLit, hiLit) =>
          buildRange(op, c, loLit, hiLit)
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern
        .BINARY_COMPARISON)) {
      case cmp: BinaryComparison => unfold(cmp).getOrElse(cmp)
    }
}

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
    case other => other
  }

  private def unfold(cmp: BinaryComparison): Option[Expression] = {
    val (yearExpr, lit, flipped) = cmp match {
      case _ if cmp.left.isInstanceOf[Year] &&
          cmp.right.isInstanceOf[Literal] =>
        (cmp.left.asInstanceOf[Year], cmp.right.asInstanceOf[Literal], false)
      case _ if cmp.right.isInstanceOf[Year] &&
          cmp.left.isInstanceOf[Literal] =>
        (cmp.right.asInstanceOf[Year], cmp.left.asInstanceOf[Literal], true)
      case _ => return None
    }
    val y = lit match {
      case Literal(v: Int, IntegerType) => v
      case _ => return None
    }
    yearBounds(yearExpr.child, y).map { case (loLit, hiLit) =>
      val c = target(yearExpr.child)
      // normalize flipped comparisons (N <op> year(c)) to year(c) <op'> N
      val op = (cmp, flipped) match {
        case (_: EqualTo, _) => "="
        case (_: GreaterThan, false) | (_: LessThan, true) => ">"
        case (_: GreaterThanOrEqual, false) | (_: LessThanOrEqual, true) => ">="
        case (_: LessThan, false) | (_: GreaterThan, true) => "<"
        case (_: LessThanOrEqual, false) | (_: GreaterThanOrEqual, true) => "<="
        case _ => return None
      }
      op match {
        case "=" => And(GreaterThanOrEqual(c, loLit), LessThan(c, hiLit))
        case ">" => GreaterThanOrEqual(c, hiLit)
        case ">=" => GreaterThanOrEqual(c, loLit)
        case "<" => LessThan(c, loLit)
        case "<=" => LessThan(c, hiLit)
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern
        .BINARY_COMPARISON)) {
      case cmp: BinaryComparison => unfold(cmp).getOrElse(cmp)
    }
}

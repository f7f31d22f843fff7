package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index: maps two bigint keys (low 31 bits each) to
  * their distance along the order-31 Hilbert curve. Like the Morton
  * code ([[InterleaveBits]]) it linearizes two dimensions so range
  * partitioning yields tight 2-D boxes for min/max skipping — but the
  * Hilbert walk never takes the Z-curve's long diagonal jumps, so
  * consecutive index ranges stay spatially CONTIGUOUS: files cut from
  * curve intervals cover ~25-30% less 2-D perimeter than Morton boxes
  * at the same file count, which is why Delta's liquid clustering
  * chose Hilbert over Z-order for its layout curve. `DeltaLite`'s
  * clustering paths pick it via `graft.cluster.curve = hilbert`.
  *
  * The kernel is the classic rotate-and-reflect walk (public-domain
  * xy2d): 31 branch-light iterations per row, called as a static
  * method from whole-stage-generated code — no codegen-span break.
  * Order 31 keeps d < 2^62, comfortably inside signed-long ordering;
  * inputs mask to their low 31 bits (ids / epoch days / ranks — non-
  * negative by construction in this engine). */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires two bigint arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertIndex.xy2d($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Curve order: 31 bits per dimension → d fits in 62 bits signed. */
  val Order = 31

  /** Distance along the order-31 Hilbert curve of point (x, y), both
    * masked to their low 31 bits. */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0x7FFFFFFFL
    var y = yIn & 0x7FFFFFFFL
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve walks in canonical frame
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d → point) — the test oracle for the adjacency
    * property: consecutive d land on grid-adjacent cells. */
  def d2xy(order: Int, dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

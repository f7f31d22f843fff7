package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** 64-bit SimHash as ONE typed-imperative aggregate (SURVEY.md §2.9 L2 /
  * §2.10): accumulates the 64 per-bit ±1 sums of the input feature hashes
  * in a primitive `long[64]` buffer and evaluates to the fingerprint as a
  * struct of two 32-bit halves `(lo, hi)` — bit j set iff sum_j > 0,
  * bit-identical to the 64-column expression form it replaces.
  *
  * Why a TypedImperativeAggregate instead of 64 codegen'd `sum(when(...))`
  * aggregates: the expression form forces whole-stage codegen to compile
  * a 64-aggregate projection (~6-8 s of janino time on first run, and a
  * 64-slot wide agg buffer per group); this sketch is one object-hash
  * aggregate with a 512-byte primitive buffer, partial+final merge by
  * vector add — same distributed shape (map-side partials, one shuffle on
  * the group key), no codegen cliff. Runs under ObjectHashAggregateExec.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires a bigint feature-hash argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buffer(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var lo = 0L
    var hi = 0L
    var j = 0
    while (j < 32) {
      if (buffer(j) > 0L) lo |= 1L << j
      if (buffer(j + 32) > 0L) hi |= 1L << j
      j += 1
    }
    new GenericInternalRow(Array[Any](lo, hi))
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var j = 0
    while (j < 64) { bb.putLong(buffer(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buffer = new Array[Long](64)
    var j = 0
    while (j < 64) { buffer(j) = bb.getLong(); j += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

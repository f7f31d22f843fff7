package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE typed-imperative aggregate (SURVEY.md §2.9 L2
  * / §2.10): for each input shingle, hashes it under `numHashes` seeded
  * permutations and min-reduces into a primitive `long[numHashes]`
  * buffer; evaluates to the signature as `array<bigint>`.
  *
  * Hash parity: permutation i is exactly Spark's
  * `xxhash64(lit(i), shingle)` — seed 42, then `XXH64.hashInt(i, seed)`,
  * then `XXH64.hashUnsafeBytes(shingleBytes, carry)` — so signatures are
  * bit-identical to the 32-column `min(xxhash64(lit(i), shingle))` form
  * (asserted in DedupSpec). The input string's bytes are hashed once per
  * permutation from the same UTF8String — no per-permutation expression
  * tree, no 32-slot agg buffer, no wide-projection codegen compile.
  * Merge is an elementwise min → map-side partials keep working.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val SparkHashSeed = 42L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a string shingle argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val base = s.getBaseObject
      val offset = s.getBaseOffset
      val len = s.numBytes()
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, offset, len,
          XXH64.hashInt(i, SparkHashSeed))
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    var i = 0
    while (i < numHashes) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buffer = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { buffer(i) = bb.getLong(); i += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

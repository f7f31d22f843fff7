package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** MERGEABLE quantile sketch as one typed-imperative aggregate
  * (SURVEY.md §2 S56): folds a double column into a Greenwald–Khanna
  * summary (Spark's own `QuantileSummaries`, the structure behind
  * `approx_percentile`) and evaluates to the SERIALIZED digest bytes —
  * the distribution-shape twin of `hll_sketch_agg`. Where the HLL
  * sketch lets ANALYZE maintain NDV in O(batch) by sketch union, this
  * digest lets it maintain HISTOGRAM BIN BOUNDS the same way: store the
  * digest at ANALYZE, merge an appended batch's digest driver-side
  * (GK summaries merge with error bounds preserved), re-derive
  * equi-height bins from the merged digest on read. Wire format is
  * Spark's `ApproximatePercentile.serializer` (relativeError + count +
  * sampled (value, g, delta) triples), so digests round-trip through
  * the same code `percentile_approx` partial aggregation uses.
  *
  * `accuracy` follows `approx_percentile` semantics (relative rank
  * error 1/accuracy). Histogram maintenance needs far less precision
  * than single-percentile queries — a 32-bin grid tolerates boundary
  * error of a fraction of a 3.1%-of-rows bin — so callers size it
  * small to keep the stored digest compact (see
  * [[graft.sources.DeltaLite.analyzeTable]]).
  */
case class QuantileSketchAgg(
    child: Expression,
    accuracy: Int = 512,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApproximatePercentile.PercentileDigest]
  with UnaryLike[Expression] {

  require(accuracy > 0, s"quantile_sketch_agg: accuracy must be positive, got $accuracy")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch_agg requires a double argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch_agg"

  override def createAggregationBuffer(): ApproximatePercentile.PercentileDigest =
    new ApproximatePercentile.PercentileDigest(1.0 / accuracy)

  override def update(buffer: ApproximatePercentile.PercentileDigest,
      input: InternalRow): ApproximatePercentile.PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(b1: ApproximatePercentile.PercentileDigest,
      b2: ApproximatePercentile.PercentileDigest): ApproximatePercentile.PercentileDigest = {
    b1.merge(b2)
    b1
  }

  override def eval(buffer: ApproximatePercentile.PercentileDigest): Any =
    serialize(buffer)

  override def serialize(buffer: ApproximatePercentile.PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): ApproximatePercentile.PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/** Driver-side digest helpers shared by ANALYZE storage and the
  * histogram rebin-on-read path. */
object QuantileSketch {
  import ApproximatePercentile.PercentileDigest

  def fromBase64(b64: String): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(
      // MIME decoder: Spark's base64() chunks long output with CRLF
      // every 76 chars (RFC 2045); the basic decoder rejects those
      java.util.Base64.getMimeDecoder.decode(b64))

  def toBase64(d: PercentileDigest): String =
    java.util.Base64.getEncoder.encodeToString(
      ApproximatePercentile.serializer.serialize(d))

  /** Merge two serialized digests (mutates neither input string). */
  def mergeBase64(a: String, b: String): String = {
    val da = fromBase64(a)
    da.merge(fromBase64(b))
    toBase64(da)
  }

  /** The (bins+1)-point equi-height boundary grid of a serialized
    * digest, or None when the digest is empty. */
  def boundsBase64(b64: String, bins: Int): Option[Seq[Double]] = {
    val d = fromBase64(b64)
    val grid = (0 to bins).map(_.toDouble / bins).toArray
    val ps = d.getPercentiles(grid)
    if (ps.isEmpty) None else Some(ps.toSeq)
  }
}

package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Multimodal column handling for training-data pipelines (builder
  * prompt / SURVEY.md §2.9): image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs batch-wise inside executors.
  *
  * ┌─ STUB BOUNDARY ─────────────────────────────────────────────────────┐
  * │ No image/audio codecs exist in this container, so [[decodeStub]] is │
  * │ a DETERMINISTIC FAKE decoder (byte statistics standing in for pixel │
  * │ decoding). Swap its body for a real codec (e.g. TwelveMonkeys /     │
  * │ javacv) without touching any of the Spark plumbing around it — the  │
  * │ schema, partitioning, and batch shape below are the real design.    │
  * └─────────────────────────────────────────────────────────────────────┘
  *
  * Scale design: the media table is (id, media binary, meta struct). The
  * decode stage is `mapPartitions` over a Dataset — the JVM-Scala
  * equivalent of `mapInPandas` batch UDFs: per-partition iterator, so
  * decoder init (model load, codec setup) amortizes across the partition
  * instead of per row. Binary payloads never pass through a shuffle here;
  * repartition by id range BEFORE decoding if upstream produced skewed
  * file splits. Feature vectors come out as `array<float>`, joining the
  * embedding pipeline (L3) directly.
  */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte],
      format: String, width: Int, height: Int)
  final case class MediaFeatures(id: Long, n_bytes: Int,
      features: Array[Float])

  /** Wrap a text/binary source as a media table with typed metadata
    * (metadata derived deterministically where a real pipeline would read
    * container headers). */
  def asMediaTable(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(
      col(id).cast("long").as("id"),
      col(payload).cast("binary").as("media"),
      struct(
        lit("fake/raw").as("format"),
        (length(col(payload)) % 640).cast("int").as("width"),
        (length(col(payload)) % 480).cast("int").as("height")).as("meta"))

  /** STUB decoder: deterministic byte-statistics "features" (dim 8).
    * Replace with a real codec at the stub boundary above. */
  def decodeStub(media: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < media.length) {
      f(i % 8) += (media(i) & 0xFF) / 255.0f
      i += 1
    }
    if (media.length > 0) (0 until 8).foreach(j => f(j) /= media.length)
    f
  }

  /** Batch feature extraction: mapPartitions so per-partition decoder
    * setup cost amortizes (the mapInPandas batch-shape equivalent). */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real pipeline: initialize codec/model ONCE here
        rows.map { case (id, bytes) =>
          MediaFeatures(id, bytes.length, decodeStub(bytes))
        }
      }
  }

  /** STUB resize: decimate the payload by `factor` (every factor-th byte),
    * updating the metadata dims — the byte-level stand-in for an image
    * resample at the stub boundary above. Map-only; payload size (and so
    * shuffle/storage cost downstream) drops by ~factor. */
  def resizeStub(media: DataFrame, factor: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(factor >= 1, "resize factor must be >= 1")
    media.select(col("id"), col("media"),
        col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real pipeline: initialize the resampler ONCE here
        rows.map { r =>
          val out = Array.tabulate(r.media.length / factor)(i => r.media(i * factor))
          MediaRow(r.id, out, r.format, r.width / factor, r.height / factor)
        }
      }
      .select(col("id"), col("media"),
        struct(col("format"), col("width"), col("height")).as("meta"))
  }

  /** Deterministic audio framing over a fake PCM payload: `frameBytes`
    * windows every `hopBytes` (overlapping when hop < frame — the
    * window/hop shape every STFT-style audio featurizer uses), with a
    * per-window stub energy (mean byte value) standing in for a real DSP
    * kernel at the stub boundary above. Map-only flatMap; window count
    * per row is ceil(len / hop), geometry fully deterministic. */
  def windowAudio(media: DataFrame, frameBytes: Int, hopBytes: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(frameBytes >= 1 && hopBytes >= 1, "frame and hop must be >= 1")
    media.select(col("id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator.range(0, math.max(bytes.length, 1), hopBytes)
          .takeWhile(_ < bytes.length)
          .map { off =>
            val end = math.min(off + frameBytes, bytes.length)
            var sum = 0L; var i = off
            while (i < end) { sum += bytes(i) & 0xFF; i += 1 }
            (id, off / hopBytes, end - off, sum.toDouble / (end - off))
          }
      }
      .toDF("id", "win_idx", "win_bytes", "energy")
  }

  /** Deterministic frame sampling over a fake "video" payload: fixed-size
    * byte windows as frames, every `stride`-th taken — the partition-local
    * pattern a real frame sampler follows. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) => (id, idx, frame.length, decodeStub(frame)) }
      }
      .toDF("id", "frame_idx", "frame_bytes", "frame_features")
  }

  /** Perceptual difference-hash (dHash) over the media payload. The
    * 8×9 GRAYSCALE GRID below is derived from byte statistics — the
    * stand-in for decode+downsample at the stub boundary above — but
    * the dHash fold over it is the REAL published algorithm (bit i set
    * when grid(r)(c) > grid(r)(c+1), 8 rows × 8 adjacent-column
    * comparisons = a 64-bit fingerprint whose Hamming distance is the
    * visual-near-dup metric). Swap the grid derivation for a real
    * resampler and every downstream stage (banded Hamming LSH, xor +
    * bit_count verify) is unchanged. */
  def dHashStub(media: Array[Byte]): Long = {
    val sum = Array.ofDim[Long](8, 9)
    val cnt = Array.ofDim[Int](8, 9)
    var i = 0
    while (i < media.length) {
      val r = i % 8
      val c = (i / 8) % 9
      sum(r)(c) += (media(i) & 0xFF)
      cnt(r)(c) += 1
      i += 1
    }
    var h = 0L
    var bit = 0
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val a = if (cnt(r)(c) > 0) sum(r)(c).toDouble / cnt(r)(c) else 0.0
        val b = if (cnt(r)(c + 1) > 0) sum(r)(c + 1).toDouble / cnt(r)(c + 1) else 0.0
        if (a > b) h |= (1L << bit)
        bit += 1
        c += 1
      }
      r += 1
    }
    h
  }

  /** Batch perceptual hashing: mapPartitions like [[extractFeatures]]
    * (decoder init amortizes per partition). Output (id, phash BIGINT)
    * feeds the banded Hamming join — the image near-dup pipeline shape. */
  def perceptualHashes(media: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real pipeline: initialize codec/resampler ONCE here
        rows.map { case (id, bytes) => (id, dHashStub(bytes)) }
      }
      .toDF("id", "phash")
  }
}

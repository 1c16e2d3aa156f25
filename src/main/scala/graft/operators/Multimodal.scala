package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata beside them. The Spark-side
  * contract — schema, batch shape, partition sizing — is real and tested;
  * the actual codec step is STUBBED (this container has no image/audio
  * libraries) behind [[DecodeStub]], a deterministic fake with the same
  * signature a real decoder would have (mapPartitions over binary
  * payloads, the Scala analogue of a Pandas-UDF batch).
  *
  * Scale notes: payloads never enter a shuffle — metadata extraction
  * projects narrow columns first, and per-partition byte budgets are
  * controlled by `spark.sql.files.maxPartitionBytes` on read. Derived
  * features (small arrays) are what flows into joins/aggregations.
  */
object Multimodal {

  /** The typed envelope for a multimodal asset. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),   // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Deterministic REAL-binary fixture: payload bytes seeded by asset id
    * (`byte_j = (id*31 + j*7) mod 256`, built hex-side and `unhex`ed so
    * the byte stream is exact — never a UTF-8 re-encode of text), with
    * lengths exercising every codec-stage edge: empty (id%17=0), shorter
    * than a frame window (id%17=1 -> 0..3 bytes), larger than the 64x64
    * resize budget (id%17=2 -> 5000 bytes), else a 5..997-byte spread.
    * The same arithmetic is SQL-expressible, so oracles regenerate
    * byte-identical payloads from the id column alone.
    */
  def syntheticAssets(ids: DataFrame, idCol: String = "asset_id",
      modality: String = "binary"): DataFrame = {
    val id = col(idCol)
    val len = when(id % 17 === 0, lit(0L))
      .when(id % 17 === 1, id % 4)
      .when(id % 17 === 2, lit(5000L))
      .otherwise((id * 137) % 997)
    val hx = when(len === 0, lit(""))
      .otherwise(concat_ws("", transform(sequence(lit(0L), len - 1),
        j => lpad(hex((id * 31 + j * 7) % 256), 2, "0"))))
    ids.select(id.as("asset_id"), lit(modality).as("modality"),
      lit("application/octet-stream").as("mime"),
      unhex(hx).as("content"))
  }

  /** Cheap metadata extraction — pure Catalyst, no decode: sizes, digests,
    * magic-byte sniffing. This is the first pass a 100 TB pipeline runs to
    * partition/route assets before any codec work.
    */
  def withByteMetadata(assets: DataFrame, content: String = "content"): DataFrame =
    assets
      .withColumn("byte_len", octet_length(col(content)).cast(LongType))
      .withColumn("sha256", sha2(col(content), 256))
      .withColumn("magic", hex(substring(col(content), 1, 4)))

  /** Deterministic stand-in for the codec stage. A real deployment swaps
    * `decode` for an image/audio library call; everything around it —
    * batch iteration, output schema, feature width — stays identical.
    */
  object DecodeStub extends Serializable {
    val featureDim = 8

    /** "Decode" a payload into a fixed-width feature vector: per-stripe
      * byte-value means. Deterministic AND engine-reproducible: the
      * accumulation is an exact integer sum with a single double division
      * at the end, so a SQL oracle recomputing from the same bytes gets
      * bit-identical floats (no FP-accumulation-order dependence).
      */
    def decode(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (bytes.nonEmpty) {
        val sums = new Array[Long](featureDim)
        var i = 0
        while (i < bytes.length) {
          sums(i % featureDim) += (bytes(i) & 0xFF)
          i += 1
        }
        val stripe = math.max(1, bytes.length / featureDim)
        var j = 0
        while (j < featureDim) {
          out(j) = (sums(j) / (255.0 * stripe)).toFloat; j += 1
        }
      }
      out
    }

    /** Frame-sample stand-in: byte offsets a video sampler would seek. */
    def frameOffsets(byteLen: Long, frames: Int): Array[Long] =
      (0 until frames).map(i => byteLen * i / math.max(1, frames)).toArray
  }

  final case class AssetFeatures(asset_id: Long, modality: String,
      byte_len: Long, features: Array[Float])

  final case class AssetFrame(asset_id: Long, frame_id: Int, offset: Long,
      frame_len: Long, frame_sum: Long)

  final case class AssetThumb(asset_id: Long, byte_len: Long, stride: Long,
      thumb_len: Long, thumb_sum: Long)

  /** The codec pass: mapPartitions over payload batches (one JVM-side
    * batch per partition, mirroring a Pandas-UDF's arrow-batch shape).
    */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    val idIdx  = assets.schema.fieldIndex("asset_id")
    val modIdx = assets.schema.fieldIndex("modality")
    val cIdx   = assets.schema.fieldIndex("content")
    assets.mapPartitions { (it: Iterator[Row]) =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](cIdx)
        AssetFeatures(r.getLong(idIdx), r.getString(modIdx),
          bytes.length.toLong, DecodeStub.decode(bytes))
      }
    }
  }

  /** Frame-sampling pass — the video analogue of [[extractFeatures]]:
    * each payload is cut into `nFrames` contiguous byte windows at the
    * deterministic seek offsets a real demuxer stub would use
    * (`DecodeStub.frameOffsets`: offset_i = len*i/n, window i ends at
    * offset_{i+1}, the last at EOF). Per frame we emit the window bounds
    * plus an exact integer byte sum — a real deployment swaps the sum
    * for a codec's frame decode; the iteration shape (mapPartitions over
    * payload batches, frames exploded JVM-side, payloads never shuffled)
    * stays identical.
    *
    * Output is |assets| x nFrames narrow rows — at 100 TB the frame rows
    * (not the payloads) are what flows into downstream joins/dedup.
    */
  def sampleFrames(assets: DataFrame, nFrames: Int): Dataset[AssetFrame] = {
    require(nFrames > 0, "nFrames must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx  = assets.schema.fieldIndex("content")
    assets.mapPartitions { (it: Iterator[Row]) =>
      it.flatMap { r =>
        val id    = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](cIdx)
        val len   = bytes.length.toLong
        val offs  = DecodeStub.frameOffsets(len, nFrames) :+ len
        (0 until nFrames).iterator.map { i =>
          var s = 0L
          var j = offs(i).toInt
          val end = offs(i + 1).toInt
          while (j < end) { s += (bytes(j) & 0xff); j += 1 }
          AssetFrame(id, i, offs(i), offs(i + 1) - offs(i), s)
        }
      }
    }
  }

  /** Resize/downsample pass — the image analogue of [[extractFeatures]]:
    * a fixed-budget thumbnail built from every `stride`-th byte, where
    * `stride = ceil(len / maxBytes)` so the thumb never exceeds
    * `maxBytes` samples. Emits the thumb geometry plus an exact integer
    * sum of the sampled bytes (the stub for the resampled pixels); a
    * real deployment swaps the strided sampler for a bilinear resize,
    * keeping the same batch iteration and output schema.
    */
  def resizeStub(assets: DataFrame, maxBytes: Int = 64): Dataset[AssetThumb] = {
    require(maxBytes > 0, "maxBytes must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx  = assets.schema.fieldIndex("content")
    assets.mapPartitions { (it: Iterator[Row]) =>
      it.map { r =>
        val id     = r.getLong(idIdx)
        val bytes  = r.getAs[Array[Byte]](cIdx)
        val len    = bytes.length.toLong
        val stride = if (len == 0) 1L else (len + maxBytes - 1) / maxBytes
        var s = 0L
        var n = 0L
        var j = 0L
        while (j < len) { s += (bytes(j.toInt) & 0xff); n += 1; j += stride }
        AssetThumb(id, len, stride, n, s)
      }
    }
  }
}

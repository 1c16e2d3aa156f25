package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata beside them. The Spark-side
  * contract — schema, batch shape, partition sizing — is real and tested.
  *
  * The codec tier has two layers:
  *   - [[ImageIoDecoder]], a REAL image decode path over the JDK's
  *     `javax.imageio` (PNG/JPEG/BMP/GIF — zero extra dependencies),
  *     feeding [[decodeImages]] (per-image luma stats + a dHash
  *     perceptual fingerprint) and [[imageNearDups]] (banded
  *     perceptual-hash image dedup);
  *   - [[DecodeStub]], the deterministic stand-in that remains for the
  *     modalities whose codecs this container genuinely lacks
  *     (audio/video), with the same signature a real decoder would have
  *     (mapPartitions over binary payloads, the Scala analogue of a
  *     Pandas-UDF batch).
  *
  * Scale notes: payloads never enter a shuffle — metadata extraction
  * projects narrow columns first, decode runs scan-local in
  * mapPartitions, and per-partition byte budgets are controlled by
  * `spark.sql.files.maxPartitionBytes` on read. Derived features (small
  * arrays, 64-bit fingerprints) are what flows into joins/aggregations.
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
  // ---- real image decode tier (javax.imageio) -------------------------

  /** Pluggable image decode: bytes -> (width, height, row-major luma
    * 0..255), or None for an undecodable payload (corrupt file, format
    * with no reader). The luma map is the integer BT.601 approximation
    * `(299r + 587g + 114b) / 1000` — exact integer arithmetic, so every
    * downstream feature recomputes bit-identically in SQL.
    */
  trait ImageDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])]
  }

  /** The JDK-built-in decode path. `ImageIO.setUseCache(false)` keeps
    * executor-side decodes in memory (the default spills every image
    * through a temp FILE — a pathological I/O pattern for a 100 TB scan).
    */
  object ImageIoDecoder extends ImageDecoder {
    @transient private lazy val init: Unit =
      javax.imageio.ImageIO.setUseCache(false)

    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      init
      if (bytes == null || bytes.isEmpty) return None
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) None // no registered reader recognizes the bytes
        else {
          val w = img.getWidth
          val h = img.getHeight
          val luma = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              luma(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
              x += 1
            }
            y += 1
          }
          Some((w, h, luma))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** dHash perceptual fingerprint over a decoded luma map: sample a 9x8
    * grid (nearest-neighbor, `floor(i*w/9)` / `floor(j*h/8)` — exact
    * integer picks, no interpolation, so the oracle recomputes them), set
    * bit `j*8+i` when the left grid sample is brighter than its right
    * neighbor. Gradient direction survives brightness/contrast shifts —
    * the standard image near-dup key — and the nearest grid makes it
    * scale-invariant by construction: a 2x nearest-upscaled image picks
    * the SAME source pixels and hashes identically.
    */
  def dHash64(w: Int, h: Int, luma: Array[Int]): Long = {
    var hash = 0L
    var j = 0
    while (j < 8) {
      val gy = j * h / 8
      var i = 0
      while (i < 8) {
        val x0 = i * w / 9
        val x1 = (i + 1) * w / 9
        if (luma(gy * w + x0) > luma(gy * w + x1)) hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  final case class DecodedImage(asset_id: Long, width: Int, height: Int,
      gray_sum: Long, gray_min: Int, gray_max: Int, dhash: Long)

  /** The real codec pass: decode every payload scan-local (mapPartitions,
    * payloads never shuffled) into per-image luma stats + the dHash
    * fingerprint. Undecodable payloads are DROPPED — the route-then-decode
    * contract ([[withByteMetadata]] magic sniffing) sends only plausible
    * images here, and a corrupt straggler must not fail a 100 TB job.
    * Only the narrow (id, dims, stats, 64-bit hash) rows flow on.
    */
  def decodeImages(assets: DataFrame,
      decoder: ImageDecoder = ImageIoDecoder): Dataset[DecodedImage] = {
    val spark = assets.sparkSession
    import spark.implicits._
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx  = assets.schema.fieldIndex("content")
    assets.mapPartitions { (it: Iterator[Row]) =>
      it.flatMap { r =>
        decoder.decode(r.getAs[Array[Byte]](cIdx)).map { case (w, h, luma) =>
          var sum = 0L
          var mn = 255
          var mx = 0
          var k = 0
          while (k < luma.length) {
            val v = luma(k)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            k += 1
          }
          DecodedImage(r.getLong(idIdx), w, h, sum, mn, mx, dHash64(w, h, luma))
        }
      }
    }
  }

  /** Perceptual-hash image near-dup pairs over [[decodeImages]] output:
    * block on the hash's 8 single-byte bands (pigeonhole: a pair within
    * hamming distance < 8 shares at least one identical band, so recall
    * is EXACT for `maxHamming` <= 7), verify with true hamming distance —
    * the [[Dedup.nearDupPairsSimhash]] shape on image fingerprints. The
    * only exchange is the (band, key) self-join over narrow
    * (id, hash) rows; payloads and luma maps never reach it.
    */
  def imageNearDups(decoded: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      "8 single-byte bands guarantee recall only for maxHamming <= 7")
    val banded = decoded.select(col("asset_id").as("id"), col("dhash"),
      posexplode(array((0 until 8).map(b =>
        shiftright(col("dhash"), b * 8).bitwiseAND(0xFFL)): _*))
        .as(Seq("band", "key")))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        Dedup.hamming64(col("l.dhash"), col("r.dhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic 24-bit uncompressed BMP fixture, built entirely in
    * Catalyst (hex assembly + `unhex`, like [[syntheticAssets]]): a real
    * image file [[ImageIoDecoder]] decodes through the REAL ImageIO path,
    * whose pixels an oracle regenerates from the id arithmetic alone
    * (uncompressed BMP = header + raw bottom-up BGR rows, nothing to
    * re-derive). Pixel (x, y) of a `size`x`size` image takes its channels
    * from `base = pixelId*31 + yy*19 + xx*7` (+ a two-cell bump when
    * `noisy`) at the 8x8 cell `xx = x*8/size, yy = y*8/size` — so a
    * 16x16 image is the exact 2x nearest-upscale of its 8x8 twin and
    * must dHash identically, while `noisy` shifts a couple of gradient
    * bits. `size` must be a multiple of 8: it keeps the BMP rows 4-byte
    * aligned (no padding arithmetic in the oracle) and the 8x8 cell map
    * exact.
    */
  def bmpContent(pixelId: Column, size: Int, noisy: Column): Column = {
    require(size > 0 && size % 8 == 0, "size must be a positive multiple of 8")
    val rowBytes = size * 3
    val imgBytes = rowBytes * size
    def le4(v: Int): String =
      f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X${(v >> 16) & 0xff}%02X${(v >> 24) & 0xff}%02X"
    def le2(v: Int): String = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
    // BITMAPFILEHEADER + BITMAPINFOHEADER, all little-endian: BM, file
    // size, reserved, pixel offset 54; header size 40, dims, 1 plane,
    // 24 bpp, BI_RGB, image size, resolutions/palette zeroed
    val header = "424D" + le4(54 + imgBytes) + "00000000" + le4(54) +
      le4(40) + le4(size) + le4(size) + le2(1) + le2(24) + le4(0) +
      le4(imgBytes) + le4(0) + le4(0) + le4(0) + le4(0)
    // Column `/` is DOUBLE division in Spark SQL; every index here must
    // divide integrally (floor of a non-negative exact ratio)
    def idiv(a: Column, b: Int): Column = floor(a / b).cast("long")
    val pix = transform(sequence(lit(0), lit(imgBytes - 1)), j => {
      val y    = lit(size - 1) - idiv(j, rowBytes) // BMP rows store bottom-up
      val x    = idiv(j % rowBytes, 3)
      val chan = j % 3 // 24-bpp byte order within a pixel is B, G, R
      val xx = idiv(x * 8, size)
      val yy = idiv(y * 8, size)
      val base = pixelId * 31 + yy * 19 + xx * 7 +
        (when(noisy && xx === 1 && yy === 2, 40)
          .when(noisy && xx === 5 && yy === 6, 60)
          .otherwise(0))
      val v = when(chan === 0, base % 256)
        .when(chan === 1, (base * 3 + 11) % 256)
        .otherwise((base * 7 + 23) % 256)
      lpad(hex(v), 2, "0")
    })
    unhex(concat(lit(header), concat_ws("", pix)))
  }

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

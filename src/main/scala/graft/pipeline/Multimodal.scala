package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata structs, with decode / feature
  * extraction / frame sampling as partition-local transforms.
  *
  * IMAGE decode is REAL: `javax.imageio.ImageIO` ships with the base
  * JDK and decodes PNG/JPEG/BMP/GIF ([[decodeImage]]); the typed path
  * ([[decodePartitions]], [[decodeGray]]) runs it partition-local on
  * executors. Audio/video codecs are genuinely absent from this
  * environment, so non-image payloads fall back to the clearly-marked
  * deterministic STUB ([[fakeDecode]]) — swap it for ffmpeg-style
  * decoding (mapInPandas or a JNI codec) without touching callers.
  */
object Multimodal {

  /** Decoded-media metadata contract. */
  case class MediaMeta(byteLen: Long, width: Int, height: Int, checksum: String)

  case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Attach a binary `payload` column (here: utf8 bytes of a string
    * column — the stand-in for real image/audio bytes read from storage).
    */
  def withPayload(df: DataFrame, srcCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      encode(col(srcCol), "UTF-8").as("payload"))

  /** A REAL decoded image: dimensions + row-major 8-bit grayscale
    * plane. Single-band sources (gray PNG etc.) read raw raster samples
    * — no color-space conversion, so a gray PNG round-trips its pixel
    * values exactly (PNG is lossless; `getRGB` would gamma-shift them).
    * Multi-band sources reduce via the integer BT.601 luma
    * `(299·R + 587·G + 114·B) / 1000` — order-free integer math, the
    * same on every JVM.
    */
  case class DecodedImage(width: Int, height: Int, gray: Array[Int])

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF).
    * Returns None when the payload is not a decodable image — callers
    * fall back to the non-image stub. Pure function of the bytes;
    * safe inside `mapPartitions`.
    */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val gray = new Array[Int](w * h)
        val raster = img.getRaster
        val singleBand = raster.getNumBands == 1
        var j = 0
        var idx = 0
        while (j < h) {
          var i = 0
          while (i < w) {
            gray(idx) =
              if (singleBand) raster.getSample(i, j, 0)
              else {
                val rgb = img.getRGB(i, j)
                (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
              }
            idx += 1
            i += 1
          }
          j += 1
        }
        DecodedImage(w, h, gray)
      }
    } catch {
      // ImageIO plugins throw unchecked exceptions (ArrayIndexOutOfBounds,
      // NegativeArraySize, IllegalArgument, ...) on truncated/corrupt
      // payloads, not just IOException; the contract is "None when the
      // payload is not a decodable image", so catch anything non-fatal.
      case scala.util.control.NonFatal(_) => None
    }

  /** Encode an 8-bit grayscale plane as a (lossless) PNG — the test/
    * fixture side of [[decodeImage]]: encode(decode(x)) round-trips the
    * raster samples exactly.
    */
  def encodeGrayPng(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var j = 0
    var idx = 0
    while (j < height) {
      var i = 0
      while (i < width) {
        raster.setSample(i, j, 0, gray(idx) & 0xff)
        idx += 1
        i += 1
      }
      j += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** STUB decode — deterministic fake for the payloads this
    * environment has NO codec for (audio/video). Image payloads never
    * reach it ([[decodePartitions]] tries [[decodeImage]] first).
    */
  def fakeDecode(payload: Array[Byte]): MediaMeta = {
    val len = payload.length.toLong
    MediaMeta(
      byteLen = len,
      width = (len % 640).toInt,
      height = (len % 480).toInt,
      checksum = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString)
  }

  /** Metadata extraction over the binary column. Declarative twin of
    * [[fakeDecode]] (same outputs via codegen'd expressions) — used where
    * the "decode" is expressible as columns; `decodePartitions` shows the
    * partition-local path a real codec needs.
    */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("id"),
      length(col("payload")).cast("long").as("byte_len"),
      pmod(length(col("payload")), lit(640)).cast("int").as("width"),
      pmod(length(col("payload")), lit(480)).cast("int").as("height"),
      md5(col("payload")).as("checksum"))

  /** The typed decode path: batched, partition-local. Image payloads
    * decode for REAL (ImageIO → true width/height + checksum); anything
    * else falls back to the deterministic non-image stub. One codec
    * registry lookup per row is what ImageIO costs; a heavier codec
    * would init once per partition here.
    */
  def decodePartitions(media: Dataset[(Long, Array[Byte])]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        val meta = decodeImage(payload) match {
          case Some(d) => MediaMeta(
            byteLen = payload.length.toLong,
            width = d.width,
            height = d.height,
            checksum = java.security.MessageDigest.getInstance("MD5")
              .digest(payload).map("%02x".format(_)).mkString)
          case None => fakeDecode(payload)
        }
        MediaRow(id, payload, meta)
      }
    }
  }

  /** Real pixel extraction: decode every image payload and return
    * `(id, width, height, px)` with the row-major grayscale plane as an
    * array column — the hand-off point from codec land to declarative
    * Column math ([[aHash60Of]] etc.). Non-image payloads are dropped
    * (they have no pixels).
    */
  def decodeGray(media: Dataset[(Long, Array[Byte])]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        decodeImage(payload).map(d => (id, d.width, d.height, d.gray))
      }
    }.toDF("id", "width", "height", "px")
  }

  /** 60 evenly-spaced "pixel" samples from the stub decode: byte k of 60
    * reads position `1 + floor(k·(L−1)/59)` of the payload (both ends
    * included). The payload bytes here are utf8 text, so `ascii(char)`
    * IS the byte value — a real image pipeline swaps this for the
    * decoded grayscale plane ([[decodePartitions]]'s slot) and keeps
    * everything downstream. Project the result ONCE per row (see
    * [[TextAnalysis.withTokens]]'s codegen note) — [[aHash60Of]] reads
    * it twice (mean + threshold fold).
    */
  def pixels60(text: Column): Column = {
    // long multiply: length() is int, and k·lastIdx overflows 32 bits for
    // payloads past ~36M chars — the oracle computes it in BIGINT
    val lastIdx = (greatest(length(text), lit(1)) - 1).cast("long")
    transform(sequence(lit(0), lit(59)),
      k => ascii(text.substr(
        lit(1) + floor(k.cast("long") * lastIdx / lit(59.0)).cast("int"), lit(1))))
  }

  /** 60-bit average-hash ("aHash") over a sampled-pixel array: threshold
    * every pixel against the sample mean, fold the bits MSB-first into a
    * long — the perceptual-hash shape of image near-dup pipelines
    * (aHash/pHash/dHash), 60 bits so checked-arithmetic engines never
    * overflow. Identical images hash identically; small perturbations
    * flip few bits. Pure per-row array math — embarrassingly parallel;
    * dedup then groups on the hash (one shuffle of 8-byte keys), with an
    * optional in-bucket Hamming refine at tighter thresholds.
    */
  def aHash60Of(px: Column): Column = {
    val mean = aggregate(px, lit(0L), (a, x) => a + x).cast("double") / size(px)
    aggregate(px, lit(0L),
      (acc, x) => acc * 2 + when(x.cast("double") > mean, 1L).otherwise(0L))
  }

  /** Nearest-neighbor resize of a row-major grayscale plane, entirely
    * in-plan (no UDF): output pixel (y, x) reads source pixel
    * `((y·inH) div outH, (x·inW) div outW)` — the standard
    * truncating-NN index map, integer-exact so any engine replays it.
    * Per-row array math, embarrassingly parallel; the downsample step
    * every thumbnail/feature pipeline runs between decode and hash.
    */
  def resizeNearestOf(px: Column, inW: Int, inH: Int,
      outW: Int, outH: Int): Column = {
    require(inW > 0 && inH > 0 && outW > 0 && outH > 0, "positive dims")
    transform(sequence(lit(0), lit(outH * outW - 1)), k => {
      val y = floor(k.cast("double") / outW).cast("int")
      val x = pmod(k, lit(outW)).cast("int")
      val sy = floor(y.cast("double") * inH / outH).cast("int")
      val sx = floor(x.cast("double") * inW / outW).cast("int")
      element_at(px, sy * inW + sx + 1)
    })
  }

  /** Frame sampling stand-in: slice the payload into `n` fixed-offset
    * byte windows — the plumbing shape of video frame extraction (one
    * output row per sampled frame, frames shorter than `frameBytes` at the
    * tail are kept as-is, empty ones dropped).
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int): DataFrame =
    media
      .select(
        col("id"),
        posexplode(
          transform(
            sequence(lit(0), lit(n - 1)),
            i => col("payload").substr(i * frameBytes + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .filter(length(col("frame")) > 0)
      .withColumn("frame_md5", md5(col("frame")))
}

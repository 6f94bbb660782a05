package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata structs, with decode / feature
  * extraction / frame sampling as partition-local transforms.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * step is a clearly-marked deterministic STUB ([[fakeDecode]]); the
  * Spark-side contract — binary schema, batched partition-local
  * processing, metadata struct shape — is real and tested. Swap
  * [[fakeDecode]] for a real codec (e.g. via mapInPandas/mapPartitions
  * over an image library) without touching callers.
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

  /** STUB decode — deterministic fake in place of a real image decode.
    * Real implementation: `ds.mapPartitions` batching payloads through a
    * native decoder (or Python `mapInPandas` for PIL/ffmpeg), one codec
    * init per partition, not per row.
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

  /** The real-codec path: batched, partition-local decode with typed
    * output — this is where an actual image library would run.
    */
  def decodePartitions(media: Dataset[(Long, Array[Byte])]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { case (id, payload) => MediaRow(id, payload, fakeDecode(payload)) }
    }
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

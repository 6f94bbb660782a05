package graft.ingest

import graft.model.Dp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed ingest: text lines → canonical dp DataFrame. Works on both
  * batch and streaming Datasets (the same transformations compile under
  * Structured Streaming — SURVEY.md §3.3's Spark shape).
  *
  * `seq` encodes arrival order for last-wins dedup (SURVEY.md §7.4 item
  * 2). Batch: `monotonically_increasing_id()`. Streaming (where that
  * expression is unsupported): `batch-ms-since-2020 << 22 | partition
  * << 12 | within-partition index` — later batches outrank earlier
  * ones at millisecond granularity (micro-batches can start within the
  * same second), and duplicates INSIDE one micro-batch resolve
  * deterministically by arrival position instead of arbitrarily.
  */
object Ingest {

  /** Re-number a parsed partition with its within-partition arrival
    * index carried in `seq` (input parsers emit seq=0).
    */
  private def indexed(it: Iterator[Dp]): Iterator[Dp] = {
    var i = -1L
    it.map { d => i += 1; d.copy(seq = i) }
  }

  /** OpenTSDB plain-put lines (TCP port 6181 / `POST` text). */
  def fromPlain(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    withSeq(lines.mapPartitions(it =>
      indexed(it.flatMap(l => LineParsers.parsePlain(l)))))
  }

  /** InfluxDB line protocol (TCP port 6180 / `POST /api/write`); one row
    * per field. `nowMs` stamps lines without a timestamp.
    */
  def fromInflux(lines: Dataset[String], nowMs: Long): DataFrame = {
    import lines.sparkSession.implicits._
    withSeq(lines.mapPartitions(it =>
      indexed(it.flatMap(l => LineParsers.parseInflux(l, nowMs)))))
  }

  /** OpenTSDB JSON put bodies (`POST /api/put`): each input string is one
    * request body — a single dp object or an array.
    */
  def fromJson(bodies: Dataset[String]): DataFrame = {
    import bodies.sparkSession.implicits._
    withSeq(bodies.mapPartitions(it =>
      indexed(it.flatMap(b => LineParsers.parseJson(b)))))
  }

  /** 2020-01-01 epoch offset: keeps `batchMs << 22` inside a signed
    * Long until ~2089 (a raw epoch-ms shift would wrap in 2039).
    */
  private val SeqEpochMs = 1577836800000L

  private def withSeq(parsed: Dataset[Dp]): DataFrame = {
    val df = parsed.toDF()
    if (df.isStreaming)
      // current_timestamp() is the micro-batch timestamp (constant
      // within a batch, ms precision — distinct per batch in practice).
      // Addition (not OR) so an overfull partition degrades into the
      // neighboring bits while staying monotonic within its partition —
      // arrival order is never violated where it's defined.
      df.withColumn("seq",
        shiftleft(unix_millis(current_timestamp()) - SeqEpochMs, 22)
          + shiftleft(spark_partition_id().cast("long"), 12)
          + col("seq"))
    else df.withColumn("seq", monotonically_increasing_id())
  }

  /** Write a dp batch to the canonical at-rest layout: Parquet partitioned
    * by UTC date — the Spark analogue of the reference's 1-day Tsdb
    * rotation (`include/tsdb.h:219-221`). Partition pruning on `date` is
    * what makes time-range scans cheap at 100 TB.
    */
  def writePartitioned(dp: DataFrame, path: String): Unit =
    dp.withColumn("date", to_date(timestamp_millis(col("ts"))))
      .repartition(col("date"))
      .write
      .mode("append")
      .partitionBy("date")
      .parquet(path)
}

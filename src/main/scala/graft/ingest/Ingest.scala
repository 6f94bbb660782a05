package graft.ingest

import graft.model.Dp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed ingest: text lines → canonical dp DataFrame. Works on both
  * batch and streaming Datasets (the same transformations compile under
  * Structured Streaming — SURVEY.md §3.3's Spark shape).
  *
  * `seq` is assigned with `monotonically_increasing_id()` — unique and
  * increasing within each ingest batch, which is exactly the arrival-order
  * contract last-wins dedup needs (SURVEY.md §7.4 item 2).
  */
object Ingest {

  /** OpenTSDB plain-put lines (TCP port 6181 / `POST` text). */
  def fromPlain(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    withSeq(lines.flatMap(l => LineParsers.parsePlain(l)).toDF())
  }

  /** InfluxDB line protocol (TCP port 6180 / `POST /api/write`); one row
    * per field. `nowMs` stamps lines without a timestamp.
    */
  def fromInflux(lines: Dataset[String], nowMs: Long): DataFrame = {
    import lines.sparkSession.implicits._
    withSeq(lines.flatMap(l => LineParsers.parseInflux(l, nowMs)).toDF())
  }

  /** OpenTSDB JSON put bodies (`POST /api/put`): each input string is one
    * request body — a single dp object or an array.
    */
  def fromJson(bodies: Dataset[String]): DataFrame = {
    import bodies.sparkSession.implicits._
    withSeq(bodies.flatMap(b => LineParsers.parseJson(b)).toDF())
  }

  private def withSeq(df: DataFrame): DataFrame =
    if (df.isStreaming)
      // monotonically_increasing_id is unsupported under streaming; the
      // batch timestamp gives "latest batch wins" — the arrival-order
      // contract at micro-batch granularity
      df.withColumn("seq", unix_millis(current_timestamp()))
    else df.withColumn("seq", monotonically_increasing_id())

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

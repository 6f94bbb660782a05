package graft.streaming

import graft.ingest.Ingest
import graft.model.Dp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming ingest — the Spark shape of the reference's write
  * path (SURVEY.md §3.3): socket/Kafka/file lines → parse → date-partitioned
  * Parquet, plus a streaming hourly-rollup aggregation. The streaming
  * checkpoint replaces the reference's WAL (`include/append.h`); watermark +
  * late-data handling replaces its out-of-order page machinery.
  */
object StreamIngest {

  /** Parse a streaming Dataset of wire-format lines into dp rows. The
    * same parsers run in batch and streaming (Ingest.from*).
    */
  def dpStream(lines: Dataset[String], format: String,
      nowMs: Long = System.currentTimeMillis()): DataFrame = format match {
    case "plain" => Ingest.fromPlain(lines)
    case "influx" => Ingest.fromInflux(lines, nowMs)
    case "json" => Ingest.fromJson(lines)
    case other => throw new IllegalArgumentException(s"unknown format: $other")
  }

  /** Raw-point sink: append to Parquet partitioned by UTC date (the 1-day
    * Tsdb rotation, `include/tsdb.h:219-221`). Queries get partition
    * pruning on `date` for free.
    */
  def writeRaw(dp: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): DataStreamWriter[Row] =
    dp.withColumn("date", to_date(timestamp_millis(col("ts"))))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")
      .outputMode(OutputMode.Append)
      .trigger(trigger)

  /** Streaming hourly rollup {cnt,min,max,sum} per series — the write-time
    * accumulator of the reference (`src/agg/rollup.cpp:180-286`). The
    * watermark bounds state: points later than `lateness` are dropped from
    * the rollup exactly like the reference invalidates rollups for
    * out-of-order series and falls back to raw (`rollup.cpp:237-243`) —
    * the raw table remains the source of truth for late data.
    */
  def rollup1hStream(dp: DataFrame, lateness: String = "1 hour"): DataFrame =
    Dp.withSeriesKey(dp)
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", lateness)
      .groupBy(window(col("ets"), "1 hour"), col("skey"))
      .agg(
        count(col("value")).as("cnt"),
        min(col("value")).as("min"),
        max(col("value")).as("max"),
        sum(col("value")).as("sum"))
      .select(
        col("skey"),
        unix_millis(col("window.start")).as("wts"),
        col("cnt"), col("min"), col("max"), col("sum"))
}

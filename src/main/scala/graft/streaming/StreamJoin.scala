package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterpart of [[graft.query.SeriesJoin]]: time-windowed
  * stream-stream joins with watermark-bounded state. Batch pairing
  * answers "which errors preceded this click" after the fact; this is the
  * same contract over live streams, the Structured Streaming shape for
  * correlation/enrichment alongside ingest.
  */
object StreamJoin {

  /** Streaming interval join: every (left, right) pair on the same key
    * with `right.ts ∈ [left.ts + lower, left.ts + upper]` (ms), over two
    * STREAMING frames. Same contract as
    * [[graft.query.SeriesJoin.intervalJoin]] — batch/stream parity is
    * spec-asserted — but expressed as Spark's native stream-stream inner
    * join: both sides carry an event-time column + watermark, and the
    * range predicate on those event times is what lets Spark derive a
    * state watermark and EVICT buffered rows once they can no longer
    * match (state ∝ lateness + window width, not stream length — the
    * property that makes this run indefinitely at ingest scale).
    *
    * `lateness` is the out-of-order bound shared by both sides; rows
    * later than it are dropped from the join exactly like the rollup
    * stream drops them ([[StreamIngest.rollup1hStream]]) — the raw sink
    * remains the source of truth for late data.
    *
    * Output: all left columns, then the matched right row's timestamp as
    * `right_ts` plus its value columns (names must not collide, as in
    * the batch operator).
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], lower: Long, upper: Long,
      lateness: String = "1 hour",
      leftTs: String = "ts", rightTs: String = "ts"): DataFrame = {
    require(upper >= lower, s"empty interval [$lower, $upper]")
    val rightVals =
      right.columns.toSeq.filterNot(keyCols.contains).filterNot(_ == rightTs)
    val collisions = rightVals.toSet.intersect(
      left.columns.toSet + "right_ts")
    require(collisions.isEmpty,
      s"right value columns collide with left/output columns: $collisions")

    val lw = left
      .withColumn("_levt", timestamp_millis(col(leftTs).cast("long")))
      .withWatermark("_levt", lateness)
    val rw = keyCols.foldLeft(
      right
        .withColumnRenamed(rightTs, "_rts")
        .withColumn("_revt", timestamp_millis(col("_rts").cast("long")))
        .withWatermark("_revt", lateness)
    )((d, k) => d.withColumnRenamed(k, s"_rk_$k"))

    val keyCond = keyCols.map(k => col(k) === col(s"_rk_$k")).reduce(_ && _)
    val cond = keyCond &&
      col("_revt") >= col("_levt") + expr(s"INTERVAL $lower MILLISECOND") &&
      col("_revt") <= col("_levt") + expr(s"INTERVAL $upper MILLISECOND")

    lw.join(rw, cond, "inner")
      .select(left.columns.toSeq.map(col) ++
        (col("_rts").cast("long").as("right_ts") +: rightVals.map(col)): _*)
  }
}

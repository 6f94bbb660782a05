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

  /** One buffered row in [[AsofState]]: `side` 0 = right, 1 = left. */
  case class AsofRow(side: Int, ts: Long, v: Double)
  case class AsofState(rows: Seq[AsofRow])
  /** Enriched left row: `asofTs`/`y` empty when no right row preceded. */
  case class AsofOut(k: String, ts: Long, v: Double,
      asofTs: Option[Long], y: Option[Double])

  /** Streaming AS-OF enrichment — Spark has no native stream-stream
    * as-of join (the contract is an argmax, not a range predicate), so
    * this is the `flatMapGroupsWithState` shape: per key, buffer both
    * sides; once the watermark passes a left row, every right row at or
    * before it has either arrived or been dropped as too late, so the
    * match is FINAL — emit it enriched with the latest right row at or
    * before its timestamp ([[graft.query.SeriesJoin.asofJoin]] semantics,
    * batch/stream parity spec-checked on in-watermark rows).
    *
    * State per key stays O(lateness-window), not O(stream): emitted
    * lefts leave the buffer, and of the rights at or below the watermark
    * only the LATEST survives (any earlier one can never be the argmax
    * for a future left, which arrives above the watermark). An
    * event-time timeout set to the earliest buffered left row guarantees
    * emission even if the key goes quiet — the group wakes when the
    * watermark passes it, without waiting for new same-key data.
    *
    * Inputs are (k, ts, v) frames (ms epoch ts); output is the typed
    * [[AsofOut]]. `lateness` is the shared out-of-order bound.
    */
  def asofEnrichStream(left: DataFrame, right: DataFrame,
      lateness: String = "1 hour"): org.apache.spark.sql.Dataset[AsofOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = left.sparkSession
    import spark.implicits._

    // the watermarked event-time column must survive into the grouped
    // Dataset (projecting it away fails the event-time-timeout check)
    val u = left.select(col("k"), col("ts").cast("long"), col("v"), lit(1).as("side"))
      .unionByName(
        right.select(col("k"), col("ts").cast("long"), col("v"), lit(0).as("side")))
      .withColumn("_evt", timestamp_millis(col("ts")))
      .withWatermark("_evt", lateness)
      .select(col("k"), col("side"), col("ts"), col("v"), col("_evt"))
      .as[(String, Int, Long, Double, java.sql.Timestamp)]

    u.groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[(String, Int, Long, Double, java.sql.Timestamp)],
            state: GroupState[AsofState]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.map(_.rows).getOrElse(Seq.empty) ++
            it.map { case (_, side, ts, v, _) => AsofRow(side, ts, v) }
          // sort once: rights before lefts at equal ts = inclusive <=
          val sorted = buf.sortBy(r => (r.ts, r.side))
          val out = Seq.newBuilder[AsofOut]
          var best: Option[AsofRow] = None // latest right seen so far
          val keep = Seq.newBuilder[AsofRow]
          sorted.foreach { r =>
            if (r.side == 0) {
              best = Some(r)
              // rights above the watermark may still precede late lefts;
              // below it, only the running latest can ever match again —
              // it is re-added after the loop
              if (r.ts > wm) keep += r
            } else if (r.ts <= wm) {
              out += AsofOut(k, r.ts, r.v, best.map(_.ts), best.map(_.v))
            } else {
              keep += r // left still inside the lateness window
            }
          }
          val latestFinalRight = sorted
            .filter(r => r.side == 0 && r.ts <= wm).lastOption
          val next = (latestFinalRight.toSeq ++ keep.result())
            .sortBy(r => (r.ts, r.side))
          if (next.isEmpty) state.remove()
          else {
            state.update(AsofState(next))
            // wake when the watermark passes the earliest buffered left;
            // a right-only buffer sets no timeout — its single standing
            // candidate persists like a series-index row (O(#keys)),
            // ready for whenever the key's left stream resumes
            val firstLeft = next.collectFirst { case r if r.side == 1 => r.ts }
            firstLeft.foreach(t => state.setTimeoutTimestamp(t + 1))
          }
          out.result().iterator
      }
  }
}

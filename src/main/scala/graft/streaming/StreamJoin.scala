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

  /** One buffered row in [[AsofState]]: `side` 0 = right, 1 = left;
    * `payload` is the row's JSON-packed columns (full left row, or the
    * right side's value columns).
    */
  case class AsofRow(side: Int, ts: Long, payload: String)
  case class AsofState(rows: Seq[AsofRow])
  // NOT private: whole-stage codegen generates Java that reads this
  // class's accessors, and janino cannot resolve methods on a
  // private nested class — every micro-batch then logs an ERROR and
  // falls back to interpreted expression evaluation (correct but
  // slower, and the fallback spams the driver log once per stage)
  case class AsofOutRaw(ts: Long, payload: String,
      asofTs: Option[Long], rpayload: Option[String])

  /** Streaming AS-OF enrichment — Spark has no native stream-stream
    * as-of join (the contract is an argmax, not a range predicate), so
    * this is the `flatMapGroupsWithState` shape: per key, buffer both
    * sides; once the watermark passes a left row, every right row at or
    * before it has either arrived or been dropped as too late, so the
    * match is FINAL — emit it enriched with the latest right row at or
    * before its timestamp ([[graft.query.SeriesJoin.asofJoin]] semantics,
    * batch/stream parity spec-checked on in-watermark rows).
    *
    * Arbitrary schemas, like the batch operator: any `keyCols`, any
    * left/right columns (right value names must not collide with left's
    * — the asofJoin contract). Rows travel through the typed state as
    * (side, ts, JSON payload) — the streaming stand-in for the batch
    * operator's `_rv` struct, with the grouping key the JSON of the key
    * struct — and the output re-projects to the batch layout: all left
    * columns, `asof_ts`, then the right value columns. JSON round-trips
    * Spark's scalar types losslessly (Jackson emits shortest-round-trip
    * doubles); NaN/Inf payload values are the one exclusion, as in
    * `to_json` generally.
    *
    * State per key stays O(lateness-window), not O(stream): emitted
    * lefts leave the buffer, and of the rights at or below the watermark
    * only the LATEST survives (any earlier one can never be the argmax
    * for a future left, which arrives above the watermark). An
    * event-time timeout set to the earliest buffered left row guarantees
    * emission even if the key goes quiet — the group wakes when the
    * watermark passes it, without waiting for new same-key data.
    * `lateness` is the shared out-of-order bound.
    */
  def asofEnrichStream(left: DataFrame, right: DataFrame,
      keyCols: Seq[String] = Seq("k"),
      leftTs: String = "ts", rightTs: String = "ts",
      lateness: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types.StructType
    val spark = left.sparkSession
    import spark.implicits._

    val rightVals =
      right.columns.toSeq.filterNot(keyCols.contains).filterNot(_ == rightTs)
    val collisions = rightVals.toSet.intersect(left.columns.toSet + "asof_ts")
    require(collisions.isEmpty,
      s"right value columns collide with left/output columns: $collisions")
    require(!left.columns.contains("asof_ts"),
      "left side may not carry a column named asof_ts (reserved for the match)")
    val leftSchema = left.schema
    val rvSchema = StructType(
      right.schema.fields.filter(f => rightVals.contains(f.name)))

    def pack(df: DataFrame, side: Int, ts: String,
        payloadCols: Seq[String]): DataFrame =
      df.select(
        to_json(struct(keyCols.map(col): _*)).as("_key"),
        lit(side).as("_side"),
        col(ts).cast("long").as("_ts"),
        to_json(struct(payloadCols.map(col): _*)).as("_payload"))
    // the watermarked event-time column must survive into the grouped
    // Dataset (projecting it away fails the event-time-timeout check)
    val u = pack(left, 1, leftTs, left.columns.toSeq)
      .unionByName(pack(right, 0, rightTs, rightVals))
      .withColumn("_evt", timestamp_millis(col("_ts")))
      .withWatermark("_evt", lateness)
      .select(col("_key"), col("_side"), col("_ts"), col("_payload"), col("_evt"))
      .as[(String, Int, Long, String, java.sql.Timestamp)]

    val raw = u.groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofOutRaw](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[(String, Int, Long, String, java.sql.Timestamp)],
            state: GroupState[AsofState]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.map(_.rows).getOrElse(Seq.empty) ++
            it.map { case (_, side, ts, p, _) => AsofRow(side, ts, p) }
          // sort once: rights before lefts at equal ts = inclusive <=
          val sorted = buf.sortBy(r => (r.ts, r.side))
          val out = Seq.newBuilder[AsofOutRaw]
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
              out += AsofOutRaw(r.ts, r.payload,
                best.map(_.ts), best.map(_.payload))
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

    // unpack to the batch operator's layout: left columns, asof_ts,
    // right value columns (null when no right row preceded)
    raw.select(
        from_json(col("payload"), leftSchema).as("_l"),
        col("asofTs").as("asof_ts"),
        from_json(col("rpayload"), rvSchema).as("_r"))
      .select(leftSchema.fieldNames.toSeq.map(c => col(s"_l.$c").as(c)) ++
        (col("asof_ts") +: rightVals.map(c => col(s"_r.$c").as(c))): _*)
  }
}

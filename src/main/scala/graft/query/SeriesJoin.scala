package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-aligned joins between series — operators the reference (a
  * single-metric TSDB, no join surface) does not have, but that every
  * analytics workload over its data model eventually needs: "for each
  * sample of A, the latest sample of B" (as-of) is how unaligned series
  * get combined without resampling. Semantics follow the published
  * contracts of DuckDB `ASOF JOIN` / kdb `aj` / pandas `merge_asof`.
  */
object SeriesJoin {

  /** As-of join: attach to each left row the LATEST right row with
    * `right.ts <= left.ts` on the same key (`direction = "backward"`,
    * the default) or the EARLIEST with `right.ts >= left.ts`
    * (`"forward"`); left rows with no eligible right row keep nulls.
    * `inclusive = false` excludes the equal-timestamp match (pandas
    * `allow_exact_matches = False`). `tolerance` additionally nulls out
    * matches farther than that many ms from `left.ts` (pandas
    * `merge_asof` tolerance). Both directions are the same single-shuffle
    * plan — forward just walks the merged timeline in descending time,
    * so the running `last` carries the nearest FOLLOWING right row.
    *
    * Shape at scale: deliberately NOT a range join — a range join's
    * bucket-overlap blowup is quadratic in series density, and Spark
    * would plan a cartesian-per-key. Instead both sides union into one
    * frame hash-partitioned by key and sorted by (ts, side), and one
    * running `last(struct, ignoreNulls)` window carries the most recent
    * right row forward into each left row: exactly ONE shuffle on the
    * key, then a linear merge-scan per partition — the kdb `aj` plan. A
    * skewed key (one series with 10⁹ samples) degrades to that
    * partition's sort, never to a pair explosion.
    *
    * All right value columns travel in ONE struct so they always resolve
    * from the same right row (independent `last(col)` calls could mix
    * rows when right columns hold nulls). Right rows sort before left
    * rows at an equal timestamp (side 0 < 1) which is what makes the
    * match inclusive; among right rows tied on (key, ts) the greatest
    * struct wins — deterministic, though such ties mean the caller
    * should pre-aggregate the right side.
    *
    * Left/right column names must not collide (beyond the key columns);
    * the matched right timestamp surfaces as `asof_ts`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts",
      tolerance: Option[Long] = None,
      direction: String = "backward",
      inclusive: Boolean = true): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rightVals =
      right.columns.toSeq.filterNot(keyCols.contains).filterNot(_ == rightTs)
    val collisions = rightVals.toSet.intersect(
      left.columns.toSet ++ Set("asof_ts", "_ats", "_side", "_rv", "_m"))
    require(collisions.isEmpty,
      s"right value columns collide with left/output columns: $collisions")
    // guard BOTH sides against the internal working set (like
    // intervalJoin): a left column named _ats/_side/_rv/_m would be
    // silently overwritten by the withColumns below and the output
    // select would return the cast timestamp instead of the user's data
    val reservedLeft =
      left.columns.toSet.intersect(Set("asof_ts", "_ats", "_side", "_rv", "_m"))
    require(reservedLeft.isEmpty,
      s"left columns use reserved asof-join names: $reservedLeft")

    val rvStruct = struct(
      (col(rightTs).cast("long").as("asof_ts") +: rightVals.map(col)): _*)
    val r2 = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).cast("long").as("_ats"),
        lit(0).as("_side"),
        rvStruct.as("_rv")): _*)
    val l2 = left
      .withColumn("_ats", col(leftTs).cast("long"))
      .withColumn("_side", lit(1))
    // unionByName(allowMissing) nulls the absent side: left rows get a
    // null _rv (skipped by ignoreNulls), right rows null left payloads
    // (dropped by the _side filter)
    val u = l2.unionByName(r2, allowMissingColumns = true)

    // backward walks ascending time; forward walks descending, so the
    // running `last` right row is the nearest following one. Within an
    // equal-timestamp group (either walk direction) rights sort before
    // lefts exactly when the match is inclusive
    val tsOrd = if (direction == "backward") col("_ats").asc else col("_ats").desc
    val sideOrd = if (inclusive) col("_side").asc else col("_side").desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, sideOrd, col("_rv").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val ok = tolerance match {
      case Some(t) if direction == "backward" =>
        col("_m").isNotNull && col("_m.asof_ts") >= col("_ats") - t
      case Some(t) =>
        col("_m").isNotNull && col("_m.asof_ts") <= col("_ats") + t
      case None => col("_m").isNotNull
    }
    val outCols = left.columns.toSeq.map(col) ++
      (when(ok, col("_m.asof_ts")).as("asof_ts") +:
        rightVals.map(v => when(ok, col(s"_m.$v")).as(v)))
    matched.select(outCols: _*)
  }

  /** Floor division kept in long arithmetic end-to-end: subtracting the
    * non-negative `pmod` makes the numerator an exact multiple, so SQL
    * `div`'s truncate-toward-zero equals floor even for negative
    * timestamps, and (unlike `/`, which is double division) nanosecond
    * magnitudes past 2^53 stay exact.
    */
  private def withFloorDiv(df: DataFrame, out: String,
      a: org.apache.spark.sql.Column, w: Long): DataFrame =
    df.withColumn(s"__q_$out", a - pmod(a, lit(w)))
      .withColumn(out, expr(s"__q_$out div $w"))
      .drop(s"__q_$out")

  /** Interval (range) join: every (left, right) pair on the same key with
    * `right.ts ∈ [left.ts + lower, left.ts + upper]` — the Flink
    * interval-join contract (e.g. `lower = -2h, upper = 0` pairs each
    * event with same-key events from the preceding two hours).
    *
    * Shape at scale: a raw `ON key = key AND ts BETWEEN …` join gives
    * Spark an equi-join on key with a residual range predicate — fine
    * until one key holds millions of rows, when the per-key match becomes
    * a quadratic scan. Instead both sides bucket time into
    * `max(upper - lower, 1)`-wide buckets: a right row lands in exactly
    * one bucket, a left row's window spans AT MOST TWO, so the left side
    * explodes ≤2× and the join is a plain equi-join on (key, bucket)
    * with the exact range as a post-filter. Work is proportional to true
    * bucket co-occupancy — the standard interval-join layout — and every
    * pair is produced exactly once (a right row's single bucket can match
    * a given left row through only one of its ≤2 candidates).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lower: Long, upper: Long,
      leftTs: String = "ts", rightTs: String = "ts"): DataFrame = {
    require(upper >= lower, s"empty interval [$lower, $upper]")
    val rightVals =
      right.columns.toSeq.filterNot(keyCols.contains).filterNot(_ == rightTs)
    val collisions = rightVals.toSet.intersect(
      left.columns.toSet + "right_ts")
    require(collisions.isEmpty,
      s"right value columns collide with left/output columns: $collisions")
    require(!left.columns.contains("right_ts"),
      "left side may not carry a column named right_ts (reserved for the match)")
    val reserved = (left.columns.toSet ++ rightVals ++ keyCols)
      .filter(c => c.startsWith("__q_") ||
        Set("_b", "_b0", "_b1", "_lts", "_rts").contains(c))
    require(reserved.isEmpty, s"reserved column names in inputs: $reserved")
    val w = math.max(upper - lower, 1L)

    val l1 = left.withColumn("_lts", col(leftTs).cast("long"))
    val l2 = withFloorDiv(
      withFloorDiv(l1, "_b0", col("_lts") + lower, w),
      "_b1", col("_lts") + upper, w)
      .withColumn("_b", explode(sequence(col("_b0"), col("_b1"))))
      .drop("_b0", "_b1")
    val r1 = right.select(
      keyCols.map(col) ++ Seq(col(rightTs).cast("long").as("_rts")) ++
        rightVals.map(col): _*)
    val r2 = withFloorDiv(r1, "_b", col("_rts"), w)

    l2.join(r2, keyCols :+ "_b")
      .filter(col("_rts").between(col("_lts") + lower, col("_lts") + upper))
      .select(left.columns.toSeq.map(col) ++
        (col("_rts").as("right_ts") +: rightVals.map(col)): _*)
  }
}

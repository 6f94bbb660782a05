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
    * `right.ts <= left.ts` (inclusive) on the same key; left rows with no
    * eligible right row keep nulls. `tolerance` additionally nulls out
    * matches older than `left.ts - tolerance` (pandas `merge_asof`
    * tolerance).
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
      tolerance: Option[Long] = None): DataFrame = {
    val rightVals =
      right.columns.toSeq.filterNot(keyCols.contains).filterNot(_ == rightTs)
    val collisions = rightVals.toSet.intersect(
      left.columns.toSet ++ Set("asof_ts", "_ats", "_side", "_rv", "_m"))
    require(collisions.isEmpty,
      s"right value columns collide with left/output columns: $collisions")

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

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc, col("_rv").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val ok = tolerance match {
      case Some(t) =>
        col("_m").isNotNull && col("_m.asof_ts") >= col("_ats") - t
      case None => col("_m").isNotNull
    }
    val outCols = left.columns.toSeq.map(col) ++
      (when(ok, col("_m.asof_ts")).as("asof_ts") +:
        rightVals.map(v => when(ok, col(s"_m.$v")).as(v)))
    matched.select(outCols: _*)
  }
}

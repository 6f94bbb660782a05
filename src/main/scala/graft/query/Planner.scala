package graft.query

import graft.functions.GraftFunctions
import graft.model.{Dp, SubQuery, TsQuery}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QuerySpec → DataFrame pipeline — the Spark equivalent of the
  * reference's whole query engine (`src/core/query.cpp`). Catalyst is the
  * analyzer/optimizer; this is the ~200-line declarative "planner"
  * (SURVEY.md §3.1):
  *
  *   source.filter(time ∧ metric ∧ tags)      — partition/rowgroup pruning
  *    .dedup(last-wins by seq)                — `query_with_ooo`, query.cpp:722-803
  *    .downsample(bucket agg per series)      — src/agg/down.cpp
  *    .fill(bucket spine left-join)           — down.cpp:248-311
  *    .aggAcrossSeries(groupBy bucket+tags)   — src/agg/aggregate.cpp:158-215
  *    .rate(lag window)                       — src/agg/rate.cpp:38-92
  *
  * Input dp schema: (metric STRING, tags MAP, ts LONG epoch-ms,
  * value DOUBLE, seq LONG). Output: `ts` (epoch ms), `value`, plus `skey`
  * + `tags` (per-series results) or the grouping tag columns (aggregated
  * results).
  *
  * Scale notes: every stage is a hash aggregation or window over keys that
  * include the series key — partial aggregation (map-side combine) applies
  * to dedup (max_by) and every downsample fn except percentile; nothing
  * collects to the driver.
  */
object Planner {

  /** Planner options.
    *
    *   - `dedup=false` skips the last-wins stage (one less shuffle) when
    *     the source is known duplicate-free — the common case for
    *     immutable batch-loaded data.
    *   - `seriesIndex` is the index-scan path (reference
    *     `Tsdb::query_for_ts`, `src/core/tsdb.cpp:1586-1609`): a
    *     (skey, metric, tags) dimension table (see [[Meta.seriesTable]]).
    *     Tag predicates then run on the tiny dim table to resolve the
    *     matching series set, and the fact scan does a broadcast
    *     semi-join on `skey` — no per-row regex/map probing over the bulk
    *     data. Results are identical either way; at 100 TB the dim-table
    *     route is the difference between evaluating a wildcard regex
    *     10¹¹ times and 10⁶ times.
    *   - `approxPercentileAccuracy`: opt-in sketch percentiles for
    *     cross-series pNN over unbounded series counts (see
    *     [[GraftFunctions.aggFor]]); None = exact reference semantics.
    *   - `rollup1h`/`rollup1d`/`oooMarks`: materialized rollup tables and
    *     the maintained invalidation frame. When `rollup1h` is set, the
    *     API layer executes eligible queries through [[planRouted]].
    *   - `collectSeriesKeys`: aggregated results additionally carry a
    *     `skeys_` column = the sorted distinct member series keys of each
    *     output row. Lets the API layer answer "which series fed this
    *     group" (aggregateTags) from the SAME plan instead of a second
    *     fact scan; partial collect_set dedups map-side, so the extra
    *     shuffle weight is bounded by series cardinality per group.
    */
  final case class Options(
      dedup: Boolean = true,
      seriesIndex: Option[DataFrame] = None,
      approxPercentileAccuracy: Option[Int] = None,
      rollup1h: Option[DataFrame] = None,
      rollup1d: Option[DataFrame] = None,
      oooMarks: Option[DataFrame] = None,
      collectSeriesKeys: Boolean = false,
      // Exact pNN buffers every value of a downsample bucket
      // (collect_list): fine when the bucket spans minutes-to-hours of
      // one series, an executor-memory risk when it spans months —
      // `0all-p99` over a year of raw dps holds the year in one group.
      // Buckets whose TIME SPAN reaches this threshold (the `0all`
      // bucket spans the whole query range) route pNN to Spark's
      // mergeable percentile_approx sketch at `percentileSketchAccuracy`
      // instead. Default = never: exact is the reference-bit-for-bit
      // oracle semantics; deployments set e.g. 7 days.
      percentileSketchBucketMs: Long = Long.MaxValue,
      percentileSketchAccuracy: Int = 10000)

  /** Plan one sub-query against a dp DataFrame. */
  def planSub(
      dp: DataFrame,
      q: TsQuery,
      sub: SubQuery,
      opt: Options = Options()): DataFrame = {

    val dsOpt = sub.downsample.map(Downsample.parse).filter(_.func != "none")

    // ---- 1. scan range: stepped-up start, end expanded to cover the full
    // last bucket (down.h:76-82, query.cpp:1020-1030)
    val (scanStart, scanEnd) = dsOpt match {
      case Some(ds) if !ds.isAll =>
        val i = ds.intervalMs
        (ds.stepUp(q.startMs), q.endMs - math.floorMod(q.endMs, i) + i - 1)
      case _ => (q.startMs, q.endMs)
    }

    // ---- 2. predicate pushdown: time ∧ metric ∧ tag filters. With a
    // series index the tag predicates resolve on the dim table and the
    // fact scan semi-joins on skey; otherwise they evaluate per row.
    val timeAndMetric = dp
      .filter(col("ts").between(scanStart, scanEnd))
      .filter(col("metric") === sub.metric)
    // a source with a pre-materialized skey (e.g. the bucketed store,
    // Maintenance.writeBucketed) keeps its scan attribute — recomputing
    // the expression would hide the bucket partitioning from the
    // aggregates and reintroduce their shuffles
    def keyed(d: DataFrame): DataFrame =
      if (d.columns.contains("skey")) d
      else d.withColumn("skey", Dp.seriesKey(col("metric"), col("tags")))
    var df = opt.seriesIndex match {
      case Some(index) =>
        val matched = index
          .filter(col("metric") === sub.metric)
          .filter(TagFilters.compileAll(col("tags"), sub.tags, sub.explicitTags))
          .select(col("skey"))
        keyed(timeAndMetric)
          .join(broadcast(matched), Seq("skey"), "left_semi")
      case None =>
        keyed(timeAndMetric
          .filter(TagFilters.compileAll(col("tags"), sub.tags, sub.explicitTags)))
    }

    // ---- 3. last-wins dedup (seq = ingest order). max_by gets map-side
    // partial aggregation, so duplicates collapse before the shuffle.
    // The tags map is deliberately NOT carried through any aggregation —
    // skey encodes it canonically and Dp.tagsFromKey re-derives it at the
    // output edge; a MapType aggregate would force SortAggregate (maps
    // have no mutable hash buffer) and kill map-side combine.
    if (opt.dedup)
      df = df
        .groupBy(col("skey"), col("ts"))
        .agg(max_by(col("value"), col("seq")).as("value"))

    // ---- 4. per-series downsample
    dsOpt.foreach { ds =>
      val bucket =
        if (ds.isAll) lit(q.startMs)
        else col("ts") - pmod(col("ts"), lit(ds.intervalMs))
      // big-bucket pNN routes to the sketch (see Options doc): the
      // bucket's time span is the statically-plannable proxy for its
      // row count at any fixed ingest cadence
      val bucketSpanMs = if (ds.isAll) q.endMs - q.startMs else ds.intervalMs
      val dsAcc =
        if (bucketSpanMs >= opt.percentileSketchBucketMs)
          Some(opt.percentileSketchAccuracy)
        else None
      df = df
        .withColumn("bucket", bucket)
        .groupBy(col("skey"), col("bucket"))
        .agg(GraftFunctions.aggFor(ds.func, col("value"), col("ts"), dsAcc)
          .as("value"))
        .withColumnRenamed("bucket", "ts")

      // ---- 5. gap fill on the bucket spine [stepUp(start), lastBucket]
      // (fill_if_needed, down.cpp:280-311); filled points are real rows and
      // participate in the cross-series aggregation (query.cpp step 6→7).
      ds.fill match {
        case FillPolicy.None => ()
        case f if !ds.isAll =>
          val i = ds.intervalMs
          val spineStart = ds.stepUp(q.startMs)
          val lastBucket = q.endMs - math.floorMod(q.endMs, i)
          val spine = df
            .select("skey").distinct()
            .withColumn(
              "ts",
              explode(sequence(lit(spineStart), lit(lastBucket), lit(i))))
          val joined = spine
            .join(df.select("skey", "ts", "value"), Seq("skey", "ts"), "left")
          // zero/nan substitute a value; null leaves the gap row's NULL
          df = f.valueOrNull match {
            case Some(fv) => joined.withColumn("value", coalesce(col("value"), lit(fv)))
            case None => joined
          }
        case _ => ()
      }
    }

    // ---- 6. cross-series aggregation at each timestamp, grouped by the
    // queried grouping-tag values (aggregate.cpp:158-215; grouping rules
    // query.cpp:505-554)
    val groupCols =
      sub.groupByTags.map(k => Dp.tagFromKey(col("skey"), k).as(s"tag_$k"))
    val out = sub.aggregator match {
      case "none" =>
        df.select(col("skey"), Dp.tagsFromKey(col("skey")).as("tags"),
          col("ts"), col("value"))

      case TopBottom(dir, n) =>
        // rank whole series by max (top) / min (bottom) of each series'
        // last 3 dps; keep N series' rows unaggregated
        // (aggregate.cpp:236-260, include/query.h:265-279,
        // query.cpp:858-884). The reference's heap order is unstable on
        // ties; we tiebreak by skey for determinism.
        val recency = Window.partitionBy(col("skey")).orderBy(col("ts").desc)
        val last3 = df
          .withColumn("rn", row_number().over(recency))
          .filter(col("rn") <= 3)
        val score = last3
          .groupBy(col("skey"))
          .agg((if (dir == "top") max(col("value")) else min(col("value"))).as("score"))
        val keep = score
          .orderBy(if (dir == "top") col("score").desc else col("score").asc, col("skey"))
          .limit(n)
          .select("skey")
        df.join(broadcast(keep), Seq("skey"), "left_semi")
          .select(col("skey"), Dp.tagsFromKey(col("skey")).as("tags"),
            col("ts"), col("value"))

      case agg =>
        // order column is skey, not ts: rows in a cross-series group share
        // the timestamp, so first/last mean "first/last series" — the
        // reference walks series in creation order (aggregate.cpp:218-233);
        // we define canonical skey order for determinism.
        //
        // With a maintained series index (r17), first/last order by the
        // index's numeric skey RANK instead of the skey string: a
        // min_by/max_by whose ordering column is a string has an
        // immutable aggregation buffer, so Spark falls back from hash to
        // SortAggregate — a per-partition sort of the whole downsampled
        // frame with no cheap map-side combine. Ranked by a long, the
        // same aggregation is a map-side-combinable HashAggregate. The
        // rank table is dim-sized (cardinality = #series), derived by
        // one window over the broadcast index, and rank order == skey
        // order (row_number over the metric's skeys), so results are
        // identical; rows already passed the step-2 index semi-join with
        // the same metric filter, so the inner rank join drops nothing.
        val indexedRanks =
          if ((agg == "first" || agg == "last") && opt.seriesIndex.isDefined)
            Some(broadcast(opt.seriesIndex.get
              .filter(col("metric") === sub.metric)
              .select(col("skey")).distinct()
              .withColumn("srank_",
                row_number().over(Window.orderBy(col("skey"))).cast("long"))))
          else None
        val aggSrc = indexedRanks.map(r => df.join(r, Seq("skey")))
          .getOrElse(df)
        val ordCol = if (indexedRanks.isDefined) col("srank_") else col("skey")
        val valueAgg = GraftFunctions.aggFor(agg, col("value"), ordCol,
          opt.approxPercentileAccuracy).as("value")
        val grouped = aggSrc.groupBy(col("ts") +: groupCols: _*)
        if (opt.collectSeriesKeys) {
          // member rosters ride along as ONE extra row per result group
          // (ts = null), not an array on every timestamp row — the
          // collected response stays O(rows + cardinality) instead of
          // O(rows × members). The roster branch is a distinct over the
          // skey column alone (column pruning drops value/seq/ts from
          // its scan — verified in ApiSpec), so the extra pass is a
          // single-column read, not a second full fact scan.
          val values = grouped.agg(valueAgg)
            .withColumn("skeys_", lit(null).cast("array<string>"))
          val roster = df
            .groupBy(groupCols: _*)
            .agg(sort_array(collect_set(col("skey"))).as("skeys_"))
            .withColumn("ts", lit(null).cast("long"))
            .withColumn("value", lit(null).cast("double"))
          values.unionByName(roster.select(values.columns.map(col): _*))
        } else grouped.agg(valueAgg)
    }

    // ---- 7. rate conversion, applied after aggregation per result group
    // (query.cpp:470-491, rate.cpp:38-92). Roster rows (null ts) carry no
    // values and must not feed the per-group delta windows.
    if (sub.rate) {
      if (out.columns.contains("skeys_")) {
        val rated = rate(out.filter(col("ts").isNotNull), sub,
          groupKeysOf(out))
        rated.unionByName(out.filter(col("ts").isNull))
      } else rate(out, sub, groupKeysOf(out))
    } else out
  }

  /** Routed execution — the reference's `QuerySuperTask` lifecycle
    * (`src/core/query.cpp:1240-1305`) as one entry point: decide
    * raw vs rollup_1h vs rollup_1d ([[Rollup.route]]), snap the
    * downsample interval to the rollup grid ([[Rollup.snap]]), honor the
    * per-slice OOO invalidation marks (raw recompute for dirty slices),
    * then run the rest of the pipeline (cross-series agg, rate) on the
    * downsampled series exactly as the raw path would.
    *
    * `opt.rollup1h` is the materialized hourly table (required for
    * routing — absent, everything runs raw); `opt.rollup1d` the daily
    * one (derived from hourly when absent); `opt.oooMarks` the
    * maintained `(skey, day)` invalidation frame (None ⇒ derived here
    * over the query's full day span — a witness for an out-of-order
    * point can sit anywhere in its day slice, so the derivation must
    * not be clipped to the query window). Queries whose downsample has
    * no rollup form (dev, first, last, pNN), sub-hour intervals, and
    * `rollupUsage=Raw` all fall through to the raw path untouched.
    */
  def planRouted(
      dp: DataFrame,
      q: TsQuery,
      sub: SubQuery,
      opt: Options): DataFrame = {
    import graft.rollup.Rollup
    val dsOpt = sub.downsample.map(Downsample.parse).filter(_.func != "none")
    val routedLevel =
      if (opt.rollup1h.isEmpty) None else Rollup.route(dsOpt, sub.rollupUsage)
    routedLevel match {
      case None => planSub(dp, q, sub, opt)
      case Some(level) =>
        val ds = dsOpt.get
        val snapped = Rollup.snap(ds.intervalMs, level)
        val source =
          if (level == Rollup.DayMs)
            opt.rollup1d.getOrElse(Rollup.rollup1d(opt.rollup1h.get))
          else opt.rollup1h.get
        val scanEnd = q.endMs - math.floorMod(q.endMs, snapped) + snapped - 1

        // series selection, shared by the raw and rollup sides: with an
        // index, resolve matching skeys on the dim table once and
        // semi-join; otherwise per-row predicates (key-derived columns
        // on the rollup side, which carries skey only)
        val matched = opt.seriesIndex.map { index =>
          broadcast(index
            .filter(col("metric") === sub.metric)
            .filter(TagFilters.compileAll(col("tags"), sub.tags, sub.explicitTags))
            .select(col("skey")))
        }
        def selectSeries(d: DataFrame, keyDerived: Boolean): DataFrame =
          matched match {
            case Some(m) =>
              val keyed = if (d.columns.contains("skey")) d
                else d.withColumn("skey", Dp.seriesKey(col("metric"), col("tags")))
              keyed.join(m, Seq("skey"), "left_semi")
            case None =>
              val tags =
                if (keyDerived) Dp.tagsFromKey(col("skey")) else col("tags")
              val metricPred =
                if (keyDerived) Dp.metricFromKey(col("skey")) === sub.metric
                else col("metric") === sub.metric
              d.filter(metricPred)
                .filter(TagFilters.compileAll(tags, sub.tags, sub.explicitTags))
          }

        val raw = selectSeries(dp, keyDerived = false)
          .filter(col("ts").between(q.startMs, scanEnd))
        val rolled = selectSeries(source, keyDerived = true)
          .filter(col("wts").between(q.startMs, scanEnd))
        // marks derive over WHOLE day slices intersecting the range: an
        // OOO point's earlier-ingested witness may lie outside the query
        // window but inside the slice
        val marks = opt.oooMarks.getOrElse {
          val dayLo = q.startMs - math.floorMod(q.startMs, Rollup.DayMs)
          val dayHi = scanEnd - math.floorMod(scanEnd, Rollup.DayMs) +
            Rollup.DayMs - 1
          Rollup.oooSlices(
            selectSeries(dp, keyDerived = false)
              .filter(col("ts").between(dayLo, dayHi)))
        }
        val series = Rollup
          .downsampleWithFallback(raw, rolled, marks, snapped, ds.func)
        // hand the per-series buckets to the shared pipeline tail (fill,
        // cross-series aggregation, rate): an identity re-downsample at
        // the snapped interval — values sit exactly on the bucket grid,
        // so `last` is a no-op — carries the original fill policy through
        val fillSuffix = ds.fill match {
          case FillPolicy.NaN => "-nan"
          case FillPolicy.Null => "-null"
          case FillPolicy.Zero => "-zero"
          case FillPolicy.None => ""
        }
        // series selection already happened above — the tail must not
        // re-filter (explicitTags against the cleared tag map would
        // reject everything)
        val tail = sub.copy(
          downsample = Some(s"${snapped}ms-last$fillSuffix"),
          tags = Map.empty,
          explicitTags = false)
        planSub(
          series.withColumn("metric", lit(sub.metric))
            .withColumn("tags", Dp.tagsFromKey(col("skey")))
            .withColumn("seq", lit(0L)),
          q,
          tail,
          opt.copy(dedup = false, seriesIndex = None, rollup1h = None))
    }
  }

  private val TopBottomRe = """(top|bottom)([1-9])""".r
  private object TopBottom {
    def unapply(s: String): Option[(String, Int)] = s match {
      case TopBottomRe(d, n) => Some((d, n.toInt))
      case _ => None
    }
  }

  private def groupKeysOf(df: DataFrame): Seq[Column] =
    df.columns.filter(c => c == "skey" || c.startsWith("tag_")).map(col).toSeq

  /** `(v1-v0)/Δt_secs`, first point dropped, stamped at t1; counter wrap
    * `counterMax - v0 + v1`; `resetValue` → 0; `dropResets` removes the
    * wrapped sample but it still serves as the next base (exactly the
    * reference's loop: rate.cpp:47-92).
    */
  private def rate(df: DataFrame, sub: SubQuery, keys: Seq[Column]): DataFrame = {
    val ro = sub.rateOptions
    val w = Window.partitionBy(keys: _*).orderBy(col("ts"))
    // materialize the lags first — window expressions can't appear in filters
    val lagged = df
      .withColumn("v0_", lag(col("value"), 1).over(w))
      .withColumn("t0_", lag(col("ts"), 1).over(w))
    val v0 = col("v0_")
    val dtSecs = (col("ts") - col("t0_")).cast("double") / 1000.0
    val dv = col("value") - v0
    val wrapped = (lit(ro.counterMax).cast("double") - v0 + col("value")) / dtSecs
    val wrappedOrReset =
      if (ro.resetValue != 0L)
        when(wrapped > lit(ro.resetValue.toDouble), 0.0).otherwise(wrapped)
      else wrapped
    val rateCol =
      if (ro.counter) when(dv < 0, wrappedOrReset).otherwise(dv / dtSecs)
      else dv / dtSecs
    var out = lagged.withColumn("rate_", when(v0.isNotNull, rateCol))
    if (ro.counter && ro.dropResets)
      out = out.filter(v0.isNull || dv >= 0)
    out
      .filter(col("rate_").isNotNull)
      .withColumn("value", col("rate_"))
      .drop("rate_", "v0_", "t0_")
  }
}

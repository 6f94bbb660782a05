package graft.store

import graft.model.Dp
import graft.query.Planner
import graft.rollup.Rollup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The maintained store: raw data plus the three metadata tables the
  * reference keeps write-time state for, updated incrementally on every
  * ingest batch — queries never derive them from fact data.
  *
  *   - `series_index` (skey, metric, tags): the per-metric series
  *     registry (`g_metric_map` + `Mapping`, reference
  *     `src/core/tsdb.cpp:1586-1609`). Append-only: each batch anti-joins
  *     its distinct series against the index and appends only new ones.
  *   - `slice_state` (skey, day, hwm, ooo): per-(series, day-slice)
  *     high-water-mark and out-of-order flag. The reference marks OOO at
  *     WRITE time — a point at or before the slice's high water mark
  *     routes to the OOO page and sets `out_of_order2`
  *     (`src/core/ts.cpp:281-324`, `src/agg/rollup.cpp:214-243`) — so a
  *     routed query reads the marks, never re-derives them by sorting
  *     raw data. Within a batch, order is the batch's `seq`; across
  *     batches, the stored hwm carries the comparison.
  *   - `rollup_1h` (skey, wts, cnt, min, max, sum): the write-time hourly
  *     accumulator (`src/agg/rollup.cpp:180-286`), merged per batch.
  *     Duplicate/OOO points make a slice's rollup wrong by construction —
  *     exactly the slices `slice_state` marks, which
  *     [[Rollup.downsampleWithFallback]] recomputes from raw.
  *
  * Both `slice_state` and `rollup_1h` are day-partitioned on disk and a
  * batch rewrites ONLY the day partitions it touches (tmp-write + swap,
  * like [[Maintenance.compactPartition]]) — at 100 TB an ingest batch
  * spanning a few days moves a few days of tiny metadata, not history.
  *
  * Contract: batches arrive with `seq` monotonically increasing across
  * batches (what [[graft.ingest.Ingest]] produces — batch-stamped under
  * streaming), because query-time last-wins dedup on the DATA still
  * resolves by seq.
  */
final class Store(spark: SparkSession, root: String) {

  private val dataPath = s"$root/data"
  private val indexPath = s"$root/series_index"
  private val statePath = s"$root/slice_state"
  private val rollupPath = s"$root/rollup_1h"

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(p: String) = fs.exists(new Path(p))

  private val stateSchema = StructType(Seq(
    StructField("skey", StringType), StructField("hwm", LongType),
    StructField("ooo", BooleanType), StructField("day", LongType)))
  private val indexSchema = StructType(Seq(
    StructField("skey", StringType), StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType))))
  private val rollupSchema = StructType(Seq(
    StructField("skey", StringType), StructField("cnt", LongType),
    StructField("min", DoubleType), StructField("max", DoubleType),
    StructField("sum", DoubleType), StructField("wts", LongType)))

  private def readOr(path: String, schema: StructType): DataFrame =
    if (exists(path)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Raw data as the canonical dp frame. */
  def data: DataFrame =
    spark.read.parquet(dataPath).select(Dp.columns.map(col): _*)

  def seriesIndex: DataFrame = readOr(indexPath, indexSchema)

  /** The maintained `(skey, day)` invalidation frame — what
    * [[Planner.Options.oooMarks]] wants.
    */
  def oooMarks: DataFrame =
    readOr(statePath, stateSchema).filter(col("ooo")).select("skey", "day")

  def rollup1h: DataFrame =
    readOr(rollupPath, rollupSchema).select("skey", "wts", "cnt", "min", "max", "sum")

  /** Default planner options over this store: index scans, maintained OOO
    * marks, and rollup routing — the configuration every query should run
    * with (what the reference's QuerySuperTask always has).
    */
  def plannerOptions(): Planner.Options =
    Planner.Options(
      seriesIndex = Some(seriesIndex),
      oooMarks = Some(oooMarks),
      rollup1h = Some(rollup1h))

  /** Ingest one batch: append the data, then update the three metadata
    * tables incrementally.
    */
  def ingest(batch: DataFrame): Unit = {
    val keyed = Dp.withSeriesKey(batch.select(Dp.columns.map(col): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // shuffle-free append (unlike Ingest.writePartitioned's
      // repartition-by-date): ingest batches are micro-batch sized, so
      // densifying per write would pay a shuffle per batch for nothing —
      // Maintenance.compactPartition rewrites partitions densely later,
      // exactly the reference's compaction split of responsibilities
      keyed.select(Dp.columns.map(col): _*)
        .withColumn("date", to_date(timestamp_millis(col("ts"))))
        .write.mode(SaveMode.Append).partitionBy("date").parquet(dataPath)
      updateSeriesIndex(keyed)
      val days = updateSliceState(keyed)
      updateRollup(keyed, days)
    } finally keyed.unpersist()
  }

  /** Append series not yet in the index (no rewrite of existing rows).
    * The distinct runs on the skey STRING and metric/tags re-derive from
    * it afterwards — `first(tags)` would force a SortAggregate on every
    * ingest batch (maps have no hash buffer). Meta.seriesTable's
    * constraint-propagation caveat doesn't apply here: the index is
    * materialized to parquet, so readers see real columns.
    */
  private def updateSeriesIndex(keyed: DataFrame): Unit = {
    val batchSeries = keyed
      .select(col("skey")).distinct()
      .select(col("skey"),
        Dp.metricFromKey(col("skey")).as("metric"),
        Dp.tagsFromKey(col("skey")).as("tags"))
    val newOnly =
      if (!exists(indexPath)) batchSeries
      else batchSeries.join(
        spark.read.schema(indexSchema).parquet(indexPath).select("skey"),
        Seq("skey"), "left_anti")
    newOnly.write.mode(SaveMode.Append).parquet(indexPath)
  }

  /** Merge the batch into `slice_state` and return the touched days.
    * Within-batch OOO is detected with a window over the BATCH's rows
    * (bounded by batch size — the reference's in-memory page state);
    * cross-batch OOO compares the batch's min ts against the stored hwm.
    */
  private def updateSliceState(keyed: DataFrame): Seq[Long] = {
    val w = Window.partitionBy(col("skey"), col("day")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val slices = keyed
      .withColumn("day", col("ts") - pmod(col("ts"), lit(Rollup.DayMs)))
      .withColumn("prior", max(col("ts")).over(w))
      .withColumn("bad",
        (col("prior").isNotNull && col("ts") <= col("prior")) ||
          isnan(col("value")) ||
          col("value") === Double.PositiveInfinity ||
          col("value") === Double.NegativeInfinity)
      .groupBy(col("skey"), col("day"))
      .agg(
        min(col("ts")).as("bmin"),
        max(col("ts")).as("bmax"),
        max(col("bad")).as("booo"))
      // consumed twice (day list + merge join); one row per touched
      // slice, so the cache is tiny but saves a second window pass
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = slices.select("day").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    if (days.isEmpty) { slices.unpersist(); return Nil }
    val prev = readOr(statePath, stateSchema).filter(col("day").isin(days: _*))
    val merged = prev.as("p")
      .join(slices.as("b"), Seq("skey", "day"), "full_outer")
      .select(
        col("skey"),
        greatest(col("p.hwm"), col("b.bmax")).as("hwm"),
        (coalesce(col("p.ooo"), lit(false)) ||
          coalesce(col("b.booo"), lit(false)) ||
          coalesce(col("b.bmin") <= col("p.hwm"), lit(false))).as("ooo"),
        col("day"))
    swapDays(statePath, merged, days)
    slices.unpersist()
    days
  }

  /** Merge the batch's hourly rollup into the touched days' partitions. */
  private def updateRollup(keyed: DataFrame, days: Seq[Long]): Unit = {
    if (days.isEmpty) return
    val batchRollup = Rollup.rollup1hKeyed(keyed)
      .withColumn("day", col("wts") - pmod(col("wts"), lit(Rollup.DayMs)))
    val prev = readOr(rollupPath,
      StructType(rollupSchema.fields :+ StructField("day", LongType)))
      .filter(col("day").isin(days: _*))
    val merged = prev.unionByName(batchRollup)
      .groupBy(col("skey"), col("wts"), col("day"))
      .agg(
        sum(col("cnt")).as("cnt"),
        min(col("min")).as("min"),
        max(col("max")).as("max"),
        sum(col("sum")).as("sum"))
      .select("skey", "cnt", "min", "max", "sum", "wts", "day")
    swapDays(rollupPath, merged, days)
  }

  /** Write `df` (carrying a `day` column) day-partitioned into a temp
    * dir, then swap only the touched day partitions into the live table —
    * readers never see a half-written partition, and untouched history is
    * never rewritten.
    */
  private def swapDays(live: String, df: DataFrame, days: Seq[Long]): Unit = {
    val tmp = s"$live.tmp_${System.nanoTime()}"
    df.repartition(col("day"))
      .write.mode(SaveMode.Overwrite).partitionBy("day").parquet(tmp)
    fs.mkdirs(new Path(live))
    days.foreach { d =>
      val livePart = new Path(s"$live/day=$d")
      val tmpPart = new Path(s"$tmp/day=$d")
      if (fs.exists(livePart)) fs.delete(livePart, true)
      if (fs.exists(tmpPart)) fs.rename(tmpPart, livePart)
    }
    fs.delete(new Path(tmp), true)
  }
}

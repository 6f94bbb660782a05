package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Background/maintenance dataflow over the date-partitioned Parquet
  * store (SURVEY.md §2.10) — the Spark equivalents of the reference's
  * compaction, rotation/archival, and retention purge
  * (`src/core/tsdb.cpp` `Tsdb::compact`, `include/tsdb.h:48-77,232`).
  *
  * Storage layout: `root/date=YYYY-MM-DD/part-….parquet` as written by
  * [[graft.streaming.StreamIngest.writeRaw]]. Rotation (read-write →
  * read-only → archived) is free under immutable files; what remains
  * operational is rewriting small streamed files densely and dropping
  * expired partitions.
  */
object Maintenance {

  /** List partition date strings under the store root. */
  def partitions(spark: SparkSession, root: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(root)
    if (!fs.exists(p)) Nil
    else
      fs.listStatus(p).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith("date="))
        .map(_.stripPrefix("date="))
        .sorted
  }

  /** Compact one date partition: rewrite its many small streamed files as
    * `numFiles` densely-packed, ts-sorted files (the reference's compact:
    * full scan → dense rewrite, tsdb.cpp ~3500-3650). Sorting by (metric,
    * ts) maximizes parquet row-group min/max pruning for later queries.
    * Writes to a temp dir first, then swaps by rename-aside → rename-in →
    * delete-aside — the visibility window is two metadata-only renames,
    * so a concurrent reader sees the old files or the new, never a
    * half-deleted partition.
    */
  def compactPartition(spark: SparkSession, root: String, date: String,
      numFiles: Int = 1): Unit = {
    val dir = s"$root/date=$date"
    val tmp = s"$root/.compact_tmp_date=$date"
    val fs0 = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs0.exists(new Path(dir))) return // nothing to compact
    spark.read.parquet(dir)
      .repartition(numFiles)
      .sortWithinPartitions("metric", "ts")
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new Path(s"$root/.retired_${System.nanoTime()}_date_$date")
    fs.rename(new Path(dir), aside)
    fs.rename(new Path(tmp), new Path(dir))
    fs.delete(aside, true)
  }

  /** Retention purge: drop partitions strictly older than `cutoffDate`
    * (yyyy-MM-dd) — `purge_oldest` / `tsdb.retention.threshold`
    * (`include/tsdb.h:232`, config.h:131). Returns the dropped dates.
    */
  def purgeOlderThan(spark: SparkSession, root: String, cutoffDate: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victims = partitions(spark, root).filter(_ < cutoffDate)
    victims.foreach(d => fs.delete(new Path(s"$root/date=$d"), true))
    victims
  }

  /** Write the dp frame as a table bucketed by the series key — the
    * co-located layout for the heavy query path. Grouping on (skey, …)
    * is then satisfied by the scan's bucket partitioning, so last-wins
    * dedup and per-series downsampling run with ZERO exchanges; only the
    * cross-series stage (different keys) shuffles. This is the Spark
    * analog of the reference's per-series page chains: all of one
    * series' data is co-resident (`include/tsdb.h:176-216` buckets
    * metric-ids the same way, `metric bucket` SURVEY §1.1). `sortBy ts`
    * additionally gives parquet row-group min/max pruning on time.
    */
  def writeBucketed(dp: org.apache.spark.sql.DataFrame, tableName: String,
      buckets: Int = 64): Unit =
    graft.model.Dp.withSeriesKey(dp)
      .write
      .bucketBy(buckets, "skey")
      .sortBy("skey", "ts")
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(tableName)

  /** Store-wide stats for the admin `stat` command: per-partition file
    * and byte counts.
    */
  def stats(spark: SparkSession, root: String): Seq[(String, Long, Long)] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    partitions(spark, root).map { d =>
      val files = fs.listStatus(new Path(s"$root/date=$d"))
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      (d, files.length.toLong, files.map(_.getLen).sum)
    }
  }
}

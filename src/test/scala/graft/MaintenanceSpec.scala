package graft

import java.nio.file.Files

import graft.api.Admin
import graft.model.Dp
import graft.rollup.Rollup
import graft.store.Maintenance
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000L

  private def writeStore(root: String): Unit = {
    val dp = spark.createDataset((0 until 100).map { i =>
      Dp("m", Map("host" -> s"h${i % 3}"), (i % 4) * Day + i * 1000L, i.toDouble, i)
    }).toDF()
      .withColumn("date", to_date(timestamp_millis(col("ts"))))
    // many small files per partition, like a streaming sink would leave
    dp.repartition(8).write.partitionBy("date").parquet(root)
  }

  test("compaction rewrites a partition densely, preserving rows") {
    val root = Files.createTempDirectory("graft_store").toString + "/store"
    writeStore(root)
    val before = spark.read.parquet(root).filter(col("date") === "1970-01-01")
      .orderBy("seq").collect()
    assert(Maintenance.stats(spark, root).head._2 > 1) // small files
    Maintenance.compactPartition(spark, root, "1970-01-01")
    val stats = Maintenance.stats(spark, root)
    assert(stats.head._1 === "1970-01-01" && stats.head._2 === 1) // one file
    val after = spark.read.parquet(root).filter(col("date") === "1970-01-01")
      .orderBy("seq").collect()
    assert(after.toSeq === before.toSeq)
  }

  test("retention purge drops partitions older than cutoff") {
    val root = Files.createTempDirectory("graft_store").toString + "/store"
    writeStore(root)
    assert(Maintenance.partitions(spark, root).size === 4)
    val dropped = Maintenance.purgeOlderThan(spark, root, "1970-01-03")
    assert(dropped === Seq("1970-01-01", "1970-01-02"))
    assert(Maintenance.partitions(spark, root) === Seq("1970-01-03", "1970-01-04"))
    assert(spark.read.parquet(root).select("date").distinct().count() === 2)
  }

  test("admin dispatcher: ping/stat/compact/purge/unknown") {
    val base = Files.createTempDirectory("graft_store").toString
    writeStore(s"$base/data") // legacy (pre-manifest) layout
    val st = new graft.store.Store(spark, base)
    assert(Admin.execute(spark, Map("cmd" -> "ping")) === Right("pong"))
    assert(Admin.execute(spark, Map.empty) === Left("cmd missing"))
    assert(Admin.execute(spark, Map("cmd" -> "nope")).isLeft)
    assert(Admin.execute(spark, Map("cmd" -> "stat")).isLeft) // no store
    val stat = Admin.execute(spark, Map("cmd" -> "stat"), Some(st))
    assert(stat.exists(_.contains("1970-01-01")))
    assert(Admin.execute(spark,
      Map("cmd" -> "compact", "date" -> "1970-01-02"), Some(st))
      .exists(_.contains("1")))
    assert(Admin.execute(spark,
      Map("cmd" -> "purge", "cutoff" -> "1970-01-02"), Some(st))
      === Right("purged 1"))
  }

  test("bucketed store: per-series dedup+downsample plan has no exchange") {
    import graft.model.{SubQuery, TsQuery}
    import graft.query.Planner
    import graft.store.Maintenance
    val dp = spark.createDataset((0 until 200).map { i =>
      Dp("m", Map("host" -> s"h${i % 5}"), i * 60000L, i.toDouble, i)
    }).toDF()
    Maintenance.writeBucketed(dp, "dp_bucketed", buckets = 4)
    try {
      // skey pre-materialized by the writer → planner reuses the scan
      // attribute and the bucket partitioning feeds the aggregates
      val stored = spark.table("dp_bucketed")
      val plan = Planner.planSub(
        stored,
        TsQuery(0, 200 * 60000L),
        SubQuery("m", "none", Some("1h-avg")))
      val physical = plan.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"expected shuffle-free per-series plan, got:\n$physical")
      // and it still answers correctly
      assert(plan.count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS dp_bucketed")
  }

  test("ooo slice detection marks late, duplicate, and NaN points only") {
    val dp = spark.createDataset(Seq(
      // clean series: strictly increasing ts
      Dp("m", Map("host" -> "a"), 1000L, 1.0, 0),
      Dp("m", Map("host" -> "a"), 2000L, 2.0, 1),
      // late arrival on day 0 for host b
      Dp("m", Map("host" -> "b"), 5000L, 1.0, 2),
      Dp("m", Map("host" -> "b"), 3000L, 9.0, 3),
      // NaN marks host c
      Dp("m", Map("host" -> "c"), 1000L, Double.NaN, 4),
      // host d clean on day 0, late on day 1
      Dp("m", Map("host" -> "d"), 1000L, 1.0, 5),
      Dp("m", Map("host" -> "d"), Day + 2000L, 1.0, 6),
      Dp("m", Map("host" -> "d"), Day + 1000L, 2.0, 7))).toDF()
    val marks = Rollup.oooSlices(dp)
      .select(concat_ws("@", col("skey"), col("day")))
      .as[String].collect().toSet
    assert(marks === Set(s"m,host=b@0", s"m,host=c@0", s"m,host=d@$Day"))
  }
}

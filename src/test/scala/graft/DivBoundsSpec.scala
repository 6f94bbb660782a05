package graft

import java.nio.file.Files

import graft.plans.GraftOptimizations
import org.apache.spark.sql.functions._

class DivBoundsSpec extends SparkSpec {
  import spark.implicits._

  test("inferred raw bounds reach parquet PushedFilters") {
    GraftOptimizations.install(spark)
    val dir = Files.createTempDirectory("divb").toString + "/t"
    (0L to 5000000000L by 7000000L).toDF("ns").write.parquet(dir)
    val q = spark.read.parquet(dir)
      .select(expr("ns div 1000000").as("ms"))
      .filter(col("ms").between(1200L, 3400L))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ns,1200000000)"))
    assert(scan.contains("LessThanOrEqual(ns,3400999999)"))
  }

  test("epoch-ms bounds over a TIMESTAMP_NTZ scan push as timestamp literals") {
    GraftOptimizations.install(spark)
    val dir = Files.createTempDirectory("divb_ntz").toString + "/t"
    // one row per second across ~2h of 2024-01-01, written as parquet
    // TIMESTAMP (not UTC-adjusted) — the driver's events.ts shape
    spark.range(0, 7200)
      .select(expr("timestampadd(SECOND, CAST(id AS INT), TIMESTAMP_NTZ'2024-01-01 00:00:00')").as("ts"))
      .write.parquet(dir)
    val base = 1704067200000L // 2024-01-01T00:00:00Z epoch ms
    val q = spark.read.parquet(dir)
      .select(unix_millis(col("ts").cast("timestamp")).as("ms"))
      .filter(col("ms") >= base + 600000L && col("ms") <= base + 1200000L)
    val scan = q.queryExecution.executedPlan.toString
    // the inferred conjuncts are plain ts-vs-literal comparisons that
    // reach the parquet scan's PushedFilters (row-group pruning at scale)
    assert(scan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"no pushed ts lower bound in:\n$scan")
    assert(scan.contains("LessThanOrEqual(ts,"), s"no pushed ts upper bound in:\n$scan")
    assert(q.count() === 601) // inclusive ms range, 1 Hz rows
  }

  test("rule preserves exact truncation semantics at bucket edges") {
    GraftOptimizations.install(spark)
    // values straddling every edge of (x div 10) between 2 and 4:
    // 19 → 1 (out), 20 → 2 (in), 49 → 4 (in), 50 → 5 (out)
    val df = Seq(19L, 20L, 21L, 29L, 30L, 49L, 50L, 51L).toDF("x")
      .select(col("x"), expr("x div 10").as("d"))
    def got(lo: Long, hi: Long): Seq[Long] =
      df.filter(col("d") >= lo && col("d") <= hi)
        .select("x").as[Long].collect().sorted.toSeq
    assert(got(2, 4) === Seq(20L, 21L, 29L, 30L, 49L))
    assert(got(3, 3) === Seq(30L))
    val strict = df.filter(col("d") > 2 && col("d") < 5)
      .select("x").as[Long].collect().sorted.toSeq
    assert(strict === Seq(30L, 49L))
  }
}

package graft

import graft.model.{DpView, RateOptions, SubQuery, TsQuery}
import graft.query.Planner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2, all running against the
  * driver-provided tables (TESTDATA.md). The TSDB-shaped queries run on the
  * dp view over `events` (see [[graft.model.DpView.dp]]).
  */
object SparkEntry {

  // Fixed, deterministic query window inside the events data range
  // (2024-01-01 .. 2024-01-30 UTC).
  private val T0 = 1704412800000L // 2024-01-05 00:00:00 UTC
  private val T1 = 1705017600000L // 2024-01-12 00:00:00 UTC
  private val HOUR = 3600000L

  /** DuckDB CTE reconstructing the dp view + canonical series key from
    * `events` — the oracle-side twin of [[graft.model.DpView.dp]] and
    * [[graft.model.Dp.seriesKey]] (tag keys sorted: dc < host < od).
    */
  private val dpCte: String =
    """WITH dp AS (
      |  SELECT event_type AS metric,
      |         'host' || CAST(user_id % 5 AS VARCHAR) AS host,
      |         'dc'   || CAST(user_id % 2 AS VARCHAR) AS dc,
      |         (user_id % 3 = 0) AS has_od,
      |         event_type || ',dc=dc' || CAST(user_id % 2 AS VARCHAR)
      |           || ',host=host' || CAST(user_id % 5 AS VARCHAR)
      |           || CASE WHEN user_id % 3 = 0 THEN ',od=od0' ELSE '' END AS skey,
      |         epoch_ms(ts) AS ts,
      |         value,
      |         event_id AS seq
      |  FROM events)""".stripMargin

  /** Scan-range end expansion for a downsampled query (see
    * Planner: end - end%i + i - 1).
    */
  private def scanEnd(endMs: Long, intervalMs: Long): Long =
    endMs - math.floorMod(endMs, intervalMs) + intervalMs - 1

  def entry(spark: SparkSession): DataFrame = {
    val dp = DpView.dp(spark, "/root/testdata/sf0.001")
    Planner.planSub(
      dp,
      TsQuery(T0, T1),
      SubQuery(
        metric = "click",
        aggregator = "sum",
        downsample = Some("1h-avg"),
        tags = Map("host" -> "*"),
        groupByTags = Seq("host")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 scan + §2.4 filters + §2.7 last-wins dedup
    "q_scan_range" -> { (s, dir) =>
      val df = Planner.planSub(
        DpView.dp(s, dir),
        TsQuery(T0, T1),
        SubQuery(
          metric = "click",
          aggregator = "none",
          tags = Map("host" -> "literal_or(host1|host3)")))
      df.select(col("skey"), col("ts"), col("value"))
        .orderBy("skey", "ts", "value")
    },

    // §2.5 downsample 1h-avg per series (aggregator none keeps series apart)
    "q_ds_avg" -> { (s, dir) =>
      val df = Planner.planSub(
        DpView.dp(s, dir),
        TsQuery(T0, T1),
        SubQuery(metric = "view", aggregator = "none", downsample = Some("1h-avg")))
      df.select(col("skey"), expr("ts div 1000").as("ts"),
          round(col("value"), 4).as("value"))
        .orderBy("skey", "ts")
    },

    // §2.6 cross-series sum grouped by host tag, after 1h-avg downsample —
    // the full OpenTSDB pipeline m=sum:1h-avg:click{host=*}
    "q_agg_sum" -> { (s, dir) =>
      val df = Planner.planSub(
        DpView.dp(s, dir),
        TsQuery(T0, T1),
        SubQuery(
          metric = "click",
          aggregator = "sum",
          downsample = Some("1h-avg"),
          tags = Map("host" -> "*"),
          groupByTags = Seq("host")))
      df.select(col("tag_host"), expr("ts div 1000").as("ts"),
          round(col("value"), 4).as("value"))
        .orderBy("tag_host", "ts")
    })

  // NB: never interpolate the (already-stripped, multi-line) dpCte inside a
  // `stripMargin` template — its `||` continuation lines would be re-stripped.
  def oracleSql: Map[String, String] = Map(
    "q_scan_range" -> (dpCte + "\n" +
      s"""SELECT skey, ts, arg_max(value, seq) AS value
         |FROM dp
         |WHERE metric = 'click' AND host IN ('host1','host3')
         |  AND ts BETWEEN $T0 AND $T1
         |GROUP BY skey, ts
         |ORDER BY skey, ts, value""".stripMargin),

    "q_ds_avg" -> (dpCte + ",\n" +
      s"""dedup AS (
         |  SELECT skey, ts, arg_max(value, seq) AS value
         |  FROM dp
         |  WHERE metric = 'view' AND ts BETWEEN $T0 AND ${scanEnd(T1, HOUR)}
         |  GROUP BY skey, ts)
         |SELECT skey, (ts - ts % $HOUR) // 1000 AS ts,
         |       round(avg(value), 4) AS value
         |FROM dedup
         |GROUP BY skey, ts - ts % $HOUR
         |ORDER BY skey, ts""".stripMargin),

    "q_agg_sum" -> (dpCte + ",\n" +
      s"""dedup AS (
         |  SELECT skey, host, ts, arg_max(value, seq) AS value
         |  FROM dp
         |  WHERE metric = 'click' AND host IS NOT NULL
         |    AND ts BETWEEN $T0 AND ${scanEnd(T1, HOUR)}
         |  GROUP BY skey, host, ts),
         |ds AS (
         |  SELECT skey, host, ts - ts % $HOUR AS b, avg(value) AS value
         |  FROM dedup GROUP BY skey, host, ts - ts % $HOUR)
         |SELECT host AS tag_host, b // 1000 AS ts,
         |       round(sum(value), 4) AS value
         |FROM ds
         |GROUP BY host, b
         |ORDER BY tag_host, ts""".stripMargin))
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.DpView
import graft.query.Planner
import graft.model.{SubQuery, TsQuery}

/** Throwaway phase-timing diagnostic for the q_store_ingest gate. */
object TimeStore {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // mimic the gate twice (cold + warm)
    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val T0 = SparkEntryTimes.T0; val T1 = SparkEntryTimes.T1
      val d = DpView.dp(spark, dir)
        .filter(col("metric") === "error" &&
          col("ts").between(T0, T1 + 6 * 3600 * 1000L - 1))
      t("materialize batch")(d.count())
      val rootPath = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_ts_diag")
      val st = t("new Store")(new graft.store.Store(spark, rootPath.toString))
      t("ingest")(st.ingest(d))
      val q = t("plan")(Planner.planSub(st.data, TsQuery(T0, T1),
        SubQuery(metric = "error", aggregator = "none")))
      t("query collect")(q.count())
    }
    spark.stop()
  }
}

object SparkEntryTimes {
  // same window constants as SparkEntry's gates
  val T0 = 1704412800000L
  val T1 = 1705017600000L
}

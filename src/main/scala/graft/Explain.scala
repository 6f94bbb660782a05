package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for selected
  * SparkEntry queries (args = name substrings; no args = flagship set).
  * Used to check the physical plan is the one we'd want at 100 TB:
  * PushedFilters reaching the parquet scan, broadcast joins on small
  * sides, partial (map-side) aggregation, whole-stage codegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val defaults = Seq("q_scan_range", "q_ds_avg", "q_agg_sum", "q_rate",
      "q_rollup_route", "pl_dedup_minhash", "pl_dedup_incr", "pl_knn_ivf",
      "pl_chunk")
    val picked = if (args.isEmpty) defaults else args.toSeq
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => picked.exists(n.contains) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}

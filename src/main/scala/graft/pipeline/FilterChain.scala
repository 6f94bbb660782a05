package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite keep/drop filter for pre-training corpora — the C4/Gopher
  * style pipeline stage that tags every document with a verdict and the
  * FIRST failing rule as a machine-readable reason (so drop-rate
  * dashboards and rule ablations are one groupBy away).
  *
  * Rule order (first hit wins): exact-duplicate → language → length
  * bounds → repetition (dup-token fraction, same-token runs) → quality
  * floor. Everything except the duplicate rule is a pure per-row Column
  * expression (codegen'd, shuffle-free); the duplicate rule is one
  * window over `md5(text)` — a single hash-partitioned exchange, the
  * same shape as exact dedup.
  */
object FilterChain {

  /** Tag `docs` with `keep` (boolean) and `reason` (string). Thresholds
    * default to this corpus's calibration; production pipelines tune
    * them per source.
    */
  def c4Filter(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      lang: String = "en",
      minTokens: Int = 15, maxTokens: Int = 95,
      maxDupTokenFrac: Double = 0.65, maxRun: Int = 2,
      minQuality: Double = 0.31): DataFrame = {
    val t = col(textCol)
    val w = col("w_")
    // keeper of an exact-duplicate group = smallest id (Dedup.exact's rule)
    val keepId = min(col(idCol)).over(Window.partitionBy(md5(t)))
    val ntok = size(w)
    // tokens split once per row (TextAnalysis codegen note), then every
    // rule reads the projected array
    val reason =
      when(col(idCol) =!= keepId, "duplicate")
        .when(TextAnalysis.langIdOf(w) =!= lang, "lang")
        .when(ntok < minTokens, "too_short")
        .when(ntok > maxTokens, "too_long")
        .when(TextAnalysis.dupTokenFracOf(w) > maxDupTokenFrac, "repetitive_tokens")
        .when(TextAnalysis.maxTokenRunOf(w) > maxRun, "repetitive_run")
        .when(TextAnalysis.qualityScoreOf(t, w) < minQuality, "low_quality")
        .otherwise("ok")
    TextAnalysis.withTokens(docs, textCol)
      .withColumn("reason", reason)
      .withColumn("keep", col("reason") === "ok")
      .drop("w_")
  }
}

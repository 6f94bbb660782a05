package graft.model

/** Query IR — the Spark-side equivalent of the reference's `Query` object
  * (`src/core/query.cpp:54-170`): the parsed form of a `POST /api/query`
  * body or a 1.x `m=` expression.
  */
final case class TsQuery(
    startMs: Long,
    endMs: Long,
    msResolution: Boolean = false,
    subQueries: Seq[SubQuery] = Nil)

/** One sub-query: `m=<agg>:[rate[{...}]:][<downsample>:][explicit_tags:]
  * <metric>{grouping}{non-grouping}` (grammar: reference
  * `src/core/query.cpp:172-174`).
  *
  * `tags` values are raw OpenTSDB filter strings (`*`, `literal_or(...)`,
  * `wildcard(...)`, `regexp(...)`, ...) compiled by [[graft.query.TagFilters]].
  * `groupByTags` lists the tag keys whose values split result groups (the
  * first `{...}` block); keys only in the second block filter but don't
  * split (reference `query.cpp:365-385`).
  */
final case class SubQuery(
    metric: String,
    aggregator: String,
    downsample: Option[String] = None,
    rate: Boolean = false,
    rateOptions: RateOptions = RateOptions(),
    tags: Map[String, String] = Map.empty,
    groupByTags: Seq[String] = Nil,
    explicitTags: Boolean = false,
    rollupUsage: RollupUsage = RollupUsage.FallbackRaw)

/** `rate{counter,countermax,resetvalue[,dropresets]}` — reference
  * `src/agg/rate.cpp:30-36`.
  */
final case class RateOptions(
    counter: Boolean = false,
    dropResets: Boolean = false,
    counterMax: Long = Long.MaxValue,
    resetValue: Long = 0L)

/** Rollup routing override — reference `include/query.h:47-52`. */
sealed trait RollupUsage
object RollupUsage {
  /** Never consult rollups; always raw. */
  case object Raw extends RollupUsage
  /** Default: use rollups when eligible, falling back to raw per series. */
  case object FallbackRaw extends RollupUsage
}

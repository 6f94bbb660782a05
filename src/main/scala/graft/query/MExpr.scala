package graft.query

import graft.model.{RateOptions, RollupUsage, SubQuery, TsQuery}

/** Parser for the OpenTSDB 1.x-style `GET /api/query` surface:
  *
  *   `m=<agg>:[rate[{counter[,max[,reset]]}]:][<downsample>:]
  *    [explicit_tags:][rollupUsage=...:]<metric>[{grouping}][{non-grouping}]`
  *
  * Faithful to the reference's tokenizer (`src/core/query.cpp:172-388`):
  * colon-split, first token is the aggregator, last is
  * `metric{tags}{tags}`, everything between is recognized by prefix. The
  * first `{...}` block both filters and GROUPS result sets by its keys;
  * the second block filters only (`query.cpp:365-385`).
  */
object MExpr {

  def parse(expr: String): SubQuery = {
    val tokens = expr.split(":", -1).toSeq
    require(tokens.size >= 2, s"bad m= expression: $expr")

    var rate = false
    var ro = RateOptions()
    var ds: Option[String] = None
    var explicitTags = false
    var rollup: RollupUsage = RollupUsage.FallbackRaw

    tokens.slice(1, tokens.size - 1).foreach { tok =>
      if (tok.startsWith("rate{")) {
        rate = true
        val opts = tok.drop(5).stripSuffix("}").split(",", -1).toSeq
        val counter = opts.headOption
          .exists(o => o.nonEmpty && (o.head == 't' || o.head == 'T'))
        val cmax = opts.lift(1).filter(_.nonEmpty).map(_.toLong)
          .getOrElse(Long.MaxValue)
        val rv = opts.lift(2).filter(_.nonEmpty).map(_.toLong).getOrElse(0L)
        // The reference reads dropResets from opts[2] — the resetValue
        // slot (query.cpp:280-283); a numeric resetValue never starts
        // with 't', so the m= form cannot actually enable it. Replicated.
        val dr = opts.size > 3 &&
          opts.lift(2).exists(o => o.nonEmpty && (o.head == 't' || o.head == 'T'))
        ro = RateOptions(counter, dr, cmax, rv)
      } else if (tok == "rate") {
        rate = true
      } else if (tok.startsWith("percentiles[")) {
        // reference logs "not supported" and ignores (query.cpp:297-300)
      } else if (tok == "explicit_tags") {
        explicitTags = true
      } else if (tok.startsWith("rollupUsage=")) {
        rollup = tok.drop("rollupUsage=".length) match {
          case "ROLLUP_RAW" => RollupUsage.Raw
          case _ => RollupUsage.FallbackRaw // incl. unrecognized, like ref
        }
      } else {
        ds = Some(tok)
      }
    }

    val metricTok = tokens.last
    val brace = metricTok.indexOf('{')
    val metric = if (brace < 0) metricTok else metricTok.substring(0, brace)
    val blocks = parseTagBlocks(if (brace < 0) "" else metricTok.substring(brace))
    val grouping = blocks.headOption.getOrElse(Map.empty)
    val nonGrouping = blocks.lift(1).getOrElse(Map.empty)

    SubQuery(
      metric = metric,
      aggregator = tokens.head,
      downsample = ds,
      rate = rate,
      rateOptions = ro,
      tags = grouping ++ nonGrouping,
      groupByTags = grouping.keys.toSeq.sorted,
      explicitTags = explicitTags,
      rollupUsage = rollup)
  }

  /** `{k1=v1,k2=v2}{k3=v3}` → maps, in order. Unquoted form only (the
    * reference's parse_map_unquoted path — tag names/values never need
    * quoting in practice).
    */
  private def parseTagBlocks(s: String): Seq[Map[String, String]] = {
    val Block = """\{([^}]*)\}""".r
    Block.findAllMatchIn(s).map { m =>
      m.group(1).split(",").filter(_.contains("=")).map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i).trim -> kv.substring(i + 1).trim
      }.toMap
    }.toSeq
  }

  /** `GET /api/query` param map → query IR (reference
    * `Query(JsonMap&, StringBuffer&)`, `query.cpp:176-388`). Supports
    * repeated `m` params pre-split by the caller.
    */
  def parseGet(params: Map[String, Seq[String]],
      nowMs: Long = System.currentTimeMillis()): TsQuery = {
    def one(k: String): Option[String] = params.get(k).flatMap(_.headOption)
    val tz = one("tz").getOrElse("UTC")
    val start = TimeParse.parse(
      one("start").getOrElse(throw new IllegalArgumentException(
        "Must specify start time when query.")), nowMs, tz)
    val end = one("end").map(TimeParse.parse(_, nowMs, tz)).getOrElse(nowMs)
    val ms = one("msResolution").exists(_.toBoolean) || params.contains("ms")
    val subs = params.getOrElse("m", Nil).map(parse)
    TsQuery(start, end, ms, subs)
  }
}

package graft

import graft.query.{Downsample, FillPolicy, TagFilters, TimeParse}
import org.scalatest.funsuite.AnyFunSuite

class TimeParseSpec extends AnyFunSuite {
  val now = 1705017600000L // 2024-01-12 00:00:00 UTC

  test("relative times") {
    assert(TimeParse.parse("2h-ago", now) === now - 2 * 3600000L)
    assert(TimeParse.parse("7d-ago", now) === now - 7 * 86400000L)
    assert(TimeParse.parse("30ms-ago", now) === now - 30L)
    assert(TimeParse.parse("1w-ago", now) === now - 604800000L)
    assert(TimeParse.parse("1n-ago", now) === now - 30L * 86400000L)
  }

  test("epoch magnitude normalization (sec vs ms)") {
    assert(TimeParse.parse("1704412800", now) === 1704412800000L)
    assert(TimeParse.parse("1704412800000", now) === 1704412800000L)
  }

  test("calendar formats") {
    assert(TimeParse.parse("2024/01/12", now) === now)
    assert(TimeParse.parse("2024/01/12 00:00:00", now) === now)
    assert(TimeParse.parse("2024/01/11-23:00:00", now) === now - 3600000L)
    assert(TimeParse.parse("2024/01/12 00:30", now) === now + 1800000L)
    // timezone: 2024/01/12 01:00 CET == midnight UTC
    assert(TimeParse.parse("2024/01/12 01:00", now, tz = "Europe/Paris") === now)
  }
}

class DownsampleSpec extends AnyFunSuite {
  test("parse interval/func/fill") {
    val d = Downsample.parse("10s-avg")
    assert(d.intervalMs === 10000L && d.func === "avg" && d.fill === FillPolicy.None)
    assert(Downsample.parse("2h-p99-zero").intervalMs === 7200000L)
    assert(Downsample.parse("2h-p99-zero").fill === FillPolicy.Zero)
    assert(Downsample.parse("1d-max").intervalMs === 86400000L)
    val all = Downsample.parse("0all-last-nan")
    assert(all.isAll && all.func === "last" && all.fill === FillPolicy.NaN)
  }

  test("stepUp: aligned start unchanged, unaligned steps to next boundary") {
    val d = Downsample.parse("1h-avg")
    assert(d.stepUp(3600000L) === 3600000L)
    assert(d.stepUp(3600001L) === 7200000L)
    assert(d.stepUp(3599999L) === 3600000L)
  }

  test("bucketOf epoch-aligned") {
    val d = Downsample.parse("10s-sum")
    assert(d.bucketOf(25000L, 0L) === 20000L)
    assert(d.bucketOf(20000L, 0L) === 20000L)
    assert(Downsample.parse("0all-avg").bucketOf(99L, 42L) === 42L)
  }
}

class TagFiltersSpec extends AnyFunSuite {
  test("glob→regex escapes metacharacters and anchors") {
    assert(TagFilters.globToRegex("web*") === "^web.*$")
    assert(TagFilters.globToRegex("a.b*c") === "^a\\.b.*c$")
  }
}

class MExprSpec extends AnyFunSuite {
  import graft.model.{RollupUsage, TsQuery}
  import graft.query.MExpr

  test("full m= grammar: agg:rate{...}:downsample:explicit_tags:metric{g}{ng}") {
    val s = MExpr.parse(
      "sum:rate{true,10000,2}:1h-avg:explicit_tags:sys.cpu{host=*,dc=dc0}{od=literal_or(od0|od1)}")
    assert(s.aggregator === "sum")
    assert(s.rate && s.rateOptions.counter)
    assert(s.rateOptions.counterMax === 10000L && s.rateOptions.resetValue === 2L)
    assert(!s.rateOptions.dropResets) // m= form can't enable it (query.cpp:280-283)
    assert(s.downsample === Some("1h-avg"))
    assert(s.explicitTags)
    assert(s.metric === "sys.cpu")
    assert(s.tags === Map("host" -> "*", "dc" -> "dc0", "od" -> "literal_or(od0|od1)"))
    assert(s.groupByTags === Seq("dc", "host")) // first block only
  }

  test("minimal and intermediate forms") {
    val min = MExpr.parse("avg:view")
    assert(min.aggregator === "avg" && min.metric === "view" &&
      min.tags.isEmpty && !min.rate && min.downsample.isEmpty)
    val r = MExpr.parse("max:rate:10m-sum:m1{a=b}")
    assert(r.rate && !r.rateOptions.counter && r.downsample === Some("10m-sum"))
    assert(r.groupByTags === Seq("a"))
    val ru = MExpr.parse("avg:rollupUsage=ROLLUP_RAW:m1")
    assert(ru.rollupUsage === RollupUsage.Raw)
    assert(MExpr.parse("avg:percentiles[p50]:m1").metric === "m1")
  }

  test("parseGet: start/end/tz/ms/m params") {
    val now = 1705017600000L
    val q = MExpr.parseGet(
      Map(
        "start" -> Seq("1d-ago"),
        "end" -> Seq("1704931200"),
        "m" -> Seq("sum:1h-avg:click{host=*}")),
      nowMs = now)
    assert(q.startMs === now - 86400000L)
    assert(q.endMs === 1704931200000L)
    assert(!q.msResolution)
    assert(q.subQueries.size === 1 && q.subQueries.head.metric === "click")
    val ms = MExpr.parseGet(
      Map("start" -> Seq("1704931200"), "ms" -> Seq(""), "m" -> Seq.empty),
      nowMs = now)
    assert(ms.msResolution)
  }
}

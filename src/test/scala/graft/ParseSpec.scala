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

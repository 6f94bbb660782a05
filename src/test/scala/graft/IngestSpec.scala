package graft

import graft.ingest.LineParsers
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {

  test("opentsdb plain put") {
    val dp = LineParsers.parsePlain("put sys.cpu 1704412800 42.5 host=a dc=east").get
    assert(dp.metric === "sys.cpu")
    assert(dp.ts === 1704412800000L) // sec → ms
    assert(dp.value === 42.5)
    assert(dp.tags === Map("host" -> "a", "dc" -> "east"))
    // ms timestamps pass through
    assert(LineParsers.parsePlain("put m 1704412800123 1 t=v").get.ts === 1704412800123L)
    // malformed / inline commands rejected
    assert(LineParsers.parsePlain("version").isEmpty)
    assert(LineParsers.parsePlain("put m notanumber 1 t=v").isEmpty)
    assert(LineParsers.parsePlain("put m 1 x").isEmpty)
  }

  test("influx line: field explode + _field tag") {
    val dps = LineParsers.parseInflux(
      "weather,city=SF,country=US temp=65.5,humidity=80i 1704412800000000000", 0L)
    assert(dps.length === 2)
    val byField = dps.map(d => d.tags("_field") -> d).toMap
    assert(byField("temp").value === 65.5)
    assert(byField("humidity").value === 80.0)
    assert(byField("temp").ts === 1704412800000L) // ns → ms
    assert(byField("temp").metric === "weather")
    assert(byField("temp").tags("city") === "SF")
  }

  test("influx line: escapes rewrite byte-for-byte (tsdb.cpp:2725-2760)") {
    // the reference REWRITES escapes — \␣→_S, \=→_E, \,→_C, other→__ —
    // rather than restoring the characters; the stored charset then never
    // contains ',' or '=', keeping the canonical skey parseable
    val dps = LineParsers.parseInflux(
      """cpu\ load,host=a\ b,k\=1=v\,2 value=0.5 1704412801000""", 0L)
    assert(dps.length === 1)
    assert(dps.head.metric === "cpu_Sload")
    assert(dps.head.tags("host") === "a_Sb")
    assert(dps.head.tags("k_E1") === "v_C2")
    // any other escaped char → __ (reference default branch)
    val other = LineParsers.parseInflux("""m,t=a\xb v=1 1""", 0L)
    assert(other.head.tags("t") === "a__b")
  }

  test("plain/json puts sanitize ','/'=' out of names (OpenTSDB charset)") {
    val p = LineParsers.parsePlain("put m,x 1704412800 1 k=a,b").get
    assert(p.metric === "m_x" && p.tags("k") === "a_b")
    val j = LineParsers.parseJson(
      """{"metric":"m","timestamp":1,"value":1,"tags":{"k":"a=b"}}""")
    assert(j.head.tags("k") === "a_b")
  }

  test("malformed json body is dropped, not an ingest failure") {
    assert(LineParsers.parseJson("""{"metric":"a""") === Nil) // unterminated
    assert(LineParsers.parseJson("""[{"metric":}""") === Nil)
  }

  test("influx line: string/bool fields skipped, missing ts = now") {
    val dps = LineParsers.parseInflux("""m s="x",ok=t,v=2u""", nowMs = 777L)
    assert(dps.length === 1)
    assert(dps.head.value === 2.0 && dps.head.ts === 777L)
    // magnitude normalization: s / ms / µs
    def ts(line: String) = LineParsers.parseInflux(line, 0L).head.ts
    assert(ts("m v=1 1704412800") === 1704412800000L)
    assert(ts("m v=1 1704412800123") === 1704412800123L)
    assert(ts("m v=1 1704412800123456") === 1704412800123L)
  }

  test("opentsdb json put: object and array forms") {
    val one = LineParsers.parseJson(
      """{"metric":"sys.cpu","timestamp":1704412800,"value":18,"tags":{"host":"web01"}}""")
    assert(one.length === 1)
    assert(one.head.metric === "sys.cpu" && one.head.ts === 1704412800000L &&
      one.head.value === 18.0 && one.head.tags === Map("host" -> "web01"))

    val arr = LineParsers.parseJson(
      """[{"metric":"a","timestamp":1704412800000,"value":1.5,"tags":{}},
         |{"metric":"b","timestamp":1704412801,"value":"2.5","tags":{"x":"y"}}]""".stripMargin)
    assert(arr.map(_.metric) === Seq("a", "b"))
    assert(arr(1).value === 2.5) // quoted numeric accepted
  }
}

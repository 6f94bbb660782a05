package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[GraftConfig]] — the reference's config surface
  * (`include/config.h:30-171`): file grammar, value grammars (bool /
  * time / bytes), default table, override precedence, port lists,
  * `mqtt.settings` JSON, and the `/api/config` serialization.
  */
class ConfigSpec extends AnyFunSuite {

  test("file grammar: comments, key = value, later duplicate wins") {
    val cfg = GraftConfig.parse(
      """# comment (config.cpp:132)
        |; also a comment (config.cpp:131)
        |tcp.server.port = 7181,7180
        |
        |malformed line without equals
        |http.server.port = 9999
        |http.server.port = 8888
        |""".stripMargin)
    assert(cfg.loaded === Map(
      "tcp.server.port" -> "7181,7180", "http.server.port" -> "8888"))
    assert(cfg.firstPort("http.server.port", 6182) === 8888)
    assert(cfg.ports("tcp.server.port") === Seq(7181, 7180))
  }

  test("bool grammar: leading t/T is true, anything else false") {
    // config.h:187-190 — starts_with 't' || 'T'
    val cfg = GraftConfig.parse(
      "a = true\nb = T\nc = yes\nd = false\ne = 1")
    assert(cfg.bool("a", false))
    assert(cfg.bool("b", false))
    assert(!cfg.bool("c", false)) // 'yes' is NOT true in the reference
    assert(!cfg.bool("d", true))
    assert(!cfg.bool("e", true))
  }

  test("time grammar: every reference unit suffix") {
    // utils.cpp:495-537 — d/h/mi/mo/ms/n/s/w/y, m alone = minutes
    def t(s: String) = GraftConfig.parseTimeSeconds(s).get
    assert(t("30s") === 30)
    assert(t("5sec") === 5)
    assert(t("5min") === 300)
    assert(t("5m") === 300)
    assert(t("2h") === 7200)
    assert(t("1d") === 86400)
    assert(t("1w") === 604800)
    assert(t("1mo") === 2592000)
    assert(t("1n") === 2592000)
    assert(t("1y") === 31536000)
    assert(t("1500ms") === 1)
    assert(t("42") === 42) // bare number: caller's unit (seconds here)
  }

  test("bytes grammar: 1024 factors, case-insensitive") {
    // utils.cpp:667-692
    def b(s: String) = GraftConfig.parseBytes(s).get
    assert(b("512kb") === 512L * 1024)
    assert(b("10mb") === 10L * 1024 * 1024)
    assert(b("2GB") === 2L * 1024 * 1024 * 1024)
    assert(b("1tb") === 1L << 40)
    assert(b("106496b") === 106496L)
    assert(b("256") === 256L)
  }

  test("defaults: the shipped table answers unloaded keys") {
    val cfg = GraftConfig.empty
    assert(cfg.firstPort("http.server.port", 0) === 6182)
    assert(cfg.ports("tcp.server.port") === Seq(6181, 6180))
    assert(cfg.timeSeconds("stats.frequency", "30s") === 30)
    assert(cfg.timeSeconds("tsdb.rollup.frequency", "2h") === 7200)
    assert(cfg.bytes("tcp.buffer.size", "512kb") === 512L * 1024)
    assert(!cfg.bool("udp.server.enabled", false)) // off by default
    assert(cfg.bool("tcp.server.enabled", true))
    assert(cfg.str("tsdb.timezone") === "UTC")
    // every reference key resolves without throwing
    GraftConfig.Defaults.keys.foreach(k => cfg.str(k))
  }

  test("loaded entries override defaults; withOverrides wins over both") {
    val cfg = GraftConfig.parse("tsdb.timezone = America/New_York")
    assert(cfg.str("tsdb.timezone") === "America/New_York")
    val over = cfg.withOverrides("tsdb.timezone" -> "Asia/Tokyo")
    assert(over.str("tsdb.timezone") === "Asia/Tokyo")
  }

  test("one precedence everywhere: loaded > Defaults > caller default") {
    val cfg = GraftConfig.empty
    // Defaults answer reference keys even when the caller passes its own
    // fallback — uniformly, for every typed getter
    assert(cfg.str("tsdb.timezone", "XXX") === "UTC")
    assert(cfg.int("tsdb.compressor.precision", 99) === 8)
    assert(cfg.float("ts.lock.probability", 0.5) === 0.01)
    assert(cfg.timeSeconds("stats.frequency", "99s") === 30)
    assert(cfg.firstPort("udp.server.port", 6180) === 6181)
    // caller default only answers NON-reference keys
    assert(cfg.str("custom.key", "fallback") === "fallback")
    assert(cfg.int("custom.key", 7) === 7)
  }

  test("loadedJson mirrors the reference /api/config (loaded keys only)") {
    val cfg = GraftConfig.parse(
      "tcp.server.port = 7181\nlog.level = DEBUG")
    assert(cfg.loadedJson ===
      """{"tcp.server.port":"7181","log.level":"DEBUG"}""")
    assert(GraftConfig.empty.loadedJson === "{}")
  }

  test("effectiveJson names the Spark-side equivalent for mapped keys") {
    val json = GraftConfig.empty.effectiveJson
    assert(json.contains(
      """"cluster.partitions":{"value":"","superseded_by":"spark.sql.shuffle.partitions"}"""))
    // live keys carry no superseded_by marker
    assert(json.contains(""""stats.frequency":{"value":"30s"}"""))
  }

  test("mqtt.settings JSON: reference array form parses; bad entries skip") {
    // mqtt.cpp:119-150 — entries/topics missing required keys are ignored
    val specs = ServerMain.parseMqttSettings(
      """[{"broker":"dock","port":1883,
        |  "topics":[{"topic":"telegraf/test","format":"line"},
        |            {"topic":"noformat"}]},
        | {"port":1884,"topics":[]}]""".stripMargin)
    assert(specs === Seq(("dock", 1883, Seq("telegraf/test" -> "line"))))
    assert(ServerMain.parseMqttSettings("") === Seq.empty)
    assert(ServerMain.parseMqttSettings("not json") === Seq.empty)
    assert(ServerMain.parseMqttSettings("""{"broker":"x"}""") === Seq.empty)
  }

  test("config file loads from disk; missing file = empty (defaults)") {
    val f = java.nio.file.Files.createTempFile("graft-cfg", ".conf")
    java.nio.file.Files.writeString(f, "udp.server.enabled = true\n")
    try {
      val cfg = GraftConfig.load(f.toString)
      assert(cfg.bool("udp.server.enabled", false))
      assert(GraftConfig.load("/nonexistent/graft.conf").loaded.isEmpty)
    } finally java.nio.file.Files.delete(f)
  }

  test("byte-complete reference surface: every config.h key resolves with its default") {
    // parse the reference's own key table so the assertion can never
    // drift from it: every `#define CFG_* "<key>"` (non-_DEF) must
    // resolve through the Defaults table, and every key WITH a literal
    // _DEF must resolve to exactly that default (dual-valued
    // arch-conditional defaults take the non-embedded branch; the two
    // hardware_concurrency defaults resolve to this machine's count)
    val h = java.nio.file.Paths.get("/root/reference/include/config.h")
    assume(java.nio.file.Files.exists(h), "reference tree not present")
    val text = java.nio.file.Files.readString(h)
    val define = """#define\s+(CFG_\w+)\s+(.+?)\s*$""".r
    val defs = text.linesIterator.collect {
      case define(name, value) => name -> value.trim
    }.toSeq
    val keys = defs.collect {
      case (n, v) if !n.endsWith("_DEF") && v.startsWith("\"") =>
        n -> v.stripPrefix("\"").stripSuffix("\"")
    }.toMap
    assert(keys.size >= 70, s"parsed only ${keys.size} keys from config.h")
    val cfg = GraftConfig.empty
    keys.values.foreach { k =>
      assert(GraftConfig.Defaults.contains(k), s"missing reference key: $k")
      assert(cfg.str(k) != null)
    }
    // literal string/number/bool _DEFs must match our table verbatim
    // (skip expression defaults and the arch-conditional duals)
    val dual = Set("CFG_TSDB_METRIC_BUCKETS_DEF", "CFG_TSDB_ROLLUP_BUCKETS_DEF")
    val defMap = defs.filter(_._1.endsWith("_DEF")).groupBy(_._1)
    defMap.foreach { case (dn, vs) =>
      val base = dn.stripSuffix("_DEF")
      keys.get(base).foreach { key =>
        val expected = vs.map(_._2).distinct match {
          case Seq(one) => Some(one)
          case _ => None // arch-conditional: either branch acceptable
        }
        expected.filterNot(_ => dual.contains(dn)).foreach { raw =>
          val lit =
            if (raw.startsWith("\"")) Some(raw.stripPrefix("\"").stripSuffix("\""))
            else if (raw == "true" || raw == "false") Some(raw)
            else if (raw.matches("[0-9.]+")) Some(raw)
            else None // expression default (hardware_concurrency etc.)
          lit.foreach { v =>
            assert(cfg.str(key) == v,
              s"$key: reference default '$v' but Defaults has '${cfg.str(key)}'")
          }
        }
      }
    }
  }
}

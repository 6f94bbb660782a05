package graft.ingest

import graft.model.Dp
import graft.query.TimeParse

/** Pure line parsers for the three ingest wire formats. These are plain
  * Scala (row-imperative by nature) and are used from `Dataset.map` /
  * Structured Streaming; everything downstream is DataFrame-declarative.
  */
object LineParsers {

  /** OpenTSDB plain put: `put <metric> <ts> <value> <k=v> [<k=v> ...]`
    * (reference handler `src/core/tsdb.cpp:2386-2480`, parser
    * `DataPoint::from_plain` in `src/core/dp.cpp`). Returns None for
    * malformed lines and for inline commands (`version`, `stats`, ...)
    * the reference answers on the same socket.
    */
  def parsePlain(line: String): Option[Dp] = {
    val t = line.trim
    if (!t.startsWith("put ")) return None
    val parts = t.split("\\s+")
    if (parts.length < 4) return None
    try {
      val metric = parts(1)
      val ts = TimeParse.toMs(parts(2).toLong)
      val value = parts(3).toDouble
      val tags = parts.drop(4).flatMap { kv =>
        val i = kv.indexOf('=')
        if (i <= 0) None
        else Some(sanitize(kv.substring(0, i)) -> sanitize(kv.substring(i + 1)))
      }.toMap
      Some(Dp(sanitize(metric), tags, ts, value, 0L))
    } catch { case _: NumberFormatException => None }
  }

  /** InfluxDB line protocol:
    * `<measurement>[,<t>=<v>...] <field>=<val>[,<f2>=<v2>...] [<ts>]`
    * — one Dp per numeric field, field name carried as the special tag
    * `_field`, metric = measurement (reference `parse_line`,
    * `src/core/tsdb.cpp:2715-2821`; `_field` tag `include/tag.h:39-43`).
    *
    * Escapes `\,` `\=` `\ ` are legal inside names/tags
    * (`tsdb.cpp:2725-2741`). Integer fields may carry an `i`/`u` suffix;
    * string and boolean fields are skipped (the reference stores doubles
    * only). Timestamps: ns per the protocol, with magnitude-based
    * normalization for s/ms/us inputs; missing ts → `nowMs`.
    */
  /** Structural validity of an Influx line, independent of field types —
    * what the reference answers 400 for (`tsdb.cpp:2591`). Blank and
    * comment lines are fine; a line that can't split into
    * measurement+fields or has a garbled timestamp is not. A well-formed
    * line whose fields are all strings/bools parses to zero dps without
    * being an error.
    */
  def influxWellFormed(line: String): Boolean = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return true
    val sections = splitUnescaped(t, ' ')
    if (sections.length < 2) return false
    if (sections.length >= 3 && sections(2).nonEmpty &&
      normalizeTs(sections(2)).isEmpty) return false
    val keyBits = splitUnescaped(sections(0), ',')
    keyBits.nonEmpty && keyBits.head.nonEmpty
  }

  def parseInflux(line: String, nowMs: Long): Seq[Dp] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return Nil

    // split on unescaped spaces into ≤3 sections: keys, fields, [ts]
    val sections = splitUnescaped(t, ' ')
    if (sections.length < 2) return Nil
    val keyPart = sections(0)
    val fieldPart = sections(1)
    val tsMs =
      if (sections.length >= 3 && sections(2).nonEmpty) normalizeTs(sections(2))
      else Some(nowMs)
    if (tsMs.isEmpty) return Nil

    val keyBits = splitUnescaped(keyPart, ',')
    if (keyBits.isEmpty || keyBits.head.isEmpty) return Nil
    val measurement = unescape(keyBits.head)
    val tags = keyBits.tail.flatMap { kv =>
      val bits = splitUnescaped(kv, '=')
      if (bits.length == 2) Some(unescape(bits(0)) -> unescape(bits(1))) else None
    }.toMap

    splitUnescaped(fieldPart, ',').toSeq.flatMap { fv =>
      val bits = splitUnescaped(fv, '=')
      if (bits.length != 2) None
      else numericValue(bits(1)).map { v =>
        Dp(measurement, tags + ("_field" -> unescape(bits(0))), tsMs.get, v, 0L)
      }
    }
  }

  /** OpenTSDB JSON put body: single `{metric,timestamp,value,tags}` object
    * or an array of them (`src/core/tsdb.cpp:2340-2384`). Minimal
    * recursive-descent JSON scan — no external deps; tolerant of
    * whitespace; numbers for ts/value, string map for tags.
    */
  def parseJson(body: String): Seq[Dp] = try {
    val t = body.trim
    if (t.isEmpty) Nil
    else if (t.startsWith("[")) JsonMini.parseArray(t).flatMap(fromJsonMap)
    else JsonMini.parseObject(t).toSeq.flatMap(m => fromJsonMap(m))
  } catch {
    // malformed body: drop it (the reference answers 400 and moves on) —
    // a bad request must never fail the whole ingest task
    case _: RuntimeException => Nil
  }

  private def fromJsonMap(m: Map[String, Any]): Option[Dp] =
    for {
      metric <- m.get("metric").collect { case s: String => sanitize(s) }
      ts <- m.get("timestamp").collect {
        case d: Double => TimeParse.toMs(d.toLong)
        case l: Long => TimeParse.toMs(l)
      }
      value <- m.get("value").collect {
        case d: Double => d
        case l: Long => l.toDouble
        case s: String => s.toDouble // reference accepts quoted numbers
      }
    } yield Dp(
      metric,
      m.get("tags").collect { case mm: Map[_, _] =>
        mm.collect { case (k: String, v: String) => sanitize(k) -> sanitize(v) }.toMap
      }.getOrElse(Map.empty),
      ts, value, 0L)

  // -------------------------------------------------------------- helpers

  /** Enforce the OpenTSDB name charset at ingest: `,` and `=` (illegal in
    * OpenTSDB metric/tag names and values) become `_`. The canonical skey
    * `metric,k=v,…` is then always losslessly parseable
    * ([[graft.model.Dp.tagsFromKey]]). Influx input never reaches this —
    * its escape rewriting (see [[unescape]]) already excludes both.
    */
  private def sanitize(s: String): String =
    if (s.indexOf(',') < 0 && s.indexOf('=') < 0) s
    else s.map(c => if (c == ',' || c == '=') '_' else c)

  private def splitUnescaped(s: String, sep: Char): Array[String] = {
    val out = Array.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur.append(c).append(s.charAt(i + 1)); i += 2 }
      else if (c == sep) { out += cur.result(); cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    out += cur.result()
    out.result()
  }

  /** Escape REWRITING, byte-for-byte like the reference
    * (`src/core/tsdb.cpp:2725-2760`): `\,`→`_C`, `\=`→`_E`, `\ `→`_S`,
    * any other escaped char→`__`. Escaped characters are deliberately
    * NOT restored — the stored charset then never contains `,` or `=`
    * inside names/values, which is also what keeps the canonical skey
    * (metric,k=v,…) losslessly parseable.
    */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        sb.append('_').append(s.charAt(i + 1) match {
          case ',' => 'C'
          case '=' => 'E'
          case ' ' => 'S'
          case _ => '_'
        })
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  /** Influx field value: float, or int with `i`/`u` suffix; strings and
    * booleans → None (not storable as double).
    */
  private def numericValue(s: String): Option[Double] = {
    if (s.isEmpty || s.startsWith("\"")) return None
    val body =
      if (s.endsWith("i") || s.endsWith("u")) s.substring(0, s.length - 1) else s
    try Some(body.toDouble)
    catch { case _: NumberFormatException => None }
  }

  /** Magnitude-normalize a line-protocol timestamp to ms: ns (19 digits),
    * µs (16), ms (13), s (10) — reference `validate_resolution`
    * (`include/utils.h:80-81`) generalized to the influx ns default.
    */
  private def normalizeTs(s: String): Option[Long] =
    try {
      val v = s.toLong
      val abs = math.abs(v)
      Some(
        if (abs >= 100000000000000000L) v / 1000000L // ns
        else if (abs >= 100000000000000L) v / 1000L // µs
        else if (abs >= 100000000000L) v // ms
        else v * 1000L) // s
    } catch { case _: NumberFormatException => None }
}

/** Tiny dependency-free JSON reader sufficient for the OpenTSDB put
  * shapes: objects of scalars + one nested string map, and arrays of such
  * objects. Numbers → Double, integral → Long.
  */
private[graft] object JsonMini {

  def parseArray(s: String): Seq[Map[String, Any]] = {
    val p = new P(s)
    p.ws(); p.expect('[')
    val out = Seq.newBuilder[Map[String, Any]]
    p.ws()
    if (p.peek() != ']') {
      var done = false
      while (!done) {
        out += p.obj()
        p.ws()
        if (p.peek() == ',') { p.next(); () } else done = true
      }
    }
    out.result()
  }

  def parseObject(s: String): Option[Map[String, Any]] = {
    val p = new P(s)
    p.ws()
    if (p.peek() != '{') None else Some(p.obj())
  }

  private final class P(s: String) {
    private var i = 0
    def peek(): Char = if (i < s.length) s.charAt(i) else '\u0000'
    def next(): Char = { val c = peek(); i += 1; c }
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit =
      if (next() != c) throw new IllegalArgumentException(s"expected $c at $i")

    def obj(): Map[String, Any] = {
      ws(); expect('{'); ws()
      val m = Map.newBuilder[String, Any]
      if (peek() == '}') { next(); return m.result() }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        m += k -> value()
        ws()
        if (peek() == ',') { next(); () } else { expect('}'); done = true }
      }
      m.result()
    }

    def value(): Any = {
      ws()
      peek() match {
        case '"' => str()
        case '{' => obj()
        case '[' =>
          next()
          val arr = Seq.newBuilder[Any]
          ws()
          if (peek() == ']') { next() }
          else {
            var done = false
            while (!done) {
              arr += value(); ws()
              if (peek() == ',') { next(); () } else { expect(']'); done = true }
            }
          }
          arr.result()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ =>
          val start = i
          while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
          val raw = s.substring(start, i)
          if (raw.exists(c => c == '.' || c == 'e' || c == 'E')) raw.toDouble
          else raw.toLong
      }
    }

    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (i >= s.length) // EOF inside a string: fail, don't spin
          throw new IllegalArgumentException("unterminated string")
        val c = next()
        if (c == '\\') {
          next() match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'u' =>
              val code = s.substring(i, i + 4); i += 4
              sb.append(Integer.parseInt(code, 16).toChar)
            case other => sb.append(other)
          }
        } else if (c == '"') done = true
        else sb.append(c)
      }
      sb.result()
    }
  }
}

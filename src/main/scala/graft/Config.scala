package graft

import scala.collection.immutable.ListMap

/** Engine configuration: the reference's full tunable surface
  * (`include/config.h:30-171`) re-expressed for a Spark deployment.
  *
  * The reference loads a `key = value` properties file (comments start
  * with `#` or `;`, `src/utils/config.cpp:130-141`), applies
  * command-line overrides on top, and serves the loaded map back on
  * `GET /api/config` (`src/core/http.cpp:864-872`). Value grammar:
  *   - bool: anything starting with `t`/`T` is true (`config.h:187-190`)
  *   - time: leading integer + unit suffix, units `ms/s/min/h/d/w/mo/y`
  *     (`src/utils/utils.cpp:495-537`)
  *   - bytes: leading integer × 1024-factor for `kb/mb/gb/tb`
  *     (`src/utils/utils.cpp:667-692`)
  *
  * Every reference key is carried here with its default, split into
  * two tiers:
  *   - LIVE keys drive real behavior in this engine (ports, WAL, MQTT,
  *     rollup/compaction/retention cadence, self-metering, timezone …)
  *     — [[ServerMain]] and the stores read them through the typed
  *     getters.
  *   - MAPPED keys configure machinery Spark supplies wholesale (epoll
  *     buffers, page/compressor layout, thread pools). They parse and
  *     serve like any other key — a reference user's config file loads
  *     unchanged — but their value is advisory; [[sparkEquivalent]]
  *     names the Spark-side knob that took over the job.
  *
  * The `/api/config` body mirrors the reference's semantics (only keys
  * actually present in the file/overrides, not the default table) but
  * emits strict JSON — the reference's hand-rolled writer leaves a
  * trailing comma (`src/utils/config.cpp:621-651`), which we do not
  * reproduce.
  */
final class GraftConfig(val loaded: ListMap[String, String]) {
  import GraftConfig._

  def exists(key: String): Boolean = loaded.contains(key)

  // Every typed getter resolves with ONE precedence: loaded file/override
  // > the shipped Defaults table > the caller-supplied fallback. The
  // caller fallback therefore only matters for keys OUTSIDE the
  // reference's surface (the Defaults table answers every reference
  // key) — callers wanting a non-reference default for a reference key
  // must decide explicitly (see ServerMain's UDP port).

  /** Raw string value: loaded, else the default table, else `default`. */
  def str(key: String, default: String = null): String =
    loaded.getOrElse(key,
      Defaults.get(key).orElse(Option(default)).getOrElse(
        throw new NoSuchElementException(s"no config or default for '$key'")))

  /** Reference bool grammar: leading `t`/`T` is true (config.h:187). */
  def bool(key: String, default: Boolean): Boolean =
    loaded.get(key).map(v => v.startsWith("t") || v.startsWith("T"))
      .orElse(Defaults.get(key).map(v => v.startsWith("t")))
      .getOrElse(default)

  def int(key: String, default: Int): Int =
    loaded.get(key).flatMap(leadingLong).map(_.toInt)
      .orElse(Defaults.get(key).flatMap(leadingLong).map(_.toInt))
      .getOrElse(default)

  def float(key: String, default: Double): Double =
    loaded.get(key).flatMap(_.toDoubleOption)
      .orElse(Defaults.get(key).flatMap(_.toDoubleOption))
      .getOrElse(default)

  /** Duration in seconds via the reference time grammar; a bare number
    * is taken in `defaultUnit` seconds-per like the reference's
    * `get_time(name, unit)` caller-chosen unit.
    */
  def timeSeconds(key: String, default: String): Long = {
    val v = loaded.getOrElse(key, Defaults.getOrElse(key, default))
    parseTimeSeconds(v).getOrElse(
      parseTimeSeconds(default).getOrElse(0L)) // reference logs + falls back
  }

  def bytes(key: String, default: String): Long = {
    val v = loaded.getOrElse(key, Defaults.getOrElse(key, default))
    parseBytes(v).getOrElse(parseBytes(default).getOrElse(0L))
  }

  /** First port of a comma-list key like `"6182,6183"` (the reference
    * binds one listener per listed port; this engine's single JVM binds
    * the first and treats the rest as capacity hints).
    */
  def firstPort(key: String, default: Int): Int =
    ports(key).headOption.getOrElse(default)

  /** All ports of a comma-list key, in declared order — the reference's
    * port-id convention (`config.h:78-79`): `tcp.server.port` id 0 is
    * the OpenTSDB-plain listener, id 1 the InfluxDB-line listener.
    */
  def ports(key: String): Seq[Int] =
    loaded.getOrElse(key, Defaults.getOrElse(key, ""))
      .split(",").toIndexedSeq.flatMap(s => s.trim.toIntOption)

  /** `GET /api/config` — the loaded (non-default) entries, like the
    * reference's `Config::c_str`, as strict JSON.
    */
  def loadedJson: String =
    loaded.map { case (k, v) => s""""$k":"${escape(v)}"""" }
      .mkString("{", ",", "}")

  /** The full effective surface: every reference key with its effective
    * value, plus the Spark-side equivalent for MAPPED keys — the
    * operator-facing "what is this engine actually doing" view.
    */
  def effectiveJson: String = {
    val ks = Defaults.keys ++ loaded.keys.filterNot(Defaults.contains)
    ks.map { k =>
      val v = loaded.getOrElse(k, Defaults.getOrElse(k, ""))
      SparkEquivalents.get(k) match {
        case Some(eq) =>
          s""""$k":{"value":"${escape(v)}","superseded_by":"${escape(eq)}"}"""
        case None => s""""$k":{"value":"${escape(v)}"}"""
      }
    }.mkString("{", ",", "}")
  }

  def withOverrides(kvs: (String, String)*): GraftConfig =
    new GraftConfig(loaded ++ kvs)
}

object GraftConfig {

  /** Parse the reference's properties grammar from file content
    * (`src/utils/config.cpp:130-141`): `;`/`#` comment lines, one
    * `key = value` per line, later duplicates win, malformed lines
    * skipped silently.
    */
  def parse(content: String): GraftConfig = {
    val entries = content.linesIterator.foldLeft(ListMap.empty[String, String]) {
      (acc, line) =>
        val t = line.trim
        if (t.isEmpty || t.startsWith("#") || t.startsWith(";")) acc
        else t.indexOf('=') match {
          case i if i > 0 =>
            val k = t.take(i).trim
            val v = t.drop(i + 1).trim
            if (k.isEmpty) acc else acc.updated(k, v)
          case _ => acc // no '=': reference tokenize fails → line skipped
        }
    }
    new GraftConfig(entries)
  }

  def load(path: String): GraftConfig = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      parse(new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
    else new GraftConfig(ListMap.empty) // reference: load failure → defaults
  }

  def empty: GraftConfig = new GraftConfig(ListMap.empty)

  private def leadingLong(s: String): Option[Long] = {
    val digits = s.trim.takeWhile(c => c.isDigit || c == '-')
    digits.toLongOption
  }

  /** Reference `to_time_unit` (`src/utils/utils.cpp:495-537`): scan for
    * the first letter in `d..y`; `m` disambiguates on the next char
    * (`mi`=min, `mo`=month, `ms`=millis, bare `m`=min). Returns
    * seconds; `ms` rounds down like integer division.
    */
  def parseTimeSeconds(s: String): Option[Long] = {
    val v = s.trim
    leadingLong(v).map { n =>
      val i = v.indexWhere(c => { val l = c.toLower; l >= 'd' && l <= 'y' })
      if (i < 0) n // bare number = caller unit; config keys use seconds
      else v(i).toLower match {
        case 'd' => n * 86400
        case 'h' => n * 3600
        case 'm' =>
          if (i + 1 < v.length) v(i + 1).toLower match {
            case 'o' => n * 2592000 // 30-day month, utils.cpp:560
            case 's' => n / 1000
            case _ => n * 60
          } else n * 60
        case 'n' => n * 2592000
        case 's' => n
        case 'w' => n * 604800
        case 'y' => n * 31536000
        case _ => n
      }
    }
  }

  /** Reference `get_bytes_factor` (`src/utils/utils.cpp:667-692`):
    * first letter in `b..t` picks the 1024-power (fall-through cases).
    */
  def parseBytes(s: String): Option[Long] = {
    val v = s.trim
    leadingLong(v).map { n =>
      val i = v.indexWhere(c => { val l = c.toLower; l >= 'b' && l <= 't' })
      val factor =
        if (i < 0) 1L
        else v(i).toLower match {
          case 't' => 1L << 40
          case 'g' => 1L << 30
          case 'm' => 1L << 20
          case 'k' => 1L << 10
          case _ => 1L
        }
      n * factor
    }
  }

  /** Every reference key with its shipped default
    * (`include/config.h:30-171`; dual-valued defaults take the
    * non-embedded branch: metric buckets 100, rollup buckets 512).
    */
  val Defaults: ListMap[String, String] = ListMap(
    "append.log.enabled" -> "true",
    "append.log.flush.frequency" -> "5min",
    "cluster.servers" -> "",
    "cluster.partitions" -> "",
    "cluster.backlog.rotation.size" -> "10mb",
    "config.reload.enabled" -> "false",
    "config.reload.frequency" -> "5min",
    "http.listener.count" -> Runtime.getRuntime.availableProcessors().toString,
    "http.request.format" -> "plain",
    "http.responders.per.listener" -> "2",
    "http.server.port" -> "6182,6183",
    "log.file" -> "",
    "log.level" -> "INFO",
    "log.retention.count" -> "10",
    "log.rotation.size" -> "10mb",
    "mqtt.settings" -> "",
    "stats.frequency" -> "30s",
    "tcp.connection.idle.timeout" -> "10min",
    "tcp.listener.count" -> Runtime.getRuntime.availableProcessors().toString,
    "tcp.max.epoll.events" -> "128",
    "tcp.buffer.size" -> "512kb",
    "tcp.min.file.descriptor" -> "128",
    "tcp.min.http.step" -> "100",
    "tcp.responders.per.listener" -> "2",
    "tcp.responders.queue.size" -> "128",
    "tcp.server.enabled" -> "true",
    "tcp.server.port" -> "6181,6180",
    "tcp.socket.rcvbuf.size" -> "106496b",
    "tcp.socket.sndbuf.size" -> "",
    "ticktock.home" -> "",
    "timer.granularity" -> "1s",
    "timer.queue.size" -> "32",
    "timer.thread.count" -> "1",
    "ts.archive.threshold" -> "1d",
    "ts.lock.probability" -> "0.01",
    "tsdb.archive.threshold" -> "1w",
    "tsdb.compact.batch.size" -> "500",
    "tsdb.compact.frequency" -> "0s",
    "tsdb.compact.threshold" -> "1d",
    "tsdb.compressor.precision" -> "8",
    "tsdb.compressor.version" -> "4",
    "tsdb.data.dir" -> "",
    "tsdb.flush.frequency" -> "5min",
    "tsdb.gc.frequency" -> "1d",
    "tsdb.max.dp.line" -> "256",
    "tsdb.metric.buckets" -> "100",
    "tsdb.min.disk.space" -> "4",
    "tsdb.off_hour.begin" -> "0",
    "tsdb.off_hour.end" -> "5",
    "tsdb.page.count" -> "0",
    "tsdb.page.size" -> "256b",
    "tsdb.read_only.threshold" -> "1h",
    "tsdb.retention.threshold" -> "",
    "tsdb.rollup.buckets" -> "512",
    // defaultless in the reference (config.h:143 has no _DEF; the
    // level1/level2 keys below carry the real versions)
    "tsdb.rollup.compressor.version" -> "",
    "tsdb.rollup.compressor.precision" -> "8",
    "tsdb.rollup.level1.compressor.version" -> "2",
    "tsdb.rollup.level2.compressor.version" -> "1",
    "tsdb.rollup.enabled" -> "true",
    "tsdb.rollup.frequency" -> "2h",
    "tsdb.rollup.pause" -> "5sec",
    "tsdb.rollup.threshold" -> "2d",
    "tsdb.rotation.frequency" -> "1d",
    "tsdb.self_meter.destination" -> "",
    "tsdb.self_meter.enabled" -> "false",
    "tsdb.thrashing.threshold" -> "30min",
    "tsdb.timestamp.resolution" -> "second",
    "tsdb.timezone" -> "UTC",
    "udp.listener.count" -> "2",
    "udp.batch.size" -> "256",
    "udp.server.enabled" -> "false",
    "udp.server.port" -> "6181")

  /** MAPPED tier: reference knobs whose machinery Spark supplies. The
    * key still parses and serves; this names what replaced it.
    */
  val SparkEquivalents: Map[String, String] = Map(
    "cluster.servers" -> "Spark cluster manager (standalone/YARN/K8s)",
    "cluster.partitions" -> "spark.sql.shuffle.partitions",
    "cluster.backlog.rotation.size" -> "shuffle spill (spark.local.dir)",
    "http.listener.count" -> "driver-side HTTP pool; queries run on executors",
    "http.responders.per.listener" -> "driver-side HTTP pool",
    "tcp.listener.count" -> "driver accepts; ingest batches run on executors",
    "tcp.max.epoll.events" -> "java.nio socket accept loop",
    "tcp.buffer.size" -> "socket stream buffering (BufferedReader)",
    "tcp.min.file.descriptor" -> "JVM/OS fd management",
    "tcp.min.http.step" -> "JVM/OS fd management",
    "tcp.responders.per.listener" -> "ingest micro-batch thread",
    "tcp.responders.queue.size" -> "ingest micro-batch queue",
    "tcp.socket.rcvbuf.size" -> "java.net socket defaults",
    "tcp.socket.sndbuf.size" -> "java.net socket defaults",
    "timer.granularity" -> "maintenance scheduled per ingest batch",
    "timer.queue.size" -> "maintenance scheduled per ingest batch",
    "timer.thread.count" -> "maintenance scheduled per ingest batch",
    "ts.archive.threshold" -> "parquet day partitions are always queryable",
    "ts.lock.probability" -> "no shared-page locking; executors own partitions",
    "tsdb.compressor.precision" -> "parquet encodings (zstd + dictionary)",
    "tsdb.compressor.version" -> "parquet encodings (zstd + dictionary)",
    "tsdb.flush.frequency" -> "each ingest batch commits via manifest",
    "tsdb.max.dp.line" -> "line parsers are length-safe",
    "tsdb.metric.buckets" -> "hash partitioning on series key",
    "tsdb.page.count" -> "parquet row groups",
    "tsdb.page.size" -> "parquet row groups",
    "tsdb.read_only.threshold" -> "immutable committed parquet",
    "tsdb.rollup.buckets" -> "rollup slice partitioning",
    "tsdb.rollup.compressor.precision" -> "parquet encodings",
    "tsdb.rollup.compressor.version" -> "parquet encodings",
    "tsdb.rollup.level1.compressor.version" -> "parquet encodings",
    "tsdb.rollup.level2.compressor.version" -> "parquet encodings",
    "tsdb.rotation.frequency" -> "day-partitioned store layout",
    "tsdb.thrashing.threshold" -> "no mmap; executor memory manager",
    "tsdb.gc.frequency" -> "JVM GC + Spark ContextCleaner",
    "tsdb.compact.batch.size" -> "ingest-path auto-compaction (Store.compactEveryBatches)",
    "tsdb.compact.frequency" -> "ingest-path auto-compaction (Store.compactEveryBatches)",
    "tsdb.compact.threshold" -> "ingest-path auto-compaction (Store.compactEveryBatches)",
    "config.reload.enabled" -> "restart ServerMain (immutable session conf)",
    "config.reload.frequency" -> "restart ServerMain (immutable session conf)",
    "tsdb.min.disk.space" -> "cluster storage provisioning",
    "tsdb.off_hour.begin" -> "compaction runs on the ingest path",
    "tsdb.off_hour.end" -> "compaction runs on the ingest path",
    "log.file" -> "log4j2 (Spark logging)",
    "log.level" -> "log4j2 (Spark logging)",
    "log.retention.count" -> "log4j2 (Spark logging)",
    "log.rotation.size" -> "log4j2 (Spark logging)")

  /** Strict-JSON string escape (backslash, quote, and every control
    * char) — shared with the `/api/config` serializers.
    */
  def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}

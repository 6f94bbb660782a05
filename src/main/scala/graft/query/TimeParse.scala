package graft.query

import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Query time parsing, replicating the reference's `parse_ts`
  * (`src/utils/utils.cpp:405-475`) and magnitude-based unit normalization
  * (`to_ms`/`to_sec`, `utils.cpp:386-402`). Everything returns epoch
  * **milliseconds**.
  */
object TimeParse {

  private val MaxSecSinceEpoch = 99999999999L // ~5138 AD in seconds

  /** Magnitude-based normalization: values small enough to be seconds are
    * scaled to ms (reference `to_ms`, utils.cpp:386-393).
    */
  def toMs(ts: Long): Long = if (ts < MaxSecSinceEpoch) ts * 1000L else ts

  /** Time unit suffixes incl. month `n` and year `y`
    * (reference `to_time_unit`, utils.cpp:494+).
    */
  def unitMs(unit: String): Long = unit match {
    case "ms" => 1L
    case "s" => 1000L
    case "m" | "min" => 60L * 1000L
    case "h" => 3600L * 1000L
    case "d" => 86400L * 1000L
    case "w" => 7L * 86400L * 1000L
    case "n" => 30L * 86400L * 1000L // month, reference convention
    case "y" => 365L * 86400L * 1000L
    case u => throw new IllegalArgumentException(s"unknown time unit: $u")
  }

  private val Relative = """(\d+)(ms|s|m|min|h|d|w|n|y)-ago""".r

  /** Parse a query start/end: epoch number (s or ms by magnitude),
    * relative `2h-ago`, or calendar `yyyy/MM/dd[-| ]HH:mm[:ss]` in `tz`.
    * `nowMs` is injectable for determinism (the reference uses wall clock).
    */
  def parse(s: String, nowMs: Long, tz: String = "UTC"): Long = s.trim match {
    case Relative(n, u) => nowMs - n.toLong * unitMs(u)
    case str if str.nonEmpty && str.forall(c => c.isDigit) => toMs(str.toLong)
    case str if str.length >= 10 && str.charAt(4) == '/' && str.charAt(7) == '/' =>
      val zone = ZoneId.of(tz)
      val ldt =
        if (str.length >= 19)
          LocalDateTime.parse(str, DateTimeFormatter.ofPattern(
            if (str.charAt(10) == ' ') "yyyy/MM/dd HH:mm:ss" else "yyyy/MM/dd-HH:mm:ss"))
        else if (str.length >= 16)
          LocalDateTime.parse(str, DateTimeFormatter.ofPattern(
            if (str.charAt(10) == ' ') "yyyy/MM/dd HH:mm" else "yyyy/MM/dd-HH:mm"))
        else
          LocalDate.parse(str, DateTimeFormatter.ofPattern("yyyy/MM/dd")).atStartOfDay()
      ldt.atZone(zone).toInstant.toEpochMilli
    case str =>
      throw new IllegalArgumentException(s"unparseable time: $str")
  }
}

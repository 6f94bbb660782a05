package graft.query

import graft.model.TsQuery

/** Downsample spec: `"<interval><unit>-<func>[-<fill>]"` with units
  * `ms,s,m,h,d,w` and the special `0all` (single bucket over the whole
  * query range) — reference `src/agg/down.cpp:64-127`.
  */
final case class Downsample(
    intervalMs: Long, // 0 ⇒ "0all"
    func: String,
    fill: FillPolicy) {

  def isAll: Boolean = intervalMs == 0L

  /** Bucket assignment is epoch-aligned `ts - ts % interval`
    * (reference `down.cpp:242-246`); `0all` puts everything at the
    * (adjusted) query start.
    */
  def bucketOf(tsMs: Long, startMs: Long): Long =
    if (isAll) startMs else tsMs - math.floorMod(tsMs, intervalMs)

  /** Query start stepped UP to the next bucket boundary (aligned start is
    * kept) — reference `step_up`, `down.cpp:235-240` + `down.cpp:96-105`.
    */
  def stepUp(startMs: Long): Long =
    if (isAll) startMs
    else {
      val t = startMs - 1
      t - math.floorMod(t, intervalMs) + intervalMs
    }
}

sealed trait FillPolicy { def valueOrNull: Option[Double] }
object FillPolicy {
  case object None extends FillPolicy { val valueOrNull = Option.empty[Double] }
  case object NaN extends FillPolicy { val valueOrNull = Some(Double.NaN) }
  case object Null extends FillPolicy { val valueOrNull = Option.empty[Double] }
  case object Zero extends FillPolicy { val valueOrNull = Some(0.0) }
}

object Downsample {

  private val Spec = """(\d+)(ms|s|m|h|d|w)-(\w+?)(?:-(none|nan|null|zero))?""".r
  private val All = """0all-(\w+?)(?:-(none|nan|null|zero))?""".r

  val downsampleFuncs: Set[String] =
    Set("avg", "count", "dev", "first", "last", "max", "min", "sum") ++
      (50 to 999).map(p => s"p$p")

  def parse(s: String): Downsample = s match {
    case All(fn, fill) => Downsample(0L, fn, parseFill(Option(fill)))
    case Spec(n, unit, fn, fill) =>
      Downsample(n.toLong * TimeParse.unitMs(unit), fn, parseFill(Option(fill)))
    case other => throw new IllegalArgumentException(s"bad downsample: $other")
  }

  private def parseFill(s: Option[String]): FillPolicy = s match {
    case None | Some("none") => FillPolicy.None
    case Some("nan") => FillPolicy.NaN
    case Some("null") => FillPolicy.Null
    case Some("zero") => FillPolicy.Zero
    case Some(other) => throw new IllegalArgumentException(s"bad fill: $other")
  }

  /** Effective scan range for a downsampled query: start stepped up to the
    * bucket grid, end expanded to cover the last bucket (reference
    * `include/down.h:76-82`, `src/core/query.cpp:1020-1030`).
    */
  def adjustRange(q: TsQuery, ds: Downsample): (Long, Long) =
    if (ds.isAll) (q.startMs, q.endMs)
    else (ds.stepUp(q.startMs), q.endMs)
}

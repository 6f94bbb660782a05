package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compile OpenTSDB tag-filter strings to Catalyst `Column` predicates.
  *
  * Filter grammar from the reference (`src/utils/tag.cpp:718-785`):
  * literal, `literal_or(a|b)`, `iliteral_or(...)`, `not_literal_or(...)`,
  * `not_iliteral_or(...)`, `wildcard(web*)`, `iwildcard(...)`,
  * `regexp(...)`, bare `*` (key exists, any value), plus the 1.x legacy
  * forms (trailing `*` → wildcard, embedded `|` → alternation).
  *
  * Compilation happens at query-build time in plain Scala; the output is an
  * ordinary codegen-friendly predicate over `tags[key]` — no UDF, so
  * Catalyst can still prune/push the rest of the plan.
  */
object TagFilters {

  private val Fn = """(\w+)\((.*)\)""".r

  /** Predicate for one `key -> filterExpr` pair over a MapType `tags`
    * column. A missing key never matches (map access yields null).
    */
  def compile(tags: Column, key: String, filter: String): Column = {
    val v = tags.getItem(key)
    filter match {
      case "*" => v.isNotNull
      case Fn("literal_or", args) => v.isin(split(args): _*)
      case Fn("iliteral_or", args) =>
        lower(v).isin(split(args).map(_.toLowerCase): _*)
      case Fn("not_literal_or", args) =>
        v.isNotNull && !v.isin(split(args): _*)
      case Fn("not_iliteral_or", args) =>
        v.isNotNull && !lower(v).isin(split(args).map(_.toLowerCase): _*)
      case Fn("wildcard", arg) => glob(v, arg)
      case Fn("iwildcard", arg) => glob(lower(v), arg.toLowerCase)
      case Fn("regexp", arg) => v.rlike(anchor(arg))
      // legacy 1.x: trailing-or-embedded '*' → glob; '|' → alternation
      case s if s.contains("*") => glob(v, s)
      case s if s.contains("|") => v.isin(split(s): _*)
      case s => v === s
    }
  }

  /** All predicates for a sub-query's tag map, AND-combined; with
    * `explicitTags`, the series must carry exactly the queried tag count
    * (reference `src/core/tsdb.cpp:736-737`).
    */
  def compileAll(
      tags: Column,
      filters: Map[String, String],
      explicitTags: Boolean = false): Column = {
    val preds = filters.map { case (k, f) => compile(tags, k, f) }
    val conj = preds.reduceOption(_ && _).getOrElse(lit(true))
    if (explicitTags) conj && (size(map_keys(tags)) === lit(filters.size))
    else conj
  }

  private def split(args: String): Seq[String] =
    args.split('|').toSeq.map(_.trim)

  /** Glob match. The common shapes — `p*`, `*s`, `*m*`, and `p*s` —
    * compile to codegen'd string ops (startsWith/endsWith/contains)
    * instead of a regex; anything else falls back to `rlike`.
    */
  private def glob(v: Column, pattern: String): Column = {
    val stars = pattern.count(_ == '*')
    val parts = pattern.split("\\*", -1)
    (stars, parts.toSeq) match {
      case (0, _) => v === pattern
      case (1, Seq(p, "")) => v.startsWith(p)
      case (1, Seq("", s)) => v.endsWith(s)
      case (1, Seq(p, s)) =>
        v.startsWith(p) && v.endsWith(s) &&
          length(v) >= lit(p.length + s.length)
      case (2, Seq("", m, "")) => v.contains(m)
      case _ => v.rlike(globToRegex(pattern))
    }
  }

  /** Glob → anchored regex: `*` → `.*`, regex metacharacters escaped
    * (reference `replace_stars`, tag.cpp:798-821 escapes dots).
    */
  def globToRegex(glob: String): String =
    anchor(glob.flatMap {
      case '*' => ".*"
      case c if "\\.[]{}()+-^$?".contains(c) => s"\\$c"
      case c => c.toString
    })

  /** The reference's regex matching is full-match (POSIX regexec on the
    * whole value); Spark `rlike` is find() — anchor to replicate.
    */
  private def anchor(re: String): String = {
    val s = if (re.startsWith("^")) re else "^" + re
    if (s.endsWith("$")) s else s + "$"
  }
}

package graft

import graft.query.SeriesJoin
import org.apache.spark.sql.functions._

class SeriesJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    // (id, key, ts, payload)
    (1L, "a", 100L, 1.0),
    (2L, "a", 200L, 2.0),
    (3L, "a", 50L, 3.0), // before any right row
    (4L, "b", 500L, 4.0),
    (5L, "c", 10L, 5.0) // key with no right rows at all
  ).toDF("id", "k", "ts", "x")

  private def right = Seq(
    ("a", 100L, 10.0), // equal ts → inclusive match for left id=1
    ("a", 150L, 15.0),
    ("b", 90L, 9.0)
  ).toDF("k", "ts", "y")

  test("asof: latest at-or-before right row per key, inclusive, else null") {
    val r = SeriesJoin.asofJoin(left, right, Seq("k"))
      .select("id", "asof_ts", "y")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (id, ats, y) => id -> ((ats, y)) }.toMap
    assert(r(1L) === ((Some(100L), Some(10.0)))) // equal ts matches
    assert(r(2L) === ((Some(150L), Some(15.0)))) // latest of the two
    assert(r(3L) === ((None, None))) // nothing at-or-before
    assert(r(4L) === ((Some(90L), Some(9.0)))) // old but eligible
    assert(r(5L) === ((None, None))) // key absent on the right
  }

  test("asof: tolerance nulls out stale matches") {
    val r = SeriesJoin.asofJoin(left, right, Seq("k"), tolerance = Some(100L))
      .select("id", "asof_ts", "y")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(2L) === ((Some(150L), Some(15.0)))) // within 100
    assert(r(4L) === ((None, None))) // 500 - 90 > 100 → stale
  }

  test("asof: all right columns resolve from the same right row") {
    // right row at ts=20 holds a null in one column; a per-column
    // running-last would pull u from ts=20 and v from ts=10 — the struct
    // transport must keep them together
    val l = Seq((1L, "a", 30L)).toDF("id", "k", "ts")
    val r = Seq(
      ("a", 10L, Some(1.0), Some(100.0)),
      ("a", 20L, None: Option[Double], Some(200.0))
    ).toDF("k", "ts", "u", "v")
    val out = SeriesJoin.asofJoin(l, r, Seq("k"))
      .select("asof_ts", "u", "v")
      .as[(Option[Long], Option[Double], Option[Double])].collect().head
    assert(out === ((Some(20L), None, Some(200.0))))
  }

  test("asof: left payload columns pass through untouched") {
    val r = SeriesJoin.asofJoin(left, right, Seq("k"))
    assert(r.columns.toSeq === Seq("id", "k", "ts", "x", "asof_ts", "y"))
    assert(r.select(sum(col("x"))).as[Double].head() === 15.0)
    assert(r.count() === 5)
  }

  test("asof: forward direction picks the earliest at-or-after right row") {
    val r = SeriesJoin.asofJoin(left, right, Seq("k"), direction = "forward")
      .select("id", "asof_ts", "y")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) === ((Some(100L), Some(10.0)))) // equal ts, inclusive
    assert(r(2L) === ((None, None))) // nothing at-or-after 200
    assert(r(3L) === ((Some(100L), Some(10.0)))) // earliest following
    assert(r(4L) === ((None, None))) // b@90 is before 500
  }

  test("asof: strict matching excludes the equal-timestamp right row") {
    val strictBack = SeriesJoin.asofJoin(left, right, Seq("k"),
      inclusive = false)
      .select("id", "asof_ts")
      .as[(Long, Option[Long])].collect().toMap
    assert(strictBack(1L) === None) // only right ≤ 100 was AT 100
    assert(strictBack(2L) === Some(150L)) // unaffected
    val strictFwd = SeriesJoin.asofJoin(left, right, Seq("k"),
      direction = "forward", inclusive = false)
      .select("id", "asof_ts")
      .as[(Long, Option[Long])].collect().toMap
    assert(strictFwd(1L) === Some(150L)) // skips the equal-ts 100
  }

  test("asof: forward tolerance nulls out far-future matches") {
    val r = SeriesJoin.asofJoin(left, right, Seq("k"),
      direction = "forward", tolerance = Some(40L))
      .select("id", "asof_ts")
      .as[(Long, Option[Long])].collect().toMap
    assert(r(1L) === Some(100L)) // distance 0
    assert(r(3L) === None) // 100 - 50 > 40 → too far ahead
  }

  test("asof: colliding right column names are rejected") {
    intercept[IllegalArgumentException] {
      SeriesJoin.asofJoin(left, right.withColumnRenamed("y", "x"), Seq("k"))
    }
    intercept[IllegalArgumentException] { // reserved output name on the left
      SeriesJoin.asofJoin(left.withColumnRenamed("x", "asof_ts"), right, Seq("k"))
    }
    intercept[IllegalArgumentException] { // internal working name on the left
      SeriesJoin.asofJoin(left.withColumnRenamed("x", "_ats"), right, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SeriesJoin.intervalJoin(left.withColumnRenamed("x", "right_ts"), right,
        Seq("k"), lower = -1L, upper = 0L)
    }
  }

  test("interval: exact window membership, inclusive both ends") {
    val l = Seq((1L, "a", 1000L), (2L, "a", 5000L), (3L, "b", 1000L))
      .toDF("id", "k", "ts")
    val r = Seq(
      ("a", 400L, 40.0), // 1000-600 → in for id=1
      ("a", 399L, 39.9), // just below id=1's lower bound
      ("a", 1000L, 100.0), // equal ts → in (upper inclusive)
      ("a", 1001L, 100.1), // above upper
      ("b", 900L, 90.0)
    ).toDF("k", "ts", "y")
    val out = SeriesJoin.intervalJoin(l, r, Seq("k"), lower = -600L, upper = 0L)
      .select("id", "right_ts", "y")
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 400L, 40.0), (1L, 1000L, 100.0), (3L, 900L, 90.0)))
  }

  test("interval: each qualifying pair is produced exactly once") {
    // windows spanning two buckets must not duplicate pairs through both
    // candidate buckets
    val l = Seq((1L, "a", 100L)).toDF("id", "k", "ts")
    val r = (0L to 120L by 10L).map(t => ("a", t, t.toDouble)).toDF("k", "ts", "y")
    val out = SeriesJoin.intervalJoin(l, r, Seq("k"), lower = -50L, upper = 0L)
      .select("right_ts").as[Long].collect().toSeq
    assert(out.sorted === Seq(50L, 60L, 70L, 80L, 90L, 100L))
    assert(out.size === out.distinct.size)
  }

  test("interval: negative-timestamp bucketing stays floor-aligned") {
    val l = Seq((1L, "a", 0L)).toDF("id", "k", "ts")
    val r = Seq(("a", -100L, 1.0), ("a", -101L, 2.0), ("a", 0L, 3.0))
      .toDF("k", "ts", "y")
    val out = SeriesJoin.intervalJoin(l, r, Seq("k"), lower = -100L, upper = 0L)
      .select("right_ts").as[Long].collect().toSet
    assert(out === Set(-100L, 0L))
  }

  test("asof plan: one exchange, no join operator") {
    val plan = SeriesJoin.asofJoin(left, right, Seq("k"))
      .queryExecution.executedPlan.toString
    // union + window, hash-partitioned once by the key — a range/cross
    // join anywhere here would be the quadratic shape this operator exists
    // to avoid
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one shuffle, plan:\n$plan")
  }
}

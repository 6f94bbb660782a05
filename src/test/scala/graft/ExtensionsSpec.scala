package graft

import org.apache.spark.sql.SparkSession

/** The config-only route: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` gets the SQL functions
  * and optimizer rule with zero Scala-API calls.
  */
class ExtensionsSpec extends SparkSpec {

  /** Build a second session (sharing the JVM's SparkContext) with the
    * extensions applied; restore the shared default afterwards so other
    * suites are untouched. `spark.sql.extensions` is a STATIC conf — on a
    * JVM whose context already exists it is ignored — so the test goes
    * through `builder.withExtensions`, the exact code path the config
    * route invokes (by reflected class name) on a fresh JVM.
    */
  private def withExtendedSession[A](f: SparkSession => A): A = {
    spark // force the shared session (and its context) first
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }

  test("graft_dot and graft_md5h60 are callable from plain SQL") {
    withExtendedSession { s =>
      val d = s.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head.getDouble(0)
      assert(d === 11.0)
      val h = s.sql("SELECT graft_md5h60('abc') AS h").head.getLong(0)
      // same value the Column API produces
      import s.implicits._
      val viaColumn = Seq("abc").toDF("s")
        .select(graft.functions.GraftFunctions.md5Hash60($"s")).head.getLong(0)
      assert(h === viaColumn)
    }
  }

  test("graft_percentile aggregates with R-6 interpolation in SQL") {
    withExtendedSession { s =>
      // p50 over {1,2,3,4}: idx = 0.5*5 = 2.5 → 2 + 0.5*(3-2) = 2.5
      val p = s.sql(
        "SELECT graft_percentile(v, 50) AS p FROM VALUES (1.0D),(2.0D),(3.0D),(4.0D) t(v)")
        .head.getDouble(0)
      assert(p === 2.5)
      // non-literal quantile is refused
      val err = intercept[Exception] {
        s.sql("SELECT graft_percentile(v, v) FROM VALUES (1.0D) t(v)").collect()
      }
      assert(err.getMessage.toLowerCase.contains("literal"))
    }
  }

  test("the DivBounds optimizer rule is active in the extended session") {
    withExtendedSession { s =>
      // effect-level assertion: bounds through `div` reach PushedFilters
      // without any GraftOptimizations.install call on this session
      val dir = java.nio.file.Files.createTempDirectory("extdivb").toString + "/t"
      import s.implicits._
      (0L to 5000000000L by 7000000L).toDF("ns").write.parquet(dir)
      val q = s.read.parquet(dir)
        .select(org.apache.spark.sql.functions.expr("ns div 1000000").as("ms"))
        .filter($"ms".between(1200L, 3400L))
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("GreaterThanOrEqual(ns,1200000000)"))
      assert(scan.contains("LessThanOrEqual(ns,3400999999)"))
    }
  }
}

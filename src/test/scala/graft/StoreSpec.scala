package graft

import graft.model.{Dp, SubQuery, TsQuery}
import graft.query.Planner
import graft.rollup.Rollup
import graft.store.Store
import org.apache.spark.sql.functions._

class StoreSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000L
  private val D = 86400000L

  private def mkDp(rows: Seq[(String, String, Long, Double, Long)]) =
    spark.createDataset(rows.map { case (m, h, ts, v, q) =>
      Dp(m, Map("host" -> h), ts, v, q)
    }).toDF()

  test("data dir present but no committed files yet: empty frame, not a scan error") {
    // the state a concurrent reader sees while the FIRST append still
    // holds only _temporary content (caught live in the ServerMain demo)
    val dir = java.nio.file.Files.createTempDirectory("store_race").toString
    val store = new Store(spark, dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/data/_temporary"))
    assert(store.data.count() === 0)
    assert(store.data.columns.toSeq === Dp.columns)
  }

  test("maintained rollup_1d equals the daily aggregate of maintained rollup_1h") {
    val dir = java.nio.file.Files.createTempDirectory("store_1d").toString
    val store = new Store(spark, dir)
    val t0 = 1704412800000L
    store.ingest(mkDp((0 until 30).map(i =>
      ("d1.m", s"h${i % 2}", t0 + i * 2 * H, i.toDouble, i.toLong))))
    store.ingest(mkDp(Seq(("d1.m", "h0", t0 + 50 * H, 99.0, 100L))))
    val fromStore = store.rollup1d.orderBy("skey", "wts").collect().toSeq
    val derived = Rollup.rollup1d(store.rollup1h)
      .select("skey", "wts", "cnt", "min", "max", "sum")
      .orderBy("skey", "wts").collect().toSeq
    assert(fromStore === derived && fromStore.nonEmpty)
  }

  test("concurrent ingests from many threads serialize: nothing lost") {
    val dir = java.nio.file.Files.createTempDirectory("store_mt").toString
    val store = new Store(spark, dir)
    val t0 = 1704412800000L
    // 4 writer threads × 3 batches each, distinct series per thread
    val threads = (0 until 4).map { t =>
      new Thread(() => (0 until 3).foreach { b =>
        store.ingest(mkDp(Seq(
          ("mt.m", s"h$t", t0 + b * H, t * 100.0 + b, (t * 10 + b).toLong))))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(store.data.filter(col("metric") === "mt.m").count() === 12)
    // every series got its slice state and rollup rows committed
    assert(store.seriesIndex.filter(col("metric") === "mt.m").count() === 4)
    assert(store.rollup1h.join(
      store.seriesIndex.filter(col("metric") === "mt.m").select("skey"),
      "skey").count() === 12)
  }

  test("incremental metadata equals the full derivation") {
    // 2 series × 3 days with an in-chunk OOO pair, a cross-chunk
    // duplicate timestamp, and a NaN — each marking its slice
    val rows = Seq(
      ("m", "a", 1000L, 1.0, 1L),
      ("m", "a", H + 1000L, 2.0, 2L),
      ("m", "b", 2000L, 5.0, 3L),
      ("m", "a", 500L, 9.0, 4L), // in-chunk OOO (ts < slice hwm)
      ("m", "b", D + 1000L, 6.0, 5L),
      ("m", "a", 2 * D + 1000L, 7.0, 6L),
      ("m", "b", D + 500L, Double.NaN, 7L), // NaN marks its slice
      ("m", "a", 2 * D + 2000L, 8.0, 8L),
      ("m", "b", 2 * D + 100L, 4.0, 9L),
      ("m", "a", H + 1000L, 3.0, 10L)) // cross-chunk duplicate ts (day 0)
    val all = mkDp(rows)
    val root = java.nio.file.Files.createTempDirectory("store_spec").toString
    val st = new Store(spark, root)
    // three seq-ordered ingest batches
    Seq(
      rows.filter(_._5 <= 4),
      rows.filter(r => r._5 > 4 && r._5 <= 7),
      rows.filter(_._5 > 7)).foreach(ch => st.ingest(mkDp(ch)))

    val marks = st.oooMarks.as[(String, Long)].collect().toSet
    val truth = Rollup.oooSlices(all).as[(String, Long)].collect().toSet
    assert(marks === truth)
    assert(truth.contains(("m,host=a", 0L))) // OOO + duplicate
    assert(truth.contains(("m,host=b", D))) // NaN
    assert(!truth.exists(_._2 == 2 * D)) // day 2 clean

    // maintained rollup == batch rollup over all rows (NaN-poisoned
    // slices compared via the marks assertion above; NaN != NaN)
    val cols = Seq("skey", "wts", "cnt", "min", "max", "sum")
    val r1h = st.rollup1h.filter(!isnan(col("sum")))
      .select(cols.map(col): _*)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    val r1hTruth = Rollup.rollup1h(all).filter(!isnan(col("sum")))
      .select(cols.map(col): _*)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    assert(r1h === r1hTruth)

    val ix = st.seriesIndex.select("skey", "metric")
      .as[(String, String)].collect().toSet
    assert(ix === Set(("m,host=a", "m"), ("m,host=b", "m")))

    assert(st.data.count() === rows.size)
  }

  test("randomized: incremental state equals full derivation (fixed seed)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      val host = s"h${rnd.nextInt(4)}"
      val ts = rnd.nextInt(3) * D + rnd.nextInt(86400) * 1000L
      val v = if (rnd.nextInt(40) == 0) Double.NaN else rnd.nextDouble() * 100
      ("m", host, ts, v, i.toLong)
    }
    val all = mkDp(rows)
    val root = java.nio.file.Files.createTempDirectory("store_rand").toString
    val st = new Store(spark, root)
    rows.grouped(75).foreach(ch => st.ingest(mkDp(ch.toSeq)))

    val marks = st.oooMarks.as[(String, Long)].collect().toSet
    val truth = Rollup.oooSlices(all).as[(String, Long)].collect().toSet
    assert(marks === truth)
    assert(truth.nonEmpty) // random OOO data actually exercised marking

    val cols = Seq("skey", "wts", "cnt", "min", "max", "sum")
    val r1h = st.rollup1h.filter(!isnan(col("sum")))
      .select(cols.map(col): _*)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    val r1hTruth = Rollup.rollup1h(all).filter(!isnan(col("sum")))
      .select(cols.map(col): _*)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    assert(r1h === r1hTruth)
  }

  test("routed query from maintained metadata: no window over raw, equals truth") {
    val base = (0 until 48).map(i => ("m", "a", i * H + 500L, i.toDouble, 100L + i))
    val late = Seq(("m", "a", 10 * H + 500L, 99.0, 1000L)) // dup ts, later batch
    val root = java.nio.file.Files.createTempDirectory("store_routed").toString
    val st = new Store(spark, root)
    st.ingest(mkDp(base))
    st.ingest(mkDp(late))

    val q = TsQuery(0L, 2 * D)
    val sub = SubQuery("m", "none", Some("6h-avg"))
    val routed = Planner.planRouted(st.data, q, sub, st.plannerOptions())
    // with maintained marks the routed plan must NOT re-derive OOO state
    // (a window-sort over the raw day span)
    val plan = routed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"routed plan re-derives OOO marks:\n$plan")

    val got = routed.select("skey", "ts", "value")
      .as[(String, Long, Double)].collect().toSet
    val truth = Planner.planSub(st.data, q, sub)
      .select("skey", "ts", "value")
      .as[(String, Long, Double)].collect().toSet
    assert(got === truth)

    // the stale stored rollup alone would answer the dirty slice wrong —
    // the maintained mark + raw fallback is what makes `got` correct
    val stale = Rollup.downsampleFromRollup(st.rollup1h, 6 * H, "avg")
      .filter(col("ts").between(0L, 2 * D))
      .select("skey", "ts", "value")
      .as[(String, Long, Double)].collect().toSet
    assert(stale !== truth)
  }

  test("concurrent reads during ingest commits: metadata complete, data monotone") {
    val root = java.nio.file.Files.createTempDirectory("store_conc").toString
    // gcGraceMs = 0: this test asserts the GC floor (2 manifests); the
    // grace window has its own test below
    val st = new Store(spark, root, compactEveryBatches = 0, gcGraceMs = 0L)
    st.ingest(mkDp(Seq(("m", "a", 1000L, 1.0, 1L)))) // day 0 committed
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    @volatile var stop = false
    @volatile var lastDataCount = 0L
    val reader = new Thread(() => {
      while (!stop) {
        try {
          // manifest commit: the rollup/state tables must never lose day 0
          val r = st.rollup1h.count()
          if (r < 1) failures.add(s"rollup1h read saw $r rows")
          val sMarks = st.oooMarks.count() // may be 0 (clean data) — just no throw
          require(sMarks >= 0)
          // append-only data: counts never go backwards
          val d = st.data.count()
          if (d < lastDataCount) failures.add(s"data count went $lastDataCount -> $d")
          lastDataCount = d
        } catch {
          case e: Throwable => failures.add(s"read threw: ${e.getMessage}")
        }
      }
    })
    reader.start()
    try {
      (2 to 10).foreach { i =>
        st.ingest(mkDp(Seq(("m", "a", 1000L + i * 7, i.toDouble, i.toLong))))
      }
    } finally { stop = true; reader.join() }
    assert(failures.isEmpty, failures.toArray.mkString("; "))
    assert(lastDataCount > 0)
    // generations are GC'd: at most 2 manifests + their dirs remain
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/rollup_1h"))
      .map(_.getPath.getName).count(_.startsWith("manifest."))
    assert(manifests <= 2)
  }

  test("GC grace: a frame resolved before later commits stays readable") {
    val root = java.nio.file.Files.createTempDirectory("store_grace").toString
    val st = new Store(spark, root) // default grace (10 min)
    st.ingest(mkDp(Seq(("m", "a", 1000L, 1.0, 1L))))
    // resolve the manifest NOW (what a long query's plannerOptions does)
    val held = st.rollup1h
    val before = held.count()
    // several more commits supersede that generation
    (2 to 6).foreach(i => st.ingest(mkDp(Seq(("m", "a", 1000L + i, i.toDouble, i.toLong)))))
    // the held frame still reads its generation dirs — grace keeps them
    assert(held.count() >= before)
  }

  test("dataForRange prunes to the queried days' files") {
    val D = graft.rollup.Rollup.DayMs
    val root = java.nio.file.Files.createTempDirectory("store_range").toString
    val st = new Store(spark, root, compactEveryBatches = 0)
    // ten days of data, one point per day
    (0 until 10).foreach(i =>
      st.ingest(mkDp(Seq(("m", "a", i * D + 1000L, i.toDouble, i.toLong)))))
    // file-level pruning with ±1-day slack: the window's rows are all
    // present; the row-level ts filter is the planner's job downstream
    val pruned = st.dataForRange(5 * D, 6 * D)
    val got = pruned.select("value").as[Double].collect().toSet
    assert(Set(5.0, 6.0).subsetOf(got) && got.subsetOf(Set(4.0, 5.0, 6.0, 7.0)))
    // the scan's file list is the window's days (±1 slack), not all ten
    val scanned = pruned.queryExecution.sparkPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }).sum
    assert(scanned <= 4, s"expected <= 4 files scanned, got $scanned")
  }

  test("compaction swap: a pre-swap reader still reads; data unchanged") {
    val root = java.nio.file.Files.createTempDirectory("store_swap").toString
    val st = new Store(spark, root, compactEveryBatches = 0) // manual compact
    (0 until 6).foreach(i =>
      st.ingest(mkDp(Seq(("m", "a", 1000L + i, i.toDouble, i.toLong)))))
    val held = st.data // resolves the pre-compaction manifest
    val before = held.count()
    st.compactDay("1970-01-01")
    // grace keeps the superseded small files readable for the held frame
    assert(held.count() === before)
    // and a fresh read resolves the dense file with identical content
    assert(st.data.count() === before)
    assert(st.data.select("ts", "value").as[(Long, Double)].collect().toSet ===
      (0 until 6).map(i => (1000L + i, i.toDouble)).toSet)
  }

  test("auto-compaction keeps data file count bounded with results unchanged") {
    val root = java.nio.file.Files.createTempDirectory("store_compact").toString
    // gcGraceMs = 0: the assertion counts physical files, so superseded
    // ones must go immediately rather than after the grace window
    val st = new Store(spark, root, compactEveryBatches = 5, gcGraceMs = 0L)
    val rows = (0 until 20).map(i => ("m", "a", 1000L + i, i.toDouble, i.toLong))
    rows.grouped(1).foreach(ch => st.ingest(mkDp(ch.toSeq)))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/data/date=1970-01-01"))
      .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    // 20 single-row appends, compacted every 5 batches: the newest
    // manifest holds one dense file; the always-kept previous manifest
    // still references its generation (<= 1 dense + 5 appends) until the
    // next commit supersedes it — bounded at 7 either way, not 20
    assert(files <= 7, s"expected <= 7 files after compaction cadence, got $files")
    val got = st.data.select("ts", "value").as[(Long, Double)].collect().toSet
    assert(got === rows.map(r => (r._3, r._4)).toSet)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the simhash auto-radius path. Lives under
  * tools/ (NOT on sbt's source path — it is harness scaffolding, not
  * product); to run it, copy into src/main/scala/graft/ temporarily:
  *   PROBE_BENCH_ONLY=1 PROBE_GATE=<gate> sbt "runMain graft.ProbeNd <sfDir>"
  */
object ProbeNd {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/dev/shm/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("PROBE_PARFIRST", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("PROBE_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val secs = (for (a <- si.submissionTime; b <- si.completionTime)
              yield (b - a) / 1000.0).getOrElse(-1.0)
            if (secs > 1.0) println(
              f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
              f"secs=$secs%.1f ${si.name.takeWhile(_ != '\n').take(70)}")
          }
        })
    if (sys.env.contains("PROBE_CACHE_INPUTS"))
      Seq("events", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$dir/$t.parquet").cache().count()
      }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    if (sys.env.contains("PROBE_BENCH_ONLY")) {
      val gate = sys.env.getOrElse("PROBE_GATE", "pl_neardup_edit")
      timed(s"$gate warmup (cold)") {
        val w = SparkEntry.queries(gate)(spark, dir)
        w.count(); w.unpersist(true)
      }
      val reps = sys.env.getOrElse("PROBE_REPS", "1").toInt
      for (r <- 1 to reps) {
        System.gc()
        timed(s"$gate timed run $r") {
          val df = SparkEntry.queries(gate)(spark, dir)
          println(s"[probe] rows=${df.count()}"); df.unpersist(true)
          if (sys.env.contains("PROBE_EXPLAIN"))
            println("[plan]\n" + df.queryExecution.executedPlan.toString)
        }
      }
      spark.stop(); return
    }
    val sh = timed("simhash+persist") {
      val x = graft.pipeline.Dedup.simhash(d, 60)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val n = sh.count()
    println(s"[probe] n=$n budget=${64L * n}")
    def candMass(chunks: Int): Long = {
      val width = 60 / chunks
      sh.select(explode(array((0 until chunks).map(c =>
          struct(lit(c).as("c"),
            shiftright(col("simhash"), c * width)
              .bitwiseAND((1L << width) - 1).as("v"))): _*)).as("ck"))
        .groupBy(col("ck.c"), col("ck.v")).agg(count(lit(1)).as("b"))
        .agg(coalesce(sum(shiftright(col("b") * (col("b") - 1), 1)), lit(0L)))
        .head().getLong(0)
    }
    for (c <- Seq(4, 3, 2))
      timed(s"candMass($c)") { println(s"[probe]   mass($c)=${candMass(c)}") }
    val pairs = timed("simhashPairsAuto total") {
      val p = graft.pipeline.Dedup.simhashPairsAuto(d)
      println(s"[probe]   verified candidates=${p.count()}")
      p
    }
    timed("editVerify") {
      val v = graft.pipeline.Dedup.editVerify(d,
        pairs.select(col("id1"), col("id2")))
      println(s"[probe]   edit-verified rows=${v.count()}")
      if (sys.env.contains("PROBE_EXPLAIN"))
        println("[plan]\n" + v.queryExecution.executedPlan.toString)
    }
    timed("gate fn (exact bench shape)") {
      val df = SparkEntry.queries("pl_neardup_edit")(spark, dir)
      println(s"[probe]   gate rows=${df.count()}")
    }
    // bench sequence: warmup run + unpersist(true), then timed run
    timed("bench-shaped warmup") {
      val w = SparkEntry.queries("pl_neardup_edit")(spark, dir)
      w.count(); w.unpersist(true)
    }
    timed("bench-shaped timed run") {
      val df = SparkEntry.queries("pl_neardup_edit")(spark, dir)
      df.count(); df.unpersist(true)
    }
    spark.stop()
  }
}

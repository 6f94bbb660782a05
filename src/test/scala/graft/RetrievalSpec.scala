package graft

import graft.pipeline.Retrieval
import org.apache.spark.sql.functions._

/** Semantic checks for the sparse-retrieval operators (BM25, Dunning
  * G² distinctive terms, winnowing fingerprints) — properties of the
  * algorithms, not oracle mirrors (the DuckDB differential covers the
  * exact numbers via pl_bm25 / pl_source_terms / pl_winnow).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("bm25: doc matching more query terms outranks partial match") {
    val docs = docsDF(
      1L -> "spark shuffle join window agg",
      2L -> "spark only here plus filler words and more filler",
      3L -> "completely unrelated text about nothing relevant")
    val qs = Seq(("q1", "spark join window")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(docs, qs, k = 3).orderBy("rank").collect()
    assert(out.head.getAs[Long]("doc_id") == 1L)
    // doc 3 shares no term: absent entirely
    assert(!out.map(_.getAs[Long]("doc_id")).contains(3L))
    // scores strictly ordered by rank (quantized; ties broken by id)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    out.foreach(r => assert(r.getAs[Double]("score") > 0))
  }

  test("bm25: length normalization prefers the shorter doc at equal tf") {
    val filler = Seq.fill(60)("x").mkString(" ")
    val docs = docsDF(
      1L -> "needle alpha beta",
      2L -> s"needle $filler")
    val qs = Seq(("q", "needle")).toDF("qid", "qtext")
    val top = Retrieval.bm25TopK(docs, qs, k = 1).collect()
    assert(top.head.getAs[Long]("doc_id") == 1L)
  }

  test("distinctiveTerms: group-exclusive token tops its group") {
    val docs = Seq(
      (1L, "uniqA uniqA uniqA common common", "g1"),
      (2L, "common common filler words here", "g1"),
      (3L, "uniqB uniqB uniqB common common", "g2"),
      (4L, "common common other stuff around", "g2"))
      .toDF("doc_id", "text", "source")
    val out = Retrieval.distinctiveTerms(docs, groupCol = "source", k = 2)
    val top = out.filter(col("rank") === 1)
      .select("source", "token").as[(String, String)].collect().toMap
    assert(top("g1") == "uniqA" && top("g2") == "uniqB")
    // every reported term is overrepresented in its group
    out.select("llr").as[Double].collect().foreach(v => assert(v > 0))
  }

  test("winnowing guarantee: shared run of w+n-1 tokens shares a fingerprint") {
    // n=3, w=4 → any common substring of ≥6 tokens must yield a common
    // fingerprint (Schleimer et al. theorem), regardless of context
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = docsDF(
      1L -> s"one two three $shared four five six",
      2L -> s"red green blue $shared yellow purple")
    val fp = Retrieval.winnowFingerprints(docs, n = 3, w = 4)
    val f1 = fp.filter(col("doc_id") === 1).select("fp").as[Long].collect().toSet
    val f2 = fp.filter(col("doc_id") === 2).select("fp").as[Long].collect().toSet
    assert((f1 & f2).nonEmpty)
  }

  test("winnowing: fingerprint set is smaller than the gram set") {
    val text = (1 to 200).map(i => s"tok${i % 37}").mkString(" ")
    val docs = docsDF(1L -> text)
    val nGrams = 200 - 2
    val nFp = Retrieval.winnowFingerprints(docs, n = 3, w = 4).count()
    assert(nFp < nGrams / 2) // ~1/w density expected, allow slack
    assert(nFp > 0)
  }

  test("ewma: finite, and a constant series yields the constant") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_ewma")(spark, dir)
    assert(out.count() > 0)
    out.limit(50).collect().foreach { r =>
      val e = r.getAs[Double]("ewma")
      assert(!e.isNaN && !e.isInfinite)
    }
    // the same integer-weight EWMA over a constant series is exactly the
    // constant: Σ c·w_i / Σ w_i = c for any weights
    import org.apache.spark.sql.expressions.Window
    val d = Seq.tabulate(20)(i => ("s", i.toLong, 7.25)).toDF("skey", "ts", "value")
    val w = Window.partitionBy(col("skey")).orderBy(col("ts"))
      .rowsBetween(-15, Window.currentRow)
    val n = size(col("l"))
    def pw(base: Double, e: org.apache.spark.sql.Column) =
      round(pow(lit(base), e.cast("double"))).cast("long")
    val num = aggregate(transform(sequence(lit(1), n),
      i => element_at(col("l"), i) * pw(3.0, n - i) * pw(4.0, i - 1)),
      lit(0L), (a, x) => a + x)
    val den = aggregate(transform(sequence(lit(1), n),
      i => pw(3.0, n - i) * pw(4.0, i - 1)), lit(0L), (a, x) => a + x)
    val ew = d.withColumn("q", floor(col("value") * 10000 + 0.5).cast("long"))
      .withColumn("l", collect_list(col("q")).over(w))
      .select((num.cast("double") / den.cast("double") / 10000.0).as("e"))
      .as[Double].collect()
    ew.foreach(e => assert(math.abs(e - 7.25) < 1e-12))
  }

  test("cms: estimate never undershoots; collisions only inflate") {
    import graft.pipeline.Sketches
    val docs = docsDF(
      1L -> "aa aa aa aa bb bb cc dd ee ff gg hh ii jj",
      2L -> "aa bb bb cc cc cc dd kk ll mm nn oo pp qq")
    // width 4 forces collisions among 17 distinct tokens
    val tight = Sketches.cmsHeavyHitters(docs, k = 17, depth = 2, width = 4)
      .collect()
    tight.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("cnt"),
        s"CMS undershot: $r")
    }
    // and with collisions this tight, at least one estimate must inflate
    assert(tight.exists(r => r.getAs[Long]("est") > r.getAs[Long]("cnt")))
    // a wide sketch over a tiny vocabulary is exact
    val wide = Sketches.cmsHeavyHitters(docs, k = 17, depth = 4, width = 4096)
      .collect()
    wide.foreach(r =>
      assert(r.getAs[Long]("est") == r.getAs[Long]("cnt"), s"collision: $r"))
  }

  test("hll: estimate within sketch error of the true cardinality") {
    import graft.pipeline.Sketches
    // 5000 distinct keys against m=256 registers → raw-HLL branch;
    // theoretical σ = 1.04/√256 ≈ 6.5%, assert a generous 20%
    val keys = (1 to 5000).map(i => ("g", s"key$i")).toDF("grp", "k")
    val est = Sketches.hllDistinct(keys, "k", "grp")
      .collect().head.getAs[Double]("est")
    assert(math.abs(est - 5000) / 5000 < 0.20, s"estimate $est")
    // deterministic: same input → bit-identical estimate
    val est2 = Sketches.hllDistinct(keys, "k", "grp")
      .collect().head.getAs[Double]("est")
    assert(est == est2)
    // small cardinality → linear-counting branch, near-exact
    val small = (1 to 30).map(i => ("g", s"k$i")).toDF("grp", "k")
    val se = Sketches.hllDistinct(small, "k", "grp")
      .collect().head.getAs[Double]("est")
    assert(math.abs(se - 30) < 3, s"linear-counting estimate $se")
  }

  test("holt forecast: constant series projects the constant; ramp keeps climbing") {
    val const = (1 to 40).map(i => ("s1", i.toLong, 7.5))
    val ramp = (1 to 40).map(i => ("s2", i.toLong, i.toDouble))
    val df = (const ++ ramp).toDF("skey", "ts", "value")
    val out = graft.query.Forecast.holtLinear(df, horizons = 3)
      .collect().map(r => (r.getString(0), r.getAs[Long]("h"),
        r.getAs[Double]("forecast")))
    val c = out.filter(_._1 == "s1").sortBy(_._2).map(_._3)
    assert(c.forall(v => math.abs(v - 7.5) < 1e-9), s"constant drifted: ${c.toSeq}")
    val rFc = out.filter(_._1 == "s2").sortBy(_._2).map(_._3)
    // trend learned: projections strictly increase and sit beyond the
    // smoothed level (which lags the last raw value ≈ 40)
    assert(rFc(0) < rFc(1) && rFc(1) < rFc(2), s"ramp not climbing: ${rFc.toSeq}")
    assert(rFc(2) - rFc(0) > 0.5, s"trend too flat: ${rFc.toSeq}")
  }

  test("holt-winters: seasonal cycle tracked; short series emits nothing") {
    // period-4 sawtooth around a flat level: 10, 12, 10, 8, repeating
    val cyc = (0 until 40).map(i =>
      ("s1", i.toLong, Seq(10.0, 12.0, 10.0, 8.0)(i % 4)))
    val short = (1 to 3).map(i => ("s2", i.toLong, 5.0))
    val df = (cyc ++ short).toDF("skey", "ts", "value")
    val out = graft.query.Forecast.holtWinters(df, period = 4, horizons = 4)
      .collect().map(r => (r.getString(0), r.getAs[Long]("h"),
        r.getAs[Double]("forecast")))
    assert(!out.exists(_._1 == "s2"), "sub-period series must emit nothing")
    val f = out.filter(_._1 == "s1").sortBy(_._2).map(_._3)
    // last observation is i=39 (phase 3, value 8); the next four steps
    // continue the cycle: 10, 12, 10, 8 (within smoothing tolerance)
    val want = Seq(10.0, 12.0, 10.0, 8.0)
    f.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 0.5, s"cycle lost: ${f.toSeq} vs $want")
    }
  }

  test("sax: square wave maps to alternating extreme symbols") {
    // two hourly buckets low, two high, repeating: word should swing
    // between 'a'/'b' (below mean) and 'c'/'d' (above)
    val h = 3600000L
    val rows = (0 until 8).map { i =>
      val v = if ((i / 2) % 2 == 0) 1.0 else 9.0
      ("s1", i * h + 5L, v)
    }
    val df = rows.toDF("skey", "ts", "value")
    val out = graft.query.Forecast.sax(df, bucketMs = h).collect()
    assert(out.length === 1)
    val word = out.head.getAs[String]("sax")
    assert(out.head.getAs[Long]("n_seg") === 8L)
    assert(word.matches("[ab]{2}[cd]{2}[ab]{2}[cd]{2}"), s"word=$word")
  }

  test("cusum: level shift alarms, stable series never does") {
    val stable = (1 to 60).map(i => ("s1", i.toLong, 10.0 + (i % 2) * 0.2))
    val shifted = (1 to 30).map(i => ("s2", i.toLong, 10.0 + (i % 2) * 0.2)) ++
      (31 to 60).map(i => ("s2", i.toLong, 14.0 + (i % 2) * 0.2))
    val df = (stable ++ shifted).toDF("skey", "ts", "value")
    val out = graft.query.Forecast.cusum(df).collect()
      .map(r => (r.getString(0), r.getAs[Long]("ts"), r.getAs[Boolean]("alarm")))
    assert(!out.exists(r => r._1 == "s1" && r._3), "stable series alarmed")
    val alarms = out.filter(r => r._1 == "s2" && r._3).map(_._2)
    assert(alarms.nonEmpty && alarms.min > 30,
      s"shift at 31 should alarm after it, got ${alarms.sorted.take(5).toSeq}")
  }

  test("textRank: a word linked from many contexts outranks a leaf") {
    // "hub" follows five different words; each "leaf_i" appears once.
    // Edges: leaf_i -> hub (x5), hub -> tail
    val docs = (1 to 5).map(i => (i.toLong, s"leaf$i hub tail"))
      .toDF("doc_id", "text")
    val r = graft.pipeline.Retrieval.textRank(docs, iters = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("leaf1"), s"hub should outrank a leaf: $r")
    // tail is fed by hub alone but hub is heavy; leaf has only teleport
    assert(r("tail") > r("leaf1"), s"hub's successor should beat a leaf: $r")
    // integer-grid ranks: a rerun is bit-identical
    val r2 = graft.pipeline.Retrieval.textRank(docs, iters = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r === r2)
  }

  test("sourceOverlap: identical vocabularies score 1, disjoint pairs absent") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "gamma alpha beta", "s2"),
      (3L, "delta epsilon", "s3"),
      (4L, "alpha zeta", "s4")).toDF("doc_id", "text", "source")
    val r = graft.pipeline.Retrieval.sourceOverlap(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getAs[Long]("n_common"), x.getAs[Double]("jaccard"))).toMap
    assert(r(("s1", "s2")) === ((3L, 1.0)), s"same vocab = jaccard 1: $r")
    // s1 ∩ s4 = {alpha}; union = {alpha,beta,gamma,zeta} → 1/4
    assert(r(("s1", "s4")) === ((1L, 0.25)))
    assert(!r.keySet.exists(p => p._1 == "s3" || p._2 == "s3"),
      "disjoint source must not pair")
  }

  test("pmi: a bigram that always co-occurs beats one with independent parts") {
    // "tightly coupled" appears only together; "loose"/"parts" also occur
    // apart, diluting their PMI
    val coupled = Seq.fill(6)("tightly coupled").mkString(" . ")
    val diluted = Seq.fill(6)("loose parts").mkString(" ") +
      " loose loose loose parts parts parts"
    val docs = docsDF(1L -> coupled, 2L -> diluted)
    val out = Retrieval.pmiCollocations(docs, k = 10, minCount = 5)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Double]("pmi"))).toSeq
    val tc = out.find(p => p._1 == "tightly" && p._2 == "coupled").get._3
    val lp = out.find(p => p._1 == "loose" && p._2 == "parts").get._3
    assert(tc > lp, s"coupled pmi $tc should beat diluted $lp")
  }

  test("dsir: docs sharing the target slice's vocabulary rank first") {
    // target = source "tgt"; doc 3 shares its bigrams, doc 4 does not
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta", "tgt"),
      (2L, "beta gamma alpha beta gamma delta", "tgt"),
      (3L, "alpha beta gamma delta epsilon", "pool"),
      (4L, "nine ten eleven twelve thirteen", "pool"))
      .toDF("doc_id", "text", "source")
    val out = Retrieval.dsirWeights(docs, col("source") === "tgt", k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight"))
      .toMap
    assert(out(3L) > out(4L),
      s"target-like doc ${out(3L)} should outweigh off-target ${out(4L)}")
    // target members themselves score at least as high as the off-target doc
    assert(out(1L) > out(4L) && out(2L) > out(4L))
  }

  test("q_histogram gate: bin counts total the table and bins are bounded") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_histogram")(spark, dir).collect()
    val total = out.map(_.getAs[Long]("n")).sum
    val nRows = spark.read.parquet(s"$dir/events.parquet").count()
    assert(total == nRows)
    out.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= 0 && b <= 19)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 statistical analytics gates —
  * the hash-exactness lives in the DuckDB oracle; these pin the math
  * properties a refactor could silently break.
  */
class SeriesAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // sf0.01: the cross-metric joins and the held-out-day backtest need
  // denser series than sf0.001 provides (n ≥ 8 joint buckets per entity)
  private val sf = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_ols_fit: R² bounded in [0,1], every series reported once") {
    val r = run("q_ols_fit").select($"skey", $"r2").as[(String, Double)].collect()
    assert(r.nonEmpty)
    assert(r.map(_._1).distinct.length === r.length, "one row per series")
    r.foreach { case (k, r2) =>
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"$k r2=$r2")
    }
  }

  test("q_xcorr and q_spearman: coefficients bounded in [-1,1], same keys") {
    val px = run("q_xcorr").select($"tkey", $"r").as[(String, Double)].collect()
    val ps = run("q_spearman").select($"tkey", $"rho").as[(String, Double)].collect()
    assert(px.nonEmpty && ps.nonEmpty)
    (px.map(_._2) ++ ps.map(_._2)).foreach(v =>
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
    // both correlate the same (view, click) entity pairs
    assert(px.map(_._1).sorted.toSeq === ps.map(_._1).sorted.toSeq)
  }

  test("q_kendall: tau bounded, counts consistent, keys match spearman") {
    val r = run("q_kendall")
      .select($"tkey", $"n0", $"nc", $"nd", $"tau")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, n0, nc, nd, tau) =>
      assert(nc + nd <= n0, s"$k: concordant+discordant exceed pairs")
      assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9, s"$k tau=$tau")
      // tau-b numerator sign is the concordance majority
      assert((nc == nd) == (math.abs(tau) < 1.0) || math.signum(tau) ==
        math.signum((nc - nd).toDouble), s"$k sign drifted")
    }
    val ps = run("q_spearman").select($"tkey").as[String].collect()
    assert(r.map(_._1).sorted.toSeq === ps.sorted.toSeq,
      "kendall and spearman must correlate the same entity pairs")
  }

  test("q_stl: seasonal component is constant per (series, phase)") {
    val r = run("q_stl")
      .select($"skey", $"ts", $"seasonal", $"resid")
      .as[(String, Long, Double, Double)].collect()
    assert(r.nonEmpty)
    // seasonal is a per-(series, phase) mean — every bucket of the same
    // phase must carry the identical value; residuals absorb the rest
    val T0s = 1704412800L // gate window start, seconds
    val sixHs = 21600L
    r.groupBy(t => (t._1, ((t._2 - T0s) / sixHs) % 4)).foreach {
      case ((k, ph), rows) =>
        assert(rows.map(_._3).distinct.length === 1,
          s"$k phase $ph has non-constant seasonal")
    }
    // and residuals must center near zero within each phase group (the
    // phase mean was subtracted; tolerance covers the 1e-1 grid and
    // the 1e-4 output rounding)
    r.groupBy(t => (t._1, ((t._2 - T0s) / sixHs) % 4)).foreach {
      case ((k, ph), rows) =>
        val rbar = rows.map(_._4).sum / rows.length
        assert(math.abs(rbar) < 0.01, s"$k phase $ph resid mean $rbar")
    }
  }

  test("q_changepoint: split partitions the bucket count, means differ") {
    val bk = run("q_changepoint")
      .select($"skey", $"n_left", $"n_right", $"mean_left", $"mean_right")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(bk.nonEmpty)
    bk.foreach { case (k, nl, nr, _, _) =>
      assert(nl >= 1 && nr >= 1, s"$k split degenerate")
      assert(nl + nr >= 8, s"$k total below the gate's n floor")
    }
  }

  test("q_dtw: bounded above by the diagonal (Euclidean-aligned) path") {
    import org.apache.spark.sql.functions._
    val r = run("q_dtw").select($"skey", $"dtw").as[(String, Long)].collect().toMap
    assert(r.nonEmpty)
    assert(r.values.forall(_ >= 0))
    // recompute the two hourly profiles independently and check
    // DTW(a,b) ≤ Σ|aᵢ−bᵢ| — the band always contains the diagonal path
    val T0 = 1704412800000L
    val d2 = T0 + 2 * 86400000L
    val bk = graft.model.Dp.withSeriesKey(
      graft.model.DpView.dp(spark, sf)
        .filter(col("metric") === "view" && col("ts") >= T0 && col("ts") < d2))
      .groupBy(col("skey"), col("ts"))
      .agg(max_by(col("value"), col("seq")).as("value"))
      .withColumn("q", floor(col("value") * 10000 + 0.5 + 1e-6).cast("long"))
      .groupBy(col("skey"), expr(s"(ts - ${T0}) div 3600000").as("slot"))
      .agg(sum(col("q")).as("sq_"))
      .select(col("skey"), col("slot"), expr("sq_ div 100").as("b"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    bk.foreach { case (k, rows) =>
      val m = rows.map(t => t._2 -> t._3).toMap
      val diag = (0 until 24).map(i =>
        math.abs(m.getOrElse(i.toLong, 0L) - m.getOrElse((i + 24).toLong, 0L))).sum
      r.get(k).foreach(d => assert(d <= diag, s"$k dtw $d > diagonal $diag"))
    }
  }

  test("q_value_drift: JS bounded in [0, ln2], halves counted fully") {
    val r = run("q_value_drift")
      .select($"skey", $"n1", $"n2", $"js")
      .as[(String, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, n1, n2, js) =>
      assert(n1 > 0 && n2 > 0, s"$k empty half")
      assert(js >= -1e-4 && js <= math.log(2.0) + 1e-4,
        s"$k js=$js outside [0, ln2]")
    }
  }

  test("q_matrix_profile: exclusion zone honored, distances non-negative") {
    val r = run("q_matrix_profile")
      .select($"skey", $"ts", $"d2", $"nn_ts")
      .as[(String, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, ts, d2, nn) =>
      assert(d2 >= 0, s"$k d2 negative")
      assert(math.abs(nn - ts) >= 2 * 21600L, s"$k trivial-match neighbor")
    }
    // one profile row per subsequence position
    assert(r.map(t => (t._1, t._2)).distinct.length === r.length)
  }

  test("q_snaive_eval: winner column agrees with the reported sMAPEs") {
    val r = run("q_snaive_eval")
      .select($"skey", $"smape_snaive", $"smape_naive", $"winner")
      .as[(String, Double, Double, String)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, ss, sn, w) =>
      assert(ss >= 0 && ss <= 2.0 + 1e-9 && sn >= 0 && sn <= 2.0 + 1e-9,
        s"$k sMAPE out of [0,2]")
      // winner is decided on the unrounded integer sums; the rounded
      // columns can tie while the sums differ, so only check the
      // strict-inequality direction
      if (ss < sn) assert(w === "snaive", s"$k $ss < $sn but winner=$w")
      if (ss > sn) assert(w === "naive", s"$k $ss > $sn but winner=$w")
    }
  }

  test("q_apdex: score on the per-10k grid, counts partition n") {
    val r = run("q_apdex")
      .select($"skey", $"n", $"sat", $"tol", $"apdex_pm")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, n, sat, tol, pm) =>
      assert(sat + tol <= n, s"$k counts exceed n")
      assert(pm >= 0 && pm <= 10000, s"$k apdex_pm=$pm out of range")
      assert(pm === (2 * sat + tol) * 10000 / (2 * n), s"$k formula drift")
    }
  }

  test("q_burn_rate: rolling window bounds the 1h burn, alert = AND") {
    val r = run("q_burn_rate")
      .select($"tkey", $"tot", $"err", $"burn1_pm", $"burn6_pm", $"alert")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, tot, err, b1, b6, a) =>
      assert(err <= tot, s"$k err > tot")
      assert(b1 >= 0 && b1 <= 40000, s"$k burn1 out of [0, 4x]")
      assert(b6 >= 0 && b6 <= 40000, s"$k burn6 out of [0, 4x]")
      assert(a === (if (b1 > 10000 && b6 > 10000) 1L else 0L),
        s"$k alert flag disagrees with the two windows")
    }
    // some buckets must alert and some not, or the gate tests nothing
    assert(r.exists(_._6 == 1L) && r.exists(_._6 == 0L))
  }

  test("q_benford: 9 digits per metric, frequencies sum to ~1000") {
    val r = run("q_benford")
      .select($"metric", $"digit", $"freq_pm", $"dev_pm", $"exp_pm")
      .as[(String, Int, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (m, rows) =>
      assert(rows.map(_._2).sorted.toSeq ===
        (rows.map(_._2).min to 9).toSeq.takeRight(rows.length),
        s"$m digits not a contiguous run ending at 9")
      val s = rows.map(_._3).sum
      // integer floor-division loses < 1 per digit
      assert(s > 1000 - 9 && s <= 1000, s"$m freq sum $s")
      rows.foreach { case (_, _, f, dev, e) => assert(dev === f - e) }
    }
  }

  test("q_movers: exactly 5 ranked rows, |delta| non-increasing") {
    val r = run("q_movers")
      .select($"rank", $"prev_mean", $"cur_mean", $"delta")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length === 5)
    assert(r.map(_._1).toSeq === (1L to 5L).toSeq)
    r.foreach { case (_, pm, m, d) => assert(d === m - pm) }
    assert(r.map(t => math.abs(t._4)).sliding(2)
      .forall(w => w(0) >= w(1)), "movers not sorted by |delta|")
  }

  test("q_retention: day-0 retention is exactly 100%, rates bounded") {
    val r = run("q_retention")
      .select($"cohort", $"k", $"n_active", $"n_cohort", $"ret_pm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (c, k, na, nc, pm) =>
      assert(k >= 0 && na <= nc, s"cohort $c k=$k active exceeds cohort")
      assert(pm >= 0 && pm <= 10000, s"cohort $c rate out of range")
      if (k == 0) assert(pm === 10000, s"cohort $c day-0 not 100%")
    }
  }

  test("q_transitions: per-source rows partition the source total") {
    val r = run("q_transitions")
      .select($"cur", $"nxt", $"cnt", $"p_pm")
      .as[(String, String, Long, Long)].collect()
    assert(r.nonEmpty)
    r.groupBy(_._1).foreach { case (cur, rows) =>
      val s = rows.map(_._4).sum
      // floor division loses < 1 per target row
      assert(s > 10000 - rows.length && s <= 10000, s"$cur shares sum $s")
    }
  }

  test("q_funnel: stages strictly ordered, conversion consistent") {
    val r = run("q_funnel")
      .select($"stage", $"n_users", $"conv_pm")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length === 3)
    assert(r(0)._2 >= r(1)._2 && r(1)._2 >= r(2)._2,
      "funnel must narrow at every stage")
    assert(r(0)._3 === 10000)
    assert(r(1)._3 === r(1)._2 * 10000 / r(0)._2)
    assert(r(2)._3 === r(2)._2 * 10000 / r(1)._2)
  }

  test("q_seasonal_strength: bounded in [0,1], covers the STL series") {
    val r = run("q_seasonal_strength")
      .select($"skey", $"f_seasonal").as[(String, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, f) =>
      assert(f >= 0.0 && f <= 1.0 + 1e-9, s"$k f_seasonal=$f")
    }
    assert(r.map(_._1).distinct.length === r.length)
  }

  test("q_trimmed_mean: robust level sits inside the untrimmed range") {
    val r = run("q_trimmed_mean")
      .select($"skey", $"n", $"k", $"tmean")
      .as[(String, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (key, n, k, tm) =>
      assert(k === n / 10, s"$key trim count drifted")
      assert(tm > 0, s"$key all-positive values, mean must be positive")
      assert(n - 2 * k >= 1, s"$key nothing left after trimming")
    }
  }

  test("q_percentile_band: band ordered p10 <= p50 <= p90, 4 slots max") {
    val r = run("q_percentile_band")
      .select($"skey", $"slot", $"p10", $"p50", $"p90")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, slot, p10, p50, p90) =>
      assert(slot >= 0 && slot <= 3, s"$k slot $slot out of range")
      assert(p10 <= p50 && p50 <= p90, s"$k band not ordered")
    }
  }

  test("q_rolling_corr: bounded coefficients, full windows only") {
    val r = run("q_rolling_corr")
      .select($"tkey", $"ts", $"r").as[(String, Long, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, _, v) =>
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"$k r=$v")
    }
    // one row per (entity, bucket)
    assert(r.map(t => (t._1, t._2)).distinct.length === r.length)
  }

  test("q_pacf: lag-1 PACF equals lag-1 ACF, all lags bounded") {
    val p = run("q_pacf")
      .select($"skey", $"pacf1", $"pacf2", $"pacf3", $"pacf4")
      .as[(String, Double, Double, Double, Double)].collect()
    assert(p.nonEmpty)
    val acf1 = run("q_acf").filter($"k" === 1)
      .select($"skey", $"r").as[(String, Double)].collect().toMap
    p.foreach { case (k, f1, f2, f3, f4) =>
      Seq(f1, f2, f3, f4).foreach(f =>
        assert(math.abs(f) <= 1.0 + 1e-6, s"$k pacf out of [-1,1]: $f"))
      // φ₁₁ = ρ₁ by construction (2e-4 covers the two rounding grids)
      assert(math.abs(f1 - acf1(k)) < 2e-4, s"$k pacf1 ${f1} != acf ${acf1(k)}")
    }
  }

  test("q_gini: bounded in [0,1), uniform values score 0") {
    val r = run("q_gini").select($"metric", $"gini").as[(String, Double)]
      .collect()
    assert(r.nonEmpty)
    r.foreach { case (m, g) => assert(g >= 0.0 && g < 1.0, s"$m gini=$g") }
    // identity on a hand frame: n equal values => G = (2*Σi*q -(n+1)Σq)/(nΣq)
    // = (2*(n(n+1)/2)*q - (n+1)*n*q) / (n*n*q) = 0
    val n = 7L
    val siq = (1L to n).map(_ * 50L).sum
    assert(2.0 * siq - (n + 1) * n * 50L === 0.0)
  }

  test("q_gini siq accumulator: decimal sum exact where a long sum wraps") {
    // the Σi·q aggregation shape from q_gini (SeriesAnalytics): products
    // near int64 max must accumulate exactly (DuckDB promotes to HUGEINT;
    // a bigint sum would wrap silently)
    val rows = Seq((1L, 4000000000000000000L), (2L, 4000000000000000000L),
      (3L, 1234567890123456789L))
    val got = rows.toDF("i", "q")
      .agg(sum($"i".cast("decimal(19,0)") * $"q".cast("decimal(19,0)"))
        .as("siq"))
      .select($"siq".cast("string")).as[String].head()
    val want = rows.map { case (i, q) => BigInt(i) * BigInt(q) }.sum
    assert(BigInt(got) === want)
    assert(want > BigInt(Long.MaxValue)) // a long accumulator WOULD wrap
  }
}

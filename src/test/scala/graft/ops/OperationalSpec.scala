package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.functions._

/** Specs for the operational module: properties the DuckDB oracle
  * cannot express — plan shape (no multi-distinct Expand), internal
  * consistency (histogram counts sum to the table count), and
  * result-equality of the incremental/salted constructions against
  * their direct formulations computed in the SAME engine.
  */
class OperationalSpec extends SparkSpec {

  test("q_profile plans without a multi-distinct Expand") {
    val df = SparkEntry.queries("q_profile")(spark, sf())
    val expands = df.queryExecution.executedPlan.collect {
      case e: ExpandExec => e
    }
    assert(expands.isEmpty,
      "profile must run one single-distinct agg per column, not one " +
        "multi-distinct agg through Expand")
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getAs[Long]("n_distinct") > 0))
    assert(rows.forall(r => r.getAs[Long]("n_null") == 0L))
  }

  test("q_histogram buckets are clamped and counts sum to the table") {
    val hist = SparkEntry.queries("q_histogram")(spark, sf()).collect()
    assert(hist.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 19
    })
    val total = hist.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, sf()).count())
  }

  test("q_incr_agg partial-merge equals the direct aggregation") {
    val incr = SparkEntry.queries("q_incr_agg")(spark, sf())
    val direct = Tables.orders(spark, sf())
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
          .as("total_price"))
    assert(incr.exceptAll(direct).isEmpty && direct.exceptAll(incr).isEmpty)
  }

  test("q_funnel stages partition the viewing users") {
    val rows = SparkEntry.queries("q_funnel")(spark, sf()).collect()
    assert(rows.forall { r =>
      val s = r.getAs[Int]("funnel_stage"); s >= 1 && s <= 3
    })
    val nViewers = Tables.events(spark, sf())
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nViewers)
  }

  test("q_cohort: offset-0 diagonal covers every user exactly once") {
    val rows = SparkEntry.queries("q_cohort")(spark, sf()).collect()
    assert(rows.forall(_.getAs[Int]("day_offset") >= 0))
    val diag = rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(_.getAs[Long]("n_active")).sum
    val nUsers = Tables.events(spark, sf())
      .select(col("user_id")).distinct().count()
    assert(diag == nUsers, "every user is active on their cohort day")
  }

  test("q_anomaly flags only values beyond 3 standard deviations") {
    val rows = SparkEntry.queries("q_anomaly")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("value") - r.getAs[Double]("mean"))
        > 3.0 * r.getAs[Double]("sd"))
    }
  }

  test("q_skew_join equals the plain join rollup") {
    val salted = SparkEntry.queries("q_skew_join")(spark, sf())
    val plain = Tables.lineitem(spark, sf())
      .join(Tables.supplier(spark, sf()),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q_changepoint equals the Scala-side CUSUM argmax") {
    val daily = Tables.events(spark, sf())
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)")
        .as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (tpe, rows) =>
      val xs = rows.sortBy(_._2.toEpochDay).map(r => (r._2, r._3))
      val total = BigInt(xs.map(_._2).sum)
      val n = BigInt(xs.length)
      var prefix = BigInt(0)
      val scored = xs.zipWithIndex.dropRight(1).map { case ((day, x), i) =>
        prefix += x
        (day, i + 1, n * prefix - BigInt(i + 1) * total)
      }
      val (day, idx, s) =
        scored.maxBy { case (d, _, sv) => (sv.abs, -d.toEpochDay) }
      // s >= 0 ⇒ pre-segment above the overall mean ⇒ level steps DOWN
      (tpe, day, idx, xs.length,
        if (s >= 0) "down" else "up", (s.abs / 10000).toLong)
    }.toSet
    val got = SparkEntry.queries("q_changepoint")(spark, sf())
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getInt(2),
        r.getInt(3), r.getString(4), r.getLong(5)))
      .toSet
    assert(got == expected)
  }

  test("q_benford covers digits 1-9 and its ppm shares are coherent") {
    val rows = SparkEntry.queries("q_benford")(spark, sf()).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet == (1 to 9).toSet)
    // The baked-in Benford expectation is a proper ppm distribution.
    assert(rows.map(_.getAs[Long]("exp_ppm")).sum == 1000000L)
    // Floored observed shares sum to 1e6 minus at most 8 ulps of floor.
    val obs = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obs > 1000000L - 9 && obs <= 1000000L)
    assert(rows.forall(r => r.getAs[Long]("dev_ppm") ==
      math.abs(r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm"))))
  }

  test("q_ks equals the Scala-side bucketed two-sample KS") {
    val split = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
    val expected = Tables.events(spark, sf())
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0),
        math.min(math.max(math.floor(r.getDouble(2) / 5.0).toLong, 0L), 19L),
        r.getTimestamp(1).toLocalDateTime.isBefore(split)))
      .groupBy(_._1).map { case (tpe, xs) =>
        val na = xs.count(_._3).toLong
        val nb = xs.size - na
        var cumA = 0L; var cumB = 0L; var dmax = BigInt(0)
        xs.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, cell) =>
          cumA += cell.count(_._3); cumB += cell.count(!_._3)
          val d = (BigInt(cumA) * nb - BigInt(cumB) * na).abs
          if (d > dmax) dmax = d
        }
        (tpe, na, nb, (dmax * 1000000 / (BigInt(na) * nb)).toLong)
      }.toSet
    val got = SparkEntry.queries("q_ks")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("ks_ppm"))).toSet
    assert(got == expected)
  }

  test("q_gini equals the Scala-side binned Lorenz computation") {
    val spends = Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (_, xs) =>
        (xs.map(_._2).sum * 100).toBigInt
      }.toSeq
    val buckets = spends.groupBy(c => (c / 2500000L).min(19).toLong)
      .toSeq.sortBy(_._1)
    var cum = BigInt(0); var lorenz = BigInt(0)
    buckets.foreach { case (_, xs) =>
      val si = xs.sum; cum += si
      lorenz += BigInt(xs.size) * (2 * cum - si)
    }
    val n = BigInt(spends.size); val total = spends.sum
    val expGini = ((n * total - lorenz) * 1000000 / (n * total)).toLong
    val r = SparkEntry.queries("q_gini")(spark, sf()).collect().head
    assert(r.getAs[Long]("n_customers") == spends.size.toLong)
    assert(r.getAs[Long]("total_c") == total.toLong)
    assert(r.getAs[Long]("gini_ppm") == expGini)
  }

  test("q_concurrency equals the Scala-side interval sweep") {
    val iv = Tables.events(spark, sf())
      .select(col("user_id"), col("ts")).collect()
      .map { r =>
        val t = r.getTimestamp(1).toLocalDateTime
        ((r.getLong(0), t.toLocalDate), t.getHour * 60L + t.getMinute)
      }
      .groupBy(_._1).map { case ((u, day), xs) =>
        (day, xs.map(_._2).min, xs.map(_._2).max)
      }
    val expected = iv.groupBy(_._1).map { case (day, xs) =>
      val deltas = xs.flatMap { case (_, mIn, mOut) =>
        Seq(mIn -> 1L, (mOut + 1) -> -1L)
      }.groupBy(_._1).map { case (m, ds) => m -> ds.map(_._2).sum }
        .toSeq.sortBy(_._1)
      var occ = 0L; var best = Long.MinValue; var bestMin = -1L
      deltas.foreach { case (m, dl) =>
        occ += dl
        if (occ > best) { best = occ; bestMin = m }
      }
      (day, best, bestMin)
    }.toSet
    val got = SparkEntry.queries("q_concurrency")(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getAs[Long]("max_concurrent"),
        r.getAs[Long]("at_minute"))).toSet
    assert(got == expected)
  }

  test("q_l_diversity partitions all customers and avoids Expand") {
    val df = SparkEntry.queries("q_l_diversity")(spark, sf())
    val expands = df.queryExecution.executedPlan.collect {
      case e: ExpandExec => e
    }
    assert(expands.isEmpty, "single-distinct agg must not plan an Expand")
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum ==
      Tables.customer(spark, sf()).count())
    assert(rows.forall { r =>
      val l = r.getAs[Long]("l")
      l >= 1 && r.getAs[Boolean]("at_risk") == (l < 3)
    })
  }

  test("q_time_to_convert equals the Scala recompute and covers all viewers") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (_, xs) =>
      val views = xs.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val v = views.min
        val ps = xs.filter(x => x._2 == "purchase" && x._3 > v).map(_._3)
        Some(if (ps.isEmpty) -1L
        else math.min((ps.min - v) / 3600000000L, 72L))
      }
    }.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val got = SparkEntry.queries("q_time_to_convert")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    val nViewers = ev.filter(_._2 == "view").map(_._1).distinct.length
    assert(got.values.sum == nViewers.toLong)
  }

  test("q_bootstrap replicas match the Scala draw and calibrate to the SE") {
    val P = 1000000007L
    val cents = Tables.orders(spark, sf())
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def weight(k: Long, r: Long): Long = {
      val q = ((k % P) * 747796405L + r * 40503L) % P
      val u = ((q * q + q) % P) % 1000000L
      if (u < 367879) 0L else if (u < 735759) 1L
      else if (u < 919699) 2L else 3L
    }
    val expected = (1 to 32).map { r =>
      val (wsum, wc) = cents.foldLeft((BigInt(0), BigInt(0))) {
        case ((a, b), (k, c)) =>
          val w = weight(k, r.toLong); (a + w, b + BigInt(w) * c)
      }
      (r, wsum.toLong, (wc / wsum).toLong)
    }.toSet
    val rows = SparkEntry.queries("q_bootstrap")(spark, sf()).collect()
    val got = rows.map(r => (r.getInt(0), r.getAs[Long]("n_eff"),
      r.getAs[Long]("mean_c"))).toSet
    assert(got == expected)
    // calibration: the replicate SD must land within a ±50% band of
    // the theoretical sigma/sqrt(n) standard error (deterministic
    // draw — a fixed value, not a flaky bound; 32 replicas put the
    // SD estimate itself within ~13%, the band is generous).
    val means = rows.map(_.getAs[Long]("mean_c").toDouble)
    val mu = means.sum / means.length
    val sd = math.sqrt(means.map(m => (m - mu) * (m - mu)).sum /
      (means.length - 1))
    val xs = cents.map(_._2.toDouble)
    val xmu = xs.sum / xs.length
    val se = math.sqrt(xs.map(x => (x - xmu) * (x - xmu)).sum /
      (xs.length - 1) / xs.length)
    assert(sd > se * 0.5 && sd < se * 1.5, s"replicate SD $sd vs SE $se")
  }

  test("q_fano equals the Scala-side cleared-denominator dispersion") {
    val daily = Tables.events(spark, sf())
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val expected = daily.groupBy(_._1).collect {
      case (tpe, xs) if xs.length > 1 =>
        val n = BigInt(xs.length); val sx = xs.map(x => BigInt(x._2)).sum
        val sxx = xs.map(x => BigInt(x._2) * x._2).sum
        (tpe, xs.length.toLong, sx.toLong,
          ((n * sxx - sx * sx) * 1000000 / ((n - 1) * sx)).toLong)
    }.toSet
    val got = SparkEntry.queries("q_fano")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_days"),
        r.getAs[Long]("n_events"), r.getAs[Long]("fano_ppm"))).toSet
    assert(got == expected)
  }

  test("q_theil_sen equals the Scala-side pairwise-slope lower median") {
    val daily = Tables.events(spark, sf())
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (tpe, xs) =>
      val slopes = (for {
        (_, di, ci) <- xs; (_, dj, cj) <- xs if di.isBefore(dj)
      } yield {
        val dc = BigInt(cj - ci) * 1000000
        val dd = BigInt(dj.toEpochDay - di.toEpochDay)
        ((dc - dc % dd) / dd).toLong
      }).sorted
      val m = slopes.length
      (tpe, m.toLong, slopes((m + 1) / 2 - 1))
    }.toSet
    val got = SparkEntry.queries("q_theil_sen")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("slope_ppm_med"))).toSet
    assert(got == expected)
  }

  test("q_kaplan_meier equals the Scala product-limit recompute") {
    val days = Tables.events(spark, sf())
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDay = days.map(_._2).max
    val durs = days.groupBy(_._1).values.map { es =>
      val ds = es.map(_._2)
      val (fd, ld) = (ds.min, ds.max)
      val churned = ld <= maxDay - 14
      (churned, if (churned) (ld - fd) / 7 else (maxDay - fd) / 7)
    }.toSeq
    val byWeek = durs.groupBy(_._2)
    var atRisk = durs.size.toLong
    var s = 0L
    val expected = scala.collection.mutable.ListBuffer
      .empty[(Long, Long, Long, Long, Long)]
    var t = 0L
    var stop = false
    while (t <= 12 && !stop) {
      if (atRisk <= 0) stop = true
      else {
        val d = byWeek.getOrElse(t, Nil).count(_._1).toLong
        val c = byWeek.getOrElse(t, Nil).count(!_._1).toLong
        s = (if (t == 0) 1000000L else s) * (atRisk - d) / atRisk
        expected += ((t, atRisk, d, c, s))
        atRisk -= d + c
        t += 1
      }
    }
    val got = SparkEntry.queries("q_kaplan_meier")(spark, sf()).collect()
      .map(r => (r.getAs[Long]("week"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_churned"), r.getAs[Long]("n_censored"),
        r.getAs[Long]("s_ppm"))).toSet
    assert(got == expected.toSet)
    // survival is monotone nonincreasing in ppm
    val curve = expected.map(_._5)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a })
  }

  test("q_rfm tiles replicate ntile(5) and partition all customers") {
    val rfm = SparkEntry.queries("q_rfm")(spark, sf()).collect()
    val nCustomers = Tables.orders(spark, sf())
      .select(col("o_custkey")).distinct().count()
    assert(rfm.map(_.getAs[Long]("n_customers")).sum == nCustomers)
    // each tile dimension splits the population into near-equal fifths
    for (dim <- Seq("r_tile", "f_tile", "m_tile")) {
      val byTile = rfm.groupBy(_.getAs[Int](dim)).view
        .mapValues(_.map(_.getAs[Long]("n_customers")).sum)
      assert(byTile.keySet == Set(1, 2, 3, 4, 5))
      val sizes = byTile.values.toSeq
      assert(sizes.max - sizes.min <= 1,
        s"$dim tiles uneven: $byTile")
    }
  }

  test("tsPairsTopK guard: wide frames reroute through word blocking") {
    import spark.implicits._
    // Synthetic ranked frame: many windows in two distinct coarse
    // shapes. Shape A (ascending ranks by idx) and shape B
    // (descending). Within a shape, windows are rank-identical
    // (footrule 0); across shapes the footrule is large.
    val nA = 6; val nB = 6
    val rows =
      (0 until nA).flatMap(i => (0 until 7).map(idx =>
        (f"A$i%03d", idx, idx + 1))) ++
      (0 until nB).flatMap(i => (0 until 7).map(idx =>
        (f"B$i%03d", idx, 7 - idx)))
    val ranked = rows.toDF("w", "idx", "r")

    // Exact path (threshold above the window count): global top-k may
    // freely pair across shapes.
    val exact = Operational.tsPairsTopK(ranked, 1000,
      maxExactWindows = 100).collect()
    assert(exact.exists(r =>
      r.getAs[String]("win_a").startsWith("A") &&
        r.getAs[String]("win_b").startsWith("B")),
      "exact path must include cross-shape pairs")

    // Guarded path (threshold below the window count): the reroute
    // fires, candidate pairs come only from word-equal blocks — no
    // cross-shape pair can appear no matter how large k is.
    val blocked = Operational.tsPairsTopK(ranked, 1000,
      maxExactWindows = 4).collect()
    assert(blocked.nonEmpty)
    assert(blocked.forall(r =>
      r.getAs[String]("win_a").charAt(0) ==
        r.getAs[String]("win_b").charAt(0)),
      "guarded path must pair only within word-equal blocks")
    // Within-block distances are exact: identical windows score 0.
    assert(blocked.forall(_.getAs[Long]("footrule") == 0L))
    // All within-block pairs survive the block join: C(6,2) per shape.
    assert(blocked.length == 2 * (nA * (nA - 1) / 2))

    // On the within-block pairs the two paths agree exactly.
    val exactWithin = exact.filter(r =>
      r.getAs[String]("win_a").charAt(0) ==
        r.getAs[String]("win_b").charAt(0))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val blockedSet =
      blocked.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(blockedSet == exactWithin)
  }

  test("ab test: chi2 past the naive 38-digit bound stays exact") {
    import spark.implicits._
    // 10 M subjects per arm with a 4.5% -> 7.0% conversion lift — the
    // regime where the OLD single-product n*(ad-bc)^2*1e6 crossed 38
    // digits and coalesced to a silent chi2=0 / "not significant".
    // The split division must report the exact integer chi2 (computed
    // independently in BigInt below), which is decisively significant.
    val (na, ca, nb, cb) = (10000000L, 450000L, 10000000L, 700000L)
    val cells = Seq((na, ca, nb, cb))
      .toDF("n_a", "conv_a", "n_b", "conv_b")
    val r = Operational.abTestFromCells(cells).collect().head
    val d = BigInt(ca) * (nb - cb) - BigInt(na - ca) * cb
    val den = BigInt(na) * nb * (ca + cb) * ((na - ca) + (nb - cb))
    val expected = BigInt(na + nb) * d * d * 1000000 / den
    assert(expected > 0 && expected > 3841459L) // meaningfully significant
    // the old formulation's product really is out of decimal range
    assert((BigInt(na + nb) * d * d * 1000000).toString.length > 38)
    assert(r.getAs[Long]("chi2_ppm") == expected.toLong)
    assert(r.getAs[Boolean]("significant"))
    assert(r.getAs[Long]("rate_a_ppm") == ca * 1000000L / na)
  }
}

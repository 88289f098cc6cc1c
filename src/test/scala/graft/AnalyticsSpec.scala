package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.sources.Tables

/** Plan + semantics pins for the behavioural-analytics operators
  * (their exactness is oracle-gated; these pin the one-scan shapes and
  * the invariants the oracle's single numbers don't spell out).
  */
class AnalyticsSpec extends SparkTestBase {

  test("funnel_stages: ONE scan, ONE data shuffle; stage counts monotone") {
    val df = Analytics.funnelStages(spark, sf)
    val row = df.collect()(0)
    val plan = planOf(df).split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(scans === 1, s"per-stage self-joins would re-scan; got $scans scans")
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash === 1, s"stage mins must share the user_id shuffle, got $hash")
    val Seq(users, v, c, p) = (0 to 3).map(row.getLong)
    assert(users >= v && v >= c && c >= p && p >= 0,
      s"funnel must be monotone: $users >= $v >= $c >= $p")
    assert(v > 0, "corpus has view events; stage 1 cannot be empty")
  }

  test("cohort_retention: offset-0 row equals the cohort's size exactly") {
    // every cohort member is by definition active in their first year
    val df = Analytics.cohortRetention(spark, sf)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val offset0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    val cohorts = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(min(year(col("o_orderdate"))).as("cy"))
      .groupBy(col("cy")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(offset0 === cohorts,
      s"offset-0 actives must equal cohort sizes: $offset0 vs $cohorts")
    // no activity can precede the cohort year, and none beyond the span
    assert(rows.forall(r => r._2 >= 0L && r._3 > 0L))
  }

  test("analytics_mom: monthly revenue conserves the total; pct recomputes from pairs") {
    val rows = Analytics.mom(spark, sf).collect()
    // lag chain: prev_revenue is exactly the previous row's revenue
    for (i <- 1 until rows.length)
      assert(rows(i).getDouble(2) === rows(i - 1).getDouble(1),
        s"row $i prev_revenue must chain")
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3), "first month has no prior")
    for (i <- 1 until rows.length) {
      val (cur, prev) = (rows(i).getDouble(1), rows(i).getDouble(2))
      val expect = BigDecimal((cur - prev) / prev * 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rows(i).getDouble(3) - expect) < 1e-9, s"row $i pct")
    }
    // month rollup conserves the corpus total exactly (decimal sums)
    val total = BigDecimal(rows.map(r => BigDecimal(r.getDouble(1))).sum.toString)
    val direct = graft.sources.Tables.orders(spark, sf)
      .select(sum(col("o_totalprice").cast("decimal(18,2)")))
      .collect()(0).getDecimal(0)
    assert(total === BigDecimal(direct), "monthly rollup must conserve revenue")
  }

  test("analytics_ttest: full pair grid; t recomputes from per-type moments") {
    val got = Analytics.ttest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val vals = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2) }
    assert(got.size === vals.size * (vals.size - 1) / 2)
    def mo(x: Iterable[Double]) = {
      val n = x.size; val m = x.sum / n
      (n, m, x.map(v => (v - m) * (v - m)).sum / (n - 1))
    }
    for (((ta, tb), (na, nb, t, df)) <- got) {
      val (n1, m1, v1) = mo(vals(ta)); val (n2, m2, v2) = mo(vals(tb))
      assert(na === n1.toLong && nb === n2.toLong)
      val se = v1 / n1 + v2 / n2
      assert(math.abs(t - (m1 - m2) / math.sqrt(se)) < 1e-4, s"($ta,$tb) t")
      val dfExpect = se * se /
        (v1 / n1 * (v1 / n1) / (n1 - 1) + v2 / n2 * (v2 / n2) / (n2 - 1))
      assert(math.abs(df - dfExpect) < 1e-3, s"($ta,$tb) df $df vs $dfExpect")
      assert(df > 0 && df <= (n1 + n2 - 2).toDouble + 1e-9,
        "Welch df is positive and bounded by the pooled df")
    }
  }

  test("analytics_skyline: frontier = exact non-dominated set; strict staircase") {
    val sky = Analytics.skyline(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    assert(sky.nonEmpty)
    // soundness: no frontier point dominates another frontier point
    for (a <- sky; b <- sky if a != b)
      assert(!(a._1 <= b._1 && a._2 <= b._2 && (a._1 < b._1 || a._2 < b._2)),
        s"$a dominates $b inside the frontier")
    // completeness: every candidate is dominated by (or IS) a frontier point
    val all = graft.sources.Tables.part(spark, sf)
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    for (p <- all)
      assert(sky.exists(s => s._1 <= p._1 && s._2 <= p._2),
        s"candidate $p escapes the frontier")
    // the min-min frontier is a strictly decreasing staircase
    val sorted = sky.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(x, y) => assert(x._1 < y._1 && x._2 > y._2,
        s"staircase violated: $x then $y")
      case _ => ()
    }
  }

  test("analytics_skyline sweep runs over the collapsed per-price aggregate, one scan") {
    val plan = planOf(Analytics.skyline(spark, sf)).split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("part"))
    assert(scans === 1, s"dominance self-joins would re-scan; got $scans:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"skyline must never be the O(n²) dominance join:\n$plan")
  }

  test("analytics_markov: rows normalize to 1; transition count conservation") {
    val rows = Analytics.markov(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, rs) =>
      val pSum = rs.map(_._4).sum
      assert(math.abs(pSum - 1.0) < 1e-4,
        s"row $from sums to $pSum, not 1 (round-6 grain)")
    }
    // each user with n events contributes exactly n-1 transitions
    val ev = graft.sources.Tables.events(spark, sf)
    val n = ev.count()
    val users = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_._3).sum === n - users,
      s"transition conservation: ${rows.map(_._3).sum} != $n - $users")
  }

  test("analytics_markov pairs via ONE lag window, not a consecutive-row self-join") {
    val plan = planOf(Analytics.markov(spark, sf)).split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(scans === 1, s"successor pairing must not re-scan; got $scans")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"lag formulation has no join at all:\n$plan")
  }

  test("analytics_cohort_ltv: cumulative chains; cohort totals conserve corpus revenue") {
    val rows = Analytics.cohortLtv(spark, sf).collect()
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.values.foreach { rs =>
      val s = rs.sortBy(_.getLong(1))
      var cum = BigDecimal(0)
      s.foreach { r =>
        cum += BigDecimal(r.getDouble(2))
        assert(BigDecimal(r.getDouble(3)) === cum, "cum_revenue chains")
      }
    }
    // all cohorts' final cum sums to the corpus total revenue exactly
    val total = byCohort.values
      .map(rs => BigDecimal(rs.maxBy(_.getLong(1)).getDouble(3))).sum
    val direct = graft.sources.Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .head.getDecimal(0)
    assert(total === BigDecimal(direct), "revenue conservation")
  }

  test("analytics_basket: pair counts match a brute-force items self-join; measures recompute") {
    val rows = Analytics.basket(spark, sf).collect()
    assert(rows.nonEmpty, "corpus orders share brands; pairs cannot be empty")
    // brute force: the naive self-join formulation the operator avoids
    val items = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expectPairs = byOrder.values.flatMap(b =>
      for (i <- b.indices; j <- i + 1 until b.size) yield (b(i), b(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotPairs = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gotPairs === expectPairs, "co-occurrence counts must be exact")
    // measure identities: support·N = n_co, confidence·n_a = n_co,
    // lift = confidence / (n_b / N)
    val nOrders = byOrder.size.toLong
    val perBrand = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val (a, b, nCo, nA, nB) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nA === perBrand(a) && nB === perBrand(b))
      assert(a < b, "pairs must be canonically ordered, no mirrors")
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) === r6(nCo.toDouble / nOrders.toDouble))
      assert(r.getDouble(6) === r6(nCo.toDouble / nA.toDouble))
      assert(r.getDouble(7) === r6((nCo * nOrders).toDouble / (nA * nB).toDouble))
    }
  }

  test("analytics_basket plan: row-local pair fan-out, no items self-join, no cartesian") {
    val df = Analytics.basket(spark, sf)
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"pair generation must never go cartesian:\n$plan")
    // r12: the pair fan-out lives in the brand_pair_counts artifact
    // BUILD; the declared plan reads the written pair counts (and the
    // per-brand explode stays inside the checkpointed totals build),
    // so the gated plan carries NO Generate at all
    assert(plan.contains("brand_pair_counts_"),
      s"query must read the pair-count artifact:\n$plan")
    val generates = plan.linesIterator.count(_.contains("Generate explode"))
    assert(generates === 0,
      s"no corpus fan-out downstream of the artifact, got $generates:\n$plan")
    // downstream of the materialized artifacts there is NO re-scan of
    // the FACT tables: consumers read the artifacts only
    assert(!plan.contains("lineitem") && !plan.contains("part.parquet"),
      s"consumers must read the basket artifact, not re-derive it:\n$plan")
  }

  test("analytics_rfm: quartile buckets balanced, scores monotone in their measure") {
    val rows = Analytics.rfm(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    // ntile(4) bucket sizes differ by at most one
    for (c <- Seq(4, 5, 6)) {
      val sizes = rows.groupBy(_.getLong(c)).view.mapValues(_.size).toMap
      assert(sizes.keySet === Set(1L, 2L, 3L, 4L), s"col $c buckets: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1, s"col $c skewed: $sizes")
    }
    // strictly more recent ⇒ r_score never lower (ties may split)
    val byRec = rows.sortBy(r => (r.getLong(1), r.getLong(0)))
    for (i <- 1 until n)
      if (byRec(i).getLong(1) > byRec(i - 1).getLong(1))
        assert(byRec(i).getLong(4) <= byRec(i - 1).getLong(4),
          "higher recency_days (staler) must not score higher")
    val byMon = rows.sortBy(r => (r.getDouble(3), r.getLong(0)))
    for (i <- 1 until n)
      if (byMon(i).getDouble(3) > byMon(i - 1).getDouble(3))
        assert(byMon(i).getLong(6) >= byMon(i - 1).getLong(6),
          "higher spend must not score lower")
    // segment is the concatenated scores
    rows.foreach(r => assert(r.getString(7) ===
      s"${r.getLong(4)}${r.getLong(5)}${r.getLong(6)}"))
    assert(rows.forall(_.getLong(1) >= 0), "recency vs corpus max is nonnegative")
  }

  test("analytics_pareto: contiguous minimal prefix crossing 80% exactly once") {
    val rows = Analytics.pareto(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    // ranks are the contiguous prefix 1..K of the revenue-desc order
    assert(rows.map(_.getLong(1)).toSeq === (1L to n).toSeq)
    val revs = rows.map(_.getDouble(2))
    for (i <- 1 until n) assert(revs(i) <= revs(i - 1) + 1e-9,
      "prefix must be revenue-descending")
    // every kept row but the last is strictly below the 80% line;
    // the last kept row is the one that crosses it
    val cum = rows.map(_.getDouble(3))
    for (i <- 0 until n - 1) assert(cum(i) < 80.0, s"row $i cum ${cum(i)}")
    assert(cum(n - 1) >= 80.0 - 1e-6,
      s"last kept row must cross 80%: ${cum(n - 1)}")
    // the 80% of PARTS vs revenue concentration reads directly off K
    val totalParts = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count()
    assert(n < totalParts, "the covering prefix must be a strict subset")
  }

  test("analytics_attribution: purchase and revenue conservation, brute-force channels") {
    val rows = Analytics.attribution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_utc").cast("long").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4)))
    // driver brute force: per purchase, latest strictly-preceding touch
    val brute = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._5, e._2))
      sorted.zipWithIndex.collect {
        case (e, i) if e._3 == "purchase" =>
          val ch = sorted.take(i).reverse
            .find(p => p._3 == "view" || p._3 == "click")
            .map(_._3).getOrElse("direct")
          (ch, e._4)
      }
    }
    val expect = brute.groupBy(_._1).view.mapValues { vs =>
      (vs.size.toLong,
        vs.map(v => BigDecimal(v._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum)
    }.toMap
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (ch, (n, rev)) =>
      assert(rows(ch)._1 === n, s"channel $ch count")
      assert(math.abs(rows(ch)._2 - rev.toDouble) < 1e-9, s"channel $ch revenue")
    }
    // conservation: every purchase is attributed exactly once
    assert(rows.values.map(_._1).sum === ev.count(_._3 == "purchase").toLong)
  }

  test("analytics_churn: ledger identities hold month over month") {
    val rows = Analytics.churn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
    val byYm = rows.map { case ((y, m), v) => (y * 12 + m - 1, v) }.toMap
    val totalCust = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    // every customer is new exactly once
    assert(rows.map(_._2._2).sum === totalCust)
    rows.foreach { case ((y, m), (active, nw, ret, churned)) =>
      val ym = y * 12 + m - 1
      assert(nw + ret <= active, s"$y-$m: new+retained bounded by active")
      byYm.get(ym - 1).foreach { case (prevActive, _, _, _) =>
        assert(ret <= prevActive, s"$y-$m: retained bounded by prev active")
        // prev actives split exactly into retained-here and churned-here
        assert(ret + churned === prevActive,
          s"$y-$m: retained($ret) + churned($churned) must equal prev active($prevActive)")
      }
    }
  }

  test("analytics_stickiness: ratio bounds and day accounting") {
    val rows = Analytics.stickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDays = graft.sources.Tables.events(spark, sf)
      .select(to_date(col("ts_utc"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum === nDays, "weeks partition the days")
    rows.foreach { r =>
      val (avgDau, wau, st) = (r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(avgDau <= wau + 1e-9, "daily actives bounded by weekly actives")
      assert(st > 0.0 && st <= 1.0 + 1e-9, s"stickiness in (0,1]: $st")
      assert(math.abs(st - avgDau / wau) < 2e-6, "ratio consistency")
    }
  }

  test("analytics_conversion_window: brute-force D7 conversion") {
    val r = Analytics.conversionWindow(spark, sf).collect().head
    val (nSign, nConv, rate) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts_utc")))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
      .groupBy(_._1)
    val signers = ev.filter(_._2.exists(_._2 == "signup"))
    assert(nSign === signers.size.toLong)
    val conv = signers.count { case (_, es) =>
      val fs = es.filter(_._2 == "signup").map(_._3).min
      es.exists(e => e._2 == "purchase" && e._3 >= fs &&
        e._3 - fs <= 604800000000L)
    }
    assert(nConv === conv.toLong, "brute-force converted count")
    assert(math.abs(rate - conv.toDouble / signers.size) < 1e-6)
  }

  test("analytics_survival_km: product-limit curve matches brute force, monotone") {
    val rows = Analytics.survivalKm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // brute force from raw purchase events
    val pu = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts_utc")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues { ds =>
        val days = ds.map(_._2)
        (days.min, days.max)
      }.toMap
    val maxDay = pu.values.map(_._2).maxBy(_.toEpochDay)
    val lifetimes = pu.values.toSeq.map { case (f, l) =>
      (l.toEpochDay - f.toEpochDay, l.isBefore(maxDay))
    }
    val n = lifetimes.size
    var survival = 1.0
    var prevRisk = Long.MaxValue
    val byT = lifetimes.groupBy(_._1).toSeq.sortBy(_._1)
    val expect = byT.flatMap { case (t, exits) =>
      val nRisk = n - lifetimes.count(_._1 < t)
      val d = exits.count(_._2)
      if (d > 0) {
        survival *= (nRisk - d).toDouble / nRisk
        Some((t, nRisk.toLong, d.toLong, survival))
      } else None
    }
    assert(rows.length === expect.length)
    rows.zip(expect).foreach { case ((t, nr, d, s), (et, enr, ed, es)) =>
      assert((t, nr, d) === ((et, enr, ed)), s"t=$t exits")
      assert(math.abs(s - es) < 1e-6, s"t=$t survival $s vs $es")
      assert(nr <= prevRisk, "risk set shrinks"); prevRisk = nr
    }
    // the curve is non-increasing and within (0,1]
    assert(rows.sliding(2).forall {
      case Array((_, _, _, a), (_, _, _, b)) => b <= a + 1e-9; case _ => true
    })
    rows.foreach(r => assert(r._4 >= 0.0 && r._4 <= 1.0 + 1e-9))
  }

  test("analytics_elasticity: grouped OLS matches brute force per brand") {
    val rows = Analytics.elasticity(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = graft.sources.Tables.lineitem(spark, sf)
      .join(broadcast(graft.sources.Tables.part(spark, sf)),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(rows.keySet === li.keySet)
    li.foreach { case (brand, ls) =>
      val pts = ls.map(l => (math.log(l._2 / l._3), math.log(l._3)))
      val m = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
      assert(rows(brand)._1 === ls.size.toLong)
      assert(math.abs(rows(brand)._2 - slope) < 1e-4,
        s"$brand slope ${rows(brand)._2} vs brute $slope")
    }
  }

  test("analytics_ab_srm: arms partition the users, chi2 identity holds") {
    val r = Analytics.abSrm(spark, sf).collect().head
    val (n, na, nb, chi2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(na + nb === n, "every user lands in exactly one arm")
    val expect = (na - nb).toDouble * (na - nb) / n
    assert(math.abs(chi2 - expect) < 1e-6, "chi2 = (nA-nB)^2/n for a 50/50 split")
    assert(r.getBoolean(4) === (expect > 3.841), "flag matches the critical value")
    val totalUsers = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(n === totalUsers)
  }

  test("analytics_mutual_info: information-theoretic bounds and brute-force value") {
    val r = Analytics.mutualInfo(spark, sf).collect().head
    val (mi, hx, hy, nmi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(mi >= -1e-9 && mi <= math.min(hx, hy) + 1e-6,
      "0 <= MI <= min(Hx, Hy)")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9, "normalized MI in [0,1]")
    // brute force from the raw events
    val cells = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), floor(hour(col("ts_utc")) / 6.0).cast("long"))
      .collect().map(r2 => (r2.getString(0), r2.getLong(1)))
    val n = cells.length.toDouble
    val jx = cells.groupBy(_._1).view.mapValues(_.length).toMap
    val jy = cells.groupBy(_._2).view.mapValues(_.length).toMap
    val jxy = cells.groupBy(identity).view.mapValues(_.length).toMap
    val bruteMi = jxy.map { case ((x, y), c) =>
      (c / n) * math.log(c * n / (jx(x).toDouble * jy(y).toDouble))
    }.sum
    val bruteHx = jx.values.map(c => -(c / n) * math.log(c / n)).sum
    assert(math.abs(mi - bruteMi) < 2e-6, s"MI $mi vs brute $bruteMi")
    assert(math.abs(hx - bruteHx) < 2e-6, s"Hx $hx vs brute $bruteHx")
  }

  test("analytics_anova: F and eta_sq recompute from brute-force group stats") {
    val row = Analytics.anova(spark, sf).collect()(0)
    val (k, n, f, eta) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    val vals = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val byG = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(k === byG.size.toLong && n === vals.length.toLong)
    val gm = vals.map(_._2).sum / vals.length
    val ssb = byG.values.map { xs =>
      val m = xs.sum / xs.length; xs.length * (m - gm) * (m - gm)
    }.sum
    val ssw = byG.values.map { xs =>
      val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val bruteF = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(f - bruteF) < 1e-4 * (1 + bruteF.abs),
      s"F $f vs brute $bruteF")
    assert(math.abs(eta - ssb / (ssb + ssw)) < 1e-6, s"eta_sq $eta")
    assert(eta >= 0.0 && eta <= 1.0, "eta_sq is a variance share")
  }

  test("analytics_ab_cuped: identities and brute-force theta/diffs") {
    val row = Analytics.abCuped(spark, sf).collect()(0)
    val (nU, nA, nB) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (theta, dRaw, dCuped, vr) = (row.getDouble(3), row.getDouble(4),
      row.getDouble(5), row.getDouble(6))
    assert(nA + nB === nU, "arms partition the users")
    assert(vr >= 0.0 && vr <= 1.0 + 1e-9, "variance reduction is rho^2")
    // brute force per-user pre/post sums + pooled theta from raw events
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts_utc")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    val per = evs.groupBy(_._1).map { case (u, es) =>
      (u, es.filter(_._2 < mid).map(_._3).sum.toDouble,
        es.filter(_._2 >= mid).map(_._3).sum.toDouble)
    }.toSeq
    assert(per.length.toLong === nU)
    val n = per.length.toDouble
    val (sx, sy) = (per.map(_._2).sum, per.map(_._3).sum)
    val sxy = per.map(p => p._2 * p._3).sum
    val sxx = per.map(p => p._2 * p._2).sum
    val bruteTheta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(theta - bruteTheta) < 1e-4 * (1 + bruteTheta.abs),
      s"theta $theta vs brute $bruteTheta")
    def isA(u: Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      hex < "8000"
    }
    val (as, bs) = per.partition(p => isA(p._1))
    assert(as.length.toLong === nA && bs.length.toLong === nB)
    val bruteRaw = bs.map(_._3).sum / bs.length - as.map(_._3).sum / as.length
    val bruteX = bs.map(_._2).sum / bs.length - as.map(_._2).sum / as.length
    assert(math.abs(dRaw - bruteRaw) < 1e-5 * (1 + bruteRaw.abs),
      s"diff_raw $dRaw vs brute $bruteRaw")
    assert(math.abs(dCuped - (bruteRaw - bruteTheta * bruteX)) <
      1e-4 * (1 + dCuped.abs), s"diff_cuped $dCuped")
  }

  test("analytics_ci_bootstrap: CI brackets the mean; replicate means recompute") {
    val row = Analytics.ciBootstrap(spark, sf).collect()(0)
    val (nOrders, nReps) = (row.getLong(0), row.getLong(1))
    val (pt, lo, hi) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(nReps === 100L)
    assert(lo < hi && lo <= pt && pt <= hi,
      s"95% CI [$lo, $hi] should bracket the point mean $pt")
    // brute-force replicates 0..4: exact md5 -> uniform -> Poisson(1)
    val thresholds = Seq(1580030168L, 3160060337L, 3950075421L,
      4213413783L, 4279248373L, 4292415291L)
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    assert(orders.length.toLong === nOrders)
    def u32(key: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 8), 16)
    // full brute force: all 100 replicate means, exact weights
    val bruteMeans = (0 to 99).map { rep =>
      val ws = orders.map { case (k, p) =>
        val u = u32(s"$k:$rep"); (thresholds.count(u >= _), p)
      }
      ws.map { case (w, p) => p * w }.sum.toDouble / ws.map(_._1).sum
    }.sorted
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(lo === r6(bruteMeans(2)), s"ci_lo must be rank-3 of sorted means")
    assert(hi === r6(bruteMeans(97)), s"ci_hi must be rank-98 of sorted means")
    // weight draw sanity: mean weight across a replicate is ~1 (Poisson(1))
    val w0 = orders.map { case (k, _) => thresholds.count(u32(s"$k:0") >= _) }
    val meanW = w0.sum.toDouble / w0.length
    assert(meanW > 0.8 && meanW < 1.2, s"Poisson(1) mean weight, got $meanW")
  }

  test("analytics_did: cells partition the stream; DiD recomputes from means") {
    val row = Analytics.did(spark, sf).collect()(0)
    val counts = (0 to 3).map(row.getLong)
    val means = (4 to 7).map(row.getDouble)
    val didV = row.getDouble(8)
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(counts.sum === total, "the 2x2 cells partition all events")
    assert(counts.forall(_ > 0), "every cell populated on this corpus")
    val expect = (means(3) - means(2)) - (means(1) - means(0))
    assert(math.abs(didV - expect) < 3e-6,
      s"did $didV vs means identity $expect")
    // brute-force one cell: A-arm pre-period count and mean
    def isA(u: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.substring(0, 4) < "8000"
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts_utc")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    val cellAP = evs.filter(e => isA(e._1) && e._2 < mid)
    assert(cellAP.length.toLong === counts(0), "A-pre cell count")
    val bruteMean = cellAP.map(e => BigDecimal(e._3).setScale(2,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / cellAP.length
    assert(math.abs(means(0) - bruteMean) < 1e-6, s"A-pre mean $bruteMean")
  }

  test("analytics_ratio_delta: brute-force ratio + SE; CI symmetric") {
    val row = Analytics.ratioDelta(spark, sf).collect()(0)
    val n = row.getLong(0)
    val (r, se, lo, hi) = (row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4))
    assert(se > 0 && math.abs((hi - r) - (r - lo)) < 3e-6, "CI symmetric")
    val per = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        col("value").cast("decimal(18,2)")).otherwise(lit(0)
        .cast("decimal(18,2)"))).as("y"), count(lit(1)).as("nn"))
      .collect().map(x => (x.getDecimal(1).doubleValue(), x.getLong(2)))
    assert(per.length.toLong === n)
    val nn = per.length.toDouble
    val (sy, sn) = (per.map(_._1).sum, per.map(_._2).sum.toDouble)
    val bruteR = sy / sn
    assert(math.abs(r - bruteR) < 1e-6, s"ratio $r vs $bruteR")
    val varY = (per.map(p => p._1 * p._1).sum - sy * sy / nn) / (nn - 1)
    val covYN = (per.map(p => p._1 * p._2).sum - sy * sn / nn) / (nn - 1)
    val varN = (per.map(p => p._2.toDouble * p._2).sum - sn * sn / nn) /
      (nn - 1)
    val muN = sn / nn
    val bruteSe = math.sqrt(
      (varY - 2 * bruteR * covYN + bruteR * bruteR * varN) /
        (nn * muN * muN))
    assert(math.abs(se - bruteSe) < 1e-6 * (1 + bruteSe), s"se $se vs $bruteSe")
  }

  test("analytics_auc: equals the brute-force P(pos > neg) + tie credit") {
    val row = Analytics.auc(spark, sf).collect()(0)
    val (nPos, nNeg, nScores, aucV) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val scored = graft.sources.Tables.embeddings(spark, sf)
      .select((col("label") === 0), col("embedding")).collect()
      .map { r =>
        val s = BigDecimal(r.getSeq[Float](1).head.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getBoolean(0), s)
      }
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    assert(nPos === pos.length.toLong && nNeg === neg.length.toLong)
    assert(nScores === scored.map(_._2).distinct.length.toLong)
    // literal definition: P(score_pos > score_neg) + 0.5 P(tie)
    var wins = 0.0
    for (p <- pos; q <- neg)
      wins += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val brute = wins / (pos.length.toDouble * neg.length)
    assert(math.abs(aucV - brute) < 1e-6, s"auc $aucV vs brute $brute")
    assert(aucV >= 0.0 && aucV <= 1.0)
    // plan guard: no per-row global sort — the rank rides the
    // collapsed distinct-score frame
    val plan = planOf(Analytics.auc(spark, sf))
    assert(!plan.contains("rank(") && !plan.contains("row_number("),
      s"AUC must not rank per-row:\n$plan")
  }

  test("analytics_power_mde: n recomputes; monotone decreasing in MDE") {
    val rows = Analytics.powerMde(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(0.01, 0.02, 0.05, 0.10))
    // larger detectable effect -> smaller required sample, ~1/delta^2
    assert(rows.map(_._5).sliding(2).forall {
      case Array(a, b) => a > b; case _ => true
    }, "n_per_arm must decrease with MDE")
    val per = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        col("value").cast("decimal(18,2)")).otherwise(lit(0)
        .cast("decimal(18,2)"))).as("y"))
      .collect().map(_.getDecimal(1).doubleValue())
    val n = per.length.toDouble
    val mu = per.sum / n
    val v = per.map(x => (x - mu) * (x - mu)).sum / (n - 1)
    rows.foreach { case (mde, nUsers, bm, sd, nArm) =>
      assert(nUsers === per.length.toLong)
      assert(math.abs(bm - mu) < 1e-5 * (1 + mu), s"baseline mean")
      assert(math.abs(sd - math.sqrt(v)) < 1e-4 * (1 + math.sqrt(v)))
      val expect = math.ceil(16.0 * v / (mde * mu * (mde * mu))).toLong
      assert(nArm === expect, s"mde $mde: n_per_arm $nArm vs $expect")
    }
  }

  test("analytics_calibration: bins partition; rates recompute; coverage") {
    val rows = Analytics.calibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    val nPos = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("label") === 0).count()
    assert(rows.map(_._2).sum === total, "bins partition all vectors")
    assert(rows.map(_._3).sum === nPos, "positives conserved")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9), "bin ids clamped")
    rows.foreach { case (bin, n, np, _, rate) =>
      // rate is ROUND-6 in the query; compare at half-ulp of that scale
      assert(math.abs(rate - np.toDouble / n) < 5e-7, s"bin $bin rate")
    }
    // edge bins are non-empty by construction (min and max exist)
    assert(rows.map(_._1).contains(0L) && rows.map(_._1).contains(9L))
  }

  test("analytics_funnel_windowed: monotone, dominated by the open funnel") {
    val row = Analytics.funnelWindowed(spark, sf).collect()(0)
    val Seq(users, v, c, p) = (0 to 3).map(row.getLong)
    assert(users >= v && v >= c && c >= p && p >= 0, "windowed funnel monotone")
    val open = Analytics.funnelStages(spark, sf).collect()(0)
    assert(v === open.getLong(1), "stage 1 has no window constraint")
    assert(c <= open.getLong(2) && p <= open.getLong(3),
      "the 72h window can only REMOVE conversions vs the open funnel")
    // brute-force stage-2 count
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts_utc"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val win = 72L * 3600 * 1000000
    val byUser = evs.groupBy(_._1)
    val brute2 = byUser.values.count { es =>
      val tv = es.filter(_._2 == "view").map(_._3).minOption
      val tc = es.filter(_._2 == "click").map(_._3).minOption
      (tv, tc) match {
        case (Some(a), Some(b)) => b > a && b - a <= win
        case _ => false
      }
    }
    assert(c === brute2.toLong, s"stage 2 windowed count $c vs $brute2")
  }

  test("analytics_gains: deciles partition users; cumulative gain reaches 1") {
    val rows = Analytics.gains(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq === (1L to 10L).toSeq, "ten deciles")
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum === nUsers, "deciles partition the users")
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "NTILE balance")
    rows.foreach { case (d, n, resp, rate, _) =>
      assert(resp <= n, s"decile $d responders bounded")
      assert(math.abs(rate - resp.toDouble / n) < 5e-7, s"decile $d rate")
    }
    // cumulative gain is nondecreasing and ends at exactly 1
    assert(rows.map(_._5).sliding(2).forall {
      case Array(a, b) => b >= a - 1e-12; case _ => true
    })
    assert(math.abs(rows.last._5 - 1.0) < 1e-9, "all responders captured")
  }

  test("analytics_seasonal_index: indices average to 1 under month weights") {
    val rows = Analytics.seasonalIndex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === (1L to 12L).toSeq, "all twelve months")
    // sum over months of n_years*month_avg = total revenue = overall_avg
    // * total month-cells, so the n_years-weighted mean index is 1
    val cells = rows.map(_._2).sum.toDouble
    val weighted = rows.map(r => r._2 * r._4).sum / cells
    assert(math.abs(weighted - 1.0) < 1e-5,
      s"weighted mean index must be 1, got $weighted")
    assert(rows.forall(_._4 > 0), "indices positive")
    // brute force one month from raw orders
    val ym = graft.sources.Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getDecimal(2).doubleValue()))
    val m3 = ym.filter(_._2 == 3)
    val avg3 = m3.map(_._3).sum / m3.length
    val got3 = rows.find(_._1 == 3L).get
    assert(got3._2 === m3.length.toLong, "march year count")
    assert(math.abs(got3._3 - avg3) < 1e-4 * (1 + avg3), "march avg")
  }

  test("analytics_lead_time: brute-force percentiles per priority") {
    val rows = Analytics.leadTime(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    val joined = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")),
          to_date(col("o_orderdate"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byP = joined.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { case (prio, n, mean, p50, p90) =>
      val ds = byP(prio)
      assert(n === ds.length.toLong, s"$prio line count")
      assert(math.abs(mean - ds.sum.toDouble / ds.length) < 1e-6)
      // nearest-rank from the integer selection rules
      val b50 = ds(math.max(0, math.ceil(ds.length / 2.0).toInt - 1))
      val b90 = ds(math.max(0, math.ceil(ds.length * 9 / 10.0).toInt - 1))
      assert(p50 === b50, s"$prio p50 $p50 vs $b50")
      assert(p90 === b90, s"$prio p90 $p90 vs $b90")
      assert(p50 <= p90, s"$prio percentile order")
      // note: the synthetic corpus does NOT maintain ship >= order
      // (negative lead times exist) — the operator reports what is
    }
  }

  test("analytics_rolling_retention: brute-force day-7 lookback") {
    val rows = Analytics.rollingRetention(spark, sf).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toEpochDay,
        r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val act = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts_utc"))).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    val byDay = act.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val maxDay = act.map(_._2).max
    rows.foreach { case (day, nAct, nRet, retention) =>
      val users = byDay(day)
      assert(nAct === users.size.toLong, s"day $day actives")
      val later = byDay.getOrElse(day + 7, Set.empty[Long])
      assert(nRet === (users intersect later).size.toLong, s"day $day retained")
      if (day + 7 <= maxDay) {
        assert(retention.isDefined, s"day $day inside the window")
        assert(math.abs(retention.get - nRet.toDouble / nAct) < 5e-7)
      } else assert(retention.isEmpty,
        s"day $day has no complete +7 window — NULL, not fake zero")
    }
  }

  test("analytics_new_vs_returning: brute-force daily split; conservation") {
    val rows = Analytics.newVsReturning(spark, sf).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    assert(rows.map(r => r._2 + r._3).sum === orders.length.toLong,
      "every order lands in exactly one bucket")
    val firstDay = orders.groupBy(_._1).view.mapValues(_.map(_._2)
      .minBy(_.toEpochDay)).toMap
    val someDay = rows(rows.length / 2)
    val dayOrders = orders.filter(_._2 == someDay._1)
    val (nw, ret) = dayOrders.partition(o => firstDay(o._1) == o._2)
    assert(someDay._2 === nw.length.toLong, "brute new count")
    assert(someDay._3 === ret.length.toLong, "brute returning count")
    assert(math.abs(someDay._4 - nw.map(_._3).sum.toDouble) < 1e-6)
    assert(math.abs(someDay._5 - ret.map(_._3).sum.toDouble) < 1e-6)
  }

  test("analytics_rfm_migration: matrix covers the active universe") {
    val rows = Analytics.rfmMigration(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(!rows.contains(("none", "none")),
      "a never-active customer is not a matrix cell")
    val total = rows.values.sum
    val universe = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(total === universe,
      s"matrix total $total must equal active customers $universe")
    // tiers within a half are NTILE(3)-balanced: per-from-tier row sums
    // (excluding 'none') differ by at most 1
    val h1Sizes = rows.toSeq.filter(_._1._1 != "none")
      .groupBy(_._1._1).view.mapValues(_.map(_._2).sum).values.toSeq
    assert(h1Sizes.max - h1Sizes.min <= 1, s"H1 tercile balance: $h1Sizes")
  }

  test("analytics_ab_sequential: looks nest; OBF boundary decays as sqrt(K/k)") {
    val rows = Analytics.abSequential(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.map(_._1).toSeq === Seq(10L, 20L, 30L))
    // interim samples nest: each look contains the previous one
    assert(rows.map(_._2).sliding(2).forall {
      case Array(a, b) => b >= a; case _ => true
    } && rows.map(_._3).sliding(2).forall {
      case Array(a, b) => b >= a; case _ => true
    }, "cumulative looks grow")
    // final look covers the whole stream
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.last._2 + rows.last._3 === total, "look 30 sees all events")
    // OBF boundary values: 2.004*sqrt(3/k)
    val expect = Seq(1, 2, 3).map(k => BigDecimal(2.004 * math.sqrt(3.0 / k))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rows.map(_._6).toSeq === expect, "boundary ladder")
    rows.foreach { case (_, _, _, _, z, b, sig) =>
      assert(sig === (math.abs(z) > b), "flag derives from rounded z")
    }
    // null-effect corpus under a hash split: no look should fire
    assert(!rows.exists(_._7), "hash split of one population: no signal")
  }

  test("analytics_eb_smooth: shrinkage toward the corpus rate; order preserved") {
    val rows = Analytics.ebSmooth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val rates = rows.map(_._4)
    val m = rates.sum / rates.length
    rows.foreach { case (u, n, k, raw, sm) =>
      assert(k <= n, s"user $u purchases bounded")
      assert(sm >= 0.0 && sm <= 1.0, s"user $u smoothed rate is a rate")
      // shrinkage: smoothed lies strictly between raw and the prior mean
      // (or equals both when raw == prior mean)
      if (math.abs(raw - m) > 1e-6)
        assert((sm - raw).sign == (m - raw).sign &&
          math.abs(sm - m) <= math.abs(raw - m) + 1e-9,
          s"user $u: $raw -> $sm must move toward prior ~$m")
    }
    // fewer observations => more shrinkage: compare two users on
    // opposite sides of the median n with similar raw rates
    val sorted = rows.sortBy(_._2)
    val small = sorted.take(rows.length / 4)
    val large = sorted.takeRight(rows.length / 4)
    val shrinkSmall = small.map(r => math.abs(r._5 - r._4)).sum / small.length
    val shrinkLarge = large.map(r => math.abs(r._5 - r._4)).sum / large.length
    assert(shrinkSmall >= shrinkLarge - 1e-9,
      s"low-n users shrink at least as much on average: $shrinkSmall vs $shrinkLarge")
  }

  test("analytics_chi2: recomputes from the brute-force contingency table") {
    val row = Analytics.chi2Independence(spark, sf).collect()(0)
    // brute-force the (event_type × md5-arm) table driver-side
    val cells = Tables.events(spark, sf)
      .select(col("event_type"),
        when(substring(md5(col("user_id").cast("string")), 1, 4) < "8000",
          "A").otherwise("B").as("arm"))
      .groupBy("event_type", "arm").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val types = cells.keySet.map(_._1); val arms = cells.keySet.map(_._2)
    val n = cells.values.sum.toDouble
    def rt(t: String) = arms.toSeq.map(a => cells.getOrElse((t, a), 0L)).sum.toDouble
    def ct(a: String) = types.toSeq.map(t => cells.getOrElse((t, a), 0L)).sum.toDouble
    val chi2 = (for (t <- types.toSeq; a <- arms.toSeq) yield {
      val o = cells.getOrElse((t, a), 0L).toDouble
      val e = rt(t) * ct(a) / n
      // mirror the operator's order-free fold: ROUND-9 per term
      BigDecimal((o - e) * (o - e) / e)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }).sum.toDouble
    assert(row.getAs[Long]("n_events") === n.toLong)
    assert(row.getAs[Long]("df") ===
      (types.size - 1L) * (arms.size - 1L), "df = (r-1)(c-1)")
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-5, "chi2 recompute")
    val v = row.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, "Cramér's V bounded")
    assert(math.abs(v - math.sqrt(chi2 / (n * math.min(types.size - 1,
      arms.size - 1)))) < 1e-5, "V recompute")
  }

  test("analytics_forecast_naive: forecast IS the lag-7 value; errors and MAE chain") {
    val rows = Analytics.forecastNaive(spark, sf).collect()
      .sortBy(_.getAs[Timestamp]("day_ts").getTime)
    assert(rows.length > 8, "needs > one week of days")
    val total = rows.map(_.getAs[Double]("total"))
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i >= 7) {
        assert(r.getAs[Double]("forecast") === total(i - 7),
          s"day $i forecast = same weekday last week")
        assert(math.abs(r.getAs[Double]("abs_err") -
          math.abs(total(i) - total(i - 7))) < 1e-9, s"day $i abs err")
      } else assert(r.isNullAt(r.fieldIndex("forecast")),
        s"day $i unforecastable")
    }
    val scored = rows.drop(7)
    assert(rows.head.getAs[Long]("n_scored") === scored.length.toLong)
    val mae = scored.map(_.getAs[Double]("abs_err")).sum / scored.length
    assert(math.abs(rows.head.getAs[Double]("mae") - mae) < 1e-5, "MAE recompute")
  }
}

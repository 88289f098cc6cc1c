package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Temporal
import graft.sources.Tables

/** Pins event-time semantics: the session-window boundary rule, tumbling
  * window assignment, the as-of tie rule, and the ns→µs conversion
  * (SURVEY.md §5.2).
  */
class TemporalSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("session_window boundary: event at exactly last+gap MERGES into the session; one µs past starts a new one") {
    val spark2 = spark
    import spark2.implicits._
    // Empirically pinned (Spark 4.1): a session spans [first, last+gap],
    // and an event at exactly last+gap still merges (window-join on
    // overlap is inclusive). The oracle's lag-based sessionization must
    // therefore break on `diff > gap`, NOT `>=`.
    val atGap = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:30:00")), // == last + gap → SAME session
      (1L, ts("2024-01-01 00:40:00"))
    ).toDF("user_id", "ts_utc")
    val merged = atGap
      .groupBy(col("user_id"), session_window(col("ts_utc"), "30 minutes"))
      .agg(count(lit(1)).as("n")).collect()
    assert(merged.length === 1, "exactly-at-gap event merges")

    val pastGap = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:30:00.000001")) // gap + 1µs → NEW
    ).toDF("user_id", "ts_utc")
    val split = pastGap
      .groupBy(col("user_id"), session_window(col("ts_utc"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("start"), col("n"))
      .orderBy(col("start")).collect()
    assert(split.length === 2, "one µs past the gap starts a new session")
    assert(split(1).getTimestamp(0) === Timestamp.valueOf("2024-01-01 00:30:00.000001"))
  }

  test("tumbling windows: every event maps to its floor-hour window; counts conserve") {
    val total = Temporal.streamTumble(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("sliding windows (1h every 30min): each event is in exactly 2 windows") {
    val total = Temporal.streamSlide(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(total === 2 * Tables.events(spark, sf).count())
  }

  test("as-of join: signup at the same microsecond with smaller event_id is eligible") {
    val spark2 = spark
    import spark2.implicits._
    val t = ts("2024-01-01 01:00:00")
    val df = Seq(
      (1L, 7L, "signup", t),              // same ts as purchase, smaller id → counts
      (1L, 9L, "purchase", t),
      (2L, 11L, "purchase", t),
      (2L, 12L, "signup", t)              // same ts, LARGER id → not yet visible
    ).toDF("user_id", "event_id", "event_type", "ts_utc")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_utc"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = df
      .withColumn("signup_ts",
        max(when(col("event_type") === "signup", col("ts_utc"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("signup_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(out(1L) === Some(t))
    assert(out(2L) === None)
  }

  test("as-of join on fixtures: every emitted signup_ts is <= some purchase and is the max such") {
    val asof = Temporal.joinAsof(spark, sf)
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_utc").as("p_ts"))
    val joined = asof.join(purchases, Seq("event_id", "user_id"))
    assert(joined.filter(col("signup_ts") > col("p_ts")).count() === 0)
    assert(asof.count() > 0)
  }

  test("as-of nearest: picks the closer of the two directional matches, ties to earlier") {
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getTimestamp(2)).toMap
    val back = keyed(Temporal.joinAsof(spark, sf))
    val fwd = keyed(Temporal.joinAsofFwd(spark, sf))
    val near = keyed(Temporal.joinAsofNearest(spark, sf))
    // nearest covers exactly the union of the directional matches
    assert(near.keySet === back.keySet ++ fwd.keySet)
    near.foreach { case (id, got) =>
      (back.get(id), fwd.get(id)) match {
        case (Some(p), Some(n)) =>
          assert(got == p || got == n, s"purchase $id: $got not in {$p, $n}")
        case (Some(p), None) => assert(got == p)
        case (None, Some(n)) => assert(got == n)
        case (None, None) => fail(s"purchase $id matched nothing")
      }
    }
    // distance-minimality + tie rule, checked against raw event times
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_utc")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    near.foreach { case (id, got) =>
      for (p <- back.get(id); n <- fwd.get(id)) {
        val t = purchases(id)
        val (dp, dn) = (t - p.getTime, n.getTime - t)
        val expect = if (dp <= dn) p else n
        assert(got == expect,
          s"purchase $id: dist back=$dp fwd=$dn, got $got expect $expect")
      }
    }
  }

  test("as-of nearest keeps the one-shuffle window shape (no self-join)") {
    val plan = planOf(Temporal.joinAsofNearest(spark, sf))
    assert(!plan.contains("Join"), s"nearest as-of must not plan a join:\n$plan")
    // one hash exchange for the window partition + the presentation sort
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 2, s"window pair must share one partition exchange:\n$plan")
  }

  test("ts_gapfill: contiguous per-user calendar, gaps zero-filled, totals preserved") {
    val gf = Temporal.tsGapfill(spark, sf).collect()
    val byUser = gf.groupBy(_.getLong(0))
    // each user's calendar is CONTIGUOUS: row count == inclusive day span
    for ((u, rows) <- byUser) {
      val days = rows.map(_.getTimestamp(1).getTime).sorted
      val spanDays = (days.last - days.head) / 86400000L + 1
      assert(rows.length.toLong === spanDays, s"user $u calendar has holes")
    }
    // gap days exist at this sf and carry exactly (0, 0.0)
    val gaps = gf.filter(_.getLong(2) === 0L)
    assert(gaps.nonEmpty, "fixture should contain gap days")
    assert(gaps.forall(_.getDouble(3) === 0.0))
    // densification INVENTS days, never events: totals match the raw scan
    val rawN = Tables.events(spark, sf).count()
    assert(gf.map(_.getLong(2)).sum === rawN)
  }

  test("ts_locf: total output, observed days keep their value, gaps inherit the prior one") {
    val gf = Temporal.tsGapfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val lf = Temporal.tsLocf(spark, sf).collect()
    assert(lf.length === gf.size)
    assert(lf.forall(!_.isNullAt(2)), "LOCF over spans starting at an observation is total")
    var carried = Map.empty[Long, Double]
    for (r <- lf.sortBy(r => (r.getLong(0), r.getTimestamp(1).getTime))) {
      val (n, v) = gf((r.getLong(0), r.getTimestamp(1)))
      if (n > 0) carried += r.getLong(0) -> v
      assert(r.getDouble(2) === carried(r.getLong(0)),
        s"user ${r.getLong(0)} day ${r.getTimestamp(1)}: expected carry")
    }
  }

  test("ts_interp: observed days exact, gap days on the chord between their endpoints") {
    val gf = Temporal.tsGapfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val ip = Temporal.tsInterp(spark, sf).collect()
    assert(ip.length === gf.size, "interp densifies the same calendar as gapfill")
    assert(ip.forall(!_.isNullAt(2)), "spans start at an observation: interp is total")
    // replay the per-user chord: between observations (n > 0 in gapfill)
    // the fill is prev + (next - prev) * elapsed/gap, at the round-6 grain
    val byUser = ip.groupBy(_.getLong(0))
    for ((u, rows) <- byUser) {
      val seq = rows.sortBy(_.getTimestamp(1).getTime)
      var prevDay = 0L; var prevVal = 0.0
      var started = false
      // index of the next observed day at-or-after each position
      val obs = seq.map(r => gf((u, r.getTimestamp(1)))._1 > 0L)
      val days = seq.map(_.getTimestamp(1).getTime / 86400000L)
      val vals = seq.map(r => gf((u, r.getTimestamp(1)))._2)
      for (i <- seq.indices) {
        val got = seq(i).getDouble(2)
        if (obs(i)) {
          assert(math.abs(got - vals(i)) < 2e-6, s"user $u observed day $i: $got != ${vals(i)}")
          prevDay = days(i); prevVal = vals(i); started = true
        } else {
          assert(started, "first day per user is always observed")
          val j = (i + 1 until seq.length).find(obs(_)).get
          val expect = prevVal +
            (vals(j) - prevVal) * ((days(i) - prevDay).toDouble / (days(j) - prevDay).toDouble)
          assert(math.abs(got - expect) < 2e-6,
            s"user $u gap day $i: $got != chord $expect")
        }
      }
    }
  }

  test("ts_interp keeps the gap-run shape: one events scan, no join") {
    val plan = planOf(Temporal.tsInterp(spark, sf)).split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(scans === 1, s"spans+join formulations re-scan; got $scans")
    assert(!plan.contains("Join"), s"gap-run interpolation needs no join:\n$plan")
  }

  test("ts_islands: streaks recompute from raw day sets; counts conserve") {
    val got = Temporal.tsIslands(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val days = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts_utc")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1)
    assert(got.keySet === days.keySet)
    for ((u, rows) <- days) {
      val ds = rows.map(_._2).sortBy(_.toEpochDay)
      // brute-force islands: split where the day gap exceeds 1
      val gaps = ds.zip(ds.drop(1)).count { case (a, b) => b.toEpochDay - a.toEpochDay > 1 }
      val nStreaks = gaps + 1
      val lens = {
        val bounds = 0 +: ds.zip(ds.drop(1)).zipWithIndex
          .collect { case ((a, b), i) if b.toEpochDay - a.toEpochDay > 1 => i + 1 } :+ ds.length
        bounds.zip(bounds.drop(1)).map { case (s, e) => (e - s).toLong }
      }
      val (gn, gl, ga) = got(u)
      assert(gn === nStreaks.toLong, s"user $u streak count")
      assert(gl === lens.max, s"user $u longest streak")
      assert(ga === ds.length.toLong, s"user $u active days")
    }
  }

  test("ts_islands: island grouping and rollup ride the window's user partitioning — two hash shuffles") {
    val df = Temporal.tsIslands(spark, sf)
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    // one for the distinct-days aggregate, one for the user window; the
    // (user, island) count and per-user rollup must NOT add exchanges
    assert(hash === 2, s"expected 2 hash exchanges, got $hash:\n$plan")
  }

  test("ts_resample: bars partition events, open/close are the ts-ordered endpoints") {
    val bars = Temporal.tsResample(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_utc"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
    val bucketUs = 21600000000L
    val grouped = ev.groupBy { case (u, _, ts, _) =>
      (u, Math.floorDiv(ts.getTime * 1000 + (ts.getNanos / 1000) % 1000,
        bucketUs) * bucketUs)
    }
    assert(bars.length === grouped.size, "one bar per non-empty (user, bucket)")
    assert(bars.map(_.getLong(6)).sum === ev.length, "bars conserve event count")
    for (b <- bars) {
      val key = (b.getLong(0),
        b.getTimestamp(1).getTime * 1000 + (b.getTimestamp(1).getNanos / 1000) % 1000)
      val rows = grouped(key).sortBy { case (_, id, ts, _) => (ts.getTime, ts.getNanos, id) }
      assert(b.getDouble(2) === rows.head._4, s"open of $key")
      assert(b.getDouble(5) === rows.last._4, s"close of $key")
      assert(b.getDouble(3) === rows.map(_._4).max, s"high of $key")
      assert(b.getDouble(4) === rows.map(_._4).min, s"low of $key")
    }
  }

  test("ts_resample shuffles once: both windows and the bar aggregate share one exchange") {
    val plan = planOf(Temporal.tsResample(spark, sf))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // one hash exchange for the (user, bucket) windows; the groupBy on
    // the same keys must reuse it (plus rangepartitioning for the sort)
    assert(exchanges === 1, s"expected a single hash exchange in:\n$plan")
  }

  test("ts_utc derivation matches the verified golden instant in either ts era") {
    val ev = Tables.events(spark, sf).filter(col("event_id") === 0)
    // the golden INSTANT is era-independent (same corpus data, two
    // physical encodings — INT64 ns pre-2026-08-13, timestamp[us] after)
    val row = ev.select(col("ts_utc")).collect()(0)
    assert(row.getTimestamp(0).toString === "2024-01-01 00:09:58.778549")
    if (ev.schema("ts").dataType.typeName == "long")
      assert(ev.select(col("ts")).collect()(0).getLong(0) === 1704067798778549829L)
  }

  test("ts_autocorr: Pearson recomputes from brute-force pairs; pair conservation") {
    val rows = Temporal.tsAutocorr(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_utc"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    val pairs = ev.groupBy(t => (t._1, t._2)).values.flatMap { series =>
      val s = series.sortBy(t => (t._3.getTime, t._3.getNanos, t._4))
      s.sliding(2).collect { case Array(a, b) => (b._2, b._5, a._5) }
    }.toSeq.groupBy(_._1)
    // every user×type series of n events yields n-1 pairs
    val nSeries = ev.map(t => (t._1, t._2)).distinct.length
    assert(rows.map(_.getLong(1)).sum === ev.length - nSeries,
      "pair conservation across all series")
    rows.foreach { r =>
      val ps = pairs(r.getString(0)).map(p => (p._2, p._3))
      assert(r.getLong(1) === ps.length.toLong)
      val n = ps.length.toDouble
      val (mx, my) = (ps.map(_._1).sum / n, ps.map(_._2).sum / n)
      val cov = ps.map(p => (p._1 - mx) * (p._2 - my)).sum
      val (vx, vy) = (ps.map(p => math.pow(p._1 - mx, 2)).sum,
        ps.map(p => math.pow(p._2 - my, 2)).sum)
      val expect = cov / math.sqrt(vx * vy)
      assert(math.abs(r.getDouble(2) - expect) < 2e-6,
        s"${r.getString(0)}: got ${r.getDouble(2)}, brute force $expect")
    }
  }

  test("ts_decompose: components reassemble the series; seasonals centered") {
    val rows = Temporal.tsDecompose(spark, sf).collect()
    assert(rows.length === 30, "one row per corpus day")
    rows.foreach { r =>
      val (total, trend, seasonal, resid) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // additive identity at the rounding grain
      assert(math.abs(total - (trend + seasonal + resid)) < 3e-6,
        s"decomposition must reassemble at ${r.getTimestamp(0)}")
    }
    // seasonal effects are re-centered: the 7 distinct values sum ~ 0
    val seasonals = rows.map(r => r.getLong(1) -> r.getDouble(4)).distinct
    assert(seasonals.length === 7, "one seasonal effect per weekday")
    assert(math.abs(seasonals.map(_._2).sum) < 1e-4,
      "trend keeps the level; seasonals must sum to zero")
    // same weekday always gets the same seasonal
    assert(rows.groupBy(_.getLong(1)).values
      .forall(_.map(_.getDouble(4)).distinct.length == 1))
  }

  test("ts_autocorr plan: one scan, lag + corr share no join") {
    val plan = planOf(Temporal.tsAutocorr(spark, sf))
      .split("== Initial Plan ==").head
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(scans === 1, s"one pass over the stream, got $scans scans")
    assert(!plan.contains("Join"), s"no join in the lag formulation:\n$plan")
  }

  test("ts_ewma: closed-form weights match a brute-force trailing-8 EWMA") {
    val rows = Temporal.tsEwma(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // head: with no history the EWMA IS the day's value
    assert(math.abs(rows.head._3 - rows.head._2) < 1e-6,
      "first day: ewma == revenue")
    // brute force over the cents series with weights 2^(7-i)
    val cents = rows.map(r => math.round(r._2 * 100))
    rows.indices.foreach { t =>
      val terms = (0 to 7).flatMap { i =>
        if (t - i >= 0) Some((cents(t - i), 1L << (7 - i))) else None
      }
      val brute =
        terms.map(p => p._1 * p._2).sum.toDouble / terms.map(_._2).sum / 100.0
      assert(math.abs(rows(t)._3 - brute) < 1e-6, s"row $t ewma")
    }
    // recency dominance: the current day carries weight 128/255 >= half
    val mid = rows.length / 2
    assert(rows(mid)._3 > 0, "smoke: mid-series ewma positive on this corpus")
  }

  test("ts_anomaly_stl: residuals match decompose, z standardized, flag consistent") {
    val rows = Temporal.tsAnomalyStl(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    val dec = Temporal.tsDecompose(spark, sf).collect()
      .map(r => r.getTimestamp(0) -> r.getDouble(5)).toMap
    assert(rows.length === dec.size, "every day emitted")
    rows.foreach { case (d, resid, _, _) =>
      assert(math.abs(resid - dec(d)) < 1e-6,
        s"$d: residual equals ts_decompose's")
    }
    val zs = rows.map(_._3)
    assert(math.abs(zs.sum / zs.length) < 1e-3, "z-scores centered on 0")
    val zVar = zs.map(z => z * z).sum / (zs.length - 1)
    assert(math.abs(zVar - 1.0) < 0.1, s"z-scores unit-variance: $zVar")
    rows.foreach { case (_, _, z, flag) =>
      assert(flag === (math.abs(z) > 2.0), "flag from the rounded z")
    }
  }

  test("join_asof_tolerance: the bounded subset of join_asof, gaps within 1h") {
    val tol = Temporal.joinAsofTolerance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getLong(3)))
    val full = Temporal.joinAsof(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2))).toMap
    assert(tol.nonEmpty)
    tol.foreach { case (eid, signup, gap) =>
      assert(gap >= 0L && gap <= 3600000000L, s"gap within tolerance: $gap")
      assert(full(eid) === signup,
        "tolerance never changes the MATCH, only membership")
    }
    // exactly the full-asof rows whose gap fits — none dropped, none added
    def us(t: Timestamp): Long = t.getTime / 1000 * 1000000 + t.getNanos / 1000
    val tolIds = tol.map(_._1).toSet
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts_utc"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    full.foreach { case (eid, signup) =>
      val inTol = ev(eid) - us(signup) <= 3600000000L
      assert(tolIds.contains(eid) === inTol, s"membership for $eid")
    }
  }

  test("ts_streaks: every maximal rising run, exact decimal gain") {
    val rows = Temporal.tsStreaks(spark, sf).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getTimestamp(1).toLocalDateTime.toLocalDate,
        r.getLong(2), r.getDouble(3)))
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("t"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDecimal(1)))
    // brute-force maximal strictly-rising runs
    val runs = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int)] // (firstUpIdx, lastIdx)
    var i = 1
    while (i < daily.length) {
      if (daily(i)._2.compareTo(daily(i - 1)._2) > 0) {
        val start = i
        while (i + 1 < daily.length &&
          daily(i + 1)._2.compareTo(daily(i)._2) > 0) i += 1
        runs += ((start, i))
      }
      i += 1
    }
    assert(rows.length === runs.length, "run count")
    rows.zip(runs).foreach { case ((s, e, len, gain), (bs, be)) =>
      assert(s === daily(bs)._1 && e === daily(be)._1, "run span")
      assert(len === (be - bs + 1).toLong, "rising-day count")
      val expect = daily(be)._2.subtract(daily(bs - 1)._2).doubleValue
      assert(math.abs(gain - expect) < 1e-9, "gain = end minus base")
      assert(gain > 0, "rising runs gain")
    }
  }

  test("ts_downsample: one representative per bucket, maximal deviation") {
    val rows = Temporal.tsDownsample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate,
        r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (1L to 10L), "all 10 buckets, one rep each")
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("d"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("c"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    assert(rows.map(_._4).sum === daily.length.toLong,
      "buckets partition the days")
    // ntile semantics: first (n mod 10) buckets get the extra day
    val nD = daily.length
    val base = nD / 10; val extra = nD % 10
    var off = 0
    rows.foreach { case (b, day, rev, nb) =>
      val sz = base + (if (b <= extra) 1 else 0)
      assert(nb === sz.toLong, s"bucket $b size")
      val slice = daily.slice(off, off + sz); off += sz
      val sumB = slice.map(_._2).sum
      val best = slice.map { case (d, c) =>
        (math.abs(sz.toLong * c - sumB), d, c)
      }.sortBy(t => (-t._1, t._2.toEpochDay)).head
      assert(day === best._2, s"bucket $b representative day")
      assert(math.abs(rev - best._3 / 100.0) < 1e-9)
    }
  }

  test("ts_cusum: matches a brute-force cumulative-deviation maximum") {
    val rows = Temporal.tsCusum(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        col("ts_utc").cast("long"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(rows.keySet === ev.keySet)
    ev.foreach { case (tpe, es) =>
      val cents = es.sortBy(e => (e._3, e._2)).map(e => math.round(e._4 * 100))
      val n = cents.length
      val total = cents.sum
      val brute = cents.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
        case (prefix, i) =>
          (BigInt(n) * BigInt(prefix) - BigInt(i + 1) * BigInt(total)).abs
      }.max
      val (gotN, gotMean, gotMax) = rows(tpe)
      assert(gotN === n.toLong)
      assert(math.abs(gotMean - total.toDouble / n / 100.0) < 1e-6)
      assert(math.abs(gotMax - brute.toDouble / n / 100.0) < 1e-5,
        s"$tpe max cusum")
    }
  }

  test("ts_peak_detect: exactly the strict local maxima, correct prominence") {
    val rows = Temporal.tsPeakDetect(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2)))
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("t"))
      .orderBy(col("d")).collect()
      .map(r => r.getDecimal(1))
    val brutePeaks = (1 until daily.length - 1).filter { i =>
      daily(i).compareTo(daily(i - 1)) > 0 && daily(i).compareTo(daily(i + 1)) > 0
    }
    assert(rows.length === brutePeaks.length, "peak count")
    rows.zip(brutePeaks).foreach { case ((_, rev, prom), i) =>
      assert(math.abs(rev - daily(i).doubleValue) < 1e-9)
      val higher = daily(i - 1).max(daily(i + 1))
      assert(math.abs(prom - daily(i).subtract(higher).doubleValue) < 1e-9)
      assert(prom > 0, "strict maxima have positive prominence")
    }
  }

  test("ts_ewma plans as one aggregate + one calendar window, no join") {
    val plan = planOf(Temporal.tsEwma(spark, sf))
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"closed-form lags, not a self-join:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"one pass over events, got $scans")
  }

  test("ts_cross_corr: lag structure + brute-force Pearson at lags 0 and 3") {
    val rows = Temporal.tsCrossCorr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(rows.map(_._1).toSeq === (-7L to 7L).toSeq, "one row per lag, ordered")
    val nByLag = rows.map(r => r._1 -> r._2).toMap
    // pair count shrinks by exactly the lag magnitude on a gap-free calendar
    assert((-7L to 7L).forall(l => nByLag(l) === nByLag(0L) - math.abs(l)),
      s"overlap counts must be |days| - |lag|: $nByLag")
    // brute force from the daily conditional sums
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("day"))
      .agg(sum(when(col("event_type") === "view",
        col("value").cast("decimal(18,2)")).otherwise(lit(0)
        .cast("decimal(18,2)"))).as("x"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)")).otherwise(lit(0)
          .cast("decimal(18,2)"))).as("y"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getDecimal(1).doubleValue(), r.getDecimal(2).doubleValue()))
      .sortBy(_._1)
    def brute(lag: Int): Double = {
      val byDay = daily.map(d => d._1 -> d).toMap
      val pairs = daily.flatMap(a => byDay.get(a._1 + lag).map(b => (a._2, b._3)))
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val (sxx, syy) = (pairs.map(p => p._1 * p._1).sum,
        pairs.map(p => p._2 * p._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    for (l <- Seq(0, 3)) {
      val got = rows.find(_._1 == l).get._3
      assert(math.abs(got - brute(l)) < 1e-5, s"lag $l: $got vs ${brute(l)}")
      assert(got.abs <= 1.0 + 1e-9, s"lag $l correlation bounded")
    }
  }

  test("ts_burstiness: brute-force Goh-Barabasi B per type; bounds hold") {
    val rows = Temporal.tsBurstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts_utc")), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byType = evs.groupBy(_._1)
    rows.foreach { case (tpe, nGaps, meanS, sdS, b) =>
      val gaps = byType(tpe).groupBy(_._2).values.flatMap { es =>
        val sorted = es.sortBy(e => (e._3, e._4)).map(_._3)
        sorted.sliding(2).collect { case Array(a2, b2) => (b2 - a2).toDouble }
      }.toArray
      assert(nGaps === gaps.length.toLong, s"$tpe gap count")
      val mu = gaps.sum / gaps.length
      val sd = math.sqrt(
        gaps.map(g => (g - mu) * (g - mu)).sum / (gaps.length - 1))
      assert(math.abs(meanS - mu / 1e6) < 1e-4, s"$tpe mean gap")
      assert(math.abs(sdS - sd / 1e6) < 1e-4, s"$tpe sd gap")
      assert(math.abs(b - (sd - mu) / (sd + mu)) < 1e-5, s"$tpe B")
      assert(b > -1.0 && b < 1.0, s"$tpe burstiness bounded")
    }
  }

  test("ts_theil_sen: equals the brute-force median of pairwise slopes") {
    val row = Temporal.tsTheilSen(spark, sf).collect()(0)
    val (nPairs, slope) = (row.getLong(0), row.getDouble(1))
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getDecimal(1).doubleValue()))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- i + 1 until daily.length
    } yield (daily(j)._2 - daily(i)._2) / (daily(j)._1 - daily(i)._1))
      .sorted
    assert(nPairs === slopes.length.toLong, "pair count C(n,2)")
    val m = slopes.length
    val brute =
      if (m % 2 == 1) slopes(m / 2)
      else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
    assert(math.abs(slope - brute) < 1e-5 * (1 + brute.abs),
      s"sen slope $slope vs brute $brute")
  }

  test("ts_spectral: shares form a distribution; brute-force DFT agrees") {
    val rows = Temporal.tsSpectral(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === (1L to 15L).toSeq)
    assert(rows.forall(_._3 >= -1e-12), "powers nonnegative")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares sum to 1")
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getDecimal(1).doubleValue())).sortBy(_._1)
    val n = daily.length
    val t0 = daily.map(_._1).min
    val mu = daily.map(_._2).sum / n
    val powers = (1 to 15).map { k =>
      var a = 0.0; var b = 0.0
      daily.foreach { case (d, x) =>
        val arg = 2 * math.Pi * k * (d - t0) / n
        a += (x - mu) * math.cos(arg); b += (x - mu) * math.sin(arg)
      }
      a * a + b * b
    }
    val tot = powers.sum
    rows.foreach { case (k, period, share) =>
      assert(math.abs(period - n.toDouble / k) < 1e-6, s"k=$k period")
      assert(math.abs(share - powers(k.toInt - 1) / tot) < 1e-6,
        s"k=$k share $share vs ${powers(k.toInt - 1) / tot}")
    }
  }

  test("ts_mann_kendall: brute-force S, tie-corrected variance, Z") {
    val row = Temporal.tsMannKendall(spark, sf).collect()(0)
    val (n, s, varS, z, trend) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getString(4))
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getDecimal(2 - 1))).sortBy(_._1).map(_._2)
    assert(n === daily.length.toLong)
    var bs = 0L
    for (i <- daily.indices; j <- i + 1 until daily.length)
      bs += daily(j).compareTo(daily(i)).sign
    assert(s === bs, s"S $s vs brute $bs")
    val ties = daily.groupBy(identity).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val nn = daily.length.toLong
    val bruteVar = (nn * (nn - 1) * (2 * nn + 5) - ties) / 18.0
    assert(math.abs(varS - bruteVar) < 1e-4, s"var $varS vs $bruteVar")
    val bruteZ =
      if (bs > 0) (bs - 1) / math.sqrt(bruteVar)
      else if (bs < 0) (bs + 1) / math.sqrt(bruteVar) else 0.0
    assert(math.abs(z - bruteZ) < 1e-5, s"Z $z vs $bruteZ")
    val expectTrend = if (math.abs(z) <= 1.96) "none"
      else if (z > 0) "increasing" else "decreasing"
    assert(trend === expectTrend, "label derives from the rounded Z")
  }

  test("ts_hampel: brute-force windowed median/MAD picks and the flag") {
    val rows = Temporal.tsHampel(spark, sf).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toEpochDay,
        r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getDecimal(1))).sortBy(_._1)
    // nearest-rank lower-median pick: smallest value with 2*rank >= n
    def pickMed(xs: Seq[java.math.BigDecimal]): java.math.BigDecimal = {
      val s = xs.sorted((a: java.math.BigDecimal,
        b: java.math.BigDecimal) => a.compareTo(b))
      s((s.length + 1) / 2 - 1)
    }
    val byDay = daily.toMap
    rows.foreach { case (day, x, med, mad, dev, flag) =>
      val window = daily.filter(d => math.abs(d._1 - day) <= 3).map(_._2)
      val bm = pickMed(window)
      assert(med === bm.doubleValue(), s"day $day median")
      val bmad = pickMed(window.map(v => v.subtract(bm).abs()))
      assert(mad === bmad.doubleValue(), s"day $day MAD")
      val bdev = byDay(day).subtract(bm).abs().doubleValue()
      assert(math.abs(dev - bdev) < 5e-7, s"day $day deviation")
      assert(flag === (BigDecimal(dev) >
        BigDecimal(4.4478 * bmad.doubleValue()).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)), s"day $day flag")
      assert(x === byDay(day).doubleValue())
    }
  }

  test("ts_stl_strength: strengths in [0,1]; residual var never exceeds parts") {
    val row = Temporal.tsStlStrength(spark, sf).collect()(0)
    val (n, ft, fs) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(n === 30L, "calendar frame")
    assert(ft >= 0.0 && ft <= 1.0, s"trend strength $ft in [0,1]")
    assert(fs >= 0.0 && fs <= 1.0, s"seasonal strength $fs in [0,1]")
    // cross-check against ts_anomaly_stl's residuals: strength formula
    // recomputed from that query's own emitted components
    val stl = Temporal.tsAnomalyStl(spark, sf).collect()
      .map(r => (r.getDouble(1), r.getDouble(2))) // (total, residual)
    assert(stl.length === 30)
    val resid = stl.map(_._2)
    def varS(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    // residual variance is positive on real data, so strengths < 1
    assert(varS(resid) > 0 && ft < 1.0 && fs < 1.0)
  }

  test("ts_acf: self-series cross-corr identity; pair counts; band") {
    val acf = Temporal.tsAcf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(acf.map(_._1).toSeq === (1L to 14L).toSeq)
    acf.foreach { case (lag, n, a, band) =>
      assert(n === 30 - lag, s"lag $lag pair count n - lag")
      assert(a.abs <= 1.0 + 1e-9, s"lag $lag bounded")
      assert(math.abs(band - BigDecimal(1.96 / math.sqrt(n.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // brute-force lag 7 (the weekly spike candidate)
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("x"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getDecimal(1).doubleValue())).sortBy(_._1)
    val byDay = daily.toMap
    val pairs = daily.flatMap(d => byDay.get(d._1 + 7).map(y => (d._2, y)))
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val (sxx, syy) = (pairs.map(p => p._1 * p._1).sum,
      pairs.map(p => p._2 * p._2).sum)
    val brute = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(acf.find(_._1 == 7L).get._3 - brute) < 1e-5,
      s"lag-7 ACF vs brute $brute")
  }

  test("ts_dow_hour_heatmap: cells partition the stream; shares sum to 1") {
    val rows = Temporal.tsDowHourHeatmap(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(3), r.getDouble(4))))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._2._1).sum === total, "cells partition all events")
    assert(math.abs(rows.map(_._2._3).sum - 1.0) < 1e-3, "shares sum to 1")
    assert(rows.forall { case ((d, h), _) =>
      d >= 0 && d <= 6 && h >= 0 && h <= 23
    }, "cell domain")
    // brute-force one cell
    val evs = Tables.events(spark, sf)
      .select(to_date(col("ts_utc")), hour(col("ts_utc")), col("value"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getInt(1), r.getDouble(2)))
    val ((d0, h0), (n0, v0, _)) = rows.head
    val cell = evs.filter(e =>
      java.lang.Math.floorMod(e._1, 7L) == d0 && e._2 == h0)
    assert(n0 === cell.length.toLong, "brute cell count")
    val bv = cell.map(e => BigDecimal(e._3).setScale(2,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(math.abs(v0 - bv) < 1e-6, s"brute cell value $bv")
  }

  test("ts_holt: brute-force Holt recursion, fitted t=2 == y2, 7-step linear forecast fan") {
    val out = Temporal.tsHolt(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
    val (fit, fc) = out.partition(_._2 == 0L)
    assert(fc.length === 7, "seven forecast rows")
    assert(fc.map(_._2).sorted.toSeq === (1L to 7L).toSeq)
    // brute-force the recursion from the daily cents series
    val ys = Tables.events(spark, sf)
      .groupBy(to_date(col("ts_utc")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(1).toDouble)).sortBy(_._1).map(_._2)
    assert(fit.length === ys.length, "one fitted row per day")
    var l = ys(0); var b = ys(1) - ys(0)
    val path = Array.newBuilder[(Double, Double)]
    path += ((l, b))
    for (t <- 1 until ys.length) {
      val lNew = 0.5 * ys(t) + 0.5 * (l + b)
      b = 0.25 * (lNew - l) + 0.75 * b
      l = lNew
      path += ((l, b))
    }
    val brute = path.result()
    val sortedFit = fit.sortBy(_._1.getTime)
    sortedFit.zipWithIndex.foreach { case ((_, _, y, lv, tr, yh), i) =>
      assert(math.abs(y.get - ys(i) / 100.0) < 1e-9, s"revenue day $i")
      assert(math.abs(lv.get - brute(i)._1 / 100.0) < 1e-5,
        s"level day $i")
      assert(math.abs(tr.get - brute(i)._2 / 100.0) < 1e-5,
        s"trend day $i")
      if (i == 0) assert(yh.isEmpty, "no fitted value at t=1")
      else assert(math.abs(yh.get -
        (brute(i - 1)._1 + brute(i - 1)._2) / 100.0) < 1e-5,
        s"fitted day $i")
    }
    // init identity: fitted at t=2 is l1+b1 = y1+(y2-y1) = y2 exactly
    assert(math.abs(sortedFit(1)._6.get - ys(1) / 100.0) < 1e-6,
      "fitted t=2 equals y2")
    // forecast fan is linear in h with slope b_n
    val (lN, bN) = brute.last
    fc.sortBy(_._2).foreach { case (_, h, y, lv, tr, yh) =>
      assert(y.isEmpty && lv.isEmpty && tr.isEmpty, "forecast rows carry only yhat")
      assert(math.abs(yh.get - (lN + h * bN) / 100.0) < 1e-5,
        s"forecast h=$h")
    }
  }

  test("ts_backtest: naive MASE is 1 by construction; RMSE >= MAE; equal eval windows") {
    val rows = Temporal.tsBacktest(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_eval"),
        r.getAs[Double]("mae"), r.getAs[Double]("rmse"),
        r.getAs[Double]("mase"))).toMap
    assert(rows.keySet === Set("naive", "snaive7", "combo_avg"))
    val ns = rows.values.map(_._1).toSet
    assert(ns.size === 1, s"all methods score the SAME window: $ns")
    assert(math.abs(rows("naive")._4 - 1.0) < 1e-9,
      "MASE of naive vs itself is exactly 1")
    rows.foreach { case (m, (_, mae, rmse, mase)) =>
      assert(mae >= 0 && rmse >= 0 && mase >= 0, s"$m nonneg")
      // RMSE >= MAE for any error sample (Cauchy–Schwarz); allow the
      // two independent ROUND-6s one ulp of slack
      assert(rmse >= mae - 1e-6, s"$m RMSE ($rmse) >= MAE ($mae)")
    }
    // MASE is MAE re-expressed on the naive scale — consistent within ROUND-6
    val scale = rows("naive")._2
    rows.foreach { case (m, (_, mae, _, mase)) =>
      assert(math.abs(mase - mae / scale) < 1e-4, s"$m MASE = MAE/naiveMAE")
    }
  }

  test("ts_rolling_stats: brute-force trailing-10 recompute; user-partitioned window plan") {
    val df = Temporal.tsRollingStats(spark, sf)
    val rows = df.collect()
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_utc"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Timestamp](2).getTime, r.getDouble(3)))
    val byUser = events.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._3, e._2))
    }
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getAs[Long]("roll_n"), r.getAs[Double]("roll_mean"))).toMap
    byUser.foreach { case (u, es) =>
      es.zipWithIndex.foreach { case (e, i) =>
        val win = es.slice(math.max(0, i - 9), i + 1).map(_._4)
        val (n, mean) = got((u, e._2))
        assert(n === win.length.toLong, s"user $u event ${e._2} window size")
        assert(math.abs(mean - win.sum / win.length) < 1e-5,
          s"user $u event ${e._2} rolling mean")
      }
    }
    // plan pin: ONE user-partitioned window, never a global sort
    val plan = planOf(df).split("== Initial Plan ==").head
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    winLines.foreach(l => assert(l.contains("user_id"),
      s"window must partition by user_id: $l"))
  }
}

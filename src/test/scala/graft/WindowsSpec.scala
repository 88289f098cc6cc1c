package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows

/** Pins window-operator plan shapes and frame semantics (claims
  * referenced from Windows.scala comments).
  */
class WindowsSpec extends SparkTestBase {

  test("win_topk_group's rank filter is pushed down as WindowGroupLimit") {
    assert(planOf(Windows.winTopkGroup(spark, sf)).contains("WindowGroupLimit"))
  }

  test("win_rank does NOT get WindowGroupLimit — ntile blocks the rewrite (documented limitation)") {
    // Catalyst's InferWindowGroupLimit only fires when every window
    // function is rank-like (row_number/rank/dense_rank); win_rank also
    // computes ntile(4), which needs the whole partition. Pinned so a
    // future Spark upgrade that lifts this shows up as a test change.
    assert(!planOf(Windows.winRank(spark, sf)).contains("WindowGroupLimit"))
  }

  test("win_frame running total ends at the per-user plain sum") {
    val df = Windows.winFrame(spark, sf).cache()
    try {
      // last running_total per user == sum of that user's values
      val lastPerUser = df.groupBy("user_id")
        .agg(max(struct(col("ts_utc"), col("event_id"), col("running_total")))
          .getField("running_total").as("final_total"))
      val expected = graft.sources.Tables.events(spark, sf)
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("exp_total"))
      val joined = lastPerUser.join(expected, "user_id")
        .filter(abs(col("final_total") - col("exp_total")) > 1e-9)
      assert(joined.count() === 0)
    } finally df.unpersist()
  }

  test("win_pattern's lag cascade plans ONE Window node over one exchange+sort") {
    // all four lags share (user_id, ORDER BY ts_utc, event_id); a
    // refactor that splits the ordering would double the sort or the
    // shuffle — the single-Window discipline from etl_scd2.
    val plan = planOf(Windows.winPattern(spark, sf))
    val windows = plan.linesIterator.count(_.contains("Window [lag"))
    assert(windows === 1, s"expected one Window node, got $windows:\n$plan")
    val hashEx = plan.split("== Initial Plan ==").head.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hashEx <= 1, s"lag cascade must shuffle once:\n$plan")
  }

  test("win_pattern matches are genuinely consecutive error triples") {
    // re-derive positions independently: the matched (start, end) pair
    // must be exactly 2 apart in the user's full event sequence
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_utc", "event_id")
    val pos = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_utc"))
      .withColumn("pos", row_number().over(w))
      .select(col("event_id"), col("pos"))
    val m = Windows.winPattern(spark, sf)
      .join(pos.withColumnRenamed("event_id", "start_event_id")
        .withColumnRenamed("pos", "p0"), Seq("start_event_id"))
      .join(pos.withColumnRenamed("event_id", "end_event_id")
        .withColumnRenamed("pos", "p2"), Seq("end_event_id"))
    assert(m.filter(col("p2") - col("p0") =!= 2).count() === 0)
  }

  test("win_frame moving count is min(position, 3)") {
    val bad = Windows.winFrame(spark, sf)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_utc", "event_id")))
      .filter(col("moving_n") =!= least(col("pos"), lit(3)))
    assert(bad.count() === 0)
  }

  test("win_ignore_nulls: carried/first/next recompute from a per-user walk") {
    val rows = Windows.winIgnoreNulls(spark, sf).collect()
    // window order is (ts_utc, event_id); re-derive it from the source
    val ts = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts_utc")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.map(_.sortBy { r =>
      val t = ts(r.getLong(1)); (t.getTime, t.getNanos, r.getLong(1))
    }).foreach { rs =>
      val vals = rs.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      var last: Option[Double] = None
      var first: Option[Double] = None
      for ((r, i) <- rs.zipWithIndex) {
        last = vals(i).orElse(last)
        first = first.orElse(vals(i))
        def got(c: Int) = if (r.isNullAt(c)) None else Some(r.getDouble(c))
        assert(got(3) === last, s"carried at ${r.getLong(1)}")
        assert(got(4) === first, s"first_seen at ${r.getLong(1)}")
        val next = vals.drop(i + 1).flatten.headOption
        assert(got(5) === next, s"next_seen at ${r.getLong(1)}")
      }
    }
    assert(rows.exists(_.isNullAt(2)) && rows.exists(!_.isNullAt(2)),
      "the sparse column must actually be sparse")
  }

  test("win_ignore_nulls: all three functions share ONE window shuffle") {
    val plan = planOf(Windows.winIgnoreNulls(spark, sf))
      .split("== Initial Plan ==").head
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash === 1, s"one user_id shuffle expected, got $hash:\n$plan")
    assert(!plan.contains("Join"), "no self-join in the window formulation")
  }

  test("win_debounce: bursts partition the errors, one firing per burst") {
    val rows = Windows.winDebounce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
    val errs = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts_utc"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // conservation: every error is either a firing or suppressed
    assert(rows.length + rows.map(_._4).sum === errs.length.toLong)
    // brute-force burst structure per user
    val byUser = errs.groupBy(_._1)
    val brute = byUser.toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val bursts = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]]
      sorted.foreach { e =>
        if (bursts.isEmpty || e._3 - bursts.last.last._3 > 1800000000L)
          bursts += scala.collection.mutable.ArrayBuffer(e)
        else bursts.last += e
      }
      bursts.map(b => (uid, b.head._2, (b.length - 1).toLong))
    }.sortBy(t => (t._1, t._2))
    assert(rows.map(r => (r._1, r._2, r._4)).sortBy(t => (t._1, t._2))
      .toSeq === brute.toSeq, "burst heads and suppressed counts")
  }

  test("win_running_distinct: curve equals brute-force distinct-so-far, monotone") {
    val rows = Windows.winRunningDistinct(spark, sf).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getLong(1), r.getLong(2)))
    val ev = graft.sources.Tables.events(spark, sf)
      .select(to_date(col("ts_utc")).as("d"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = ev.map(_._1).distinct.sorted(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    assert(rows.map(_._1).toSeq === days.toSeq, "every activity day on the curve")
    rows.foreach { case (d, _, cum) =>
      val brute = ev.filter(e => !e._1.isAfter(d)).map(_._2).distinct.length
      assert(cum === brute.toLong, s"day $d cumulative distinct")
    }
    // monotone, and the last point is the total audience
    assert(rows.sliding(2).forall {
      case Array((_, _, a), (_, _, b)) => b >= a; case _ => true
    })
    assert(rows.last._3 === ev.map(_._2).distinct.length.toLong)
    assert(rows.map(_._2).sum === rows.last._3, "new-user increments sum to the total")
  }

  test("win_running_distinct plans with NO running-distinct window over the fact table") {
    val plan = planOf(Windows.winRunningDistinct(spark, sf))
      .split("== Initial Plan ==").head
    // the whole point: fact-scale work is two hash aggregates; the only
    // window runs over the calendar-sized day frame after aggregation
    assert(plan.contains("Window"), "running sum is a window")
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash <= 3, s"bounded shuffles (user agg, day aggs, join), got $hash:\n$plan")
  }

  test("win_drawdown: cum chains, peak is running max, pct derives; dips exist") {
    val rows = Windows.winDrawdown(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(rows.length === 30, "one row per corpus day")
    var cum = BigDecimal(0); var peak = BigDecimal("-1e18")
    rows.foreach { case (_, rev, cumV, peakV, dd, pct) =>
      cum += BigDecimal(rev)
      if (cum > peak) peak = cum
      assert(math.abs(cumV - cum.toDouble) < 1e-6, "cumulative chains")
      assert(math.abs(peakV - peak.toDouble) < 1e-6, "running peak")
      assert(math.abs(dd - (peak - cum).toDouble) < 1e-6, "drawdown")
      assert(dd >= -1e-9, "drawdown nonnegative")
      pct.foreach { p =>
        assert(peakV > 0, "pct only emitted above water")
        val expect = BigDecimal((peakV - cumV) / peakV)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(p - expect) < 1e-9, "pct derives from peak/cum")
      }
    }
    // the purchases-minus-errors walk must actually dip somewhere —
    // a monotone series would make this query vacuous
    assert(rows.exists(_._4 > 1e-9), "at least one real drawdown")
  }
}

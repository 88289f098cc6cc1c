package graft

import org.apache.spark.sql.functions._
import graft.operators.Aggregates
import graft.sources.Tables

/** Semantics pins for aggregate-surface queries beyond what the oracle's
  * value equality spells out.
  */
class AggregatesSpec extends SparkTestBase {

  test("agg_quantile_disc: nearest-rank picks are corpus ELEMENTS and match brute force") {
    val rows = Aggregates.aggQuantileDisc(spark, sf).collect()
    val data = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.map(_.getString(0)).toSet === data.keySet)
    rows.foreach { r =>
      val vals = data(r.getString(0))
      val n = vals.length
      assert(r.getLong(4) === n.toLong)
      def nearestRank(p: Double): Double = vals(math.ceil(n * p).toInt - 1)
      assert(r.getDouble(1) === nearestRank(0.25), "p25")
      assert(r.getDouble(2) === nearestRank(0.5), "median")
      assert(r.getDouble(3) === nearestRank(0.9), "p90")
      // discreteness: every pick is an actual element of the group
      assert(Seq(1, 2, 3).forall(i => vals.contains(r.getDouble(i))),
        "discrete percentiles must be member elements, never interpolations")
    }
  }

  test("agg_argmax: selected rows are the unique (value, event_id)-max/min per group") {
    val rows = Aggregates.aggArgmax(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === ev.keySet)
    rows.foreach { r =>
      val g = ev(r.getString(0))
      // lexicographic (value, event_id) extremes — the documented tie-break
      val top = g.maxBy(t => (t._3, t._2))
      val bot = g.minBy(t => (t._3, t._2))
      assert(r.getLong(1) === top._2 && r.getDouble(2) === top._3, "argmax")
      assert(r.getLong(3) === bot._2 && r.getDouble(4) === bot._3, "argmin")
      assert(r.getLong(5) === g.size.toLong)
    }
  }

  test("agg_corr_matrix: matches Spark's native corr, bounded, symmetric inputs") {
    val r = Aggregates.aggCorrMatrix(spark, sf).collect().head
    val corrs = (1 to 6).map(r.getDouble)
    corrs.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9,
      s"correlation out of [-1,1]: $c"))
    // cross-check every pair against Spark's built-in (co-moment) corr
    val li = Tables.lineitem(spark, sf)
    val pairs = Seq(("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
      ("l_quantity", "l_tax"), ("l_extendedprice", "l_discount"),
      ("l_extendedprice", "l_tax"), ("l_discount", "l_tax"))
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val native = li.agg(corr(col(a), col(b))).collect().head.getDouble(0)
      assert(math.abs(corrs(i) - native) < 1e-6,
        s"corr($a,$b): exact-sum ${corrs(i)} vs native $native")
    }
  }

  test("agg_weighted_median: smallest price reaching half the unit weight") {
    val rows = Aggregates.aggWeightedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1)
    assert(rows.keySet === li.keySet)
    li.foreach { case (flag, ls) =>
      val total = ls.map(_._3).sum
      val sorted = ls.sortBy(_._2)
      var cum = 0L
      val wm = sorted.find { l => cum += l._3; cum * 2 >= total }.get._2
      assert(rows(flag)._1 === total, s"$flag total weight")
      assert(rows(flag)._2 === wm, s"$flag weighted median")
      // the weighted median differs from the naive unweighted one in
      // general; at minimum it must be a member price
      assert(ls.exists(_._2 === rows(flag)._2), "median is a member element")
    }
  }

  test("agg_hhi: concentration bounds 10000/n <= hhi <= 10000, revenue conserved") {
    val rows = Aggregates.aggHhi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi) = (r.getLong(1), r.getDouble(3))
      assert(hhi >= 10000.0 / n - 1e-6, "lower bound: perfectly even split")
      assert(hhi <= 10000.0 + 1e-6, "upper bound: monopoly")
    }
    val totalRev = rows.map(_.getDouble(2)).sum
    val expect = Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).collect()
      .head.getDecimal(0).doubleValue
    assert(math.abs(totalRev - expect) < 0.05,
      "segment revenues sum to the corpus total")
  }

  test("agg_corr_matrix plans as ONE aggregate pass — no join, no window") {
    val plan = planOf(Aggregates.aggCorrMatrix(spark, sf))
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"six correlations from one scan:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"one lineitem scan, got $scans")
  }

  test("agg_argmax plans as ONE 2-phase aggregate — no window, no join-back") {
    val plan = planOf(Aggregates.aggArgmax(spark, sf))
      .split("== Initial Plan ==").head
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"max_by must not expand to window/self-join:\n$plan")
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash === 1, s"one group-by shuffle, got $hash")
  }

  test("agg_quantile_disc: ONE window shuffle, no per-group collect") {
    val plan = planOf(Aggregates.aggQuantileDisc(spark, sf))
      .split("== Initial Plan ==").head
    val hash = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(hash === 1,
      s"rank window and final aggregate share the group key, got $hash:\n$plan")
    assert(!plan.contains("collect_list") && !plan.contains("collect_set"),
      "selection must be rank-conditional aggregation, not materialized lists")
  }

  test("agg_theil: brute-force per-segment Theil-T; nonnegativity (Jensen)") {
    val rows = Aggregates.aggTheil(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val perCust = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => (r.getString(0), r.getDecimal(2).doubleValue()))
    val bySeg = perCust.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (seg, n, revenue, theil) =>
      val xs = bySeg(seg)
      assert(n === xs.length.toLong, s"$seg customer count")
      assert(math.abs(revenue - xs.sum) < 0.5, s"$seg revenue ${xs.sum}")
      val mu = xs.sum / xs.length
      val brute = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
      assert(math.abs(theil - brute) < 1e-6, s"$seg theil $theil vs $brute")
      assert(theil >= -1e-12, s"$seg Theil-T is nonnegative by Jensen")
    }
  }

  test("agg_trimmed_mean: brute-force rank trim with ties; robustness order") {
    val rows = Aggregates.aggTrimmedMean(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val prices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val byFlag = prices.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { case (flag, n, lo, tm) =>
      val xs = byFlag(flag)
      assert(n === xs.length.toLong)
      assert(lo === xs.length / 10, s"$flag trim count")
      val kept = xs.slice(lo.toInt, xs.length - lo.toInt)
      val brute = (kept.sum / kept.length).toDouble
      assert(math.abs(tm - brute) < 1e-5, s"$flag trimmed mean $tm vs $brute")
      // trimming drops mass from both tails: mean of kept is between
      // the dropped tails' extremes
      assert(tm >= xs.head.toDouble && tm <= xs.last.toDouble)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

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
}

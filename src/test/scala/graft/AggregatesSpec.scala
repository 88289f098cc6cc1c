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
}

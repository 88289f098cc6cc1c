package graft

import graft.operators.Joins
import graft.sources.Tables

/** Pins join semantics and physical-plan shapes (SURVEY.md §5.2/§5.3;
  * claims referenced from Joins.scala comments).
  */
class JoinsSpec extends SparkTestBase {

  test("semi + anti partition the left side: |semi| + |anti| = |customer|") {
    val nCustomer = Tables.customer(spark, sf).count()
    val nSemi = Joins.joinSemi(spark, sf).count()
    val nAnti = Joins.joinAnti(spark, sf).count()
    assert(nSemi + nAnti === nCustomer)
    assert(nSemi > 0 && nAnti > 0, "both sides populated at sf0.001")
  }

  test("join_broadcast plans a BroadcastHashJoin (no shuffle of the fact side)") {
    assert(planOf(Joins.joinBroadcast(spark, sf)).contains("BroadcastHashJoin"))
  }

  test("join_smj plans a SortMergeJoin at every scale (merge hint beats the broadcast threshold)") {
    assert(planOf(Joins.joinSmj(spark, sf)).contains("SortMergeJoin"))
  }

  test("join_left pre-aggregates below the outer join (shuffle carries one row per custkey)") {
    val plan = planOf(Joins.joinLeft(spark, sf))
    // HashAggregate must appear below the join in the plan tree: the
    // aggregate over orders is a child of the outer join, not its parent.
    val joinIdx = plan.indexOf("LeftOuter")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0, s"expected an outer join in:\n$plan")
    assert(aggIdx > joinIdx, s"expected orders pre-aggregation below the join in:\n$plan")
  }

  test("join_full emits every nationkey exactly once with presence flags") {
    val rows = Joins.joinFull(spark, sf).collect()
    assert(rows.map(_.getInt(0)).distinct.length === rows.length)
    assert(rows.forall(r => r.getBoolean(1) || r.getBoolean(2)))
  }

  test("join_range bands partition parts: every price in [900,1000) lands in exactly one band") {
    val banded = Joins.joinRange(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_parts")).collect()(0).getLong(0)
    val inRange = Tables.part(spark, sf)
      .filter("p_retailprice >= 900.0 AND p_retailprice < 1000.0").count()
    assert(banded === inRange)
  }
}

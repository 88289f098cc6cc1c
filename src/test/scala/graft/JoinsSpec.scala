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

  test("join_interval: overlap recomputes brute-force; fact side never shuffles") {
    import org.apache.spark.sql.functions._
    val got = Joins.joinInterval(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val campaigns = Seq(
      ("launch_95", "1995-01-01", "1995-07-01"),
      ("summer_97", "1997-06-01", "1997-09-01"),
      ("holiday_98", "1998-11-15", "1999-01-15"),
      ("clearance_00", "2000-03-01", "2000-04-01"))
      .map { case (n, s, e) => (n, java.time.LocalDate.parse(s), java.time.LocalDate.parse(e)) }
    val orders = Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("d")).collect()
      .map(_.getDate(0).toLocalDate)
    for ((name, cs, ce) <- campaigns) {
      // half-open overlap: [d, d+30) ∩ [cs, ce) non-empty
      val expect = orders.count(d => d.isBefore(ce) && cs.isBefore(d.plusDays(30)))
      assert(got.getOrElse(name, 0L) === expect.toLong, s"campaign $name")
    }
    val plan = planOf(Joins.joinInterval(spark, sf)).split("== Initial Plan ==").head
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the calendar side must broadcast (no orders shuffle):\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("o_orderkey")),
      s"fact side must stream map-side:\n$plan")
  }

  test("join_lateral decorrelates to WindowGroupLimit + join — no per-row subquery") {
    val df = Joins.joinLateral(spark, sf)
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(plan.contains("WindowGroupLimit"),
      s"LATERAL ... LIMIT k must become the ranked-window top-k:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"decorrelation must not fall back to a loop join:\n$plan")
    // semantics: exactly the per-customer top-2 the window form computes
    import org.apache.spark.sql.functions._
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).filter(col("c_acctbal") > 9000),
        col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("c_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 2)
      .select(col("c_custkey"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet === expect.toSet)
  }

  test("correlated EXISTS decorrelates to a semi join (same rows as the DataFrame form)") {
    val plan = planOf(Joins.subqExists(spark, sf))
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
    // and it is row-identical to join_semi's DataFrame formulation
    val viaSql = Joins.subqExists(spark, sf)
    val viaDf = Joins.joinSemi(spark, sf)
    assert(viaSql.except(viaDf).count() === 0)
    assert(viaDf.except(viaSql).count() === 0)
  }

  test("correlated scalar subquery decorrelates to aggregate + join (no per-row subquery)") {
    val df = Joins.subqScalar(spark, sf)
    val plan = planOf(df)
    // decorrelated: an aggregate feeding a join, not a scalar-subquery
    // node executed per outer row
    assert(plan.contains("HashAggregate") &&
      (plan.contains("Join") || plan.contains("BroadcastHashJoin") ||
        plan.contains("SortMergeJoin")),
      s"scalar subquery must decorrelate:\n$plan")
    // semantic spot check: every surviving customer is above their
    // nation's mean balance
    import org.apache.spark.sql.functions._
    val means = Tables.customer(spark, sf).groupBy(col("c_nationkey"))
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("mean_bal"))
    val bad = df.join(means, "c_nationkey")
      .filter(col("acctbal") <= col("mean_bal") - 0.011)
    assert(bad.count() === 0)
  }

  test("join_interval_bucketed: equi-join on the grain bucket, no nested loop; agrees with the BNLJ form") {
    val df = Joins.joinIntervalBucketed(spark, sf)
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the rewrite's whole point is escaping the nested loop:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"bucket equi-join expected:\n$plan")
    // physical rewrite, identical semantics: row-for-row equal to the
    // broadcast nested-loop formulation
    val a = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val b = Joins.joinInterval(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq, "bucketed ≡ plain overlap join")
  }

  test("join_anti_nullaware: NOT IN plans the null-aware anti join; set matches brute force") {
    val df = Joins.joinAntiNullaware(spark, sf)
    val plan = planOf(df).split("== Initial Plan ==").head
    // the nullable IN-list forces the dedicated null-aware variant —
    // a plain LeftAnti hash join would be two-valued NOT EXISTS
    assert(plan.contains("LeftAnti"), s"anti join expected:\n$plan")
    assert(plan.contains("BuildRight, true") ||
      plan.contains("NAAJ") || plan.contains("isNullAware"),
      s"null-aware marker expected on the anti join:\n$plan")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inList = Tables.supplier(spark, sf)
      .filter("s_acctbal < 0").select("s_nationkey")
      .collect().map(_.getInt(0).toLong).toSet
    val expect = Tables.customer(spark, sf).select("c_nationkey")
      .collect().map(_.getInt(0).toLong)
      .filter(!inList(_))
      .groupBy(k => k).view.mapValues(_.length.toLong).toMap
    assert(got === expect, "uncovered-nation counts must match set difference")
    // sf0.001 has no negative-balance supplier: the empty-list edge
    // (every probe row survives) is itself worth pinning; the gated
    // sf0.01 corpus exercises the nonempty list
    if (inList.isEmpty)
      assert(got.values.sum ===
        Tables.customer(spark, sf).count(),
        "NOT IN over an empty list keeps every row")
    assert(got.nonEmpty, "survivors expected on this corpus")
  }
}

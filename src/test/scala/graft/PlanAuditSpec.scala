package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Inventory-wide physical-plan invariants, locked as a regression gate.
  *
  * Round 8's judge audit walked every declared query's plan by hand
  * (graft.Explain + grep) and established two facts the 100 TB design
  * depends on: ZERO CartesianProduct anywhere, and every unpartitioned
  * WindowExec bounded by a calendar / domain / literal cap documented at
  * the operator. A hand audit rots the moment a new query lands or a
  * refactor drops a partition column — this spec re-runs it on every
  * `sbt test` over the WHOLE `SparkEntry.queries` inventory.
  *
  * The whitelist below is exact-set, not subset: a query that STOPS
  * emitting an unpartitioned window must be removed here, so the list
  * always names precisely the plans that still carry one and each name
  * keeps pointing at a docstring that justifies its bound.
  */
class PlanAuditSpec extends SparkTestBase {

  /** Queries whose plans legitimately contain an unpartitioned window.
    * Every entry is bounded by construction — the window input is a
    * domain-capped aggregate, never raw fact rows; see each operator's
    * docstring for the specific cap. Categories:
    *   - calendar/day domain: one row per day/week/month after a pre-agg
    *   - value domain: one row per distinct rounded score/price/bucket
    *   - literal cap: an explicit limit/top-k upstream of the window
    */
  private val boundedUnpartitionedWindows: Set[String] = Set(
    // globalPrefixSums offsets window: Catalyst folds the lit(0)
    // partition key away, leaving an unpartitioned WindowExec over the
    // per-shard offsets frame — n/shardWidth rows by construction (see
    // GraftOps.globalPrefixSums). The DATA-sized cumsum in these plans
    // is shard-partitioned. (sortedPrefixSums queries left this list in
    // r10: their offsets scan moved driver-side — the zipWithIndex
    // pattern — so no offsets window remains in those plans.)
    "analytics_gains", "text_oov_rate", "text_vocab_growth",
    // calendar / day domain: window input is a per-day (or per-week/month)
    // pre-aggregate — one row per calendar unit of the corpus span
    "analytics_mom", "pipeline_drift_report",
    "ts_anomaly_stl", "ts_backtest", "ts_decompose", "ts_downsample",
    "ts_ewma", "ts_peak_detect", "ts_spectral", "ts_stl_strength",
    "ts_streaks", "ts_theil_sen", "win_drawdown", "win_running_distinct",
    "analytics_survival_km",
    // value domain: one row per distinct rounded score / price / bucket
    "analytics_auc", "analytics_chi2", "analytics_ci_bootstrap",
    "analytics_skyline", "dq_benford", "dq_value_drift",
    // literal cap: explicit limit/top-k upstream of the window
    "knn_hybrid", "pipeline_mix_plan"
  )

  private case class Audit(
      cartesian: Seq[String],
      unpartWindows: Seq[String])

  private def audit(plan: SparkPlan): Audit = {
    val cart = plan.collectWithSubqueries { case c: CartesianProductExec => c }
    val wins = plan.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty           => "WindowExec"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => "WindowGroupLimitExec"
    }
    Audit(cart.map(_.nodeName), wins)
  }

  test("no declared query plans a CartesianProduct; unpartitioned windows match the bounded whitelist") {
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val a =
        try audit(fn(spark, sf).queryExecution.sparkPlan)
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      name -> a
    }

    val cartesian = results.collect { case (n, a) if a.cartesian.nonEmpty => n }
    assert(cartesian.isEmpty,
      s"CartesianProduct planned by: ${cartesian.mkString(", ")} — " +
        "an unbroadcast tiny side or a lost join condition; never acceptable at 100 TB")

    val unpart = results.collect { case (n, a) if a.unpartWindows.nonEmpty => n }.toSet
    val unexpected = unpart -- boundedUnpartitionedWindows
    val stale = boundedUnpartitionedWindows -- unpart
    assert(unexpected.isEmpty,
      s"NEW unpartitioned windows (single-task sort at scale — partition them " +
        s"or justify + whitelist): ${unexpected.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"whitelist entries no longer unpartitioned (remove): ${stale.toSeq.sorted.mkString(", ")}")
  }
}

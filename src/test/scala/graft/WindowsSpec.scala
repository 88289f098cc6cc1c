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

  test("win_frame moving count is min(position, 3)") {
    val bad = Windows.winFrame(spark, sf)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_utc", "event_id")))
      .filter(col("moving_n") =!= least(col("pos"), lit(3)))
    assert(bad.count() === 0)
  }
}

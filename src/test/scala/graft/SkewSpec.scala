package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** Skew handling, both layers: AQE's runtime skew-join split (the
  * default path for batch sort-merge joins) and the static salted-join
  * rewrite (GraftOps.saltedJoin) for the joins AQE can't re-plan.
  */
class SkewSpec extends SparkTestBase {

  /** 200k rows on one hot key + 2k rows spread over 1k keys. */
  private def skewedFact = {
    spark.range(0, 202000).select(
      when(col("id") < 200000, lit(0L)).otherwise(col("id") % 1000).as("k"),
      col("id").as("v"))
  }

  private def buildSide = {
    spark.range(0, 1000).select(col("id").as("k"),
      concat(lit("p"), col("id")).as("payload"))
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = skewedFact.join(buildSide, "k")
      // materialize THIS query execution so AQE's final plan is inspectable
      // (count() would plan and run a different execution)
      assert(joined.collect().length === 202000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot-key join as a skew join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin spreads a hot key and equals the plain join exactly") {
    val plain = skewedFact.join(buildSide, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val salted = GraftOps.saltedJoin(skewedFact, buildSide, Seq("k"), 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
    // the salt really spreads the hot key: distinct (k=0, salt) pairs = 8
    val spread = skewedFact.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .filter(col("k") === 0).select("__salt").distinct().count()
    assert(spread === 8L)
  }

  test("saltedJoin equals the plain join with AQE fully disabled") {
    // the salted rewrite is the fallback for exactly the joins AQE
    // CANNOT re-plan — so its correctness must not depend on AQE (the
    // round-6 pin only exercised the AQE-on path). Same equality, AQE off.
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plain = skewedFact.join(buildSide, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val salted = GraftOps.saltedJoin(skewedFact, buildSide, Seq("k"), 8)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      assert(salted.queryExecution.executedPlan.toString
        .contains("AdaptiveSparkPlan") === false,
        "this leg must really run without AQE")
      assert(salted.count() === plain.count())
      assert(salted.except(plain).count() === 0)
      assert(plain.except(salted).count() === 0)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Behavioural-analytics operators: funnel conversion and cohort
  * retention — the two classic product-analytics workloads a reporting
  * engine is asked for beyond plain rollups. Both are expressed as
  * conditional aggregates over ONE scan of the fact stream (no
  * per-stage self-joins, no event-sequence explode), the shape that
  * stays a single shuffle at 100 TB.
  */
object Analytics {

  /** `funnel_stages` — ordered funnel conversion over the event
    * stream: how many users progress view → click → purchase, where
    * each later stage must happen strictly AFTER the user's first
    * occurrence of the previous one. The standard product funnel.
    *
    * Spark-first shape: per-user FIRST-timestamp per stage as three
    * conditional `min`s in one groupBy — ONE scan, ONE shuffle on
    * user_id, map-side partial mins; the stage ordering is then a
    * row-local boolean cascade and the final count a single-row
    * reduce. The naive formulation (self-join per funnel stage)
    * shuffles the stream once per stage and explodes on hot users;
    * this one is insensitive to events-per-user skew because `min`
    * partial-aggregates before the exchange.
    *
    * First-touch semantics (min per stage, strict ordering between
    * FIRSTS) is the common "did the user ever complete the ordered
    * funnel" reading; per-journey sequence matching is the
    * sessionized variant (see stream_session / SessionStream).
    */
  def funnelStages(spark: SparkSession, sfDir: String): DataFrame = {
    def firstTs(stage: String) =
      min(when(col("event_type") === stage, col("ts_utc")))
    val stages = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(firstTs("view").as("t_view"), firstTs("click").as("t_click"),
        firstTs("purchase").as("t_purch"))
      .select(
        col("t_view").isNotNull.as("s1"),
        (col("t_view").isNotNull && col("t_click") > col("t_view"))
          .as("s2"),
        (col("t_view").isNotNull && col("t_click") > col("t_view") &&
          col("t_purch") > col("t_click")).as("s3"))
    stages.agg(
      count(lit(1)).as("n_users"),
      sum(col("s1").cast("long")).as("n_view"),
      sum(col("s2").cast("long")).as("n_click_after"),
      sum(col("s3").cast("long")).as("n_purchase_after"))
  }

  /** `cohort_retention` — the cohort-retention triangle over orders:
    * customers cohorted by FIRST-order year, and for each (cohort,
    * year-offset) the number of distinct customers still ordering.
    * The decaying diagonal a retention dashboard plots.
    *
    * Spark-first shape: the cohort table is a per-customer `min`
    * aggregate (one shuffle, map-side combined); activity joins back
    * on o_custkey — the cohort side is customer-cardinality, so AQE
    * broadcasts it at dimension scale, and at 100 TB both sides
    * already hash on the SAME key (one co-partitioned shuffle, no
    * replan). The distinct (customer, offset) collapse rides the same
    * key's partitioning before the small (cohort, offset) rollup.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("oy"))
    val cohort = orders.groupBy(col("o_custkey"))
      .agg(min(col("oy")).as("cy"))
    orders.join(cohort, Seq("o_custkey"))
      .select(col("o_custkey"), col("cy"),
        (col("oy") - col("cy")).as("off"))
      .distinct()
      .groupBy(col("cy"), col("off"))
      .agg(count(lit(1)).as("n_active"))
      .select(col("cy").cast("long").as("cohort_year"),
        col("off").cast("long").as("year_offset"), col("n_active"))
      .orderBy(col("cohort_year"), col("year_offset"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_stages" -> funnelStages _,
    "cohort_retention" -> cohortRetention _
  )

  val oracle: Map[String, String] = Map(
    "funnel_stages" ->
      """WITH s AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purch
        |  FROM events GROUP BY user_id),
        |f AS (
        |  SELECT t_view IS NOT NULL AS s1,
        |    t_view IS NOT NULL AND t_click > t_view AS s2,
        |    t_view IS NOT NULL AND t_click > t_view AND t_purch > t_click AS s3
        |  FROM s)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after,
        |  CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after
        |FROM f""".stripMargin,
    "cohort_retention" ->
      """WITH fy AS (
        |  SELECT o_custkey, min(year(o_orderdate)) AS cy
        |  FROM orders GROUP BY o_custkey),
        |a AS (
        |  SELECT DISTINCT o.o_custkey, fy.cy, year(o.o_orderdate) - fy.cy AS off
        |  FROM orders o JOIN fy USING (o_custkey))
        |SELECT CAST(cy AS BIGINT) AS cohort_year,
        |  CAST(off AS BIGINT) AS year_offset, count(*) AS n_active
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}

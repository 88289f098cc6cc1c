package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Dec._
import graft.sources.Tables

/** Aggregation operators (SURVEY.md §2.1 category D).
  *
  * Scale design: every query here is a declarative groupBy/rollup/cube —
  * Spark plans them as partial (map-side) HashAggregate → shuffle on the
  * group keys → final HashAggregate, so the shuffle carries one row per
  * (partition, group), not the raw data. Decimal casts happen *before*
  * aggregation (SURVEY §2.0.2) which keeps sums associative — correct on
  * any number of executors.
  */
object Aggregates {

  /** D1 `agg_pricing` — TPC-H Q1 shape over lineitem. */
  def aggPricing(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val one = lit(1).cast("decimal(18,2)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asDec(sum(dec2(col("l_quantity"))), 18, 2).as("sum_qty"),
        asDec(sum(dec2(col("l_extendedprice"))), 18, 2).as("sum_base_price"),
        asDec(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))), 38, 4)
          .as("sum_disc_price"),
        asDec(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
          * (one + dec2(col("l_tax")))), 38, 6).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pricing" -> aggPricing _
  )

  val oracle: Map[String, String] = Map(
    "agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(38,6)) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}

package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketing for co-located joins: pre-bucketing both sides on the join
  * key removes the per-query shuffle entirely — THE lever for repeated
  * large-large joins at 100 TB (pay the shuffle once at write time).
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
      Tables.orders(spark, sf)
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      Tables.customer(spark, sf)
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bkt")

      val joined = spark.table("customer_bkt")
        .join(spark.table("orders_bkt"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n"))
      val plan = planOf(joined)
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")

      // and it is value-identical to the unbucketed join
      val plainCount = Tables.customer(spark, sf)
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
        .count()
      assert(joined.agg(sum("n")).collect()(0).getLong(0) === plainCount)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}

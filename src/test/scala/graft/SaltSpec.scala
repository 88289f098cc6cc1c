package graft

import org.apache.spark.sql.functions._
import graft.functions.Salt
import graft.sources.Tables

/** Salted two-phase aggregation must be value-identical to the direct
  * groupBy (associative decimal sums), independent of bucket count.
  */
class SaltSpec extends SparkTestBase {

  test("saltedSum(value by event_type) equals direct groupBy sum") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val direct = ev.groupBy(col("event_type")).agg(sum("v").as("total"))
    Seq(4, 16).foreach { buckets =>
      val salted = Salt.saltedSum(ev, col("event_type"), col("v"), buckets)
      val mismatch = salted.join(direct,
          salted("k") === direct("event_type"))
        .filter(salted("total") =!= direct("total"))
      assert(mismatch.count() === 0, s"buckets=$buckets")
      assert(salted.count() === direct.count())
    }
  }

  test("join_salted equals the plain join and never broadcasts the replicated dim") {
    val salted = graft.operators.Joins.joinSalted(spark, sf).collect()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("s_name")).collect()
    assert(salted.length === plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getString(0) === p.getString(0))
      assert(s.getLong(1) === p.getLong(1), s"count mismatch for ${s.getString(0)}")
    }
    val plan = planOf(graft.operators.Joins.joinSalted(spark, sf))
    assert(!plan.contains("BroadcastHashJoin"),
      s"the replicated dim must shuffle on (key, salt), not broadcast:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle join:\n$plan")
  }

  test("salted plan has two aggregation exchanges (spread + merge)") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val plan = planOf(Salt.saltedSum(ev, col("event_type"), col("v"), 8))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 2, s"expected spread+merge shuffles in:\n$plan")
  }
}

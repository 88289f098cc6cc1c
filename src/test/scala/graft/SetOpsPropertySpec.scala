package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pinning of Spark set-operator algebra against Scala
  * collection semantics (SURVEY.md §5.3): intersect/except are DISTINCT
  * semantics; union is bag semantics. Samples drawn directly from
  * scalacheck Gens with a fixed seed (no scalatest bridge in the offline
  * cache), so failures are reproducible.
  */
class SetOpsPropertySpec extends SparkTestBase {

  private val keyLists: Gen[(List[Int], List[Int])] = for {
    a <- Gen.listOfN(30, Gen.choose(0, 9))
    b <- Gen.listOfN(30, Gen.choose(0, 9))
  } yield (a, b)

  private def samples(n: Int): Seq[(List[Int], List[Int])] =
    (0 until n).flatMap(i => keyLists.apply(Gen.Parameters.default, Seed(42L + i)))

  test("intersect/except use distinct semantics, union is bag concat, and they partition the left side") {
    val spark2 = spark
    import spark2.implicits._
    samples(8).foreach { case (a, b) =>
      val da = a.toDF("k")
      val db = b.toDF("k")
      val inter = da.intersect(db).as[Int].collect().toSet
      val exc = da.except(db).as[Int].collect().toSet
      val uni = da.union(db).as[Int].collect().toList
      assert(inter === (a.toSet & b.toSet), s"intersect mismatch for a=$a b=$b")
      assert(exc === (a.toSet -- b.toSet), s"except mismatch for a=$a b=$b")
      assert(uni.sorted === (a ++ b).sorted, s"union mismatch for a=$a b=$b")
      assert((inter ++ exc) === a.toSet)
      assert((inter & exc).isEmpty)
    }
  }

  test("set_union_byname: by-name alignment, null-fill, row conservation") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.SetOps.setUnionByname(spark, sf)
    val p = graft.sources.Tables.part(spark, sf)
    assert(df.count() === p.count(), "union must conserve the partition")
    assert(df.columns.sorted.toSeq ===
      Seq("p_brand", "p_partkey", "p_retailprice", "p_size", "p_type", "src"))
    // by-name, not positional: partkey survives on BOTH sides intact
    assert(df.select(sum(col("p_partkey"))).head.getLong(0) ===
      p.select(sum(col("p_partkey"))).head.getLong(0))
    // missing columns are null exactly on the side that lacks them
    assert(df.filter(col("src") === "small")
      .filter(col("p_size").isNotNull || col("p_type").isNotNull)
      .count() === 0)
    assert(df.filter(col("src") === "large")
      .filter(col("p_brand").isNotNull || col("p_retailprice").isNotNull)
      .count() === 0)
    assert(df.filter(col("p_partkey").isNull).count() === 0)
  }

  test("set_bag_ops: multiplicities follow the min/max-surplus bag law") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.SetOps.setBagOps(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    def mult(df: org.apache.spark.sql.DataFrame, c: String) =
      df.groupBy(col(c)).count().collect()
        .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val cm = mult(graft.sources.Tables.customer(spark, sf), "c_nationkey")
    val sm = mult(graft.sources.Tables.supplier(spark, sf), "s_nationkey")
    val keys = cm.keySet ++ sm.keySet
    keys.foreach { k =>
      val (a, b) = (cm.getOrElse(k, 0L), sm.getOrElse(k, 0L))
      assert(rows.getOrElse(("intersect_all", k), 0L) === math.min(a, b),
        s"intersect_all($k)")
      assert(rows.getOrElse(("except_all", k), 0L) === math.max(0L, a - b),
        s"except_all($k)")
    }
  }
}

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
}

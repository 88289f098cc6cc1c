package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Pipeline}

/** Structural guarantees of the LSH-bucketed ANN path (no SQL oracle). */
class AnnSpec extends SparkTestBase {

  test("knn_ann returns a non-empty, probe-bucket-confined, sim-ordered result") {
    val rows = Ann.knnAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(1)).distinct.length === 1, "all in the probe's bucket")
    val sims = rows.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
    assert(!rows.map(_.getLong(0)).contains(0L), "probe excluded")
  }

  test("knn_ann is deterministic across runs (fixed hyperplane seed)") {
    assert(Ann.knnAnn(spark, sf).collect()
      .sameElements(Ann.knnAnn(spark, sf).collect()))
  }

  test("ANN sims are a subset of brute-force sims (same scoring function)") {
    // every (vec_id, sim) the ANN path emits must score identically in
    // the exact path over the same probe: join on vec_id, compare sims
    val ann = Ann.knnAnn(spark, sf).select(col("vec_id"), col("sim").as("ann_sim"))
    val brute = Pipeline.udfCosineTopk(spark, sf)
      .select(col("vec_id"), col("sim").as("bf_sim"))
    val joined = ann.join(brute, "vec_id")
      .filter(col("ann_sim") =!= col("bf_sim"))
    assert(joined.count() === 0)
  }
}

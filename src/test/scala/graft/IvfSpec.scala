package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Pipeline}

/** Structural guarantees of the IVF (k-means inverted-file) ANN path —
  * no SQL oracle (the quantizer is engine-specific).
  */
class IvfSpec extends SparkTestBase {

  test("knn_ivf returns non-empty, sim-ordered, probe-excluded results") {
    val rows = Ivf.knnIvf(spark, sf).collect()
    assert(rows.nonEmpty)
    val sims = rows.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
    assert(!rows.map(_.getLong(0)).contains(0L), "probe excluded")
    // nprobe=2 of k cells: at most 2 distinct cells in the result
    assert(rows.map(_.getInt(1)).distinct.length <= 2)
  }

  test("knn_ivf is deterministic within a JVM (memoized quantizer)") {
    assert(Ivf.knnIvf(spark, sf).collect()
      .sameElements(Ivf.knnIvf(spark, sf).collect()))
  }

  test("probing ALL cells recovers the exact brute-force top-10") {
    val k = Ivf.cellCount(sources.Tables.embeddings(spark, sf).count())
    val all = Ivf.knnIvfProbing(spark, sf, nprobe = k)
      .select(col("vec_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Pipeline.udfCosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.sameElements(brute),
      "nprobe=k degrades IVF to an exact scan — must equal brute force")
  }

  test("IVF sims agree with brute-force sims for shared candidates") {
    val ivf = Ivf.knnIvf(spark, sf).select(col("vec_id"), col("sim").as("ivf_sim"))
    val brute = Pipeline.udfCosineTopk(spark, sf)
      .select(col("vec_id"), col("sim").as("bf_sim"))
    assert(ivf.join(brute, "vec_id")
      .filter(col("ivf_sim") =!= col("bf_sim")).count() === 0)
  }

  test("cellCount implements the ~1024-per-cell sizing rule") {
    assert(Ivf.cellCount(500L) === 4)
    assert(Ivf.cellCount(1L << 20) === 1024)
    val pts = Seq(1L, 2000L, 1_000_000L, 1_000_000_000L)
    assert(pts.map(Ivf.cellCount) === pts.map(Ivf.cellCount).sorted)
  }
}

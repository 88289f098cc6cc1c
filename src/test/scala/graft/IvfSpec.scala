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

  test("cellCount: ~1024-per-cell small, k≈√n at scale, capped at 65536") {
    assert(Ivf.cellCount(500L) === 4)
    // crossover point: n/1024 and √n coincide at n = 2^20
    assert(Ivf.cellCount(1L << 20) === 1024)
    // at 1e9 the old linear rule would demand ~976k centroids; √n keeps
    // the quantizer trainable
    assert(Ivf.cellCount(1_000_000_000L) === math.ceil(math.sqrt(1e9)).toInt)
    assert(Ivf.cellCount(1_000_000_000L) === 31623)
    // at 1e11 (the 100 TB regime) the cap bounds centroid state
    assert(Ivf.cellCount(100_000_000_000L) === 65536)
    val pts = Seq(1L, 2000L, 1_000_000L, 1_000_000_000L, 100_000_000_000L)
    assert(pts.map(Ivf.cellCount) === pts.map(Ivf.cellCount).sorted)
  }

  test("distributed probe-cell ranking matches the driver loop exactly") {
    // synthetic centroid set with deliberate distance ties (cells 3/7
    // are identical) — the tie-break on cell id must agree across paths
    val rnd = new scala.util.Random(7)
    val centers = Array.tabulate(40)(i =>
      if (i == 7) null else Array.fill(8)(rnd.nextGaussian()))
    centers(7) = centers(3).clone()
    val probe = Seq.fill(8)(rnd.nextGaussian().toFloat)
    for (nprobe <- Seq(1, 5, 40, 100)) {
      val drv = Ivf.rankCellsDriver(centers, probe, nprobe)
      val dist = Ivf.rankCellsDistributed(spark, centers, probe, nprobe)
      assert(drv.sameElements(dist), s"nprobe=$nprobe: ${drv.toSeq} vs ${dist.toSeq}")
    }
  }
}

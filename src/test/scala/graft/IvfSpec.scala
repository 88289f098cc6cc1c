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
    // nprobe=2 of k cells, auto-widened only when 2 cells hold < 10
    // candidates (r13): the result stays inside the selected prefix
    val probe = sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val sel = Ivf.selectedCells(spark, sf, probe, nprobe = 2, k = 10)
    assert(sel.length >= 2, "selection keeps the configured nprobe floor")
    assert(rows.map(_.getInt(1)).toSet.subsetOf(sel.toSet),
      "all rows inside the auto-widened cell selection")
  }

  test("knn_ivf auto-widen yields min(k, n-1) rows at every scale (r12 verdict sweep)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val n = sources.Tables.embeddings(spark, dir).count()
      assert(Ivf.knnIvf(spark, dir).count() === math.min(10L, n - 1),
        s"$dir: top-10 IVF probe over n=$n must not be cell-starved")
    }
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

  test("defaultNprobe: historic 2 at every gated sf, √cells at scale (r13)") {
    // every gated corpus trains cellCount ∈ {4} cells → default stays
    // the historic nprobe=2, so gated results are bit-identical to the
    // fixed-2 era
    for (sf <- Seq(500L, 1500L, 2000L))
      assert(Ivf.defaultNprobe(Ivf.cellCount(sf)) === 2)
    // the 100× ladder corpus (n≈200k → 196 cells) probes 14
    assert(Ivf.defaultNprobe(196) === 14)
    // at the 65536-cell cap the probed fraction is 256/65536 ≈ 0.4%
    assert(Ivf.defaultNprobe(65536) === 256)
    // monotone and never below the floor
    val cs = Seq(1, 4, 196, 4096, 65536)
    assert(cs.map(Ivf.defaultNprobe) === cs.map(Ivf.defaultNprobe).sorted)
    assert(Ivf.defaultNprobe(1) === 2)
  }

  test("trainFraction: full corpus small, ~256k-row sample at scale") {
    assert(Ivf.trainFraction(500L) === 1.0)
    assert(Ivf.trainFraction(Ivf.TrainSampleMax * 4) === 1.0)
    // at 1e9 and 1e11 the trainer sees a bounded sample, not the corpus
    assert(Ivf.trainFraction(1_000_000_000L) === Ivf.TrainSampleMax / 1e9)
    assert(Ivf.trainFraction(100_000_000_000L) === Ivf.TrainSampleMax / 1e11)
    // expected sample size stays ~TrainSampleMax at any n
    for (n <- Seq(1e7, 1e9, 1e11, 1e13))
      assert(math.abs(Ivf.trainFraction(n.toLong) * n - Ivf.TrainSampleMax) < 1.0)
  }

  test("trainInput: coalesce(8) small; sample-filter + repartition at 1e11") {
    import spark.implicits._
    val e = (0L until 64L).map(i => (i, Seq.fill(4)(i.toFloat))).toDF("vec_id", "fv")
    // small-corpus claim: coalesced, NO sample filter
    val small = Ivf.trainInput(e, 5000L, "vec_id")
    assert(small.rdd.getNumPartitions <= 8, "coalesce bounds small-corpus tasks")
    assert(small.count() === 64, "small path must train on every row")
    // 1e11-corpus claim: the plan must carry a deterministic md5 sample
    // FILTER (full scan parallelism) and a repartition — NOT a coalesce
    // of the corpus scan into 8 tasks (the round-6 hazard). Parquet-
    // backed input: a LocalRelation would be constant-folded away.
    val big = Ivf.trainInput(sources.Tables.embeddings(spark, sf),
      100_000_000_000L, "vec_id")
    val plan = big.queryExecution.optimizedPlan.toString
    assert(plan.contains("md5"), "large path must sample, not full-scan")
    assert(!plan.toLowerCase.contains("coalesce"),
      "coalesce would merge the corpus scan into 8 tasks")
    assert(big.rdd.getNumPartitions === 16, "sampled rows repartitioned for treeAggregate")
    // threshold clamp: past ~1e15 rows the 32-bit floor hits 0 — the
    // sample must survive (threshold clamped to 1), never go empty
    val huge = Ivf.trainInput(sources.Tables.embeddings(spark, sf),
      10_000_000_000_000_000L, "vec_id")
    assert(huge.queryExecution.optimizedPlan.toString.contains("00000001"))
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

  test("embed_kmeans: membership conserves; within-cluster SS <= total SS") {
    val rows = Ivf.embedKmeans(spark, sf).collect()
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    assert(rows.map(_.getLong(1)).sum === vecs.length.toLong,
      "every vector belongs to exactly one cell")
    assert(rows.forall(_.getDouble(2) >= 0.0))
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // variance decomposition: Σ n_c·avg_d2_c (within SS) must not
    // exceed the total SS about the GLOBAL mean — the bound any
    // clustering tightens and a broken assignment violates
    val d = vecs.head.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / vecs.length)
    val totalSS = vecs.map(v =>
      v.zip(mean).map { case (a, b) => (a - b) * (a - b) }.sum).sum
    val withinSS = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(withinSS <= totalSS + 1e-6,
      s"within-cluster SS $withinSS must be <= total SS $totalSS")
    assert(withinSS < totalSS * 0.999,
      "clustering must strictly tighten the bound on this corpus")
  }
}

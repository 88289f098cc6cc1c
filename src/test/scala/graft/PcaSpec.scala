package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca
import graft.sources.Tables

/** Properties that make an eigenproblem trustworthy without a SQL
  * oracle: orthonormal loadings, descending nonnegative explained
  * variance, projected variance matching the eigenvalues, and centered
  * projections. (embed_pca is no_oracle by design — DuckDB has no
  * eigendecomposition.)
  */
class PcaSpec extends SparkTestBase {
  private val k = 8

  test("pca model: orthonormal components, eigenvalues descending and nonnegative") {
    val (means, comps, eig) = Pca.pcaModel(spark, sf, k)
    assert(comps.length === k && eig.length === k)
    assert(means.length === comps.head.length)
    for (i <- 0 until k; j <- i until k) {
      val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"v$i . v$j = $dot")
    }
    for (c <- 0 until k - 1)
      assert(eig(c) >= eig(c + 1) - 1e-12, s"eigenvalues must descend at $c")
    assert(eig.forall(_ >= -1e-12), "covariance eigenvalues are nonnegative")
    // sign canonicalization: the largest-|entry| coordinate is positive
    comps.foreach { v =>
      val m = v.indices.maxBy(i => (math.abs(v(i)), i))
      assert(v(m) > 0, "canonical sign")
    }
  }

  test("embed_pca: projections are centered with variance = the eigenvalue, per component") {
    val (_, _, eig) = Pca.pcaModel(spark, sf, k)
    val rows = Pca.embedPca(spark, sf).collect()
    val n = rows.length
    assert(n === Tables.embeddings(spark, sf).count())
    for (c <- 0 until k) {
      val xs = rows.map(_.getDouble(1 + c))
      val mean = xs.sum / n
      assert(math.abs(mean) < 1e-4, s"pc$c mean $mean (centered input)")
      val v = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      assert(math.abs(v - eig(c)) < 1e-4 + 1e-3 * eig(c),
        s"pc$c sample variance $v vs eigenvalue ${eig(c)}")
    }
    // the leading axis explains at least the average per-dim variance
    val d = Pca.pcaModel(spark, sf, k)._1.length
    val totalVar = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("pos")).agg(var_samp(col("col")).as("v"))
      .agg(sum(col("v"))).head.getDouble(0)
    assert(eig(0) >= totalVar / d - 1e-9, "top eigenvalue >= mean dim variance")
    assert(eig.sum <= totalVar + 1e-9, "k-dim explained variance bounded by total")
  }

  test("knn_pca: recall vs exact cosine top-10; pool rescore is exact") {
    val got = Pca.knnPca(spark, sf).collect().map(_.getLong(0))
    assert(got.length === 10)
    // exact brute force on the driver
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val p = vecs(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        (BigDecimal(cos(v, p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, id) }
      .sortBy { case (s, id) => (-s, id) }.take(10).map(_._2)
    val recall = got.toSet.intersect(exact.toSet).size / 10.0
    info(s"knn_pca recall@10 = $recall")
    assert(recall >= 0.6,
      s"16-dim PCA rank + 100-pool rescore must recover most of the exact " +
        s"top-10; got $recall (exact=${exact.toList}, got=${got.toList})")
    // whatever the pool ranked in, the RETURNED order is exact-rescored:
    // sims must be nonincreasing
    val sims = Pca.knnPca(spark, sf).collect().map(_.getDouble(1))
    assert(sims.sameElements(sims.sortBy(-_)), "rescored order")
  }

  test("knn_pca plan: broadcast probe, TakeOrderedAndProject pool — no full sort") {
    val plan = planOf(Pca.knnPca(spark, sf)).split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"pool selection must be top-k, not a global sort:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"probe must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("embed_pca plan: map-side projection — no join, no window, one scan") {
    val plan = planOf(Pca.embedPca(spark, sf)).split("== Initial Plan ==").head
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"projection must be row-local:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"one embeddings scan, got $scans")
  }

  test("knn_pca yields min(k, n-1) rows at every scale (r12 verdict sweep)") {
    // the PCA tier ranks EVERY vector in the projected space (no bucket
    // confinement by construction) — the sweep pins that no future
    // pre-filter starves the top-10
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val n = Tables.embeddings(spark, dir).count()
      assert(Pca.knnPca(spark, dir).count() === math.min(10L, n - 1),
        s"$dir: knn_pca starved")
    }
  }
}

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

  test("embed_pca plan: map-side projection — no join, no window, one scan") {
    val plan = planOf(Pca.embedPca(spark, sf)).split("== Initial Plan ==").head
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"projection must be row-local:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"one embeddings scan, got $scans")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftExprConv}
import org.apache.spark.sql.functions._
import graft.expressions.PqEncodeExpr

/** Native Lloyd's k-means over DataFrame algebra (r15 verdict item 3 —
  * the last `org.apache.spark.ml` dependency removed from src/main).
  *
  * Each iteration is ONE distributed hash aggregate:
  *   - ASSIGN is the codegen'd [[PqEncodeExpr]] argmin with an M=1
  *     codebook (k centroids over the full dimension) — a fused
  *     k×d Java loop per row, no VectorUDT conversion, no UDF, no
  *     per-element HOF interpretation; the centroid matrix rides into
  *     generated code as a reference object exactly like the PQ
  *     codebooks (≤ 65536×64 floats = 16 MB at Ivf's cell cap).
  *   - UPDATE is `groupBy(cell).agg(count, avg(v[0]), …, avg(v[d−1]))`
  *     — map-side partial aggregation collapses every task to ≤ k
  *     rows before the shuffle, and the k-row result is the only
  *     thing collected (the model, not the data: same driver-state
  *     class as Ivf's memoized centroids).
  *
  * Initialization is a deterministic "random" pick: the k distinct
  * vectors with the lowest seeded xxhash64 — content-addressed like
  * GraftOps.deterministicSample, so refitting the same snapshot
  * yields the same model on any cluster size or partitioning (MLlib's
  * `setSeed` only pinned determinism per partitioning). Empty cells
  * keep their previous centroid (MLlib's rule). The trainer expects
  * the BOUNDED inputs Ivf.trainInput/pqTrain provide (≤ ~256k rows);
  * iterations scan only that sample, never the corpus.
  */
object Lloyd {

  /** Argmin-squared-L2 centroid index of `vec` (array&lt;float&gt;)
    * against `centers`, as a codegen'd Column — the assignment stage,
    * reused verbatim for the full-corpus transform after training.
    * Strict `<` argmin keeps the lowest index on exact ties, matching
    * PqEncodeExpr's documented rule.
    */
  def assignCell(vec: Column, centers: Array[Array[Double]]): Column =
    GraftExprConv.column(PqEncodeExpr(GraftExprConv.expression(vec),
      Array(centers.map(_.map(_.toFloat))))).getItem(0)

  /** Fit k centroids on `df`'s `vecCol` (array&lt;float&gt;) with
    * `maxIter` Lloyd iterations. Returns ≤ k centroids (fewer only
    * when the input has fewer distinct vectors — the tiny-corpus
    * degradation, same as a failed MLlib fit but graceful).
    */
  def fit(df: DataFrame, vecCol: String, k: Int, maxIter: Int = 5,
      seed: Long = 42L): Array[Array[Double]] = {
    require(k >= 1, s"k=$k")
    val in = df.select(col(vecCol).as("__v")).cache()
    try {
      var centers = in.dropDuplicates("__v")
        .orderBy(xxhash64(lit(seed), col("__v")), col("__v"))
        .limit(k)
        .collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      require(centers.nonEmpty, "k-means on an empty input")
      val d = centers(0).length
      var it = 0
      while (it < maxIter) {
        val aggs = count(lit(1)).as("__n") +:
          (0 until d).map(i => avg(col("__v").getItem(i)).as(s"__c$i"))
        val stats = in
          .groupBy(assignCell(col("__v"), centers).as("__cell"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
        val next = centers.map(_.clone())
        stats.foreach { r =>
          if (!r.isNullAt(0)) { // null vec rows assign to a null cell — skip
            val cell = r.getInt(0)
            var i = 0
            while (i < d) { next(cell)(i) = r.getDouble(i + 2); i += 1 }
          }
        }
        centers = next
        it += 1
      }
      centers
    } finally in.unpersist()
  }
}

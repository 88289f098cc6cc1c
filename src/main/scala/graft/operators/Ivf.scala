package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.CosineSimilarity
import graft.sources.Tables

/** IVF (inverted-file) approximate nearest-neighbour search — the
  * data-adaptive complement to the random-hyperplane LSH path (Ann):
  * a k-means coarse quantizer partitions the vectors into Voronoi
  * cells; a probe ranks ONLY the vectors in its `nprobe` nearest
  * cells. Where LSH cells are data-oblivious (fixed hyperplanes), IVF
  * cells follow the corpus's cluster structure, which buys recall on
  * clustered embeddings (exactly this corpus's label-clustered shape)
  * at the cost of a training pass.
  *
  * Scale design: training samples/aggregates per partition (MLlib
  * KMeans — one pass per iteration, treeAggregate of k×d centroid
  * sums); assignment is a map-side transform; the probe-side filter
  * `cell IN (nprobe nearest)` prunes to nprobe/k of the corpus, and in
  * the production layout the cell id is the partition key exactly like
  * Ann.writeBucketed. The cell count scales as n/1024 (constant
  * expected cell size), the same sizing rule as LshBucket.bitsFor.
  * Ranking runs the codegen `cosine_sim` expression — no UDF.
  */
object Ivf {

  /** Target ~1024 vectors per cell, floor 4 (sf0.001 corpora). */
  def cellCount(n: Long): Int = math.max(4, math.ceil(n / 1024.0).toInt)

  /** One trained quantizer per (corpus content, k) per JVM — training
    * is a batch job, not a per-query cost (like the signature table in
    * NearDedup.dedupMinhash). Keyed by content fingerprint, not path,
    * so a rewritten corpus retrains instead of serving a stale model.
    */
  private val modelMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Int), KMeansModel]

  private def quantized(spark: SparkSession, sfDir: String): (KMeansModel, DataFrame, Int) = {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("fv", array_to_vector(col("embedding")))
    val fp = graft.sources.DataFingerprint.ofTable(sfDir, "embeddings")
    val k = cellCount(e.count())
    // Training coalesces to a few partitions: each k-means iteration is
    // a treeAggregate job, and on a small-per-executor slice the
    // per-task overhead dominates the centroid math. (At real scale the
    // natural partitioning stands; 5 iterations suffice for a COARSE
    // quantizer — cells only need to be roughly Voronoi, recall comes
    // from nprobe.)
    val m = modelMemo.getOrElseUpdate((fp, k),
      new KMeans().setK(k).setSeed(42L).setMaxIter(5).setInitMode("random")
        .setFeaturesCol("fv").setPredictionCol("cell").fit(e.coalesce(8)))
    (m, m.transform(e), k)
  }

  /** Top-10 cosine neighbours of vec_id=0 among the `nprobe` nearest
    * cells (euclidean centroid distance, standard IVF probe rule).
    */
  private[graft] def knnIvfProbing(spark: SparkSession, sfDir: String,
      nprobe: Int): DataFrame = {
    val (m, assigned, k) = quantized(spark, sfDir)
    val probe = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val probeCells = m.clusterCenters.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < c.size) {
        val diff = probe(j) - c(j); d += diff * diff; j += 1
      }
      (d, i)
    }.sortBy(_._1).take(math.min(nprobe, k)).map(_._2)
    assigned
      .filter(col("cell").isin(probeCells.map(Integer.valueOf): _*) &&
        col("vec_id") =!= 0)
      .select(col("vec_id"), col("cell"),
        round(call_function("cosine_sim", col("embedding"), typedlit(probe)), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** `knn_ivf` — nprobe=2 of the n/1024 cells. No oracle (quantizer is
    * engine-specific); structural guarantees pinned in IvfSpec.
    */
  def knnIvf(spark: SparkSession, sfDir: String): DataFrame =
    knnIvfProbing(spark, sfDir, nprobe = 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_ivf" -> knnIvf _
  )

  val oracle: Map[String, String] = Map.empty
}

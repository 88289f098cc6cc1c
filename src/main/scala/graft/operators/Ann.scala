package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.sources.Tables

/** Approximate nearest-neighbour search over the embedding column
  * (random-hyperplane LSH). Brute-force cosine top-k is the baseline
  * (Pipeline.udfCosineTopk — exact, streams the whole table); this is
  * the scale path: signature-bucket the vectors, then rank ONLY the
  * probe's bucket. At 100 TB the bucket column becomes the partition /
  * cluster key, so a query touches 1/2^H of the data instead of all of
  * it; recall is tuned by H and multi-probe, not by scan size.
  */
object Ann {

  private val H = 6   // signature bits → 2^6 = 64 buckets
  private val D = 64  // embedding dimensionality (corpus-verified)

  /** Fixed pseudo-random hyperplanes (seeded — signatures are stable
    * across runs and executors; the array ships inside the UDF closure).
    */
  private val planes: Array[Array[Double]] = {
    val rnd = new java.util.Random(42L)
    Array.fill(H)(Array.fill(D)(rnd.nextGaussian()))
  }

  /** Sign-pattern signature of a vector against the hyperplanes. */
  val lshBucket: UserDefinedFunction = udf { (v: Seq[Float]) =>
    var sig = 0
    var i = 0
    while (i < H) {
      val p = planes(i)
      var d = 0.0
      var j = 0
      val n = math.min(v.length, D)
      while (j < n) { d += v(j) * p(j); j += 1 }
      if (d >= 0) sig |= (1 << i)
      i += 1
    }
    sig
  }

  /** `knn_ann` — top-10 cosine neighbours of vec_id=0 restricted to the
    * probe's LSH bucket. No oracle (bucketing is engine-specific); the
    * structural guarantees are pinned in AnnSpec.
    */
  def knnAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("bucket", lshBucket(col("embedding")))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("bucket").as("p_bucket"), col("embedding").as("pv"))
    e.join(broadcast(probe), col("bucket") === col("p_bucket"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("bucket"),
        round(VectorFns.cosineSim(col("embedding"), col("pv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_ann" -> knnAnn _
  )

  val oracle: Map[String, String] = Map.empty
}

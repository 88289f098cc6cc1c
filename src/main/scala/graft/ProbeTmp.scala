package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import graft.sources.Tables

object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val sfDir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, sfDir)
      .repartition(32)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .select(col("doc_id"), expr(
        "transform(sequence(1, greatest(size(tokens) - 2, 1))," +
          " i -> concat_ws(' ', slice(tokens, i, 3)))").as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 18)
    val feats = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(3).setSeed(42L)
    val model = t("fit")(lsh.fit(feats))
    val path = "/tmp/probe_sig"
    t("shingles.count")(docs.count())
    t("feats.count")(feats.count())
    t("transform.count")(model.transform(feats).count())
    t("transform+write")(model.transform(feats).select("doc_id", "features", "sig")
      .coalesce(4).write.mode("overwrite").parquet(path))
    val sig = spark.read.parquet(path)
    t("join")(model.approxSimilarityJoin(sig, sig, 0.1, "jaccard_dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id")).count())
    t("join2")(model.approxSimilarityJoin(sig, sig, 0.1, "jaccard_dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id")).count())
    spark.stop()
  }
}

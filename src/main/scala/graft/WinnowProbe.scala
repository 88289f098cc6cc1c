package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val inner = graft.sources.Tables.documents(spark, sf)
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("source"),
        graft.api.GraftOps.winnowFingerprints(col("text")).as("fp"))
    println("=== materialization plan ===")
    println(inner.queryExecution.executedPlan.toString.take(1500))
    t("warm_scan")(graft.sources.Tables.documents(spark, sf).agg(count(lit(1))).collect())
    t("materialize_keyed")(inner.localCheckpoint(true).count())
    val rr = graft.sources.Tables.documents(spark, sf)
      .repartition(32)
      .select(col("doc_id"), col("source"),
        graft.api.GraftOps.winnowFingerprints(col("text")).as("fp"))
    t("materialize_rr")(rr.localCheckpoint(true).count())
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch audit: actual records READ per query (warm run) vs the
  * source table size — a ratio markedly >1 means the fact data is
  * genuinely read multiple times at runtime (AQE stage reuse did NOT
  * dedupe). CAVEAT: inputMetrics.recordsRead also counts CACHE-block
  * reads, so a checkpoint-barriered query reports parquet records +
  * (checkpointed-frame rows × consumers) — e.g. 1× fact + 2 × a tiny
  * daily series. Judge the FACT multiple, not the raw total.
  */
object IoAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        recs.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead); ()
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // cold: codegen + artifact builds
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      Thread.sleep(300); recs.set(0)
      fn(spark, sfDir).count()
      Thread.sleep(300)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(s"== $name recordsRead=${recs.get}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Scratch audit: queries whose plans carry MULTIPLE WindowExec nodes
  * with the SAME partition keys — usually a partition-only total spec
  * beside an ordered running spec, which plans as two passes over one
  * sorted frame; aligning the specs (same order, unbounded frame)
  * folds them into one WindowExec (the agg_weighted_median fold).
  * Different partition keys are fine (genuinely different shuffles).
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val wins = fn(spark, sfDir).queryExecution.sparkPlan
          .collectWithSubqueries { case w: WindowExec =>
            w.partitionSpec.map(_.sql).mkString(",")
          }
        val dup = wins.groupBy(identity).filter(_._2.size > 1)
        if (dup.nonEmpty)
          println(s"WDUP $name: " + dup.map { case (k, v) =>
            s"[$k] x${v.size}" }.mkString("; "))
      } catch { case e: Throwable =>
        println(s"WERR $name: ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}

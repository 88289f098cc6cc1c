package graft

/** Scratch audit: for every declared query, count parquet scans per
  * table in the FINAL plan — a table scanned twice usually means a
  * branch recomputes instead of reusing (the pareto/q15 disease).
  */
object ScanAudit {
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
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        val scans = plan.collectWithSubqueries {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            val p = f.relation.location.rootPaths.headOption.map(_.toString).getOrElse("?")
            tables.find(t => p.contains(t + ".parquet")).getOrElse(p)
        }
        val dups = scans.groupBy(identity).view.mapValues(_.size)
          .filter(_._2 > 1).toMap
        if (dups.nonEmpty)
          println(s"DUP $name: " + dups.map { case (t, n) => s"$t x$n" }.mkString(", "))
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

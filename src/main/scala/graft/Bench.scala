package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up session machinery (first-job scheduler + codegen init costs
    // ~5 s and belongs to the JVM, not to whichever query runs first).
    spark.range(1000).selectExpr("sum(id)").collect()
    // Each query runs twice; the reported headline is the SECOND (warm)
    // run, so one-off JIT/codegen-compile/shuffle-service noise cannot
    // flip a 2x verdict. The cold (first-run) total is reported
    // alongside — both totals in the JSON.
    // A failed query records the time it burned before throwing (so the
    // totals stay meaningful) and its name under "failed" — a -1 or an
    // omission would silently DEDUCT from the total.
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = once()
      name -> (cold, warm)
    }
    val qs = results.map { case (k, (_, w)) => s"\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val qsCold = results.map { case (k, (c, _)) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val warmTotal = results.values.map(_._2).sum
    val coldTotal = results.values.map(_._1).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","first_run_total":$coldTotal,"failed":$failedJson,"queries":$qs,"queries_first_run":$qsCold,"sf":"$sfDir"}""")
    spark.stop()
  }
}

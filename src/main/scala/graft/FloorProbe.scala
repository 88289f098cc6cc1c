package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the per-query session FLOOR: break one warm query's
  * wall time into plan-construction / analysis / optimization / physical
  * planning / execution, to find which phase the ~0.17 s goes to.
  * Not part of the driver contract.
  *
  * Usage: tools/run_main.sh graft.FloorProbe <sfDir> <name> [name...]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val aqe = sys.env.getOrElse("GRAFT_PROBE_AQE", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.maxPlanStringLength",
        sys.env.getOrElse("GRAFT_PROBE_PLANSTR", "2147483632"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    // job accounting: count + sum wall of Spark jobs inside the timed window
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobWall = new java.util.concurrent.atomic.AtomicLong(0)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, js.time); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.get(je.jobId)).getOrElse(je.time)
        jobWall.addAndGet(je.time - t0)
        jobCount.incrementAndGet(); ()
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // two cold-ish rounds to absorb JIT/codegen, then measure 3 warm
      (1 to 2).foreach { _ =>
        fn(spark, sfDir).count()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.assertAnalyzed()
        val t2 = System.nanoTime()
        qe.optimizedPlan
        val t3 = System.nanoTime()
        qe.executedPlan
        val t4 = System.nanoTime()
        jobWall.set(0); jobCount.set(0)
        val n = df.count()
        Thread.sleep(80) // let listener events drain (scratch tool)
        val (jw1, jc1) = (jobWall.get, jobCount.get)
        val t5 = System.nanoTime()
        // repeat count() on the SAME Dataset: isolates the per-action
        // re-plan + job cost from first-touch construction
        jobWall.set(0); jobCount.set(0)
        df.count()
        Thread.sleep(80) // let listener events drain (scratch tool)
        val (jw2, jc2) = (jobWall.get, jobCount.get)
        val t6 = System.nanoTime()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"$name%-24s run$i total=${ms(t0, t5)}%7.1f ms | build=${ms(t0, t1)}%5.1f opt=${ms(t2, t3)}%5.1f phys=${ms(t3, t4)}%5.1f count=${ms(t4, t5)}%7.1f (jobs=$jc1 jobWall=$jw1 ms) | recount=${ms(t5, t6)}%7.1f (jobs=$jc2 jobWall=$jw2 ms) rows=$n")
      }
    }
    spark.stop()
  }
}

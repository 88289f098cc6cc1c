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
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.maxPlanStringLength",
        sys.env.getOrElse("GRAFT_PROBE_PLANSTR", "2147483632"))
    SessionConfs.applyExtra(builder)
    val spark = builder
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
        // decompose the count() action's own catalyst phases
        val cdf = df.groupBy().count()
        val c1 = System.nanoTime()
        cdf.queryExecution.assertAnalyzed()
        val c2 = System.nanoTime()
        cdf.queryExecution.optimizedPlan
        val c3 = System.nanoTime()
        cdf.queryExecution.executedPlan
        val c4 = System.nanoTime()
        val nr = cdf.collect()(0).getLong(0)
        val c5 = System.nanoTime()
        def cms(a: Long, b: Long) = (b - a) / 1e6
        println(f"   [count-tree] build=${cms(t4, c1)}%5.1f analyze=${cms(c1, c2)}%5.1f optimize=${cms(c2, c3)}%5.1f physical=${cms(c3, c4)}%5.1f collect=${cms(c4, c5)}%6.1f (rows=$nr)")
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
        // driver-side stack sampling across a third count(): where does
        // the non-job wall go? samples every 2 ms, aggregates top graft/
        // spark frames of non-executor threads
        if (sys.env.contains("GRAFT_PROBE_SAMPLE")) {
          val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
          @volatile var go = true
          val sampler = new Thread(() => {
            while (go) {
              Thread.getAllStackTraces.forEach { (th, st) =>
                if (!th.getName.startsWith("Executor task") &&
                    th.getName != "stack-sampler" && st.nonEmpty) {
                  val f = st.find(e => e.getClassName.startsWith("org.apache.spark") ||
                      e.getClassName.startsWith("graft"))
                  f.foreach { e =>
                    val k = th.getName.replaceAll("-\\d+$", "") + " @ " +
                      e.getClassName + "." + e.getMethodName
                    hist.merge(k, 1, (a, b) => a + b); ()
                  }
                }
              }
              Thread.sleep(2)
            }
          }, "stack-sampler")
          sampler.start()
          val s0 = System.nanoTime()
          df.count()
          val sdt = (System.nanoTime() - s0) / 1e6
          go = false; sampler.join()
          println(f"   [sampled count ${sdt}%6.1f ms] top driver frames:")
          import scala.jdk.CollectionConverters._
          hist.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (k, c) =>
            println(f"     $c%4d  $k") }
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"$name%-24s run$i total=${ms(t0, t5)}%7.1f ms | build=${ms(t0, t1)}%5.1f opt=${ms(t2, t3)}%5.1f phys=${ms(t3, t4)}%5.1f count=${ms(t4, t5)}%7.1f (jobs=$jc1 jobWall=$jw1 ms) | recount=${ms(t5, t6)}%7.1f (jobs=$jc2 jobWall=$jw2 ms) rows=$n")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch profiler: run one query warm and print per-job wall time and
  * stage/task counts — for finding where a toy-scale query's session
  * floor goes. Not part of the driver contract.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val builder0 = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    SessionConfs.applyExtra(builder0)
    val spark = builder0.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val done = scala.collection.concurrent.TrieMap.empty[Int, (Long, Int)]
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    // Timeline mode (GRAFT_PROBE_TIMELINE): absolute submit/end stamps per
    // job so the INTER-job driver gaps are visible, not just job walls.
    val ends = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val taskLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.put(js.jobId, js.time)
        // last stage's callsite names the operator the job materializes
        val d = js.stageInfos.lastOption.map(si =>
          si.name.take(60) + " | " + si.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("JobProfile"))
            .getOrElse("").trim.take(60)).getOrElse("")
        descs.put(js.jobId, s"[${js.stageInfos.size}st] " + d); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobs.get(je.jobId)).getOrElse(je.time)
        ends.put(je.jobId, je.time)
        done.put(je.jobId, (je.time - t0, 0)); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks); ()
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (sys.env.contains("GRAFT_PROBE_TIMELINE") && te.taskMetrics != null) {
          val m = te.taskMetrics
          taskLines.add(f"      stage ${te.stageId}%3d task dur=${te.taskInfo.duration}%4d run=${m.executorRunTime}%4d deser=${m.executorDeserializeTime}%4d gc=${m.jvmGCTime}%3d resSer=${m.resultSerializationTime}%3d cpu=${m.executorCpuTime / 1000000}%4d")
          ()
        }
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count()  // cold
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      done.clear(); stages.set(0); tasks.set(0)
      jobs.clear(); ends.clear(); taskLines.clear()
      val t0 = System.nanoTime()
      val w0 = System.currentTimeMillis()
      fn(spark, sfDir).count()  // warm
      val dt = (System.nanoTime() - t0) / 1e9
      val w1 = System.currentTimeMillis()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val js = done.toSeq.sortBy(_._1)
      println(f"== $name warm ${dt}%.3f s, ${js.size} jobs, ${stages.get} stages, ${tasks.get} tasks")
      if (sys.env.contains("GRAFT_PROBE_TIMELINE")) {
        Thread.sleep(100)
        // gapBefore = submit(job) − max end of ALL prior jobs, not the
        // immediately-preceding job's end: concurrent AQE stage jobs
        // overlap, so the by-id-predecessor gap goes negative and reads
        // as garbage (ADVICE r16). A job missing either stamp is
        // SKIPPED with a note instead of defaulting its stamps to 0,
        // which produced "+(-w0)" rows. Overlapped jobs print gap=0
        // flagged `(conc)` so serial driver gaps stay distinguishable.
        var prevEnd = w0
        js.foreach { case (id, (ms, _)) =>
          val subO = Option(jobs.get(id)).map(_.longValue)
          val endO = Option(ends.get(id)).map(_.longValue)
          (subO, endO) match {
            case (Some(sub), Some(end)) =>
              val gap = sub - prevEnd
              val tag = if (gap < 0) " (conc)" else ""
              println(f"   job $id%3d  +${sub - w0}%5d..+${end - w0}%5d  wall=${end - sub}%4d  gapBefore=${math.max(gap, 0)}%4d ms$tag  ${Option(descs.get(id)).getOrElse("")}")
              prevEnd = math.max(prevEnd, end)
            case _ =>
              println(f"   job $id%3d  (missing submit/end stamp — skipped)")
          }
        }
        println(f"   tailGap=${w1 - prevEnd}%4d ms (action end after last job end)")
        taskLines.forEach(l => println(l))
      } else js.foreach { case (id, (ms, _)) =>
        println(f"   job $id%3d  ${ms}%5d ms  ${Option(descs.get(id)).getOrElse("")}") }
    }
    spark.stop()
  }
}

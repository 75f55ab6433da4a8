package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only per-job profiler for ANY declared query (IngestProfile's
  * listener generalized): runs the query under the noop sink and prints
  * every Spark job's wall time and call site, so the fixed-cost
  * structure of the multi-phase entries (index builds, lifecycle loops,
  * maintained-layout reads) is visible per line. Usage:
  * QueryJobs [sfDir] <query> [<query>...]  — 2 rounds each (cold, warm).
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (d, names) =
      if (args.nonEmpty && new java.io.File(args.head).isDirectory)
        (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.1", args.toSeq)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // (startMs, endMs, site)
    val jobTimes =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobs.put(js.jobId, (js.time, site))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val v = jobs.remove(je.jobId)
          if (v != null) jobTimes.add((v._1, je.time, v._2))
        }
      })
    // stage-level metrics: where the task time actually goes
    val stageLines =
      new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stageLines.add((m.executorRunTime / 1e3,
            f"stage ${si.stageId}%4d ${si.numTasks}%4d tasks " +
            f"exec ${m.executorRunTime / 1e3}%8.2f s " +
            f"cpu ${m.executorCpuTime / 1e9}%8.2f s " +
            f"in ${m.inputMetrics.recordsRead}%10d rec " +
            f"sR ${m.shuffleReadMetrics.recordsRead}%10d " +
            f"sW ${m.shuffleWriteMetrics.recordsWritten}%10d  " +
            si.name.take(70)))
        }
      })

    names.foreach { n =>
      (1 to 2).foreach { round =>
        jobTimes.clear()
        stageLines.clear()
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, d)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // listener bus drain
        val times = {
          val it = jobTimes.iterator()
          val b = Seq.newBuilder[(Long, Long, String)]
          while (it.hasNext) b += it.next(); b.result()
        }
        println(f"== $n round $round: $wall%6.2f s, ${times.length}%3d jobs, " +
          f"${times.map(t => t._2 - t._1).sum / 1e3}%6.2f s in jobs ==")
        if (round == 2) {
          // aggregate by call site, descending total
          times.groupBy(_._3).view
            .mapValues(v => (v.map(t => t._2 - t._1).sum, v.size))
            .toSeq.sortBy(-_._2._1).take(40)
            .foreach { case (site, (ms, cnt)) =>
              println(f"   $ms%6d ms  x$cnt%-3d $site%s")
            }
          // chronological timeline with driver-side gaps: gap = this
          // job's start minus the max end of every earlier-started job
          println("   -- timeline (start+dur, gap since prev end) --")
          var prevEnd = w0
          times.sortBy(_._1).foreach { case (s, e, site) =>
            val gap = s - prevEnd
            if (gap > 50 || e - s > 50)
              println(f"   @${(s - w0) / 1e3}%7.2f s  dur ${e - s}%5d ms  " +
                f"gap ${gap}%5d ms  $site%s")
            prevEnd = math.max(prevEnd, e)
          }
          if (sys.env.contains("GRAFT_STAGES")) {
            println("   -- stages (exec-time desc) --")
            val it = stageLines.iterator()
            val b = Seq.newBuilder[(Double, String)]
            while (it.hasNext) b += it.next()
            b.result().sortBy(-_._1)
              .take(30).foreach(s => println("   " + s._2))
          }
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}

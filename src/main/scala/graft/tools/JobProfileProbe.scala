package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev probe: per-JOB wall breakdown of one query's materialization —
  * where FreshRunProbe says "this query costs 5 s", this says which of
  * its jobs (construction-time actions like localCheckpoint/count vs
  * the final noop sink, AQE stage jobs, broadcast builds) carry the
  * seconds, and how much wall sits BETWEEN jobs (driver-side planning,
  * codegen, analysis). Stage shuffle totals ride the job rows so an
  * exchange-bound job is distinguishable from a compute-bound one.
  *
  * usage: runMain graft.tools.JobProfileProbe <sfDir> <query> [reps]
  */
object JobProfileProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.tools.JobProfileProbe <sfDir> <query> [reps]")
      sys.exit(2)
    }
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.GraftSession.local()
    case class Job(id: Int, start: Long, end: Long, desc: String,
                   var shufRead: Long = 0L, var shufWrite: Long = 0L,
                   var tasks: Int = 0, var taskTimeMs: Long = 0L)
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val stageToJob = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts(js.jobId) = (js.time, d)
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          val j = jobs.getOrElseUpdate(je.jobId, Job(je.jobId, t0, je.time, d))
          j.id match { case _ => () }
          jobs(je.jobId) = j.copy(start = t0, end = je.time, desc = d,
            shufRead = j.shufRead, shufWrite = j.shufWrite,
            tasks = j.tasks, taskTimeMs = j.taskTimeMs)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageToJob.get(sc.stageInfo.stageId).foreach { jid =>
          val j = jobs.getOrElseUpdate(jid, Job(jid, 0L, 0L, ""))
          j.shufRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          j.shufWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          j.tasks += sc.stageInfo.numTasks
          j.taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
        }
    })
    for (i <- 1 to reps) {
      jobs.clear(); starts.clear(); stageToJob.clear()
      val w0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener-bus drain
      val rows = jobs.values.toSeq.sortBy(_.start)
      println(f"[jobprofile] $name rep $i wall $wall%.2f s, ${rows.size} jobs, " +
        f"job-covered ${rows.map(j => (j.end - j.start) / 1000.0).sum}%.2f s")
      var prevEnd = w0
      rows.foreach { j =>
        val gap = (j.start - prevEnd) / 1000.0
        prevEnd = math.max(prevEnd, j.end)
        println(f"[jobprofile]   job ${j.id}%4d ${(j.end - j.start) / 1000.0}%7.2f s " +
          f"(gap ${gap}%5.2f) tasks ${j.tasks}%4d taskTime ${j.taskTimeMs / 1000.0}%7.2f s " +
          f"shufR ${j.shufRead / 1e6}%8.1f MB shufW ${j.shufWrite / 1e6}%8.1f MB  ${j.desc.take(60)}")
      }
    }
    spark.stop()
  }
}

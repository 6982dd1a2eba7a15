package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job floor profiler for declared gates: runs each named gate the
  * way Bench does (warmup pass, then a timed noop materialization) with
  * a listener attached, and prints one JSON line per JOB of the timed
  * run — wall clock, summed task run/CPU time, shuffle fetch-wait, GC,
  * task and stage counts. The difference between a job's wall and its
  * task time spread over the cores is the scheduler/AQE floor the
  * optimization guide (§1.1) says to attribute before blaming compute;
  * the iterative kernels (gr_*) and the composite pipelines (pipe_*)
  * are sequences of such jobs, so this is the tool that answers "is the
  * gate compute-bound or job-floor-bound" with numbers instead of
  * inference. Measurement-only: shares Bench's env contract and query
  * registry, never its output format.
  * Usage: runMain graft.ProfileBench <gate> [gate ...]
  */
object ProfileBench {
  private final class JobRec(val id: Int, val start: Long,
      val desc: String) {
    @volatile var end: Long = 0L
    val stageIds = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    val runMs = new java.util.concurrent.atomic.AtomicLong()
    val cpuMs = new java.util.concurrent.atomic.AtomicLong()
    val fetchMs = new java.util.concurrent.atomic.AtomicLong()
    val gcMs = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    require(args.nonEmpty, "usage: ProfileBench <gate> [gate ...]")
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val r = new JobRec(e.jobId, e.time, desc)
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
        jobs.put(e.jobId, r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        Option(stageToJob.get(si.stageId))
          .flatMap(j => Option(jobs.get(j))).foreach { r =>
            val m = si.taskMetrics
            if (m != null) {
              r.runMs.addAndGet(m.executorRunTime)
              r.cpuMs.addAndGet(m.executorCpuTime / 1000000L)
              r.fetchMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
              r.gcMs.addAndGet(m.jvmGCTime)
              if (sys.env.contains("GRAFT_PROFILE_STAGES"))
                println(s"""{"stage":${si.stageId},"job":${r.id},""" +
                  s""""name":${"\"" + si.name.replace("\"", "'") + "\""},""" +
                  s""""tasks":${si.numTasks},"run_ms":${m.executorRunTime},""" +
                  s""""cpu_ms":${m.executorCpuTime / 1000000L},""" +
                  s""""deser_ms":${m.executorDeserializeTime},""" +
                  s""""sched_delay_note":"run excludes scheduler delay",""" +
                  s""""shuffle_read_mb":${m.shuffleReadMetrics.totalBytesRead / 1048576},""" +
                  s""""gc_ms":${m.jvmGCTime}}""")
            }
            r.tasks.addAndGet(si.numTasks)
            r.stages.incrementAndGet()
          }
      }
    }

    def run(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    args.foreach { name =>
      run(name) // warmup: codegen, parquet footers, one-time store builds
      spark.sparkContext.addSparkListener(listener)
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      run(name)
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      // listener events are posted asynchronously; give the bus a
      // moment to drain before reading (the public API exposes no
      // waitUntilEmpty; a fixed drain pause is fine for a profiler)
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(listener)
      val recs = jobs.values.toArray(Array.empty[JobRec])
        .filter(_.desc == name).sortBy(_.id)
      recs.foreach { r =>
        val w = if (r.end > 0) r.end - r.start else -1L
        println(s"""{"gate":"$name","job":${r.id},"wall_ms":$w,""" +
          s""""task_run_ms":${r.runMs.get},"task_cpu_ms":${r.cpuMs.get},""" +
          s""""fetch_wait_ms":${r.fetchMs.get},"gc_ms":${r.gcMs.get},""" +
          s""""stages":${r.stages.get},"tasks":${r.tasks.get}}""")
      }
      val totalJobMs = recs.map(r => math.max(0L, r.end - r.start)).sum
      println(f"""{"gate":"$name","timed_wall_sec":$wall%.3f,""" +
        f""""n_jobs":${recs.length},"sum_job_wall_ms":$totalJobMs,""" +
        f""""sum_task_run_ms":${recs.map(_.runMs.get).sum}}""")
      jobs.clear(); stageToJob.clear()
    }
    spark.stop()
  }
}

package graft.tools

/** Single-query timing main: runs the named queries through the noop
  * sink in graft.Bench's exact session configuration, so one query can
  * be iterated on without paying the full suite. Args: query names;
  * each runs `SPARK_GRAFT_REPS` times (default 2 — first run pays
  * JIT/planning, later runs show steady state). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4") // same default as Bench.main
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = graft.Bench.session(cpus)
    // task-run/CPU/GC seconds per rep (the Bench Counters split): wall
    // alone can't separate "less work" from "less contention" — the v14
    // diagnosis needed task-seconds from a single-query loop
    val run, cpu, gc, shr, shw, ntask = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            run.addAndGet(m.executorRunTime)
            cpu.addAndGet(m.executorCpuTime)
            gc.addAndGet(m.jvmGCTime)
            shr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ntask.incrementAndGet()
          }
        }
      })
    for (name <- args; r <- 1 to reps) {
      val b = (run.get, cpu.get, gc.get, shr.get, shw.get, ntask.get)
      val t0 = System.nanoTime()
      graft.Bench.runNoop(spark, sfDir, name)
      val w = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      println(f"[timeone] $name rep$r: $w%.2f s" +
        f" task=${(run.get - b._1) / 1e3}%.2f cpu=${(cpu.get - b._2) / 1e9}%.2f" +
        f" gc=${(gc.get - b._3) / 1e3}%.2f" +
        f" tasks=${ntask.get - b._6}%d" +
        f" shuffle_rw_mb=[${(shr.get - b._4) / 1e6}%.1f,${(shw.get - b._5) / 1e6}%.1f]")
    }
    spark.stop()
  }
}

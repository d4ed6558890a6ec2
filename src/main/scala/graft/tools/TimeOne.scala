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
    for (name <- args; r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.Bench.runNoop(spark, sfDir, name)
      println(f"[timeone] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc single-query timer + plan dump (dev tool, not part of the
  * driver contract). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.QTime q05_join_multi [--explain] [--reps N]"
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val reps = args.sliding(2).collectFirst {
      case Array("--reps", n) => n.toInt
    }.getOrElse(2)
    val explain = args.contains("--explain")
    // drop flags AND their values ("--reps 3" must not leave a "3" that
    // gets looked up as a query name)
    val names = args.zipWithIndex.filterNot { case (a, i) =>
      a.startsWith("--") || (i > 0 && args(i - 1) == "--reps")
    }.map(_._1).toSeq
    val spark = GraftSession.build("qtime")
    // Match Bench's broadcast tuning so timings are comparable.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
    // Job/task counters (r17): the per-rep job and task counts are the
    // trace evidence for job-level optimizations (lazy seed frames,
    // overlapped independent jobs, partition right-sizing) that never
    // show in a checkpoint-truncated final plan.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
      })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      if (explain) fn(spark, d).explain("formatted")
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc() // match Bench: reclaim prior query's garbage untimed
        val (j0, k0) = (jobs.get(), tasks.get())
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        println(f"[qtime] $name rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
          f"($n rows, ${jobs.get() - j0} jobs, ${tasks.get() - k0} tasks)")
      }
    }
    spark.stop()
  }
}

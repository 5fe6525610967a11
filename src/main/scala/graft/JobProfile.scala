package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query Spark-job accounting — the measurement companion to
  * [[PlanDump]] (guide §1: measure first). For each named query it runs
  * the query twice (cold, warm) and reports how many Spark JOBS the
  * invocation launched, how many stages/tasks they contained, and the
  * wall split — the driver-overhead profile the bench totals cannot
  * show. A serve path that launches 25 jobs over KB-scale metadata is
  * driver-bound, not data-bound; this makes that visible.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.JobProfile q1 q2 ...
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    // -v: per-job call-site attribution (which driver action launched each
    // job) — the "where do the 30 serve jobs come from" instrument
    val verbose = sys.env.get("SPARK_GRAFT_PROFILE_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val cs = j.stageInfos.map(_.name).distinct.mkString(" | ")
          println(s"[jobsite] job=${j.jobId} stages=${j.stageInfos.size} " +
            s"tasks=${j.stageInfos.map(_.numTasks).sum} site=$cs")
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val names = args.toSeq
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          (1 to 2).foreach { pass =>
            // listener events are async; settle before and after so counts
            // attribute to the right query (coarse but sufficient here)
            Thread.sleep(300)
            val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
            val w0 = System.nanoTime()
            fn(spark, dir).count()
            val wall = (System.nanoTime() - w0) / 1e9
            Thread.sleep(300)
            println(f"[jobprofile] $name pass=$pass wall=$wall%.2fs " +
              s"jobs=${jobs.get - j0} stages=${stages.get - s0} " +
              s"tasks=${tasks.get - t0}")
          }
        case None => System.err.println(s"[jobprofile] unknown query: $name")
      }
    }
    spark.stop()
  }
}

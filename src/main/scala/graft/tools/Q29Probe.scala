package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused timing probe for individual SparkEntry queries (driver-bench
  * conditions: local[32], shuffle partitions 32, noop sink). Usage:
  * `runMain graft.tools.Q29Probe q29_crawl_order [sfDir]`. */
object Q29Probe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q29_crawl_order"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]").appName("q-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // session warm
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    // attribute driver fixed cost: wall and count per job description
    // (call site), since q29's wall is dominated by per-job driver latency,
    // not task time
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val byDesc = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobStartNs.put(j.jobId, (desc, System.nanoTime()))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStartNs.remove(j.jobId)).foreach { case (desc, t0) =>
          val ms = (System.nanoTime() - t0) / 1000000
          byDesc.merge(desc, (1, ms),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PROBE $name%s $sec%.2f s jobs=${jobs.get} stages=${stages.get} taskMs=${taskMs.get}")
    import scala.jdk.CollectionConverters._
    byDesc.asScala.toSeq.sortBy(-_._2._2).take(20).foreach {
      case (desc, (n, ms)) =>
        println(f"PROBE_JOB ${ms}%6d ms  n=$n%-4d ${desc.take(110)}")
    }
    spark.stop()
  }
}

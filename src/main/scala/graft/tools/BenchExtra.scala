package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 measurement harness (guide §1.4/§1.5): noop-sink isolation for
  * EVERY SparkEntry query under the driver bench's session settings, with
  * per-query Spark job/stage counts and executor task-time so driver fixed
  * cost (scheduling, planning, codegen) is separable from task compute.
  * Bench.scala is frozen for measurement; this extra main exists so the
  * optimization evidence in OPTIMIZATION_r06.md can cite isolated numbers
  * without touching the driver contract.
  *
  * Usage: `runMain graft.tools.BenchExtra [sfDir] [rounds] [namePrefix...]`
  * Prints one line per query: name, best seconds, rounds, jobs, stages,
  * executor task ms (from the best round).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 2
    val only: Seq[String] = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // session warm

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })

    val named = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
    val best = collection.mutable.LinkedHashMap[String, (Double, Int, Int, Long)]()
    for (r <- 1 to rounds; (name, fn) <- named) {
      spark.sparkContext.setJobDescription(s"bench-extra $name r$r")
      jobs.set(0); stages.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[bench-extra] $name failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      if (ok) {
        val cur = best.get(name)
        if (cur.forall(_._1 > sec))
          best(name) = (sec, jobs.get, stages.get, taskMs.get)
      } else best.getOrElseUpdate(name, (-1.0, 0, 0, 0L))
    }
    best.foreach { case (name, (sec, j, st, tm)) =>
      println(f"EXTRA $name%-26s $sec%8.3f s  jobs=$j%-3d stages=$st%-4d taskMs=$tm%-7d")
    }
    val total = best.valuesIterator.map(_._1).filter(_ >= 0).sum
    println(f"EXTRA_TOTAL $total%.3f s over ${best.size} queries, best-of-$rounds")
    spark.stop()
  }
}

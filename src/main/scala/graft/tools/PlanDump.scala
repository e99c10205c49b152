package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries into a
  * directory (round-6 deliverable: plans/r06/<query>_{before,after}.txt).
  *
  * Usage: `runMain graft.tools.PlanDump <outDir> <suffix> [name...]`
  * e.g. `runMain graft.tools.PlanDump plans/r06 before q19 q22 q25`
  * Names are prefixes; empty name list = all queries.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [namePrefix...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val only = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
          println(s"PLAN_WRITTEN ${outDir.resolve(s"${name}_$suffix.txt")}")
        } catch { case e: Throwable =>
          System.err.println(s"[plan-dump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: fetch+verify kernel scaling at local[8] vs local[32]. */
object ScaleProbe {
  def kernel(spark: SparkSession, n: Long): Long = {
    import graft.functions.ImageOps
    val idNum = regexp_extract(col("image_id"), "(\\d+)", 1).cast("long")
    graft.fixtures.FixtureGen.imagesDF(spark, n)
      .withColumn("v", ImageOps.validateUdf(col("bytes"), idNum, col("w"), col("h")))
      .where((col("fmt") === "png" && col("v.psnr") === 999.0) ||
        (col("fmt") =!= "png" && col("v.psnr") >= 40.0))
      .where(col("v.phash") === col("phash"))
      .count()
  }

  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 24000L
    // full JIT prewarm BEFORE any measurement (same JVM hosts all levels;
    // otherwise the first-measured level eats all C2 compilation)
    locally {
      val s = session(32)
      kernel(s, 8000)
      s.stop()
    }
    val levels = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(8, 32)
    levels.foreach { c =>
      val s = session(c)
      kernel(s, 1024)
      def gcMs: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      val secs = (1 to 3).map { _ =>
        val g0 = gcMs
        val t0 = System.nanoTime()
        kernel(s, n)
        ((System.nanoTime() - t0) / 1e9, gcMs - g0)
      }
      val best = secs.map(_._1).min
      println(f"PROBE c=$c rows=$n best=$best%.2f " +
        f"all=${secs.map(x => f"${x._1}%.2f/gc${x._2}ms").mkString(",")} rps=${n / best}%.1f")
      s.stop()
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of representative queries for
  * the scale review (pushdown / pruning / join strategy / codegen spans). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "q01_pricing_agg", "q03_join_agg_nation", "q04_anti_join_unsold_parts",
      "q07_running_sum_supplier", "q11_url_filter", "q15_politeness_dequeue",
      "q16_frontier_admission", "q22_minhash_neardup", "q23_embedding_topk",
      "q24_embedding_neardup", "q25_ann_lsh", "q26_simhash_neardup", "q31_structured_blocks",
      "q32_chunking")
    val out = new StringBuilder
    interesting.foreach { name =>
      out.append(s"\n===== $name =====\n")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      out.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plans.txt"), out.toString)
    println("PLANS_WRITTEN /tmp/plans.txt")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Pre-driver insurance: every SparkEntry query, run under the BASELINE
  * session conf and under an ADVERSARIAL one (non-whole-hour zone, LTZ
  * parquet inference, ANSI off — the knobs a harness could plausibly hold
  * differently), must produce identical rows. q09 was red for three rounds
  * on exactly such a conf delta; this sweep catches the whole class for
  * all 34 queries at once. Usage:
  * `runMain graft.tools.ConfSweep [sfDir]` → one OK/DIFF line per query,
  * exit 1 on any DIFF.
  */
object ConfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-conf-sweep")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val adversarial = Seq(
      "spark.sql.session.timeZone" -> "Australia/Lord_Howe",
      "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
      "spark.sql.ansi.enabled" -> "false")

    def withConf(on: Boolean)(body: => Seq[String]): Seq[String] = {
      if (on) adversarial.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally if (on) {
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.unset("spark.sql.parquet.inferTimestampNTZ.enabled")
        spark.conf.unset("spark.sql.ansi.enabled")
      }
    }

    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def rows(adv: Boolean): Seq[String] = withConf(adv) {
        // stringified rows: value-level compare independent of
        // Timestamp/LocalDateTime carrier types across confs
        fn(spark, sfDir).collect().toSeq.map(_.toString)
      }
      val (base, adv) = (rows(adv = false), rows(adv = true))
      if (base == adv) println(s"CONFSWEEP OK   $name rows=${base.size}")
      else {
        bad += 1
        val firstDiff = base.zip(adv).zipWithIndex
          .collectFirst { case ((b, a), i) if b != a => s"row $i: base=$b adv=$a" }
          .getOrElse(s"row counts ${base.size} vs ${adv.size}")
        println(s"CONFSWEEP DIFF $name $firstDiff")
      }
    }
    println(if (bad == 0) s"CONFSWEEP_ALL_OK queries=${graft.SparkEntry.queries.size}"
      else s"CONFSWEEP_FAILED diffs=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}

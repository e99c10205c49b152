package graft.tools

/** Microbenchmark the per-row fixture+walk cost of the compute-bound
  * decode queries (round-6 guide §1: attribute task time before touching
  * code). No Spark — pure JVM, per-row milliseconds. */
object RowCostProbe {
  private def bench(name: String, n: Int)(f: Long => Unit): Unit = {
    (0 until 200).foreach(i => f(i.toLong)) // warm
    val t0 = System.nanoTime()
    (0 until n).foreach(i => f(i.toLong))
    println(f"ROWCOST $name%-22s ${(System.nanoTime() - t0) / 1e6 / n}%8.3f ms/row")
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    bench("docx fixture only", n)(d => { graft.fixtures.FixtureGen.docxBytes(d); () })
    bench("docx fixture+meta", n)(d => {
      graft.functions.Zip.docxMeta(graft.fixtures.FixtureGen.docxBytes(d)); () })
    bench("chunker md+chunks", n)(d => {
      val text = "lorem ipsum dolor sit amet " * 12
      val sb = new java.lang.StringBuilder(2100)
      while (sb.length < 2000) sb.append(text)
      val t = sb.substring(0, 2000)
      val md = s"# Intro $d\n\n$t\n\n## Part A $d\n\n$t\n\n#### deep $d\n\n$t\n\n### Part B $d\n\n$t"
      graft.operators.Chunker.chunkMarkdown(md); () })
    bench("mp4 fixture+meta", n)(d => {
      graft.functions.Mp4.videoMeta(graft.fixtures.FixtureGen.mp4Bytes(d)); () })
    bench("exif fixture+meta", n)(d => {
      graft.functions.Jpeg.exifMeta(graft.fixtures.FixtureGen.jpegExifBytes(d)); () })
    bench("cleanup classify", n)(d => {
      val text = "lorem ipsum dolor sit amet " * 12
      val md = (d % 6) match {
        case 0 => "```\n" + text + "\n``` t"
        case 3 => "|a|b|\n|c|d|\n" + (text * 60)
        case 4 => "$x + y$ math " + (text * 60)
        case _ => text * 60
      }
      graft.operators.Cleanup.classifyChunk(md); () })
  }
}

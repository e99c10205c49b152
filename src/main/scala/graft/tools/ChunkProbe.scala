package graft.tools
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val text = "key agg row scan slow fast table value part hash value table part a row fast merge batch " * 6
    val sb = new StringBuilder
    (1 to 50).foreach(_ => sb.append(text))
    val t = sb.substring(0, 2000)
    val md = s"# Intro 42\n\n$t\n\n## Part A 42\n\n$t\n\n#### deep 42\n\n$t\n\n### Part B 42\n\n$t"
    // warm
    (1 to 200).foreach(_ => graft.operators.Chunker.chunkMarkdown(md))
    val t0 = System.nanoTime()
    (1 to 1000).foreach(_ => graft.operators.Chunker.chunkMarkdown(md))
    println(f"chunkMarkdown: ${(System.nanoTime()-t0)/1e6/1000}%.3f ms/doc")
    val t1 = System.nanoTime()
    (1 to 1000).foreach(_ => graft.operators.Chunker.preClean(md))
    println(f"preClean: ${(System.nanoTime()-t1)/1e6/1000}%.3f ms/doc")
  }
}

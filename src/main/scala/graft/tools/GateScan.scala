package graft.tools

/** Dev scan: which fixture images fail the J7 PSNR gate, and by how much. */
object GateScan {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 30000L
    var worst = 999.0
    var failed = 0
    var i = 1L
    while (i < n) { // odd = jpg
      val r = graft.fixtures.FixtureGen.imageRow(i)
      val psnr = graft.functions.ImageOps.psnrVsSynthetic(r.bytes, i, r.w, r.h)
      if (psnr < 40.0) {
        failed += 1
        if (failed <= 10) println(f"GATE_FAIL id=$i w=${r.w} h=${r.h} psnr=$psnr%.2f")
      }
      if (psnr < worst) worst = psnr
      i += 2
    }
    println(f"GATE_SCAN n=$n failed=$failed worst=$worst%.2f")
  }
}

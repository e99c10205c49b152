package graft.tools

import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Pure-JVM (no Spark) thread-scaling probe of the fetch+verify row work:
  * synthesize → encode → decode → PSNR → phash. Isolates ImageIO/GC
  * contention from Spark scheduling. */
object JvmProbe {
  def rowWork(i: Long): Long = {
    val r = graft.fixtures.FixtureGen.imageRow(i)
    val psnr = graft.functions.ImageOps.psnrVsSynthetic(r.bytes, i, r.w, r.h)
    val ph = graft.functions.ImageOps.phash64(r.bytes)
    if ((r.fmt == "png" && psnr == 999.0) || (r.fmt == "jpg" && psnr >= 40.0)) ph else -1L
  }

  def run(threads: Int, n: Long): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val tasks = (0 until threads).map { t =>
      new Callable[Long] {
        def call(): Long = {
          var acc = 0L
          var i = t.toLong
          while (i < n) { acc ^= rowWork(i); i += threads }
          acc
        }
      }
    }
    import scala.jdk.CollectionConverters._
    pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
    val sec = (System.nanoTime() - t0) / 1e9
    n / sec
  }

  /** Zero-allocation, zero-memory-traffic ALU control (round 6 — the
    * discriminator VERDICT r5 asked for): a register-resident splitmix64
    * mixing loop. If THIS flattens 8→32 like the decode kernel, the
    * ceiling is all-core turbo clock; if it scales near-linearly while
    * the kernel does not, the kernel's roof is memory bandwidth/LLC. */
  def aluRun(threads: Int, itersPerThread: Long): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val tasks = (0 until threads).map { t =>
      new Callable[Long] {
        def call(): Long = {
          var acc = t.toLong
          var i = 0L
          while (i < itersPerThread) { acc = graft.util.SplitMix64.mix(acc ^ i); i += 1 }
          acc
        }
      }
    }
    import scala.jdk.CollectionConverters._
    pool.invokeAll(tasks.asJava).asScala.foreach(_.get())
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
    val sec = (System.nanoTime() - t0) / 1e9
    threads * itersPerThread / sec
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 16000L
    (0 until 2000).foreach(i => rowWork(i.toLong)) // JIT warm-up
    Seq(1, 8, 32).foreach { t =>
      val rps = run(t, n)
      println(f"JVMPROBE threads=$t rps=$rps%.1f")
    }
    // ALU control: fixed per-thread work so ideal scaling = flat
    // iters/sec per thread; report aggregate ops/s per level
    aluRun(32, 50000000L) // warm
    Seq(2, 8, 16, 32).foreach { t =>
      val best = (1 to 3).map(_ => aluRun(t, 200000000L)).max
      println(f"JVMPROBE_ALU threads=$t mops=${best / 1e6}%.1f")
    }
  }
}

package graft

import java.nio.file.{Files, Paths}

import graft.fixtures.FixtureGen
import graft.jobs.JobManager
import graft.model.CrawlConfig
import graft.sources.FixtureFetcher

/** D10 analog — N concurrent crawls over one session with a job cap,
  * per-job state isolation, a unioned progress table, and the TTL sweep
  * (reference `src/jobs/manager.py:34-127,261-276`). */
class JobManagerSpec extends SparkSpec {
  import spark.implicits._

  private val params = FixtureGen.Params(hosts = 1, pagesPerHost = 12, skew = 2)
  private val cfg = CrawlConfig(
    seedUrls = FixtureGen.seeds(params), maxDepth = 5, epochSeconds = 30)
  private lazy val web = FixtureGen.webGraphDF(spark, params).cache()
  private lazy val images = FixtureGen.imagesDF(spark, params).cache()
  private lazy val policies = FixtureGen.robotsMap(params)

  test("revive: refuses active jobs, restores the entry when resubmit throws") {
    val root = Files.createTempDirectory("graft-revive").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 2)
    mgr.submit("j1", cfg, images, new FixtureFetcher(web), policies)
    mgr.awaitAll()
    assert(mgr.status("j1").contains(JobManager.Done))
    // resubmit throws → the old entry is RESTORED: the job must stay
    // visible to status/SSE and sweepable (sweep walks the in-memory map —
    // a vanished terminal job would leak its state dir forever)
    intercept[RuntimeException] {
      mgr.revive("j1") { throw new RuntimeException("boom") }
    }
    assert(mgr.status("j1").contains(JobManager.Done))
    assert(mgr.sweep(ttlMs = 0L).contains("j1")) // still sweepable
    // unknown id (fresh-process resume): revive runs the resubmit
    var ran = false
    assert(mgr.revive("fresh") { ran = true })
    assert(ran)
    // active job: refused, resubmit not run. A latch holds the crawl
    // in-flight so the check is deterministic (a finished tiny crawl
    // would be legitimately revivable)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val inner = new FixtureFetcher(web)
    val slow = new graft.sources.Fetcher {
      override def fetchPages(urls: org.apache.spark.sql.DataFrame) = {
        gate.await(); inner.fetchPages(urls)
      }
    }
    mgr.submit("j2", cfg, images, slow, policies)
    var hijacked = false
    assert(!mgr.revive("j2") { hijacked = true })
    assert(!hijacked)
    gate.countDown()
    mgr.awaitAll()
    mgr.shutdown()
  }

  test("worker's postprocess commit reaches phaseEpoch; sweep never touches a revived live job") {
    val root = Files.createTempDirectory("graft-sweeprevive").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 1)
    mgr.submit("jr", cfg, images, new FixtureFetcher(web), policies)
    mgr.awaitAll()
    assert(mgr.status("jr").contains(JobManager.Done))
    // ADVICE r4: the worker commits chunks through io.commit directly —
    // the engine's poll caches must refresh, or status/SSE report the
    // pre-commit phase (`complete`) forever
    assert(mgr.engineOf("jr").get.phaseEpoch.map(_._1).contains("postprocess"),
      s"phaseEpoch=${mgr.engineOf("jr").get.phaseEpoch}")
    // occupy the single slot so the revived incarnation stays Queued
    // deterministically while the sweep runs
    val gate = new java.util.concurrent.CountDownLatch(1)
    val inner = new FixtureFetcher(web)
    val slow = new graft.sources.Fetcher {
      override def fetchPages(urls: org.apache.spark.sql.DataFrame) = {
        gate.await(); inner.fetchPages(urls)
      }
    }
    mgr.submit("blocker", cfg, images, slow, policies)
    assert(mgr.revive("jr") { mgr.submit("jr", cfg, images,
      new FixtureFetcher(web), policies) })
    // a TTL-expired sweep against the revived (non-terminal) entry: the
    // claim re-check must skip it — no eviction, no state-dir delete
    assert(!mgr.sweep(ttlMs = 0L).contains("jr"))
    assert(mgr.status("jr").exists(s =>
      s == JobManager.Queued || s == JobManager.Running), mgr.status("jr").toString)
    assert(Files.exists(Paths.get(root, "jr")))
    gate.countDown()
    mgr.awaitAll()
    assert(mgr.status("jr").contains(JobManager.Done))
    mgr.shutdown()
  }

  test("three concurrent crawls: cap respected, isolated state, identical results, sweep") {
    val root = Files.createTempDirectory("graft-jobs").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 2)
    val ids = Seq("job-a", "job-b", "job-c")
    ids.foreach(id =>
      mgr.submit(id, cfg, images, new FixtureFetcher(web), policies))
    mgr.awaitAll()
    ids.foreach(id => assert(mgr.status(id).contains(JobManager.Done),
      s"$id: ${mgr.status(id)}"))

    // isolation: per-job state dirs exist; every job reproduced the same
    // deterministic crawl independently
    ids.foreach(id => assert(Files.exists(Paths.get(root, id, "manifest.properties"))))
    val counts = ids.map(id => mgr.engineOf(id).get.orderLog.count())
    assert(counts.distinct.size == 1 && counts.head > 0)
    val seenSets = ids.map(id =>
      mgr.engineOf(id).get.seen.select("urlNorm").as[String].collect().toSet)
    assert(seenSets.distinct.size == 1)

    // progress: the per-job ledgers union with a job_id tag
    val prog = mgr.progress
    assert(prog.select("job_id").distinct().as[String].collect().toSet == ids.toSet)
    assert(prog.columns.contains("partitionId")) // per-partition lineage rows

    // TTL sweep: everything finished, ttl 0 → all swept, dirs deleted
    val swept = mgr.sweep(ttlMs = 0L)
    assert(swept.toSet == ids.toSet)
    ids.foreach(id => assert(!Files.exists(Paths.get(root, id))))
    assert(mgr.status("job-a").isEmpty)
    mgr.shutdown()
  }

  test("cancel while queued: job never runs; cancel mid-flight leaves a resumable state dir") {
    val root = Files.createTempDirectory("graft-jobs-cancel").toString
    // cap 1 serializes: job-1 runs, job-2 waits on the semaphore. Submit
    // order does NOT fix which thread wins the slot, so wait until job-1
    // is actually Running before submitting job-2 — then job-2 is
    // deterministically queued when the cancel lands.
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 1)
    mgr.submit("job-1", cfg, images, new FixtureFetcher(web), policies)
    val deadline = System.currentTimeMillis() + 60000
    while (!mgr.status("job-1").contains(JobManager.Running) &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
    // a fixture crawl takes seconds and the poll is 10ms, so job-1 is
    // mid-crawl here — assert it, because the never-committed check below
    // is only meaningful while job-2 is deterministically queued
    assert(mgr.status("job-1").contains(JobManager.Running))
    mgr.submit("job-2", cfg, images, new FixtureFetcher(web), policies)
    mgr.cancel("job-2") // queued: job-1 holds the only slot
    mgr.awaitAll()
    assert(mgr.status("job-1").contains(JobManager.Done))
    assert(mgr.status("job-2").contains(JobManager.Cancelled))
    // cancelled-while-queued job never committed anything
    assert(!Files.exists(Paths.get(root, "job-2", "manifest.properties")))
    mgr.shutdown()
  }

  test("TTL clock vs cancel: mid-run cancel is unsweepable until the worker exits; " +
      "cancelling a paused job restarts the clock") {
    // half 1 — cancel mid-run: the cancelled engine is still unwinding
    // (job-group cancellation is async, the epoch commits at a stop
    // boundary), so an immediate sweep(0) must NOT delete the state dir
    // out from under it; only the worker's own exit stamp makes the job
    // TTL-eligible.
    val root = Files.createTempDirectory("graft-jobs-ttlclock").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 1)
    mgr.submit("job-c", cfg, images, new FixtureFetcher(web), policies)
    val deadline = System.currentTimeMillis() + 60000
    while (!mgr.status("job-c").contains(JobManager.Running) &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(mgr.status("job-c").contains(JobManager.Running))
    mgr.cancel("job-c")
    assert(mgr.status("job-c").contains(JobManager.Cancelled))
    // awaitAll returns immediately (cancel already flipped the status), so
    // poll: the job stays UNSWEEPABLE until the worker's own exit stamp
    // lands — each empty sweep() here is the fix working (the old code
    // stamped at cancel time and the first sweep deleted the state dir
    // under the still-unwinding engine)
    val dl = System.currentTimeMillis() + 60000
    var swept = Seq.empty[String]
    while (swept.isEmpty && System.currentTimeMillis() < dl) {
      swept = mgr.sweep(ttlMs = 0L)
      if (swept.isEmpty) Thread.sleep(20)
    }
    assert(swept == Seq("job-c"))

    // half 2 — cancel of a PAUSED job: TTL must measure from the cancel,
    // not from the pause-era worker exit (a stale stamp would let the
    // next sweep destroy the resume point cancel() promises to keep)
    val p2 = FixtureGen.Params(hosts = 2, pagesPerHost = 60, skew = 3)
    val cfg2 = CrawlConfig(
      seedUrls = FixtureGen.seeds(p2), maxDepth = 6, epochSeconds = 30)
    val web2 = FixtureGen.webGraphDF(spark, p2).cache()
    val img2 = FixtureGen.imagesDF(spark, p2).cache()
    val mgr2 = new JobManager(spark,
      Files.createTempDirectory("graft-jobs-ttlpause").toString, 1)
    mgr2.submit("job-p", cfg2, img2, new FixtureFetcher(web2),
      FixtureGen.robotsMap(p2))
    val dl2 = System.currentTimeMillis() + 60000
    var paused = false
    while (!paused && System.currentTimeMillis() < dl2) {
      paused = mgr2.pause("job-p") // true once the job is Running
      if (!paused) Thread.sleep(10)
    }
    assert(paused, "pause never landed")
    mgr2.awaitAll() // worker exits → Paused (stamps pause-era finishedAtMs)
    if (mgr2.status("job-p").contains(JobManager.Paused)) {
      Thread.sleep(300) // age the pause-era stamp past the TTL below
      mgr2.cancel("job-p")
      // with the stale stamp the job would look 300ms old and sweep NOW
      assert(mgr2.sweep(ttlMs = 250L).isEmpty,
        "freshly-cancelled paused job must not be TTL-expired yet")
      Thread.sleep(300)
      assert(mgr2.sweep(ttlMs = 250L) == Seq("job-p"))
    } // else: the crawl finished before the pause took effect — covered
      // deterministically by the dedicated pause test's bigger fixture
    mgr2.shutdown()
    mgr.shutdown()
  }

  test("resume-from-state: submitting into an existing state dir continues, not restarts") {
    // the reference's POST /jobs/resume-from-state analog: a NEW manager
    // (new process) over the same state root picks up the committed
    // manifest and continues instead of recrawling
    val root = Files.createTempDirectory("graft-jobs-resume").toString
    val mgr1 = new JobManager(spark, root, maxConcurrentJobs = 1)
    mgr1.submit("job-r", cfg, images, new FixtureFetcher(web), policies)
    mgr1.awaitAll()
    assert(mgr1.status("job-r").contains(JobManager.Done))
    val want = mgr1.engineOf("job-r").get.orderLog
      .select("urlNorm", "epoch").as[(String, Int)].collect().toSet
    mgr1.shutdown()

    val mgr2 = new JobManager(spark, root, maxConcurrentJobs = 1)
    mgr2.submit("job-r", cfg, images, new FixtureFetcher(web), policies)
    mgr2.awaitAll()
    assert(mgr2.status("job-r").contains(JobManager.Done))
    val got = mgr2.engineOf("job-r").get.orderLog
      .select("urlNorm", "epoch").as[(String, Int)].collect().toSet
    assert(got == want, "resume of a completed state dir must not redo or renumber work")
    mgr2.shutdown()
  }

  test("pause stops between epochs; resume reproduces the uninterrupted crawl") {
    // bigger fixture → multi-epoch fetch phase, so the pause lands mid-crawl
    val p2 = FixtureGen.Params(hosts = 2, pagesPerHost = 60, skew = 3)
    val cfg2 = CrawlConfig(
      seedUrls = FixtureGen.seeds(p2), maxDepth = 6, epochSeconds = 30)
    val web2 = FixtureGen.webGraphDF(spark, p2).cache()
    val img2 = FixtureGen.imagesDF(spark, p2).cache()
    val pol2 = FixtureGen.robotsMap(p2)
    def orderSet(mgr: JobManager, id: String): Set[(String, String)] =
      mgr.engineOf(id).get.orderLog.select("urlNorm", "disposition")
        .as[(String, String)].collect().toSet

    // reference: one uninterrupted run
    val refMgr = new JobManager(spark,
      Files.createTempDirectory("graft-pause-ref").toString, 1)
    refMgr.submit("ref", cfg2, img2, new FixtureFetcher(web2), pol2)
    refMgr.awaitAll()
    assert(refMgr.status("ref").contains(JobManager.Done))
    val want = orderSet(refMgr, "ref")
    refMgr.shutdown()

    val mgr = new JobManager(spark,
      Files.createTempDirectory("graft-pause").toString, 1)
    mgr.submit("p", cfg2, img2, new FixtureFetcher(web2), pol2)
    // pause/resume preconditions mirror the reference's 400s
    assert(!mgr.resume("p"), "resume of a non-paused job must refuse")
    val deadline = System.currentTimeMillis() + 60000
    while (!mgr.status("p").contains(JobManager.Running) &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(mgr.pause("p"), "pause of a running job")
    mgr.awaitAll() // returns once the worker stops between epochs
    // the multi-second crawl vs the 10ms poll makes a pre-completion pause
    // all but certain; if it ever races to Done the equality below still
    // gates the result
    if (mgr.status("p").contains(JobManager.Paused)) {
      assert(!mgr.pause("p"), "pause of a paused job must refuse")
      assert(mgr.resume("p"), "resume of a paused job")
      mgr.awaitAll()
    }
    assert(mgr.status("p").contains(JobManager.Done), mgr.status("p"))
    assert(orderSet(mgr, "p") == want,
      "pause+resume must reproduce the uninterrupted crawl exactly")
    // pages_completed accumulates ACROSS the pause (reference in-memory
    // JobStatus semantics)
    assert(mgr.engineOf("p").get.pagesCompleted == want.count(_._2 == "ok").toLong)
    // the post-scrape pipeline ran when the RESUMED run completed (it must
    // not fire on the pause exit): chunks committed, counters intact
    assert(mgr.lastCommittedPhase("p").exists(_._1 == "postprocess"))
    assert(mgr.engineOf("p").get.table("chunks").exists(_.count() > 0))
    mgr.shutdown()
  }

  test("tryAdmit: the cap check and the submit act under one manager-owned gate") {
    val root = Files.createTempDirectory("graft-admit").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 1)
    assert(mgr.tryAdmit(
      mgr.submit("adm-a", cfg, images, new FixtureFetcher(web), policies)))
    // adm-a stays Queued/Running for its multi-second crawl; a second
    // admission must refuse WITHOUT running its thunk
    var ran = false
    assert(!mgr.tryAdmit { ran = true })
    assert(!ran, "a refused admission must not run the submit thunk")
    mgr.awaitAll()
    assert(mgr.status("adm-a").contains(JobManager.Done))
    // capacity freed → admission opens again
    assert(mgr.tryAdmit(
      mgr.submit("adm-b", cfg, images, new FixtureFetcher(web), policies)))
    mgr.awaitAll()
    assert(mgr.status("adm-b").contains(JobManager.Done))
    mgr.shutdown()
  }

  test("pause racing the crawl's natural completion resolves to Done, not Paused") {
    // The manager breaks the tie via engine.stoppedEarly: a pause() whose
    // flag lands only AFTER the run finished its work must not strand a
    // completed job in non-terminal Paused (never swept, SSE never ends).
    // Engine-level, deterministic on both sides of the race:
    val io = new graft.sources.ParquetSnapshotTableIO(
      spark, Files.createTempDirectory("graft-pause-race").toString)
    val engine = new graft.epoch.CrawlEngine(
      spark, cfg, new FixtureFetcher(web), images, io, policies)
    engine.run()
    engine.pause() // the racing pause: flag lands after the natural end
    assert(!engine.stoppedEarly,
      "a run that finished its frontier must not read as stopped-early")

    // other side: a pause honored BEFORE/DURING the run (the JobManager
    // worker's clearPriorStop=false path) does read as stopped-early
    val io2 = new graft.sources.ParquetSnapshotTableIO(
      spark, Files.createTempDirectory("graft-pause-race2").toString)
    val e2 = new graft.epoch.CrawlEngine(
      spark, cfg, new FixtureFetcher(web), images, io2, policies)
    e2.pause()
    e2.run(clearPriorCancel = false, clearPriorStop = false)
    assert(e2.stoppedEarly, "an honored pause stops the run early")
  }

  test("two subtrees of ONE host crawl as two jobs: isolated state, merged progress") {
    // The engine enforces one seed per host (reference: one base_url per
    // job — api/models.py JobRequest.url); the JobManager IS the
    // multi-seed answer: one job per seed, isolated state dirs, one
    // unioned progress view. Round-3 ask #9.
    def subtree(sub: String): Seq[FixtureGen.PageRow] = {
      def mk(path: String, links: Seq[String]) = FixtureGen.PageRow(
        s"https://site-0.test$path", "site-0.test", 200, "text/html",
        s"<html><body><main>${s"content for $path " * 40}</main></body></html>",
        links, Seq.empty, Seq.empty, "http_fast", 5L)
      Seq(
        mk(s"/$sub", Seq(s"https://site-0.test/$sub/p1", s"https://site-0.test/$sub/p2")),
        mk(s"/$sub/p1", Seq(s"https://site-0.test/$sub/p2")),
        mk(s"/$sub/p2", Seq.empty))
    }
    // the engine itself refuses two seeds on one host — and points here
    val twoSeeds = CrawlConfig(
      seedUrls = Seq("https://site-0.test/a", "https://site-0.test/b"),
      maxDepth = 3, epochSeconds = 30)
    val err = intercept[IllegalArgumentException] {
      new graft.epoch.CrawlEngine(spark, twoSeeds,
        new FixtureFetcher(subtree("a").toDF()), images,
        new graft.sources.ParquetSnapshotTableIO(
          spark, Files.createTempDirectory("graft-two-seed").toString),
        Map("site-0.test" -> graft.operators.Robots.parse("User-agent: *\n")))
    }
    assert(err.getMessage.contains("JobManager"))

    val root = Files.createTempDirectory("graft-jobs-subtrees").toString
    val mgr = new JobManager(spark, root, maxConcurrentJobs = 2)
    val oneHostWeb = (subtree("a") ++ subtree("b")).toDF()
    val pol = Map("site-0.test" -> graft.operators.Robots.parse("User-agent: *\n"))
    def cfgFor(sub: String) = CrawlConfig(
      seedUrls = Seq(s"https://site-0.test/$sub"), maxDepth = 3, epochSeconds = 30)
    mgr.submit("sub-a", cfgFor("a"), images, new FixtureFetcher(oneHostWeb), pol)
    mgr.submit("sub-b", cfgFor("b"), images, new FixtureFetcher(oneHostWeb), pol)
    mgr.awaitAll()
    assert(mgr.status("sub-a").contains(JobManager.Done), mgr.status("sub-a"))
    assert(mgr.status("sub-b").contains(JobManager.Done), mgr.status("sub-b"))

    // isolation: each job crawled ONLY its subtree, in its own state dir
    Seq("sub-a", "sub-b").foreach(id =>
      assert(Files.exists(Paths.get(root, id, "manifest.properties"))))
    def dispatched(id: String): Set[String] =
      mgr.engineOf(id).get.orderLog.select("urlNorm").as[String].collect().toSet
    val a = dispatched("sub-a")
    val b = dispatched("sub-b")
    assert(a.nonEmpty && a.forall(_.startsWith("https://site-0.test/a")), a)
    assert(b.nonEmpty && b.forall(_.startsWith("https://site-0.test/b")), b)
    assert((a intersect b).isEmpty)

    // the merged progress view covers both subtrees of the shared host
    val prog = mgr.progress
    assert(prog.select("job_id").distinct().as[String].collect().toSet ==
      Set("sub-a", "sub-b"))
    mgr.shutdown()
  }
}

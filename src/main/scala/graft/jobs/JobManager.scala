package graft.jobs

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.{ConcurrentHashMap, Executors, Semaphore, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.epoch.CrawlEngine
import graft.model.CrawlConfig

/** D10 analog — the reference's multi-job lifecycle manager
  * (`src/jobs/manager.py:34-127,261-276`): N concurrent crawls over ONE
  * SparkSession with a concurrent-job cap, per-job state dirs, pause /
  * cancel per job, a TTL sweep that deletes finished jobs' state, and a
  * `progress` view unioning the per-job ledgers (the SSE progress-stream
  * analog, re-expressed as a queryable table).
  *
  * Spark facts this leans on: one session runs concurrent jobs from
  * separate driver threads safely; `setJobGroup` is thread-local, so each
  * engine's cancel() targets only its own in-flight Spark jobs. The
  * executor pool is shared — the cap bounds driver-side concurrency the
  * same way the reference's `MAX_CONCURRENT_JOBS` bounds its asyncio
  * tasks (`manager.py:34`).
  */
final class JobManager(
    spark: SparkSession,
    stateRoot: String,
    /** reference MAX_CONCURRENT_JOBS (`manager.py:34`) — submissions
      * beyond it queue on the semaphore. */
    maxConcurrentJobs: Int = 3) {
  require(maxConcurrentJobs >= 1, "maxConcurrentJobs >= 1")
  import JobManager._

  private final class Job(
      val engine: CrawlEngine,
      /** the engine's table backend — the worker's post-scrape commit and
        * nothing else reaches it directly. */
      val io: graft.sources.TableIO,
      @volatile var status: Status,
      @volatile var finishedAtMs: Long,
      /** set by pause(); the worker maps a pause-stopped run to Paused
        * (not Done) when it returns. */
      @volatile var pausePending: Boolean = false,
      /** post-scrape pipeline on natural completion (reference runs it per
        * job, `runner.py:543-620`). */
      val postprocess: Boolean = true)

  private val jobs = new ConcurrentHashMap[String, Job]()
  private val slots = new Semaphore(maxConcurrentJobs, true)
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r); t.setDaemon(true); t
  })

  private def stateDir(jobId: String): Path = Paths.get(stateRoot, jobId)

  /** Per-id monitor serializing state-dir create (submit) against state-dir
    * delete (sweep): without it, a revive that lost its map entry to a
    * concurrent sweep claim could resubmit and recreate the dir WHILE the
    * sweep's recursive delete walks it — deleting a live job's state
    * mid-crawl (or throwing DirectoryNotEmptyException out of sweep). */
  private val dirLocks = new ConcurrentHashMap[String, Object]()
  private def dirLock(jobId: String): Object =
    dirLocks.computeIfAbsent(jobId, _ => new Object)

  /** Submit a crawl; returns immediately. One state dir per job
    * (`stateRoot/jobId`) — the isolation unit, like the reference's
    * per-job `.crawls/<id>` (`src/jobs/state.py`). Cross-process
    * resume-from-state (`routes.py:318` resume-from-state) is this same
    * call in a new process: a state dir that already holds a committed
    * manifest makes the engine continue from its last epoch instead of
    * starting over. */
  def submit(jobId: String, cfg: CrawlConfig, images: DataFrame,
      fetcher: graft.sources.Fetcher,
      policies: Map[String, graft.operators.Robots.Policy],
      ssrfCheck: String => Boolean =
        u => !graft.operators.Ssrf.isSsrf(u),
      /** sitemap bodies for the discovery cascade (the per-job bootstrap a
        * serving front-end like [[graft.Serve]] fetches before submit). */
      sitemaps: Option[DataFrame] = None,
      warmCache: Option[DataFrame] = None,
      /** post-scrape chunk→classify→cleanup on natural completion — on by
        * default like the reference's per-job pipeline. */
      postprocess: Boolean = true): Unit = dirLock(jobId).synchronized {
    // the whole setup runs under the id's dir lock: a sweep that claimed a
    // prior incarnation of this id either finishes its delete before our
    // createDirectories, or sees the fresh map entry and leaves the dir
    if (jobs.containsKey(jobId))
      throw new DuplicateJobException(s"job $jobId already submitted")
    Files.createDirectories(stateDir(jobId))
    val io = new graft.sources.ParquetSnapshotTableIO(
      spark, stateDir(jobId).toString)
    val engine = new CrawlEngine(spark, cfg, fetcher, images, io, policies,
      sitemaps = sitemaps, warmCache = warmCache, ssrfCheck = ssrfCheck)
    val job = new Job(engine, io, Queued, 0L, postprocess = postprocess)
    // putIfAbsent is the authoritative uniqueness check — the containsKey
    // fast-fail above is advisory; two concurrent submits of one id must
    // not both pass (the loser's put would orphan the winner's worker and
    // run two engines over one state dir)
    if (jobs.putIfAbsent(jobId, job) != null)
      throw new DuplicateJobException(s"job $jobId already submitted")
    schedule(job)
  }

  /** Queue one run of `job.engine` on the worker pool (initial submit AND
    * resume-after-pause share this path). */
  private def schedule(job: Job): Unit =
    pool.submit(new Runnable {
      override def run(): Unit = {
        slots.acquire()
        try {
          // a cancel() that landed while queued must not start the crawl;
          // the transition is locked so cancel() cannot interleave, and
          // clearPriorCancel=false closes the remaining window (a cancel
          // racing the run start sets engine.cancelRequested, which the
          // engine then honors instead of resetting)
          job.synchronized {
            if (job.status == Cancelled) return
            job.status = Running
          }
          job.engine.run(clearPriorCancel = false, clearPriorStop = false)
          // post-scrape pipeline (the reference runs chunk→classify→
          // cleanup per JOB, runner.py:543-620 — served jobs must get it,
          // not only Crawl-facade runs): after NATURAL completion only; a
          // paused/cancelled run resumes first and postprocesses when it
          // finishes. A cancel landing mid-commit interrupts the job group
          // (withJobGroup re-checks after registering, closing the
          // check-then-act window) and the throw maps below (Cancelled
          // wins over Failed). Skips when the tail already says
          // postprocess — a resumed finished dir must not re-chunk.
          if (job.postprocess && !job.engine.stoppedEarly &&
              job.status != Cancelled)
            job.engine.withJobGroup("post-scrape chunks")(
              graft.operators.Postprocess.commitChunks(spark, job.engine, job.io))
          job.synchronized {
            job.status =
              if (job.status == Cancelled) Cancelled
              // pausePending alone is not enough: a pause() racing the
              // run's NATURAL completion (it took the job lock just
              // before this block) would mark a finished crawl Paused —
              // permanently non-terminal, never swept, SSE never closes.
              // The engine records whether the stop flag actually ended
              // the run with work still pending.
              else if (job.pausePending && job.engine.stoppedEarly) {
                job.pausePending = false; Paused
              } else { job.pausePending = false; Done }
          }
        } catch {
          case e: Throwable => job.synchronized {
            // a concurrent cancel() wins: the state dir is a valid resume
            // point and the caller asked for the stop
            if (job.status != Cancelled) job.status = Failed(
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        } finally {
          job.finishedAtMs = System.currentTimeMillis()
          slots.release()
        }
      }
    })

  def status(jobId: String): Option[Status] =
    Option(jobs.get(jobId)).map(_.status)

  /** Jobs currently queued or running (`manager.py active_job_count`) —
    * the serving layer's 429 admission check reads this. */
  def activeJobCount: Int =
    jobs.values().asScala.count(j => j.status == Queued || j.status == Running)

  /** Race-safe cap admission for serving layers: runs `submitThunk` (which
    * must call [[submit]]) only while activeJobCount < maxConcurrent, both
    * checked and acted under ONE lock — so N concurrent front-ends (or a
    * server plus direct callers using this gate) cannot over-admit. Owning
    * the invariant here, on the state it guards, rather than in an HTTP
    * handler's private lock, is what makes it hold globally. Returns false
    * (thunk not run) at the cap. Direct [[submit]] keeps its documented
    * queue-on-semaphore behavior for embedders that WANT queuing; resume()
    * likewise re-queues past the cap by design (reference resume_job
    * re-enqueues rather than 429ing). */
  def tryAdmit(submitThunk: => Unit): Boolean = {
    // reserve under the lock, run the thunk OUTSIDE it: serving submitters
    // do real work in the thunk (per-seed robots/sitemap bootstrap over the
    // network, request persistence) — holding the gate through a 5s-timeout
    // fetch to a dead host would serialize and wedge every concurrent
    // create/resume on this manager
    admissionGate.synchronized {
      if (activeJobCount + reservations >= maxConcurrentJobs) return false
      reservations += 1
    }
    // between submit (job now in the map) and the release below the job is
    // momentarily double-counted — conservative: a racer at the cap gets a
    // spurious 429, never an over-admit
    try { submitThunk; true }
    finally admissionGate.synchronized { reservations -= 1 }
  }
  private val admissionGate = new Object
  private var reservations = 0 // guarded by admissionGate

  /** The configured cap, for the serving layer's admission message. */
  def maxConcurrent: Int = maxConcurrentJobs

  /** Absolute state directory of a job — the durable identity unit
    * (`stateRoot/jobId`, the reference's `.crawls/<id>`). The serving
    * layer persists the validated create request here so
    * resume-from-state can reconstruct it (reference `state.request`). */
  def stateDirOf(jobId: String): Path = stateDir(jobId)

  /** Phase/epoch of the job's last durable commit, read straight from the
    * state dir's manifest — needs no live engine, so it works across
    * process restarts (the resume-from-state completeness probe:
    * `complete` — or the facade's `postprocess` — is the terminal phase a
    * finished crawl commits). */
  def lastCommittedPhase(jobId: String): Option[(String, Int)] =
    new graft.sources.ParquetSnapshotTableIO(
      spark, stateDir(jobId).toString).lastCommitted

  /** Revive a TERMINAL (or unknown — fresh process) job id over its state
    * dir (PR 3.1 resume-from-state, `routes.py:355` — the reference
    * revives a finished/cancelled job's pending work as a new run; here
    * job id ≡ state dir, so revival reuses the id): atomically drops the
    * old entry and runs `resubmit` (which must [[submit]] the same id).
    * If resubmit throws, the old entry is RESTORED before rethrowing — a
    * failed revival must not leave the job invisible to status/SSE and,
    * since [[sweep]] only walks the in-memory map, permanently unsweepable
    * (a state-dir leak). Returns false (resubmit not run) while the job is
    * still active — callers must 409, not hijack a running engine. */
  def revive(jobId: String)(resubmit: => Unit): Boolean = {
    val old = jobs.get(jobId)
    if (old != null) {
      val removable = old.synchronized {
        old.status match {
          case Done | Cancelled | Failed(_) => true
          case _ => false
        }
      }
      if (!removable) return false
      // a racer replacing the entry between get and remove re-evaluates
      if (!jobs.remove(jobId, old)) return revive(jobId)(resubmit)
    }
    try resubmit
    catch {
      case e: Throwable =>
        if (old != null) jobs.putIfAbsent(jobId, old)
        throw e
    }
    true
  }

  /** The job's engine, for table access (`orderLog`, `fetched`, …) — the
    * reference's `GET /api/jobs/{id}` result object analog. */
  def engineOf(jobId: String): Option[CrawlEngine] =
    Option(jobs.get(jobId)).map(_.engine)

  /** Cancel a job: aborts its in-flight Spark jobs (ST3); the last
    * committed epoch stays the resume point in its state dir. */
  def cancel(jobId: String): Unit =
    Option(jobs.get(jobId)).foreach { j =>
      j.synchronized {
        if (j.status == Queued || j.status == Running || j.status == Paused) {
          val wasPaused = j.status == Paused
          j.status = Cancelled
          j.engine.cancel()
          // Queued/Running: the worker's finally stamps finishedAtMs when
          // the engine actually exits — stamping here would let a TTL
          // sweep delete the state dir while the cancelled run is still
          // unwinding (job-group cancellation is asynchronous and the
          // engine commits the in-flight epoch at stop boundaries).
          // Paused: no worker to observe the transition — stamp NOW, and
          // fresh: the worker's pause-era stamp would backdate the TTL
          // clock and sweep the promised resume point immediately.
          if (wasPaused) j.finishedAtMs = System.currentTimeMillis()
        }
      }
    }

  /** Graceful pause (reference PR 3.1 `pause_job`, `routes.py:313-334`):
    * the job's running epoch commits normally, then the run stops and the
    * slot frees; the last committed epoch is the resume point. Running
    * jobs only — a queued job should be cancelled instead, a terminal one
    * has nothing to pause. Returns true if the pause was requested. */
  def pause(jobId: String): Boolean =
    Option(jobs.get(jobId)).exists { j =>
      j.synchronized {
        if (j.status == Running) {
          j.pausePending = true
          j.engine.pause()
          true
        } else false
      }
    }

  /** Resume a paused job (`routes.py:336-349`): re-queues a run that
    * continues from the last committed epoch in the job's state dir.
    * Returns true if a resume was scheduled. */
  def resume(jobId: String): Boolean =
    Option(jobs.get(jobId)).exists { j =>
      j.synchronized {
        if (j.status == Paused) {
          j.status = Queued
          j.engine.clearPause() // the worker runs with clearPriorStop=false
          schedule(j)
          true
        } else false
      }
    }

  /** Block until no job is Queued or Running (i.e. every job is terminal
    * or Paused). */
  def awaitAll(timeoutMs: Long = 600000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (jobs.values().asScala.exists(j =>
        j.status == Queued || j.status == Running)) {
      require(System.currentTimeMillis() < deadline, "awaitAll timed out")
      Thread.sleep(50)
    }
  }

  /** Union of per-job ledgers with a job_id column — the SSE progress
    * stream (`manager.py:261-276`) as a queryable table. */
  def progress: DataFrame = {
    val parts = jobs.asScala.toSeq.sortBy(_._1).flatMap { case (id, j) =>
      j.engine.table("ledger").map(_.withColumn("job_id", lit(id)))
    }
    require(parts.nonEmpty, "no job has committed a ledger yet")
    parts.reduce(_ unionByName _)
  }

  /** TTL sweep (`manager.py:110-127`): delete the state dirs of jobs that
    * reached a terminal state more than `ttlMs` ago and forget them.
    * Returns the swept job ids.
    *
    * Race-safe against [[revive]]/[[submit]]: each candidate is CLAIMED
    * under its job lock — re-checking terminal + TTL and removing exactly
    * the collected instance via `remove(id, j)` — so a revival that
    * swapped in a new Queued/Running entry between snapshot and delete is
    * never evicted, and the state-dir delete runs under the id's dir lock
    * with a map re-check, so it can never race a resubmit's recreate. */
  def sweep(ttlMs: Long): Seq[String] = {
    val now = System.currentTimeMillis()
    jobs.asScala.toSeq.flatMap { case (id, j) =>
      val claimed = j.synchronized {
        (j.status match {
          case Done | Cancelled | Failed(_) => true
          case _ => false
        }) && j.finishedAtMs > 0 && now - j.finishedAtMs >= ttlMs &&
          jobs.remove(id, j)
      }
      if (!claimed) None
      else {
        val lock = dirLock(id)
        val deleted =
          try {
            lock.synchronized {
              // a revive that saw our removal may already have resubmitted:
              // the dir now belongs to the NEW job — leave it alone
              if (!jobs.containsKey(id)) {
                val dir = stateDir(id)
                if (Files.exists(dir)) {
                  val s = Files.walk(dir)
                  try s.sorted(java.util.Comparator.reverseOrder())
                    .forEach(p => { val _ = Files.deleteIfExists(p) })
                  finally s.close()
                }
              }
              true
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              // transient FS failure mid-delete: RESTORE the claimed entry so
              // the next sweep retries — sweep only walks the in-memory map,
              // so dropping the entry here would orphan the dir forever
              // (putIfAbsent: if a revive resubmitted meanwhile, the new job
              // owns the id and the dir; the old instance is correctly gone)
              jobs.putIfAbsent(id, j)
              false
          }
        // drop the lock entry (conditionally, on the same instance) so a
        // UUID-per-create serving process does not grow dirLocks unboundedly
        dirLocks.remove(id, lock)
        if (deleted) Some(id) else None
      }
    }
  }

  def shutdown(): Unit = {
    pool.shutdown()
    pool.awaitTermination(10, TimeUnit.SECONDS)
  }
}

object JobManager {
  /** Thrown by [[JobManager.submit]] when the id is already mapped — the
    * ONLY failure that means "another submitter won the race". A typed
    * exception (not a message substring) so serving layers can 409 it
    * without misrouting validation failures whose user-controlled text
    * happens to contain the same words. */
  final class DuplicateJobException(msg: String)
    extends IllegalArgumentException(msg)

  sealed trait Status
  case object Queued extends Status
  case object Running extends Status
  /** Stopped between epochs by pause(); resume() continues it. Non-
    * terminal: not swept, and an SSE stream keeps waiting with
    * keepalives (reference semantics). */
  case object Paused extends Status
  case object Done extends Status
  final case class Failed(error: String) extends Status
  case object Cancelled extends Status
}

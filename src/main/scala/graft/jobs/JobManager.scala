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
      @volatile var status: Status,
      @volatile var finishedAtMs: Long)

  private val jobs = new ConcurrentHashMap[String, Job]()
  private val slots = new Semaphore(maxConcurrentJobs, true)
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r); t.setDaemon(true); t
  })

  private def stateDir(jobId: String): Path = Paths.get(stateRoot, jobId)

  /** Submit a crawl; returns immediately. One state dir per job
    * (`stateRoot/jobId`) — the isolation unit, like the reference's
    * per-job `.crawls/<id>` (`src/jobs/state.py`). */
  def submit(jobId: String, cfg: CrawlConfig, images: DataFrame,
      fetcher: graft.sources.Fetcher,
      policies: Map[String, graft.operators.Robots.Policy],
      ssrfCheck: String => Boolean =
        u => !graft.operators.Ssrf.isSsrf(u)): Unit = {
    require(!jobs.containsKey(jobId), s"job $jobId already submitted")
    Files.createDirectories(stateDir(jobId))
    val io = new graft.sources.ParquetSnapshotTableIO(
      spark, stateDir(jobId).toString)
    val engine = new CrawlEngine(spark, cfg, fetcher, images, io, policies,
      ssrfCheck = ssrfCheck)
    val job = new Job(engine, Queued, 0L)
    jobs.put(jobId, job)
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
          engine.run(clearPriorCancel = false)
          job.synchronized {
            job.status = if (job.status == Cancelled) Cancelled else Done
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
  }

  def status(jobId: String): Option[Status] =
    Option(jobs.get(jobId)).map(_.status)

  /** The job's engine, for table access (`orderLog`, `fetched`, …) — the
    * reference's `GET /api/jobs/{id}` result object analog. */
  def engineOf(jobId: String): Option[CrawlEngine] =
    Option(jobs.get(jobId)).map(_.engine)

  /** Cancel a job: aborts its in-flight Spark jobs (ST3); the last
    * committed epoch stays the resume point in its state dir. */
  def cancel(jobId: String): Unit =
    Option(jobs.get(jobId)).foreach { j =>
      j.synchronized {
        if (j.status == Queued || j.status == Running) {
          j.status = Cancelled
          j.engine.cancel()
        }
      }
    }

  /** Block until every submitted job reaches a terminal state. */
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
    * Returns the swept job ids. */
  def sweep(ttlMs: Long): Seq[String] = {
    val now = System.currentTimeMillis()
    val expired = jobs.asScala.toSeq.collect {
      case (id, j) if (j.status match {
        case Done | Cancelled | Failed(_) => true
        case _ => false
      }) && j.finishedAtMs > 0 && now - j.finishedAtMs >= ttlMs => id
    }
    expired.foreach { id =>
      val dir = stateDir(id)
      if (Files.exists(dir)) {
        val s = Files.walk(dir)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
        finally s.close()
      }
      jobs.remove(id)
    }
    expired
  }

  def shutdown(): Unit = {
    pool.shutdown()
    pool.awaitTermination(10, TimeUnit.SECONDS)
  }
}

object JobManager {
  sealed trait Status
  case object Queued extends Status
  case object Running extends Status
  case object Done extends Status
  final case class Failed(error: String) extends Status
  case object Cancelled extends Status
}

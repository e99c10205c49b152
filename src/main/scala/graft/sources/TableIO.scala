package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot table layer with atomic multi-table commits (SURVEY §7).
  *
  * Two backends share one contract — snapshot reads + one atomic commit per
  * epoch:
  *  - [[ParquetSnapshotTableIO]] (sandbox): versioned parquet dirs + an
  *    atomically-renamed manifest pointer, mirroring the reference's
  *    `.tmp → os.replace` checkpoint atomicity (`src/jobs/state.py:56-58`).
  *  - Iceberg on a real cluster: the engine emits the DDL via
  *    [[TableIO.icebergDDL]]; snapshot-commit atomicity is native there.
  *
  * Single writer (the driver) — same as the reference's one-job-one-state
  * model; epoch re-runs after a crash are idempotent because an uncommitted
  * epoch's data dirs are simply unreferenced.
  */
trait TableIO {

  /** Atomically publish (phase, epoch): `tables` are full replacements
    * (snapshot), `appends` add a new data file set to an append-mode table
    * (the Iceberg fast-append analog — per-epoch deltas, no rewrite).
    *
    * `counters` is BY-NAME and evaluated after the data writes, before the
    * manifest pointer move: callers can source counters from
    * `Observation`s attached to the written DataFrames, so disposition /
    * histogram / validation counts ride the write actions instead of
    * costing extra per-epoch jobs (the round-2 q29 regression). */
  def commit(phase: String, epoch: Int, tables: Map[String, DataFrame],
      appends: Map[String, DataFrame] = Map.empty,
      counters: => Map[String, Long] = Map.empty): Unit

  /** Latest committed snapshot of a table, if any. */
  def read(table: String): Option[DataFrame]

  /** Last committed (phase, epoch), if any — the resume point. */
  def lastCommitted: Option[(String, Int)]

  /** Counters of the last commit (ledger tail). */
  def lastCounters: Map[String, Long]
}

object TableIO {
  /** Iceberg DDL the engine would run on a real cluster (documented +
    * unit-checked as strings; no Iceberg runtime jar ships in the sandbox).
    */
  def icebergDDL(table: String, columnsSql: String, bucketCol: String, buckets: Int): String =
    s"CREATE TABLE IF NOT EXISTS $table ($columnsSql) USING iceberg " +
      s"PARTITIONED BY (bucket($buckets, $bucketCol))"
}

/** Iceberg backend for real clusters — same contract, same pointer-commit
  * design as the parquet impl: data tables are written first, then ONE row
  * appended to a `graft_manifest` table records (phase, epoch, per-table
  * snapshot ids, counters). That single append is the atomic pointer;
  * reads time-travel (`VERSION AS OF`) to the recorded snapshot ids, so a
  * crash between data write and manifest append leaves orphan snapshots
  * that no reader references. Idempotent epoch re-run: overwrite tables
  * supersede orphans naturally, but Iceberg APPEND snapshots are
  * CUMULATIVE — a re-run's append would include the orphaned pre-crash
  * rows too — so every append first resets the table to the manifest's
  * recorded snapshot (rollback, or delete-all when the crash predated the
  * first manifest row). Operational requirement: snapshot expiry must
  * retain manifest-referenced snapshots (`expire_snapshots` older-than
  * the oldest manifest row still needed for resume).
  *
  * No Iceberg runtime jar ships in this sandbox, so construction is gated
  * on [[IcebergTableIO.available]]; the SQL builders are pure and
  * unit-tested, the live path runs on any cluster with
  * `iceberg-spark-runtime` and a configured catalog.
  */
/** The narrow surface [[IcebergTableIO]] needs from a live catalog.
  * [[SparkIcebergCatalog]] is the real implementation (requires the Iceberg
  * runtime jar); tests drive the commit/read/resume ORCHESTRATION —
  * snapshot-id bookkeeping, entry carry-forward, `VERSION AS OF` selection,
  * crash-orphan semantics — against an in-memory fake that records every
  * issued statement, so the only code untested in-sandbox is Iceberg
  * itself. */
trait IcebergCatalog {
  /** DDL only (CREATE TABLE IF NOT EXISTS …). */
  def sql(ddl: String): Unit
  /** None when the table has no snapshot yet (e.g. an empty append to a
    * just-created table may not create one). */
  def latestSnapshotId(fqn: String): Option[Long]
  /** Full-snapshot replacement (`overwrite(lit(true))` semantics). */
  def overwrite(fqn: String, df: DataFrame): Unit
  def append(fqn: String, df: DataFrame): Unit
  def manifestTail(manifestFqn: String): Option[IcebergTableIO.ManifestEntry]
  /** THE atomic pointer move (one appended manifest row). */
  def appendManifest(manifestFqn: String, entry: IcebergTableIO.ManifestEntry): Unit
  def readVersionAsOf(fqn: String, snapshotId: Long): DataFrame
  /** Reset the table's CURRENT state to `snapshotId` (discarding later,
    * orphaned appends from visible history) — crash-recovery for append
    * tables before a re-run appends again. */
  def rollbackTo(fqn: String, snapshotId: Long): Unit
  /** Logical truncate — crash-recovery when appends were orphaned before
    * the FIRST manifest row existed (no snapshot to roll back to). */
  def deleteAll(fqn: String): Unit
}

/** Live catalog calls, verbatim from the pre-seam implementation. */
final class SparkIcebergCatalog(spark: SparkSession) extends IcebergCatalog {
  require(IcebergTableIO.available,
    "Iceberg runtime not on the classpath; add iceberg-spark-runtime and " +
      "configure spark.sql.catalog.<name> (sandbox uses ParquetSnapshotTableIO)")
  import IcebergTableIO._

  override def sql(ddl: String): Unit = spark.sql(ddl)

  override def latestSnapshotId(fqn: String): Option[Long] =
    spark.sql(latestSnapshotSql(fqn)).collect().headOption.map(_.getLong(0))

  // full-snapshot replacement: overwrite(true), NOT overwritePartitions
  // — dynamic partition overwrite would keep stale rows in bucket
  // partitions absent from the new frame (e.g. a fully-dequeued host's
  // pending bucket), breaking the TableIO snapshot contract
  override def overwrite(fqn: String, df: DataFrame): Unit =
    df.writeTo(fqn).overwrite(org.apache.spark.sql.functions.lit(true))

  override def append(fqn: String, df: DataFrame): Unit =
    df.writeTo(fqn).append()

  override def manifestTail(manifestFqn: String): Option[ManifestEntry] =
    spark.sql(s"SELECT * FROM $manifestFqn ORDER BY version DESC LIMIT 1")
      .collect().headOption.map { r =>
        ManifestEntry(r.getAs[Int]("version"), r.getAs[String]("phase"),
          r.getAs[Int]("epoch"), r.getAs[Map[String, Long]]("entries"),
          r.getAs[Map[String, Long]]("counters"))
      }

  override def appendManifest(manifestFqn: String, e: ManifestEntry): Unit = {
    import spark.implicits._
    Seq((e.version, e.phase, e.epoch, e.entries, e.counters))
      .toDF("version", "phase", "epoch", "entries", "counters")
      .writeTo(manifestFqn).append()
  }

  override def readVersionAsOf(fqn: String, snapshotId: Long): DataFrame =
    spark.sql(s"SELECT * FROM $fqn VERSION AS OF $snapshotId")

  override def rollbackTo(fqn: String, snapshotId: Long): Unit =
    spark.sql(rollbackSql(fqn, snapshotId))

  override def deleteAll(fqn: String): Unit =
    spark.sql(deleteAllSql(fqn))
}

final class IcebergTableIO private[graft] (catalog: IcebergCatalog,
    /** catalog.namespace prefix, e.g. "prod.graft_crawl42". */
    db: String,
    bucketCol: String, numBuckets: Int) extends TableIO {

  def this(spark: SparkSession, db: String,
      bucketCol: String = "host", numBuckets: Int = 32) =
    this(new SparkIcebergCatalog(spark), db, bucketCol, numBuckets)

  import IcebergTableIO._

  private def fqn(table: String) = s"$db.graft_$table"
  private def manifestFqn = s"$db.graft_manifest"

  private def tail(): Option[ManifestEntry] = {
    catalog.sql(manifestDDL(manifestFqn))
    catalog.manifestTail(manifestFqn)
  }

  override def commit(phase: String, epoch: Int, tables: Map[String, DataFrame],
      appends: Map[String, DataFrame], counters: => Map[String, Long]): Unit = {
    val overlap = tables.keySet intersect appends.keySet
    require(overlap.isEmpty, s"table(s) in both tables and appends: $overlap")
    val prev = tail()
    // carry forward entries for tables not in this commit (multi-table
    // snapshot semantics, same as the parquet impl's manifest properties)
    val prevEntries: Map[String, Long] = prev.map(_.entries).getOrElse(Map.empty)
    val version = prev.map(_.version + 1).getOrElse(1)
    val written = scala.collection.mutable.Map.empty[String, Long]
    def writeOne(name: String, df: DataFrame, isAppend: Boolean): Unit = {
      catalog.sql(TableIO.icebergDDL(fqn(name),
        df.schema.toDDL, bucketCol = bucketColFor(df, bucketCol), numBuckets))
      if (isAppend) {
        // append snapshots are CUMULATIVE: a crash between a data append
        // and the manifest append leaves orphaned rows that a naive
        // re-run would silently double (the overwrite path supersedes
        // orphans by construction). Reset to the manifest's recorded
        // snapshot first — a metadata-only check in the common case
        // (current == recorded).
        (prevEntries.get(name), catalog.latestSnapshotId(fqn(name))) match {
          case (Some(recorded), Some(cur)) if recorded != cur =>
            catalog.rollbackTo(fqn(name), recorded)
          case (None, Some(_)) => // orphan predates the first manifest row
            catalog.deleteAll(fqn(name))
          case _ => ()
        }
        catalog.append(fqn(name), df)
      } else catalog.overwrite(fqn(name), df)
      // a snapshot-less table (empty append on a fresh table) is omitted
      // from the entry — read() treats it as absent, same as never written
      catalog.latestSnapshotId(fqn(name)).foreach(written(name) = _)
    }
    tables.toSeq.sortBy(_._1).foreach { case (n, df) => writeOne(n, df, isAppend = false) }
    appends.toSeq.sortBy(_._1).foreach { case (n, df) => writeOne(n, df, isAppend = true) }
    // counters by-name: evaluated after the data writes (same contract as
    // the parquet impl — Observation-sourced counters ride the writes)
    val cs = counters
    catalog.appendManifest(manifestFqn,
      ManifestEntry(version, phase, epoch, prevEntries ++ written, cs))
  }

  override def read(table: String): Option[DataFrame] =
    tail().flatMap(_.entries.get(table).map(catalog.readVersionAsOf(fqn(table), _)))

  override def lastCommitted: Option[(String, Int)] =
    tail().map(e => (e.phase, e.epoch))

  override def lastCounters: Map[String, Long] =
    tail().map(_.counters).getOrElse(Map.empty)
}

object IcebergTableIO {
  /** One committed manifest row — the atomic pointer the whole backend
    * hangs off: `entries` maps table name → the snapshot id a reader must
    * time-travel to. */
  final case class ManifestEntry(version: Int, phase: String, epoch: Int,
      entries: Map[String, Long], counters: Map[String, Long])

  /** True when the Iceberg Spark runtime is on the classpath. */
  lazy val available: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: ClassNotFoundException => false }

  /** Bucket-partition on `preferred` when the frame has it, else its first
    * column (manifest/counter tables have no host column). */
  private[graft] def bucketColFor(df: DataFrame, preferred: String): String =
    if (df.columns.contains(preferred)) preferred else df.columns.head

  private[graft] def manifestDDL(fqn: String): String =
    s"CREATE TABLE IF NOT EXISTS $fqn (" +
      "version INT, phase STRING, epoch INT, " +
      "entries MAP<STRING, BIGINT>, counters MAP<STRING, BIGINT>) " +
      "USING iceberg"

  private[graft] def latestSnapshotSql(fqn: String): String =
    s"SELECT snapshot_id FROM $fqn.snapshots " +
      "ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"

  /** `CALL <catalog>.system.rollback_to_snapshot('<ns.table>', <id>)` —
    * the procedure takes the table WITHOUT its catalog prefix, which is
    * the call's routing component. */
  private[graft] def rollbackSql(fqn: String, snapshotId: Long): String = {
    val (cat, table) = fqn.split("\\.", 2) match {
      case Array(c, t) => (c, t)
      case _ => sys.error(s"fqn must be catalog-qualified: $fqn")
    }
    s"CALL $cat.system.rollback_to_snapshot('$table', ${snapshotId}L)"
  }

  private[graft] def deleteAllSql(fqn: String): String =
    s"DELETE FROM $fqn WHERE true"
}

/** Parquet + manifest-pointer implementation. Layout:
  * {{{
  * root/
  *   manifest.properties        <- atomic pointer (phase, epoch, table dirs)
  *   data/<table>/v<N>/  (parquet files; append-mode tables list many dirs)
  * }}}
  */
final class ParquetSnapshotTableIO(spark: SparkSession, rootDir: String,
    /** Target bytes per data file for per-epoch delta appends. The file
      * COUNT is derived per table from the delta's size, not a constant:
      * each append repartitions to `max(1, prevBytes/target)` where
      * `prevBytes` is the same table's bytes in the PREVIOUS commit (from
      * the ledger counters this class already writes — at 10^10-URL scale
      * one file per append is as wrong as hundreds, and epoch deltas are
      * budget-bounded so consecutive epochs are similar-sized). A fresh
      * table's first append (no history) gets 1 file and self-corrects
      * from the next epoch. `repartition` (not `coalesce`) so the upstream
      * compute — fetch, PSNR decode — keeps full parallelism and only the
      * written delta funnels (the round-2 q29 regression was one tiny file
      * per shuffle partition re-listed on every later read). */
    appendTargetFileBytes: Long = ParquetSnapshotTableIO.DefaultAppendTargetFileBytes)
    extends TableIO {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root.resolve("data"))
  require(appendTargetFileBytes > 0, s"appendTargetFileBytes must be > 0")

  /** Last committed bytes per table (appends sized from these; seeded from
    * the manifest's ledger counters so a RESUMED run keeps sizing from the
    * previous process's final epoch). Written only after all of a commit's
    * writes complete; read concurrently by the pool's writers. */
  @volatile private var lastTableBytes: Map[String, Long] =
    loadManifest().map { p =>
      import scala.jdk.CollectionConverters._
      p.stringPropertyNames().asScala.filter(_.startsWith("counter.bytes_"))
        .map(k => k.stripPrefix("counter.bytes_") -> p.getProperty(k).toLong)
        .toMap
    }.getOrElse(Map.empty)

  /** Files for this append = previous delta's bytes / target, min 1. */
  private def appendPartitionsFor(table: String): Int =
    lastTableBytes.get(table) match {
      case Some(b) if b > 0 =>
        math.max(1L, (b + appendTargetFileBytes - 1) / appendTargetFileBytes)
          .min(Int.MaxValue).toInt
      case _ => 1
    }

  private def manifestPath = root.resolve("manifest.properties")

  private def loadManifest(): Option[Properties] =
    if (Files.exists(manifestPath)) {
      val p = new Properties()
      val in = Files.newInputStream(manifestPath)
      try p.load(in) finally in.close()
      Some(p)
    } else None

  private def dirBytes(dir: Path): Long = {
    val s = Files.walk(dir)
    try s.filter(p => Files.isRegularFile(p)).mapToLong(p => Files.size(p)).sum
    finally s.close()
  }

  /** Data-file count (tiny-file evidence for the commit ledger). */
  private def dirDataFiles(dir: Path): Long = {
    val s = Files.walk(dir)
    try s.filter(p => Files.isRegularFile(p) &&
      p.getFileName.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  // concurrent-write pool shared via the companion (one per JVM, not per
  // instance — a JobManager creates an instance per job and sweep() has no
  // IO lifecycle hook, so per-instance pools would leak threads)
  private def writePool = ParquetSnapshotTableIO.writePool

  override def commit(phase: String, epoch: Int, tables: Map[String, DataFrame],
      appends: Map[String, DataFrame], counters: => Map[String, Long]): Unit = {
    // a table named in BOTH maps would write the same version dir twice
    // and record it twice in the manifest (doubled rows on read)
    val overlap = tables.keySet intersect appends.keySet
    require(overlap.isEmpty, s"table(s) in both tables and appends: $overlap")
    val prev = loadManifest()
    val version = prev.map(_.getProperty("version", "0").toInt + 1).getOrElse(1)
    val next = new Properties()
    // carry forward tables not in this commit (multi-table snapshot semantics)
    prev.foreach { p =>
      p.stringPropertyNames().forEach { k =>
        if (k.startsWith("table.")) next.setProperty(k, p.getProperty(k))
      }
    }
    val sc = spark.sparkContext
    val jobGroup = Option(sc.getLocalProperty("spark.jobGroup.id"))
    val interrupt = Option(sc.getLocalProperty("spark.job.interruptOnCancel"))
    def writeOne(name: String, df: DataFrame, isAppend: Boolean): (String, Long, Long) = {
      jobGroup.foreach(g =>
        sc.setJobGroup(g, s"commit $phase/$epoch $name", interrupt.contains("true")))
      try {
        val dir = s"data/$name/v$version"
        val out = if (isAppend) df.repartition(appendPartitionsFor(name)) else df
        out.write.mode(SaveMode.Overwrite).parquet(root.resolve(dir).toString)
        (name, dirBytes(root.resolve(dir)), dirDataFiles(root.resolve(dir)))
      } finally sc.clearJobGroup()
    }
    val work: Seq[(String, DataFrame, Boolean)] =
      tables.toSeq.sortBy(_._1).map { case (n, d) => (n, d, false) } ++
        appends.toSeq.sortBy(_._1).map { case (n, d) => (n, d, true) }
    val futures = work.map { case (n, d, a) =>
      writePool.submit(new java.util.concurrent.Callable[(String, Long, Long)] {
        override def call(): (String, Long, Long) = writeOne(n, d, a)
      })
    }
    // wait for EVERY write to terminate before propagating the first
    // failure: abandoning queued/in-flight siblings would leave orphan
    // writers racing a resume's re-commit of the same version dirs (the
    // manifest is unmoved, so a re-run reuses v<N>)
    val results = futures.map(f => scala.util.Try(f.get()))
    results.collectFirst { case scala.util.Failure(e) => e }.foreach(e => throw e)
    val written = results.collect { case scala.util.Success(v) => v }
    val bytes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    written.foreach { case (n, b, _) => bytes(n) = b }
    // feed the next commit's append sizing (appendPartitionsFor)
    lastTableBytes = lastTableBytes ++ bytes
    val filesTotal = written.map(_._3).sum
    tables.keySet.toSeq.sorted.foreach { name =>
      next.setProperty(s"table.$name", s"data/$name/v$version")
    }
    appends.keySet.toSeq.sorted.foreach { name =>
      val dir = s"data/$name/v$version"
      val existing = Option(next.getProperty(s"table.$name"))
      next.setProperty(s"table.$name",
        existing.map(e => s"$e,$dir").getOrElse(dir))
    }
    next.setProperty("phase", phase)
    next.setProperty("epoch", epoch.toString)
    next.setProperty("version", version.toString)
    // counters is by-name: evaluate only now, after the data writes, so
    // Observation-sourced counters are already populated by the write jobs
    val allCounters = counters ++
      bytes.map { case (n, b) => s"bytes_$n" -> b } +
      ("bytes_commit" -> bytes.valuesIterator.sum)
    allCounters.toSeq.sortBy(_._1).foreach { case (k, v) =>
      next.setProperty(s"counter.$k", v.toString)
    }
    val tmp = root.resolve(s"manifest.tmp.$version")
    val out = Files.newOutputStream(tmp)
    try next.store(out, null) finally out.close()
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // per-commit I/O ledger line (lineage evidence) — written AFTER the
    // atomic pointer move so a crash can only lose a line, never record a
    // commit that did not happen (a phantom line would double-count bytes
    // when the epoch re-runs idempotently)
    val byteJson = bytes.map { case (n, b) => s""""$n":$b""" }.mkString(",")
    Files.write(root.resolve("commits.jsonl"),
      (s"""{"phase":"$phase","epoch":$epoch,"version":$version,""" +
        s""""bytes":{$byteJson},"bytes_commit":${bytes.valuesIterator.sum},""" +
        s""""files_commit":$filesTotal}""" + "\n")
        .getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  override def read(table: String): Option[DataFrame] =
    loadManifest().flatMap { p =>
      Option(p.getProperty(s"table.$table")).map { dirs =>
        val paths = dirs.split(',').map(d => root.resolve(d).toString)
        spark.read.parquet(paths.toIndexedSeq: _*)
      }
    }

  override def lastCommitted: Option[(String, Int)] =
    loadManifest().map(p => (p.getProperty("phase"), p.getProperty("epoch").toInt))

  override def lastCounters: Map[String, Long] =
    loadManifest().map { p =>
      import scala.jdk.CollectionConverters._
      p.stringPropertyNames().asScala.filter(_.startsWith("counter."))
        .map(k => k.stripPrefix("counter.") -> p.getProperty(k).toLong).toMap
    }.getOrElse(Map.empty)
}

object ParquetSnapshotTableIO {
  /** ~96 MB per append data file — the usual parquet sweet spot (row-group
    * sized, under the 128 MB HDFS-era block heuristic). Tests/Soak pass a
    * tiny target to exercise the multi-file path at toy delta sizes. */
  val DefaultAppendTargetFileBytes: Long = 96L << 20

  /** Per-epoch tables are independent, so commit writes run in parallel —
    * commit wall-time is the SLOWEST table, not the sum (at toy scale the
    * serialized writes were the dominant per-epoch fixed cost; on a
    * cluster the same concurrency hides commit latency). One JVM-wide
    * daemon pool shared by every instance; the caller's job group is
    * re-applied per task so cancel() still aborts in-flight commit writes.
    */
  private[sources] lazy val writePool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      6, (r: Runnable) => {
        val t = new Thread(r, "graft-commit"); t.setDaemon(true); t
      })
}

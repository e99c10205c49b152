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
    * (the Iceberg fast-append analog — per-epoch deltas, no rewrite). */
  def commit(phase: String, epoch: Int, tables: Map[String, DataFrame],
      appends: Map[String, DataFrame] = Map.empty,
      counters: Map[String, Long] = Map.empty): Unit

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

/** Parquet + manifest-pointer implementation. Layout:
  * {{{
  * root/
  *   manifest.properties        <- atomic pointer (phase, epoch, table dirs)
  *   data/<table>/v<N>/  (parquet files; append-mode tables list many dirs)
  * }}}
  */
final class ParquetSnapshotTableIO(spark: SparkSession, rootDir: String) extends TableIO {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root.resolve("data"))

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

  override def commit(phase: String, epoch: Int, tables: Map[String, DataFrame],
      appends: Map[String, DataFrame], counters: Map[String, Long]): Unit = {
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
    val bytes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      val dir = s"data/$name/v$version"
      df.write.mode(SaveMode.Overwrite).parquet(root.resolve(dir).toString)
      bytes(name) = dirBytes(root.resolve(dir))
      next.setProperty(s"table.$name", dir)
    }
    appends.toSeq.sortBy(_._1).foreach { case (name, df) =>
      val dir = s"data/$name/v$version"
      df.write.mode(SaveMode.Overwrite).parquet(root.resolve(dir).toString)
      bytes(name) = dirBytes(root.resolve(dir))
      val existing = Option(next.getProperty(s"table.$name"))
      next.setProperty(s"table.$name",
        existing.map(e => s"$e,$dir").getOrElse(dir))
    }
    next.setProperty("phase", phase)
    next.setProperty("epoch", epoch.toString)
    next.setProperty("version", version.toString)
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
        s""""bytes":{$byteJson},"bytes_commit":${bytes.valuesIterator.sum}}""" + "\n")
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

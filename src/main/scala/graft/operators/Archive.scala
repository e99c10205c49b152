package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import graft.functions.Warc

/** WARC archival I/O as distributed operators — the seam between this
  * engine and the rest of the web-archive world (Common Crawl in,
  * replayable crawl output out).
  *
  * `records` is the INGEST shape: a binary column of whole WARC files
  * (one crawl's worth of fetches each) exploded into typed per-record
  * rows by a narrow `mapPartitions` — no shuffle, no driver action, and a
  * corrupt archive classifies as one quarantine row instead of vanishing
  * or killing the stage. At 100 TB the archives arrive pre-split (one
  * file per task from the object store), so per-file parallelism IS the
  * scan parallelism.
  *
  * `sink` is the EGRESS shape: fetched pages written as spec-compliant
  * WARC response records, one `.warc.gz` file per partition, one gzip
  * member per record (ISO 28500's seekable layout — verified by the spec
  * with a raw member walk). Record IDs are deterministic (sha1 of the
  * URL) so re-running a partition rewrites byte-identical records —
  * the idempotence a retried task needs.
  */
object Archive {

  val recordSchema: StructType = StructType(Seq(
    StructField("archive_id", StringType),
    StructField("rec_index", IntegerType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("http_status", IntegerType),
    StructField("content_type", StringType),
    StructField("payload_len", LongType),
    StructField("digest_ok", BooleanType)))

  /** Explode (archive_id, bytes) into one row per WARC record. Corrupt or
    * non-WARC payloads yield a single rec_index=-1 / warc_type="corrupt"
    * quarantine row — routine input at scale, never a silent drop. */
  def records(archives: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(recordSchema)
    archives.select("archive_id", "bytes").mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        Warc.parseAll(bytes) match {
          case Some(recs) =>
            recs.iterator.zipWithIndex.map { case (r, i) =>
              val (status, ctype, plen, digOk) =
                if (r.warcType == "response") {
                  Warc.httpResponse(r.block) match {
                    case Some(msg) =>
                      val ct = msg.header("Content-Type")
                        .map(_.split(";")(0).trim.toLowerCase).getOrElse("")
                      val ok = r.header("WARC-Payload-Digest")
                        .forall(_ == Warc.sha1Digest(msg.body))
                      (msg.status, ct, msg.body.length.toLong, ok)
                    case None => (-1, "", -1L, false)
                  }
                } else (-1, "", r.block.length.toLong, true)
              Row(id, i, r.warcType, r.targetUri, status, ctype, plen, digOk)
            }
          case None =>
            Iterator.single(Row(id, -1, "corrupt", "", -1, "", -1L, false))
        }
      }
    }(enc)
  }

  val cdxSchema: StructType = StructType(Seq(
    StructField("surt_key", StringType),
    StructField("ts", StringType),
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", IntegerType),
    StructField("digest", StringType),
    StructField("offset", LongType),
    StructField("rec_length", LongType),
    StructField("archive_id", StringType)))

  /** Index (archive_id, bytes) archives into CDX rows — one per response
    * record, carrying the SURT key and the (offset, length) replay
    * coordinates into THAT archive. Same narrow shuffle-free shape as
    * `records`; a malformed archive quarantines as one surt_key="corrupt"
    * row. Sorting the output by (surt_key, ts) — which Spark does as a
    * range-partitioned sort at any scale — yields exactly the ordered
    * CDX index web-archive replay expects. */
  def cdx(archives: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(cdxSchema)
    archives.select("archive_id", "bytes").mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        Warc.cdxLines(id, bytes) match {
          case Some(lines) => lines.iterator.map(l =>
            Row(l.surtKey, l.ts, l.url, l.mime, l.status, l.digest,
              l.offset, l.length, id))
          case None =>
            Iterator.single(Row("corrupt", "", "", "", -1, "", -1L, -1L, id))
        }
      }
    }(enc)
  }

  val wetSchema: StructType = StructType(Seq(
    StructField("archive_id", StringType),
    StructField("uri", StringType),
    StructField("text", StringType)))

  /** Extract (uri, text) from WET archives — the WARC `conversion`
    * sibling format LLM text corpora ingest (Common Crawl ships every
    * snapshot as WET). Narrow and shuffle-free like `records`; the
    * output column is ready for the text-analysis / dedup / chunking
    * family downstream. A malformed archive quarantines as one
    * uri="corrupt" row. */
  def wet(archives: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(wetSchema)
    archives.select("archive_id", "bytes").mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        Warc.wetTexts(bytes) match {
          case Some(ts) => ts.iterator.map { case (u, t) => Row(id, u, t) }
          case None => Iterator.single(Row(id, "corrupt", null))
        }
      }
    }(enc)
  }

  val sinkSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("n_records", LongType),
    StructField("n_bytes", LongType)))

  /** Write fetched pages as WARC/1.1 response records, one
    * `part-NNNNN.warc.gz` per partition under `dir`. Input df must carry
    * (url, status, content_type, body, fetched_at) with fetched_at
    * already ISO-8601 — the caller owns time, this operator is
    * deterministic. Returns one manifest row per non-empty partition.
    *
    * Scale shape (round-6 rework, guide §5/§6): each record streams
    * through [[graft.functions.Warc.encodeRecordTo]] straight to a Hadoop
    * `FSDataOutputStream` — task memory holds ONE record, never the
    * partition (the old path buffered every record, then built one
    * partition-sized array: an executor OOM on image-payload partitions
    * at 100 TB). The FileSystem comes from the task's Hadoop conf, so
    * file:/hdfs:/s3a: destinations all work, and the write commits via
    * task-attempt temp + rename ([[SinkFiles.writeCommitted]]) so
    * speculative/retried attempts never expose a torn file. */
  def sink(pages: DataFrame, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(sinkSchema)
    val conf = new graft.util.SerializableHadoopConf(
      pages.sparkSession.sparkContext.hadoopConfiguration)
    pages.select("url", "status", "content_type", "body", "fetched_at")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val tc = TaskContext.get()
          val pid = tc.partitionId()
          var n = 0L
          val (path, nBytes) = SinkFiles.writeCommitted(conf.value, dir,
            f"part-$pid%05d.warc.gz", tc.taskAttemptId()) { out =>
            it.foreach { row =>
              val url = row.getString(0)
              val status = row.getInt(1)
              val ctype = row.getString(2)
              val body = row.getAs[Array[Byte]](3)
              val date = row.getString(4)
              val payload = if (body == null) Array.emptyByteArray else body
              // deterministic id: retries rewrite identical records
              val rid = "urn:graft:sha1:" +
                Warc.sha1Digest(url.getBytes("UTF-8")).substring(5)
              Warc.encodeRecordTo(out, "1.1",
                Warc.RecordSpec("response", Some(url),
                  Warc.httpResponseBlock(status, ctype, payload),
                  "application/http;msgtype=response",
                  Vector("WARC-Payload-Digest" -> Warc.sha1Digest(payload))),
                rid, date, gzipPerRecord = true)
              n += 1
            }
          }
          Iterator.single(Row(path, n, nBytes))
        }
      }(enc)
  }

  /** Archive the crawl engine's `fetched` table (image_id, bytes, fmt,
    * url, …) as WARC — the seam that makes a finished crawl replayable
    * by any web-archive tool. Each image row becomes one response
    * record whose target URI is the page URL disambiguated by a
    * `graft_image` query parameter (images share their page's URL in
    * the fetched table; CDX keys must be unique per resource, and a
    * query param keeps the key SURT-sortable next to its page).
    * `fetchedAt` is caller-supplied — the operator stays deterministic. */
  def fromFetched(fetched: DataFrame, dir: String, fetchedAt: String): DataFrame = {
    import org.apache.spark.sql.functions._
    sink(fetched.select(
      concat(col("url"),
        when(col("url").contains("?"), "&").otherwise("?"),
        lit("graft_image="), col("image_id")).as("url"),
      lit(200).as("status"),
      concat(lit("image/"), col("fmt")).as("content_type"),
      col("bytes").as("body"),
      lit(fetchedAt).as("fetched_at")), dir)
  }
}

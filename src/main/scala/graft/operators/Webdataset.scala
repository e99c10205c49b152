package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import graft.functions.Tar

/** WebDataset — the tar-shard format multimodal training loaders
  * stream: each shard is a tar whose entries group into samples by key
  * (`{key}.jpg` + `{key}.txt` + optional `{key}.json`), where the key
  * is the basename up to its FIRST dot (the published WebDataset
  * convention). This is the hand-off format between a crawl that
  * produced image+caption rows and the training job that consumes
  * them, so the engine owns both directions:
  *
  * `samples` INGESTS: a binary column of shards explodes into typed
  * per-sample rows by a narrow `mapPartitions` — at 100 TB the shards
  * arrive pre-split from the object store (one shard per task is the
  * WebDataset contract), so per-shard parallelism IS the scan
  * parallelism, and a corrupt shard quarantines as one row.
  *
  * `sink` EGRESSES: one `part-NNNNN.tar` per partition with
  * deterministic entry order and zeroed mtimes, so a retried task
  * rewrites byte-identical shards.
  */
object Webdataset {

  private val ImageExts = Set("jpg", "jpeg", "png", "webp", "gif", "bmp",
    "tiff", "qoi", "ico", "tga")

  val sampleSchema: StructType = StructType(Seq(
    StructField("shard_id", StringType),
    StructField("key", StringType),
    StructField("image", BinaryType),
    StructField("image_ext", StringType),
    StructField("caption", StringType),
    StructField("json_meta", StringType),
    StructField("n_parts", IntegerType)))

  /** WebDataset key: basename up to the first dot; the extension is
    * everything after it (`a/b/s001.seg.jpg` → key `a/b/s001`, ext
    * `seg.jpg` whose LAST segment picks the decoder). */
  private def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "")
    else (name.substring(0, dot), name.substring(dot + 1))
  }

  final case class Sample(key: String, image: Array[Byte], imageExt: String,
      caption: String, json: String, nParts: Int)

  /** Decode one shard into samples, first-seen key order (loaders
    * stream sequentially — order is part of the format's contract).
    * None when the tar itself is malformed. */
  def decode(bytes: Array[Byte]): Option[Vector[Sample]] =
    Tar.entries(bytes).map { es =>
      // group by key preserving first-seen order (the format keeps a
      // sample's entries contiguous, but a stable reader shouldn't care)
      val order = scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]]
      es.foreach { e =>
        val (k, ext) = splitKey(e.name)
        order.getOrElseUpdate(k,
          scala.collection.mutable.ArrayBuffer.empty) += ((ext, e.bytes))
      }
      order.iterator.map { case (k, parts) =>
        var img: Array[Byte] = null
        var imgExt = ""
        var caption: String = null
        var json: String = null
        parts.foreach { case (ext, data) =>
          val last = ext.substring(ext.lastIndexOf('.') + 1).toLowerCase
          if (img == null && ImageExts.contains(last)) {
            img = data; imgExt = ext
          } else if (caption == null && last == "txt")
            caption = new String(data, UTF_8)
          else if (json == null && last == "json")
            json = new String(data, UTF_8)
        }
        Sample(k, img, imgExt, caption, json, parts.length)
      }.toVector
    }

  /** Explode (shard_id, bytes) tar shards into one row per sample; a
    * malformed shard yields one key="corrupt" quarantine row. */
  def samples(shards: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(sampleSchema)
    shards.select("shard_id", "bytes").mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        decode(bytes) match {
          case Some(ss) => ss.iterator.map(s =>
            Row(id, s.key, s.image, s.imageExt, s.caption, s.json, s.nParts))
          case None =>
            Iterator.single(Row(id, "corrupt", null, "", null, null, -1))
        }
      }
    }(enc)
  }

  val sinkSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("n_samples", LongType),
    StructField("n_bytes", LongType)))

  /** Write (key, image, image_ext, caption) rows as WebDataset shards,
    * one `part-NNNNN.tar` per non-empty partition under `dir`. To size
    * shards for a loader (the usual 100 MB-1 GB), `repartition` the
    * input first — partition boundaries ARE shard boundaries.
    *
    * Scale shape (round-6 rework, guide §5/§6): entries stream through
    * [[graft.functions.Tar.writeEntryTo]] straight to a Hadoop
    * `FSDataOutputStream` — task memory holds ONE sample, never the
    * partition (the old path buffered every entry, then built one
    * partition-sized tar array). The FileSystem comes from the task's
    * Hadoop conf (file:/hdfs:/s3a: alike) and the write commits via
    * task-attempt temp + rename ([[SinkFiles.writeCommitted]]), so
    * speculative/retried attempts never expose a torn shard. */
  def sink(pairs: DataFrame, dir: String): DataFrame = {
    val enc = RowEncoder.encoderFor(sinkSchema)
    val conf = new graft.util.SerializableHadoopConf(
      pairs.sparkSession.sparkContext.hadoopConfiguration)
    pairs.select("key", "image", "image_ext", "caption")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val tc = TaskContext.get()
          val pid = tc.partitionId()
          var n = 0L
          val (path, nBytes) = SinkFiles.writeCommitted(conf.value, dir,
            f"part-$pid%05d.tar", tc.taskAttemptId()) { out =>
            it.foreach { row =>
              val key = row.getString(0)
              val img = row.getAs[Array[Byte]](1)
              val ext = row.getString(2)
              val cap = row.getString(3)
              Tar.writeEntryTo(out, s"$key.$ext",
                if (img == null) Array.emptyByteArray else img)
              Tar.writeEntryTo(out, s"$key.txt",
                (if (cap == null) "" else cap).getBytes(UTF_8))
              n += 1
            }
            Tar.writeTrailerTo(out)
          }
          Iterator.single(Row(path, n, nBytes))
        }
      }(enc)
  }

  /** The crawl engine's `fetched` table (image_id, bytes, fmt, caption,
    * …) as training shards — the pipeline's terminal hand-off. */
  def fromFetched(fetched: DataFrame, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    sink(fetched.select(
      col("image_id").as("key"),
      col("bytes").as("image"),
      col("fmt").as("image_ext"),
      col("caption")), dir)
  }
}

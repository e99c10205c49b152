package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import graft.sources.DecoderRegistry

/** Batched multimodal transform — the Scala analog of a Pandas-UDF
  * `mapInPandas` stage: binary payloads processed per-partition in batches
  * with a typed output schema. The decode/resize here is real (javax.imageio
  * via the decoder registry); for codec-less payloads (video/audio) the
  * registry dispatches to the clearly-marked stub — the Spark-side plumbing
  * (schema, partition batching, output shape) is identical either way.
  */
object ImageBatch {

  val outputSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("fmt", StringType),
    StructField("w", IntegerType),
    StructField("h", IntegerType),
    StructField("thumb", BinaryType),
    StructField("thumb_phash", LongType)))

  val frameSchema: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("frame_idx", IntegerType),
    StructField("w", IntegerType),
    StructField("h", IntegerType),
    StructField("frame", BinaryType),
    StructField("frame_phash", LongType)))

  /** Distributed video frame-sampling: up to `n` evenly-spaced frames per
    * payload, one output row per decoded frame (png-encoded + phash).
    * `frame_idx` is the frame's SOURCE position in the stream
    * ([[graft.functions.Y4m.sampleFramesIndexed]] — sampling 2 of 10
    * yields indices 0 and 5), the position timestamps/joins/re-seeks need.
    * The phash comes from the in-hand decoded image — hashing the encoded
    * png would re-decode what we just encoded, per frame, in the hot path.
    * Y4M (uncompressed) and MJPEG/AVI (compressed) payloads decode for
    * REAL, sniffed by magic bytes ([[graft.functions.VideoContainers]]);
    * undecodable/corrupt/null payloads yield zero rows — at 100 TB a bad
    * video is routine input, and per the decode contract it classifies,
    * never crashes the stage. Input df must carry (video_id, bytes). */
  def videoFrames(videos: DataFrame, n: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    videos.select("video_id", "bytes").mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        graft.functions.VideoContainers.sampleFramesIndexed(bytes, n).map {
          case (idx, img) =>
            Row(id, idx, img.getWidth, img.getHeight,
              graft.functions.ImageOps.encode(img, "png"),
              graft.functions.ImageOps.phashImage(img))
        }
      }
    }(enc)
  }

  val triageSchema: StructType = StructType(Seq(
    StructField("media_id", StringType),
    StructField("kind", StringType),
    StructField("container", StringType),
    StructField("codec", StringType),
    StructField("w", IntegerType),
    StructField("h", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  /** Distributed single-pass media triage: classify every payload from
    * CONTENT ([[graft.functions.MediaMeta.describe]] — crawled
    * Content-Type lies) into one typed row of (kind, container, codec,
    * dims, duration, rate, channels). This is the first operator a
    * 100 TB pipeline runs on raw fetched bytes — route images to the
    * thumbnail/phash stage, video to frame sampling, audio to feature
    * extraction, unknown to quarantine — and it is a NARROW map: no
    * shuffle, no driver action, corrupt payloads classify as
    * kind="unknown" rather than aborting the stage. Input df must carry
    * (media_id, bytes). */
  def triage(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(triageSchema)
    media.select("media_id", "bytes").mapPartitions { it =>
      it.map { row =>
        val m = graft.functions.MediaMeta.describe(row.getAs[Array[Byte]](1))
        Row(row.getString(0), m.kind, m.container, m.codec,
          m.width, m.height, m.durationMs, m.sampleRate, m.channels)
      }
    }(enc)
  }

  /** Decode → box-resize to (tw×th) → re-encode png → phash, batched per
    * partition. Input df must carry (image_id, bytes, fmt). */
  def thumbnails(images: DataFrame, tw: Int, th: Int, batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(outputSchema)
    images.select("image_id", "bytes", "fmt").mapPartitions { it =>
      // batch shape: process `batchSize` rows at a time (the arrow-batch
      // analog); DecoderRegistry.get is a map lookup (format varies per
      // row, so per-row dispatch is the contract, not a cost)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val id = row.getString(0)
          val bytes = row.getAs[Array[Byte]](1)
          val fmt = row.getString(2)
          val decoder = DecoderRegistry.get(fmt)
          // ONE decode per row: dims and the resize share it (decode is
          // the dominant cost of this stage). A corrupt/null payload
          // decodes to null and CLASSIFIES as an invalid row (null dims/
          // thumb) — at 100 TB a bad image is routine input, and an NPE
          // here would abort the whole stage for one row.
          val img = if (bytes == null) null else decoder.decode(bytes)
          if (img == null) Row(id, fmt, null, null, null, null)
          else {
            val thumb = graft.functions.ImageOps.resizeBoxImg(img, tw, th, "png")
            Row(id, fmt, img.getWidth, img.getHeight, thumb,
              graft.functions.ImageOps.phash64(thumb))
          }
        }
      }
    }(enc)
  }
}

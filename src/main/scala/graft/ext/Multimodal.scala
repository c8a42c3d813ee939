package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The decode step is STUBBED (no codec libraries in this environment):
  * [[FakeCodec]] derives deterministic pseudo-features from the raw
  * bytes so the Spark-side plumbing — schema, batching, partitioning,
  * the typed `mapPartitions` boundary — is real and testable.  Swapping
  * in a real codec changes only the function body inside
  * `decodePartition`.
  *
  * Scale design: media blobs never shuffle.  All per-media stages are
  * narrow `mapPartitions`; only the (small) extracted-feature rows flow
  * into joins/aggregations downstream.  Partition sizing is by bytes
  * (`spark.sql.files.maxPartitionBytes`), not rows, since blob size
  * varies by orders of magnitude.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Extracted features — the only thing that leaves the media stage. */
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
                           content_md5: String, mean_byte: Double,
                           frames_sampled: Int)

  /** Deterministic stand-in for an image/audio decoder. */
  object FakeCodec {
    def decode(payload: Array[Byte]): Array[Byte] = payload // ??? real codec
    def frameSample(payload: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      payload.grouped(math.max(1, everyN)).toSeq
  }

  /** documents-as-media adapter: treats each doc's text bytes as an
    * opaque payload so the pipeline is exercisable on the driver's
    * tables. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), lit("text").as("modality"),
      col("text").cast("binary").as("payload"),
      lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))

  /** One sampled frame, addressable for downstream per-frame work
    * (embedding, OCR, …). */
  case class MediaFrame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte],
                        frame_md5: String)

  /** Frame-sampling stage: media row → one row per sampled frame.
    * flatMap inside mapPartitions keeps the blob→frames fan-out narrow
    * (no shuffle); only the sampled frames — a bounded fraction of the
    * payload — continue downstream.  At 100 TB, `everyN` is the
    * data-volume knob and partition sizing stays byte-based. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   everyN: Int = 256): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        FakeCodec.frameSample(FakeCodec.decode(r.payload), everyN)
          .zipWithIndex.map { case (frame, i) =>
            md.reset()
            MediaFrame(r.media_id, i, frame,
              md.digest(frame).map("%02x".format(_)).mkString)
          }
      }
    }
  }

  /** The decode/feature-extract stage: typed mapPartitions over media
    * rows.  Batch shape: one partition = one codec context (a real
    * decoder amortizes init per partition, exactly like an Arrow-batched
    * pandas UDF). */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      frameEvery: Int = 256): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val decoded = FakeCodec.decode(r.payload)
        val frames = FakeCodec.frameSample(decoded, frameEvery)
        md.reset()
        val hash = md.digest(decoded).map("%02x".format(_)).mkString
        val mean =
          if (decoded.isEmpty) 0.0
          else decoded.map(b => (b & 0xff).toLong).sum.toDouble / decoded.length
        MediaFeatures(r.media_id, r.modality, decoded.length.toLong, hash,
          mean, frames.size)
      }
    }
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, batch feature extraction via mapPartitions.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this environment); everything around it — schema, batch
  * shape, partitioning, output contract — is the real Spark plumbing a
  * production decoder would plug into (the reference has no media
  * pipeline; this is part of the training-data-pipeline surface).
  */
object Multimodal {

  /** media table schema: one row per asset, binary payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_s", DoubleType, nullable = true),
    StructField("mime", StringType, nullable = true)))

  final case class MediaFeature(asset_id: String, media_type: String,
      feature: Seq[Float], decoder: String)

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * A real implementation would decode via an image/audio library here;
    * the surrounding batching/partitioning is production-shaped. */
  private def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, i + 1)
      v(i) = (h.toDouble / Int.MaxValue).toFloat
      i += 1
    }
    v
  }

  /** Batch feature extraction over the binary column. Batches bound peak
    * memory per task; repartition first if assets are few but huge. */
  def extractFeatures(media: DataFrame, dim: Int = 64, batchSize: Int = 8): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("asset_id", "media_type", "content")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, mt, bytes) =>
            MediaFeature(id, mt, stubDecode(bytes, dim).toSeq, "stub-v1")
          }
        }
      }
  }

  /** Frame sampling plumbing for video assets: one row per sampled frame
    * offset (decode stubbed; offsets/shape real). */
  def sampleFrames(media: DataFrame, fps: Double): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(lit(0), (coalesce(col("duration_s"), lit(0.0)) * fps).cast("int") - 1))))
      .withColumn("frame_ts_s", col("frame_idx") / fps)
      .select("asset_id", "frame_idx", "frame_ts_s", "content")
}

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

  /** Pluggable batch decoder — same shape as
    * [[graft.embed.TextBatchEncoder]]: a real codec (JNI image decoder,
    * audio resampler, ONNX vision encoder) implements this trait; the
    * Spark-side plumbing doesn't change. */
  trait MediaDecoder extends Serializable {
    def name: String
    /** Decode a batch of (mediaType, payload) into dim-sized features. */
    def decodeBatch(batch: Seq[(String, Array[Byte])], dim: Int): Seq[Array[Float]]
  }

  /** STUB decoder: deterministic pseudo-features from the payload bytes
    * (no image/audio codecs in this environment). Hermetic and stable —
    * the same role as the reference's mock embedding models in tests. */
  final case class StubDecoder() extends MediaDecoder {
    def name = "stub-v1"
    def decodeBatch(batch: Seq[(String, Array[Byte])], dim: Int): Seq[Array[Float]] =
      batch.map { case (_, bytes) =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, i + 1)
          v(i) = (h.toDouble / Int.MaxValue).toFloat
          i += 1
        }
        v
      }
  }

  /** Batch feature extraction over the binary column. Batches bound peak
    * memory per task; repartition first if assets are few but huge. */
  def extractFeatures(media: DataFrame, dim: Int = 64, batchSize: Int = 8,
      decoder: MediaDecoder = StubDecoder()): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("asset_id", "media_type", "content")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = decoder.decodeBatch(batch.map(t => (t._2, t._3)), dim)
          batch.zip(feats).map { case ((id, mt, _), f) =>
            MediaFeature(id, mt, f.toSeq, decoder.name)
          }
        }
      }
  }

  /** Perceptual difference-hash over the decoded feature vector: bit i
    * set iff feature(i+1) > feature(i). With a real image decoder whose
    * feature is the 9×8 grayscale raster this IS classic dHash; with the
    * stub it is still a deterministic 63-bit locality-sensitive
    * fingerprint. Map-only codegen HOF — no kernel code. */
  def perceptualHash(features: Dataset[MediaFeature]): DataFrame = {
    val bits = 63
    val phash = aggregate(
      sequence(lit(1), lit(bits)),
      lit(0L),
      (acc, i) => acc * 2 + when(
        element_at(col("feature"), i + 1) > element_at(col("feature"), i),
        1L).otherwise(0L))
    features.toDF()
      .withColumn("phash", phash)
      .select("asset_id", "media_type", "phash")
  }

  /** Near-duplicate media pairs: perceptual hashes joined through the
    * same pigeonhole banding as text SimHash ([[Dedup.simhashNearDupPairs]])
    * — media dedup rides the scale-safe machinery that already exists,
    * blocked by media_type so images never pair with audio. */
  def nearDupMedia(features: Dataset[MediaFeature], maxDist: Int = 4): DataFrame =
    graft.operators.Dedup.simhashNearDupPairs(
      perceptualHash(features), "asset_id", "phash",
      blockCols = Seq("media_type"), maxDist = maxDist, bits = 63)

  /** Pluggable binary→binary batch transform (resize, transcode,
    * re-encode); same seam as [[MediaDecoder]] for ops that keep the
    * payload opaque. */
  trait MediaTransformer extends Serializable {
    def name: String
    def transformBatch(batch: Seq[(String, Array[Byte])],
        width: Int, height: Int): Seq[Array[Byte]]
  }

  /** STUB resize transform: passes bytes through (no codecs here) — the
    * metadata contract is what the plumbing enforces. */
  final case class StubResizer() extends MediaTransformer {
    def name = "stub-resize-v1"
    def transformBatch(batch: Seq[(String, Array[Byte])],
        width: Int, height: Int): Seq[Array[Byte]] = batch.map(_._2)
  }

  final case class ResizedMedia(asset_id: String, media_type: String,
      content: Array[Byte], width: Int, height: Int, transformer: String)

  /** Image-resize plumbing: batched mapPartitions over the binary column,
    * output rows carry the TARGET dimensions in the typed metadata. Only
    * image rows are transformed; batching bounds peak decoded memory per
    * task exactly as in [[extractFeatures]]. */
  def resizeImages(media: DataFrame, width: Int, height: Int,
      batchSize: Int = 8,
      transformer: MediaTransformer = StubResizer()): Dataset[ResizedMedia] = {
    require(width > 0 && height > 0, "target dimensions must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select("asset_id", "media_type", "content")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val outs = transformer.transformBatch(batch.map(t => (t._1, t._3)), width, height)
          // zip would silently truncate AND misattribute bytes to the
          // wrong asset_id if a transformer dropped an undecodable row —
          // the contract is strictly one output per input
          require(outs.size == batch.size,
            s"${transformer.name} returned ${outs.size} outputs for ${batch.size} inputs")
          batch.zip(outs).map { case ((id, mt, _), bytes) =>
            ResizedMedia(id, mt, bytes, width, height, transformer.name)
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

  /** Audio windowing plumbing: one row per (windowLenS, hopS) analysis
    * window — the offsets a spectrogram/ASR front-end consumes. */
  def audioWindows(media: DataFrame, windowLenS: Double, hopS: Double): DataFrame = {
    require(windowLenS > 0 && hopS > 0, "window and hop must be positive")
    media.filter(col("media_type") === "audio")
      // assets shorter than one window (or with missing duration) can't
      // fill any analysis window — emitting a phantom [0, windowLen]
      // frame would read past the payload
      .filter(coalesce(col("duration_s"), lit(0.0)) >= windowLenS)
      .withColumn("window_idx",
        explode(sequence(lit(0), greatest(lit(0),
          floor((coalesce(col("duration_s"), lit(0.0)) - windowLenS) / hopS).cast("int")))))
      .withColumn("window_start_s", col("window_idx") * hopS)
      .withColumn("window_end_s", col("window_idx") * hopS + windowLenS)
      .select("asset_id", "window_idx", "window_start_s", "window_end_s", "content")
  }
}

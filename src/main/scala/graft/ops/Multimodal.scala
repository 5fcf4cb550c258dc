package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` payloads with a typed
  * metadata struct; decode / feature-extraction / resize / frame-sampling
  * run as BATCHED per-partition operators.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * operator signatures — is real and tested. The codec itself is a STUB
  * (`FakeCodec`): this container has no image/audio libraries, so decode
  * produces a deterministic byte-histogram "feature vector" and metadata
  * passthrough. Swapping in a real codec (JNI/opencv/ffmpeg) changes ONE
  * function and nothing about the distributed shape.
  *
  * Scale design: payloads dominate row size, so operators (a) never
  * shuffle payload bytes — feature extraction projects payloads away
  * before any wide stage; (b) process partitions in fixed-size batches
  * (`batchSize`) to bound peak decode memory, mirroring how a Pandas-UDF /
  * Arrow pipeline batches; (c) frame sampling explodes AFTER slicing, so
  * only sampled frames materialize.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", MetaType)))

  // ----------------------------------------------------------- the STUB

  /** STUB codec — deterministic fake standing in for a real image/audio
    * decoder. Feature vector = 16-bin byte histogram, L1-normalized. */
  object FakeCodec {
    val FeatureDim = 16
    def features(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) / FeatureDim) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      hist.map(_ / n)
    }
    /** STUB "resize": real codecs re-encode; the fake truncates payload
      * proportionally and rewrites metadata. */
    def resize(payload: Array[Byte], w0: Int, h0: Int, w: Int, h: Int): Array[Byte] = {
      val ratio = (w.toLong * h).toDouble / math.max(w0.toLong * h0, 1L)
      payload.take(math.max(1, (payload.length * ratio).toInt))
    }
  }

  // ------------------------------------------------------ synthetic media

  /** Deterministic fake media table derived from `documents` (the repo has
    * no binary test table): payload = UTF-8 text bytes, metadata derived
    * from stable arithmetic on doc_id/n_chars. */
  def fakeMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").cast(BinaryType).as("payload"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"),
        (col("doc_id") % 7 + 1).cast("int").as("n_frames")).as("meta"))

  // -------------------------------------------------- batched operators

  /** Feature extraction: decode each payload (batched) → fixed-dim float
    * vector. Output drops the payload — downstream stages shuffle only
    * id + features + meta, never bytes. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // typed mapPartitions (not .rdd): rows stay in Tungsten encoding, no
    // Row boxing round-trip; fixed-size batches bound decoder peak memory,
    // like Arrow batches in a Pandas-UDF pipeline
    media.select("media_id", "payload", "meta.format")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, payload, format) =>
            (id, format, payload.length, FakeCodec.features(payload))
          }
        }
      }
      .toDF("media_id", "format", "n_bytes", "features")
  }

  /** STUB resize: rewrites payload + metadata to the target box.
    * Typed mapPartitions (not .rdd): rows stay Tungsten-encoded with no
    * Row-boxing round trip, matching [[extractFeatures]]. */
  def resize(media: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.format"),
        col("meta.width"), col("meta.height"), col("meta.n_frames"))
      .as[(Long, Array[Byte], String, Int, Int, Int)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload, fmt, w0, h0, nf) =>
          (id, FakeCodec.resize(payload, w0, h0, w, h), fmt, nf)
        })
      }
      .toDF("media_id", "payload", "format", "n_frames")
      .select(col("media_id"), col("payload"),
        struct(col("format"), lit(w).as("width"), lit(h).as("height"),
          col("n_frames")).as("meta"))
  }

  /** Frame sampling for video-ish payloads: one output row per sampled
    * frame index (0, everyN, 2·everyN, …), with the payload slice for that
    * frame. Slicing happens BEFORE explode — unsampled frames never
    * materialize. */
  def sampleFrames(media: DataFrame, everyN: Int = 2): DataFrame = {
    val nFrames = col("meta.n_frames")
    val frameLen = greatest(floor(length(col("payload")) / nFrames), lit(1)).cast("int")
    media
      .select(col("media_id"), col("meta"), col("payload"), frameLen.as("flen"),
        explode(sequence(lit(0), nFrames - 1, lit(everyN))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * col("flen") + 1, col("flen"))
          .as("frame_payload"))
  }
}

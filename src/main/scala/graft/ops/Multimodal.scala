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
  * operator signatures — is real and tested. IMAGES decode for real:
  * [[ImageCodec]] wraps the JDK's own `javax.imageio` (PNG/JPEG/BMP/GIF,
  * zero external dependencies), so pixel-level feature extraction and
  * resize are genuine. Audio/video codecs remain a STUB ([[FakeCodec]]):
  * this container has no media libraries beyond the JDK; swapping in a
  * real one (JNI/ffmpeg) changes ONE function and nothing about the
  * distributed shape.
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

  // ------------------------------------------------------ the REAL codec

  /** Real image codec over the JDK's `javax.imageio` — decodes/encodes
    * PNG, JPEG, BMP, GIF with zero external dependencies. Executor-side
    * only (called inside mapPartitions); all methods are pure. */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Formats `javax.imageio` handles; others fall back to [[FakeCodec]]. */
    val Formats: Set[String] = Set("png", "jpeg", "jpg", "bmp", "gif")

    /** Decode a payload; None when the bytes are not a readable image
      * (ImageIO.read returns null on unrecognized input). */
    def decode(payload: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    /** Encode as lossless PNG. */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Deterministic grayscale PNG: pixel (x, y) has luminance
      * `pix(x, y) & 0xff` in all three channels. Lossless, so a decode
      * round-trips the exact pixel function — the oracle for the gated
      * pixel-histogram query recomputes the same arithmetic without ever
      * touching bytes. */
    def synthPng(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = pix(x, y) & 0xff
          img.setRGB(x, y, v * 0x010101)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** 16-bin luminance histogram counts of a decoded image (luminance =
      * (r + g + b) / 3, integer division — equals the gray value for
      * grayscale pixels). */
    def lumaHistogram(img: BufferedImage): Array[Long] = {
      val hist = new Array[Long](FakeCodec.FeatureDim)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          hist(luma / FakeCodec.FeatureDim) += 1
          x += 1
        }
        y += 1
      }
      hist
    }

    /** Real resize: decode, scale with bilinear interpolation, re-encode
      * PNG. None when the payload is not a decodable image. */
    def resize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decode(payload).map { img =>
        val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        encodePng(scaled)
      }
  }

  /** REAL audio codec via the JDK's `javax.sound.sampled` — the audio
    * counterpart of [[ImageCodec]] (no external media libraries ship in
    * this container; WAV/PCM is the JDK-native container, as PNG is for
    * images). PCM16 is lossless, so a decode round-trips the exact sample
    * values and the gated query's oracle can verify decoded-sample
    * statistics arithmetically. */
  object AudioCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Encode signed 16-bit little-endian mono PCM as a WAV container. */
    def encodeWav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
      val in = new AudioInputStream(
        new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode a WAV payload back to PCM16LE mono samples; None when the
      * bytes are not a readable 16-bit mono little-endian WAV. */
    def decodeWav(payload: Array[Byte]): Option[Array[Short]] =
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian) None
        else {
          val bytes = in.readAllBytes()
          val out = new Array[Short](bytes.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
            i += 1
          }
          Some(out)
        }
      } catch { case _: Exception => None }
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

  /** Deterministic real-PNG media table: one `w`×`h` grayscale image per
    * doc, pixel (x, y) = (doc_id·31 + 7x + 13y) mod 256. The pixels are a
    * pure arithmetic function, and PNG is lossless — so an oracle can
    * verify DECODED pixel statistics by recomputing the arithmetic,
    * without an image library of its own. */
  def syntheticImages(docs: DataFrame, w: Int = 16, h: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val png = ImageCodec.synthPng(w, h,
          (x, y) => ((id * 31 + 7 * x + 13 * y) % 256).toInt)
        (id, png)
      })
      .toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("png").as("format"), lit(w).as("width"),
          lit(h).as("height"), lit(1).as("n_frames")).as("meta"))
  }

  /** Deterministic real-WAV media table: one `n`-sample PCM16 mono clip
    * per doc, sample i = ((doc_id·31 + 17i) mod 65536) − 32768. The
    * samples are a pure arithmetic function and PCM16-in-WAV is lossless,
    * so the oracle verifies DECODED sample statistics by recomputing the
    * arithmetic — proving a real JDK codec ran end-to-end (the audio
    * counterpart of [[syntheticImages]]/q121). */
  def syntheticAudio(docs: DataFrame, n: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val s = Array.tabulate(n)(i =>
          (((id * 31 + 17L * i) % 65536) - 32768).toShort)
        (id, AudioCodec.encodeWav(s))
      })
      .toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("wav").as("format"), lit(n).as("n_samples"),
          lit(8000).as("sample_rate"), lit(1).as("n_frames")).as("meta"))
  }

  /** Decoded-sample statistics per audio clip (REAL `javax.sound.sampled`
    * decode; integer-exact outputs so both engines hash identically).
    * Fails loudly on an undecodable payload — a silent skip would fake
    * codec coverage. */
  def audioStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          val s = AudioCodec.decodeWav(payload).getOrElse(
            throw new IllegalArgumentException(
              s"audioStats: media_id=$id payload is not a decodable " +
                "PCM16 mono WAV"))
          var min = Int.MaxValue; var max = Int.MinValue; var sum = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            if (v < min) min = v
            if (v > max) max = v
            sum += v
            i += 1
          }
          (id, s.length.toLong, min, max, sum)
        })
      }
      .toDF("media_id", "n_samples", "min_s", "max_s", "sum_s")
  }

  // -------------------------------------------------- batched operators

  /** Feature extraction: decode each payload (batched) → fixed-dim float
    * vector. Output drops the payload — downstream stages shuffle only
    * id + features + meta, never bytes. Payloads whose format claims an
    * image and whose bytes DECODE get a real pixel-luminance histogram
    * ([[ImageCodec]]); everything else falls back to the byte-histogram
    * stub (the audio/video placeholder). */
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
            val real =
              if (ImageCodec.Formats(format)) ImageCodec.decode(payload)
              else None
            val feats = real match {
              case Some(img) =>
                val hist = ImageCodec.lumaHistogram(img)
                val n = math.max(hist.sum, 1L).toFloat
                hist.map(_ / n)
              case None => FakeCodec.features(payload)
            }
            (id, format, payload.length, feats)
          }
        }
      }
      .toDF("media_id", "format", "n_bytes", "features")
  }

  /** Decoded pixel-luminance histogram — one row per (media_id, bin) with
    * the RAW pixel count, for exact cross-engine gating: on
    * [[syntheticImages]] input the counts are a pure function of doc_id,
    * so the oracle recomputes them arithmetically. Fails loudly on an
    * undecodable payload (a silent skip would fake coverage). */
  def pixelHistogram(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (id, payload) =>
          val img = ImageCodec.decode(payload).getOrElse(
            throw new IllegalArgumentException(
              s"pixelHistogram: media_id=$id payload is not a decodable image"))
          ImageCodec.lumaHistogram(img).zipWithIndex.map {
            case (c, bin) => (id, bin, c)
          }
        })
      }
      .toDF("media_id", "bin", "bin_count")
  }

  /** Resize to the target box. Decodable images resize for REAL (bilinear
    * scale, re-encoded PNG via [[ImageCodec]]); other payloads keep the
    * stub's proportional truncation (the audio/video placeholder).
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
          val out =
            (if (ImageCodec.Formats(fmt)) ImageCodec.resize(payload, w, h)
             else None)
              .getOrElse(FakeCodec.resize(payload, w0, h0, w, h))
          val outFmt = if (ImageCodec.Formats(fmt)) "png" else fmt
          (id, out, outFmt, nf)
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

  /** REAL multi-frame codec via the JDK's ImageIO TIFF plugin (JDK 9+):
    * a multi-page TIFF is a true frame container with a LOSSLESS
    * grayscale encoding — the video counterpart of [[ImageCodec]] /
    * [[AudioCodec]] (no external media libraries ship in-container). */
  object FrameCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO}

    /** Encode frames as one multi-page TIFF. */
    def encodeTiff(frames: Seq[BufferedImage]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    /** Number of pages in a TIFF payload; None when not a readable TIFF. */
    def frameCount(payload: Array[Byte]): Option[Int] =
      withReader(payload)(r => r.getNumImages(true))

    /** Decode page `i` of a TIFF payload. */
    def decodeFrame(payload: Array[Byte], i: Int): Option[BufferedImage] =
      withReader(payload)(r => r.read(i))

    private def withReader[A](payload: Array[Byte])(
        f: javax.imageio.ImageReader => A): Option[A] =
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
        val it = ImageIO.getImageReaders(iis)
        if (!it.hasNext) None
        else {
          val r = it.next()
          try { r.setInput(iis); Some(f(r)) }
          finally { r.dispose(); iis.close() }
        }
      } catch { case _: Exception => None }
  }

  /** Deterministic multi-frame TIFF "videos": one `nFrames`-page clip per
    * doc, frame f pixel (x, y) = (doc_id·31 + 7x + 13y + 97f) mod 256.
    * Lossless grayscale pages, so decoded frame statistics are a pure
    * arithmetic function the DuckDB oracle recomputes — the frame-sampling
    * op runs a REAL container codec end-to-end. */
  def syntheticVideos(docs: DataFrame, w: Int = 8, h: Int = 6,
      nFrames: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val frames = (0 until nFrames).map { f =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((id * 31 + 7 * x + 13 * y + 97 * f) % 256).toInt
              img.getRaster.setSample(x, y, 0, v)
              x += 1
            }
            y += 1
          }
          img
        }
        (id, FrameCodec.encodeTiff(frames))
      })
      .toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("tiff").as("format"), lit(w).as("width"),
          lit(h).as("height"), lit(nFrames).as("n_frames")).as("meta"))
  }

  /** REAL frame sampling: decode every `everyN`-th PAGE of each TIFF
    * container (pages not sampled are never decoded) and emit the frame's
    * integer pixel sum — per-frame evidence the real codec ran. Fails
    * loudly on an undecodable container. */
  def sampleFramesReal(media: DataFrame, everyN: Int = 2,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (id, payload) =>
          val n = FrameCodec.frameCount(payload).getOrElse(
            throw new IllegalArgumentException(
              s"sampleFramesReal: media_id=$id payload is not a readable " +
                "multi-page TIFF"))
          (0 until n by everyN).map { f =>
            val img = FrameCodec.decodeFrame(payload, f).get
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += img.getRaster.getSample(x, y, 0)
                x += 1
              }
              y += 1
            }
            (id, f, sum)
          }
        })
      }
      .toDF("media_id", "frame_idx", "pixel_sum")
  }
}

package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema, batch shape, and deterministic stub codec
  * behavior over the real documents table. */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.fakeMediaFromDocs(docs)

  test("fake media table has the canonical media schema") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType].fields.map(f => (f.name, f.dataType)).toSeq == Multimodal.MetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(media.count() == docs.count())
  }

  test("extractFeatures: fixed-dim L1-normalized histogram, payload dropped") {
    val f = Multimodal.extractFeatures(media, batchSize = 7)
    assert(!f.columns.contains("payload"))
    val rows = f.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val feats = r.getAs[scala.collection.Seq[Float]]("features")
      assert(feats.length == Multimodal.FakeCodec.FeatureDim)
      assert(math.abs(feats.sum - 1f) < 1e-3, s"not normalized: ${feats.sum}")
    }
    // determinism: same doc -> same features on recompute
    val again = Multimodal.extractFeatures(media, batchSize = 64).collect()
    assert(rows.map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("features")).toMap
      == again.map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("features")).toMap)
  }

  test("resize rewrites metadata and shrinks payloads") {
    val r = Multimodal.resize(media, 8, 8)
    val m = r.select("meta.width", "meta.height").distinct().collect()
    assert(m.map(x => (x.getInt(0), x.getInt(1))).toSet == Set((8, 8)))
    val shrunk = r.select(length(col("payload"))).agg(max("length(payload)"))
    assert(shrunk.collect()(0).getInt(0) > 0)
  }

  test("sampleFrames: only every-Nth frame materializes, slices cover payload") {
    val s = Multimodal.sampleFrames(media, everyN = 2)
    val byDoc = s.groupBy("media_id").agg(count(lit(1)).as("n"),
      collect_list("frame_idx").as("idxs"))
      .join(media.select(col("media_id"), col("meta.n_frames")), "media_id")
    byDoc.collect().foreach { r =>
      val nFrames = r.getAs[Int]("n_frames")
      val expected = (0 until nFrames by 2).toSeq
      assert(r.getAs[scala.collection.Seq[Int]]("idxs").sorted.toSeq == expected,
        s"media ${r.getLong(0)}: got ${r.getAs[scala.collection.Seq[Int]]("idxs")} want $expected")
    }
    // frame payloads are non-empty slices
    assert(s.where(length(col("frame_payload")) === 0).count() == 0)
  }

  // ---- real image codec (JDK javax.imageio — no external libraries)

  test("syntheticImages are REAL PNGs: decoded pixels match the arithmetic") {
    val imgs = Multimodal.syntheticImages(docs.limit(20), w = 16, h = 12)
    val got = Multimodal.pixelHistogram(imgs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // oracle: recompute the pixel function directly, no image code involved
    val ids = docs.limit(20).select("doc_id").collect().map(_.getLong(0))
    val want = (for {
      id <- ids; x <- 0 until 16; y <- 0 until 12
    } yield (id, (((id * 31 + 7 * x + 13 * y) % 256) / 16).toInt))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.filter(_._2 > 0) == want, "decoded histogram != pixel arithmetic")
  }

  test("real resize: output decodes at the target dimensions") {
    val imgs = Multimodal.syntheticImages(docs.limit(5), w = 16, h = 12)
    val r = Multimodal.resize(imgs, 8, 6)
    r.select("payload").collect().foreach { row =>
      val img = Multimodal.ImageCodec.decode(row.getAs[Array[Byte]](0))
      assert(img.isDefined, "resized payload is not a decodable image")
      assert(img.get.getWidth == 8 && img.get.getHeight == 6)
    }
    // a CONSTANT image stays constant under bilinear resize — pixel-level
    // proof the scale path really resamples rather than truncating bytes
    val flat = Multimodal.ImageCodec.synthPng(16, 12, (_, _) => 77)
    val scaled = Multimodal.ImageCodec.resize(flat, 4, 4).get
    val dec = Multimodal.ImageCodec.decode(scaled).get
    for (x <- 0 until 4; y <- 0 until 4)
      assert((dec.getRGB(x, y) & 0xff) == 77, s"pixel ($x,$y) not preserved")
  }

  test("AudioCodec: WAV round-trips PCM16 exactly; junk fails; stats match") {
    // exact round-trip incl. both extremes of the 16-bit range
    val s = Array[Short](Short.MinValue, -1, 0, 1, 12345, Short.MaxValue)
    val wav = Multimodal.AudioCodec.encodeWav(s)
    assert(Multimodal.AudioCodec.decodeWav(wav).get.toSeq == s.toSeq)
    assert(Multimodal.AudioCodec.decodeWav("not a wav".getBytes).isEmpty)
    // audioStats over synthetic clips equals the generating arithmetic
    val stats = Multimodal.audioStats(
      Multimodal.syntheticAudio(docs.limit(8), n = 64)).collect()
    assert(stats.length == 8)
    stats.foreach { r =>
      val id = r.getLong(0)
      val want = (0 until 64).map(i => ((id * 31 + 17L * i) % 65536) - 32768)
      assert(r.getLong(1) == 64 && r.getInt(2) == want.min.toInt &&
        r.getInt(3) == want.max.toInt && r.getLong(4) == want.sum,
        s"clip $id: ${r.toSeq} vs (min=${want.min}, max=${want.max}, sum=${want.sum})")
    }
    // an undecodable payload fails LOUDLY (coverage can't be faked)
    val junk = spark.createDataFrame(Seq((1L, Array[Byte](1, 2, 3))))
      .toDF("media_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.audioStats(junk).collect()
    }
    assert(ex.getMessage != null)
  }

  test("FrameCodec: multi-page TIFF round-trips; sampled pages decode real") {
    // 3-frame container: page count + per-page pixel round-trip
    import java.awt.image.BufferedImage
    val frames = (0 until 3).map { f =>
      val img = new BufferedImage(4, 2, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 2; x <- 0 until 4)
        img.getRaster.setSample(x, y, 0, (10 * f + x + y) % 256)
      img
    }
    val tiff = Multimodal.FrameCodec.encodeTiff(frames)
    assert(Multimodal.FrameCodec.frameCount(tiff).contains(3))
    for (f <- 0 until 3) {
      val img = Multimodal.FrameCodec.decodeFrame(tiff, f).get
      for (y <- 0 until 2; x <- 0 until 4)
        assert(img.getRaster.getSample(x, y, 0) == (10 * f + x + y) % 256)
    }
    // sampleFramesReal over synthetic clips equals the arithmetic, and
    // only every-2nd page is emitted
    val stats = Multimodal.sampleFramesReal(
      Multimodal.syntheticVideos(docs.limit(6), w = 8, h = 6, nFrames = 6),
      everyN = 2).collect()
    assert(stats.length == 6 * 3) // frames 0, 2, 4
    stats.foreach { r =>
      val (id, f) = (r.getLong(0), r.getInt(1))
      assert(f % 2 == 0)
      val want = (for (x <- 0 until 8; y <- 0 until 6)
        yield (id * 31 + 7 * x + 13 * y + 97 * f) % 256).sum
      assert(r.getLong(2) == want, s"clip $id frame $f: ${r.getLong(2)} vs $want")
    }
  }

  test("extractFeatures uses decoded pixels for real images") {
    val imgs = Multimodal.syntheticImages(docs.limit(8), w = 16, h = 12)
    val f = Multimodal.extractFeatures(imgs).collect()
    f.foreach { r =>
      val id = r.getLong(0)
      val feats = r.getAs[scala.collection.Seq[Float]]("features")
      val want = Array.fill(16)(0L)
      for (x <- 0 until 16; y <- 0 until 12)
        want((((id * 31 + 7 * x + 13 * y) % 256) / 16).toInt) += 1
      val n = (16 * 12).toFloat
      feats.zip(want).foreach { case (got, w) =>
        assert(math.abs(got - w / n) < 1e-6, s"media $id: $got vs ${w / n}")
      }
    }
  }
}

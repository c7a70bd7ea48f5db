package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val media = Multimodal.synth(spark, 30, partitions = 3).cache()

  test("synthetic media table has the declared schema and is deterministic") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "bytes", "meta"))
    val again = Multimodal.synth(spark, 30, partitions = 5)
    val a = media.select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> java.util.Arrays.hashCode(r.getAs[Array[Byte]](1))).toMap
    val b = again.select("media_id", "bytes").collect()
      .map(r => r.getLong(0) -> java.util.Arrays.hashCode(r.getAs[Array[Byte]](1))).toMap
    assert(a == b) // partitioning must not affect content
  }

  test("feature extraction decodes headers and computes content features") {
    val f = Multimodal.extractFeatures(media).collect()
    assert(f.length == 30)
    assert(f.forall(_.getBoolean(2))) // decoded_ok for all synthetic rows
    val r0 = f.find(_.getLong(0) == 0L).get
    assert(r0.getInt(6) == 32 && r0.getInt(7) == 32) // width/height from header
    assert(r0.getLong(4) > 3500) // seeded byte stream is near-uniform: entropy ~4 bits
    // corrupt magic -> decode fails but pipeline survives
    import spark.implicits._
    val bad = Seq((99L, "image", Array[Byte](1, 2, 3))).toDF("media_id", "modality", "bytes")
    val fb = Multimodal.extractFeatures(bad).collect()(0)
    assert(!fb.getBoolean(2) && fb.getInt(6) == -1)
  }

  test("real image decode: PNG roundtrip gives exact luma features") {
    val real = Multimodal.synthReal(spark, 8, partitions = 2).cache()
    val f = Multimodal.imageFeatures(real.filter(col("modality") === "image")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f.keys.toSet == Set(0L, 2L, 4L, 6L))
    // media 2: 48x48 solid gray 2 with a 48-pixel white diagonal
    val r2 = f(2L)
    assert(r2.getBoolean(1) && r2.getInt(2) == 48 && r2.getInt(3) == 48)
    val side = 48L; val gray = 2L
    val lumaWhite = (299L * 255 + 587 * 255 + 114 * 255) / 1000
    val expected = (gray * (side * side - side) + lumaWhite * side) * 1000 / (side * side)
    assert(r2.getLong(4) == expected, s"mean_luma_q3 ${r2.getLong(4)} != $expected")
    // corrupt bytes survive as decoded_ok = false
    import spark.implicits._
    val bad = Seq((9L, Array[Byte](9, 9, 9))).toDF("media_id", "bytes")
    assert(!Multimodal.imageFeatures(bad).collect()(0).getBoolean(1))
  }

  test("real image resize: nearest-neighbor preserves the solid color") {
    val real = Multimodal.synthReal(spark, 4, partitions = 2)
    val resized = Multimodal.imageResize(real.filter(col("modality") === "image"), 8, 8)
    val rows = resized.collect()
    assert(rows.forall(r => r.getInt(1) == 8 && r.getInt(2) == 8))
    val b0 = rows.find(_.getLong(0) == 0L).get.getAs[Array[Byte]](3)
    val img = Multimodal.decodeImage(b0).get
    assert(img.getWidth == 8 && img.getHeight == 8)
    // media 0 is solid gray 0 (off-diagonal); corners stay that color
    assert((img.getRGB(7, 0) & 0xffffff) == 0)
  }

  test("real WAV decode: square wave gives exact rms and zcr") {
    val real = Multimodal.synthReal(spark, 8, partitions = 2)
    val f = Multimodal.audioFeatures(real.filter(col("modality") === "audio")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f.keys.toSet == Set(1L, 3L, 5L, 7L))
    val r3 = f(3L)
    val amp = (1000 + 3 * 7 % 20000).toLong
    assert(r3.getBoolean(1) && r3.getInt(2) == 8000 && r3.getInt(3) == 1)
    assert(r3.getLong(4) == 800L)
    assert(r3.getLong(5) == amp) // |square wave| is constant => RMS == amp
    // sign flips every 4 samples: 199 flips over 799 transitions
    assert(r3.getLong(6) == 199L * 1000 / 799)
  }

  test("corrupt WAV with negative chunk length returns None (no hang)") {
    // RIFF/WAVE header followed by a chunk whose length field is -8: the
    // walk must reject it instead of looping at the same offset forever
    val b = new java.io.ByteArrayOutputStream()
    b.write("RIFF".getBytes("US-ASCII")); b.write(Array[Byte](0, 1, 0, 0))
    b.write("WAVE".getBytes("US-ASCII"))
    b.write("junk".getBytes("US-ASCII"))
    b.write(Array[Byte](-8, -1, -1, -1)) // len = -8 little-endian
    b.write(new Array[Byte](32))
    assert(Multimodal.decodeWavPcm(b.toByteArray).isEmpty)
  }

  test("corrupt WAV with a huge positive chunk length returns None (no Int overflow)") {
    // len = 0x7FFFFFF7 passes a len<0 check, but 8+len+(len&1) overflows
    // Int to a NEGATIVE offset whose o+8<=length guard still passes —
    // tag(o) would throw StringIndexOutOfBoundsException and kill the task
    val b = new java.io.ByteArrayOutputStream()
    b.write("RIFF".getBytes("US-ASCII")); b.write(Array[Byte](0, 1, 0, 0))
    b.write("WAVE".getBytes("US-ASCII"))
    b.write("junk".getBytes("US-ASCII"))
    b.write(Array[Byte](-9, -1, -1, 127)) // len = 0x7FFFFFF7 little-endian
    b.write(new Array[Byte](64))
    assert(Multimodal.decodeWavPcm(b.toByteArray).isEmpty)
  }

  test("frame sampling emits every Nth chunk for videos only") {
    val frames = Multimodal.frameSample(media, everyN = 2, frameSize = 64)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keys.forall(_ % 3 == 2)) // modality == video for i % 3 == 2
    val m2 = media.filter(col("media_id") === 2L).select("bytes").head().getAs[Array[Byte]](0)
    val expect = ((m2.length - 16) / 64 + 1) / 2
    assert(byId(2L) == expect)
  }

  test("real MJPEG AVI: container roundtrip is byte-exact per frame") {
    def gray(side: Int, g: Int) = {
      val img = new java.awt.image.BufferedImage(
        side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until side; x <- 0 until side)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      img
    }
    val imgs = Seq(gray(32, 10), gray(32, 100), gray(32, 200))
    val avi = Multimodal.encodeAviMjpeg(imgs, fps = 5)
    val dec = Multimodal.decodeAviMjpeg(avi).get
    assert(dec.width == 32 && dec.height == 32 && dec.usecPerFrame == 200000)
    // the container must hand back the exact JPEG bytes it was given —
    // independent JPEG encodes of the same frames are the reference
    def jpeg(img: java.awt.image.BufferedImage) = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    assert(dec.frames.length == 3)
    imgs.map(jpeg).zip(dec.frames).foreach { case (want, got) =>
      assert(java.util.Arrays.equals(want, got))
    }
  }

  test("real video frame features: sampled luma equals imageFeatures on the same JPEGs") {
    import spark.implicits._
    val vids = Multimodal.synthRealVideo(spark, 6)
    val sampled = Multimodal.frameSampleMjpeg(vids, everyN = 2)
    val feats = Multimodal.videoFrameFeatures(vids, everyN = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(feats.nonEmpty && feats.keys.exists(_._2 == 2)) // >1 sampled frame somewhere
    // every sampled frame's luma must equal the image path's on that JPEG
    val asImages = sampled
      .select(col("media_id") * 1000 + col("frame_idx"), col("frame_bytes"))
      .toDF("media_id", "bytes")
    val viaImage = Multimodal.imageFeatures(asImages)
      .collect().map { r =>
        val k = r.getLong(0); ((k / 1000, (k % 1000).toInt), r.getLong(4)) }.toMap
    assert(viaImage == feats)
    // sampling stride: only even frame indexes
    assert(feats.keys.forall(_._2 % 2 == 0))
  }

  test("AVI video frames on a non-zero stream id are still collected") {
    // real muxes often put audio at stream 00 and video at 01: frame
    // chunks are then '01dc' — rewrite the synthesized stream id and the
    // decoder must find the same frames at the same indexes
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val avi = Multimodal.encodeAviMjpeg(Seq(img, img), fps = 10)
    val want = Multimodal.decodeAviMjpeg(avi).get.frames
    val moved = avi.clone()
    var o = 0
    while (o + 4 <= moved.length) {
      if (moved(o) == '0' && moved(o + 1) == '0' &&
        moved(o + 2) == 'd' && moved(o + 3) == 'c') moved(o + 1) = '1'
      o += 1
    }
    val got = Multimodal.decodeAviMjpeg(moved).get.frames
    assert(got.length == 2 &&
      got.zip(want).forall { case (g, w) => java.util.Arrays.equals(g, w) })
    // ...while audio chunks ('01wb') are never collected as frames
    val audio = avi.clone()
    o = 0
    while (o + 4 <= audio.length) {
      if (audio(o) == '0' && audio(o + 1) == '0' &&
        audio(o + 2) == 'd' && audio(o + 3) == 'c') {
        audio(o + 2) = 'w'; audio(o + 3) = 'b'
      }
      o += 1
    }
    assert(Multimodal.decodeAviMjpeg(audio).get.frames.isEmpty)
  }

  test("AVI with two video streams: only the declared vids stream is decoded") {
    // a dual-stream mux (main video at 00, a secondary video track at 01)
    // must NOT interleave the two streams' frames under one index space
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16(v >>> 16)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    def list(t: String, body: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(4 + body.length) ++ fcc(t) ++ body
    def jpegOf(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(shade, shade, shade))
      g.fillRect(0, 0, 8, 8); g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val (mainA, mainB, side) = (jpegOf(32), jpegOf(224), jpegOf(128))
    def strl(fccType: String) = list("strl",
      chunk("strh", fcc(fccType) ++ fcc("MJPG") ++ Array.fill[Byte](48)(0)))
    val avih = chunk("avih",
      le32(100000) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(2) ++ le32(0) ++
        le32(2) ++ le32(0) ++ le32(8) ++ le32(8) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ strl("vids") ++ strl("vids"))
    val movi = list("movi",
      chunk("00dc", mainA) ++ chunk("01dc", side) ++
        chunk("00dc", mainB) ++ chunk("01dc", side))
    val body = fcc("AVI ") ++ hdrl ++ movi
    val avi = fcc("RIFF") ++ le32(body.length) ++ body
    val got = Multimodal.decodeAviMjpeg(avi).get
    assert(got.frames.length == 2)
    assert(java.util.Arrays.equals(got.frames(0), mainA) &&
      java.util.Arrays.equals(got.frames(1), mainB))
    // stride sampling indexes within the MAIN stream only: everyN=2 over
    // 2 main frames keeps frame 0 alone (the side track no longer pads it)
    val sampled = Multimodal.decodeAviMjpegSampled(avi, 2).get._4
    assert(sampled.map(_._1) == Seq(0) &&
      java.util.Arrays.equals(sampled.head._2, mainA))
  }

  test("corrupt AVI bytes are data, not errors (no hang, no crash)") {
    assert(Multimodal.decodeAviMjpeg("RIFFxxxxAVI ".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeAviMjpeg(Array[Byte](1, 2, 3)).isEmpty)
    // negative chunk length inside an otherwise-valid header: walk must stop
    val good = Multimodal.encodeAviMjpeg(Seq(new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)))
    val bad = good.clone()
    // corrupt the movi list's first frame chunk length to -8
    val idx = {
      var i = -1; var o = 0
      while (i < 0 && o + 4 <= bad.length) {
        if (bad(o) == '0' && bad(o + 1) == '0' && bad(o + 2) == 'd') i = o
        o += 1
      }
      i
    }
    assert(idx > 0)
    bad(idx + 4) = -8; bad(idx + 5) = -1; bad(idx + 6) = -1; bad(idx + 7) = -1
    val dec = Multimodal.decodeAviMjpeg(bad)
    assert(dec.isEmpty || dec.get.frames.isEmpty) // header may parse; no frames
    // truncated tail: frames shrink, no exception
    val trunc = Multimodal.decodeAviMjpeg(good.take(good.length - 3))
    assert(trunc.forall(_.frames.length <= 1))
  }
}

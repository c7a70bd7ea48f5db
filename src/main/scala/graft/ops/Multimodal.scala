package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * functions (the Scala analogue of `mapInPandas` batch UDFs).
  *
  * Decode status by modality:
  *   - images: REAL decode/resize via the JDK's built-in ImageIO codecs
  *     (PNG/JPEG/BMP/GIF — java.desktop, no external libs):
  *     [[imageFeatures]], [[imageResize]].
  *   - audio: REAL decode of RIFF/WAVE 16-bit PCM (hand-rolled header
  *     parse, exact integer feature math): [[audioFeatures]].
  *   - video: REAL for MJPEG-in-AVI — hand-rolled RIFF container walk
  *     ([[decodeAviMjpeg]], same discipline as the WAV path) + per-frame
  *     JPEG decode via ImageIO; [[frameSampleMjpeg]] /
  *     [[videoFrameFeatures]] / [[encodeAviMjpeg]] / [[synthRealVideo]].
  *     Modern codecs (H.264/VP9/AV1) remain STUBBED behind the
  *     deterministic GRFT header fake ([[fakeDecode]]) — no decoder exists
  *     in this environment; the container walk and batch shape are the
  *     same, so swapping in a codec call changes nothing else.
  *
  * All feature columns are fixed-point integers computed in integer/long
  * arithmetic, so results are bit-identical across engines and runs.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))
  ))

  /** Deterministic synthetic media table derived from a seed: header bytes
    * encode the fake dimensions, body is a seeded byte stream. Stands in
    * for a real ingest of image/audio blobs.
    */
  def synth(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = spark.range(0, n, 1, partitions).map { i =>
      val mod = Seq("image", "audio", "video")((i % 3).toInt)
      val w = 32 + (i % 8).toInt * 16
      val h = 32 + (i % 5).toInt * 16
      val sr = 8000 + (i % 4).toInt * 8000
      val nf = 1 + (i % 30).toInt
      val bodyLen = 256 + (i % 7).toInt * 128
      val bytes = new Array[Byte](16 + bodyLen)
      // 16-byte header: magic "GRFT", modality code, w, h, sr packed LE
      bytes(0) = 'G'; bytes(1) = 'R'; bytes(2) = 'F'; bytes(3) = 'T'
      bytes(4) = mod.head.toByte
      bytes(5) = (w & 0xff).toByte; bytes(6) = (w >> 8).toByte
      bytes(7) = (h & 0xff).toByte; bytes(8) = (h >> 8).toByte
      bytes(9) = (sr & 0xff).toByte; bytes(10) = ((sr >> 8) & 0xff).toByte
      bytes(11) = (nf & 0xff).toByte
      var x = seed ^ (i * 0x9e3779b97f4a7c15L)
      var j = 16
      while (j < bytes.length) {
        x = x * 6364136223846793005L + 1442695040888963407L
        bytes(j) = (x >>> 33).toByte
        j += 1
      }
      (i, mod, bytes, (w, h, sr, nf))
    }.toDF("media_id", "modality", "bytes", "m")
    rows.select(col("media_id"), col("modality"), col("bytes"),
      struct(col("m._1").as("width"), col("m._2").as("height"),
        col("m._3").as("sample_rate"), col("m._4").as("n_frames")).as("meta"))
  }

  /** STUB decode: validates the magic and reads the fake header. A real
    * implementation would return decoded pixels/samples.
    */
  def fakeDecode(bytes: Array[Byte]): Option[(Char, Int, Int, Int, Int)] = {
    if (bytes.length < 16 || bytes(0) != 'G' || bytes(1) != 'R' ||
      bytes(2) != 'F' || bytes(3) != 'T') None
    else Some((
      bytes(4).toChar,
      (bytes(5) & 0xff) | ((bytes(6) & 0xff) << 8),
      (bytes(7) & 0xff) | ((bytes(8) & 0xff) << 8),
      (bytes(9) & 0xff) | ((bytes(10) & 0xff) << 8),
      bytes(11) & 0xff))
  }

  /** Feature extraction over binary media — one narrow per-partition batch
    * pass (no shuffle): decodes the header (stub), computes content
    * features (length, byte entropy x1000, 16-bin histogram) per row.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "bytes")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mod, bytes) =>
          val dec = fakeDecode(bytes)
          val hist = new Array[Long](16)
          var i = 16
          while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
          val n = math.max(1, bytes.length - 16).toDouble
          var ent = 0.0
          hist.foreach { c => if (c > 0) { val p = c / n; ent -= p * math.log(p) } }
          (id, mod, dec.isDefined, bytes.length.toLong,
            math.round(ent / math.log(2) * 1000), hist.toSeq,
            dec.map(_._2).getOrElse(-1), dec.map(_._3).getOrElse(-1))
        }
      }
      .toDF("media_id", "modality", "decoded_ok", "n_bytes", "entropy_q3",
        "hist16", "width", "height")
  }

  /** Deterministic REAL-media table: PNG images (solid color `id % 256`
    * gray + one white diagonal) and 16-bit PCM WAV audio (±amp square wave,
    * period 8 samples) — valid files any tool can open, exact expected
    * features for tests. Columns (media_id, modality, bytes).
    */
  def synthReal(spark: SparkSession, n: Long, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      if (i % 2 == 0) {
        val side = 16 + (i % 4).toInt * 16
        val gray = (i % 256).toInt
        val img = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            img.setRGB(x, y,
              if (x == y) 0xffffff else (gray << 16) | (gray << 8) | gray)
            x += 1
          }
          y += 1
        }
        (i, "image", encodePng(img))
      } else {
        val rate = 8000 + (i % 3).toInt * 8000
        val amp = (1000 + i * 7 % 20000).toInt
        val nSamples = 800
        val data = new Array[Byte](44 + nSamples * 2)
        def w16(o: Int, v: Int): Unit = {
          data(o) = (v & 0xff).toByte; data(o + 1) = ((v >> 8) & 0xff).toByte }
        def w32(o: Int, v: Int): Unit = { w16(o, v & 0xffff); w16(o + 2, v >>> 16) }
        def tag(o: Int, s: String): Unit =
          s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, j) => data(o + j) = b }
        tag(0, "RIFF"); w32(4, 36 + nSamples * 2); tag(8, "WAVE")
        tag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, 1); w32(24, rate)
        w32(28, rate * 2); w16(32, 2); w16(34, 16)
        tag(36, "data"); w32(40, nSamples * 2)
        var s = 0
        while (s < nSamples) {
          w16(44 + s * 2, (if ((s / 4) % 2 == 0) amp else -amp) & 0xffff)
          s += 1
        }
        (i, "audio", data)
      }
    }.toDF("media_id", "modality", "bytes")
  }

  // ---- real decoders (JDK-builtin codecs; no external libs) -------------

  /** Real image decode via ImageIO (PNG/JPEG/BMP/GIF). None on non-image
    * bytes instead of throwing — corrupt blobs are data, not errors.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Integer luma stats of a decoded image: (width, height, luma sum,
    * 16-bin luma histogram), luma = (299·R + 587·G + 114·B) / 1000 per
    * pixel. Shared by [[imageFeatures]] and [[videoFrameFeatures]].
    */
  private def lumaStats(img: java.awt.image.BufferedImage): (Int, Int, Long, Array[Long]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val hist = new Array[Long](16)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        sum += luma; hist(luma >> 4) += 1
        x += 1
      }
      y += 1
    }
    (w, h, sum, hist)
  }

  /** Real image features — one narrow per-partition pass: (media_id,
    * decoded_ok, width, height, mean_luma_q3, 16-bin luma histogram).
    * Luma per pixel = (299·R + 587·G + 114·B) / 1000 in integer math.
    */
  def imageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some(img) =>
              val (w, h, sum, hist) = lumaStats(img)
              (id, true, w, h, sum * 1000 / (w.toLong * h), hist.toSeq)
            case None => (id, false, -1, -1, -1L, Seq.empty[Long])
          }
        }
      }
      .toDF("media_id", "decoded_ok", "width", "height", "mean_luma_q3", "luma_hist16")
  }

  /** Real image resize (nearest-neighbor via AffineTransformOp — exact
    * pixel picks, no resampling blur, deterministic), re-encoded as PNG
    * (lossless). Narrow pass; output is the resized media table.
    */
  def imageResize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeImage(bytes).map { img =>
            val dst = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(img, 0, 0, width, height, null)
            g.dispose()
            (id, width, height, encodePng(dst))
          }
        }
      }
      .toDF("media_id", "width", "height", "bytes")
  }

  /** Parsed 16-bit PCM WAV: exact integer samples (interleaved channels). */
  final case class WavPcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Real RIFF/WAVE decode, 16-bit PCM only (format tag 1): walks the chunk
    * list to fmt/data, little-endian, no library. None for anything else.
    */
  def decodeWavPcm(bytes: Array[Byte]): Option[WavPcm] = {
    def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var o = 12
    var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, rate)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (o + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(o); val len = le32(o + 4)
      // corrupt blobs are data, not errors — a negative chunk length
      // (e.g. len = -8) would stall the walk (o += 8 + len fails to
      // advance): treat it as a malformed stream and stop
      if (len < 0) return None
      if (id == "fmt " && o + 8 + 16 <= bytes.length)
        fmt = Some((le16(o + 8), le16(o + 10), le32(o + 12)))
      else if (id == "data") data = Some((o + 8, math.min(len, bytes.length - o - 8)))
      // advance in Long: a large positive len (e.g. 0x7FFFFFF7) overflows
      // the Int sum to a NEGATIVE o, whose o+8 <= length check passes and
      // crashes tag(o) — a truncated/corrupt tail just ends the walk
      val next = o.toLong + 8L + len.toLong + (len & 1)
      o = if (next > bytes.length) bytes.length else next.toInt
    }
    for {
      (af, ch, rate) <- fmt if af == 1 && ch >= 1
      (off, len) <- data
    } yield {
      val n = len / 2
      val s = new Array[Short](n)
      var i = 0
      while (i < n) { s(i) = le16(off + i * 2).toShort; i += 1 }
      WavPcm(rate, ch, s)
    }
  }

  /** Real audio features — (media_id, decoded_ok, sample_rate, channels,
    * n_samples, rms_q0, zcr_q3): RMS amplitude (integer sqrt of the mean
    * square) and zero-crossing rate ×1000, both exact over the int samples.
    */
  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWavPcm(bytes) match {
            case Some(w) if w.samples.nonEmpty =>
              var sq = BigInt(0); var zc = 0L
              var i = 0
              while (i < w.samples.length) {
                val v = w.samples(i).toLong
                sq += BigInt(v * v)
                if (i > 0 && ((w.samples(i - 1) < 0) != (v < 0))) zc += 1
                i += 1
              }
              val rms = math.sqrt((sq / w.samples.length).toDouble).toLong
              (id, true, w.sampleRate, w.channels, w.samples.length.toLong,
                rms, zc * 1000 / math.max(1, w.samples.length - 1))
            case _ => (id, false, -1, -1, 0L, -1L, -1L)
          }
        }
      }
      .toDF("media_id", "decoded_ok", "sample_rate", "channels", "n_samples",
        "rms_q0", "zcr_q3")
  }

  // ---- video: real MJPEG-in-AVI path -------------------------------------

  /** Parsed MJPEG AVI: header meta + per-frame standalone JPEG bytes. */
  final case class AviMjpeg(
      width: Int, height: Int, usecPerFrame: Int, frames: Array[Array[Byte]])

  /** Real AVI (RIFF) container decode for MJPEG video — the same
    * hand-rolled chunk-walk discipline as [[decodeWavPcm]], and no codec
    * library: in MJPEG every `00dc`/`00db` chunk IS a standalone JPEG,
    * which ImageIO decodes. Walks nested LISTs (`hdrl`, `movi`, `rec `),
    * honors odd-length padding, and treats corrupt input as data, not
    * errors: negative/overflowing chunk lengths and truncated tails end
    * the walk (None or fewer frames — never a crash or hang). Modern
    * codecs (H.264/VP9/AV1) stay out of scope — no decoder exists in this
    * environment, and that boundary is the honest one: the CONTAINER walk
    * and the pipeline shape are identical for them.
    */
  def decodeAviMjpeg(bytes: Array[Byte]): Option[AviMjpeg] =
    decodeAviMjpegSampled(bytes, 1).map { case (w, h, u, fs) =>
      AviMjpeg(w, h, u, fs.map(_._2).toArray)
    }

  /** Stride-aware container walk: copies ONLY every `everyN`-th frame's
    * bytes (the sampling operators would otherwise pay the allocation for
    * frames they discard — at everyN=4 that is 75% of the copy bandwidth).
    * Returns (width, height, usecPerFrame, (original frame index, jpeg))
    * — indexes are positions in the FULL video stream, so stride changes
    * never renumber frames. The stream to collect is identified from the
    * headers: the Nth `strh` in `hdrl` describes stream N, and the first
    * one with fccType `vids` is the (main) video stream — real muxes often
    * put audio at stream 00 and video at 01, and a secondary video track's
    * frames must not interleave with the main one's. `hdrl` precedes
    * `movi` per the RIFF spec, so the stream id is known before the first
    * frame chunk; files with no `strh` at all (minimal/hand-rolled) fall
    * back to accepting `NNdc`/`NNdb` from any stream. Audio chunks are
    * `NNwb` and never collected.
    */
  def decodeAviMjpegSampled(
      bytes: Array[Byte], everyN: Int
  ): Option[(Int, Int, Int, Seq[(Int, Array[Byte])])] = {
    require(everyN >= 1, s"everyN must be >= 1: $everyN")
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')
    if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var width = -1; var height = -1; var usec = -1
    var frameIdx = 0
    var strhSeen = 0; var videoStream = -1 // Nth strh = stream N; first 'vids' wins
    var skippedOtherStream = false // dc/db chunks seen on non-video streams
    var anyStream = false // fallback mode: header/chunk stream ids disagree
    val frames = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) return // malformed self-nesting: bail, don't recurse off the stack
      var o = start
      var more = true
      while (more && o + 8 <= end) {
        val id = tag(o); val len = le32(o + 4)
        if (len < 0) more = false
        else {
          val bodyEnd = o.toLong + 8L + len.toLong
          if (id == "LIST" && o + 12 <= end)
            walk(o + 12, math.min(bodyEnd, end.toLong).toInt, depth + 1)
          else if (id == "avih" && o + 8 + 40 <= end) {
            usec = le32(o + 8); width = le32(o + 40); height = le32(o + 44)
          } else if (id == "strh" && o + 12 <= end) {
            if (videoStream < 0 && len >= 4 && tag(o + 8) == "vids")
              videoStream = strhSeen
            strhSeen += 1
          } else if (isFrameChunk(id) && bodyEnd <= end && len > 0) {
            val streamId = (id(0) - '0') * 10 + (id(1) - '0')
            if (anyStream || videoStream < 0 || streamId == videoStream) {
              if (frameIdx % everyN == 0)
                frames += ((frameIdx, java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + len)))
              frameIdx += 1
            } else skippedOtherStream = true
          }
          val next = bodyEnd + (len & 1)
          if (next <= o) more = false // non-advancing walk = malformed
          else o = if (next > end) end else next.toInt
        }
      }
    }
    walk(12, bytes.length, 0)
    if (videoStream >= 0 && frames.isEmpty && skippedOtherStream) {
      // mislabeled mux: the declared vids stream carried no frames but
      // other streams did — re-walk accepting any dc/db chunk (the old
      // lenient behavior), so the header/chunk disagreement stays decodable
      anyStream = true; frameIdx = 0
      walk(12, bytes.length, 0)
    }
    if (width <= 0 || height <= 0) None
    else Some((width, height, usec, frames.toSeq))
  }

  /** Minimal valid MJPEG AVI encoder — the write twin of
    * [[decodeAviMjpeg]] (synthesizes test/sample video; any AVI-aware tool
    * opens the output): RIFF(`AVI `) { LIST hdrl { avih, LIST strl {
    * strh vids/MJPG, strf BITMAPINFOHEADER } }, LIST movi { `00dc` <jpeg>
    * per frame } }. Frames are ImageIO-encoded JPEGs.
    */
  def encodeAviMjpeg(frames: Seq[java.awt.image.BufferedImage], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "need at least one frame and fps > 0")
    val jpegs = frames.map { img =>
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val w = frames.head.getWidth; val h = frames.head.getHeight
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16(v >>> 16)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fcc(id) ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(4 + body.length) ++ fcc(listType) ++ body
    val avih = chunk("avih",
      le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(jpegs.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(jpegs.length) ++
        le32(0) ++ le32(0) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        fcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Deterministic REAL video table: MJPEG AVIs of solid-gray frames with
    * a per-frame diagonal (valid files any AVI tool opens). Columns
    * (media_id, modality, bytes) — the video twin of [[synthReal]].
    */
  def synthRealVideo(spark: SparkSession, n: Long, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val side = 32 + (i % 3).toInt * 16
      val nFrames = 3 + (i % 4).toInt
      val frames = (0 until nFrames).map { f =>
        val gray = ((i * 31 + f * 17) % 256).toInt
        val img = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            img.setRGB(x, y,
              if (x == y) 0xffffff else (gray << 16) | (gray << 8) | gray)
            x += 1
          }
          y += 1
        }
        img
      }
      (i, "video", encodeAviMjpeg(frames, fps = 10))
    }.toDF("media_id", "modality", "bytes")
  }

  /** Real frame sampling over MJPEG AVI bytes: every `everyN`-th frame as
    * its standalone JPEG — (media_id, frame_idx, frame_bytes) rows, one
    * narrow flatMap (the partition/explode shape; downstream image ops
    * apply per frame, e.g. [[imageFeatures]] on frame_bytes).
    */
  def frameSampleMjpeg(media: DataFrame, everyN: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeAviMjpegSampled(bytes, everyN).toSeq.flatMap {
          case (_, _, _, frames) => frames.map { case (f, jpeg) => (id, f, jpeg) }
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Real per-frame video features: sample every `everyN`-th MJPEG frame,
    * JPEG-decode it, emit (media_id, frame_idx, width, height,
    * mean_luma_q3) — container walk + frame decode + feature math in ONE
    * narrow pass (no shuffle; a 10⁹-video corpus partitions by media_id
    * and each task streams its own videos).
    */
  def videoFrameFeatures(media: DataFrame, everyN: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeAviMjpegSampled(bytes, everyN).toSeq.flatMap {
            case (_, _, _, frames) =>
              frames.flatMap { case (f, jpeg) =>
                decodeImage(jpeg).map { img =>
                  val (w, h, sum, _) = lumaStats(img)
                  (id, f, w, h, sum * 1000 / (w.toLong * h))
                }
              }
          }
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "mean_luma_q3")
  }

  /** Frame sampling (video): emit every `everyN`-th fixed-size chunk of the
    * body as a "frame" — the partition/explode shape of real frame
    * extraction over the GRFT fake blobs of [[synth]] (for REAL video use
    * [[frameSampleMjpeg]] / [[videoFrameFeatures]]). Output exposes
    * (media_id, frame_idx, frame_bytes) rows, repartitionable downstream by
    * media_id for per-video locality.
    */
  def frameSample(media: DataFrame, everyN: Int = 4, frameSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "video")
      .select("media_id", "bytes").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val body = bytes.drop(16)
        val nFrames = body.length / frameSize
        (0 until nFrames by everyN).map { f =>
          (id, f, body.slice(f * frameSize, (f + 1) * frameSize))
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }
}

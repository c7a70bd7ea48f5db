package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * functions (the Scala analogue of `mapInPandas` batch UDFs).
  *
  * The DECODE step is a STUB — real image/audio codecs are not in this
  * environment — replaced by a deterministic fake that parses a 16-byte
  * synthetic header. Everything around it (schema, batch shape,
  * partitioning, feature extraction, frame sampling) is the real Spark
  * plumbing a production decode would drop into: swap [[fakeDecode]] for a
  * JNI/codec call and nothing else changes.
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

  /** Frame sampling (video): emit every `everyN`-th fixed-size chunk of the
    * body as a "frame" — the partition/explode shape of real frame
    * extraction (decode stubbed). Output exposes (media_id, frame_idx,
    * frame_bytes) rows, repartitionable downstream by media_id for
    * per-video locality.
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

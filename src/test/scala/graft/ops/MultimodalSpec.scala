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

  test("frame sampling emits every Nth chunk for videos only") {
    val frames = Multimodal.frameSample(media, everyN = 2, frameSize = 64)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keys.forall(_ % 3 == 2)) // modality == video for i % 3 == 2
    val m2 = media.filter(col("media_id") === 2L).select("bytes").head().getAs[Array[Byte]](0)
    val expect = ((m2.length - 16) / 64 + 1) / 2
    assert(byId(2L) == expect)
  }
}

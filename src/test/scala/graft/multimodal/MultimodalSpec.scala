package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("feature extraction: fixed dim, deterministic across partitionings, null-safe") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val a = Multimodal.extractFeatures(media, dim = 16)
      .select($"media_id", $"features").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val b = Multimodal.extractFeatures(media.repartition(7), dim = 16)
      .select($"media_id", $"features").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    assert(a.length === 50)
    assert(a.forall(_._2.length === 16))
    assert(a.map(_._2.toSeq) === b.map(_._2.toSeq))

    // corrupt payload → null features, row preserved
    val corrupt = media.withColumn("payload",
      when($"media_id" === 0, lit(Array.empty[Byte])).otherwise($"payload"))
    val c = Multimodal.extractFeatures(corrupt, dim = 16)
      .filter($"media_id" === 0).select($"features").collect().head
    assert(c.isNullAt(0))
  }

  test("arrow-batch path equals the row path (incl. nulls, multi-batch partitions)") {
    val media = Multimodal.syntheticMedia(spark, 120)
      .withColumn("payload",
        when($"media_id" % 17 === 0, lit(null).cast("binary")).otherwise($"payload"))
      .repartition(3) // 40 rows/partition; batchRows=16 forces multi-batch
    def collected(df: org.apache.spark.sql.DataFrame) =
      df.select($"media_id", $"meta.media_type", $"features")
        .as[(Long, String, Option[Seq[Float]])].collect().sortBy(_._1).toSeq
    val rowPath = collected(Multimodal.extractFeatures(media, dim = 16))
    val arrowPath = collected(
      Multimodal.extractFeaturesArrow(media, dim = 16, batchRows = 16))
    assert(arrowPath === rowPath)
    assert(arrowPath.count(_._3.isEmpty) > 0, "null-payload rows must survive")
  }

  test("resizeMeta caps image dims, preserves aspect hint, ignores non-images") {
    val media = Multimodal.syntheticMedia(spark, 100)
    val resized = Multimodal.resizeMeta(media, maxSide = 128)
    val images = resized.filter($"meta.media_type" === "image")
      .select($"meta.width", $"meta.height").as[(Int, Int)].collect()
    assert(images.forall { case (w, h) => w <= 128 && h <= 128 })
    val others = resized.filter($"meta.media_type" =!= "image")
      .join(media.filter($"meta.media_type" =!= "image")
        .select($"media_id", $"meta.width".as("w0")), "media_id")
      .filter($"meta.width" =!= $"w0").count()
    assert(others === 0)
  }

  test("sampleFrames: one row per sampled frame of video rows") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val frames = Multimodal.sampleFrames(media, everyMs = 10000L)
    val expected = media.filter($"meta.media_type" === "video")
      .select((floor(($"meta.duration_ms" - 1) / 10000L) + 1).as("n"))
      .agg(sum($"n")).as[Long].head()
    assert(frames.count() === expected)
    assert(frames.columns.toSet === Set("media_id", "frame_ts_ms", "frame_idx"))
  }
}

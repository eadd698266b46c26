package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition.
  *
  * The actual codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB ([[stubDecode]]);
  * everything around it — schema, partition-sized batching, output
  * shape, null/corrupt handling — is real and tested. In production the
  * stub body is replaced by the codec call (or the whole stage by a
  * `mapInPandas`/`mapInArrow` Python worker); nothing else changes.
  */
object Multimodal {

  /** Canonical multimodal schema fragment. */
  val MediaMeta: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png | wav | mp4 | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", MediaMeta)))

  /** Deterministic synthetic media table (payload = seeded pseudo-bytes)
    * for exercising the pipeline without real codecs. */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rng = new scala.util.Random(seed * 7919L + i)
      val bytes = Array.fill[Byte](64 + rng.nextInt(192))(rng.nextInt().toByte)
      val kind = Seq("image", "audio", "video")(rng.nextInt(3))
      (i, bytes, kind, kind match {
        case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
      }, 16 + rng.nextInt(1024), 16 + rng.nextInt(1024), rng.nextInt(600000).toLong)
    }.toDF("media_id", "payload", "media_type", "format", "width", "height", "duration_ms")
      .select(col("media_id"), col("payload"),
        struct(col("media_type"), col("format"), col("width"),
          col("height"), col("duration_ms")).as("meta"))
  }

  /** ============================ STUB ================================
    * Deterministic fake decoder: real systems decode `payload` with an
    * image/audio codec here; the sandbox has none, so features are a
    * pure function of the bytes (stable across partitionings). The
    * Spark-side contract — batch iteration, fixed-dim output, corrupt
    * (null/empty) rows yield null features — is the real thing.
    * ================================================================ */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null || payload.isEmpty) return null
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(i % dim) += (h % 1000).toFloat / 1000.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction: per-partition iterator (the Scala analog
    * of mapInPandas batches) adding a fixed-dim `features` column.
    * Partition sizing is the caller's lever (`repartition(n)` upstream);
    * each batch holds one partition's rows, never the whole table.
    */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val schema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val enc = ExpressionEncoder(schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = stubDecode(r.getAs[Array[Byte]](payloadIdx), dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Arrow-seam variant of [[extractFeatures]]: identical output, but
    * the decode runs across a SERIALIZED Arrow-record-batch boundary
    * ([[org.apache.spark.sql.GraftColumnBridge.mapViaArrowBatches]]) —
    * the exact payload shape a `mapInArrow`/`mapInPandas` Python codec
    * worker consumes. Swapping the stub for a real decoder changes only
    * the batch consumer; batch sizing (`batchRows`) is the worker
    * memory lever. MultimodalSpec gates arrow-path ≡ row-path. */
  def extractFeaturesArrow(
      df: DataFrame, dim: Int = 16, batchRows: Int = 512): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val payloadIdx = df.schema.fieldIndex("payload")
    // captured as plain values — the row function runs on executors and
    // must not touch the Dataset
    val inTypes = df.schema.fields.map(_.dataType)
    val nIn = inTypes.length
    org.apache.spark.sql.GraftColumnBridge.mapViaArrowBatches(
      df, outSchema, batchRows) { row =>
      val feats = stubDecode(
        if (row.isNullAt(payloadIdx)) null else row.getBinary(payloadIdx), dim)
      val out = new Array[Any](nIn + 1)
      var i = 0
      while (i < nIn) {
        out(i) = row.get(i, inTypes(i))
        i += 1
      }
      out(nIn) =
        if (feats == null) null
        else new org.apache.spark.sql.catalyst.util.GenericArrayData(feats)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
    }
  }

  /** "Resize" stub: rewrites image meta dims, passes payload through —
    * exercises metadata-typed transforms over opaque binaries. */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val m = col("meta")
    val scale = least(
      lit(1.0),
      lit(maxSide.toDouble) / greatest(m.getField("width"), m.getField("height")))
    df.withColumn("meta", struct(
      m.getField("media_type").as("media_type"),
      m.getField("format").as("format"),
      when(m.getField("media_type") === "image",
        round(m.getField("width") * scale).cast("int"))
        .otherwise(m.getField("width")).as("width"),
      when(m.getField("media_type") === "image",
        round(m.getField("height") * scale).cast("int"))
        .otherwise(m.getField("height")).as("height"),
      m.getField("duration_ms").as("duration_ms")))
  }

  /** Frame-sampling stub for video rows: one output row per sampled
    * frame index (real systems decode the frame here). Explodes to
    * `media_id, frame_idx, frame_ts_ms`. */
  def sampleFrames(df: DataFrame, everyMs: Long = 1000L): DataFrame =
    df.filter(col("meta").getField("media_type") === "video")
      .select(
        col("media_id"),
        explode(sequence(lit(0L),
          greatest(col("meta").getField("duration_ms") - 1, lit(0L)),
          lit(everyMs))).as("frame_ts_ms"))
      .withColumn("frame_idx", (col("frame_ts_ms") / everyMs).cast("long"))
}

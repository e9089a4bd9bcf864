package graft.llmops

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder-prompt extension): image/audio/
  * video as opaque `binary` columns + typed metadata, with decode /
  * feature-extract / frame-sample as per-partition batch operators.
  *
  * The Spark-side contract — schema, partitioning, batch iteration shape
  * (the Scala analog of `mapInPandas` batches) — is real and tested. The
  * codec itself is STUBBED: this container has no image/audio libraries,
  * so [[StubCodec]] derives deterministic fake pixels/features from the
  * bytes. Swapping in a real decoder changes ONE function, not the
  * pipeline: the operator signature, batching, and memory profile (one
  * media row decoded at a time per partition, never collected) stay as-is.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),       // image | audio | video
    StructField("payload", BinaryType),    // opaque encoded bytes
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /** STUB decode: deterministic bytes → "pixels". A real build replaces
    * this body with an actual codec call; everything downstream is
    * unchanged. */
  object StubCodec {
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
      // ??? real codec goes here — deterministic fake keeps tests honest
      val out = new Array[Float](math.max(width * height, 1))
      var i = 0
      while (i < out.length) {
        out(i) = ((payload(i % payload.length) & 0xff) / 255.0f)
        i += 1
      }
      out
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_values", IntegerType),
    StructField("mean_value", DoubleType),
    StructField("feature", ArrayType(FloatType))))

  /** Decode + fixed-size feature extraction, one partition batch at a
    * time (mapPartitions ≈ mapInPandas batch shape: the iterator streams,
    * no partition-wide materialization). */
  def extractFeatures(media: DataFrame, featureDim: Int): DataFrame = {
    implicit val enc = Encoders.row(featureSchema)
    media.select("media_id", "kind", "payload", "width", "height")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
          val px = StubCodec.decode(payload, w, h)
          // pooled feature: featureDim equal-width bucket means
          val feat = new Array[Float](featureDim)
          val bucket = math.max(px.length / featureDim, 1)
          var b = 0
          while (b < featureDim) {
            var s = 0.0; var n = 0; var i = b * bucket
            while (i < math.min((b + 1) * bucket, px.length)) { s += px(i); n += 1; i += 1 }
            feat(b) = if (n == 0) 0f else (s / n).toFloat
            b += 1
          }
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            px.length, px.map(_.toDouble).sum / px.length, feat)
        }
      }
  }

  private val resizedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("out_width", IntegerType), StructField("out_height", IntegerType),
    StructField("pixels", ArrayType(FloatType))))

  /** Nearest-neighbor resize of decoded image rows to (outW, outH). The
    * index geometry is the real operator; pixels come from [[StubCodec]]
    * until a codec is wired in. Same batch shape as [[extractFeatures]]:
    * one row decoded at a time per partition, streaming iterator. */
  def resize(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    implicit val enc = Encoders.row(resizedSchema)
    media.filter(col("kind") === "image")
      .select("media_id", "payload", "width", "height")
      .mapPartitions { rows =>
        rows.map { r =>
          val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
          val px = StubCodec.decode(r.getAs[Array[Byte]]("payload"), w, h)
          val out = new Array[Float](outW * outH)
          var y = 0
          while (y < outH) {
            val sy = math.min((y.toLong * h / outH).toInt, h - 1)
            var x = 0
            while (x < outW) {
              val sx = math.min((x.toLong * w / outW).toInt, w - 1)
              out(y * outW + x) = px(sy * w + sx)
              x += 1
            }
            y += 1
          }
          Row(r.getAs[Long]("media_id"), outW, outH, out)
        }
      }
  }

  /** Frame sampling for video rows: keep every `stride`-th frame index —
    * pure metadata explosion (`sequence` + `explode`), codegen'd, no UDF;
    * the decode of selected frames happens later via [[extractFeatures]].
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "frame_idx", "payload", "width", "height")

  /** Deterministic synthetic media table for tests/demos: payload bytes
    * derived from md5 of the id — stable across engines and runs. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val bytes = java.security.MessageDigest.getInstance("MD5")
        .digest(s"media:$i".getBytes("UTF-8"))
      val kind = Seq("image", "audio", "video")(i % 3)
      (i.toLong, kind, bytes, 8, 4, 16000, 30)
    }.toDF("media_id", "kind", "payload", "width", "height", "sample_rate", "n_frames")
  }
}

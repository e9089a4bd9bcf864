package graft.trajectory

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.Random

/** Seeded camera-trajectory generator — the data-plane re-expression of
  * the reference's behavior state machine (behavior_executor.py:638-857):
  * a weighted random walk over behavior types, each behavior emitting
  * frames with its own motion rule, plus labeled segments (E5/E6).
  *
  * Kernel is a pure function `generate(seed, cfg)` (unit-testable,
  * deterministic); the Dataset wrapper is a flatMapGroups UDTF: one job
  * row → N frame rows. Jobs partition freely across executors — the
  * reference runs these serially per worker, Spark parallelizes for free
  * (SURVEY.md §4).
  */
object BehaviorGenerator {

  case class Config(
      durationSeconds: Double = 8.0,
      fps: Int = 30,
      speedCmPerSec: Double = 150.0,
      yawRateDegPerSec: Double = 30.0,
      behaviorWeights: Seq[(String, Double)] = Seq(
        "random_roam" -> 0.4, "translate_forward" -> 0.1,
        "translate_backward" -> 0.1, "translate_left" -> 0.05,
        "translate_right" -> 0.05, "idle" -> 0.05, "rotate" -> 0.25),
      minSegmentFrames: Int = 15,
      maxSegmentFrames: Int = 90,
      zOffsetCm: Double = 170.0)

  case class Sample(sequenceId: String, frame: Int, x: Double, y: Double,
      z: Double, yaw: Double, pitch: Double, behavior: String, segmentIdx: Int)

  /** Weighted choice via normalized cumulative weights
    * (reference: behavior_executor.py:574-635). */
  private def chooseBehavior(rng: Random, weights: Seq[(String, Double)]): String = {
    val total = weights.map(_._2).sum
    val r = rng.nextDouble() * total
    var acc = 0.0
    for ((name, w) <- weights) {
      acc += w
      if (r < acc) return name
    }
    weights.last._1
  }

  /** Deterministic trajectory for (sequenceId, seed). */
  def generate(sequenceId: String, seed: Long, cfg: Config): Seq[Sample] = {
    val rng = new Random(seed)
    val nFrames = (cfg.durationSeconds * cfg.fps).toInt
    val dt = 1.0 / cfg.fps
    val step = cfg.speedCmPerSec * dt
    val out = Vector.newBuilder[Sample]
    var (x, y, z) = (0.0, 0.0, cfg.zOffsetCm)
    var yaw = rng.nextDouble() * 360.0 - 180.0
    var pitch = 0.0
    var frame = 0
    var segIdx = 0
    while (frame < nFrames) {
      val behavior = chooseBehavior(rng, cfg.behaviorWeights)
      val segLen = math.min(
        cfg.minSegmentFrames +
          rng.nextInt(cfg.maxSegmentFrames - cfg.minSegmentFrames + 1),
        nFrames - frame)
      // roam picks a fresh target heading once per segment
      val roamHeading = yaw + (rng.nextDouble() * 180.0 - 90.0)
      var i = 0
      while (i < segLen) {
        behavior match {
          case "random_roam" =>
            val d = roamHeading - yaw
            val nd = d - 360.0 * math.floor((d + 180.0) / 360.0)
            yaw += math.max(math.min(nd, cfg.yawRateDegPerSec * dt),
              -cfg.yawRateDegPerSec * dt)
            x += step * math.cos(math.toRadians(yaw))
            y += step * math.sin(math.toRadians(yaw))
          case "translate_forward" =>
            x += step * math.cos(math.toRadians(yaw))
            y += step * math.sin(math.toRadians(yaw))
          case "translate_backward" =>
            x -= step * math.cos(math.toRadians(yaw))
            y -= step * math.sin(math.toRadians(yaw))
          case "translate_left" =>
            x += step * math.cos(math.toRadians(yaw + 90.0))
            y += step * math.sin(math.toRadians(yaw + 90.0))
          case "translate_right" =>
            x += step * math.cos(math.toRadians(yaw - 90.0))
            y += step * math.sin(math.toRadians(yaw - 90.0))
          case "rotate" =>
            yaw += cfg.yawRateDegPerSec * dt
          case _ => // idle
        }
        pitch = math.max(-45.0, math.min(45.0, pitch + (rng.nextDouble() - 0.5)))
        out += Sample(sequenceId, frame, x, y, z, yaw, pitch, behavior, segIdx)
        frame += 1
        i += 1
      }
      segIdx += 1
    }
    out.result()
  }

  private val sampleSchema = StructType(Seq(
    StructField("sequence_id", StringType), StructField("frame", IntegerType),
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("z", DoubleType), StructField("yaw", DoubleType),
    StructField("pitch", DoubleType), StructField("behavior", StringType),
    StructField("segment_idx", IntegerType)))

  /** UDTF wrapper: jobs(sequence_id, seed) → one row per frame.
    * Each job generates independently — shuffle on sequence_id, then
    * embarrassingly parallel. */
  def generateAll(jobs: DataFrame, cfg: Config = Config()): DataFrame = {
    val prepared = jobs.select(
      col("sequence_id").cast("string"), col("seed").cast("long"))
    implicit val enc = Encoders.row(sampleSchema)
    prepared.groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroups { (_: String, rows: Iterator[Row]) =>
        rows.flatMap { r =>
          generate(r.getString(0), r.getLong(1), cfg).map(s =>
            Row(s.sequenceId, s.frame, s.x, s.y, s.z, s.yaw, s.pitch,
              s.behavior, s.segmentIdx))
        }
      }
  }

  /** E6 — behavior segments derived from the samples (labeled frame
    * intervals; reference: behavior_executor.py:804-810). */
  def segments(samples: DataFrame): DataFrame =
    samples.groupBy(col("sequence_id"), col("segment_idx"), col("behavior"))
      .agg(min("frame").as("start_frame"), max("frame").as("end_frame"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical QC over a metric stream: per-key z-score outlier flagging
  * (the |value − mean| > t·σ rule every telemetry/monitoring pipeline
  * applies to per-type event values before alerting or discarding).
  *
  * The subtlety is DETERMINISM: float mean/variance from a plain
  * SUM(value)/SUM(value²) depends on partition-summation order, so the
  * same data can flag different rows on different runs/engines — fatal
  * for a QC gate. Here values are quantized to integer `quantum`-units
  * (micro-units by default), the two moments are summed as exact
  * integers (second moment in DECIMAL(38,0) — q² overflows a Long at
  * real row counts), and mean/σ/z are derived from those exact sums by
  * a fixed sequence of IEEE double ops. Same data → same flags,
  * anywhere; the DuckDB oracle replays every z bit-for-bit. The z-score
  * is computed in quantized units, which cancels: z is scale-invariant.
  * Quantization bounds: |value|·quantum must fit comfortably in a Long
  * (≤ ~9·10¹⁸) and the flag granularity below quantum⁻¹ is rounded
  * away — micro-units cover any telemetry range that fits a double's
  * integer precision.
  *
  * Scale shape: one map-side quantization, ONE (key)-aggregation with
  * map-side combining (long + decimal sums both commute), and a
  * broadcast of the keys-sized moment table back over the stream —
  * the corpus is scanned twice, shuffled never. */
object Anomaly {

  def zScoreOutliers(df: DataFrame, keyCol: String, valueCol: String,
      threshold: Double, quantum: Double = 1e6): DataFrame = {
    require(threshold > 0 && quantum > 0,
      s"need positive threshold and quantum, got $threshold / $quantum")
    val base = df.withColumn("_q",
      round(col(valueCol) * lit(quantum), 0).cast("long"))
    val qd = col("_q").cast("decimal(19,0)")
    val stats = base.groupBy(keyCol).agg(
      count(lit(1)).as("_n"),
      sum(col("_q")).as("_s"),
      sum(qd * qd).as("_qq"))
    base.join(broadcast(stats), Seq(keyCol))
      .withColumn("_mean", col("_s").cast("double") / col("_n"))
      .withColumn("_sd", sqrt(
        (col("_qq").cast("double") -
          col("_s").cast("double") * col("_s").cast("double") / col("_n"))
          / col("_n")))
      .withColumn("z",
        when(col("_sd") === 0.0, lit(0.0))
          .otherwise((col("_q").cast("double") - col("_mean")) / col("_sd")))
      .withColumn("is_outlier", abs(col("z")) > lit(threshold))
      .drop("_q", "_n", "_s", "_qq", "_mean", "_sd")
  }
}

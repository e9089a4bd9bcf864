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

  /** Robust per-key outlier flags via the median/MAD rule — the
    * heavy-tail-safe complement of [[zScoreOutliers]]: one extreme value
    * inflates the mean AND σ (masking itself and flagging good rows),
    * while the median and the median-absolute-deviation both have 50%
    * breakdown, so the flag is |x − med| > threshold·1.4826·MAD
    * (1.4826 = the normal-consistency constant making MAD ≈ σ on clean
    * data; both factors multiply as plain double literals, identically
    * parsed in any engine). The curation use is length/score gating:
    * a z-gate on document lengths is blown open by a handful of
    * megadocs, a MAD gate is not.
    *
    * Determinism: medians are exact R-7 interpolated percentiles (the
    * q_length_quantiles contract — Spark `percentile` ≡ DuckDB
    * `quantile_cont` bit-for-bit), deviations are single double ops, so
    * every flag hash-replays. MAD = 0 (>50% of a key at one value)
    * flags any deviation — the rule's standard degenerate behavior,
    * documented rather than special-cased.
    *
    * Scale shape: two keyed percentile aggregations with the keys-sized
    * results broadcast back over the stream; `percentile` buffers one
    * KEY's values per task (exact-quantile cost — bounded by the
    * largest group, the same contract as q_length_quantiles; swap in
    * [[graft.llmops.TextStats.binnedQuantiles]]'s fixed-state medians
    * when groups outgrow tasks). */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, s"need a positive threshold, got $threshold")
    val med = df.groupBy(keyCol)
      .agg(expr(s"percentile($valueCol, 0.5D)").as("med"))
    val dev = df.join(broadcast(med), Seq(keyCol))
      .withColumn("abs_dev", abs(col(valueCol).cast("double") - col("med")))
    val mad = dev.groupBy(keyCol)
      .agg(expr("percentile(abs_dev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), Seq(keyCol))
      .withColumn("is_outlier",
        col("abs_dev") > lit(threshold) * lit(1.4826) * col("mad"))
  }

  /** Per-key winsorization: clamp a value column to its key's
    * [pLo, pHi] exact percentile bounds — the standard tail-taming
    * transform before a mean/σ-based stage (a winsorized mean is what
    * makes downstream z-gates usable on heavy-tailed metrics without
    * dropping rows the way a trim does). Bounds are the same exact
    * interpolated percentiles as [[madOutliers]]'s medians; the clamp is
    * pure least/greatest selection, so every output value is either an
    * input value or a bound — hash-replayable by construction. One
    * percentile aggregation + a broadcast of the keys-sized bounds. */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 ≤ pLo < pHi ≤ 1, got $pLo/$pHi")
    val bounds = df.groupBy(keyCol).agg(
      expr(s"percentile($valueCol, ${pLo}D)").as("lo"),
      expr(s"percentile($valueCol, ${pHi}D)").as("hi"))
    df.join(broadcast(bounds), Seq(keyCol))
      .withColumn("clamped",
        least(greatest(col(valueCol).cast("double"), col("lo")), col("hi")))
  }

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

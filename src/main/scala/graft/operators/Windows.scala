package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window / sequential analytics (SURVEY.md §2.5-2.6: W1-W6, W9-W10,
  * O3-O7, A13).
  *
  * Partition key is always the sequence/entity id, ordering the frame/time
  * index — so windows shuffle once on the partition key and each group is
  * small (≤ a few thousand frames). No window without PARTITION BY appears
  * anywhere: a global ORDER BY window would single-task at 100 TB.
  */
object Windows {

  private def w(part: Seq[String], order: Seq[Column]): WindowSpec =
    Window.partitionBy(part.map(col): _*).orderBy(order: _*)

  /** W2 — running prefix sum (cumulative arc length;
    * reference: nav_utils.py:239-242). */
  def cumSum(df: DataFrame, part: Seq[String], order: Seq[Column], v: Column,
      as: String): DataFrame =
    df.withColumn(as, sum(v).over(
      w(part, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** W3 — keep the prefix whose running total stays within budget
    * (reference: worker_create.py:617-656 distance truncation). */
  def truncateAtBudget(df: DataFrame, part: Seq[String], order: Seq[Column],
      v: Column, budget: Double): DataFrame =
    cumSum(df, part, order, v, "_cum").filter(col("_cum") <= budget).drop("_cum")

  /** W6 — angle unwrap: first + prefix-sum of normalized deltas, all
    * windowed — no UDF (reference: transform_track.py:133-155).
    * normDelta maps each successive delta into [-180, 180). */
  def unwrapAngle(df: DataFrame, part: Seq[String], order: Seq[Column],
      angle: Column, as: String): DataFrame = {
    val ws = w(part, order)
    val delta = angle - lag(angle, 1).over(ws)
    val normDelta = delta - lit(360.0) * floor((delta + 180.0) / 360.0)
    df.withColumn("_nd", coalesce(normDelta, lit(0.0)))
      .withColumn(as,
        first(angle).over(ws) + sum(col("_nd")).over(
          ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_nd")
  }

  /** O3/O7 — top-k rows per group with deterministic tie-break. */
  def topKPerGroup(df: DataFrame, part: Seq[String], order: Seq[Column],
      k: Int): DataFrame =
    df.withColumn("_rn", row_number().over(w(part, order)))
      .filter(col("_rn") <= k)
      .withColumnRenamed("_rn", "rank")

  /** A13 — max integer suffix of `{prefix}_{NNN}`-style names per group
    * (reference: worker_create.py:175-194 naming continuity). */
  def maxSuffixIndex(df: DataFrame, groupCols: Seq[String], name: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(max(regexp_extract(name, "(\\d+)$", 1).cast("int")).as("max_index"))

  /** Q5/W9 — sessionize by inactivity gap: session id = running count of
    * gap breaks (reference: run_render_job_headless.py:318-325
    * "no frames for 5 min ⇒ done"). */
  def sessionize(df: DataFrame, part: Seq[String], ts: Column,
      order: Seq[Column], gapSeconds: Long, as: String = "session_id"): DataFrame = {
    val ws = w(part, order)
    val gap = unix_micros(ts) - lag(unix_micros(ts), 1).over(ws)
    df.withColumn("_brk",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn(as, sum(col("_brk")).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_brk")
  }

  /** W9 — stall detection (batch): no progress vs previous observation
    * (reference: monitor.py:142-149). */
  def stalled(df: DataFrame, part: Seq[String], order: Seq[Column],
      progress: Column, as: String = "stalled"): DataFrame = {
    val prev = lag(progress, 1).over(w(part, order))
    df.withColumn(as, prev.isNotNull && progress <= prev)
  }

  /** Interval-union coverage: total DISTINCT covered duration per group
    * from (possibly overlapping) [start, end] intervals — busy-time /
    * uptime from sessions that overlap (the monitor's "how long was a
    * worker actually rendering" view of its task intervals; double-counted
    * overlap is the classic bug this operator exists to avoid).
    *
    * Merged-island form, no recursion: an interval starts a new island iff
    * its start exceeds the running max end of everything before it
    * (`cummax` window); islands then aggregate to [min start, max end] and
    * coverage is the sum of island lengths. One hash shuffle on the group
    * key: the window partitions by it and the island aggregation groups by
    * a superset, so it stays partition-local. Exact in integer units —
    * callers pass longs (e.g. micros).
    */
  def intervalCoverage(df: DataFrame, part: Seq[String], startCol: Column,
      endCol: Column): DataFrame = {
    val ws = w(part, Seq(startCol, endCol))
    val prevMaxEnd = max(endCol).over(
      ws.rowsBetween(Window.unboundedPreceding, -1))
    val islands = df
      .withColumn("_new_island",
        when(prevMaxEnd.isNull || startCol > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new_island")).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((part.map(col) :+ col("_island")): _*)
      .agg(min(startCol).as("_s"), max(endCol).as("_e"),
        count(lit(1)).as("_n"))
    islands.groupBy(part.map(col): _*)
      .agg(sum(col("_e") - col("_s")).as("covered"),
        count(lit(1)).as("n_islands"),
        sum(col("_n")).as("n_intervals"))
  }
}

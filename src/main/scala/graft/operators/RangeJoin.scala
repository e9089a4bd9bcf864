package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J8 — point-in-interval range join (reference: worker_create.py:721-743
  * frame→behavior-segment lookup, materialized there as a per-frame dict).
  *
  * Two physical strategies:
  *
  *  - [[broadcastJoin]]: intervals broadcast + theta join. Right when the
  *    interval side is catalog-sized (behavior segments: ~6 per sequence).
  *  - [[bucketedJoin]]: both sides bucketized to a fixed width and
  *    equi-joined on (bucket), then refined by the exact range predicate.
  *    Intervals spanning b buckets emit b rows (`sequence()` + `explode`).
  *    This turns a nested-loop into a hash join — the 100 TB path when
  *    both sides are large. Bucket width should be chosen near the median
  *    interval span so the blow-up factor stays ~2×.
  */
object RangeJoin {

  def broadcastJoin(points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame =
    points.join(broadcast(intervals), point >= lo && point <= hi)

  def bucketedJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val iv = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pts = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pts.join(iv, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }

  /** Interval×interval OVERLAP join — the two-large-sides generalization
    * of [[bucketedJoin]] (both relations are interval sets; emit every
    * overlapping pair). Closed intervals: `[lo,hi]` overlaps `[lo',hi']`
    * iff `lo <= hi' && lo' <= hi`.
    *
    * Scale shape: both sides explode to the fixed-width cells they span
    * and equi-join on the cell — a hash/sort-merge join, never a nested
    * loop. A pair spanning several shared cells would surface once per
    * cell; instead of a `distinct` shuffle over the (large) pair output,
    * each pair is emitted ONLY from its canonical cell — the cell
    * containing `max(lo, lo')`, which both sides of a true overlap
    * always share. Cell width trades replication (intervals spanning
    * many cells) against cell occupancy (candidate pairs per cell);
    * pick it near the median interval span, as with [[bucketedJoin]].
    *
    * Column name collisions between the two inputs are the caller's to
    * avoid (same contract as Spark's own join).
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      cellWidth: Double): DataFrame = {
    def cells(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("_cell",
        explode(sequence(
          floor(col(lo) / cellWidth).cast("long"),
          floor(col(hi) / cellWidth).cast("long"))))
    cells(left, lLo, lHi).join(cells(right, rLo, rHi), Seq("_cell"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("_cell") ===
        floor(greatest(col(lLo), col(rLo)) / cellWidth).cast("long"))
      .drop("_cell")
  }
}

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
}

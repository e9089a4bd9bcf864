package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial aggregations over an `actors`-shaped table
  * (SURVEY.md §2.4 A2-A5 + adaptive scale; reference:
  * navmesh_injector.py:324-681, 786-854).
  *
  * Inputs are (group, x, extent) style columns; every operator is a single
  * hash aggregation with map-side partial combine — one shuffle at any
  * scale, no collect.
  */
object SpatialAgg {

  /** A2 — axis-aligned bounding box of origin±extent, plus derived
    * center/halfExtent (reference: navmesh_injector.py:514-579). */
  def aabb(df: DataFrame, groupCols: Seq[String],
      axes: Seq[(String, Column, Column)]): DataFrame = {
    val aggs = axes.flatMap { case (name, origin, extent) =>
      Seq(min(origin - extent).as(s"min_$name"), max(origin + extent).as(s"max_$name"))
    }
    val boxed = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    axes.foldLeft(boxed) { case (b, (name, _, _)) =>
      b.withColumn(s"center_$name", (col(s"min_$name") + col(s"max_$name")) / 2)
        .withColumn(s"half_$name", (col(s"max_$name") - col(s"min_$name")) / 2)
    }
  }

  /** Adaptive NavMesh scale: clamp(halfExtent*margin/100, lo, hi)
    * (reference: navmesh_injector.py:786-854). */
  def adaptiveScale(halfExtent: Column, margin: Double, lo: Double, hi: Double): Column =
    greatest(least(halfExtent * margin / 100.0, lit(hi)), lit(lo))

  /** A3 — densest grid cell: bucket by floor(x/cell), count, argmax with a
    * deterministic tie-break (reference: navmesh_injector.py:342-390).
    * Returns one row per group: (group, cell, n, cell_center).
    * Implemented as agg + max_by-style window-free argmax via a struct max:
    * max(struct(n, -cell)) picks highest count, lowest cell on ties —
    * a single extra reduce, no global sort.
    */
  def densestCell(df: DataFrame, groupCols: Seq[String], x: Column,
      cellSize: Double): DataFrame = {
    val cells = df
      .groupBy((groupCols.map(col) :+ floor(x / cellSize).as("cell")): _*)
      .agg(count(lit(1)).as("n"))
    val best = cells
      .groupBy(groupCols.map(col): _*)
      .agg(max(struct(col("n"), (-col("cell")).as("negcell"))).as("_b"))
      .select((groupCols.map(col) :+
        (-col("_b.negcell")).cast("long").as("cell") :+
        col("_b.n").as("n")): _*)
    best.withColumn("cell_center", (col("cell") + 0.5) * cellSize)
  }

  /** A4 — dominant-bucket mode + mean of its members
    * (reference: navmesh_injector.py:646-681 dominant ground plane).
    * Two-phase: bucket-level agg (count + exact sum), then argmax. */
  def histogramMode(df: DataFrame, groupCols: Seq[String], v: Column,
      bucketSize: Double): DataFrame = {
    val buckets = df
      .groupBy((groupCols.map(col) :+ floor(v / bucketSize).as("bucket")): _*)
      .agg(count(lit(1)).as("n"),
        sum(v.cast("decimal(28,6)")).as("sum_v"))
    buckets
      .groupBy(groupCols.map(col): _*)
      .agg(max(struct(col("n"), (-col("bucket")).as("negb"),
        col("sum_v"))).as("_b"))
      .select((groupCols.map(col) :+
        (-col("_b.negb")).cast("long").as("bucket") :+
        col("_b.n").as("n") :+
        (col("_b.sum_v").cast("double") / col("_b.n")).as("mean_v")): _*)
  }

  /** A5 — terrain classification: share of rows above a threshold →
    * Plain/Valley label (reference: navmesh_injector.py:324-340). */
  def aboveRatio(df: DataFrame, groupCols: Seq[String], v: Column,
      threshold: Double, label: (String, String) = ("Plain", "Valley")): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg((sum(when(v > threshold, 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("ratio"))
      .withColumn("terrain",
        when(col("ratio") > 0.5, label._1).otherwise(label._2))
}

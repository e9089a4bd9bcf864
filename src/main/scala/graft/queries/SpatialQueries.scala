package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.spatial.SpatialAgg

/** Spatial aggregation family (SURVEY.md §2.4 A2-A5 + adaptive scale) on
  * numeric stand-in columns (FIXTURES.md §B role mapping).
  */
object SpatialQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // A2 + adaptive scale — AABB of origin±extent per group, then
    // clamp(half*margin/100, lo, hi) (reference:
    // navmesh_injector.py:514-579, 786-854). x:=l_quantity, ex:=l_tax*10.
    ("q_spatial_aabb",
      (s: SparkSession, d: String) => {
        val boxed = SpatialAgg.aabb(Tables.lineitem(s, d), Seq("l_returnflag"),
          axes = Seq(("x", col("l_quantity"), col("l_tax") * 10)))
        boxed.withColumn("scale_x",
            SpatialAgg.adaptiveScale(col("half_x"), margin = 120.0, lo = 20.0, hi = 40.0))
          .select("l_returnflag", "min_x", "max_x", "center_x", "half_x", "scale_x")
          .orderBy("l_returnflag")
      },
      Some("""WITH b AS (
             |  SELECT l_returnflag,
             |    min(l_quantity - l_tax*10) AS min_x,
             |    max(l_quantity + l_tax*10) AS max_x
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, min_x, max_x,
             |  (min_x + max_x)/2 AS center_x,
             |  (max_x - min_x)/2 AS half_x,
             |  greatest(least((max_x - min_x)/2 * 120.0 / 100.0, 40.0), 20.0) AS scale_x
             |FROM b ORDER BY l_returnflag""".stripMargin)),

    // A3 — densest grid cell (argmax with deterministic tie-break)
    // (reference: navmesh_injector.py:342-390). Grid over events.value.
    ("q_grid_density_argmax",
      (s: SparkSession, d: String) => {
        SpatialAgg.densestCell(Tables.events(s, d), Seq("event_type"),
            col("value"), cellSize = 10.0)
          .orderBy("event_type")
      },
      Some("""WITH cells AS (
             |  SELECT event_type, CAST(floor(value/10.0) AS BIGINT) AS cell,
             |         CAST(COUNT(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY event_type
             |    ORDER BY n DESC, cell ASC) AS rn FROM cells)
             |SELECT event_type, cell, n, (cell + 0.5) * 10.0 AS cell_center
             |FROM ranked WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // A4 — dominant-bucket mode + mean of members (reference:
    // navmesh_injector.py:646-681). Exact decimal sum for the mean.
    ("q_histogram_mode",
      (s: SparkSession, d: String) => {
        SpatialAgg.histogramMode(Tables.lineitem(s, d), Seq("l_linestatus"),
            col("l_extendedprice"), bucketSize = 5000.0)
          .orderBy("l_linestatus")
      },
      Some("""WITH buckets AS (
             |  SELECT l_linestatus, CAST(floor(l_extendedprice/5000.0) AS BIGINT) AS bucket,
             |         CAST(COUNT(*) AS BIGINT) AS n,
             |         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS sum_v
             |  FROM lineitem GROUP BY 1, 2),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY l_linestatus
             |    ORDER BY n DESC, bucket ASC) AS rn FROM buckets)
             |SELECT l_linestatus, bucket, n,
             |  CAST(sum_v AS DOUBLE) / n AS mean_v
             |FROM ranked WHERE rn = 1 ORDER BY l_linestatus""".stripMargin)),

    // A5 — above-threshold ratio → terrain label
    // (reference: navmesh_injector.py:324-340).
    ("q_terrain_ratio",
      (s: SparkSession, d: String) => {
        SpatialAgg.aboveRatio(Tables.events(s, d), Seq("event_type"),
            col("value"), threshold = 50.0)
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS ratio,
             |  CASE WHEN CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) > 0.5
             |       THEN 'Plain' ELSE 'Valley' END AS terrain
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline, maximize both axes) — the
  * non-dominated exemplar set for data-selection tradeoffs (length vs
  * vocabulary richness, cost vs quality). All integer-exact: per-x max
  * plus a deterministic representative, then ONE ordered pass over the
  * DISTINCT-x table (bounded by x's cardinality, never row count) with
  * a strict running-max dominance test. A point survives iff no point
  * with strictly larger x has y ≥ its y.
  */
object Pareto {

  /** (xCol, yCol, repAs): the frontier, with `repAs` = the minimum
    * `repCol` among rows attaining the (x, max-y) corner — the
    * deterministic exemplar. */
  def frontier(df: DataFrame, xCol: String, yCol: String, repCol: String,
      repAs: String = "rep"): DataFrame = {
    val perX = Window.partitionBy(xCol)
    val g = df
      .withColumn("_ymax", max(col(yCol)).over(perX))
      .filter(col(yCol) === col("_ymax"))
      .groupBy(xCol)
      .agg(max(yCol).as(yCol), min(repCol).as(repAs))
    val desc = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("_prevmax", max(col(yCol)).over(desc))
      .filter(col("_prevmax").isNull || col(yCol) > col("_prevmax"))
      .select(xCol, yCol, repAs)
  }
}

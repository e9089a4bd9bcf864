package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 build from a change log — the
  * history-preserving counterpart of [[CatalogOps.upsertLatest]] (which
  * keeps only the latest row per key, SCD1). Turns (key, ts, attrs)
  * change events into validity-interval dimension rows:
  * consecutive runs of identical attributes collapse, `valid_from` /
  * `valid_to` bound each run half-open, the open run is `is_current`.
  *
  * Scale shape: ONE hash shuffle on the key. The run-collapse lag, the
  * valid_to lead, and the version row_number are three window passes over
  * the same (key, order) sort; the filter between them preserves the
  * partitioning, so Catalyst plans one exchange + sorts, no re-shuffle.
  * State per task is one row of look-behind — long histories stream.
  */
object Scd2 {

  /** @param tieBreak extra ordering columns for changes sharing a
    *   timestamp (make the run-collapse deterministic; e.g. a log seq). */
  def buildDimension(changes: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    val collapsed = changes
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(col("_prev").isNull || !(col("_prev") <=> attrs))
      .drop("_prev")
    collapsed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}

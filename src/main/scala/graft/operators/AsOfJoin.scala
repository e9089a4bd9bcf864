package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J9 — nearest-key as-of join (reference: camera_exporter.py:222-249,
  * 414-421: per-frame sampling takes the value of the *nearest* keyframe,
  * not last-before).
  *
  * Implemented as the union-and-window form: key rows and query rows are
  * unioned, sorted by (partition, time) once, and each query row picks the
  * nearer of last-preceding / first-following key with `last/first(...,
  * ignoreNulls)` running windows. One shuffle on the partition key, no
  * join explosion — at 100 TB this is strictly better than a range join
  * because each partition is processed in a single ordered pass.
  *
  * Tie-break: equal distance prefers the preceding key; a key at exactly
  * the query time wins outright (keys sort before queries at equal time).
  */
object AsOfJoin {

  /** @param queries   rows to annotate
    * @param keys      rows carrying values
    * @param partCols  equi-partition columns present in both
    * @param queryTime time column in `queries` (numeric or timestamp cast by caller)
    * @param keyTime   time column in `keys`
    * @param keyValues value columns of `keys` to attach (renamed as-is)
    * @return `queries` columns + for each value v: `v`, plus `matched_time`
    */
  def nearest(
      queries: DataFrame,
      keys: DataFrame,
      partCols: Seq[String],
      queryTime: String,
      keyTime: String,
      keyValues: Seq[String]): DataFrame = {
    val qCols = queries.columns.toSeq
    val q = queries
      .withColumn("_t", col(queryTime).cast("double"))
      .withColumn("_isq", lit(1))
      .withColumn("_kt", lit(null).cast("double"))
    val qAligned = keyValues.foldLeft(q)((df, v) =>
      df.withColumn(s"_v_$v", lit(null).cast(keys.schema(v).dataType)))
    val k0 = keys
      .withColumn("_t", col(keyTime).cast("double"))
      .withColumn("_isq", lit(0))
      .withColumn("_kt", col(keyTime).cast("double"))
    val kAligned0 = keyValues.foldLeft(k0)((df, v) => df.withColumn(s"_v_$v", col(v)))
    // align schemas for the union
    val unionCols = (partCols ++ Seq("_t", "_isq", "_kt") ++ keyValues.map(v => s"_v_$v") ++
      qCols.filterNot(c => partCols.contains(c))).distinct
    val kAligned = qCols.filterNot(c => partCols.contains(c) || kAligned0.columns.contains(c))
      .foldLeft(kAligned0)((df, c) => df.withColumn(c, lit(null).cast(queries.schema(c).dataType)))
    val all = qAligned.selectExpr(unionCols.map(c => s"`$c`"): _*)
      .unionByName(kAligned.selectExpr(unionCols.map(c => s"`$c`"): _*))

    // keys sort before queries at equal time → an exact-time key lands in
    // the "preceding" window of its query row
    val ord = Seq(col("_t").asc, col("_isq").asc)
    val wPrev = Window.partitionBy(partCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(partCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val annotated = keyValues.foldLeft(
      all
        .withColumn("_prev_t", last(col("_kt"), ignoreNulls = true).over(wPrev))
        .withColumn("_next_t", first(col("_kt"), ignoreNulls = true).over(wNext))
    ) { (df, v) =>
      df.withColumn(s"_prev_$v", last(col(s"_v_$v"), ignoreNulls = true).over(wPrev))
        .withColumn(s"_next_$v", first(col(s"_v_$v"), ignoreNulls = true).over(wNext))
    }

    val takePrev: Column =
      col("_next_t").isNull ||
        (col("_prev_t").isNotNull &&
          (col("_t") - col("_prev_t")) <= (col("_next_t") - col("_t")))

    val result = annotated.filter(col("_isq") === 1)
      .withColumn("matched_time", when(takePrev, col("_prev_t")).otherwise(col("_next_t")))
    val withVals = keyValues.foldLeft(result) { (df, v) =>
      df.withColumn(v, when(takePrev, col(s"_prev_$v")).otherwise(col(s"_next_$v")))
    }
    withVals.select((qCols.map(col) ++ Seq(col("matched_time")) ++ keyValues.map(col)): _*)
  }
}

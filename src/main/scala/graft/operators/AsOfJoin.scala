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
  *
  * The key's time and ALL value columns travel as one packed struct, so
  * the pass runs exactly TWO running windows (last-preceding +
  * first-following) over the single sort regardless of how many value
  * columns are attached — per-value windows would cost 2·V window states
  * on wide payloads.
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
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val qCols = queries.columns.toSeq
    // key time + every value column ride in ONE struct: query rows carry a
    // null struct, so a single last/first(ignoreNulls) pair recovers the
    // whole key payload — 2 window states total, independent of V
    val packType = StructType(StructField("_kt", DoubleType) +:
      keyValues.map(v => StructField(v, keys.schema(v).dataType)))
    val q = queries
      .withColumn("_t", col(queryTime).cast("double"))
      .withColumn("_isq", lit(1))
      .withColumn("_pack", lit(null).cast(packType))
    val k0 = keys
      .withColumn("_t", col(keyTime).cast("double"))
      .withColumn("_isq", lit(0))
      .withColumn("_pack", struct(
        (col(keyTime).cast("double").as("_kt") +: keyValues.map(col)): _*))
    // align schemas for the union
    val unionCols = (partCols ++ Seq("_t", "_isq", "_pack") ++
      qCols.filterNot(partCols.contains)).distinct
    val kAligned = qCols.filterNot(c => partCols.contains(c) || k0.columns.contains(c))
      .foldLeft(k0)((df, c) => df.withColumn(c, lit(null).cast(queries.schema(c).dataType)))
    val all = q.selectExpr(unionCols.map(c => s"`$c`"): _*)
      .unionByName(kAligned.selectExpr(unionCols.map(c => s"`$c`"): _*))

    // keys sort before queries at equal time → an exact-time key lands in
    // the "preceding" window of its query row
    val ord = Seq(col("_t").asc, col("_isq").asc)
    val wPrev = Window.partitionBy(partCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(partCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val annotated = all
      .withColumn("_prev", last(col("_pack"), ignoreNulls = true).over(wPrev))
      .withColumn("_next", first(col("_pack"), ignoreNulls = true).over(wNext))
    val prevT = col("_prev").getField("_kt")
    val nextT = col("_next").getField("_kt")

    val takePrev: Column =
      col("_next").isNull ||
        (col("_prev").isNotNull &&
          (col("_t") - prevT) <= (nextT - col("_t")))

    val result = annotated.filter(col("_isq") === 1)
      .withColumn("matched_time", when(takePrev, prevT).otherwise(nextT))
    val withVals = keyValues.foldLeft(result) { (df, v) =>
      df.withColumn(v, when(takePrev, col("_prev").getField(v))
        .otherwise(col("_next").getField(v)))
    }
    withVals.select((qCols.map(col) ++ Seq(col("matched_time")) ++ keyValues.map(col)): _*)
  }
}

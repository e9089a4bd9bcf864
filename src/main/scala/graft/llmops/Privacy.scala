package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-size privacy operators for corpus release — the structured-data
  * counterpart of [[TextStats]]' PII redaction: token-level redaction
  * removes identifiers from text, k-anonymity removes IDENTIFIABILITY
  * from metadata (a quasi-identifier combination seen fewer than k times
  * pins down an individual even with direct identifiers gone).
  *
  * Scale shape: group sizes come from a `groupBy().count()` (map-side
  * partial aggregation absorbs hot combinations) joined back null-safely
  * on the quasi columns — NOT a `count() over (partition by quasi)`
  * window, which buffers every row of a hot combination in one task's
  * frame. The count table has one row per distinct combination; when
  * that is small Spark's own stats broadcast it (AQE), otherwise it
  * sort-merges on the same key the window would have shuffled on anyway
  * — strictly no worse, skew-safe, and the partial agg makes the count
  * side cheap.
  */
object Privacy {

  /** Per-row size of the row's quasi-identifier group (null-safe: NULL
    * combinations group together, matching SQL GROUP BY). Adds
    * `sizeCol`; row order and all other columns pass through. */
  def withGroupSize(df: DataFrame, quasiCols: Seq[String],
      sizeCol: String = "group_size"): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier column")
    // The join rename scheme reserves `_q_<col>` and `sizeCol`; an input
    // already carrying one would silently collide in the join/drop.
    val clash = df.columns.filter(c =>
      c == sizeCol || quasiCols.map(q => s"_q_$q").contains(c))
    require(clash.isEmpty,
      s"input carries reserved column name(s) ${clash.mkString(", ")} — " +
      "rename them (or pass a different sizeCol) before withGroupSize")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as(sizeCol))
      .select(quasiCols.map(c => col(c).as(s"_q_$c")) :+ col(sizeCol): _*)
    val cond = quasiCols.map(c => df(c) <=> counts(s"_q_$c")).reduce(_ && _)
    df.join(counts, cond).drop(quasiCols.map(c => s"_q_$c"): _*)
  }

  /** k-anonymity by suppression: every quasi-identifier column of a row
    * whose combination occurs fewer than k times is replaced by
    * `redacted` (columns become string-typed; suppression is
    * all-or-nothing per row, the standard cell-suppression baseline).
    * The released table is k-anonymous over `quasiCols`: every surviving
    * combination either occurs ≥ k times or is the redacted one. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int,
      redacted: String = "*"): DataFrame = {
    val sized = withGroupSize(df, quasiCols, "_gsize")
    val out = quasiCols.foldLeft(sized) { (acc, c) =>
      acc.withColumn(c,
        when(col("_gsize") < k, lit(redacted)).otherwise(col(c).cast("string")))
    }
    out.drop("_gsize")
  }
}

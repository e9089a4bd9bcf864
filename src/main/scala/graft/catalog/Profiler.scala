package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column null count, exact distinct
  * count, and min/max (string-rendered for exactly-representable types)
  * in LONG format — the data-quality report a catalog publishes next to
  * each table (schema drift, null regressions, key-cardinality checks).
  *
  * Single scan: all per-column aggregates run in ONE `agg` (Catalyst
  * plans the multi-distinct via expand — still one pass over the data,
  * map-side partials for the non-distinct metrics), then the wide row
  * unpivots with `stack`. For exact-cardinality-at-scale profiles swap
  * the exact distinct for [[graft.functions.Hll]] — same shape, bounded
  * state; here exactness keeps the report oracle-comparable.
  *
  * min/max are rendered only for string and integral columns: float
  * rendering differs across engines/locales, so a cross-engine-stable
  * report omits it (NULL) rather than publishing unstable text.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val stringable = cols.map { c =>
      val dt = df.schema(c).dataType.typeName
      c -> (dt == "string" || dt == "long" || dt == "integer" || dt == "short")
    }.toMap
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        countDistinct(col(c)).as(s"_dist_$c"),
        (if (stringable(c)) min(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"_min_$c"),
        (if (stringable(c)) max(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"_max_$c"))
    }
    val allAggs = count(lit(1)).as("_n") +: aggs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', _nulls_$c, _dist_$c, _min_$c, _max_$c").mkString(", ")
    wide.selectExpr("_n AS n_rows",
        s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_value, max_value)")
      .select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}

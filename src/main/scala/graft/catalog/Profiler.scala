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

  /** Pairwise Pearson correlation over numeric columns, ONE scan — the
    * redundancy report behind feature pruning and leakage checks (two
    * near-duplicate quality signals inflate whatever consumes both).
    *
    * Cross-engine exactness (the [[graft.llmops.Eval.spearmanByGroup]]
    * convention): each value is cast to DECIMAL(18,6) — deterministic
    * double→decimal rounding, identical in Spark and DuckDB — so the
    * per-column sums Σx and per-pair sums Σxy, Σx² are EXACT decimal
    * additions (order-free where a raw double sum is not), and the final
    *   r = (n·Σxy − ΣxΣy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
    * runs in double as one fixed IEEE tree over those exact sums,
    * rounded to 12 decimals: the sums' DECIMAL→DOUBLE cast itself is the
    * one step engines disagree on (the JVM converts in a single
    * correctly-rounded step; DuckDB routes through int128 and double-
    * rounds — measured ≤1 ulp apart on the fixture), and r ∈ [−1,1] at
    * 12 decimals is far inside any consumer's tolerance. A constant
    * column → NULL (no variance to correlate), not 0.
    *
    * Rows with a NULL in ANY of `cols` are dropped (listwise deletion) so
    * one n serves every pair — the standard correlation-matrix contract;
    * callers needing pairwise-n run per-pair.
    *
    * Domain limit: values must fit DECIMAL(18,6), i.e. |x| < 10¹² — under
    * ANSI mode a larger magnitude (epoch-micros, raw byte counts) fails
    * the cast and the profile with it. Pre-scale such columns to the
    * unit that matters (seconds, MB) before profiling; correlation is
    * scale-invariant, so the result is unchanged.
    *
    * AGGREGATE limit, enforced loudly: Σx² accumulates in DECIMAL(38,12)
    * (cap ~10²⁶), so beyond the per-value ceiling the data must satisfy
    * n·max(x)² < 10²⁶ — e.g. 10⁸ rows of 10⁹-scale values overflow long
    * before any single value does, and under non-ANSI mode that overflow
    * is a silent NULL corr. A same-pass max(|x|) check raises a
    * descriptive error instead (the cross-term Σab is covered too:
    * n·max|a|·max|b| ≤ max of the two squared bounds).
    *
    * Scale shape: one projection + one global aggregate of
    * |cols| + |cols|·(|cols|+1)/2 decimal sums (all map-side partials,
    * one 1-row reduce); the pair table is assembled driver-free from the
    * single wide row via stack. */
  def correlationPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val clean = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c => col(c).cast(dec).as(c)): _*)
    val pairs = for (i <- cols.indices; j <- i + 1 until cols.size)
      yield (cols(i), cols(j))
    val sums =
      cols.map(c => sum(col(c)).as(s"_s_$c")) ++
        cols.map(c => sum(col(c) * col(c)).as(s"_ss_$c")) ++
        cols.map(c => max(abs(col(c))).cast("double").as(s"_m_$c")) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"_sp_${a}_$b") }
    val wide = clean.agg(count(lit(1)).as("_n"), sums: _*)
    def d(c: String) = col(c).cast("double")
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a', '$b', _s_$a, _s_$b, _ss_$a, _ss_$b, _sp_${a}_$b, _m_$a, _m_$b"
    }.mkString(", ")
    val long = wide.selectExpr("_n",
      s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, sa, sb, ssa, ssb, sab, ma, mb)")
    val varA = d("_n") * d("ssa") - d("sa") * d("sa")
    val varB = d("_n") * d("ssb") - d("sb") * d("sb")
    // n·max(x)² < 10²⁶ keeps every decimal sum exact; fail loudly in
    // both ANSI modes rather than emit an overflow-corrupted corr
    val overflowGuard =
      d("_n") * col("ma") * col("ma") >= 1e26 ||
      d("_n") * col("mb") * col("mb") >= 1e26
    long.select(col("col_a"), col("col_b"), col("_n").as("n"),
      when(overflowGuard, raise_error(concat(
          lit("correlationPairs: n*max(x)^2 >= 1e26 exceeds DECIMAL(38,12) " +
            "sum-of-squares capacity for pair ("),
          col("col_a"), lit(","), col("col_b"),
          lit(") - pre-scale the column"))))
        .when(varA === 0.0 || varB === 0.0, lit(null).cast("double"))
        .otherwise(round((d("_n") * d("sab") - d("sa") * d("sb"))
          / sqrt(varA * varB), 12)).as("corr"))
  }
}

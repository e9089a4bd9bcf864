package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Evaluation / drift metrics for data-quality classifiers and corpus
  * versions — the measurement half of a curation pipeline. Every filter
  * in the curation chain (quality scores, language ID, dedup priorities)
  * is implicitly a classifier; before a threshold ships, its ranking
  * power (AUC), its agreement with existing labels (Cohen's kappa), and
  * the distribution shift it induces (two-sample Kolmogorov–Smirnov)
  * need numbers. All three are computed under the [[graft.queries.Det]]
  * discipline pushed to its limit: EVERY sufficient statistic is an
  * exact integer (tie-aware rank sums doubled to stay integral, CDF
  * differences cross-multiplied instead of divided), and floating point
  * enters only in the single final division — so the results
  * hash-compare exactly against any other engine.
  *
  * Scale shape: each metric aggregates the data down to a bounded
  * intermediate FIRST — (group, distinct score) for AUC, (group,
  * distinct value) for KS, the label×label confusion for kappa, the key
  * frequency table for skew — and runs its windows partitioned by the
  * group key over that reduced table. Nothing windows over raw rows and
  * nothing sorts globally. For continuous scores of unbounded
  * cardinality, pre-bin (see [[TextStats.binnedQuantiles]]'s bin
  * arithmetic); at the fixture's 2-decimal values the distinct table is
  * already thousands of times smaller than the data.
  */
object Eval {

  /** Tie-aware Mann–Whitney AUC of `score` ranking `label`, per group:
    * P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). Rank sums use average
    * ranks for ties, kept integral by working with DOUBLED ranks: a tie
    * block of size c starting after b items has average rank
    * b + (c+1)/2, so 2·rank = 2b + c + 1 — every per-score contribution
    * `pos·(2b + c + 1)` is a long. AUC = (2U)/(2·n⁺·n⁻) with
    * 2U = Σ2ranks⁺ − n⁺(n⁺+1); NULL when a group is single-class.
    *
    * Two exchanges: one groupBy on (group, score), then the group-key
    * window and final rollup share the second. Σ2ranks ≤ 2n² caps group
    * size at ~2 billion rows before long overflow — beyond that, bin the
    * score first (AUC over binned scores is AUC of the binned
    * classifier, the honest quantity at that scale).
    */
  def aucByGroup(df: DataFrame, groupCols: Seq[String], score: Column,
      label: Column): DataFrame = {
    val keys = groupCols.map(col)
    // NULL scores are excluded, not ranked: Spark windows sort NULLS
    // FIRST ascending while DuckDB sorts them LAST — an unguarded null
    // would diverge silently (the radialSimplify lesson). NULL labels
    // are excluded symmetrically — `when(label, 1).otherwise(0)` would
    // silently coerce them to negatives and skew n/n_pos.
    val g = df
      .select(keys :+ score.as("_s") :+
        when(label.isNull, lit(null).cast("long"))
          .when(label, 1L).otherwise(0L).as("_y"): _*)
      .filter(col("_s").isNotNull && col("_y").isNotNull)
      .groupBy(keys :+ col("_s"): _*)
      .agg(count(lit(1)).as("_cnt"), sum("_y").as("_pos"))
    val w = Window.partitionBy(keys: _*).orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum("_cnt").over(w), lit(0L))
    val sums = g
      .withColumn("_c2", col("_pos") * (lit(2L) * cumBefore + col("_cnt") + lit(1L)))
      .groupBy(keys: _*)
      .agg(sum("_cnt").as("n"), sum("_pos").as("n_pos"), sum("_c2").as("_s2"))
    val nNeg = col("n") - col("n_pos")
    val u2 = col("_s2") - col("n_pos") * (col("n_pos") + lit(1L))
    sums
      .withColumn("auc",
        when(col("n_pos") === 0L || nNeg === 0L, lit(null).cast("double"))
          .otherwise(u2.cast("double")
            / (lit(2.0) * (col("n_pos") * nNeg).cast("double"))))
      .select(keys ++ Seq(col("n"), col("n_pos"), col("auc")): _*)
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group:
    * D = max over values of |F_a(v) − F_b(v)|, the standard drift test
    * between two corpus slices' value distributions. The CDF difference
    * is held integral by cross-multiplying: |cumA·nB − cumB·nA| is a
    * long, maxed exactly, divided by nA·nB once at the end. Rows
    * matching neither side are ignored; a group missing one side yields
    * NULL. Output: group keys, n_a, n_b, ks_scaled (the exact integer
    * numerator), ks.
    */
  def ksByGroup(df: DataFrame, groupCols: Seq[String], value: Column,
      sideA: Column, sideB: Column): DataFrame = {
    val keys = groupCols.map(col)
    val g = df
      .select(keys :+ value.as("_v") :+
        when(sideA, 1L).otherwise(0L).as("_a") :+
        when(sideB, 1L).otherwise(0L).as("_b"): _*)
      .filter(col("_a") + col("_b") > 0 && col("_v").isNotNull)
      .groupBy(keys :+ col("_v"): _*)
      .agg(sum("_a").as("_ca"), sum("_b").as("_cb"))
    val run = Window.partitionBy(keys: _*).orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(keys: _*)
    g.withColumn("_cumA", sum("_ca").over(run))
      .withColumn("_cumB", sum("_cb").over(run))
      .withColumn("_nA", sum("_ca").over(tot))
      .withColumn("_nB", sum("_cb").over(tot))
      .withColumn("_d", abs(col("_cumA") * col("_nB") - col("_cumB") * col("_nA")))
      .groupBy(keys: _*)
      .agg(max("_nA").as("n_a"), max("_nB").as("n_b"),
        max("_d").as("ks_scaled"))
      .withColumn("ks",
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("double"))
          .otherwise(col("ks_scaled").cast("double")
            / (col("n_a") * col("n_b")).cast("double")))
      .select(keys ++ Seq(col("n_a"), col("n_b"),
        col("ks_scaled"), col("ks")): _*)
  }

  /** Cohen's kappa between two categorical labelings of the same rows —
    * chance-corrected agreement, e.g. declared metadata vs a
    * classifier's prediction. From the confusion matrix's integers:
    * kappa = (N·agree − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k); both
    * po and pe are also emitted (identical single divisions). NULL when
    * pe = 1 (a degenerate single-label task). One shuffle on the label
    * pair; everything downstream is label-vocabulary-sized.
    */
  def kappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cm = df.select(a.as("_a"), b.as("_b"))
      .groupBy("_a", "_b").agg(count(lit(1)).as("_n"))
    val tot = cm.agg(sum("_n").as("n_total"),
      sum(when(col("_a") === col("_b"), col("_n")).otherwise(0L)).as("n_agree"))
    val rows = cm.groupBy("_a").agg(sum("_n").as("_ra"))
    val cols = cm.groupBy("_b").agg(sum("_n").as("_cb"))
    val prod = rows.join(cols, col("_a") === col("_b"))
      .agg(coalesce(sum(col("_ra") * col("_cb")), lit(0L)).as("sum_prod"))
    val den = col("n_total") * col("n_total") - col("sum_prod")
    tot.crossJoin(prod)
      .select(col("n_total"), col("n_agree"), col("sum_prod"),
        (col("n_agree").cast("double") / col("n_total").cast("double")).as("po"),
        (col("sum_prod").cast("double")
          / (col("n_total") * col("n_total")).cast("double")).as("pe"),
        when(den === 0L, lit(null).cast("double"))
          .otherwise((col("n_total") * col("n_agree") - col("sum_prod"))
            .cast("double") / den.cast("double")).as("kappa"))
  }

  /** Key-skew diagnostic per group: Gini coefficient plus top-1/top-10
    * concentration of the key frequency distribution — the number that
    * decides whether a join on this key needs salting
    * ([[graft.operators.SkewJoin]]) before it falls over. Gini via the
    * rank form G = Σᵢ(2i − n − 1)xᵢ / (n·Σx) over frequencies sorted
    * ascending: the numerator is an exact long (tie order cancels — equal
    * xᵢ make the coefficient sum over a tie block order-free), one
    * division at the end. NULL keys are excluded (they are their own
    * skew problem, visible in [[graft.catalog.Profiler]]). Both windows
    * share the one exchange on the group key; everything runs on the
    * |keys|-sized frequency table, never the raw rows.
    */
  def keySkew(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val freq = df.filter(col(keyCol).isNotNull)
      .groupBy(keys :+ col(keyCol): _*)
      .agg(count(lit(1)).as("_x"))
    val asc = Window.partitionBy(keys: _*).orderBy(col("_x"), col(keyCol))
    val desc = Window.partitionBy(keys: _*)
      .orderBy(col("_x").desc, col(keyCol))
    val i = row_number().over(asc).cast("long")
    val r = row_number().over(desc).cast("long")
    val nk = count(lit(1)).over(Window.partitionBy(keys: _*)).cast("long")
    freq
      .withColumn("_i", i).withColumn("_r", r).withColumn("_nk", nk)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_keys"), sum("_x").as("n_rows"),
        sum((lit(2L) * col("_i") - col("_nk") - lit(1L)) * col("_x")).as("_gnum"),
        sum(when(col("_r") === 1L, col("_x")).otherwise(0L)).as("_top1"),
        sum(when(col("_r") <= 10L, col("_x")).otherwise(0L)).as("_top10"))
      .select(keys ++ Seq(col("n_keys"), col("n_rows"),
        (col("_gnum").cast("double")
          / (col("n_keys") * col("n_rows")).cast("double")).as("gini"),
        (col("_top1").cast("double") / col("n_rows").cast("double")).as("top1_share"),
        (col("_top10").cast("double") / col("n_rows").cast("double")).as("top10_share")): _*)
  }

  /** Chi-square homogeneity drift per group: did the CATEGORY mix of
    * slice A move away from slice B? The categorical complement to
    * [[ksByGroup]] (which tests a numeric distribution) — the standard
    * production drift check for discrete features (event types, language
    * codes, source domains) between a reference and a current window.
    *
    * For a 2×C table with per-category counts (aⱼ, bⱼ), row totals
    * A = Σaⱼ, B = Σbⱼ:
    *   χ² = Σⱼ (aⱼ·B − bⱼ·A)² / (A·B·(aⱼ+bⱼ))
    * (the two expected-count cell terms of category j collapse to this
    * single ratio). Cross-engine determinism: every factor is an exact
    * 64-bit count, so each per-category term is one fixed tree of IEEE
    * multiply/divide — bit-identical in Spark and DuckDB — and the SUM
    * of those doubles is made order-independent by casting each term to
    * DECIMAL(38,12) first (exact decimal addition; the [[Det.moneySum]]
    * convention). Cramér's V = sqrt(χ²/N) for the 2-row table (sqrt is
    * IEEE-exact). Categories with aⱼ+bⱼ = 0 cannot occur (they simply
    * don't group); a group where A = 0 or B = 0 yields NULL χ² (drift
    * against an empty slice is undefined, not zero).
    *
    * One shuffle on (group, category); everything downstream is
    * category-vocabulary-sized per group.
    */
  def chi2ByGroup(df: DataFrame, groupCols: Seq[String], category: Column,
      inA: Column, inB: Column): DataFrame = {
    val keys = groupCols.map(col)
    val cells = df
      .select(keys ++ Seq(category.as("_cat"),
        when(inA, 1L).otherwise(0L).as("_ia"),
        when(inB, 1L).otherwise(0L).as("_ib")): _*)
      .filter(col("_cat").isNotNull && (col("_ia") + col("_ib")) > 0L)
      .groupBy(keys :+ col("_cat"): _*)
      .agg(sum("_ia").as("_a"), sum("_ib").as("_b"))
    val gw = Window.partitionBy(keys: _*)
    val withTot = cells
      .withColumn("_ta", sum("_a").over(gw))
      .withColumn("_tb", sum("_b").over(gw))
    val num = col("_a").cast("double") * col("_tb").cast("double") -
      col("_b").cast("double") * col("_ta").cast("double")
    val den = col("_ta").cast("double") * col("_tb").cast("double") *
      (col("_a") + col("_b")).cast("double")
    val term = when(col("_ta") === 0L || col("_tb") === 0L,
        lit(null).cast(DecimalType(38, 12)))
      .otherwise((num * num / den).cast(DecimalType(38, 12)))
    withTot
      .withColumn("_term", term)
      .groupBy(keys: _*)
      .agg(max("_ta").as("n_a"), max("_tb").as("n_b"),
        count(lit(1)).as("n_cats"),
        sum("_term").cast("double").as("chi2"))
      .select(keys ++ Seq(col("n_a"), col("n_b"), col("n_cats"), col("chi2"),
        sqrt(col("chi2") / (col("n_a") + col("n_b")).cast("double"))
          .as("cramers_v")): _*)
  }

  /** Spearman rank correlation per group — do two quality signals RANK
    * the corpus the same way? The monotonic-agreement complement to
    * [[aucByGroup]] (which needs a boolean label): before a new scorer
    * replaces an old one in a curation chain, ρ against the incumbent
    * says how much of the ordering actually changes.
    *
    * Exactness: ties get textbook average ranks, carried as DOUBLED
    * ranks 2·minrank + tiecount − 1 so they stay integers; the five
    * per-group sums (Σr, Σr², Σrᵣry) accumulate in DECIMAL(38,0) — exact
    * integer arithmetic to Σr² ≤ 4n³ < 10³⁸, i.e. safe past 10¹² rows
    * per group (a long accumulator would silently wrap at ~1.3M rows
    * under non-ANSI mode). The Pearson-on-ranks combination
    *   ρ = (nΣxy − ΣxΣy) / √((nΣx² − Σx²)(nΣy² − Σy²))
    * runs in double as one fixed IEEE tree over those exact longs —
    * bit-identical across engines (the [[chi2ByGroup]] convention). A
    * constant column (zero rank variance) yields NULL, not 0 — "no
    * ordering to agree with" is not "disagrees".
    *
    * Cost: two sort-windows per group (one per signal — the rank step),
    * then one hash aggregation; nothing downstream exceeds group count.
    */

  def spearmanByGroup(df: DataFrame, groupCols: Seq[String],
      x: Column, y: Column): DataFrame = {
    val keys = groupCols.map(col)
    val v = df.select(keys ++ Seq(x.as("_x"), y.as("_y")): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
    val wx = Window.partitionBy(keys: _*).orderBy(col("_x"))
    val wy = Window.partitionBy(keys: _*).orderBy(col("_y"))
    val cx = Window.partitionBy(keys :+ col("_x"): _*)
    val cy = Window.partitionBy(keys :+ col("_y"): _*)
    val ranked = v
      .withColumn("_rx",
        lit(2L) * rank().over(wx).cast("long") + count(lit(1)).over(cx) - 1L)
      .withColumn("_ry",
        lit(2L) * rank().over(wy).cast("long") + count(lit(1)).over(cy) - 1L)
    // operands widen to DECIMAL(19,0) BEFORE the multiply (a long×long
    // product wraps first), products land in DECIMAL(38,0) sums
    val d19 = DecimalType(19, 0)
    val rx = col("_rx").cast(d19)
    val ry = col("_ry").cast(d19)
    val agg = ranked.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(rx).as("_sx"), sum(ry).as("_sy"),
        sum(rx * ry).as("_sxy"),
        sum(rx * rx).as("_sxx"),
        sum(ry * ry).as("_syy"))
    def d(c: String) = col(c).cast("double")
    val varX = d("n") * d("_sxx") - d("_sx") * d("_sx")
    val varY = d("n") * d("_syy") - d("_sy") * d("_sy")
    agg.select(keys ++ Seq(col("n"),
      when(varX === 0.0 || varY === 0.0, lit(null).cast("double"))
        .otherwise((d("n") * d("_sxy") - d("_sx") * d("_sy"))
          / sqrt(varX * varY)).as("rho")): _*)
  }

  /** Benford first-digit conformity audit per group — the classic
    * synthetic-data / fabricated-numbers detector: organically-grown
    * magnitudes (prices, populations, file sizes) follow
    * P(d) = log₁₀(1 + 1/d); generated or tampered columns usually don't.
    * In a training-data pipeline this is the cheap screen for synthetic
    * numeric fields and copy-paste inflation before the data teaches a
    * model those artifacts.
    *
    * Determinism: the nine Benford probabilities are shortest-roundtrip
    * DOUBLE LITERALS (identical parse in any IEEE engine — no log10()
    * call, which would not hash-verify); the first digit comes from the
    * decimal rendering of floor(|x|) as an INTEGER (integer→string is
    * engine-stable where double→string is not), rows with |x| < 1
    * excluded. Domain ceiling: |x| must fit a long (< 2⁶³ ≈ 9.2·10¹⁸) —
    * the integer route is what keeps the digit engine-stable, so for
    * wider magnitudes pre-scale the column (divide by a power of TEN,
    * which preserves every first digit) rather than extracting from the
    * double's rendering. Observed shares are exact int/int divisions and the
    * deviation |share − p| is one fixed IEEE tree. The report is DENSE:
    * all 9 digits appear per group (a digit that never occurs is share
    * 0, the loudest possible deviation — it must not vanish from the
    * report), via a broadcast 9-row digit table.
    *
    * One shuffle on (group, digit); everything downstream is 9 rows per
    * group. */
  def benfordAudit(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    val keys = groupCols.map(col)
    val digit = substring(floor(abs(value)).cast("long").cast("string"), 1, 1)
    val counts = df
      .filter(value.isNotNull && abs(value) >= 1.0)
      .select(keys :+ digit.as("_digit"): _*)
      .groupBy(keys :+ col("_digit"): _*)
      .agg(count(lit(1)).as("_obs"))
    val totals = counts.groupBy(keys: _*).agg(sum("_obs").as("n_total"))
    val digits = broadcast(
      counts.sparkSession.range(1, 10).select(col("id").cast("string").as("_digit")))
    val p = BenfordP.foldLeft(lit(null).cast("double")) { case (acc, (d, pd)) =>
      when(col("_digit") === d.toString, lit(pd)).otherwise(acc)
    }
    totals.crossJoin(digits)
      .join(counts, (groupCols :+ "_digit").toSeq, "left")
      .na.fill(0L, Seq("_obs"))
      .withColumn("obs_share",
        col("_obs").cast("double") / col("n_total").cast("double"))
      .withColumn("benford_p", p)
      .select(keys ++ Seq(col("_digit").as("digit"), col("_obs").as("n_obs"),
        col("n_total"), col("obs_share"), col("benford_p"),
        abs(col("obs_share") - col("benford_p")).as("abs_dev")): _*)
  }

  /** log₁₀(1 + 1/d) for d = 1..9 as shortest-roundtrip literals. */
  private val BenfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
    3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
    5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
    9 -> 0.04575749056067514)

  /** Welch's two-sample t statistic per group — the MEAN-SHIFT member of
    * the drift triad ([[ksByGroup]] tests distribution shape,
    * [[chi2ByGroup]] the category mix; this is the parametric "did the
    * average move, and by how many standard errors" that pages someone).
    * Unequal variances assumed (Welch, not pooled Student); the
    * Welch–Satterthwaite degrees of freedom are emitted beside t so a
    * consumer can threshold properly.
    *
    * Exactness ([[graft.catalog.Profiler.correlationPairs]] convention):
    * per-slice Σx and Σx² are exact DECIMAL(18,6)-based sums (values
    * must fit — |x| < 10¹²; pre-scale wider columns), the mean/variance/
    * t/dof combination is one fixed IEEE tree over those sums, and t and
    * dof are rounded to 12 decimals because the decimal→double cast is
    * the one step engines disagree on (measured 1 ulp). NULL when either
    * slice has n < 2 or both sample variances are 0 (no spread to test
    * against — "infinitely significant" is not a number).
    *
    * AGGREGATE bound, enforced loudly: Σx² accumulates in DECIMAL(38,12)
    * (cap ~10²⁶), so beyond the per-value limit a group must satisfy
    * n·max(x)² < 10²⁶ — e.g. 10⁸ rows of 10⁹-scale values overflow far
    * below the 10¹² per-value ceiling, and under non-ANSI mode that
    * overflow is a silent NULL. A same-pass max(|x|) check raises a
    * descriptive error instead of corrupting t.
    *
    * One shuffle on the group key; everything downstream is
    * group-count-sized. */
  def welchTByGroup(df: DataFrame, groupCols: Seq[String], value: Column,
      inA: Column, inB: Column): DataFrame = {
    val keys = groupCols.map(col)
    val dec = DecimalType(18, 6)
    val v = value.cast(dec)
    val rows = df
      .select(keys ++ Seq(v.as("_v"),
        when(inA, 1L).otherwise(0L).as("_ia"),
        when(inB, 1L).otherwise(0L).as("_ib")): _*)
      .filter(col("_v").isNotNull && (col("_ia") + col("_ib")) > 0L)
    val agg = rows.groupBy(keys: _*)
      .agg(sum("_ia").as("n_a"), sum("_ib").as("n_b"),
        sum(when(col("_ia") === 1L, col("_v"))).as("_sa"),
        sum(when(col("_ib") === 1L, col("_v"))).as("_sb"),
        sum(when(col("_ia") === 1L, col("_v") * col("_v"))).as("_ssa"),
        sum(when(col("_ib") === 1L, col("_v") * col("_v"))).as("_ssb"),
        max(when(col("_ia") === 1L, abs(col("_v")))).cast("double").as("_ma"),
        max(when(col("_ib") === 1L, abs(col("_v")))).cast("double").as("_mb"))
    def d(c: String) = col(c).cast("double")
    // n·max(x)² < 10²⁶ keeps Σx² inside DECIMAL(38,12); fail loudly
    // (both ANSI modes) instead of letting the sum go NULL/overflow.
    // Bounded PER GROUP (each sum only sees its own group's rows) — a
    // combined n_a+n_b × max-over-both bound raised on data whose
    // per-group sums were actually in range.
    val overflowGuard =
      (d("n_a") * col("_ma") * col("_ma") >= 1e26) ||
      (d("n_b") * col("_mb") * col("_mb") >= 1e26)
    val meanA = d("_sa") / d("n_a")
    val meanB = d("_sb") / d("n_b")
    // sample variance s² = (nΣx² − (Σx)²) / (n(n−1)), exact-sum inputs
    val varA = (d("n_a") * d("_ssa") - d("_sa") * d("_sa")) /
      (d("n_a") * (d("n_a") - 1.0))
    val varB = (d("n_b") * d("_ssb") - d("_sb") * d("_sb")) /
      (d("n_b") * (d("n_b") - 1.0))
    val a = varA / d("n_a")
    val b = varB / d("n_b")
    val degenerate = col("n_a") < 2L || col("n_b") < 2L ||
      (varA === 0.0 && varB === 0.0)
    agg.select(keys ++ Seq(col("n_a"), col("n_b"),
      when(col("n_a") === 0L, lit(null).cast("double"))
        .otherwise(meanA).as("mean_a"),
      when(col("n_b") === 0L, lit(null).cast("double"))
        .otherwise(meanB).as("mean_b"),
      when(overflowGuard, raise_error(lit(
          "welchTByGroup: n*max(x)^2 >= 1e26 exceeds the DECIMAL(38,12) " +
          "sum-of-squares capacity - pre-scale the value column")))
        .when(degenerate, lit(null).cast("double"))
        .otherwise(round((meanA - meanB) / sqrt(a + b), 12)).as("t"),
      // guard attached here TOO: a consumer selecting only dof (Catalyst
      // prunes the t column and its when-chain away) must still fail
      // loudly on an overflowed sum rather than read a silent NULL
      when(overflowGuard, raise_error(lit(
          "welchTByGroup: n*max(x)^2 >= 1e26 exceeds the DECIMAL(38,12) " +
          "sum-of-squares capacity - pre-scale the value column")))
        .when(degenerate, lit(null).cast("double"))
        .otherwise(round((a + b) * (a + b) /
          (a * a / (d("n_a") - 1.0) + b * b / (d("n_b") - 1.0)), 12))
        .as("dof")): _*)
  }

  /** Rank (quantile) normalization of a score within its group: the
    * tie-average rank mapped to (0, 1) — pct = (2·minrank + c − 1)/(2n),
    * exactly the DOUBLED average rank over 2n, so the numerator is an
    * integer and the single division replays cross-engine. The
    * score-blending primitive: heterogeneous signals (an LM score, a
    * length prior, a link score) become comparable by replacing each
    * value with its within-group quantile before any weighted sum —
    * rank-based, so immune to each signal's scale and outliers.
    * NULL scores are dropped (they have no rank), and the output keeps
    * every surviving input row with its `pct` appended.
    *
    * Cost: one sort-window per group (the rank) sharing its exchange
    * with the tie-count window — nothing exceeds the input size. */
  def rankNormalize(df: DataFrame, groupCols: Seq[String],
      score: Column): DataFrame = {
    val keys = groupCols.map(col)
    val withS = df.filter(score.isNotNull).withColumn("_s", score)
    val w = Window.partitionBy(keys: _*).orderBy(col("_s"))
    val cw = Window.partitionBy(keys :+ col("_s"): _*)
    val tot = Window.partitionBy(keys: _*)
    withS
      .withColumn("_r2",
        lit(2L) * rank().over(w).cast("long") + count(lit(1)).over(cw) - 1L)
      .withColumn("_n", count(lit(1)).over(tot))
      .withColumn("pct",
        col("_r2").cast("double") / (lit(2L) * col("_n")).cast("double"))
      .drop("_s", "_r2", "_n")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.llmops.{Eval, TextStats}

/** Evaluation / drift metrics (see [[graft.llmops.Eval]]): AUC of a
  * quality signal, two-sample KS drift between corpus slices, Cohen's
  * kappa between a label column and a classifier, and the key-skew
  * (Gini / top-k concentration) diagnostic that decides when a join key
  * needs [[graft.operators.SkewJoin]]. Every metric is integer-exact up
  * to one final division, so all four hash-compare against DuckDB.
  */
object EvalQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // Tie-aware Mann–Whitney AUC per source: how well does raw document
    // length rank English documents? (The eval a length-based quality
    // filter gets before its threshold ships.) n_chars has heavy ties —
    // the doubled-rank tie handling is load-bearing, not decorative.
    ("q_auc",
      (s: SparkSession, d: String) => {
        Eval.aucByGroup(Tables.documents(s, d), Seq("source"),
            col("n_chars"), col("lang") === "en")
          .orderBy("source")
      },
      Some("""WITH g AS (
             |  SELECT source, n_chars AS s, CAST(COUNT(*) AS BIGINT) AS cnt,
             |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
             |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
             |  GROUP BY source, n_chars),
             |c AS (
             |  SELECT *, COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
             |  FROM g),
             |a AS (
             |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n,
             |    CAST(SUM(pos) AS BIGINT) AS n_pos,
             |    CAST(SUM(pos * (2 * cumb + cnt + 1)) AS BIGINT) AS s2
             |  FROM c GROUP BY source)
             |SELECT source, n, n_pos,
             |  CASE WHEN n_pos = 0 OR n - n_pos = 0 THEN NULL
             |       ELSE CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
             |            / (2.0 * CAST(n_pos * (n - n_pos) AS DOUBLE)) END AS auc
             |FROM a ORDER BY source""".stripMargin)),

    // Two-sample KS drift per day: did the click-value distribution move
    // away from the view-value distribution? The exact integer numerator
    // (ks_scaled) is emitted next to the statistic — cross-multiplied
    // CDFs, one division.
    ("q_ks_drift",
      (s: SparkSession, d: String) => {
        Eval.ksByGroup(
            Tables.events(s, d)
              .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
            Seq("day"), col("value"),
            col("event_type") === "click", col("event_type") === "view")
          .orderBy("day")
      },
      Some("""WITH e AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day, value,
             |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
             |  FROM events),
             |g AS (
             |  SELECT day, value, CAST(SUM(a) AS BIGINT) AS ca,
             |    CAST(SUM(b) AS BIGINT) AS cb
             |  FROM e WHERE a + b > 0 AND value IS NOT NULL
             |  GROUP BY day, value),
             |c AS (
             |  SELECT day,
             |    SUM(ca) OVER (PARTITION BY day ORDER BY value
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
             |    SUM(cb) OVER (PARTITION BY day ORDER BY value
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB,
             |    SUM(ca) OVER (PARTITION BY day) AS nA,
             |    SUM(cb) OVER (PARTITION BY day) AS nB
             |  FROM g),
             |a AS (
             |  SELECT day, CAST(MAX(nA) AS BIGINT) AS n_a,
             |    CAST(MAX(nB) AS BIGINT) AS n_b,
             |    CAST(MAX(ABS(cumA * nB - cumB * nA)) AS BIGINT) AS ks_scaled
             |  FROM c GROUP BY day)
             |SELECT day, n_a, n_b, ks_scaled,
             |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
             |       ELSE CAST(ks_scaled AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) END AS ks
             |FROM a ORDER BY day""".stripMargin)),

    // Cohen's kappa between the declared lang column and the marker
    // lang-ID classifier (q_lang_id's predictor) — chance-corrected
    // agreement, the honest version of "the classifier is 97% right"
    // on a label distribution this lopsided.
    ("q_kappa_langid",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        Eval.kappa(docs, col("lang"),
          TextStats.predictedLang(col("text"), LlmQueries.LangProfiles))
      },
      Some {
        val profs = LlmQueries.LangProfiles.toSeq.sortBy(_._1)
        val scoreExprs = profs.map { case (l, ws) =>
          val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
          s"CAST(len(list_filter(list_distinct(toks), x -> list_contains($list, x))) AS INT) AS s_$l"
        }.mkString(",\n    ")
        val langs = profs.map(_._1)
        val m = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
        val pick = langs.map(l => s"WHEN s_$l = $m THEN '$l'").mkString(" ")
        s"""WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
           |sc AS (SELECT lang, $scoreExprs FROM t),
           |p AS (SELECT lang AS a, CASE $pick END AS b FROM sc),
           |cm AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY a, b),
           |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           |  CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT) AS n_agree FROM cm),
           |r AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ra FROM cm GROUP BY a),
           |c AS (SELECT b, CAST(SUM(n) AS BIGINT) AS cb FROM cm GROUP BY b),
           |pr AS (SELECT CAST(COALESCE(SUM(ra * cb), 0) AS BIGINT) AS sum_prod
           |  FROM r JOIN c ON a = b)
           |SELECT n_total, n_agree, sum_prod,
           |  CAST(n_agree AS DOUBLE) / CAST(n_total AS DOUBLE) AS po,
           |  CAST(sum_prod AS DOUBLE) / CAST(n_total * n_total AS DOUBLE) AS pe,
           |  CASE WHEN n_total * n_total - sum_prod = 0 THEN NULL
           |       ELSE CAST(n_total * n_agree - sum_prod AS DOUBLE)
           |            / CAST(n_total * n_total - sum_prod AS DOUBLE) END AS kappa
           |FROM tot, pr""".stripMargin
      }),

    // Key-skew diagnostic: Gini + top-1/top-10 concentration of user_id
    // per event_type — the pre-join report that decides whether the key
    // needs salting. Runs on the |keys|-sized frequency table only.
    ("q_key_skew",
      (s: SparkSession, d: String) => {
        Eval.keySkew(Tables.events(s, d), Seq("event_type"), "user_id")
          .orderBy("event_type")
      },
      Some("""WITH f AS (
             |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
             |  FROM events WHERE user_id IS NOT NULL GROUP BY event_type, user_id),
             |w AS (
             |  SELECT event_type, x,
             |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY x, user_id) AS BIGINT) AS i,
             |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY x DESC, user_id) AS BIGINT) AS r,
             |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nk
             |  FROM f),
             |a AS (
             |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_keys,
             |    CAST(SUM(x) AS BIGINT) AS n_rows,
             |    CAST(SUM((2 * i - nk - 1) * x) AS BIGINT) AS gnum,
             |    CAST(SUM(CASE WHEN r = 1 THEN x ELSE 0 END) AS BIGINT) AS top1,
             |    CAST(SUM(CASE WHEN r <= 10 THEN x ELSE 0 END) AS BIGINT) AS top10
             |  FROM w GROUP BY event_type)
             |SELECT event_type, n_keys, n_rows,
             |  CAST(gnum AS DOUBLE) / CAST(n_keys * n_rows AS DOUBLE) AS gini,
             |  CAST(top1 AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top1_share,
             |  CAST(top10 AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top10_share
             |FROM a ORDER BY event_type""".stripMargin)),

    // Chi-square homogeneity drift per day: did the EVENT-TYPE mix shift
    // between the morning (hour < 12) and afternoon slices? The
    // categorical complement to q_ks_drift's numeric two-sample test.
    // Per-category terms are fixed IEEE expression trees over exact
    // counts, decimal-summed (order-free), one sqrt for Cramér's V.
    ("q_chi2_drift",
      (s: SparkSession, d: String) => {
        Eval.chi2ByGroup(
            Tables.events(s, d)
              .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
            Seq("day"), col("event_type"),
            hour(col("ts")) < 12, hour(col("ts")) >= 12)
          .orderBy("day")
      },
      Some("""WITH e AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS cat,
             |    CASE WHEN hour(ts) < 12 THEN 1 ELSE 0 END AS ia,
             |    CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END AS ib
             |  FROM events),
             |c AS (
             |  SELECT day, cat, CAST(SUM(ia) AS BIGINT) AS a,
             |    CAST(SUM(ib) AS BIGINT) AS b
             |  FROM e WHERE cat IS NOT NULL AND ia + ib > 0 GROUP BY day, cat),
             |t AS (
             |  SELECT *, CAST(SUM(a) OVER (PARTITION BY day) AS BIGINT) AS ta,
             |    CAST(SUM(b) OVER (PARTITION BY day) AS BIGINT) AS tb
             |  FROM c),
             |m AS (
             |  SELECT day, ta, tb,
             |    CASE WHEN ta = 0 OR tb = 0 THEN NULL
             |         ELSE CAST(
             |      (CAST(a AS DOUBLE) * CAST(tb AS DOUBLE)
             |        - CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))
             |      * (CAST(a AS DOUBLE) * CAST(tb AS DOUBLE)
             |        - CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))
             |      / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
             |        * CAST(a + b AS DOUBLE)) AS DECIMAL(38,12)) END AS term
             |  FROM t),
             |agg AS (
             |  SELECT day, CAST(MAX(ta) AS BIGINT) AS n_a,
             |    CAST(MAX(tb) AS BIGINT) AS n_b,
             |    CAST(COUNT(*) AS BIGINT) AS n_cats,
             |    CAST(SUM(term) AS DOUBLE) AS chi2
             |  FROM m GROUP BY day)
             |SELECT day, n_a, n_b, n_cats, chi2,
             |  sqrt(chi2 / CAST(n_a + n_b AS DOUBLE)) AS cramers_v
             |FROM agg ORDER BY day""".stripMargin)),

    // Spearman rank correlation per language: does raw character length
    // rank documents the same way whitespace token count does? (The
    // check run before one cheap quality proxy substitutes for another.)
    // Tie-average ranks carried as exact doubled-rank longs; one fixed
    // IEEE tree at the end — hash-exact.
    ("q_spearman",
      (s: SparkSession, d: String) => {
        // NULL lang dropped to match the oracle's WHERE (spearmanByGroup
        // itself filters only the two measures, so a NULL group key
        // would otherwise survive on the Spark side alone)
        Eval.spearmanByGroup(
            Tables.documents(s, d)
              .filter(col("lang").isNotNull)
              .withColumn("n_tokens",
                size(TextStats.tokens(col("text"))).cast("long")),
            Seq("lang"), col("n_chars"), col("n_tokens"))
          .orderBy("lang")
      },
      Some("""WITH v AS (
             |  SELECT lang, n_chars AS x,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
             |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
             |    AND text IS NOT NULL),
             |r AS (
             |  SELECT lang,
             |    CAST(2 * rank() OVER (PARTITION BY lang ORDER BY x)
             |      + count(*) OVER (PARTITION BY lang, x) - 1 AS BIGINT) AS rx,
             |    CAST(2 * rank() OVER (PARTITION BY lang ORDER BY y)
             |      + count(*) OVER (PARTITION BY lang, y) - 1 AS BIGINT) AS ry
             |  FROM v),
             |a AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
             |    CAST(SUM(rx * ry) AS BIGINT) AS sxy,
             |    CAST(SUM(rx * rx) AS BIGINT) AS sxx,
             |    CAST(SUM(ry * ry) AS BIGINT) AS syy
             |  FROM r GROUP BY lang)
             |SELECT lang, n,
             |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
             |         OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0 THEN NULL
             |       ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS rho
             |FROM a ORDER BY lang""".stripMargin)),

    // Welch's t per day between click and view values — the MEAN-SHIFT
    // member of the drift triad next to q_ks_drift (shape) and
    // q_chi2_drift (category mix), with the Welch–Satterthwaite dof
    // beside the statistic. Exact decimal sums; one fixed IEEE tree;
    // t/dof rounded to 12 decimals (the decimal→double cast rule).
    ("q_welch_t",
      (s: SparkSession, d: String) => {
        Eval.welchTByGroup(
            Tables.events(s, d)
              .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
            Seq("day"), col("value"),
            col("event_type") === "click", col("event_type") === "view")
          .orderBy("day")
      },
      Some {
        val mA = "CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)"
        val mB = "CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE)"
        val vA = "(CAST(n_a AS DOUBLE) * CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))"
        val vB = "(CAST(n_b AS DOUBLE) * CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))"
        val a = s"($vA) / CAST(n_a AS DOUBLE)"
        val b = s"($vB) / CAST(n_b AS DOUBLE)"
        val degen = s"n_a < 2 OR n_b < 2 OR (($vA) = 0 AND ($vB) = 0)"
        s"""WITH e AS (
           |  SELECT strftime(ts, '%Y-%m-%d') AS day,
           |    CAST(value AS DECIMAL(18,6)) AS v,
           |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
           |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
           |  FROM events),
           |f AS (SELECT * FROM e WHERE v IS NOT NULL AND ia + ib > 0),
           |agg AS (
           |  SELECT day, CAST(SUM(ia) AS BIGINT) AS n_a,
           |    CAST(SUM(ib) AS BIGINT) AS n_b,
           |    SUM(CASE WHEN ia = 1 THEN v END) AS sa,
           |    SUM(CASE WHEN ib = 1 THEN v END) AS sb,
           |    SUM(CASE WHEN ia = 1 THEN CAST(v AS DECIMAL(19,6)) * v END) AS ssa,
           |    SUM(CASE WHEN ib = 1 THEN CAST(v AS DECIMAL(19,6)) * v END) AS ssb
           |  FROM f GROUP BY day)
           |SELECT day, n_a, n_b,
           |  CASE WHEN n_a = 0 THEN NULL ELSE $mA END AS mean_a,
           |  CASE WHEN n_b = 0 THEN NULL ELSE $mB END AS mean_b,
           |  CASE WHEN $degen THEN NULL
           |       ELSE round((($mA) - ($mB)) / sqrt(($a) + ($b)), 12) END AS t,
           |  CASE WHEN $degen THEN NULL
           |       ELSE round((($a) + ($b)) * (($a) + ($b))
           |         / (($a) * ($a) / (CAST(n_a AS DOUBLE) - 1.0)
           |          + ($b) * ($b) / (CAST(n_b AS DOUBLE) - 1.0)), 12) END AS dof
           |FROM agg ORDER BY day""".stripMargin
      }),

    // Rank normalization of document length within each language — the
    // score-blending primitive: a value becomes its within-group
    // quantile (tie-average rank over 2n, integer numerator) so
    // heterogeneous signals can be summed. Every surviving row keeps its
    // identity columns.
    ("q_rank_normalize",
      (s: SparkSession, d: String) => {
        Eval.rankNormalize(
            Tables.documents(s, d)
              .filter(col("lang").isNotNull)
              .select("doc_id", "lang", "n_chars"),
            Seq("lang"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH v AS (
             |  SELECT doc_id, lang, n_chars FROM documents
             |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
             |r AS (
             |  SELECT *,
             |    CAST(2 * rank() OVER (PARTITION BY lang ORDER BY n_chars)
             |      + count(*) OVER (PARTITION BY lang, n_chars) - 1 AS BIGINT) AS r2,
             |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
             |  FROM v)
             |SELECT doc_id, lang, n_chars,
             |  CAST(r2 AS DOUBLE) / CAST(2 * n AS DOUBLE) AS pct
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Benford first-digit conformity per return flag — the synthetic-
    // numbers screen (organically-grown magnitudes follow log₁₀(1+1/d);
    // generated columns usually don't). The nine probabilities are
    // shortest-roundtrip double LITERALS (no log10() call — libm does
    // not hash-verify); digits come from integer rendering; the report
    // is dense so a never-occurring digit reads as deviation, not
    // absence.
    ("q_benford",
      (s: SparkSession, d: String) => {
        Eval.benfordAudit(Tables.lineitem(s, d), Seq("l_returnflag"),
            col("l_extendedprice"))
          .orderBy("l_returnflag", "digit")
      },
      Some("""WITH v AS (
             |  SELECT l_returnflag AS g,
             |    CAST(floor(abs(l_extendedprice)) AS BIGINT) AS iv
             |  FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND abs(l_extendedprice) >= 1.0),
             |c AS (
             |  SELECT g, substring(CAST(iv AS VARCHAR), 1, 1) AS digit,
             |    CAST(count(*) AS BIGINT) AS n_obs
             |  FROM v GROUP BY g, digit),
             |t AS (SELECT g, CAST(SUM(n_obs) AS BIGINT) AS n_total FROM c GROUP BY g),
             |dg AS (
             |  SELECT CAST(x AS VARCHAR) AS digit,
             |    CASE x WHEN 1 THEN CAST(0.3010299956639812 AS DOUBLE)
             |           WHEN 2 THEN CAST(0.17609125905568124 AS DOUBLE)
             |           WHEN 3 THEN CAST(0.12493873660829992 AS DOUBLE)
             |           WHEN 4 THEN CAST(0.09691001300805642 AS DOUBLE)
             |           WHEN 5 THEN CAST(0.07918124604762482 AS DOUBLE)
             |           WHEN 6 THEN CAST(0.06694678963061322 AS DOUBLE)
             |           WHEN 7 THEN CAST(0.05799194697768673 AS DOUBLE)
             |           WHEN 8 THEN CAST(0.05115252244738129 AS DOUBLE)
             |           ELSE CAST(0.04575749056067514 AS DOUBLE) END AS p
             |  FROM range(1, 10) r(x)),
             |j AS (
             |  SELECT t.g, dg.digit, COALESCE(c.n_obs, 0) AS n_obs,
             |    t.n_total, dg.p
             |  FROM t CROSS JOIN dg
             |  LEFT JOIN c ON c.g = t.g AND c.digit = dg.digit)
             |SELECT g AS l_returnflag, digit, n_obs, n_total,
             |  CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS obs_share,
             |  p AS benford_p,
             |  abs(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) - p) AS abs_dev
             |FROM j ORDER BY l_returnflag, digit""".stripMargin))
  )
}

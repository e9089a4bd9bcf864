package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.functions.{Hll, Regression, UrlFunctions}
import graft.llmops.Privacy
import graft.operators.RangeJoin

/** Corpus-governance operators: URL identity (canonicalize / dedup),
  * interval-overlap join, k-anonymity suppression, and the replayable
  * HLL distinct sketch. URLs are synthesized deterministically from
  * doc_id (the fixture has no URL column) so that the variant families
  * exercise every canonicalization rule — case, www, default port,
  * tracking params, param order, trailing slash, fragments, ccTLD
  * registered domains — and genuinely collide post-canonicalization.
  */
object CurationQueries extends QueryFamily {

  /** 4 URL spellings per article (base = doc_id div 4): variants 0/1
    * canonicalize identically, 2 differs only by dropped query, 3 is a
    * co.uk blog exercising the registered-domain ladder. */
  private def syntheticUrl(s: SparkSession): org.apache.spark.sql.Column = {
    val base = expr("doc_id div 4").cast("string")
    val hostCore = concat(lit("h"), expr("(doc_id div 4) % 50").cast("string"))
    when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit("https://www."), hostCore, lit("-News.COM/articles/"), base,
          lit("?utm_source=feed&b=2&a=1")))
      .when(pmod(col("doc_id"), lit(4)) === 1,
        concat(lit("HTTPS://"), hostCore, lit("-news.com:443/articles/"), base,
          lit("?a=1&b=2&fbclid=x")))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        concat(lit("https://"), hostCore, lit("-news.com/articles/"), base, lit("/")))
      .otherwise(
        concat(lit("http://Blogs."), hostCore, lit(".co.uk/post/"),
          col("doc_id").cast("string"), lit("#frag")))
  }

  /** The same synthesis in DuckDB SQL. */
  private val urlSqlCte =
    """u AS (
      |  SELECT doc_id,
      |    CASE doc_id % 4
      |      WHEN 0 THEN 'https://www.h' || CAST((doc_id//4) % 50 AS VARCHAR) || '-News.COM/articles/' || CAST(doc_id//4 AS VARCHAR) || '?utm_source=feed&b=2&a=1'
      |      WHEN 1 THEN 'HTTPS://h' || CAST((doc_id//4) % 50 AS VARCHAR) || '-news.com:443/articles/' || CAST(doc_id//4 AS VARCHAR) || '?a=1&b=2&fbclid=x'
      |      WHEN 2 THEN 'https://h' || CAST((doc_id//4) % 50 AS VARCHAR) || '-news.com/articles/' || CAST(doc_id//4 AS VARCHAR) || '/'
      |      ELSE 'http://Blogs.h' || CAST((doc_id//4) % 50 AS VARCHAR) || '.co.uk/post/' || CAST(doc_id AS VARCHAR) || '#frag'
      |    END AS url
      |  FROM documents),
      |parts AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(regexp_replace(
      |      lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
      |      ':[0-9]+$', ''), '^www\.', '') AS host,
      |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
      |    regexp_extract(url, '\?([^#]*)', 1) AS rawq
      |  FROM u),
      |canon AS (
      |  SELECT doc_id, url, host,
      |    scheme || '://' || host ||
      |    CASE WHEN rawpath = '' OR rawpath = '/' THEN '/' ELSE regexp_replace(rawpath, '/$', '') END ||
      |    CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url
      |  FROM (
      |    SELECT *, COALESCE(array_to_string(list_sort(list_filter(string_split(rawq, '&'),
      |        p -> len(p) > 0 AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid|ref)='))), '&'), '') AS q
      |    FROM parts)),
      |dom AS (
      |  SELECT *, string_split(host, '.') AS ls, len(string_split(host, '.')) AS nl
      |  FROM canon),
      |withdom AS (
      |  SELECT doc_id, url, host, canonical_url,
      |    CASE WHEN nl < 2 THEN host
      |         WHEN len(ls[-1]) = 2 AND ls[-2] IN ('co','com','ac','gov','org','net','edu') AND nl >= 3
      |           THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
      |         ELSE ls[-2] || '.' || ls[-1] END AS domain
      |  FROM dom)""".stripMargin

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // URL canonicalization + registered domain — pure map-side column
    // expressions (UrlFunctions), one per crawl record at 100 TB.
    ("q_url_normalize",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d).withColumn("url", syntheticUrl(s))
        docs.select(col("doc_id"), col("url"),
            UrlFunctions.canonicalizeUrl(col("url")).as("canonical_url"),
            UrlFunctions.host(col("url")).as("host"),
            UrlFunctions.registeredDomain(UrlFunctions.host(col("url"))).as("domain"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $urlSqlCte
             |SELECT doc_id, url, canonical_url, host, domain
             |FROM withdom ORDER BY doc_id""".stripMargin)),

    // URL-level dedup: one keeper (min doc_id) per canonical URL + the
    // duplicate multiplicity — the C4/CCNet first dedup stage. The
    // canonical key is computed map-side; the group is one hash shuffle.
    ("q_url_dedup",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d).withColumn("url", syntheticUrl(s))
        docs.select(UrlFunctions.canonicalizeUrl(col("url")).as("canonical_url"),
            col("doc_id"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keeper_doc"))
          .orderBy("canonical_url")
      },
      Some(s"""WITH $urlSqlCte
             |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_dups,
             |  min(doc_id) AS keeper_doc
             |FROM withdom GROUP BY canonical_url ORDER BY canonical_url""".stripMargin)),

    // Interval×interval overlap join, bucketed (RangeJoin.overlapJoin):
    // click windows [v, v+2] × view windows [v, v+1.5]; per-click
    // overlap count. The canonical-cell emission makes the bucketed form
    // exactly-once without a distinct — the oracle's plain theta join
    // would expose any double-emission as an inflated count.
    ("q_interval_overlap",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("value").as("c_lo"),
            (col("value") + 2.0).as("c_hi"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("value").as("v_lo"),
            (col("value") + 1.5).as("v_hi"))
        RangeJoin.overlapJoin(clicks, views,
            lLo = "c_lo", lHi = "c_hi", rLo = "v_lo", rHi = "v_hi",
            cellWidth = 4.0)
          .groupBy("click_id")
          .agg(count(lit(1)).as("n_overlaps"), min("view_id").as("first_view"))
          .orderBy("click_id")
      },
      Some("""WITH c AS (
             |  SELECT event_id AS click_id, value AS lo, value + 2.0 AS hi
             |  FROM events WHERE event_type = 'click'),
             |v AS (
             |  SELECT event_id AS view_id, value AS lo, value + 1.5 AS hi
             |  FROM events WHERE event_type = 'view')
             |SELECT c.click_id, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
             |  min(v.view_id) AS first_view
             |FROM c JOIN v ON c.lo <= v.hi AND v.lo <= c.hi
             |GROUP BY c.click_id ORDER BY c.click_id""".stripMargin)),

    // k-anonymity suppression over (c_mktsegment, c_nationkey): groups
    // smaller than k=7 released as '*'. groupBy-count + null-safe join
    // back (map-side partial agg; no hot-combination window buffering).
    ("q_k_anonymity",
      (s: SparkSession, d: String) => {
        Privacy.kAnonymize(
            Tables.customer(s, d).select("c_custkey", "c_mktsegment", "c_nationkey"),
            quasiCols = Seq("c_mktsegment", "c_nationkey"), k = 7)
          .orderBy("c_custkey")
      },
      Some("""WITH g AS (
             |  SELECT c_mktsegment AS s, c_nationkey AS n, COUNT(*) AS gs
             |  FROM customer GROUP BY 1, 2)
             |SELECT c_custkey,
             |  CASE WHEN gs < 7 THEN '*' ELSE c_mktsegment END AS c_mktsegment,
             |  CASE WHEN gs < 7 THEN '*' ELSE CAST(c_nationkey AS VARCHAR) END AS c_nationkey
             |FROM customer JOIN g ON c_mktsegment = g.s AND c_nationkey = g.n
             |ORDER BY c_custkey""".stripMargin)),

    // Randomized response (Warner): the overdrawn flag is flipped per-row
    // with P = 1/4 by the md5 coin, released, then the true per-segment
    // count re-estimated from the noisy release — t̂ = (1000r − 250n)/500,
    // integer numerator, one int→double division. n_true joins back in
    // ONLY as the audit column showing the estimator lands near truth;
    // the released frame itself never carries the true flag.
    ("q_randomized_response",
      (s: SparkSession, d: String) => {
        val cust = Tables.customer(s, d).select(col("c_custkey"),
          col("c_mktsegment"), (col("c_acctbal") < 0).as("overdrawn"))
        val released = Privacy.randomizedResponse(cust, "c_custkey", "overdrawn")
        val est = Privacy.rrEstimate(released, Seq("c_mktsegment"))
        val truth = cust.groupBy("c_mktsegment")
          .agg(sum(when(col("overdrawn"), 1L).otherwise(0L)).as("n_true"))
        est.join(truth, Seq("c_mktsegment")).orderBy("c_mktsegment")
      },
      Some("""WITH f AS (
             |  SELECT c_mktsegment, (c_acctbal < 0) AS flag,
             |    CASE WHEN CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),1,15)) AS BIGINT) % 1000 < 750
             |         THEN (c_acctbal < 0) ELSE NOT (c_acctbal < 0) END AS reported
             |  FROM customer)
             |SELECT c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN reported THEN 1 ELSE 0 END) AS BIGINT) AS n_reported,
             |  CAST(1000 * sum(CASE WHEN reported THEN 1 ELSE 0 END)
             |       - 250 * count(*) AS DOUBLE) / 500.0 AS est_true,
             |  CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_true
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Corpus-composition drift: source×lang contingency with exact
    // expected counts and lift (the log-free PMI discipline from
    // collocationLift applied to metadata). Marginal windows run over
    // the GROUPED table — one row per category pair, bounded by category
    // vocabulary, never corpus-sized.
    ("q_contingency",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.documents(s, d).groupBy("source", "lang")
          .agg(count(lit(1)).as("n"))
        val bySrc = Window.partitionBy("source")
        val byLang = Window.partitionBy("lang")
        val all = Window.partitionBy()
        g.withColumn("n_source", sum("n").over(bySrc))
          .withColumn("n_lang", sum("n").over(byLang))
          .withColumn("n_total", sum("n").over(all))
          .withColumn("expected",
            (col("n_source") * col("n_lang")).cast("double") / col("n_total"))
          .withColumn("lift",
            (col("n") * col("n_total")).cast("double")
              / (col("n_source") * col("n_lang")).cast("double"))
          .select("source", "lang", "n", "expected", "lift")
          .orderBy("source", "lang")
      },
      Some("""WITH g AS (
             |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM documents GROUP BY source, lang),
             |m AS (
             |  SELECT *, SUM(n) OVER (PARTITION BY source) AS n_source,
             |    SUM(n) OVER (PARTITION BY lang) AS n_lang,
             |    SUM(n) OVER () AS n_total
             |  FROM g)
             |SELECT source, lang, n,
             |  CAST(n_source * n_lang AS DOUBLE) / n_total AS expected,
             |  CAST(n * n_total AS DOUBLE) / CAST(n_source * n_lang AS DOUBLE) AS lift
             |FROM m ORDER BY source, lang""".stripMargin)),

    // Event-time ordering audit: per user, the fraction of events whose
    // timestamp regresses vs ARRIVAL order (event_id) — the
    // late/out-of-order-data metric that sizes streaming watermarks.
    ("q_order_audit",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
        Tables.events(s, d)
          .withColumn("_prev_ts", lag(col("ts"), 1).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("ts") < col("_prev_ts"), 1L).otherwise(0L)).as("n_regressed"))
          .withColumn("frac_regressed",
            when(col("n") > 1,
              col("n_regressed").cast("double") / (col("n") - 1).cast("double")))
          .orderBy("user_id")
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
             |  FROM events)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS BIGINT) AS n_regressed,
             |  CASE WHEN COUNT(*) > 1
             |       THEN CAST(SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS DOUBLE)
             |            / CAST(COUNT(*) - 1 AS DOUBLE) END AS frac_regressed
             |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Incremental HLL: per-source register sketches persisted, then
    // UNIONED register-wise — the cross-batch cardinality path (count
    // distinct users over any source subset without rescanning events).
    // The oracle replays the GLOBAL sketch: merge-of-maxes must equal
    // max-over-all — associativity/idempotence on real data, hash-checked.
    ("q_hll_incremental",
      (s: SparkSession, d: String) => {
        val p = 8
        val enc = Tables.events(s, d)
          .filter(col("user_id").isNotNull)
          .select(col("event_type"), Hll.hllInput(col("user_id"), p).as("enc"))
        val perSource = enc.groupBy("event_type")
          .agg(Hll.hllRegistersAgg(col("enc"), p).as("sk"))
        perSource
          .agg(count(lit(1)).as("n_sources"),
            Hll.mergeRegistersAgg(col("sk"), p).as("sk"))
          .select(col("n_sources"), Hll.summarizeRegisters(col("sk"), p).as("h"))
          .select(col("n_sources"),
            col("h.vEmpty").as("v_empty"), col("h.zScaled").as("z_scaled"),
            Hll.rawEstimate(col("h.zScaled"), p).as("raw_est"))
      },
      Some(s"""WITH h AS (
             |  SELECT event_type, user_id,
             |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |r AS (
             |  SELECT hv % 256 AS bucket,
             |    CASE WHEN hv // 256 = 0 THEN 53 ELSE 53 - length(bin(hv // 256)) END AS rho
             |  FROM h),
             |regs AS (SELECT bucket, max(rho) AS reg FROM r GROUP BY bucket),
             |agg AS (
             |  SELECT CAST(256 - COUNT(*) AS INT) AS v_empty,
             |    CAST(SUM(1::BIGINT << (53 - reg)) + (256 - COUNT(*)) * (1::BIGINT << 53) AS BIGINT) AS z_scaled
             |  FROM regs),
             |ns AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_sources
             |  FROM events WHERE user_id IS NOT NULL)
             |SELECT n_sources, v_empty, z_scaled,
             |  CAST(${Hll.alphaNumerator(8).toString} AS DOUBLE) / z_scaled AS raw_est
             |FROM agg, ns""".stripMargin)),

    // Count-Min frequency estimates: depth×width counter grid over the
    // event stream's user ids, point-queried for a bounded item set and
    // reported NEXT TO the exact counts — the one-sided error contract
    // (cm_count ≥ exact, overshoot = collision mass) is in the output
    // itself. Register hash is the d-salted md5 device → bit-replayable.
    ("q_cms_frequency",
      (s: SparkSession, d: String) => {
        import graft.functions.CountMin
        val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        val reg = CountMin.cmRegisters(ev, col("user_id"), depth = 4, width = 64)
        val est = CountMin.cmEstimates(reg,
          ev.filter(col("user_id") <= 20), "user_id", depth = 4, width = 64)
        val exact = ev.filter(col("user_id") <= 20)
          .groupBy(col("user_id").as("item"))
          .agg(count(lit(1)).as("exact_count"))
        est.join(exact, Seq("item")).orderBy("item")
      },
      Some("""WITH ds AS (SELECT CAST(x AS INT) AS d FROM range(4) t(x)),
             |ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
             |reg AS (
             |  SELECT ds.d,
             |    CAST(concat('0x', substring(md5(CAST(ds.d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 64 AS w,
             |    CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM ev, ds GROUP BY 1, 2),
             |q AS (SELECT DISTINCT user_id AS item FROM ev WHERE user_id <= 20),
             |b AS (
             |  SELECT q.item, ds.d,
             |    CAST(concat('0x', substring(md5(CAST(ds.d AS VARCHAR) || ':' || CAST(q.item AS VARCHAR)),1,15)) AS BIGINT) % 64 AS w
             |  FROM q, ds),
             |est AS (
             |  SELECT b.item, MIN(COALESCE(reg.cnt, 0)) AS cm_count
             |  FROM b LEFT JOIN reg ON reg.d = b.d AND reg.w = b.w
             |  GROUP BY b.item),
             |ex AS (SELECT user_id AS item, CAST(COUNT(*) AS BIGINT) AS exact_count
             |  FROM ev WHERE user_id <= 20 GROUP BY 1)
             |SELECT est.item, est.cm_count, ex.exact_count
             |FROM est JOIN ex USING (item) ORDER BY item""".stripMargin)),

    // CMS join-size estimation (the AMS/CMS inner-product estimator):
    // |clicks ⋈ views on user_id| bounded from two broadcast-sized
    // register tables BEFORE running the join — the "will this join
    // explode" planning signal at 100 TB, O(depth·width) after the
    // one-shuffle sketch builds. One-sided (est ≥ truth); the exact size
    // sits next to it in the output, so the contract is hash-checked.
    ("q_cms_join_size",
      (s: SparkSession, d: String) => {
        import graft.functions.CountMin
        val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        val clicks = ev.filter(col("event_type") === "click").select("user_id")
        val views = ev.filter(col("event_type") === "view").select("user_id")
        val est = CountMin.cmJoinSizeEstimate(
          CountMin.cmRegisters(clicks, col("user_id"), depth = 4, width = 256),
          CountMin.cmRegisters(views, col("user_id"), depth = 4, width = 256))
        val exact = clicks.join(views, "user_id")
          .agg(count(lit(1)).as("true_join_size"))
        est.crossJoin(exact)
      },
      Some("""WITH ds AS (SELECT CAST(x AS INT) AS d FROM range(4) t(x)),
             |a AS (
             |  SELECT ds.d,
             |    CAST(concat('0x', substring(md5(CAST(ds.d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 256 AS w,
             |    CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM events, ds WHERE user_id IS NOT NULL AND event_type = 'click'
             |  GROUP BY 1, 2),
             |b AS (
             |  SELECT ds.d,
             |    CAST(concat('0x', substring(md5(CAST(ds.d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 256 AS w,
             |    CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM events, ds WHERE user_id IS NOT NULL AND event_type = 'view'
             |  GROUP BY 1, 2),
             |dot AS (SELECT a.d, SUM(a.cnt * b.cnt) AS dd
             |  FROM a JOIN b ON a.d = b.d AND a.w = b.w GROUP BY 1),
             |est AS (SELECT CAST(min(dd) AS BIGINT) AS est_join_size FROM dot),
             |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_join_size
             |  FROM (SELECT user_id FROM events WHERE event_type = 'click' AND user_id IS NOT NULL) c
             |  JOIN (SELECT user_id FROM events WHERE event_type = 'view' AND user_id IS NOT NULL) v USING (user_id))
             |SELECT est_join_size, true_join_size FROM est, ex""".stripMargin)),

    // Incremental Count-Min: per-source register sketches persisted,
    // then merged register-wise by SUM (counters are additive — HLL
    // merges by max) — the cross-batch frequency path. The oracle
    // replays the DIRECT global sketch: merge-of-sums must equal
    // count-over-all, hash-checked on real data (the q_hll_incremental
    // device for the additive sketch family).
    ("q_cms_incremental",
      (s: SparkSession, d: String) => {
        import graft.functions.CountMin
        val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        val parts = CountMin.cmRegistersBy(ev, col("event_type"),
          col("user_id"), depth = 4, width = 64)
        CountMin.cmMerge(parts.select("d", "w", "cnt")).orderBy("d", "w")
      },
      Some("""WITH ds AS (SELECT CAST(x AS INT) AS d FROM range(4) t(x)),
             |ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL)
             |SELECT ds.d,
             |  CAST(concat('0x', substring(md5(CAST(ds.d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) % 64 AS w,
             |  CAST(COUNT(*) AS BIGINT) AS cnt
             |FROM ev, ds GROUP BY 1, 2 ORDER BY d, w""".stripMargin)),

    // KMV theta sketch, register state: the k smallest distinct 60-bit
    // md5 hashes per segment — bit-replayed register-for-register (the
    // q_hll_distinct device for the SET-OPERATION sketch; HLL can union
    // but structurally cannot intersect). One shuffle, ≤ k longs of
    // partial state per (group, partition).
    ("q_kmv_registers",
      (s: SparkSession, d: String) => {
        import graft.functions.ThetaSketch
        val k = 128
        Tables.events(s, d).filter(col("user_id").isNotNull)
          .select(col("event_type"),
            ThetaSketch.kmvInput(col("user_id")).as("hv"))
          .groupBy("event_type")
          .agg(ThetaSketch.kmvAgg(k, col("hv")).as("sk"))
          .select(col("event_type"), posexplode(col("sk")).as(Seq("reg", "hv")))
          .orderBy("event_type", "reg")
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT event_type,
             |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |r AS (
             |  SELECT event_type, hv,
             |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
             |  FROM h)
             |SELECT event_type, CAST(rn - 1 AS INT) AS reg, hv
             |FROM r WHERE rn <= 128 ORDER BY event_type, reg""".stripMargin)),

    // KMV distinct estimate next to the exact count (the error is IN the
    // output): exact size below k, else the bottom-k estimator
    // (k-1)·2^60/theta. Numerator emitted as one Scala-printed double so
    // both engines divide the identical IEEE value (the alphaNumerator
    // device).
    ("q_kmv_distinct",
      (s: SparkSession, d: String) => {
        import graft.functions.ThetaSketch
        val k = 128
        Tables.events(s, d).filter(col("user_id").isNotNull)
          .select(col("event_type"),
            ThetaSketch.kmvInput(col("user_id")).as("hv"), col("user_id"))
          .groupBy("event_type")
          .agg(ThetaSketch.kmvAgg(k, col("hv")).as("sk"),
            countDistinct(col("user_id")).as("exact_distinct"))
          .select(col("event_type"),
            size(col("sk")).as("n_kept"),
            ThetaSketch.theta(col("sk"), k).as("theta"),
            ThetaSketch.estimate(col("sk"), k).as("est_distinct"),
            col("exact_distinct"))
          .orderBy("event_type")
      },
      Some(s"""WITH h AS (
             |  SELECT DISTINCT event_type,
             |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |r AS (
             |  SELECT event_type, hv,
             |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
             |  FROM h),
             |sk AS (SELECT event_type, hv, rn FROM r WHERE rn <= 128),
             |th AS (
             |  SELECT event_type, CAST(COUNT(*) AS INT) AS n_kept,
             |    CASE WHEN COUNT(*) < 128 THEN 1152921504606846976
             |         ELSE max(CASE WHEN rn = 128 THEN hv END) END AS theta
             |  FROM sk GROUP BY event_type),
             |ex AS (
             |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
             |  FROM events WHERE user_id IS NOT NULL GROUP BY event_type)
             |SELECT th.event_type, n_kept, theta,
             |  CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
             |       ELSE CAST(${(127.0 * graft.functions.ThetaSketch.ThetaSpan).toString} AS DOUBLE)
             |            / CAST(theta AS DOUBLE) END AS est_distinct,
             |  exact_distinct
             |FROM th JOIN ex ON th.event_type = ex.event_type
             |ORDER BY th.event_type""".stripMargin)),

    // KMV mergeability: per-(segment, batch) sketches persisted, then
    // UNIONED per segment — must equal the direct global sketch register
    // for register (merge-of-k-mins ≡ k-mins-of-all; the
    // q_hll_incremental / q_cms_incremental device for the bottom-k
    // family). The oracle doesn't simulate batches at all: it computes
    // the global sketch — THAT's the assertion.
    ("q_kmv_union",
      (s: SparkSession, d: String) => {
        import graft.functions.ThetaSketch
        val k = 128
        val perBatch = Tables.events(s, d).filter(col("user_id").isNotNull)
          .select(col("event_type"), pmod(col("event_id"), lit(5)).as("batch"),
            ThetaSketch.kmvInput(col("user_id")).as("hv"))
          .groupBy("event_type", "batch")
          .agg(ThetaSketch.kmvAgg(k, col("hv")).as("sk"))
        perBatch.groupBy("event_type")
          .agg(ThetaSketch.unionSketchesAgg(k, col("sk")).as("sk"))
          .select(col("event_type"), posexplode(col("sk")).as(Seq("reg", "hv")))
          .orderBy("event_type", "reg")
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT event_type,
             |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |r AS (
             |  SELECT event_type, hv,
             |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
             |  FROM h)
             |SELECT event_type, CAST(rn - 1 AS INT) AS reg, hv
             |FROM r WHERE rn <= 128 ORDER BY event_type, reg""".stripMargin)),

    // Audience overlap: pairwise INTERSECTION estimates between segments
    // from their KMV sketches — the question the registry's exact
    // counters can't answer without a corpus self-join per pair. Set ops
    // run on sketch ROWS (≤ k longs each): 1000 segments = 1000 sketch
    // rows joined pairwise, the corpus is scanned exactly once. Exact
    // overlap alongside for the error contract.
    ("q_audience_overlap",
      (s: SparkSession, d: String) => {
        import graft.functions.ThetaSketch
        val k = 128
        val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        // eager checkpoint: the sketch table (one k-long array per
        // segment) is referenced on BOTH sides of the pair join — without
        // it each side re-runs the corpus aggregation, i.e. two corpus
        // scans for a table of |segments| rows. The exact arm below adds
        // its own corpus scans, but that arm exists only for the error
        // contract; a production overlap query is sketch-only.
        val sk = ev
          .select(col("event_type"), ThetaSketch.kmvInput(col("user_id")).as("hv"))
          .groupBy("event_type")
          .agg(ThetaSketch.kmvAgg(k, col("hv")).as("sk"))
          .localCheckpoint()
        val pairs = sk.select(col("event_type").as("type_a"), col("sk").as("sk_a"))
          .join(broadcast(
            sk.select(col("event_type").as("type_b"), col("sk").as("sk_b"))),
            col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"),
            ThetaSketch.intersectCount(col("sk_a"), col("sk_b"), k).as("n_common"),
            ThetaSketch.intersectEstimate(col("sk_a"), col("sk_b"), k)
              .as("est_overlap"))
        val du = ev.select("event_type", "user_id").distinct()
        val exact = du.as("x")
          .join(du.as("y"), col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
          .groupBy(col("x.event_type").as("type_a"),
            col("y.event_type").as("type_b"))
          .agg(count(lit(1)).as("exact_overlap"))
        pairs.join(exact, Seq("type_a", "type_b"), "left")
          .na.fill(0L, Seq("exact_overlap"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT event_type,
             |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |r AS (
             |  SELECT event_type, hv,
             |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
             |  FROM h),
             |sk AS (SELECT event_type, hv, rn FROM r WHERE rn <= 128),
             |th AS (
             |  SELECT event_type,
             |    CASE WHEN COUNT(*) < 128 THEN 1152921504606846976
             |         ELSE max(CASE WHEN rn = 128 THEN hv END) END AS theta
             |  FROM sk GROUP BY event_type),
             |pairs AS (
             |  SELECT ta.event_type AS type_a, tb.event_type AS type_b,
             |    least(ta.theta, tb.theta) AS tmin
             |  FROM th ta JOIN th tb ON ta.event_type < tb.event_type),
             |com AS (
             |  SELECT p.type_a, p.type_b, p.tmin, COUNT(sb.hv) AS n_common
             |  FROM pairs p
             |  LEFT JOIN sk sa ON sa.event_type = p.type_a AND sa.hv < p.tmin
             |  LEFT JOIN sk sb ON sb.event_type = p.type_b AND sb.hv = sa.hv
             |  GROUP BY 1, 2, 3),
             |du AS (SELECT DISTINCT event_type, user_id FROM events
             |  WHERE user_id IS NOT NULL),
             |ex AS (
             |  SELECT x.event_type AS type_a, y.event_type AS type_b,
             |    CAST(COUNT(*) AS BIGINT) AS exact_overlap
             |  FROM du x JOIN du y ON x.user_id = y.user_id
             |    AND x.event_type < y.event_type
             |  GROUP BY 1, 2)
             |SELECT c.type_a, c.type_b, CAST(c.n_common AS INT) AS n_common,
             |  CAST(c.n_common AS DOUBLE) * 1152921504606846976.0
             |    / CAST(c.tmin AS DOUBLE) AS est_overlap,
             |  COALESCE(ex.exact_overlap, 0) AS exact_overlap
             |FROM com c LEFT JOIN ex
             |  ON c.type_a = ex.type_a AND c.type_b = ex.type_b
             |ORDER BY c.type_a, c.type_b""".stripMargin)),

    // Pareto frontier (2-D skyline) of length vs vocabulary richness —
    // the non-dominated exemplar set for data-selection tradeoffs. All
    // integer: per-x max + representative doc, then one ordered pass
    // over the DISTINCT-x table (bounded: one row per length) with a
    // strict running-max dominance test.
    ("q_pareto_front",
      (s: SparkSession, d: String) => {
        val pts = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
          size(array_distinct(split(col("text"), " "))).as("rich"))
        graft.operators.Pareto.frontier(pts, "n_chars", "rich", "doc_id",
            repAs = "rep_doc")
          .orderBy("n_chars")
      },
      Some("""WITH pts AS (
             |  SELECT doc_id, n_chars,
             |    CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS rich
             |  FROM documents),
             |g AS (
             |  SELECT n_chars, max(rich) AS rich,
             |    min(doc_id) FILTER (WHERE rich = mx) AS rep_doc
             |  FROM (SELECT *, max(rich) OVER (PARTITION BY n_chars) AS mx FROM pts)
             |  GROUP BY n_chars),
             |f AS (
             |  SELECT *, max(rich) OVER (ORDER BY n_chars DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
             |  FROM g)
             |SELECT n_chars, rich, rep_doc FROM f
             |WHERE prevmax IS NULL OR rich > prevmax
             |ORDER BY n_chars""".stripMargin)),

    // Per-user OLS value trend (drift detection): exact integer/decimal
    // sufficient statistics, float only in the two final divisions —
    // slope/intercept hash-compare exactly. Rank-as-x keeps Σx² long-safe.
    ("q_group_trend",
      (s: SparkSession, d: String) => {
        Regression.groupTrend(
            Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
            groupCols = Seq("user_id"), yCol = "value",
            orderCols = Seq("ts", "event_id"))
          .orderBy("user_id")
      },
      Some("""WITH xy AS (
             |  SELECT user_id,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS x,
             |    CAST(value AS DECIMAL(18,2)) AS y
             |  FROM events WHERE value IS NOT NULL),
             |s AS (
             |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx, SUM(y) AS sy,
             |    SUM(y * x) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
             |  FROM xy GROUP BY user_id),
             |sl AS (
             |  SELECT user_id, n, sx, sy,
             |    CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) = 0 THEN NULL
             |         ELSE CAST(sxy * n - sx * sy AS DOUBLE)
             |              / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
             |  FROM s)
             |SELECT user_id, n, slope,
             |  (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
             |FROM sl ORDER BY user_id""".stripMargin)),

    // Missing-value imputation: per-group exact-decimal mean fill with
    // an audit flag — the repair step between the profile (which counts
    // the nulls) and the model (which can't eat them). Missingness is
    // planted deterministically (every 13th event) so the oracle replays
    // it; the fill value is the group mean over NON-MISSING rows as one
    // exact decimal sum / count, identical in both engines. One
    // broadcast-sized mean table joined back over one scan.
    ("q_impute",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
          when(pmod(col("event_id"), lit(13)) === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
        val means = ev.filter(col("v").isNotNull)
          .groupBy("event_type")
          .agg((sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double") / count(lit(1))).as("fill"))
        ev.join(broadcast(means), Seq("event_type"), "left")
          .select(col("event_id"), col("event_type"),
            coalesce(col("v"), col("fill")).as("value_imputed"),
            col("v").isNull.as("was_imputed"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
             |  FROM events),
             |m AS (
             |  SELECT event_type,
             |    CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS fill
             |  FROM ev WHERE v IS NOT NULL GROUP BY event_type)
             |SELECT event_id, ev.event_type,
             |  COALESCE(v, fill) AS value_imputed,
             |  v IS NULL AS was_imputed
             |FROM ev LEFT JOIN m ON ev.event_type = m.event_type
             |ORDER BY event_id""".stripMargin)),

    // Replayable HLL distinct-user sketch per event_type: register state
    // + raw estimate, hash-compared register-for-register against a full
    // SQL replay; exact distinct alongside for the error to be visible.
    ("q_hll_distinct",
      (s: SparkSession, d: String) => {
        val p = 8
        Tables.events(s, d)
          .filter(col("user_id").isNotNull)
          .select(col("event_type"), col("user_id"),
            Hll.hllInput(col("user_id"), p).as("enc"))
          .groupBy("event_type")
          .agg(Hll.hllAgg(col("enc"), p).as("h"),
            countDistinct(col("user_id")).as("exact_distinct"))
          .select(col("event_type"),
            col("h.vEmpty").as("v_empty"), col("h.zScaled").as("z_scaled"),
            Hll.rawEstimate(col("h.zScaled"), p).as("raw_est"),
            col("exact_distinct"))
          .orderBy("event_type")
      },
      Some(s"""WITH h AS (
             |  SELECT event_type, user_id,
             |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
             |  FROM events WHERE user_id IS NOT NULL),
             |b AS (
             |  SELECT event_type, user_id, hv % 256 AS bucket, hv // 256 AS rest FROM h),
             |r AS (
             |  SELECT event_type, bucket,
             |    CASE WHEN rest = 0 THEN 53 ELSE 53 - length(bin(rest)) END AS rho
             |  FROM b),
             |regs AS (
             |  SELECT event_type, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
             |agg AS (
             |  SELECT event_type,
             |    CAST(256 - COUNT(*) AS INT) AS v_empty,
             |    CAST(SUM(1::BIGINT << (53 - reg)) + (256 - COUNT(*)) * (1::BIGINT << 53) AS BIGINT) AS z_scaled
             |  FROM regs GROUP BY event_type),
             |ex AS (
             |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
             |  FROM events WHERE user_id IS NOT NULL GROUP BY event_type)
             |SELECT agg.event_type, v_empty, z_scaled,
             |  CAST(${Hll.alphaNumerator(8).toString} AS DOUBLE) / z_scaled AS raw_est,
             |  exact_distinct
             |FROM agg JOIN ex ON agg.event_type = ex.event_type
             |ORDER BY 1""".stripMargin)),

    // Incremental histogram: per-source equi-width count vectors
    // persisted, then UNIONED element-wise — the distribution analog of
    // q_hll_incremental (drift dashboards / quantile thresholds over any
    // batch subset without rescanning). The oracle recounts the GLOBAL
    // histogram directly: merge-of-sums must equal sum-over-all, bin for
    // bin, including the running CDF and the p50/p90/p99 bin indices
    // derived from it. Width 0.625 = 5/8 is binary-exact, so the floor
    // arithmetic replays identically in DuckDB.
    ("q_hist_incremental",
      (s: SparkSession, d: String) => {
        import graft.functions.HistSketch
        val nBins = 32
        val perSource = Tables.events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            HistSketch.binIndex(col("value"), 0.0, 0.625, nBins).as("b"))
          .groupBy("event_type")
          .agg(HistSketch.histAgg(col("b"), nBins).as("sk"))
        val merged = perSource
          .agg(count(lit(1)).as("n_sketches"),
            HistSketch.mergeHistAgg(col("sk"), nBins).as("sk"))
          .select(col("n_sketches"),
            HistSketch.quantileBin(col("sk"), 50, nBins).as("p50_bin"),
            HistSketch.quantileBin(col("sk"), 90, nBins).as("p90_bin"),
            HistSketch.quantileBin(col("sk"), 99, nBins).as("p99_bin"),
            posexplode(col("sk")).as(Seq("bin", "cnt")))
        merged
          .withColumn("cum", sum("cnt").over(
            org.apache.spark.sql.expressions.Window.orderBy("bin")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .select("bin", "cnt", "cum", "n_sketches", "p50_bin", "p90_bin", "p99_bin")
          .orderBy("bin")
      },
      Some("""WITH v AS (
             |  SELECT LEAST(GREATEST(CAST(FLOOR(value / 0.625) AS INT), 0), 31) AS bin
             |  FROM events WHERE value IS NOT NULL),
             |bins AS (SELECT CAST(UNNEST(range(32)) AS INT) AS bin),
             |c AS (
             |  SELECT b.bin, CAST(COALESCE(n, 0) AS BIGINT) AS cnt
             |  FROM bins b LEFT JOIN (SELECT bin, COUNT(*) AS n FROM v GROUP BY bin) g
             |    ON b.bin = g.bin),
             |cdf AS (
             |  SELECT bin, cnt,
             |    CAST(SUM(cnt) OVER (ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             |    CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM c),
             |q AS (
             |  SELECT
             |    CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN bin END) AS INT) AS p50_bin,
             |    CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN bin END) AS INT) AS p90_bin,
             |    CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN bin END) AS INT) AS p99_bin
             |  FROM cdf),
             |ns AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_sketches
             |  FROM events WHERE value IS NOT NULL)
             |SELECT bin, cnt, cum, n_sketches, p50_bin, p90_bin, p99_bin
             |FROM cdf, q, ns ORDER BY bin""".stripMargin))
  )
}

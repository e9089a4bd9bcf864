package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{AsOfJoin, BlockingJoin, RangeJoin, PrefixJoin, SkewJoin}
import graft.graph.Knn

/** Join family beyond plain equi-joins (SURVEY.md §2.3: J2, J8, J9, J11). */
object JoinQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // J8 — point-in-interval range join, bucketed form (the 100 TB path:
    // equi-join on bucket + refine, instead of a nested loop)
    // (reference: worker_create.py:721-743 frame→segment lookup).
    ("q_range_join",
      (s: SparkSession, d: String) => {
        val intervals = Tables.nation(s, d).select(
          col("n_nationkey").as("seg_id"),
          (col("n_nationkey") * 4.0).as("lo"),
          (col("n_nationkey") * 4.0 + 3.99).as("hi"))
        RangeJoin.bucketedJoin(
            Tables.events(s, d).select("event_id", "value"),
            intervals, pointCol = "value", loCol = "lo", hiCol = "hi",
            bucketWidth = 5.0)
          .groupBy("seg_id")
          .agg(count(lit(1)).as("n_points"))
          .orderBy("seg_id")
      },
      Some("""SELECT n_nationkey AS seg_id, CAST(COUNT(*) AS BIGINT) AS n_points
             |FROM nation JOIN events
             |  ON value >= n_nationkey*4.0 AND value <= n_nationkey*4.0 + 3.99
             |GROUP BY n_nationkey ORDER BY seg_id""".stripMargin)),

    // J9 — nearest-key as-of join: each click picks the nearest signup in
    // time within its user (reference: camera_exporter.py:222-249
    // per-frame nearest keyframe sampling).
    ("q_asof_nearest",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "event_id", "ts")
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("value").as("signup_value"))
        AsOfJoin.nearest(clicks, signups,
            partCols = Seq("user_id"), queryTime = "ts", keyTime = "ts",
            keyValues = Seq("signup_value"))
          .select("user_id", "event_id", "matched_time", "signup_value")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, event_id, CAST(epoch(ts) AS DOUBLE) AS t, 1 AS isq,
             |         CAST(NULL AS DOUBLE) AS kt, CAST(NULL AS DOUBLE) AS v
             |  FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, NULL, CAST(epoch(ts) AS DOUBLE), 0,
             |         CAST(epoch(ts) AS DOUBLE), value
             |  FROM events WHERE event_type = 'signup'),
             |w AS (
             |  SELECT *,
             |    last_value(kt IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, isq
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
             |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, isq
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             |    first_value(kt IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, isq
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t,
             |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, isq
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
             |  FROM u)
             |SELECT user_id, event_id,
             |  CASE WHEN next_t IS NULL OR (prev_t IS NOT NULL AND (t - prev_t) <= (next_t - t))
             |       THEN prev_t ELSE next_t END AS matched_time,
             |  CASE WHEN next_t IS NULL OR (prev_t IS NOT NULL AND (t - prev_t) <= (next_t - t))
             |       THEN prev_v ELSE next_v END AS signup_value
             |FROM w WHERE isq = 1 ORDER BY user_id, event_id""".stripMargin)),

    // Record linkage via multi-key blocking: customers matched against a
    // reformatted directory (names restyled, every 7th record missing) on
    // two blocking keys — (nation, last 2 digits of the normalized name)
    // and the last 3 digits alone — scored by field agreement, best match
    // per left. Both keys are corruption-INVARIANT (the restyle touches
    // only the alpha prefix, so digits and nation survive), so the true
    // pair always co-blocks under BOTH; the union still matters for the
    // degrade path (partnerless lefts keep whichever arm yields the
    // better stand-in). The r7 form blocked the first arm on nation
    // ALONE: 25 blocks ⇒ Σ(n/25)² candidates — quadratic in corpus
    // (~9 M pairs at sf0.1, the bench's biggest line). Compounding the
    // nation arm with 2 name digits multiplies block count by 100 at
    // identical recall, dropping candidates from O(n²/25) to
    // O(n²/2500 + n²/1000) — the same re-block q_fuzzy_match ran in r7
    // (measured 15× there). Sizing rule (the knob a deployment turns as
    // the corpus grows): pick suffix length L with 10^L ≈ n/targetBlock
    // so Σ block² ≈ n·targetBlock stays O(n) — L=3 here (15 k rows,
    // ~15-row blocks); tools/Stress.stressLinkageScaled measures the
    // same pipeline at a 64× corpus under the rule's L=5/L=4 keys.
    // Pair-dedup note: bestMatch scores a pair
    // once per surfacing arm, but (score, rid) is identical each time,
    // so the per-left argmax is duplicate-invariant (its scaladoc
    // contract); the oracle's UNION-distinct collapses the same dup.
    ("q_record_linkage",
      (s: SparkSession, d: String) => {
        def digits(c: org.apache.spark.sql.Column) = regexp_replace(c, "[^0-9]", "")
        // normalized digits are PRECOMPUTED on the 15k-row inputs: the
        // score runs on every candidate pair, and a regexp evaluated per
        // PAIR instead of per ROW was the dominant CPU in the pair loop
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"), digits(col("c_name")).as("_l_dig"))
        val dir = Tables.customer(s, d)
          .filter(pmod(col("c_custkey"), lit(7)) =!= 0)
          .select((col("c_custkey") + 1000000L).as("rid"),
            regexp_replace(upper(col("c_name")), "CUSTOMER#", "CUST-").as("r_name"),
            col("c_nationkey").as("r_nation"), col("c_acctbal").as("r_acct"))
          .withColumn("_r_dig", digits(col("r_name")))
        BlockingJoin.bestMatch(cust, dir, leftId = "c_custkey", rightId = "rid",
            blockKeys = Seq(
              struct(cust("c_nationkey"), substring(cust("_l_dig"), -2, 2)) ->
                struct(dir("r_nation"), substring(dir("_r_dig"), -2, 2)),
              substring(cust("_l_dig"), -3, 3) ->
                substring(dir("_r_dig"), -3, 3)),
            score =
              when(col("_l_dig") === col("_r_dig"), 10).otherwise(0)
                + when(col("c_nationkey") === col("r_nation"), 2).otherwise(0)
                + when(col("c_acctbal") === col("r_acct"), 3).otherwise(0))
          .select("c_custkey", "rid", "match_score")
          .orderBy("c_custkey")
      },
      Some("""WITH l AS (
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer),
             |r AS (
             |  SELECT c_custkey + 1000000 AS rid,
             |    replace(upper(c_name), 'CUSTOMER#', 'CUST-') AS r_name,
             |    c_nationkey AS r_nation, c_acctbal AS r_acct
             |  FROM customer WHERE c_custkey % 7 <> 0),
             |cand AS (
             |  SELECT l.c_custkey, l.c_name, l.c_nationkey, l.c_acctbal,
             |         r.rid, r.r_name, r.r_nation, r.r_acct
             |  FROM l JOIN r
             |    ON l.c_nationkey = r.r_nation
             |   AND substring(regexp_replace(l.c_name, '[^0-9]', '', 'g'), -2, 2)
             |     = substring(regexp_replace(r.r_name, '[^0-9]', '', 'g'), -2, 2)
             |  UNION
             |  SELECT l.c_custkey, l.c_name, l.c_nationkey, l.c_acctbal,
             |         r.rid, r.r_name, r.r_nation, r.r_acct
             |  FROM l JOIN r
             |    ON substring(regexp_replace(l.c_name, '[^0-9]', '', 'g'), -3, 3)
             |     = substring(regexp_replace(r.r_name, '[^0-9]', '', 'g'), -3, 3)),
             |scored AS (
             |  SELECT c_custkey, rid,
             |    (CASE WHEN regexp_replace(c_name, '[^0-9]', '', 'g')
             |               = regexp_replace(r_name, '[^0-9]', '', 'g') THEN 10 ELSE 0 END
             |     + CASE WHEN c_nationkey = r_nation THEN 2 ELSE 0 END
             |     + CASE WHEN c_acctbal = r_acct THEN 3 ELSE 0 END) AS match_score
             |  FROM cand),
             |best AS (
             |  SELECT *, row_number() OVER (PARTITION BY c_custkey
             |    ORDER BY match_score DESC, rid) AS rn FROM scored)
             |SELECT c_custkey, rid, match_score FROM best WHERE rn = 1
             |ORDER BY c_custkey""".stripMargin)),

    // Edit-distance fuzzy match, BLOCKED: each customer recovers its
    // directory record (zeros OCR'd to 'O's, every 9th record missing)
    // as the minimum-Levenshtein candidate among BLOCK candidates — the
    // scale-safe production shape, not the all-pairs one. Two
    // corruption-INVARIANT keys (translate 'O'→'0' undoes the OCR noise
    // exactly, so the true pair always shares both): (nation, restored
    // 4-char name suffix) and the coarser (nation, restored last-3
    // digits). Cost is Σ block² per key — never n²/25; the r5-r6
    // nation-only all-pairs form (7.7 M Levenshteins at sf0.1, the
    // bench's single most expensive line) lives on as the Stress-only
    // cost baseline (tools/Stress.stressFuzzyUnblocked). Customers whose
    // partner is missing degrade to the best block candidate, or are
    // absent when nothing shares a block — the standard blocked-linkage
    // contract (BlockingJoin scaladoc).
    ("q_fuzzy_match",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val l = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
        val r = Tables.customer(s, d)
          .filter(pmod(col("c_custkey"), lit(9)) =!= 0)
          .select((col("c_custkey") + 1000000L).as("rid"),
            regexp_replace(col("c_name"), "0", "O").as("r_name"),
            col("c_nationkey").as("r_nation"))
        def restored(c: org.apache.spark.sql.Column) = translate(c, "O", "0")
        def rdig(c: org.apache.spark.sql.Column) =
          regexp_replace(restored(c), "[^0-9]", "")
        val cand = BlockingJoin.candidates(l, r, "c_custkey", "rid",
          blockKeys = Seq(
            struct(l("c_nationkey"), substring(restored(l("c_name")), -4, 4)) ->
              struct(r("r_nation"), substring(restored(r("r_name")), -4, 4)),
            struct(l("c_nationkey"), substring(rdig(l("c_name")), -3, 3)) ->
              struct(r("r_nation"), substring(rdig(r("r_name")), -3, 3))))
        val best = Window.partitionBy(col("c_custkey"))
          .orderBy(col("edit_dist"), col("rid"))
        cand
          .withColumn("edit_dist", levenshtein(col("c_name"), col("r_name")))
          .withColumn("_rn", row_number().over(best))
          .filter(col("_rn") === 1)
          .select("c_custkey", "rid", "edit_dist")
          .orderBy("c_custkey")
      },
      Some("""WITH l AS (SELECT c_custkey, c_name, c_nationkey FROM customer),
             |r AS (
             |  SELECT c_custkey + 1000000 AS rid, replace(c_name, '0', 'O') AS r_name,
             |    c_nationkey AS r_nation
             |  FROM customer WHERE c_custkey % 9 <> 0),
             |cand AS (
             |  SELECT c_custkey, c_name, rid, r_name FROM l JOIN r
             |    ON l.c_nationkey = r.r_nation
             |   AND substring(translate(l.c_name, 'O', '0'), -4, 4)
             |     = substring(translate(r.r_name, 'O', '0'), -4, 4)
             |  UNION
             |  SELECT c_custkey, c_name, rid, r_name FROM l JOIN r
             |    ON l.c_nationkey = r.r_nation
             |   AND substring(regexp_replace(translate(l.c_name, 'O', '0'), '[^0-9]', '', 'g'), -3, 3)
             |     = substring(regexp_replace(translate(r.r_name, 'O', '0'), '[^0-9]', '', 'g'), -3, 3)),
             |scored AS (
             |  SELECT c_custkey, rid, levenshtein(c_name, r_name) AS edit_dist
             |  FROM cand),
             |best AS (
             |  SELECT *, row_number() OVER (PARTITION BY c_custkey
             |    ORDER BY edit_dist, rid) AS rn FROM scored)
             |SELECT c_custkey, rid, CAST(edit_dist AS INT) AS edit_dist
             |FROM best WHERE rn = 1 ORDER BY c_custkey""".stripMargin)),

    // q_fuzzy_match's blocked pipeline scored by Jaro–Winkler instead of
    // Levenshtein — the census-matcher comparator (transposition-tolerant,
    // common-prefix bonus) as a native codegen'd expression
    // (graft_jaro_winkler, functions/TextExpressions.scala). The scores
    // hash-compare against DuckDB's jaro_winkler_similarity bit-for-bit:
    // the kernel pins DuckDB's conventions (empty→0, window ⌊max/2⌋−1,
    // 0.7 boost threshold, exact IEEE association order — see the
    // kernel's scaladoc).
    ("q_jaro_match",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val l = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
        val r = Tables.customer(s, d)
          .filter(pmod(col("c_custkey"), lit(9)) =!= 0)
          .select((col("c_custkey") + 1000000L).as("rid"),
            regexp_replace(col("c_name"), "0", "O").as("r_name"),
            col("c_nationkey").as("r_nation"))
        def restored(c: org.apache.spark.sql.Column) = translate(c, "O", "0")
        def rdig(c: org.apache.spark.sql.Column) =
          regexp_replace(restored(c), "[^0-9]", "")
        val cand = BlockingJoin.candidates(l, r, "c_custkey", "rid",
          blockKeys = Seq(
            struct(l("c_nationkey"), substring(restored(l("c_name")), -4, 4)) ->
              struct(r("r_nation"), substring(restored(r("r_name")), -4, 4)),
            struct(l("c_nationkey"), substring(rdig(l("c_name")), -3, 3)) ->
              struct(r("r_nation"), substring(rdig(r("r_name")), -3, 3))))
        val best = Window.partitionBy(col("c_custkey"))
          .orderBy(col("jw").desc, col("rid"))
        cand
          .withColumn("jw", graft.functions.TextExpressions
            .jaroWinkler(col("c_name"), col("r_name")))
          .withColumn("_rn", row_number().over(best))
          .filter(col("_rn") === 1)
          .select("c_custkey", "rid", "jw")
          .orderBy("c_custkey")
      },
      Some("""WITH l AS (SELECT c_custkey, c_name, c_nationkey FROM customer),
             |r AS (
             |  SELECT c_custkey + 1000000 AS rid, replace(c_name, '0', 'O') AS r_name,
             |    c_nationkey AS r_nation
             |  FROM customer WHERE c_custkey % 9 <> 0),
             |cand AS (
             |  SELECT c_custkey, c_name, rid, r_name FROM l JOIN r
             |    ON l.c_nationkey = r.r_nation
             |   AND substring(translate(l.c_name, 'O', '0'), -4, 4)
             |     = substring(translate(r.r_name, 'O', '0'), -4, 4)
             |  UNION
             |  SELECT c_custkey, c_name, rid, r_name FROM l JOIN r
             |    ON l.c_nationkey = r.r_nation
             |   AND substring(regexp_replace(translate(l.c_name, 'O', '0'), '[^0-9]', '', 'g'), -3, 3)
             |     = substring(regexp_replace(translate(r.r_name, 'O', '0'), '[^0-9]', '', 'g'), -3, 3)),
             |scored AS (
             |  SELECT c_custkey, rid,
             |    jaro_winkler_similarity(c_name, r_name) AS jw
             |  FROM cand),
             |best AS (
             |  SELECT *, row_number() OVER (PARTITION BY c_custkey
             |    ORDER BY jw DESC, rid) AS rn FROM scored)
             |SELECT c_custkey, rid, jw
             |FROM best WHERE rn = 1 ORDER BY c_custkey""".stripMargin)),

    // Sorted-neighborhood blocking (Hernández–Stolfo) — the linkage
    // complement to key blocking: here the corruption INCREMENTS the
    // digit key (an OCR-style off-by-one), so no equality key survives
    // and BlockingJoin.candidates would have zero recall, but the
    // corrupted key still SORTS adjacent to its original — the window
    // catches every true pair at exactly n·w candidates. Global order is
    // total (key, side, id), replayed identically by the oracle.
    ("q_sorted_neighborhood",
      (s: SparkSession, d: String) => {
        def digits(c: org.apache.spark.sql.Column) = regexp_replace(c, "[^0-9]", "")
        val l = Tables.customer(s, d)
          .select(col("c_custkey"), digits(col("c_name")).as("lk"))
        val r = Tables.customer(s, d)
          .filter(pmod(col("c_custkey"), lit(9)) =!= 0)
          .select((col("c_custkey") + 1000000L).as("rid"),
            format_string("%09d", digits(col("c_name")).cast("long") + 1L).as("rk"))
        BlockingJoin.sortedNeighborhood(l, r, "c_custkey", "rid",
            col("lk"), col("rk"), w = 4)
          .orderBy("c_custkey", "rid")
      },
      Some("""WITH l AS (
             |  SELECT c_custkey AS id,
             |    regexp_replace(c_name, '[^0-9]', '', 'g') AS k, 0 AS side
             |  FROM customer),
             |r AS (
             |  SELECT c_custkey + 1000000 AS id,
             |    printf('%09d',
             |      CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) + 1) AS k,
             |    1 AS side
             |  FROM customer WHERE c_custkey % 9 <> 0),
             |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
             |p AS (
             |  SELECT *, CAST(row_number() OVER (ORDER BY k, side, id) AS BIGINT) AS pos
             |  FROM u)
             |SELECT CASE WHEN a.side = 0 THEN a.id ELSE b.id END AS c_custkey,
             |       CASE WHEN a.side = 0 THEN b.id ELSE a.id END AS rid,
             |       b.pos - a.pos AS pos_gap
             |FROM p a JOIN p b
             |  ON b.pos > a.pos AND b.pos <= a.pos + 4 AND a.side <> b.side
             |ORDER BY c_custkey, rid""".stripMargin)),

    // J2 — sequence→map resolution: strip trailing index, exact match
    // first, else prefix, else unmatched (reference:
    // render_engine.py:87-158). Sequences are doc source_docid names; two
    // sources are removed from the map side to exercise the prefix and
    // unmatched arms.
    ("q_prefix_resolve",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val seqs = docs.select(
          concat(col("source"), lit("_"), col("doc_id")).as("seq_name"))
        val maps = docs.select(col("source").as("map_name")).distinct()
          .filter(!col("map_name").isin("src13", "src7"))
        PrefixJoin.resolveSequenceToMap(seqs, maps, "seq_name", "map_name")
          .select("seq_name", "map_name", "match_kind")
          .orderBy("seq_name")
      },
      Some("""WITH seqs AS (
             |  SELECT source || '_' || CAST(doc_id AS VARCHAR) AS seq_name,
             |         regexp_replace(source || '_' || CAST(doc_id AS VARCHAR), '[_-]?[0-9]+$', '') AS stripped
             |  FROM documents),
             |maps AS (
             |  SELECT DISTINCT source AS map_name FROM documents
             |  WHERE source NOT IN ('src13','src7')),
             |cand AS (
             |  SELECT seq_name, map_name, 0 AS kind_rank, 'exact' AS match_kind
             |  FROM seqs JOIN maps ON stripped = map_name
             |  UNION ALL
             |  SELECT seq_name, map_name, 1, 'prefix'
             |  FROM seqs JOIN maps ON starts_with(stripped, map_name) AND stripped <> map_name),
             |best AS (
             |  SELECT *, row_number() OVER (PARTITION BY seq_name
             |    ORDER BY kind_rank ASC, length(map_name) DESC, map_name ASC) AS rn
             |  FROM cand)
             |SELECT seq_name, map_name, match_kind FROM best WHERE rn = 1
             |UNION ALL
             |SELECT seq_name, NULL, NULL FROM seqs
             |WHERE seq_name NOT IN (SELECT seq_name FROM cand)
             |ORDER BY seq_name""".stripMargin)),

    // J11 — exact kNN over embeddings (broadcast cross join + windowed
    // top-k; reference: navmesh_connectivity.py:126-135). Exact-fold
    // euclidean distance → bit-identical to the oracle's list_reduce.
    ("q_knn",
      (s: SparkSession, d: String) => {
        Knn.bruteForce(
            Tables.embeddings(s, d).filter(col("vec_id") < 40),
            idCol = "vec_id", vecCol = "embedding", k = 3, dim = 64)
          .orderBy("src_id", "rank")
      },
      Some("""WITH pts AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id < 40),
             |pairs AS (
             |  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
             |    sqrt(list_reduce(
             |      list_transform(range(1, len(a.v)+1),
             |        i -> (a.v[i]-b.v[i])*(a.v[i]-b.v[i])),
             |      (x,y) -> x+y)) AS dist
             |  FROM pts a JOIN pts b ON a.vec_id <> b.vec_id),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY src_id
             |    ORDER BY dist ASC, dst_id ASC) AS rank
             |  FROM pairs)
             |SELECT src_id, dst_id, dist, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 3 ORDER BY src_id, rank""".stripMargin)),

    // J11 scale path — bucketed-grid kNN over a 3-D spatial projection
    // (first three embedding components). The ORACLE is the brute-force
    // all-pairs SQL: the hash compare itself proves the grid join is
    // EXACT on this fixture (cellSize 0.25 > the measured max 3rd-neighbor
    // distance ~0.20 at sf0.1), not merely approximate.
    ("q_knn_grid",
      (s: SparkSession, d: String) => {
        val pts = Tables.embeddings(s, d).select(col("vec_id"),
          element_at(col("embedding"), 1).cast("double").as("x"),
          element_at(col("embedding"), 2).cast("double").as("y"),
          element_at(col("embedding"), 3).cast("double").as("z"))
        Knn.gridKnn(pts, "vec_id", Seq("x", "y", "z"), k = 3, cellSize = 0.25)
          .orderBy("src_id", "rank")
      },
      Some("""WITH pts AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |p AS (SELECT vec_id, e[1] AS x, e[2] AS y, e[3] AS z FROM pts),
             |pairs AS (
             |  SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
             |    sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
             |      + (a.z-b.z)*(a.z-b.z)) AS dist
             |  FROM p a JOIN p b ON a.vec_id <> b.vec_id),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY src_id
             |    ORDER BY dist ASC, dst_id ASC) AS rank
             |  FROM pairs)
             |SELECT src_id, dst_id, dist, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 3 ORDER BY src_id, rank""".stripMargin)),

    // Salted skew join: the explicit hot-key mitigation (salt the skewed
    // probe side, replicate the dim side per salt). Result set must be
    // IDENTICAL to the plain equi-join for any salt routing — which is
    // exactly what the oracle checks.
    ("q_salted_join",
      (s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
        val ord = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
          .withColumnRenamed("o_orderkey", "l_orderkey")
        SkewJoin.saltedInnerJoin(li, ord, "l_orderkey", numSalts = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_rows"),
            Det.moneySum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  ${Det.moneySumSql("l_quantity")} AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Hot-key-targeted salted join: ~30% of probe rows are folded onto one
    // sentinel key (the realistic pathology: empty-document / default-scene
    // keys); only that key pays the salt fan-out, the cold mass takes the
    // plain join. The result is provably identical to the unsalted join —
    // the oracle runs the plain SQL.
    ("q_skew_join_hot",
      (s: SparkSession, d: String) => {
        val skewKey = (c: org.apache.spark.sql.Column) =>
          when(pmod(c, lit(10)) < 3, lit(0L)).otherwise(c)
        val probe = Tables.lineitem(s, d)
          .select(skewKey(col("l_orderkey")).as("k"), col("l_quantity"))
        val dim = Tables.orders(s, d)
          .select(skewKey(col("o_orderkey")).as("k"), col("o_orderpriority"))
          .groupBy("k").agg(min(col("o_orderpriority")).as("prio"))
        SkewJoin.saltedInnerJoinHot(probe, dim, "k", numSalts = 8)
          .groupBy("prio")
          .agg(count(lit(1)).as("n_rows"), Det.moneySum(col("l_quantity")).as("sum_qty"))
          .orderBy("prio")
      },
      Some(s"""WITH probe AS (
             |  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey END AS k,
             |    l_quantity FROM lineitem),
             |dim AS (
             |  SELECT CASE WHEN o_orderkey % 10 < 3 THEN 0 ELSE o_orderkey END AS k,
             |    min(o_orderpriority) AS prio FROM orders GROUP BY 1)
             |SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  ${Det.moneySumSql("l_quantity")} AS sum_qty
             |FROM probe JOIN dim USING (k)
             |GROUP BY prio ORDER BY prio""".stripMargin))
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.trajectory.{TrajectoryOps, BehaviorGenerator, Extrinsics}
import graft.graph.{Communities, Knn, ConnectedComponents, ConnectivityCache, PageRank, ShortestPaths, Triangles}

/** Trajectory + graph family (SURVEY.md §2.5 W7/W8, §2.10 generator/CC). */
object TrajectoryQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // W7 — rate-clamp recurrence (depends on previous OUTPUT → sorted
    // per-group scan, not a window; reference: transform_track.py:215-262).
    // Oracle: the same recurrence as a recursive CTE.
    ("q_rate_clamp",
      (s: SparkSession, d: String) => {
        TrajectoryOps.rateClampOrdered(Tables.events(s, d), "user_id",
            orderCols = Seq("ts", "event_id"), "value", maxDelta = 5.0)
          .orderBy("seq", "idx")
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT CAST(user_id AS VARCHAR) AS seq,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS idx,
             |    value AS target
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             |r(seq, idx, target, clamped) AS (
             |  SELECT seq, idx, target, target FROM t WHERE idx = 1
             |  UNION ALL
             |  SELECT t.seq, t.idx, t.target,
             |    r.clamped + greatest(least(t.target - r.clamped, 5.0), -5.0)
             |  FROM r JOIN t ON t.seq = r.seq AND t.idx = r.idx + 1)
             |SELECT seq, idx, target, clamped FROM r ORDER BY seq, idx""".stripMargin)),

    // EWMA smoothing per user — the blending recurrence beside the
    // clamp's bounding one (telemetry denoising / drift-tolerant
    // baselines). α = 0.25 has a short binary expansion, and
    // s + α·(x − s) is evaluated in the identical association order in
    // both engines, so every recursive step hash-replays.
    ("q_ewma_smooth",
      (s: SparkSession, d: String) => {
        TrajectoryOps.ewmaOrdered(Tables.events(s, d), "user_id",
            orderCols = Seq("ts", "event_id"), "value", alpha = 0.25)
          .orderBy("seq", "idx")
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT CAST(user_id AS VARCHAR) AS seq,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS idx,
             |    value AS target
             |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
             |r(seq, idx, target, smoothed) AS (
             |  SELECT seq, idx, target, target FROM t WHERE idx = 1
             |  UNION ALL
             |  SELECT t.seq, t.idx, t.target,
             |    r.smoothed + 0.25 * (t.target - r.smoothed)
             |  FROM r JOIN t ON t.seq = r.seq AND t.idx = r.idx + 1)
             |SELECT seq, idx, target, smoothed FROM r ORDER BY seq, idx""".stripMargin)),

    // E8 matrix kernel in isolation: q_extrinsic_export stays golden-only
    // (seeded-RNG upstream), but the 4×4 view-matrix math itself is pure —
    // fed deterministic lineitem-derived poses it hash-verifies against
    // DuckDB trig. The oracle mirrors the JVM arithmetic exactly: same
    // association order, and radians() for the degree conversion — measured
    // bit-identical to Java's Math.toRadians on all 360 integer degrees,
    // whereas the spelled-out `deg / 180.0 * pi()` form diverges on 90 of
    // them (DuckDB evaluates that expression differently).
    ("q_extrinsic_matrix",
      (s: SparkSession, d: String) => {
        val poses = Tables.lineitem(s, d)
          .filter(col("l_orderkey") % 17 === 0)
          .select(
            (col("l_orderkey") * 10 + col("l_linenumber")).as("frame"),
            (col("l_quantity") * 37.0).as("px"),
            (col("l_extendedprice") * 0.001).as("py"),
            (col("l_discount") * 1000.0).as("pz"),
            ((col("l_orderkey") * 7) % 360 - 180).cast("double").as("roll"),
            ((col("l_partkey") * 11) % 360 - 180).cast("double").as("pitch"),
            ((col("l_suppkey") * 53) % 360 - 180).cast("double").as("yaw"))
        Extrinsics.extrinsicRows(poses, "frame",
            "px", "py", "pz", "roll", "pitch", "yaw")
          .orderBy("frame")
      },
      Some("""WITH poses AS (
             |  SELECT l_orderkey * 10 + l_linenumber AS frame,
             |    l_quantity * 37.0 AS px, l_extendedprice * 0.001 AS py,
             |    l_discount * 1000.0 AS pz,
             |    CAST((l_orderkey * 7) % 360 - 180 AS DOUBLE) AS roll,
             |    CAST((l_partkey * 11) % 360 - 180 AS DOUBLE) AS pitch,
             |    CAST((l_suppkey * 53) % 360 - 180 AS DOUBLE) AS yaw
             |  FROM lineitem WHERE l_orderkey % 17 = 0),
             |t AS (
             |  SELECT frame,
             |    cos(radians(yaw)) AS cy, sin(radians(yaw)) AS sy,
             |    cos(radians(pitch)) AS cp, sin(radians(pitch)) AS sp,
             |    cos(radians(roll)) AS cr, sin(radians(roll)) AS sr,
             |    px * 0.01 AS tx, py * 0.01 AS ty, pz * 0.01 AS tz
             |  FROM poses),
             |r AS (
             |  SELECT frame, tx, ty, tz,
             |    cy * cp AS r00, cy * sp * sr - sy * cr AS r01, cy * sp * cr + sy * sr AS r02,
             |    sy * cp AS r10, sy * sp * sr + cy * cr AS r11, sy * sp * cr - cy * sr AS r12,
             |    -sp AS r20, cp * sr AS r21, cp * cr AS r22
             |  FROM t)
             |SELECT frame,
             |  r00 AS m00, r10 AS m01, r20 AS m02, -(r00 * tx + r10 * ty + r20 * tz) AS m03,
             |  r01 AS m10, r11 AS m11, r21 AS m12, -(r01 * tx + r11 * ty + r21 * tz) AS m13,
             |  r02 AS m20, r12 AS m21, r22 AS m22, -(r02 * tx + r12 * ty + r22 * tz) AS m23,
             |  CAST(0 AS DOUBLE) AS m30, CAST(0 AS DOUBLE) AS m31,
             |  CAST(0 AS DOUBLE) AS m32, CAST(1 AS DOUBLE) AS m33
             |FROM r ORDER BY frame""".stripMargin)),

    // Radial-distance simplification: keep a sample iff it moved ≥ eps
    // from the last KEPT sample (first always kept) — trajectory storage
    // decimation as the same single-shuffle recurrence as the rate clamp,
    // with the recursive-CTE oracle carrying the last-kept state.
    ("q_radial_simplify",
      (s: SparkSession, d: String) => {
        TrajectoryOps.radialSimplify(
            Tables.events(s, d).filter(col("user_id") < 50),
            "user_id", orderCols = Seq("ts", "event_id"), "value", eps = 20.0)
          .orderBy("seq", "idx")
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT CAST(user_id AS VARCHAR) AS seq,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS idx,
             |    value FROM events WHERE user_id < 50),
             |r(seq, idx, value, kept, last_kept) AS (
             |  SELECT seq, idx, value, TRUE, value FROM t WHERE idx = 1
             |  UNION ALL
             |  SELECT t.seq, t.idx, t.value,
             |    abs(t.value - r.last_kept) >= 20.0,
             |    CASE WHEN abs(t.value - r.last_kept) >= 20.0 THEN t.value ELSE r.last_kept END
             |  FROM r JOIN t ON t.seq = r.seq AND t.idx = r.idx + 1)
             |SELECT seq, idx, value, kept FROM r ORDER BY seq, idx""".stripMargin)),

    // W8 — arc-length-uniform resample to 5 points per sequence with
    // linear interpolation (reference: nav_utils.py:233-271). lineitem
    // quantities are the segment lengths, extendedprice the sampled value.
    ("q_resample",
      (s: SparkSession, d: String) => {
        val pts = graft.operators.Windows.cumSum(
          Tables.lineitem(s, d)
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
            .filter(col("l_orderkey") < 2000),
          part = Seq("l_orderkey"),
          order = Seq(col("l_linenumber"), col("l_quantity")),
          v = col("l_quantity"), as = "cum_dist")
        TrajectoryOps.resampleByCount(pts, "l_orderkey", "l_extendedprice", n = 5)
          .orderBy("seq", "sample_idx")
      },
      Some("""WITH RECURSIVE pts AS (
             |  SELECT l_orderkey AS seq,
             |    SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    l_extendedprice AS v
             |  FROM lineitem WHERE l_orderkey < 2000),
             |totals AS (SELECT seq, max(cum) AS total FROM pts GROUP BY seq),
             |targets AS (
             |  SELECT seq, i AS sample_idx, i * total / 4.0 AS t,
             |    CAST(NULL AS DOUBLE) AS cum, CAST(NULL AS DOUBLE) AS v, 1 AS isq
             |  FROM totals, generate_series(0, 4) g(i)),
             |puni AS (
             |  SELECT seq, CAST(NULL AS INT) AS sample_idx, cum AS t, cum, v, 0 AS isq FROM pts
             |  UNION ALL SELECT * FROM targets),
             |ann AS (
             |  SELECT *,
             |    last_value(cum IGNORE NULLS) OVER (PARTITION BY seq ORDER BY t, isq
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
             |    last_value(v IGNORE NULLS) OVER (PARTITION BY seq ORDER BY t, isq
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |    first_value(cum IGNORE NULLS) OVER (PARTITION BY seq ORDER BY t, isq
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
             |    first_value(v IGNORE NULLS) OVER (PARTITION BY seq ORDER BY t, isq
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
             |  FROM puni)
             |SELECT seq, CAST(sample_idx AS INT) AS sample_idx, t AS target_dist,
             |  CASE WHEN pc IS NULL THEN nv
             |       WHEN nc IS NULL THEN pv
             |       WHEN nc = pc THEN pv
             |       ELSE pv + (nv - pv) * (t - pc) / (nc - pc) END AS value
             |FROM ann WHERE isq = 1 ORDER BY seq, sample_idx""".stripMargin)),

    // E15/A9 — connected components over kNN edges + island ratios
    // (reference: navmesh_connectivity.py:157-207). Oracle: recursive-CTE
    // min-label closure.
    ("q_connected_components",
      (s: SparkSession, d: String) => {
        val edges = Knn.bruteForce(
            Tables.embeddings(s, d).filter(col("vec_id") < 40),
            idCol = "vec_id", vecCol = "embedding", k = 3, dim = 64)
          .select(col("src_id").as("src"), col("dst_id").as("dst"))
        ConnectedComponents.components(edges)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE pts AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id < 40),
             |pairs AS (
             |  SELECT a.vec_id AS src, b.vec_id AS dst,
             |    sqrt(list_reduce(list_transform(range(1, len(a.v)+1),
             |      i -> (a.v[i]-b.v[i])*(a.v[i]-b.v[i])), (x,y) -> x+y)) AS dist
             |  FROM pts a JOIN pts b ON a.vec_id <> b.vec_id),
             |knn AS (
             |  SELECT src, dst FROM (
             |    SELECT *, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn
             |    FROM pairs) WHERE rn <= 3),
             |edges AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
             |cc(node, label) AS (
             |  SELECT DISTINCT src, src FROM edges
             |  UNION
             |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node)
             |SELECT node, min(label) AS component FROM cc GROUP BY node ORDER BY node""".stripMargin)),

    // Link-graph centrality (fixed-point integer PageRank, 3 rounds) on
    // the bipartite customer↔supplier purchase graph — the web-graph
    // quality-weighting signal re-expressed on the fixture. Bidirected
    // edges, so no dangling mass; every round's integer arithmetic
    // replays exactly in the oracle's unrolled CTEs.
    ("q_page_rank",
      (s: SparkSession, d: String) => {
        val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val pairs = li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("a"),
            concat(lit("s"), col("l_suppkey")).as("b")).distinct()
        val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
        PageRank.pageRank(edges, "a", "b", iters = 3).orderBy("node")
      },
      Some("""WITH pr0 AS (
             |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |e AS (SELECT a AS src, b AS dst FROM pr0
             |      UNION ALL SELECT b, a FROM pr0),
             |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY 1),
             |nodes AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
             |r0 AS (SELECT node, 1000000000000 // n_nodes AS rank,
             |  (15 * (1000000000000 // n_nodes)) // 100 AS base FROM nodes, nn),
             |s1 AS (SELECT e.dst, SUM(r.rank // d.out_deg) AS in_sum
             |  FROM r0 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src GROUP BY 1),
             |r1 AS (SELECT r.node, r.base + (85 * coalesce(s1.in_sum, 0)) // 100 AS rank, r.base
             |  FROM r0 r LEFT JOIN s1 ON r.node = s1.dst),
             |s2 AS (SELECT e.dst, SUM(r.rank // d.out_deg) AS in_sum
             |  FROM r1 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src GROUP BY 1),
             |r2 AS (SELECT r.node, r.base + (85 * coalesce(s2.in_sum, 0)) // 100 AS rank, r.base
             |  FROM r1 r LEFT JOIN s2 ON r.node = s2.dst),
             |s3 AS (SELECT e.dst, SUM(r.rank // d.out_deg) AS in_sum
             |  FROM r2 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src GROUP BY 1),
             |r3 AS (SELECT r.node, r.base + (85 * coalesce(s3.in_sum, 0)) // 100 AS rank
             |  FROM r2 r LEFT JOIN s3 ON r.node = s3.dst)
             |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY node""".stripMargin)),

    // Personalized (topic-sensitive) PageRank on the same purchase
    // graph: restart mass only on 4 seed suppliers — importance RELATIVE
    // to a trusted set (the TrustRank/seed-proximity corpus-weighting
    // signal), where q_page_rank scores global centrality. Unreached
    // nodes hold exactly 0. Same integer fixed-point replay: the oracle
    // unrolls the identical 3 rounds.
    ("q_personalized_pagerank",
      (s: SparkSession, d: String) => {
        val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val pairs = li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("a"),
            concat(lit("s"), col("l_suppkey")).as("b")).distinct()
        val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
        val seeds = li.filter(col("l_suppkey") <= 4)
          .select(concat(lit("s"), col("l_suppkey")).as("node")).distinct()
        PageRank.personalized(edges, "a", "b", seeds, iters = 3).orderBy("node")
      },
      Some("""WITH pr0 AS (
             |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |e AS (SELECT a AS src, b AS dst FROM pr0
             |      UNION ALL SELECT b, a FROM pr0),
             |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY 1),
             |seeds AS (SELECT DISTINCT 's' || l_suppkey AS node
             |  FROM lineitem WHERE l_suppkey <= 4),
             |nodes AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e
             |  UNION ALL SELECT node FROM seeds)),
             |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_seeds FROM seeds),
             |r0 AS (SELECT n.node,
             |    CASE WHEN s.node IS NOT NULL
             |         THEN 1000000000000 // n_seeds ELSE 0 END AS rank,
             |    CASE WHEN s.node IS NOT NULL
             |         THEN (15 * (1000000000000 // n_seeds)) // 100 ELSE 0 END AS base
             |  FROM nodes n LEFT JOIN seeds s ON n.node = s.node, ns),
             |s1 AS (SELECT e.dst, SUM(r.rank // d.out_deg) AS in_sum
             |  FROM r0 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src GROUP BY 1),
             |r1 AS (SELECT r.node, r.base + (85 * coalesce(s1.in_sum, 0)) // 100 AS rank, r.base
             |  FROM r0 r LEFT JOIN s1 ON r.node = s1.dst),
             |s2 AS (SELECT e.dst, SUM(r.rank // d.out_deg) AS in_sum
             |  FROM r1 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src GROUP BY 1),
             |r2 AS (SELECT r.node, r.base + (85 * coalesce(s2.in_sum, 0)) // 100 AS rank, r.base
             |  FROM r1 r LEFT JOIN s2 ON r.node = s2.dst),
             |s3 AS (SELECT e.dst, SUM(r.rank // d.out_deg) AS in_sum
             |  FROM r2 r JOIN e ON r.node = e.src JOIN deg d ON e.src = d.src GROUP BY 1),
             |r3 AS (SELECT r.node, r.base + (85 * coalesce(s3.in_sum, 0)) // 100 AS rank
             |  FROM r2 r LEFT JOIN s3 ON r.node = s3.dst)
             |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY node""".stripMargin)),

    // Majority-vote label propagation (3 synchronous rounds,
    // deterministic count-DESC/label-ASC tie-break) on the same
    // bipartite purchase graph as q_page_rank — community detection
    // beside CC's reachability and PageRank's centrality. Every round's
    // vote replays exactly in the oracle's unrolled CTEs.
    ("q_label_prop",
      (s: SparkSession, d: String) => {
        val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val pairs = li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("a"),
            concat(lit("s"), col("l_suppkey")).as("b")).distinct()
        Communities.labelPropagation(pairs, "a", "b", rounds = 3)
          .orderBy("node")
      },
      Some("""WITH p AS (
             |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
             |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
             |v1 AS (SELECT e.dst AS node, l.label, count(*) AS c
             |       FROM e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
             |l1 AS (SELECT node, label FROM (
             |  SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
             |  FROM v1) WHERE rn = 1),
             |v2 AS (SELECT e.dst AS node, l.label, count(*) AS c
             |       FROM e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
             |l2 AS (SELECT node, label FROM (
             |  SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
             |  FROM v2) WHERE rn = 1),
             |v3 AS (SELECT e.dst AS node, l.label, count(*) AS c
             |       FROM e JOIN l2 l ON l.node = e.src GROUP BY 1, 2),
             |l3 AS (SELECT node, label FROM (
             |  SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
             |  FROM v3) WHERE rn = 1)
             |SELECT node, label FROM l3 ORDER BY node""".stripMargin)),

    // Newman modularity of the q_label_prop labeling — the "is this
    // clustering better than chance" audit (Q ≈ 0 detects LPA's trivial
    // one-community collapse). Integer numerator over integer
    // denominator, one double division — hash-exact.
    ("q_modularity",
      (s: SparkSession, d: String) => {
        val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val pairs = li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("a"),
            concat(lit("s"), col("l_suppkey")).as("b")).distinct()
        // ONE symmetrize/materialize shared by the vote and the score:
        // the labels the propagation returns are checkpointed, so without
        // this the modularity side re-derived the whole edge construction
        // (join + distinct + union) from the base tables a second time
        val sym = Communities.symmetrize(pairs, "a", "b").localCheckpoint(true)
        // materialize the labeling: modularity joins it on BOTH edge
        // endpoints, and un-checkpointed the full vote loop would
        // execute once per join side
        val labels = Communities.labelPropagationOn(sym, rounds = 3)
          .localCheckpoint(true)
        Communities.modularityOn(sym, labels, "node", "label")
      },
      Some("""WITH p AS (
             |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
             |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
             |v1 AS (SELECT e.dst AS node, l.label, count(*) AS c
             |       FROM e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
             |l1 AS (SELECT node, label FROM (
             |  SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
             |  FROM v1) WHERE rn = 1),
             |v2 AS (SELECT e.dst AS node, l.label, count(*) AS c
             |       FROM e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
             |l2 AS (SELECT node, label FROM (
             |  SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
             |  FROM v2) WHERE rn = 1),
             |v3 AS (SELECT e.dst AS node, l.label, count(*) AS c
             |       FROM e JOIN l2 l ON l.node = e.src GROUP BY 1, 2),
             |l3 AS (SELECT node, label FROM (
             |  SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
             |  FROM v3) WHERE rn = 1),
             |el AS (SELECT la.label AS _la, lb.label AS _lb
             |  FROM e JOIN l3 la ON la.node = e.src JOIN l3 lb ON lb.node = e.dst),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS two_m,
             |  CAST(sum(CASE WHEN _la = _lb THEN 1 ELSE 0 END) AS BIGINT) AS e_in FROM el),
             |g AS (SELECT CAST(sum(c * c) AS BIGINT) AS sum_deg_sq FROM (
             |  SELECT _la, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1))
             |SELECT two_m, e_in, sum_deg_sq,
             |  CAST(two_m * e_in - sum_deg_sq AS DOUBLE)
             |    / (CAST(two_m AS DOUBLE) * CAST(two_m AS DOUBLE)) AS modularity
             |FROM t, g""".stripMargin)),

    // Bounded multi-source BFS over the same kNN graph as
    // q_connected_components: hop distance from a seed set (vec_id < 3)
    // within ≤ 8 hops — the reachability-DEPTH signal (seed-distance
    // quality weighting) beside CC's island membership. The oracle
    // replays the identical capped semantics with a hop-limited
    // recursive CTE; Spark runs the frontier form that exits early once
    // no distance improves.
    ("q_bfs_hops",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d).filter(col("vec_id") < 40)
        val knn = Knn.bruteForce(emb, idCol = "vec_id", vecCol = "embedding",
            k = 3, dim = 64)
          .select(col("src_id").as("src"), col("dst_id").as("dst"))
        val edges = knn.union(knn.select(col("dst").as("src"), col("src").as("dst")))
        val sources = emb.filter(col("vec_id") < 3).select(col("vec_id").as("node"))
        ShortestPaths.bounded(edges, sources, maxHops = 8)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE pts AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id < 40),
             |pairs AS (
             |  SELECT a.vec_id AS src, b.vec_id AS dst,
             |    sqrt(list_reduce(list_transform(range(1, len(a.v)+1),
             |      i -> (a.v[i]-b.v[i])*(a.v[i]-b.v[i])), (x,y) -> x+y)) AS dist
             |  FROM pts a JOIN pts b ON a.vec_id <> b.vec_id),
             |knn AS (
             |  SELECT src, dst FROM (
             |    SELECT *, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn
             |    FROM pairs) WHERE rn <= 3),
             |edges AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
             |sp(node, d, hops) AS (
             |  SELECT vec_id, CAST(0 AS BIGINT), 0 FROM pts WHERE vec_id < 3
             |  UNION
             |  SELECT e.dst, sp.d + 1, sp.hops + 1
             |  FROM sp JOIN edges e ON e.src = sp.node WHERE sp.hops < 8)
             |SELECT node, CAST(min(d) AS BIGINT) AS dist
             |FROM sp GROUP BY node ORDER BY node""".stripMargin)),

    // Rounds-bounded k-core peel (k=48, 2 peel waves) on the bipartite
    // purchase graph shared with q_page_rank/q_label_prop — the density
    // floor beside label-prop's communities: a node survives only if
    // ≥48 of its neighbors ALSO survive, the link-farm/hub-fringe
    // separator. Parameters chosen so the fixture cascades across BOTH
    // waves (193 → 148 survivors at sf0.01): wave 2 peels nodes whose
    // degree only fell below k because wave 1 removed their fringe —
    // the recursive part of the definition, not just a degree filter.
    // The oracle unrolls the identical rounds as (degree → keep →
    // edge-filter) CTE triples.
    ("q_kcore",
      (s: SparkSession, d: String) => {
        val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val pairs = li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("a"),
            concat(lit("s"), col("l_suppkey")).as("b")).distinct()
        Communities.kCorePeel(pairs, "a", "b", k = 48, rounds = 2)
          .orderBy("node")
      },
      Some("""WITH p AS (
             |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |e0 AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
             |d1 AS (SELECT src, count(*) AS c FROM e0 GROUP BY src),
             |n1 AS (SELECT src FROM d1 WHERE c >= 48),
             |e1 AS (SELECT e.src, e.dst FROM e0 e
             |  JOIN n1 a ON e.src = a.src JOIN n1 b ON e.dst = b.src),
             |d2 AS (SELECT src, count(*) AS c FROM e1 GROUP BY src),
             |n2 AS (SELECT src FROM d2 WHERE c >= 48),
             |e2 AS (SELECT e.src, e.dst FROM e1 e
             |  JOIN n2 a ON e.src = a.src JOIN n2 b ON e.dst = b.src)
             |SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
             |FROM e2 GROUP BY src ORDER BY node""".stripMargin)),

    // Per-node triangle counts with degree-ordered orientation — the
    // clustering/link-farm signal beside CC and PageRank. Graph: parts
    // adjacent by line number within an order (sparse co-purchase
    // adjacency; dups/orientations collapsed by the operator). The
    // oracle enumerates each triangle once as an id-ordered path a<b<c —
    // orientation changes the plan, never the triangle set.
    ("q_triangle_count",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey")
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — the
        // partkey tie-break makes the adjacency deterministic in both
        // engines (identical full-row dups yield the same pair multiset
        // under any order).
        val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
        val edges = li.withColumn("_next", lead("l_partkey", 1).over(w))
          .filter(col("_next").isNotNull)
          .select(col("l_partkey").as("x"), col("_next").as("y"))
        Triangles.nodeTriangles(edges, "x", "y").orderBy("node")
      },
      Some("""WITH adj AS (
             |  SELECT l_partkey AS x,
             |    lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS y
             |  FROM lineitem),
             |e AS (
             |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
             |  FROM adj WHERE y IS NOT NULL AND x <> y),
             |t AS (
             |  SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
             |  FROM e e1
             |  JOIN e e2 ON e2.a = e1.b
             |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
             |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
             |  SELECT v1 AS node FROM t
             |  UNION ALL SELECT v2 FROM t
             |  UNION ALL SELECT v3 FROM t)
             |GROUP BY node ORDER BY node""".stripMargin)),

    ("q_island_ratios",
      (s: SparkSession, d: String) => {
        val edges = Knn.bruteForce(
            Tables.embeddings(s, d).filter(col("vec_id") < 40),
            idCol = "vec_id", vecCol = "embedding", k = 3, dim = 64)
          .select(col("src_id").as("src"), col("dst_id").as("dst"))
        ConnectedComponents.islandRatios(
            ConnectedComponents.components(edges), minRatio = 0.10)
      },
      Some("""WITH RECURSIVE pts AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id < 40),
             |pairs AS (
             |  SELECT a.vec_id AS src, b.vec_id AS dst,
             |    sqrt(list_reduce(list_transform(range(1, len(a.v)+1),
             |      i -> (a.v[i]-b.v[i])*(a.v[i]-b.v[i])), (x,y) -> x+y)) AS dist
             |  FROM pts a JOIN pts b ON a.vec_id <> b.vec_id),
             |knn AS (
             |  SELECT src, dst FROM (
             |    SELECT *, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn
             |    FROM pairs) WHERE rn <= 3),
             |edges AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
             |cc(node, label) AS (
             |  SELECT DISTINCT src, src FROM edges
             |  UNION
             |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
             |comp AS (SELECT node, min(label) AS component FROM cc GROUP BY node),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM comp)
             |SELECT component, CAST(count(*) AS BIGINT) AS size,
             |  count(*) / (SELECT n FROM tot) AS ratio
             |FROM comp GROUP BY component
             |HAVING count(*) / (SELECT n FROM tot) >= 0.10
             |ORDER BY size DESC, component ASC""".stripMargin)),

    // S14 — the per-map connectivity cache DOCUMENT (reference:
    // navmesh_connectivity.py:209-231): scalar summary fields of the
    // analysis the cache persists. The nested island_ratios array and the
    // read-through/invalidation flow are spec-tested
    // (ConnectivityCacheSpec) — nested columns aren't oracle-hashable.
    ("q_connectivity_doc",
      (s: SparkSession, d: String) => {
        val pts = Tables.embeddings(s, d).filter(col("vec_id") < 40)
        ConnectivityCache.analysisDoc(pts, mapName = "emb40",
            idCol = "vec_id", vecCol = "embedding", dim = 64, k = 3,
            minRatio = 0.10, analysisDate = "2026-08-13", fingerprint = 0L)
          .select(col("map_name"), col("analysis_date"),
            col("sample_count"), col("k_nearest").cast("long").as("k_nearest"),
            col("num_islands"), col("selected_island_size"))
      },
      Some("""WITH RECURSIVE pts AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings WHERE vec_id < 40),
             |pairs AS (
             |  SELECT a.vec_id AS src, b.vec_id AS dst,
             |    sqrt(list_reduce(list_transform(range(1, len(a.v)+1),
             |      i -> (a.v[i]-b.v[i])*(a.v[i]-b.v[i])), (x,y) -> x+y)) AS dist
             |  FROM pts a JOIN pts b ON a.vec_id <> b.vec_id),
             |knn AS (
             |  SELECT src, dst FROM (
             |    SELECT *, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn
             |    FROM pairs) WHERE rn <= 3),
             |edges AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn),
             |cc(node, label) AS (
             |  SELECT DISTINCT src, src FROM edges
             |  UNION
             |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
             |comp AS (SELECT node, min(label) AS component FROM cc GROUP BY node),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM comp),
             |isl AS (
             |  SELECT component, CAST(count(*) AS BIGINT) AS size,
             |    count(*) / (SELECT n FROM tot) AS ratio
             |  FROM comp GROUP BY component)
             |SELECT 'emb40' AS map_name, '2026-08-13' AS analysis_date,
             |  (SELECT CAST(count(*) AS BIGINT) FROM pts) AS sample_count,
             |  CAST(3 AS BIGINT) AS k_nearest,
             |  (SELECT CAST(count(*) AS BIGINT) FROM isl) AS num_islands,
             |  (SELECT max(size) FROM isl WHERE ratio >= 0.10) AS selected_island_size""".stripMargin)),

    // E5/E6 — seeded behavior-trajectory generation (UDTF via
    // flatMapGroups; reference: behavior_executor.py:638-857). Oracled:
    // the generator's counter-based md5 draws are addressable in SQL, so
    // the whole state machine replays as a recursive CTE (the rate-clamp
    // playbook) — see [[behaviorOracleSql]]. The committed golden stays
    // as a drift guard (GoldenSpec); invariants in BehaviorGeneratorSpec.
    ("q_behavior_trajectory",
      (s: SparkSession, d: String) => {
        val jobs = Tables.nation(s, d).select(
          concat(lit("seq_"), col("n_nationkey")).as("sequence_id"),
          (col("n_nationkey") + 10001L).as("seed"))
        val samples = BehaviorGenerator.generateAll(jobs)
        val withDist = TrajectoryOps.cumArcLength(samples, "sequence_id", "frame",
          col("x"), col("y"), col("z"))
        withDist.groupBy("sequence_id")
          .agg(count(lit(1)).as("n_frames"),
            round(max(col("cum_dist")), 3).as("path_length_cm"),
            countDistinct(col("segment_idx")).as("n_segments"),
            round(min(col("pitch")), 3).as("min_pitch"),
            round(max(col("pitch")), 3).as("max_pitch"))
          .orderBy("sequence_id")
      },
      Some(behaviorOracleSql)),

    // E8 composition check, DuckDB-oracled: the generator→extrinsic
    // pipeline (the exact q_extrinsic_export dataflow) with every matrix
    // entry rounded to 9 decimals, replayed end-to-end in SQL — the
    // behavior state CTE feeding the q_extrinsic_matrix formula. This
    // pins the COMPOSITION (pose wiring, roll=0, cm→m scaling, Rᵀ/−Rᵀt
    // layout) that the raw-double export below cannot oracle (trig ulps);
    // the export keeps its byte-exact golden for the raw values.
    ("q_extrinsic_traj",
      (s: SparkSession, d: String) => {
        val jobs = Tables.nation(s, d).filter(col("n_nationkey") < 3)
          .select(concat(lit("seq_"), col("n_nationkey")).as("sequence_id"),
            (col("n_nationkey") + 10001L).as("seed"))
        val samples = BehaviorGenerator.generateAll(jobs)
          .withColumn("roll", lit(0.0))
        val rows = Extrinsics.extrinsicRowsKeyed(samples, Seq("sequence_id"),
          "frame", "x", "y", "z", "roll", "pitch", "yaw")
        val cells = for (r <- 0 until 4; c <- 0 until 4)
          yield (round(col(s"m$r$c"), 9) + lit(0.0)).as(s"m$r$c")
        rows.select(Seq(col("sequence_id"), col("frame")) ++ cells: _*)
          .orderBy("sequence_id", "frame")
      },
      Some(extrinsicTrajOracleSql)),

    // E8 — extrinsic matrix export rows (frame, m00..m33; reference:
    // camera_exporter.py:383-437). Rows-only: orthonormality + golden
    // values covered by ExtrinsicsSpec; the 9-decimal composition replay
    // above is the oracle-side evidence for this exact dataflow.
    ("q_extrinsic_export",
      (s: SparkSession, d: String) => {
        val jobs = Tables.nation(s, d).filter(col("n_nationkey") < 3)
          .select(concat(lit("seq_"), col("n_nationkey")).as("sequence_id"),
            (col("n_nationkey") + 10001L).as("seed"))
        val samples = BehaviorGenerator.generateAll(jobs)
          .withColumn("roll", lit(0.0))
        Extrinsics.extrinsicRows(samples, "frame", "x", "y", "z",
            "roll", "pitch", "yaw")
          .orderBy("frame")
      },
      None)
  )

  /** DuckDB replay of [[BehaviorGenerator.generate]] under the default
    * [[BehaviorGenerator.Config]], built programmatically so every
    * constant (step, yaw step, weighted-choice thresholds) is the exact
    * double the kernel computes — rendered through Double.toString and
    * re-parsed with CAST('…' AS DOUBLE), which round-trips bit-exactly.
    *
    * Structure: segment draws are addressed uniforms (never sequential),
    * so segments materialize as a flat table (behavior, raw length, roam
    * offset per k), cumulative raw lengths give start frames (clipping
    * only ever shortens the LAST surviving segment, so raw cumsums are
    * correct starts), and the per-frame state machine is one recursive
    * CTE carrying (x, y, yaw, pitch, roam). The yaw/pitch chains are
    * pure +,−,×,floor,min/max — bit-identical across engines; x/y pass
    * through cos/sin (measured ≤1 ulp apart on ~0.2% of inputs), which
    * only the 3-decimal-rounded path-length aggregate consumes, so the
    * ~1e-12 worst-case drift is absorbed. Expressions like
    * (r.yaw + ro) − r.yaw are deliberately NOT simplified — the kernel
    * computes exactly that tree.
    */
  private[queries] def behaviorOracleSql: String =
    behaviorStateCte("") + s"""
       |,dist AS (
       |  SELECT seq, pitch, seg,
       |    coalesce(sqrt((x - lag(x) OVER w) * (x - lag(x) OVER w) +
       |                  (y - lag(y) OVER w) * (y - lag(y) OVER w)), CAST(0 AS DOUBLE)) AS seg_dist
       |  FROM pos WINDOW w AS (PARTITION BY seq ORDER BY f))
       |SELECT seq AS sequence_id,
       |  count(*) AS n_frames,
       |  round(sum(seg_dist), 3) AS path_length_cm,
       |  count(DISTINCT seg) AS n_segments,
       |  round(min(pitch), 3) AS min_pitch,
       |  round(max(pitch), 3) AS max_pitch
       |FROM dist GROUP BY seq ORDER BY sequence_id""".stripMargin

  /** The generator→extrinsic COMPOSITION replayed in SQL: the same
    * per-frame state CTE feeding the view-matrix trees of
    * [[Extrinsics.extrinsicMatrix]] (the q_extrinsic_matrix oracle's
    * formula), every entry rounded to 9 decimals (+0.0 normalizes any
    * signed zero the rounding direction could produce). The yaw/pitch
    * inputs are bit-exact; the rotation entries carry at most the direct
    * 1-ulp cos/sin divergence and the translations the ~1e-15
    * accumulated x/y drift — 9 decimals is 6+ orders of slack, and the
    * nation-seeded inputs are SF-invariant, so the comparison is a
    * frozen constant once green. */
  private[queries] def extrinsicTrajOracleSql: String = {
    // camera height from the SAME Config the generator runs with — a
    // changed zOffsetCm default must move the oracle too, not surface
    // as an opaque hash mismatch (Double.toString round-trips exactly,
    // the dl(...) device of behaviorStateCte)
    val zOffset = BehaviorGenerator.Config().zOffsetCm
    behaviorStateCte(" WHERE n_nationkey < 3") + s"""
       |,tt AS (
       |  SELECT seq, f,
       |    cos(radians(yaw)) AS cy, sin(radians(yaw)) AS sy,
       |    cos(radians(pitch)) AS cp, sin(radians(pitch)) AS sp,
       |    cos(radians(CAST(0 AS DOUBLE))) AS cr, sin(radians(CAST(0 AS DOUBLE))) AS sr,
       |    x * CAST('0.01' AS DOUBLE) AS tx, y * CAST('0.01' AS DOUBLE) AS ty,
       |    CAST('$zOffset' AS DOUBLE) * CAST('0.01' AS DOUBLE) AS tz
       |  FROM pos),
       |rr AS (
       |  SELECT seq, f, tx, ty, tz,
       |    cy * cp AS r00, cy * sp * sr - sy * cr AS r01, cy * sp * cr + sy * sr AS r02,
       |    sy * cp AS r10, sy * sp * sr + cy * cr AS r11, sy * sp * cr - cy * sr AS r12,
       |    -sp AS r20, cp * sr AS r21, cp * cr AS r22
       |  FROM tt)
       |SELECT seq AS sequence_id, CAST(f AS INT) AS frame,
       |  round(r00, 9) + CAST(0 AS DOUBLE) AS m00, round(r10, 9) + CAST(0 AS DOUBLE) AS m01,
       |  round(r20, 9) + CAST(0 AS DOUBLE) AS m02,
       |  round(-(r00 * tx + r10 * ty + r20 * tz), 9) + CAST(0 AS DOUBLE) AS m03,
       |  round(r01, 9) + CAST(0 AS DOUBLE) AS m10, round(r11, 9) + CAST(0 AS DOUBLE) AS m11,
       |  round(r21, 9) + CAST(0 AS DOUBLE) AS m12,
       |  round(-(r01 * tx + r11 * ty + r21 * tz), 9) + CAST(0 AS DOUBLE) AS m13,
       |  round(r02, 9) + CAST(0 AS DOUBLE) AS m20, round(r12, 9) + CAST(0 AS DOUBLE) AS m21,
       |  round(r22, 9) + CAST(0 AS DOUBLE) AS m22,
       |  round(-(r02 * tx + r12 * ty + r22 * tz), 9) + CAST(0 AS DOUBLE) AS m23,
       |  CAST(0 AS DOUBLE) AS m30, CAST(0 AS DOUBLE) AS m31,
       |  CAST(0 AS DOUBLE) AS m32, CAST(1 AS DOUBLE) AS m33
       |FROM rr ORDER BY sequence_id, frame""".stripMargin
  }

  private def behaviorStateCte(jobsWhere: String): String = {
    val cfg = BehaviorGenerator.Config()
    val dt = 1.0 / cfg.fps
    val step = cfg.speedCmPerSec * dt
    val yawStep = cfg.yawRateDegPerSec * dt
    val nFrames = (cfg.durationSeconds * cfg.fps).toInt
    val lenRange = cfg.maxSegmentFrames - cfg.minSegmentFrames + 1
    val maxSegs = math.ceil(nFrames.toDouble / cfg.minSegmentFrames).toInt
    def dl(x: Double) = s"CAST('$x' AS DOUBLE)"
    // weighted choice: r = u·total against the kernel's left-associated
    // partial sums (Seq.sum and scanLeft fold identically)
    val total = cfg.behaviorWeights.map(_._2).sum
    val cums = cfg.behaviorWeights.scanLeft(0.0)(_ + _._2).tail
    val caseArms = cfg.behaviorWeights.init.zip(cums.init).map {
      case ((name, _), c) =>
        s"WHEN ub * ${dl(total)} < ${dl(c)} THEN '$name'"
    }.mkString(" ")
    val lastBehavior = cfg.behaviorWeights.last._1
    // the 60-bit md5 uniform (TextStats device): top 15 hex chars / 2^60
    def usql(key: String) =
      s"CAST(concat('0x', substring(md5($key),1,15)) AS BIGINT) / CAST(1152921504606846976 AS DOUBLE)"
    // recurrence expressions, repeated inline (recursive terms cannot
    // reference their own aliases); all mirror the kernel's trees
    val roamNew = "CASE WHEN t.is_start THEN r.yaw + t.ro ELSE r.roam END"
    val dExpr = s"(($roamNew) - r.yaw)"
    val ndExpr =
      s"($dExpr - CAST(360 AS DOUBLE) * floor(($dExpr + CAST(180 AS DOUBLE)) / CAST(360 AS DOUBLE)))"
    val clampExpr = s"greatest(least($ndExpr, ${dl(yawStep)}), -(${dl(yawStep)}))"
    val yawRoam = s"(r.yaw + $clampExpr)"
    val yawNew =
      s"""CASE WHEN t.behavior = 'random_roam' THEN $yawRoam
         |      WHEN t.behavior = 'rotate' THEN r.yaw + ${dl(yawStep)}
         |      ELSE r.yaw END""".stripMargin
    val xNew =
      s"""CASE t.behavior
         |      WHEN 'random_roam' THEN r.x + ${dl(step)} * cos(radians($yawRoam))
         |      WHEN 'translate_forward' THEN r.x + ${dl(step)} * cos(radians(r.yaw))
         |      WHEN 'translate_backward' THEN r.x - ${dl(step)} * cos(radians(r.yaw))
         |      WHEN 'translate_left' THEN r.x + ${dl(step)} * cos(radians(r.yaw + CAST(90 AS DOUBLE)))
         |      WHEN 'translate_right' THEN r.x + ${dl(step)} * cos(radians(r.yaw - CAST(90 AS DOUBLE)))
         |      ELSE r.x END""".stripMargin
    val yNew =
      s"""CASE t.behavior
         |      WHEN 'random_roam' THEN r.y + ${dl(step)} * sin(radians($yawRoam))
         |      WHEN 'translate_forward' THEN r.y + ${dl(step)} * sin(radians(r.yaw))
         |      WHEN 'translate_backward' THEN r.y - ${dl(step)} * sin(radians(r.yaw))
         |      WHEN 'translate_left' THEN r.y + ${dl(step)} * sin(radians(r.yaw + CAST(90 AS DOUBLE)))
         |      WHEN 'translate_right' THEN r.y + ${dl(step)} * sin(radians(r.yaw - CAST(90 AS DOUBLE)))
         |      ELSE r.y END""".stripMargin
    val pitchNew =
      "greatest(CAST(-45 AS DOUBLE), least(CAST(45 AS DOUBLE), r.pitch + (t.up - CAST(0.5 AS DOUBLE))))"
    s"""WITH RECURSIVE jobs AS (
       |  SELECT 'seq_' || n_nationkey AS seq,
       |    CAST(n_nationkey + 10001 AS BIGINT) AS seed
       |  FROM nation$jobsWhere),
       |seg0 AS (
       |  SELECT seq, seed, k,
       |    ${usql("seed || ':beh:' || k")} AS ub,
       |    ${usql("seed || ':len:' || k")} AS ul,
       |    ${usql("seed || ':roam:' || k")} AS ur
       |  FROM jobs, range(0, $maxSegs) t(k)),
       |seg1 AS (
       |  SELECT seq, seed, k,
       |    CASE $caseArms ELSE '$lastBehavior' END AS behavior,
       |    ${cfg.minSegmentFrames} + CAST(floor(ul * CAST($lenRange AS DOUBLE)) AS INT) AS raw_len,
       |    ur * CAST(180 AS DOUBLE) - CAST(90 AS DOUBLE) AS ro
       |  FROM seg0),
       |segc AS (
       |  SELECT seq, seed, k, behavior, ro,
       |    CAST(coalesce(sum(raw_len) OVER (PARTITION BY seq ORDER BY k
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st,
       |    raw_len
       |  FROM seg1),
       |segf AS (
       |  SELECT seq, seed, k, behavior, ro, st,
       |    least(CAST(raw_len AS BIGINT), $nFrames - st) AS seg_len
       |  FROM segc WHERE st < $nFrames),
       |frames AS (
       |  SELECT s.seq, s.seed, f.f, s.behavior, s.ro, s.k AS seg,
       |    (f.f = s.st) AS is_start,
       |    ${usql("s.seed || ':pitch:' || f.f")} AS up
       |  FROM segf s JOIN range(0, $nFrames) f(f)
       |    ON f.f >= s.st AND f.f < s.st + s.seg_len),
       |r(seq, f, x, y, yaw, pitch, roam, seg) AS (
       |  SELECT seq, CAST(-1 AS BIGINT), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
       |    ${usql("seed || ':yaw0'")} * CAST(360 AS DOUBLE) - CAST(180 AS DOUBLE),
       |    CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(-1 AS BIGINT)
       |  FROM jobs
       |  UNION ALL
       |  SELECT t.seq, t.f,
       |    $xNew,
       |    $yNew,
       |    $yawNew,
       |    $pitchNew,
       |    $roamNew,
       |    t.seg
       |  FROM r JOIN frames t ON t.seq = r.seq AND t.f = r.f + 1),
       |pos AS (SELECT seq, f, x, y, yaw, pitch, seg FROM r WHERE f >= 0)""".stripMargin
  }
}

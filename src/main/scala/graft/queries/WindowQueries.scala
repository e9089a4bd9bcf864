package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.Windows

/** Window / sequential analytics family (SURVEY.md §2.5-2.6).
  * Trajectory math stand-ins per FIXTURES.md §B: lineitem ordered by
  * (l_orderkey, l_linenumber) ≈ frames within a sequence; events ordered
  * by (user_id, ts) ≈ per-entity time series.
  */
object WindowQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // W2 — cumulative arc length (prefix sum per sequence)
    // (reference: nav_utils.py:239-242).
    ("q_cumsum_arclength",
      (s: SparkSession, d: String) => {
        Windows.cumSum(Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity"),
            part = Seq("l_orderkey"), order = Seq(col("l_linenumber"), col("l_quantity")),
            v = col("l_quantity"), as = "cum_qty")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // W3 — truncate each sequence at a running-total budget
    // (reference: worker_create.py:617-656).
    ("q_truncate_budget",
      (s: SparkSession, d: String) => {
        Windows.truncateAtBudget(
            Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity"),
            part = Seq("l_orderkey"), order = Seq(col("l_linenumber"), col("l_quantity")),
            v = col("l_quantity"), budget = 60.0)
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH c AS (
             |  SELECT l_orderkey, l_linenumber, l_quantity,
             |    SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_quantity FROM c
             |WHERE cum <= 60.0 ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // W4/W5 — consecutive-pair deltas via lag/lead (numeric stand-in for
    // yaw/pitch geometry; reference: transform_track.py:10-53).
    ("q_lead_lag_deltas",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("delta_prev", col("value") - lag(col("value"), 1).over(w))
          .withColumn("delta_next", lead(col("value"), 1).over(w) - col("value"))
          .select("user_id", "event_id", "delta_prev", "delta_next")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_prev,
             |  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value AS delta_next
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // W6 — angle unwrap as first + prefix-sum of normalized deltas
    // (reference: transform_track.py:133-155). value*4-200 spans ±200°,
    // exercising the ±180 wraparound.
    ("q_yaw_unwrap",
      (s: SparkSession, d: String) => {
        Windows.unwrapAngle(
            Tables.events(s, d)
              .select(col("user_id"), col("event_id"), col("ts"),
                ((floor(col("value") * 4) - 200).cast("double")).as("yaw")),
            part = Seq("user_id"), order = Seq(col("ts"), col("event_id")),
            angle = col("yaw"), as = "yaw_unwrapped")
          .select("user_id", "event_id", "yaw", "yaw_unwrapped")
          .orderBy("user_id", "event_id")
      },
      Some("""WITH y AS (
             |  SELECT user_id, event_id, ts, floor(value*4) - 200 AS yaw FROM events),
             |dl AS (
             |  SELECT *, yaw - lag(yaw) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
             |  FROM y),
             |nd AS (
             |  SELECT *, COALESCE(delta - 360.0 * floor((delta + 180.0)/360.0), 0.0) AS ndelta
             |  FROM dl)
             |SELECT user_id, event_id, yaw,
             |  first_value(yaw) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |  + SUM(ndelta) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS yaw_unwrapped
             |FROM nd ORDER BY user_id, event_id""".stripMargin)),

    // O3/O7 — top-k per group with deterministic tie-break
    // (reference: navmesh_connectivity.py:128-135 k-nearest top-k).
    ("q_topk_per_group",
      (s: SparkSession, d: String) => {
        Windows.topKPerGroup(Tables.orders(s, d),
            part = Seq("o_orderpriority"),
            order = Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
          .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
          .orderBy("o_orderpriority", "rank")
      },
      Some("""WITH ranked AS (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
             |  FROM orders)
             |SELECT o_orderpriority, rank, o_orderkey, o_totalprice
             |FROM ranked WHERE rank <= 3 ORDER BY o_orderpriority, rank""".stripMargin)),

    // A13 — max integer name suffix per group (naming continuity;
    // reference: worker_create.py:175-194).
    ("q_max_suffix_index",
      (s: SparkSession, d: String) => {
        Windows.maxSuffixIndex(Tables.customer(s, d), Seq("c_mktsegment"), col("c_name"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  max(CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS INTEGER)) AS max_index
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Q5 analog — sessionize by inactivity gap (10 min), batch form of the
    // session-window semantics (reference: run_render_job_headless.py:318-325).
    ("q_sessionize",
      (s: SparkSession, d: String) => {
        Windows.sessionize(Tables.events(s, d),
            part = Seq("user_id"), ts = col("ts"),
            order = Seq(col("ts"), col("event_id")), gapSeconds = 600L)
          .groupBy("user_id")
          .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |  FROM events),
             |s AS (
             |  SELECT user_id, event_id,
             |    SUM(CASE WHEN gap IS NULL OR gap > 600000000 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g)
             |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
             |  CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // W9 — stall detection: progress did not increase vs previous poll
    // (reference: monitor.py:142-149).
    // Interval-union coverage: distinct busy time per user from
    // overlapping [ts, ts + value·1s] intervals — cummax island merge,
    // one shuffle, exact integer micros (floor before the narrowing cast,
    // per the repo's cross-engine convention).
    ("q_interval_coverage",
      (s: SparkSession, d: String) => {
        val iv = Tables.events(s, d).select(
          col("user_id"),
          unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) +
            floor(col("value") * 1000000.0).cast("long")).as("e"))
        Windows.intervalCoverage(iv, part = Seq("user_id"),
            startCol = col("s"), endCol = col("e"))
          .orderBy("user_id")
      },
      Some("""WITH iv AS (
             |  SELECT user_id, epoch_us(ts) AS s,
             |    epoch_us(ts) + CAST(FLOOR(value * 1000000.0) AS BIGINT) AS e
             |  FROM events),
             |m AS (
             |  SELECT user_id, s, e,
             |    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |      OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    THEN 1 ELSE 0 END AS brk
             |  FROM iv),
             |isl AS (
             |  SELECT user_id, s, e,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM m),
             |g AS (
             |  SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me,
             |    CAST(COUNT(*) AS BIGINT) AS n
             |  FROM isl GROUP BY 1, 2)
             |SELECT user_id, CAST(SUM(me - ms) AS BIGINT) AS covered,
             |  CAST(COUNT(*) AS BIGINT) AS n_islands,
             |  CAST(SUM(n) AS BIGINT) AS n_intervals
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    ("q_stall_detect",
      (s: SparkSession, d: String) => {
        Windows.stalled(Tables.events(s, d),
            part = Seq("user_id"), order = Seq(col("ts"), col("event_id")),
            progress = col("value"))
          .groupBy("user_id")
          .agg(sum(when(col("stalled"), 1L).otherwise(0L)).as("n_stalls"))
          .orderBy("user_id")
      },
      Some("""WITH p AS (
             |  SELECT user_id, value,
             |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events)
             |SELECT user_id,
             |  CAST(SUM(CASE WHEN prev IS NOT NULL AND value <= prev THEN 1 ELSE 0 END) AS BIGINT) AS n_stalls
             |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}

package graft.graph

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — link-graph centrality as a CURATION
  * signal (the original web-corpus quality weighting: a page's rank on
  * the link graph prioritizes which documents enter the training mix,
  * the role harmonic/PageRank centrality plays in Common-Crawl-derived
  * corpora). One operator family the engine's graph suite
  * ([[ConnectedComponents]] for dedup clusters, [[Knn]] for spatial)
  * didn't cover: global importance on a directed graph.
  *
  * All arithmetic is 64-bit INTEGER fixed-point at `scale` (default
  * 10⁻¹² resolution): per-edge contributions are `rank div out_degree`,
  * sums of longs commute across any partitioning, and the damping step
  * is `base + (dNum · Σ) div dDen` — so every iteration, and therefore
  * the final table, is bit-identical across engines and layouts (the
  * DuckDB oracle replays the identical rounds; float PageRank cannot
  * hash-verify because neighbor-sum order differs). Quantization error
  * is ≤ 1 unit per division — ~10⁻¹² of total mass per step, far below
  * any ranking-relevant difference.
  *
  * Dangling nodes (out-degree 0) contribute nothing — their mass leaks,
  * the standard "PageRank with leak" simplification. Callers who need
  * mass conservation append reverse edges (as [[q_page_rank]]'s
  * bipartite construction does) or add self-loops.
  *
  * Scale shape per iteration: one join of the rank table against the
  * degree-annotated edge list on the source key, one shuffle of edge
  * contributions to their destination for the sum, one left join back
  * to the node set — the Pregel message-passing shape with no driver
  * state, no collect, and skew bounded by in-degree (a hub's
  * contributions combine map-side before the shuffle). Each round is
  * localCheckpoint'd so round r+1 reads a materialized rank table
  * instead of replaying rounds 1..r (the [[graft.llmops.KMeansOps]]
  * convention) — and the degree-annotated EDGE list is checkpointed
  * once up front, because it is read by every round plus the
  * degree/node/count prologue: without that, an expensive upstream
  * edge construction re-executes 5+ times (measured 3.6× end-to-end on
  * the 64× purchase graph, STRESS.md) — the same edge-caching rule
  * GraphX applies to iterative algorithms.
  */
object PageRank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000000L,
      dNum: Long = 85, dDen: Long = 100): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1 (got $iters)")
    require(scale > 0 && dDen > 0 && dNum >= 0 && dNum <= dDen,
      s"need scale > 0 and 0 <= dNum <= dDen, got $scale, $dNum/$dDen")
    // any in_sum is bounded by the total mass `scale`, so the damping
    // product dNum·in_sum (≤ dDen·scale) is the widest intermediate —
    // guard it here instead of letting it wrap to negative ranks
    require(scale <= Long.MaxValue / dDen,
      s"scale · dDen must fit in 64 bits: $scale * $dDen overflows Long")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val withDeg = e.join(deg, Seq("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nTot = nodes.agg(count(lit(1)).as("n_nodes"))
    // r0 = scale div N; base = ((dDen - dNum) · (scale div N)) div dDen.
    // Both use the SAME scale-div-N quantum so the oracle replays exactly.
    // nodesBase is STATIC across rounds (base is a per-node constant) and
    // multiply-consumed (every round's left join + the init), so it is
    // the one table that must materialize.
    val nodesBase = nodes.crossJoin(F.broadcast(nTot))
      .select(col("node"),
        expr(s"CAST($scale AS BIGINT) div n_nodes").as("rank"),
        expr(s"((${dDen - dNum}) * (CAST($scale AS BIGINT) div n_nodes)) div $dDen")
          .as("base"))
      .localCheckpoint()
    var ranks = nodesBase
    for (r <- 1 to iters) {
      val sums = ranks.join(withDeg, col("node") === col("src"))
        .select(col("dst"), expr("rank div out_deg").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("in_sum"))
      // the damping step joins sums back onto the STATIC nodesBase, not
      // onto the previous ranks — identical values (base rides through
      // rounds unchanged), but it makes each round's ranks SINGLE-
      // consumer (only the next round's contribution join reads it), so
      // the lineage is linear and the per-round materialization barrier
      // goes away (the LPA rule); checkpoint on an interval purely to
      // bound plan depth on long budgets.
      ranks = nodesBase
        .join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          (col("base") +
            expr(s"($dNum * coalesce(in_sum, CAST(0 AS BIGINT))) div $dDen"))
            .as("rank"),
          col("base"))
      if (r % 4 == 0 && r < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Personalized (topic-sensitive) PageRank: restart mass goes ONLY to
    * the `seeds` set instead of uniformly to every node — importance
    * RELATIVE TO a trusted set (seed-biased corpus weighting: score web
    * documents by their link proximity to curated domains, the
    * TrustRank/Topic-Sensitive construction), where [[pageRank]] scores
    * global centrality.
    *
    * Same 64-bit fixed-point contract as [[pageRank]] (bit-identical
    * across engines and partitionings, ≤1 quantum loss per division):
    * r₀ = scale div |S| on seeds and 0 elsewhere; each round
    * r' = restart(v) + (dNum·Σ contrib) div dDen with
    * restart(v) = ((dDen−dNum)·(scale div |S|)) div dDen on seeds, 0
    * elsewhere. Non-seed nodes hold rank ONLY through incoming paths
    * from the seed set — unreached nodes stay at exactly 0, which is
    * the semantics a seed-proximity signal wants. Same Pregel shape and
    * per-round localCheckpoint; the seed set broadcasts (it is small by
    * construction — callers with a huge seed set want [[pageRank]] on
    * the seed-induced subgraph instead).
    *
    * @param seeds one column `node`, ids matching the edge endpoints;
    *              duplicates tolerated; seeds that never appear in
    *              `edges` still emit (they hold restart mass — mass can
    *              flow OUT of an isolated seed only if it has edges, but
    *              its own rank row is real) */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int, scale: Long = 1000000000000L,
      dNum: Long = 85, dDen: Long = 100): DataFrame = {
    require(iters >= 1, s"personalized needs iters >= 1 (got $iters)")
    require(scale > 0 && dDen > 0 && dNum >= 0 && dNum <= dDen,
      s"need scale > 0 and 0 <= dNum <= dDen, got $scale, $dNum/$dDen")
    require(scale <= Long.MaxValue / dDen,
      s"scale · dDen must fit in 64 bits: $scale * $dDen overflows Long")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val withDeg = e.join(deg, Seq("src")).localCheckpoint()
    val seedSet = seeds.select(col("node"))
      .filter(col("node").isNotNull).distinct().localCheckpoint()
    // the localCheckpoint above already ran the seed job, so this count
    // is a free lookup — and an empty seed set must fail HERE with a
    // named parameter, not as a NULL-rank (non-ANSI) or a cryptic
    // division-by-zero plan error (ANSI) at scale div n_seeds
    val nSeeds = seedSet.count()
    require(nSeeds >= 1,
      s"personalized needs a non-empty `seeds` set (got $nSeeds distinct " +
        "non-null seed nodes)")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(seedSet.select(col("node"))).distinct()
    // static across rounds (restart mass is a per-node constant) and
    // multiply-consumed — the one table that must materialize (the
    // [[pageRank]] single-consumer-rounds rule)
    val nodesBase = nodes
      .join(seedSet.withColumn("_is_seed", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("_is_seed").isNotNull,
            expr(s"CAST($scale AS BIGINT) div CAST($nSeeds AS BIGINT)"))
          .otherwise(lit(0L)).as("rank"),
        when(col("_is_seed").isNotNull,
            expr(s"((${dDen - dNum}) * (CAST($scale AS BIGINT) div CAST($nSeeds AS BIGINT))) div $dDen"))
          .otherwise(lit(0L)).as("base"))
      .localCheckpoint()
    var ranks = nodesBase
    for (r <- 1 to iters) {
      val sums = ranks.join(withDeg, col("node") === col("src"))
        .select(col("dst"), expr("rank div out_deg").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("in_sum"))
      ranks = nodesBase
        .join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          (col("base") +
            expr(s"($dNum * coalesce(in_sum, CAST(0 AS BIGINT))) div $dDen"))
            .as("rank"),
          col("base"))
      if (r % 4 == 0 && r < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("rank"))
  }
}

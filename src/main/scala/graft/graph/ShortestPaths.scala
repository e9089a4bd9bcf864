package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-source shortest paths — the reachability-DEPTH member
  * of the graph suite ([[ConnectedComponents]] answers *which* island,
  * [[PageRank]] *how central*, this answers *how far*). The training-data
  * uses: link-distance from a trusted seed set as a crawl-quality signal
  * (docs ≥ H hops from any seed are candidates for down-weighting), and
  * hop-distance strata for negative sampling in retrieval training.
  *
  * Semantics: `dist(v)` = minimum total weight over paths from any
  * source to `v` using **at most `maxHops` edges** (Bellman–Ford with a
  * bounded round count). The bound is the contract, not a shortcut: on
  * a 100 TB graph an unbounded fixpoint is operationally unbounded, so
  * callers declare the horizon, and the DuckDB oracle replays the
  * identical capped semantics (a hop-capped recursive CTE). Weights are
  * integer (exact 64-bit arithmetic — bit-identical across engines and
  * partitionings; float weights would make the min order-sensitive in
  * the last ulp).
  *
  * Scale shape: frontier message-passing (SPFA refinement of
  * Bellman–Ford). Each round joins the FRONTIER — only nodes whose
  * distance improved last round, not the full distance table — against
  * the edge list on the source key, min-combines messages map-side,
  * and left-joins the candidate table back to the running distances to
  * keep strict improvements. Rounds after the true eccentricity see an
  * empty frontier and exit early (one cheap `isEmpty` on a
  * materialized table per round), so the cap is a ceiling, not a cost.
  * Each round's outputs are `localCheckpoint`ed (the [[PageRank]] /
  * [[graft.llmops.KMeansOps]] lineage convention), and the edge list is
  * checkpointed once up front because every round reads it.
  */
object ShortestPaths {

  /** @param edges   directed edges; callers symmetrize for undirected
    * @param sources one column `node`; duplicates tolerated
    * @param weightCol optional integer edge-weight column in `edges`
    *                  (unit weight — BFS hop count — when None)
    * @return (node, dist): every node reachable from the source set in
    *         ≤ maxHops edges, with the min total weight over such paths
    */
  def bounded(edges: DataFrame, sources: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst",
      weightCol: Option[String] = None): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0 (got $maxHops)")
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        w.as("w"))
      .localCheckpoint()
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dist
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      // min-combine per destination BEFORE the improvement join: a hub
      // reached from many frontier nodes sends one candidate, not many
      val msgs = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), (frontier("dist") + e("w")).as("cand"))
        .groupBy("node").agg(min("cand").as("cand"))
      frontier = msgs
        .join(dist.withColumnRenamed("dist", "old"), Seq("node"), "left")
        .filter(col("old").isNull || col("cand") < col("old"))
        .select(col("node"), col("cand").as("dist"))
        .localCheckpoint()
      dist = dist.union(frontier)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist
  }
}

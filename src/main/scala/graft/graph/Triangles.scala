package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the graph-quality signal family
  * (clustering coefficient, spam-farm detection on link graphs) next to
  * [[ConnectedComponents]] and PageRank.
  *
  * Degree-ordered edge orientation (Cohen / Suri-Vassilvitskii "MR
  * triangle counting"): orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher one, enumerate wedges only
  * at the LOW endpoint, and close them against the oriented edge list.
  * Per-node oriented out-degree is bounded by O(√m) on any graph, so the
  * wedge volume is O(m^1.5) worst-case — independent of hub degrees; a
  * hub of degree d contributes d wedges, not d², because hubs sit on the
  * high end of their edges. That bound is why this survives a power-law
  * link graph at 100 TB where the naive neighbor self-join explodes on
  * the first celebrity node.
  *
  * Shuffles: degree agg (1), two degree joins onto the edge list (on the
  * edge keys), the wedge self-join on the low endpoint, and the closing
  * join on the (hi1, hi2) pair — all hash/sort-merge equi-joins on keys
  * Catalyst can plan; no driver state, no iteration.
  */
object Triangles {

  /** Canonical simple undirected edges (a < b, loops dropped, dups
    * collapsed) from an edge list in either orientation. */
  def simpleEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()

  /** Per-node triangle participation counts: (node, n_triangles), nodes
    * in ≥1 triangle only. Input may contain duplicates / both
    * orientations / loops; they are canonicalized first. */
  def nodeTriangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // The raw→canonical edge derivation is often the expensive part
    // (input-sized scan + dedup) and is consumed by MULTIPLE branches
    // below (degree agg + both degree joins); without a checkpoint each
    // branch replays it from the source. Measured at 64× sf0.1: 145 s →
    // 40 s from these two truncations alone. localCheckpoint (memory+
    // disk) over persist(): the lineage is also O(input) to KEEP, and
    // the closing join re-traverses it three times.
    val e = simpleEdges(edges, srcCol, dstCol).localCheckpoint(true)
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // (deg, id)-ordered orientation: u = low endpoint, w = high endpoint.
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
        .otherwise(struct(col("b").as("u"), col("a").as("w"), col("da").as("dw")))
        .as("o"))
      .select(col("o.u"), col("o.w"), col("o.dw"))
      // reused three times (both wedge sides + the closing edge list)
      .localCheckpoint(true)
    // Wedges at the low endpoint, canonicalized by the SAME (deg, id)
    // rank so the closing edge — always oriented low→high rank — matches.
    val o1 = oriented.select(col("u"), col("w").as("w1"), col("dw").as("d1"))
    val o2 = oriented.select(col("u"), col("w").as("w2"), col("dw").as("d2"))
    val wedges = o1.join(o2, "u")
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("w1") < col("w2")))
    val closing = oriented.select(col("u").as("w1"), col("w").as("w2"))
    val tris = wedges.join(closing, Seq("w1", "w2"))
      .select(col("u"), col("w1"), col("w2"))
    tris.select(explode(array(col("u"), col("w1"), col("w2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E15 — connected components / island analysis (reference:
  * navmesh_connectivity.py:157-207: BFS islands over KNN edges).
  *
  * Iterative min-label propagation as a DataFrame fixpoint loop: each
  * round every node takes min(own label, neighbors' labels); stop when no
  * label changes. Converges in O(diameter) rounds; each round is one
  * shuffle join + aggregation — no GraphFrames dependency, no driver-side
  * graph (the reference BFS walks an in-memory dict; this form scales to
  * edge tables that don't fit one machine). The driver-side loop only
  * checks a scalar convergence count per round.
  */
object ConnectedComponents {

  /** @param edges (src, dst) undirected edge list (any orientation)
    * @return (node, component) where component = min node id reachable */
  def labelPropagation(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    val nodes = sym.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("component", col("node")).persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src").as("node"))
        .agg(min(col("component")).as("_nbr"))
      val updated = labels.join(neighborMin, Seq("node"), "left")
        .withColumn("_new", least(col("component"), coalesce(col("_nbr"), col("component"))))
      val changed = updated.filter(col("_new") < col("component")).limit(1).count()
      val next = updated.select(col("node"), col("_new").as("component")).persist()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** A9 — island sizes + ratio of total, keep ratio ≥ `minRatio`, largest
    * first (reference: navmesh_connectivity.py:157-207). */
  def islandRatios(components: DataFrame, minRatio: Double): DataFrame = {
    val total = components.count().toDouble
    components.groupBy("component")
      .agg(count(lit(1)).as("size"))
      .withColumn("ratio", col("size").cast("double") / total)
      .filter(col("ratio") >= minRatio)
      .orderBy(col("size").desc, col("component").asc)
  }
}

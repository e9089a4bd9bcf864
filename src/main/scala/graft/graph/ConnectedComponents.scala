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

  /** Size-adaptive CC: small edge sets run union-find on the driver (one
    * collect, no per-round job latency — mirrors the reference's in-memory
    * BFS at its ≤200-sample scale); large edge sets use the distributed
    * fixpoint loop. The cutover is a cheap count. */
  def components(edges: DataFrame, localThreshold: Long = 1000000L): DataFrame = {
    val n = edges.limit((localThreshold + 1).toInt).count()
    if (n <= localThreshold) localUnionFind(edges) else labelPropagation(edges)
  }

  /** Driver-side weighted union-find over a collected edge list; returns
    * the same (node, component=min reachable id) contract as
    * [[labelPropagation]]. */
  def localUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b); union(a, b)
    }
    val rows = parent.keys.toSeq.sorted.map(nd => (nd, find(nd)))
    import spark.implicits._
    rows.toDF("node", "component")
  }

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

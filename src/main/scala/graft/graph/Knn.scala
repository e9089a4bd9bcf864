package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llmops.VectorMath

/** J11/O3 — k-nearest-neighbor edge candidates (reference:
  * navmesh_connectivity.py:126-135: all-pairs distance + top-8 per point).
  *
  * The reference operates on ≤200 sampled points per map, so the
  * brute-force form is a *broadcast* cross join per group — never a global
  * cross join. At embedding scale (millions of vectors) use the LSH-
  * bucketed candidate generation in [[graft.llmops.Similarity]] instead;
  * this operator is the exact-answer baseline the approximate path is
  * validated against.
  */
object Knn {

  /** Bucketed-grid exact kNN for low-dimensional SPATIAL points — the
    * scale path [[bruteForce]]'s scaladoc defers to for large point sets
    * outside embedding space (SURVEY J11 maps the reference's navmesh KNN
    * to "broadcast cross-join or bucketed grid join"; this is the latter,
    * the spatial analog of `RangeJoin.bucketedJoin`).
    *
    * Each point keys to its grid cell (floor(coord/cellSize) per axis);
    * the SOURCE side fans out to its 3^d neighbor cells and equi-joins
    * the candidate side on the composite cell key, then a windowed top-k
    * keeps the k nearest. EXACT — not approximate — whenever
    * `cellSize >= max over points of the k-th-neighbor distance`: every
    * true neighbor then lies within one cell of its source, so the
    * candidate set contains the full answer (GraphSpec asserts this
    * containment against [[bruteForce]]).
    *
    * Scale shape: no broadcast, no cross join — one shuffle of each side
    * on the cell key (source side ×3^d), per-cell join products bounded
    * by local density. This is the form that survives millions of points
    * where the broadcast baseline's |points|² blows up.
    */
  /** Density-scaled starting point for [[gridKnn]]'s cell size: the
    * k-th-neighbor radius of ~uniform points shrinks as
    * extent·((k+1)/n)^(1/d), so a FIXED cell size turns the neighbor join
    * quadratic as n grows (candidate volume ∝ n²/cells — measured in
    * STRESS.md). The 3× safety factor covered both measured fixtures
    * (min 1.6× margin); clustered data needs a per-dataset check, which
    * GraphSpec shows how to do (measure max k-dist from a sample, assert
    * ≤ cellSize). */
  def cellSizeForDensity(extent: Double, n: Long, k: Int, dims: Int): Double = {
    require(extent > 0 && n > 0 && k > 0 && dims > 0)
    3.0 * extent * math.pow((k + 1).toDouble / n, 1.0 / dims)
  }

  def gridKnn(points: DataFrame, idCol: String, coordCols: Seq[String],
      k: Int, cellSize: Double): DataFrame = {
    require(coordCols.nonEmpty && coordCols.size <= 4,
      s"gridKnn is for low-dimensional spatial points; got ${coordCols.size} axes " +
        "(3^d probe cells — use the LSH/IVF paths for embedding-dimensional data)")
    require(k > 0, s"k must be positive, got $k")
    // cellSize <= 0 would not error: floor(x/0) = ±Infinity casts to one
    // clamped long, silently collapsing the grid to a single cell — the
    // O(n²) bucket this operator exists to avoid.
    require(cellSize > 0.0 && !cellSize.isInfinite,
      s"cellSize must be a positive finite number, got $cellSize " +
        "(see cellSizeForDensity for a density-scaled starting point)")
    val d = coordCols.size
    // FanOut: a small spatial input (one 0.8 MB scan partition at the
    // bench fixture) otherwise pins the WHOLE 3^d-fanout join + distance
    // + per-source top-k to the scan's task count (measured: 3.5 M
    // candidate pairs computed and group-limited on one task). Inputs
    // already wider than the session's parallelism pass through, so a
    // 100 TB points table never pays an extra exchange. Both join sides
    // derive from this one subtree, so the exchange plans once.
    val pts = graft.operators.FanOut(points)
    def base(idAs: String, prefix: String) = pts.select(
      (col(idCol).as(idAs) +:
        coordCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("double").as(s"$prefix$i") }): _*)
    val cands = base("dst_id", "_b").select(
      (col("dst_id") +: (0 until d).map(i => col(s"_b$i")) :+
        struct((0 until d).map(i =>
          floor(col(s"_b$i") / cellSize).cast("long").as(s"c$i")): _*).as("_cell")): _*)
    // every {-1,0,1}^d offset — the source row fans out to each neighbor
    // cell it must probe
    val offsets = (0 until d).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      acc.flatMap(o => Seq(-1, 0, 1).map(o :+ _)) }
    val src = base("src_id", "_a").withColumn("_cell",
        explode(array(offsets.map(off => struct((0 until d).map { i =>
          (floor(col(s"_a$i") / cellSize).cast("long") + off(i)).as(s"c$i")
        }: _*)): _*)))
    val dist = sqrt((0 until d).map { i =>
      val diff = col(s"_a$i") - col(s"_b$i"); diff * diff
    }.reduce(_ + _))
    val w = Window.partitionBy("src_id").orderBy(col("dist").asc, col("dst_id").asc)
    src.join(cands, Seq("_cell"))
      .filter(col("src_id") =!= col("dst_id"))
      .withColumn("dist", dist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("src_id", "dst_id", "dist", "rank")
  }

  /** Exact kNN among rows of `points` (id, vec). Excludes self-pairs.
    * Output: (src_id, dst_id, dist, rank) with rank 1..k per src, ties
    * broken by dst id for determinism.
    */
  def bruteForce(points: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int = 0): DataFrame = {
    val a = graft.operators.FanOut(graft.operators.EvalBarrier(
      points.select(col(idCol).as("src_id"),
        VectorMath.precast(col(vecCol)).as("_va")), "_va"))
    val b = points.select(col(idCol).as("dst_id"),
      VectorMath.precast(col(vecCol)).as("_vb"))
    val pairs = a.join(broadcast(b), col("src_id") =!= col("dst_id"))
      .withColumn("dist", sqrt(VectorMath.distSqAuto(col("_va"), col("_vb"), dim)))
    val w = Window.partitionBy("src_id").orderBy(col("dist").asc, col("dst_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("src_id", "dst_id", "dist", "rank")
  }
}

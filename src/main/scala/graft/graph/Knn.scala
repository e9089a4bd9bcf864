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

  /** Exact kNN among rows of `points` (id, vec). Excludes self-pairs.
    * Output: (src_id, dst_id, dist, rank) with rank 1..k per src, ties
    * broken by dst id for determinism.
    */
  def bruteForce(points: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int = 0): DataFrame = {
    val a = graft.operators.FanOut(points.select(col(idCol).as("src_id"),
      VectorMath.precast(col(vecCol)).as("_va")))
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

package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd (k-means) refinement for the IVF coarse quantizer.
  *
  * [[Similarity.ivfTopK]] takes its centroid table as given; this supplies
  * the training step that improves it: assign every vector to its
  * max-cosine cell (map-side broadcast, no shuffle — the
  * [[Similarity.ivfAssignments]] kernel), then recompute each cell's
  * centroid as the element-wise mean of its members. Iterating
  * assign→mean is exactly Lloyd's algorithm with cosine assignment.
  *
  * Scale shape: the only shuffle is the (cell, dimension) aggregation —
  * k·dim groups with map-side partial sums, so the combiner state is
  * k·dim counters per task regardless of corpus size, and no cell's
  * membership is ever collected anywhere.
  *
  * Run it over int8-QUANTIZED vectors ([[Similarity.quantizeInt8]]) and
  * the means are exact: integer-valued sums commute, so the refined
  * centroids are bit-reproducible across engines and partitionings —
  * which is what makes the step oracle-checkable (float32 sums would be
  * partition-order-dependent). Quantized Lloyd is also the production
  * posture: the assignment reads ¼ the bytes.
  */
object KMeansOps {

  /** One assign→mean step. Returns the refined centroids in long form
    * (cell_id, pos, n_points, mean) — `pos` is the 0-based dimension
    * index. Cells that captured no vectors disappear (standard Lloyd:
    * an empty cell has no mean; callers re-seed or drop it).
    *
    * `points(vecCol)` must be integer-valued (quantized codes) for the
    * exactness guarantee; the operator itself only requires numeric
    * arrays.
    */
  def lloydStep(points: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, dim: Int): DataFrame =
    Similarity.ivfAssignments(points, idCol, vecCol, centroids, dim)
      .select(col("cell_id"), posexplode(col("_v")))
      .toDF("cell_id", "pos", "x")
      .groupBy("cell_id", "pos")
      .agg(count(lit(1)).as("n_points"),
        // exact for integer-valued codes: long sums commute, and the
        // single double division at the end is deterministic
        (sum(col("x").cast("long")).cast("double") / count(lit(1))).as("mean"))

  /** Long-form centroids ([[lloydStep]] output) reassembled into the
    * (cell_id, centroid array) shape [[Similarity.ivfTopK]] consumes, for
    * the next iteration or the final index build. */
  def toCentroidTable(longForm: DataFrame): DataFrame =
    longForm.groupBy("cell_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean")))),
        s => s.getField("mean")).as("centroid"))
}

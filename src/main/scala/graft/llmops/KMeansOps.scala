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

  /** Full Lloyd training: iterate [[lloydStep]] from `seed` until the
    * centroid table reaches a fixed point or `maxIter` rounds, returning
    * the final long-form centroids. The convergence probe joins
    * consecutive LONG-FORM tables (k·dim rows — bounded at plan time,
    * never corpus-sized) and asks for one differing row; exact double
    * equality is the right test here because a true fixed point
    * reproduces bit-identical means (integer sums + one deterministic
    * division — the [[lloydStep]] exactness contract), so no epsilon.
    *
    * Each round's output is localCheckpoint'd: round r+1's assignment,
    * the convergence probe, and the final result all consume round r, and
    * without the cut each consumer would replay every earlier round's
    * corpus pass (the ConnectedComponents fixpoint precedent). The corpus
    * itself is consumed once per round — Lloyd's inherent cost — with the
    * round's centroids riding the broadcast, so driver state stays at
    * k·dim rows regardless of corpus size.
    *
    * For maxIter > 1 the POINTS input is localCheckpoint'd too: callers
    * feed derived tables (int8 quantization, projections), and without
    * the cut every round re-executes that upstream per-row work — at the
    * 64× fixture the quantize-per-round form measured 199.9 s vs the
    * materialized form's one quantize pass + (rounds−1) cached reads
    * (256× measured 21.2 s, 3.4× the 64× row for 4× data).
    *
    * Why this is safe where bm25Retrieve's postings checkpoint OOM'd at
    * 256×: checkpoint blocks are unevictable either way, but the two
    * tables sit on opposite sides of the "cheap to HOLD" rule. A Lloyd
    * points table is BOUNDED BY ITS INPUT — one row per point, row width
    * ≈ id + dim (quantized: dim bytes), i.e. at most the corpus the loop
    * must scan every round anyway — and MEMORY_AND_DISK lets the overflow
    * live on disk, so the unevictable-memory footprint stays a bounded
    * slice. The bm25 postings table was corpus × n-gram EXPANDED (~10× the
    * input), so pinning it outgrew storage memory faster than eviction
    * could compensate; the fix there was pruning, not caching. When even
    * the quantized points can't be afforded (disk-constrained boxes,
    * dim ≫ 10³), `materializePoints = Some(false)` opts out and the loop
    * recomputes the upstream per round — the r9 pre-fix behavior.
    *
    * By default (`materializePoints = None`) the choice is made from the
    * optimizer's size estimate: materialize when the points plan's
    * sizeInBytes fits in half the JVM heap (headroom for the per-round
    * assignment checkpoints and execution memory). Parquet-backed
    * projections estimate from file sizes — the callers this library
    * ships. Plans with NO credible estimate (LogicalRDD, prior
    * checkpoints, join-inflated products report ~Long.MaxValue) default
    * to MATERIALIZE — unknown means "keep the r9 fix", not "skip it";
    * the opt-out for genuinely unholdable corpora is explicit
    * `Some(false)`. Single-round callers always skip the cut —
    * materialization would cost more than it saves.
    *
    * Early stop composes with fixed-round replay verification: once at
    * the fixed point, further rounds are the identity, so a verifier
    * replaying exactly `maxIter` rounds (the DuckDB oracle) lands on the
    * same table whether or not the loop cut out early.
    */
  /** Source-compat overload: r9 shipped `materializePoints: Boolean` and
    * named-argument callers (`materializePoints = true`) must keep
    * compiling after the r10 move to the Option-typed heuristic form. */
  def lloydTrain(points: DataFrame, idCol: String, vecCol: String,
      seed: DataFrame, dim: Int, maxIter: Int,
      materializePoints: Boolean): DataFrame =
    lloydTrain(points, idCol, vecCol, seed, dim, maxIter,
      Some(materializePoints))

  def lloydTrain(points: DataFrame, idCol: String, vecCol: String,
      seed: DataFrame, dim: Int, maxIter: Int,
      materializePoints: Option[Boolean] = None): DataFrame = {
    require(maxIter >= 1,
      s"lloydTrain needs maxIter >= 1 (got $maxIter): the result is the " +
        "last completed lloydStep, so zero iterations has no output")
    val doMaterialize = materializePoints.getOrElse {
      // A plan with NO real statistics (LogicalRDD, a prior checkpoint,
      // join-inflated products) reports spark.sql.defaultSizeInBytes ≈
      // Long.MaxValue — that is "unknown", not "huge", and treating it
      // as huge would silently reinstate the 199.9 s recompute-per-round
      // regression the checkpoint exists to fix. So: materialize unless
      // the estimate is CREDIBLE and actually exceeds the budget. The
      // budget is half this JVM's heap — correct for local[n] (the
      // deployment this library benches, where driver heap IS storage
      // memory); on a multi-executor cluster pass an explicit
      // materializePoints instead of relying on the heuristic.
      val est = points.queryExecution.optimizedPlan.stats.sizeInBytes
      val credible = est < BigInt(Long.MaxValue) / 4
      !credible || est <= BigInt(Runtime.getRuntime.maxMemory) / 2
    }
    val pts =
      if (doMaterialize && maxIter > 1) points.localCheckpoint()
      else points
    var cents = seed
    var prev: Option[DataFrame] = None
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val next = lloydStep(pts, idCol, vecCol, cents, dim).localCheckpoint()
      converged = prev.exists { p =>
        next.select(col("cell_id"), col("pos"), col("mean"))
          .join(p.select(col("cell_id"), col("pos"), col("mean").as("_pm")),
            Seq("cell_id", "pos"), "full")
          .filter(col("mean").isNull || col("_pm").isNull ||
            col("mean") =!= col("_pm"))
          .limit(1).count() == 0L
      }
      prev = Some(next)
      cents = toCentroidTable(next)
      it += 1
    }
    prev.get
  }
}

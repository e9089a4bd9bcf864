package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest-neighbor search —
  * the compression rung below int8 scalar quantization
  * ([[Similarity.quantizeInt8]]): split each `dim`-vector into `m`
  * subvectors, quantize each subvector to its nearest centroid in a
  * per-subspace codebook of `ks` codes, and store only the `m` code
  * indices. A 64-dim float32 embedding (256 B) becomes m=4 codes (4 B at
  * ks ≤ 256) — 64× smaller, which is what lets a 100 TB embedding table
  * shuffle, cache, and stream as a few TB.
  *
  * Search uses asymmetric distance computation (ADC): the query stays
  * exact and precomputes, per subspace, its dot product with every
  * centroid — an m×ks lookup table built once per query, map-side
  * against the broadcast codebook. Scoring a candidate is then `m` array
  * lookups + (m-1) adds — no vector math in the pair loop at all, which
  * is the entire point at corpus scale. (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
  * public literature; this is the standard IVF-PQ leaf, and it composes
  * with [[Similarity.ivfTopK]]'s cell pruning unchanged: assign + encode
  * in the same map pass, probe cells, ADC-score within.)
  *
  * Determinism/oracle posture: codebooks are taken from sample vectors
  * (same convention as the IVF oracle's `vec_id < ks` centroids) or from
  * a [[KMeansOps]] refinement over int8-quantized codes. Over quantized
  * codes every subspace dot/distance is an integer-valued double, so ADC
  * sums commute and the whole pipeline hash-matches a DuckDB replay —
  * the float path ranks identically in practice but is not
  * bit-verifiable cross-engine.
  *
  * Scale shape:
  *  - [[subspaceCodebooks]]: m·ks rows — broadcast-sized by construction.
  *  - [[pqEncode]]: one map-side pass over the corpus (broadcast
  *    codebook row, argmin per subspace in place) — NO shuffle, no
  *    per-code row explosion; the per-vector HOF folds are interpreted
  *    but run once per vector, not per pair.
  *  - [[adcTopK]]: queries broadcast with their LUTs; the corpus-sized
  *    encoded side streams m ints per row; per-pair work is codegen'd
  *    `element_at` lookups. Top-k via the same (score desc, id asc)
  *    window contract as every other ANN operator here.
  */
object ProductQuantization {

  private def subDim(m: Int, dim: Int): Int = {
    require(m > 0 && dim > 0 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    dim / m
  }

  private def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def distSqFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Per-subspace codebooks cut from `ks` sample vectors: row (sub,
    * code_id, centroid) where `centroid` is the sample's sub-th
    * `dim/m`-slice. Deterministic given the sample set — the ANN oracle
    * convention ([[Similarity.ivfTopK]]'s `vec_id < ks` centroids),
    * and the seeding step before a [[KMeansOps.lloydStep]] refinement
    * per subspace. Output is m·|samples| rows — broadcast-sized. */
  def subspaceCodebooks(samples: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int): DataFrame = {
    val sd = subDim(m, dim)
    samples
      .select(col(idCol).as("code_id"), VectorMath.precast(col(vecCol)).as("_v"))
      .select(col("code_id"), posexplode(array((0 until m).map { s =>
        slice(col("_v"), s * sd + 1, sd)
      }: _*)))
      .toDF("code_id", "sub", "centroid")
  }

  /** The codebook table folded into one broadcastable row:
    * `_books[sub]._codes[pos]` = (code_id, centroid), both levels sorted
    * so `pos` is the rank of `code_id` within its subspace — the dense
    * 0-based code [[pqEncode]] emits and [[adcTopK]]'s LUT indexes. */
  private def packedBooks(codebooks: DataFrame): DataFrame =
    codebooks
      .groupBy(col("sub"))
      .agg(sort_array(collect_list(struct(col("code_id"), col("centroid"))))
        .as("_codes"))
      .select(struct(col("sub"), col("_codes")).as("_b"))
      .agg(sort_array(collect_list(col("_b"))).as("_books"))

  /** Encode every vector as `m` dense code positions: codes[s] = 0-based
    * index of the L2-nearest centroid in subspace s (ties → lowest
    * position = lowest code_id, matching a `row_number` oracle). Fully
    * map-side over a broadcast codebook row — the corpus is scanned once
    * and NOTHING shuffles; at 100 TB this is the pass that writes the
    * compressed index. Output keeps (idCol, codes array<int>). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val sd = subDim(m, dim)
    df.select(col(idCol), VectorMath.precast(col(vecCol)).as("_v"))
      .crossJoin(broadcast(packedBooks(codebooks)))
      .withColumn("codes", transform(col("_books"), b => {
        val sv = slice(col("_v"), b.getField("sub") * sd + 1, lit(sd))
        array_min(transform(b.getField("_codes"), (c, i) =>
          struct(distSqFold(sv, c.getField("centroid")).as("d"),
            i.cast("int").as("pos")))).getField("pos")
      }))
      .select(col(idCol), col("codes"))
  }

  /** ADC top-k: rank candidates by the PQ approximation of the inner
    * product, dot(q, x) ≈ Σ_s dot(q_s, centroid[codes[s]]). Each query
    * materializes its m×ks partial-dot lookup table once (map-side,
    * broadcast codebooks); the per-pair score is m `element_at` lookups
    * summed in subspace order (deterministic left-assoc chain — over
    * integer-valued quantized codes the sum is exact and engine-
    * independent). Queries broadcast; the encoded corpus streams at
    * m ints per row and never shuffles. */
  def adcTopK(queries: DataFrame, encoded: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int, dim: Int): DataFrame = {
    val sd = subDim(m, dim)
    val q = queries
      .select(col(idCol).as("query_id"), VectorMath.precast(col(vecCol)).as("_qv"))
      .crossJoin(broadcast(packedBooks(codebooks)))
      .withColumn("_lut", transform(col("_books"), b => {
        val qs = slice(col("_qv"), b.getField("sub") * sd + 1, lit(sd))
        transform(b.getField("_codes"), c => dotFold(qs, c.getField("centroid")))
      }))
      .select(col("query_id"), col("_lut"))
    val c = encoded.select(col(idCol).as("cand_id"), col("codes"))
    val score = (0 until m).map { s =>
      element_at(element_at(col("_lut"), s + 1), element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("cand_id").asc)
    broadcast(q).join(c, col("query_id") =!= col("cand_id"))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "score", "rank")
  }

  /** One Lloyd refinement sweep over every subspace codebook: slice the
    * corpus into subspace s, run the exact-integer
    * [[KMeansOps.lloydStep]] against that subspace's codes, reassemble.
    * m driver-side iterations (m is 4–16, a plan-time constant), each a
    * single-shuffle job with ks·(dim/m) combiner state — the training
    * analog of [[pqEncode]]'s map pass. Feed int8-quantized vectors for
    * bit-reproducible centroids (same argument as [[KMeansOps]]). */
  /** Long-form [[pqRefineStep]] output reassembled into the
    * (sub, code_id, centroid) shape the other operators consume — the
    * per-subspace analog of [[KMeansOps.toCentroidTable]]. */
  def toCodebookTable(longForm: DataFrame): DataFrame =
    longForm.groupBy("sub", "code_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mean")))),
        s => s.getField("mean")).as("centroid"))

  def pqRefineStep(points: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val sd = subDim(m, dim)
    (0 until m).map { s =>
      val sliced = points.select(col(idCol),
        slice(VectorMath.precast(col(vecCol)), s * sd + 1, sd).as("_sv"))
      val subBook = codebooks.filter(col("sub") === s)
        .select(col("code_id").as("cell_id"), col("centroid"))
      KMeansOps.lloydStep(sliced, idCol, "_sv", subBook, sd)
        .select(lit(s).as("sub"), col("cell_id").as("code_id"),
          col("pos"), col("n_points"), col("mean"))
    }.reduce(_ unionAll _)
  }
}

package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Three implementation tiers, fastest applicable chosen by the `*Auto`
  * forms:
  *  1. native Catalyst expressions with `doGenCode`
  *     ([[graft.functions.VectorExpressions]]) — a primitive double loop
  *     inside whole-stage codegen; used for wide/unknown dims. Requires
  *     the session to be built with [[graft.GraftExtensions]].
  *  2. unrolled `element_at` sums — beats everything for small known dims
  *     (3-D nav points), but generated methods outgrow the JIT above
  *     [[unrollLimit]].
  *  3. higher-order-function folds (`aggregate` + `zip_with`) — the
  *     registration-free fallback; semantically identical but runs as
  *     CodegenFallback (interpreted lambda per element).
  *
  * All tiers are sequential left-folds over the array in index order with
  * double-precision accumulation: deterministic, bit-identical to each
  * other and to any engine that folds the same way (the DuckDB oracles
  * use `list_reduce(list_transform(...))`, which matches).
  */
object VectorMath {

  /** Cast to array<double> so every product/add is an IEEE double op. */
  private def d(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  def euclidean(a: Column, b: Column): Column = sqrt(distSq(a, b))

  // ---- Precast forms for pairwise operators ----------------------------
  //
  // cosine(a, b) above runs THREE array folds per evaluation (dot + both
  // norms) and casts both arrays each time. In an all-pairs or bucketed
  // join that work is per PAIR; casting once and materializing norms per
  // VECTOR before the join drops per-pair cost to a single fold. The
  // division-by-norms form is kept (not pre-normalized vectors) so results
  // stay bit-identical to `dot/(sqrt·sqrt)` and to the DuckDB oracles.

  /** Cast an embedding to array<double> once, before a pairwise join. */
  def precast(a: Column): Column = d(a)

  /** Dot product over arrays already cast to array<double>. */
  def dotPrecast(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Norm over an array already cast to array<double>. */
  def normPrecast(a: Column): Column = sqrt(dotPrecast(a, a))

  /** Squared distance over arrays already cast to array<double>. */
  def distSqPrecast(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  // ---- Unrolled forms for a statically-known SMALL dimension -----------
  //
  // For small vectors (3-D nav points), an unrolled element_at sum beats
  // the higher-order fold: no lambda dispatch, no intermediate array. But
  // the win inverts for wide embeddings — a 64-term expression tree
  // generates methods past the JIT's HugeMethodLimit, so the "optimized"
  // code runs in the bytecode interpreter (measured 6-10× SLOWER than the
  // fold at dim=64 on the all-pairs cosine path). `dotAuto` therefore
  // unrolls only up to `unrollLimit` and uses the fold above it. The seed
  // term and left-to-right association replicate the fold exactly
  // (((0.0+x1)+x2)+…), so both forms stay bit-identical to each other
  // and the DuckDB list_reduce oracles.

  /** Widest dimension worth unrolling; above this the generated method
    * outgrows JIT compilation and the fold form wins. */
  val unrollLimit = 8

  /** Unrolled dot over precast arrays; `dim` must equal the array length. */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (lit(0.0) +: (1 to dim).map(i =>
      element_at(a, i) * element_at(b, i)).toSeq).reduce(_ + _)

  /** Unrolled squared distance over precast arrays. */
  def distSqUnrolled(a: Column, b: Column, dim: Int): Column =
    (lit(0.0) +: (1 to dim).map { i =>
      val d = element_at(a, i) - element_at(b, i); d * d
    }.toSeq).reduce(_ + _)

  /** True when the active session has the GraftExtensions-injected
    * functions — the *Auto forms degrade to the registration-free HOF
    * fold on sessions built without them, instead of failing analysis.
    * Thread-local: columns must be built on a thread with an active
    * session (standard driver-side usage) to get the native tier; a
    * bare thread silently falls back to the (slower, still correct)
    * fold. */
  private def nativeAvailable: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.catalog.functionExists("graft_dot"))

  /** Unrolled dot for small known dims; native codegen'd loop for wide
    * dims when registered (same result bit-for-bit); HOF fold otherwise. */
  def dotAuto(a: Column, b: Column, dim: Int): Column =
    if (dim > 0 && dim <= unrollLimit) dotUnrolled(a, b, dim)
    else if (nativeAvailable) graft.functions.VectorExpressions.dot(a, b)
    else dotPrecast(a, b)

  def normAuto(a: Column, dim: Int): Column = sqrt(dotAuto(a, a, dim))

  def distSqAuto(a: Column, b: Column, dim: Int): Column =
    if (dim > 0 && dim <= unrollLimit) distSqUnrolled(a, b, dim)
    else if (nativeAvailable) graft.functions.VectorExpressions.distSq(a, b)
    else distSqPrecast(a, b)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Once-per-row evaluation barrier for expensive projected columns that
  * feed the streamed side of a broadcast theta join.
  *
  * Whole-stage codegen defers a streamed-side column's evaluation to its
  * first USE — and a column not referenced by the join CONDITION is first
  * used inside the pair loop, so its generating expression re-runs once
  * per PAIR instead of once per row. Measured on the 64× stress fixture
  * (STRESS.md round 6): the PQ ADC search spent 64 of its 66 seconds
  * re-running the 4-subspace encode argmin per (query, candidate) pair;
  * with the columns forced eager the same join runs in 0.5 s — a 120×
  * swing invisible at fixture scale, where the pair count is tiny.
  *
  * The barrier is a filter that REFERENCES each protected column, so the
  * codegen'd filter must evaluate it below the join — after which the
  * evaluated variable is reused by the pair loop. The predicate is always
  * true and row-preserving (`coalesce(size(c), 0) >= -1` holds for null
  * and non-null arrays alike). Two optimizer guards make it stick:
  *  - the predicate ORs in a reference to a nondeterministic column, so
  *    it can neither be constant-folded away nor pushed through a JOIN
  *    (the `Similarity.thresholdAboveJoin` mechanism);
  *  - the nondeterministic column is INJECTED INTO THE PROJECTION that
  *    carries the protected columns (CollapseProject merges the
  *    pass-through), because `PushPredicateThroughNonJoin` pushes even a
  *    nondeterministic filter through a fully-deterministic Project,
  *    substituting the alias — which would re-inline the expensive
  *    expression into the filter and leave the original deferral in
  *    place (measured: the first, filter-only form changed nothing).
  *
  * An exchange (repartition/FanOut on a small input, or any equi-join
  * shuffle) is an implicit barrier; this is the zero-shuffle form for
  * corpus-sized streamed sides where an extra exchange is real money.
  *
  * The touch is `hash(c) >= Int.MinValue` — a tautology no optimizer
  * rule folds (no range reasoning on non-literal hashes), it forces full
  * evaluation of any column TYPE (arrays, structs, scalars — a norm
  * fold is as deferrable as the array it folds), costs one xxhash pass
  * over the already-computed value, and is null-safe (hash(null) is the
  * seed, never null).
  */
object EvalBarrier {

  /** Force the named columns to evaluate once per row, here. */
  def apply(df: DataFrame, cols: String*): DataFrame = {
    require(cols.nonEmpty, "EvalBarrier needs at least one column to pin")
    val tagged = df.withColumn("_barrier_mid", monotonically_increasing_id())
    val touches = cols.map(c =>
      hash(col(c)).cast("long") >= lit(Int.MinValue.toLong)).reduce(_ && _)
    tagged.filter(touches || col("_barrier_mid") < 0).drop("_barrier_mid")
  }
}

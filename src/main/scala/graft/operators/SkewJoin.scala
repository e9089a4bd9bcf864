package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the skewed side, replicate the
  * other.
  *
  * A hash join sends every row of a hot key to one task; one pathological
  * key (the empty document, the default scene, a null-ish sentinel) then
  * serializes the whole stage. Salting splits each key's rows across
  * `numSalts` sub-partitions and replicates the build side once per salt,
  * so the hot key fans out to `numSalts` tasks. The result set is
  * identical to the plain equi-join for ANY salt assignment — the salt
  * only routes rows — which keeps the operator oracle-checkable against
  * the unsalted SQL join.
  *
  * AQE's skew-join handling covers the sort-merge case at runtime; this
  * explicit form is for when the skew is known ahead of time (or AQE is
  * unavailable, e.g. inside a cached plan), and documents the pattern the
  * 100 TB layout relies on.
  */
object SkewJoin {

  /** Inner equi-join on `key` with the left (large, skewed) side salted
    * and the right side replicated `numSalts` times. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      numSalts: Int): DataFrame = {
    // any deterministic-per-row spread works; hashing a unique id avoids
    // correlating the salt with data columns (which would re-skew)
    val salted = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(numSalts.toLong)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

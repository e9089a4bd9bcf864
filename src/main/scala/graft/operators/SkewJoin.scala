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
    // The salt must be DETERMINISTIC per row content, not per partition
    // layout: a monotonically_increasing_id-derived salt changes when a
    // failed map task is recomputed, and a shuffle key that differs
    // between the original and recomputed attempt can duplicate or drop
    // join rows. Hashing the row's own columns is stable across retries;
    // the spread is over distinct row contents, which for real hot keys
    // (rows differing in payload columns) fans out as intended.
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(numSalts.toLong)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** [[saltedInnerJoin]] that pays the replication tax ONLY for hot keys.
    *
    * Salting everything replicates the entire build side `numSalts`×; at
    * scale the build side is usually only broadcast-small because of the
    * join, and 8× a 10 GB dimension is real shuffle/memory. This variant
    * samples the probe side to estimate key frequencies, takes the top
    * keys above `hotFraction` of the sample as the hot set (driver-side,
    * bounded by `maxHotKeys`), salts probe rows carrying those keys, and
    * runs the untouched plain join for the cold mass. The two key sets
    * are disjoint, so the union is row-for-row the plain inner join —
    * still oracle-checkable against the unsalted SQL.
    *
    * A missed hot key (sampling) costs performance, never correctness.
    * Null keys drop in both branches, matching inner-join semantics.
    */
  def saltedInnerJoinHot(left: DataFrame, right: DataFrame, key: String,
      numSalts: Int, sampleFraction: Double = 0.01,
      hotFraction: Double = 0.05, maxHotKeys: Int = 1000): DataFrame = {
    // persisted: the sampled aggregate feeds two driver actions (total,
    // then hot set) — without it the probe side is sampled+grouped twice
    val sample = left.select(key).sample(withReplacement = false, sampleFraction, seed = 42)
      .groupBy(key).count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coalesce: sum over an EMPTY sample is null, not 0
    val sampleTotal = math.max(1L,
      sample.agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0))
    val hot = sample
      .filter(col("count") >= lit(hotFraction) * sampleTotal)
      .orderBy(col("count").desc)
      .limit(maxHotKeys)
      .collect().map(_.get(0))
    sample.unpersist()
    if (hot.isEmpty) left.join(right, Seq(key))
    else {
      val isHot = col(key).isin(hot: _*)
      val hotJoin = saltedInnerJoin(
        left.filter(isHot), right.filter(isHot), key, numSalts)
      val coldJoin = left.filter(!isHot).join(right.filter(!isHot), Seq(key))
      hotJoin.unionByName(coldJoin)
    }
  }
}

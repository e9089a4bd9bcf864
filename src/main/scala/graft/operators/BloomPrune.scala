package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: filter a large fact table down to
  * rows whose join key MIGHT appear in a (much smaller, but
  * over-broadcast-threshold) key set, BEFORE the join's shuffle.
  *
  * Why this matters at 100 TB: a shuffle join moves the full fact table
  * even when the dim side's selective filter will discard 97% of it on
  * arrival. Probing a compact bloom filter at the scan cuts the shuffled
  * bytes to ~selectivity + fpp, which is the difference between a job
  * that fits the network and one that doesn't. False positives are
  * harmless — the join itself removes them — so results are EXACTLY the
  * plain join's (the oracle runs the plain SQL). This is the manual form
  * of Spark's own `InjectRuntimeFilter`, for when its thresholds
  * (10 GB application side) or plan-shape limits don't trigger.
  *
  * Mechanics: keys are normalized through `xxhash64` on BOTH sides (type-
  * agnostic, null-safe), the filter is tree-aggregated by
  * `DataFrameStatFunctions.bloomFilter`, and the probe is Spark's native
  * codegen'd `might_contain` expression on the serialized sketch literal
  * (registered as `graft_bloom_contains` via [[graft.GraftExtensions]]).
  * The sketch is the ONLY driver-side materialization and its size is
  * governed by (expectedItems, fpp), independent of fact size —
  * ~1.2 MB at 1M items / 1% fpp. For dim cardinalities where the sketch
  * itself would be large (≫100M keys), raise fpp or fall back to the
  * plain shuffle join; the operator never collects row data.
  */
object BloomPrune {

  /** `fact` reduced to rows whose `factKey` might be present in
    * `keys.keyCol`. No false negatives; false-positive rate ≈ fpp.
    */
  def semiReduce(fact: DataFrame, factKey: String, keys: DataFrame,
      keyCol: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val hashed = keys.select(xxhash64(col(keyCol)).as("__graft_h"))
    // Spark's stat.bloomFilter NPEs on a ZERO-ROW input (its internal
    // aggregate yields null); an empty key set legitimately means "keep
    // nothing" — same as the plain inner join. The isEmpty probe
    // short-circuits at the first dim row, so the cost is one cheap job
    // on the SMALL side, never a fact scan.
    if (hashed.isEmpty) fact.filter(lit(false))
    else {
      val bf = hashed.stat.bloomFilter("__graft_h", expectedItems, fpp)
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      fact.filter(mightContain(lit(bos.toByteArray), xxhash64(col(factKey))))
    }
  }

  /** Inner equi-join with the fact side bloom-pruned first. Result is
    * identical to `fact.join(dim, fact(factKey) === dim(dimKey))`.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = semiReduce(fact, factKey, dim, dimKey, expectedItems, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** Native bloom probe (`BloomFilterMightContain`) — requires a session
    * built with [[graft.GraftExtensions]]. */
  def mightContain(serializedBloom: Column, hashedValue: Column): Column =
    call_function("graft_bloom_contains", serializedBloom, hashedValue)
}

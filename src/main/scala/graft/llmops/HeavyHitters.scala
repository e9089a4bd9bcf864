package graft.llmops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") without a vocabulary-sized
  * shuffle — the two-pass sketch-then-recount scheme standard in
  * corpus-statistics pipelines.
  *
  * The naive `explode → groupBy(token) → count → filter` shuffles one
  * partial-aggregate row per DISTINCT token per mapper; at web-corpus
  * scale the token/n-gram vocabulary is billions, so the shuffle is
  * vocabulary-sized even though the answer (items above a support
  * threshold) is tiny. Instead:
  *
  *  1. '''Sketch pass''' — each partition summarizes its item stream with
  *     a Misra–Gries summary of capacity k = ⌈1/minFraction⌉ (constant
  *     memory, one pass, no shuffle). MG guarantees any item with
  *     partition count > n_p/(k+1) survives the partition's summary, and
  *     since Σ_p n_p/(k+1) = N/(k+1) < minFraction·N, every item with
  *     global count ≥ minFraction·N must exceed its per-partition
  *     threshold in AT LEAST one partition (averaging argument) — so the
  *     union of partition summaries is a guaranteed SUPERSET of the true
  *     heavy hitters. Candidate volume is ≤ k·numPartitions, independent
  *     of vocabulary size.
  *  2. '''Recount pass''' — exact counts for the candidates only: the
  *     candidate set broadcasts (bounded by k·P), the corpus is scanned
  *     once more with a map-side semi-join, and the groupBy shuffles only
  *     candidate rows. The threshold filter then yields the EXACT answer
  *     — every true heavy hitter is a candidate (superset guarantee) and
  *     every candidate gets its true count.
  *
  * Two corpus scans, zero vocabulary-sized state anywhere: summaries are
  * O(k) per partition, the candidate relation is O(k·P), and the final
  * shuffle is O(candidates). Selection rule (both forms measured at the
  * 64× stress fixture, STRESS.md): the classic one-pass groupBy wins
  * while the vocabulary is small relative to the stream (its shuffle is
  * then cheap and it scans the corpus once — 19.9 s vs 24.0 s there, at
  * vocab ≈ 8% of instances); the sketch wins when the vocabulary
  * approaches stream size (web-scale n-grams), where the naive shuffle
  * is corpus-sized but the sketch's stays ≤ capacity·partitions.
  *
  * At the test fixture's size the per-partition distinct count is below k,
  * so MG never decrements and the sketch pass degenerates to exact
  * per-partition counting — the guarantee is exercised with adversarial
  * capacity/skew in LlmOpsSpec instead.
  */
object HeavyHitters {

  /** Misra–Gries summary of one partition's item stream: at most
    * `capacity` (item, lowerBoundCount) survivors, preceded by one
    * (null, partitionItemCount) row so the caller can recover the global
    * N from the same pass. Decrement-all is amortized O(1) per item:
    * each decrement event consumes `capacity` prior increments.
    */
  private[graft] def misraGries(it: Iterator[String], capacity: Int): Iterator[(String, Long)] = {
    val counts = mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val x = it.next()
      n += 1L
      counts.get(x) match {
        case Some(c) => counts.update(x, c + 1L)
        case None if counts.size < capacity => counts.update(x, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace { (_, c) => c - 1L }
          counts.foreach { case (t, c) => if (c == 0L) dead += t }
          dead.foreach(counts.remove)
      }
    }
    Iterator.single((null: String, n)) ++ counts.iterator
  }

  /** Items of `itemsCol` (an array column — tokens, n-grams…) whose
    * global occurrence count is ≥ minFraction · totalItems, with exact
    * counts: columns (item, cnt). Result is identical to the full
    * groupBy-count-filter — the approximation lives only in the pruning.
    *
    * NULL array elements are ignored — they are not countable items and
    * do not contribute to totalItems. (They must be filtered BEFORE the
    * sketch: [[misraGries]] uses a null row as its partition-count
    * sentinel, and an equi-join recount could never report them anyway.)
    */
  def heavyHitters(df: DataFrame, itemsCol: Column, minFraction: Double): DataFrame = {
    require(minFraction > 0.0 && minFraction < 1.0,
      s"minFraction must be in (0,1), got $minFraction")
    val capacity = math.ceil(1.0 / minFraction).toInt
    val spark = df.sparkSession
    import spark.implicits._

    val items = df.select(explode(itemsCol).as("item"))
      .filter(col("item").isNotNull)
    // Sketch + total-N in ONE corpus scan; the summary table is tiny
    // (≤ capacity·partitions + partitions rows) but feeds two consumers,
    // so eagerly materialize it — same localCheckpoint precedent as the
    // dedup pair table.
    val sketch = items.as[String]
      .mapPartitions(part => misraGries(part, capacity))
      .toDF("item", "cnt")
      .localCheckpoint(true)
    val total = sketch.filter(col("item").isNull)
      .agg(sum(col("cnt")).as("_n"))
    val candidates = sketch.filter(col("item").isNotNull)
      .select("item").distinct()

    items.join(broadcast(candidates), Seq("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") >= lit(minFraction) * col("_n").cast("double"))
      .select(col("item"), col("cnt"))
  }
}

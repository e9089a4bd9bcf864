package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocking-based record linkage: fuzzy entity matching as a union of
  * cheap equi-joins instead of a similarity cross-join.
  *
  * Each blocking key is a (left expr, right expr) pair — e.g. normalized
  * name prefix, phone digits, (region, birth-year) — and a candidate
  * pair is any pair agreeing on AT LEAST ONE key. Recall is the union of
  * the keys' recall (the classic multi-pass blocking argument: one key's
  * typos are caught by another key); cost is the sum of per-block
  * squared block sizes, each an equi-join Catalyst shuffles on that key
  * — never n². Pairs surfacing under several keys are deduped by
  * keeping the lowest block index per (leftId, rightId) so scoring runs
  * once per pair.
  *
  * Skew note: a degenerate block value (empty normalized name) is a hot
  * key like any other — pre-filter junk key values on both sides, or
  * route through [[SkewJoin]] if a block key is irreducibly hot.
  */
object BlockingJoin {

  /** Candidate pairs with per-pair dedup; all columns of both inputs
    * survive (column names must be disjoint — same contract as Spark's
    * join). Block-key expressions must be bound to the input frames
    * (`left("col")` / `right("col")`-based). */
  /** Internal working-column names. `withColumn` silently OVERWRITES an
    * existing column of the same name — an input already carrying one of
    * these would corrupt the pair dedup / ranking, so reject it loudly
    * (same contract as the width-mismatch requires elsewhere). */
  private val reserved = Seq("_block", "_pair_rn", "_rank", "match_score")

  private def requireNoReserved(df: DataFrame, side: String): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"$side input carries reserved column name(s) ${clash.mkString(", ")} — " +
      s"rename them before the blocking join (reserved: ${reserved.mkString(", ")})")
  }

  def candidates(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockKeys: Seq[(Column, Column)]): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key")
    requireNoReserved(left, "left"); requireNoReserved(right, "right")
    val tagged = blockKeys.zipWithIndex.map { case ((lk, rk), i) =>
      left.join(right, lk === rk).withColumn("_block", lit(i))
    }
    val pairW = Window.partitionBy(col(leftId), col(rightId)).orderBy(col("_block"))
    tagged.reduce(_ unionByName _)
      .withColumn("_pair_rn", row_number().over(pairW))
      .filter(col("_pair_rn") === 1)
      .drop("_pair_rn", "_block")
  }

  /** Best match per left record: score every deduped candidate pair with
    * `score` (any column expression over both sides' columns), keep the
    * top-scoring right record per left id (ties broken by ascending
    * right id — deterministic). Returns all pair columns plus
    * `match_score`. Unblocked left records are absent (no candidate ⇒
    * no row) — anti-join against the result for the unmatched report. */
  def bestMatch(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockKeys: Seq[(Column, Column)], score: Column): DataFrame = {
    val scored = candidates(left, right, leftId, rightId, blockKeys)
      .withColumn("match_score", score)
    val bestW = Window.partitionBy(col(leftId))
      .orderBy(col("match_score").desc, col(rightId))
    scored.withColumn("_rank", row_number().over(bestW))
      .filter(col("_rank") === 1)
      .drop("_rank")
  }
}

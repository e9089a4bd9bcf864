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

  /** Best match per left record: score every candidate pair with `score`
    * (any column expression over both sides' columns), keep the
    * top-scoring right record per left id (ties broken by ascending
    * right id — deterministic). Returns all pair columns plus
    * `match_score`. Unblocked left records are absent (no candidate ⇒
    * no row) — anti-join against the result for the unmatched report.
    *
    * The argmax deliberately SKIPS [[candidates]]' pair-dedup pass: a
    * pair surfacing under several keys carries the identical
    * (match_score, rightId) every time, so the per-left max is
    * duplicate-invariant — same winner, same tie-break, no
    * once-per-pair semantics to protect (that contract matters only for
    * additive per-pair consumers, which is what [[candidates]] is for).
    *
    * Shape: the pair stream reduces through the bounded-heap
    * [[graft.functions.TopK]] aggregation (ObjectHashAggregate — k=1
    * heap per (left, partition) map-side, NO sort anywhere), carrying
    * only (score, rightId); the winners (≤ |left| rows) then reattach
    * both payloads by key and recompute the score once per winner. The
    * window form this replaces shuffled and SORTED the full candidate
    * table twice (pair-dedup window + rank window — ~9 M wide rows at
    * sf0.1 for the linkage query), an allocation burst that made its
    * bench cost a GC lottery (16→209 s across identical fresh-JVM
    * runs); a `max_by(struct(payload), ...)` single-agg variant was
    * tried and rejected — struct buffers drop it to SortAggregate,
    * which re-sorts the pair table map-side.
    *
    * Caller contract (the bounded-heap rewrite narrows semantics vs the
    * window form it replaced — violations diverge SILENTLY):
    *  - `rightId` integral; `score` deterministic (re-evaluated on the
    *    winner rows to keep its exact column type).
    *  - `score` must be NON-NULL on every candidate pair: the heap ranks
    *    through a non-nullable Double encoder, so a NULL score is a
    *    runtime error here where the old window form ranked it last.
    *    Wrap nullable scores in `coalesce(score, lit(Double.MinValue))`.
    *  - `score` must be EXACT under cast to double: ranking runs on
    *    `score.cast("double")`, so two scores distinguishable in their
    *    native type but equal as doubles (e.g. decimals beyond 2^53) can
    *    pick a different winner than exact ordering would.
    *  - `leftId` must be UNIQUE in `left`: duplicate left rows share one
    *    heap, then the winner re-join fans out one output row per
    *    duplicate (the window form emitted one per partition-row). */
  def bestMatch(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockKeys: Seq[(Column, Column)], score: Column): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key")
    requireNoReserved(left, "left"); requireNoReserved(right, "right")
    val scored = blockKeys.map { case (lk, rk) => left.join(right, lk === rk) }
      .reduce(_ unionByName _)
      .withColumn("match_score", score)
    val best = scored.groupBy(col(leftId))
      .agg(graft.functions.TopK.topKAgg(1,
        col("match_score").cast("double"), col(rightId).cast("long")).as("_top"))
      .select(col(leftId),
        element_at(col("_top"), 1).getField("id").as("_best_rid"))
    val leftCols = left.columns.map(col)
    val rightCols = right.columns.filter(_ != rightId).map(col)
    best
      .join(right, best("_best_rid") === right(rightId).cast("long"))
      .join(left, Seq(leftId))
      .withColumn("match_score", score)
      .select(leftCols ++ (col(rightId) +: rightCols) :+ col("match_score"): _*)
  }

  /** Sorted-neighborhood candidate pairs (Hernández–Stolfo): both sides
    * merge under ONE total sort order and every cross-side pair within
    * `w` positions becomes a candidate — the classic complement to
    * [[candidates]]'s key blocking. Key blocking needs an EQUALITY that
    * survives the corruption; sorted-neighborhood only needs the
    * corrupted key to SORT NEAR its original (truncated digits, typos in
    * the suffix), and its cost is exactly n·w pairs — no quadratic block
    * to mis-size.
    *
    * Determinism: candidates depend on the global order, so the sort key
    * is made TOTAL by appending (side, id) — equal keys order
    * left-before-right then by id, and the oracle replays the identical
    * order. Only (id, key, side) travels through the ordering; full rows
    * join back by id afterwards, so wide inputs don't ride the sort.
    *
    * Scale shape: one range-partitioned sort of the narrow union; global
    * positions are partition-local indices plus broadcast per-partition
    * offsets (the zipWithIndex construction — the offsets table is one
    * row per PARTITION, control-plane-bounded like CC's size probe);
    * neighbor pairs come from an equi-join on ⌊pos/w⌋ blocks b→{b, b+1}
    * filtered to 0 < Δpos ≤ w — never a position cross-join.
    *
    * Contract: BOTH id columns must be integral (long-castable) — they
    * travel through the narrow merged frame as longs, the same narrowing
    * [[bestMatch]] documents for its rightId. String-keyed callers map
    * ids first (or extend with a string id variant).
    *
    * @return (leftId, rightId, pos_gap) — one row per in-window
    *         cross-side pair, pos_gap ∈ [1, w] the sort-order distance */
  def sortedNeighborhood(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      leftKey: Column, rightKey: Column, w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val spark = left.sparkSession
    import spark.implicits._
    // enforce the integral-id contract loudly: a NULL id (or a
    // non-long-castable one, which casts to NULL under non-ANSI) would
    // otherwise surface as an opaque NPE at getLong inside a task
    def checkedId(c: Column, name: String) =
      when(c.cast("long").isNull, raise_error(lit(
        s"sortedNeighborhood: `$name` contains a NULL or non-long-castable " +
          "id (integral-id contract) - map string ids to longs first")))
        .otherwise(c.cast("long"))
    val merged = left.select(checkedId(col(leftId), leftId).as("_id"),
        leftKey.cast("string").as("_k"), lit(0).as("_side"))
      .unionByName(right.select(checkedId(col(rightId), rightId).as("_id"),
        rightKey.cast("string").as("_k"), lit(1).as("_side")))
    val sorted = merged
      .repartitionByRange(col("_k"), col("_side"), col("_id"))
      .sortWithinPartitions("_k", "_side", "_id")
    // partition-local index via one streaming pass (no window, no extra
    // shuffle), MATERIALIZED before the offset probe: repartitionByRange
    // samples, so an unpinned plan could draw different boundaries on
    // its second execution and mis-stitch the offsets
    val idxSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_side",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("_pid",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("_i",
        org.apache.spark.sql.types.LongType)))
    val indexed = sorted.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var i = 0L
      rows.map { r =>
        i += 1
        org.apache.spark.sql.Row(r.getLong(0), r.getInt(2), pid, i)
      }
    }(org.apache.spark.sql.Encoders.row(idxSchema)).localCheckpoint(true)
    // per-PARTITION counts → prefix offsets: a control-plane collect of
    // one row per partition (the ConnectedComponents size-probe class)
    val offsets = indexed.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .orderBy("_pid")
      .collect().toSeq.scanLeft((0, 0L)) { case ((_, acc), r) =>
        (r.getInt(0), acc + r.getLong(1)) }
      .sliding(2).collect { case Seq((_, off), (pid, _)) => (pid, off) }.toSeq
    val offDf = broadcast(offsets.toDF("_pid", "_off"))
    val pos = indexed.join(offDf, Seq("_pid"))
      .select(col("_id"), col("_side"), (col("_off") + col("_i")).as("_pos"))
      .withColumn("_blk", (col("_pos") / w).cast("long"))
    // each left row probes its own block AND the next (explode, not an
    // OR-join — an OR predicate can't hash-partition and would plan as a
    // nested loop); Δpos ≤ w then exact-filters the band
    val a = pos.select(col("_id").as("_a_id"), col("_side").as("_a_side"),
        col("_pos").as("_a_pos"),
        explode(array(col("_blk"), col("_blk") + 1L)).as("_jb"))
    val b = pos.select(col("_id").as("_b_id"), col("_side").as("_b_side"),
      col("_pos").as("_b_pos"), col("_blk").as("_jb"))
    a.join(b, Seq("_jb"))
      .filter(col("_b_pos") > col("_a_pos") &&
        col("_b_pos") <= col("_a_pos") + w &&
        col("_a_side") =!= col("_b_side"))
      .select(
        when(col("_a_side") === 0, col("_a_id")).otherwise(col("_b_id")).as(leftId),
        when(col("_a_side") === 0, col("_b_id")).otherwise(col("_a_id")).as(rightId),
        (col("_b_pos") - col("_a_pos")).as("pos_gap"))
  }
}

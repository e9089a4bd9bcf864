package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the one-call composition of the
  * individually-verified operators, in the order production
  * training-data pipelines run them (each stage's contract, scale shape,
  * and oracle live with its operator; this object only wires them):
  *
  *  1. quality gate        — [[TextStats.qualityScore]] threshold
  *  2. exact dedup         — [[Dedup.exactDedup]] on the text fingerprint
  *  3. near-dup dedup      — [[Dedup.minhashNearDupsSized]] pairs →
  *                           min-neighbor canonicalization (drop every
  *                           doc with a near-dup of smaller id — the
  *                           [[Similarity.cosineDedupDecision]] rule)
  *  4. decontamination     — [[Dedup.decontaminate]] vs the benchmark set
  *  5. recipe planning     — [[TextStats.recipePlan]] water-filled quotas
  *  6. budget fill         — [[TextStats.selectToBudget]] by quality
  *  7. shard layout        — [[TextStats.trainingShards]] seeded scatter
  *
  * Ordering rationale: dedup before decontamination (fewer docs to
  * shingle), both before planning (quotas must be computed over what can
  * actually ship), selection before sharding (shards are the final
  * artifact). The quality column is computed ONCE and reused by the gate
  * (stage 1) and the fill (stage 6), so the two stages can't disagree.
  *
  * Scale: every stage is one of the audited operators; nothing here adds
  * a shuffle beyond theirs. The doc flow is strictly decreasing after
  * stage 1, so the most expensive stages (minhash banding) see the
  * smallest corpus this wiring can give them.
  */
object Pipelines {

  /** Returns the final sharded training corpus:
    * (id, domain, text, n_tokens, quality, shard, pos). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, benchmark: DataFrame, benchTextCol: String,
      stopwords: Seq[String], minQuality: Double,
      shingleSize: Int, nearDupThreshold: Double,
      decontamN: Int, weights: Map[String, Long], budgetTokens: Long,
      numShards: Int, shardSeed: String): DataFrame = {
    // 1. quality gate (score kept for stage 6)
    val scored = docs.select(col(idCol), col(domainCol), col(textCol),
        TextStats.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextStats.qualityScore(col(textCol), stopwords).as("quality"))
      .filter(col("quality") >= minQuality)
    // 2. exact dedup
    val exact = Dedup.exactDedup(scored, idCol,
        TextStats.fingerprint(col(textCol)))
      .drop("dedup_key", "group_size")
    // 3. near-dup dedup: drop every doc with a near-dup of smaller id
    val pairs = Dedup.minhashNearDupsSized(exact, idCol, textCol,
      shingleSize, nearDupThreshold)
    val dupIds = pairs.filter(col("id_b") > col("id_a"))
      .select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exact.join(dupIds, Seq(idCol), "left_anti")
    // 4. decontamination
    val clean = Dedup.decontaminate(nearDeduped, idCol, textCol,
      benchmark, benchTextCol, decontamN)
    // 5 + 6. water-filled quotas over the SURVIVING corpus, then the
    // quality-ordered fill (recipePlan emits the quota as "assigned")
    val plan = TextStats.recipePlan(clean, domainCol, "n_tokens",
      weights, budgetTokens, rounds = weights.size.max(3))
    val selected = TextStats.selectToBudget(clean, idCol, domainCol,
        "n_tokens", "quality", plan, quotaCol = "assigned")
      .filter(col("keep"))
      .drop("quota", "cum_tokens", "keep")
    // 7. shard layout
    TextStats.trainingShards(selected, idCol, numShards, shardSeed)
  }
}

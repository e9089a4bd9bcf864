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
  *  3. decontamination     — [[Dedup.decontaminate]] vs the benchmark set
  *  4. near-dup dedup      — [[Dedup.minhashNearDupsSized]] pairs →
  *                           min-neighbor canonicalization (drop every
  *                           doc with a near-dup of smaller id — the
  *                           [[Similarity.cosineDedupDecision]] rule)
  *  5. recipe planning     — [[TextStats.recipePlan]] water-filled quotas
  *  6. budget fill         — [[TextStats.selectToBudget]] by quality
  *  7. shard layout        — [[TextStats.trainingShards]] seeded scatter
  *
  * Ordering rationale: decontamination runs BEFORE near-dup dedup — the
  * reverse order silently loses data when a contaminated doc is the
  * min-id canonical of a near-dup pair (the clean near-dup would be
  * dropped as a duplicate in stage 3, then its contaminated canonical
  * dropped in stage 4: zero survivors where one should remain; the
  * integration spec plants exactly this case). Both run before planning
  * (quotas must be computed over what can actually ship), selection
  * before sharding (shards are the final artifact). The quality column
  * is computed ONCE and reused by the gate (stage 1) and the fill
  * (stage 6), so the two stages can't disagree.
  *
  * Scale: every stage is one of the audited operators; nothing here adds
  * a shuffle beyond theirs. Stage outputs that feed multiple consumers
  * (the exact-dedup survivors feed decontaminate's shingle pass and its
  * anti-join; the decontaminated corpus feeds the minhash sizing count,
  * the sign chain, and the canonical anti-join; the near-dup survivors
  * feed the quota plan and the fill) are localCheckpoint'd once — their
  * lineages carry the window/join work of every prior stage, the
  * expensive-re-derivation side of the materialize-once trade (see
  * STRESS.md's PageRank-vs-boilerplate measurement).
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
    // 2. exact dedup (checkpointed: feeds decontaminate's shingle pass
    // AND its anti-join, each replaying the gate + dedup window otherwise)
    val exact = Dedup.exactDedup(scored, idCol,
        TextStats.fingerprint(col(textCol)))
      .drop("dedup_key", "group_size")
      .localCheckpoint()
    // 3. decontamination — before near-dup dedup, so a clean near-dup of
    // a contaminated canonical survives (see the ordering rationale).
    // Checkpointed: the sizing count, the shingle/sign chain, and the
    // canonical anti-join all read it.
    val clean = Dedup.decontaminate(exact, idCol, textCol,
        benchmark, benchTextCol, decontamN)
      .localCheckpoint()
    // 4. near-dup dedup: drop every doc with a near-dup of smaller id
    // (lshCandidates emits each pair once, id_a < id_b)
    val pairs = Dedup.minhashNearDupsSized(clean, idCol, textCol,
      shingleSize, nearDupThreshold)
    val nearDeduped = clean
      .join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
      .localCheckpoint()
    // 5 + 6. water-filled quotas over the SURVIVING corpus, then the
    // quality-ordered fill (recipePlan emits the quota as "assigned")
    val plan = TextStats.recipePlan(nearDeduped, domainCol, "n_tokens",
      weights, budgetTokens, rounds = weights.size.max(3))
    val selected = TextStats.selectToBudget(nearDeduped, idCol, domainCol,
        "n_tokens", "quality", plan, quotaCol = "assigned")
      .filter(col("keep"))
      .drop("quota", "cum_tokens", "keep")
    // 7. shard layout
    TextStats.trainingShards(selected, idCol, numShards, shardSeed)
  }
}

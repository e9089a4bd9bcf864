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

  /** The accumulated state an incremental curation deployment carries
    * between ingests — each table is exactly what one FILTER stage needs
    * to judge future batches without rescanning history:
    *
    *  - `keys`:  `dedup_key` of every quality-passing, exact-dedup'd
    *    document ever ingested (one row per distinct key) — stage 2's
    *    anti-join side.
    *  - `sigs`:  (id, sig) MinHash signature arrays of every document
    *    that reached stage 4 in its own ingest (i.e. survived quality +
    *    exact dedup + decontamination) — INCLUDING docs that were then
    *    dropped as near-dups: in the full-corpus pipeline those docs
    *    still participate in pairing, so a future larger-id near-dup of
    *    a dropped doc must still be caught.
    *  - `texts`: (id, text) of the same stage-4 participants, consulted
    *    only for candidate ids (the minhashIncrementalNearDups left-semi
    *    prune) at verify time.
    *
    * All three are plain DataFrames — persist as parquet between daily
    * runs (the [[SparseSim.Bm25Index]] convention). */
  final case class CurationRegistry(keys: DataFrame, sigs: DataFrame,
      texts: DataFrame)

  object CurationRegistry {
    /** The pre-first-ingest state: empty tables with the right schemas
      * (idCol pinned to LONG, this library's document-id convention). */
    def empty(spark: org.apache.spark.sql.SparkSession,
        idCol: String, textCol: String): CurationRegistry = {
      import org.apache.spark.sql.types._
      def mk(schema: StructType) = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      CurationRegistry(
        mk(StructType(Seq(StructField("dedup_key", StringType)))),
        mk(StructType(Seq(StructField(idCol, LongType),
          StructField("sig", ArrayType(LongType, containsNull = false))))),
        mk(StructType(Seq(StructField(idCol, LongType),
          StructField(textCol, StringType)))))
    }
  }

  /** Incremental curation: [[curate]]'s FILTER stages (quality gate,
    * exact dedup, decontamination, near-dup dedup) applied to a NEW
    * batch against the accumulated registry — the daily-crawl deployment
    * where history is never re-scanned. Returns the surviving batch rows
    * (with `n_tokens`/`quality` appended) and the updated registry.
    *
    * Equivalence contract (the integration test's oracle): under
    * monotonic ingest ids (every batch id exceeds every registry id —
    * the crawl convention) and fixed banding, chaining ingests yields
    * exactly the docs the full-corpus filter pipeline
    * ([[curateFilterStages]]) keeps from the batch. The argument, stage
    * by stage: quality and decontamination are per-document against
    * static references; exact dedup keeps the min id per key, and with
    * monotonic ids the min of a union key-group is always the earliest
    * ingest's representative — so "key seen before" (the registry
    * anti-join) is the same predicate; near-dup dedup drops a doc iff a
    * smaller-id near-dup exists in the union's stage-4 population, and
    * that population splits exactly into the registry's stored
    * signatures (all smaller ids) plus the batch's own (the within-batch
    * pair search). Every stage is one of the independently-oracled
    * operators; nothing here adds a shuffle beyond theirs.
    *
    * Banding is EXPLICIT (numHashes/rowsPerBand), not corpus-sized: the
    * candidate S-curve must be the same function at every ingest or
    * "near-dup of history" changes meaning between days; size it once
    * for the corpus's TARGET scale with [[Dedup.minhashParamsForCorpus]].
    *
    * The planning stages (recipe quotas, budget fill, shard layout) are
    * deliberately NOT incremental: they are global decisions over
    * whatever ships in a training run — re-run them over the
    * accumulated kept corpus when cutting a snapshot, not per ingest. */
  def curateIncremental(batch: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      stopwords: Seq[String], minQuality: Double,
      shingleSize: Int, numHashes: Int, rowsPerBand: Int,
      nearDupThreshold: Double, decontamN: Int,
      registry: CurationRegistry): (DataFrame, CurationRegistry) = {
    // 1. quality gate (all input columns pass through)
    val scored = batch
      .withColumn("n_tokens", TextStats.tokenCount(col(textCol)).cast("long"))
      .withColumn("quality", TextStats.qualityScore(col(textCol), stopwords))
      .filter(col("quality") >= minQuality)
    // 2. exact dedup vs the key registry, then within the batch.
    // Checkpointed (the curate() rationale): decontaminate reads it for
    // both its shingle pass and its anti-join.
    val exact = Dedup.incrementalDedup(scored, idCol,
        TextStats.fingerprint(col(textCol)), registry.keys, "dedup_key")
      .localCheckpoint()
    val newKeys = registry.keys
      .unionAll(exact.select(col("dedup_key")))
    val exactDocs = exact.drop("dedup_key", "group_size")
    // 3. decontamination (static benchmark; per-doc, so registry-free).
    // Checkpointed: feeds the within-batch pair search, the cross-
    // registry pair search, the signature build, and the final anti-join.
    val clean = Dedup.decontaminate(exactDocs, idCol, textCol,
        benchmark, benchTextCol, decontamN)
      .localCheckpoint()
    // 4a. near-dups WITHIN the batch (id_a < id_b → id_b drops)…
    val batchPairs = Dedup.minhashNearDups(clean, idCol, textCol,
      shingleSize, numHashes, rowsPerBand, nearDupThreshold)
    // 4b. …and vs the REGISTRY's stored signatures (registry ids are all
    // smaller under monotonic ingest, so any hit drops the batch doc)
    val regPairs = Dedup.minhashIncrementalNearDups(clean, registry.sigs,
      registry.texts, idCol, textCol, shingleSize, numHashes, rowsPerBand,
      nearDupThreshold)
    val dropIds = batchPairs.select(col("id_b").as(idCol))
      .unionAll(regPairs.select(col("batch_id").as(idCol)))
      .distinct()
    val kept = clean.join(dropIds, Seq(idCol), "left_anti")
    // registry growth: every stage-4 PARTICIPANT's signature and text
    // (kept or near-dup-dropped — see CurationRegistry), new keys.
    val eligible = clean.filter(
      size(split(col(textCol), " ")) >= shingleSize)
    val newSigs = registry.sigs.unionAll(
      Dedup.minhashSignatureArray(
        Dedup.shingleSets(eligible, idCol, textCol, shingleSize),
        idCol, numHashes))
    val newTexts = registry.texts.unionAll(
      eligible.select(col(idCol), col(textCol)))
    (kept, CurationRegistry(newKeys, newSigs, newTexts))
  }

  /** Persist / load the curation registry (three parquet tables — the
    * [[SparseSim.writeIndex]] convention; one dir per registry
    * generation, the caller appends batches by writing the UPDATED
    * registry to a new dir or segmenting per ingest). */
  def writeRegistry(reg: CurationRegistry, dir: String): Unit = {
    reg.keys.write.mode("overwrite").parquet(s"$dir/keys")
    reg.sigs.write.mode("overwrite").parquet(s"$dir/sigs")
    reg.texts.write.mode("overwrite").parquet(s"$dir/texts")
  }

  def readRegistry(spark: org.apache.spark.sql.SparkSession,
      dir: String): CurationRegistry =
    CurationRegistry(
      spark.read.parquet(s"$dir/keys"),
      spark.read.parquet(s"$dir/sigs"),
      spark.read.parquet(s"$dir/texts"))

  /** [[curate]]'s stages 1–4 with EXPLICIT banding — the full-corpus
    * form [[curateIncremental]] is equivalent to (restricted to the
    * batch ids), kept as a public entry point both for that equivalence
    * check and for one-shot corpora where the sized banding of
    * [[curate]] isn't wanted. Returns the surviving docs with
    * `n_tokens`/`quality` appended. */
  def curateFilterStages(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      stopwords: Seq[String], minQuality: Double,
      shingleSize: Int, numHashes: Int, rowsPerBand: Int,
      nearDupThreshold: Double, decontamN: Int): DataFrame = {
    val scored = docs
      .withColumn("n_tokens", TextStats.tokenCount(col(textCol)).cast("long"))
      .withColumn("quality", TextStats.qualityScore(col(textCol), stopwords))
      .filter(col("quality") >= minQuality)
    val exact = Dedup.exactDedup(scored, idCol,
        TextStats.fingerprint(col(textCol)))
      .drop("dedup_key", "group_size")
      .localCheckpoint()
    val clean = Dedup.decontaminate(exact, idCol, textCol,
        benchmark, benchTextCol, decontamN)
      .localCheckpoint()
    val pairs = Dedup.minhashNearDups(clean, idCol, textCol,
      shingleSize, numHashes, rowsPerBand, nearDupThreshold)
    clean.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
  }
}

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
    val (kept, delta) = curateIngest(batch, idCol, textCol,
      benchmark, benchTextCol, stopwords, minQuality,
      shingleSize, numHashes, rowsPerBand, nearDupThreshold, decontamN,
      registry)
    (kept, mergeRegistry(registry, delta))
  }

  /** [[curateIncremental]]'s working form, returning the batch's registry
    * DELTA instead of the merged whole — the segmented-persistence entry
    * point: the delta is O(batch)-sized, so
    * [[writeRegistrySegment]](delta, dir) persists one ingest in
    * O(batch) I/O where [[writeRegistry]] of the merged registry rewrites
    * all accumulated history (the [[SparseSim.writeIndex]] segment
    * convention applied to curation state). The delta reuses
    * [[CurationRegistry]]'s shape — its tables union into the base by
    * [[mergeRegistry]], which is exactly what the merged-return form
    * does. */
  def curateIngest(batch: DataFrame, idCol: String, textCol: String,
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
    val deltaKeys = exact.select(col("dedup_key"))
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
    val deltaSigs = Dedup.minhashSignatureArray(
      Dedup.shingleSets(eligible, idCol, textCol, shingleSize),
      idCol, numHashes)
    val deltaTexts = eligible.select(col(idCol), col(textCol))
    (kept, CurationRegistry(deltaKeys, deltaSigs, deltaTexts))
  }

  /** Union a registry delta (one ingest's contributions, as returned by
    * [[curateIngest]]) into the base — per-table unions, no shuffle
    * anywhere. Key rows may duplicate across merges of the SAME content
    * re-fingerprinted (membership semantics are unchanged under
    * duplicates); sig/text rows never should, which is what the
    * segmented open's watermark guard protects. */
  def mergeRegistry(base: CurationRegistry,
      delta: CurationRegistry): CurationRegistry =
    CurationRegistry(base.keys.unionAll(delta.keys),
      base.sigs.unionAll(delta.sigs),
      base.texts.unionAll(delta.texts))

  /** Persist the WHOLE registry as one dir (three parquet tables).
    * This is the O(history) rewrite: every accumulated key/sig/text row
    * is written again. Deployments that ingest daily should instead
    * persist each ingest's DELTA with [[writeRegistrySegment]] — O(batch)
    * I/O — and open via [[readRegistrySegments]]; writing a merged
    * registry through here is compaction, legal at compaction's full-
    * rewrite cost (see [[compactRegistrySegments]]). Publishes
    * atomically (temp dir + rename, [[SegmentIO.publish]]). */
  def writeRegistry(reg: CurationRegistry, dir: String): Unit =
    SegmentIO.publish(reg.keys.sparkSession, dir)(writeRegistryTables(reg, _))

  private def writeRegistryTables(reg: CurationRegistry, dir: String): Unit = {
    reg.keys.write.mode("overwrite").parquet(s"$dir/keys")
    reg.sigs.write.mode("overwrite").parquet(s"$dir/sigs")
    reg.texts.write.mode("overwrite").parquet(s"$dir/texts")
    // one-row stats: the ingest-id watermark readRegistrySegments needs
    // to reject a double-ingested segment. Marks cover the stage-4
    // participants (sigs/texts rows — the tables that INFLATE under
    // double-ingest); key rows are membership sets, semantically
    // idempotent under duplication. Derived from the WRITTEN parquet
    // (the SparseSim.writeIndex rule — one execution of the sig
    // pipeline, into the write).
    val spark = reg.keys.sparkSession
    val sigs = spark.read.parquet(s"$dir/sigs")
    val idCol = sigs.columns.head
    sigs.agg(count(lit(1)).as("n_sigs"),
        min(col(idCol)).cast("long").as("min_id"),
        max(col(idCol)).cast("long").as("max_id"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  def readRegistry(spark: org.apache.spark.sql.SparkSession,
      dir: String): CurationRegistry =
    CurationRegistry(
      spark.read.parquet(s"$dir/keys"),
      spark.read.parquet(s"$dir/sigs"),
      spark.read.parquet(s"$dir/texts"))

  /** Persist one ingest's registry DELTA (as returned by
    * [[curateIngest]]) as a segment dir — O(batch) I/O, history
    * untouched; the registry is the segment LIST, re-merged at open by
    * [[readRegistrySegments]]. Same layout as [[writeRegistry]] (a
    * segment IS a registry dir), so the name only marks intent. */
  def writeRegistrySegment(delta: CurationRegistry, dir: String): Unit =
    writeRegistry(delta, dir)

  /** Open a segmented curation registry: per-table unions across the
    * segment dirs (no shuffle — unions of scans). The open REJECTS
    * overlapping ingest-id watermarks: a retried ingest whose segment
    * write already succeeded would otherwise duplicate every stored
    * signature and text row SILENTLY — each batch doc then near-dup-
    * matches the duplicate registry rows, and candidate volume doubles.
    * Disjoint [min_id, max_id] ranges are sufficient under the
    * monotonic-ingest-id contract curateIncremental's equivalence
    * already assumes; a sig-less segment (every doc shorter than the
    * shingle size) has null marks and cannot overlap. */
  def readRegistrySegments(spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[String]): CurationRegistry = {
    require(dirs.nonEmpty,
      "readRegistrySegments needs at least one segment dir")
    val marks = dirs.flatMap { d =>
      val r = spark.read.parquet(s"$d/stats")
        .select(col("min_id").cast("long"), col("max_id").cast("long"))
        .head()
      if (r.isNullAt(0)) None else Some((d, r.getLong(0), r.getLong(1)))
    }.sortBy(_._2)
    marks.sliding(2).foreach {
      case Seq((d1, _, hi1), (d2, lo2, _)) if lo2 <= hi1 =>
        sys.error(s"readRegistrySegments: ingest-id watermarks overlap " +
          s"between $d1 (max_id $hi1) and $d2 (min_id $lo2) - same batch " +
          "ingested twice, or non-monotonic ingest ids")
      case _ => ()
    }
    dirs.map(readRegistry(spark, _)).reduce(mergeRegistry)
  }

  /** Compact a segment list into one segment at `outDir` (which must not
    * alias an input — canonical-path guarded; parquet cannot overwrite
    * its own scan). Costs one full registry rewrite — run it when the
    * per-open union fan outweighs the rewrite, the Lucene merge-policy
    * trade [[SparseSim.compactSegments]] documents with measurements. */
  def compactRegistrySegments(spark: org.apache.spark.sql.SparkSession,
      dirs: Seq[String], outDir: String): Unit = {
    require(!dirs.map(SegmentIO.canonicalPath)
        .contains(SegmentIO.canonicalPath(outDir)),
      "compactRegistrySegments: outDir must be a NEW dir, not an input " +
        "segment")
    writeRegistry(readRegistrySegments(spark, dirs), outDir)
  }

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

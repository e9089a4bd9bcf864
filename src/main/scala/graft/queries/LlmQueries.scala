package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.llmops.{TextStats, BpeTrainer, Dedup, HeavyHitters, KMeansOps, ProductQuantization, Similarity, SparseSim}

/** Training-data pipeline family (builder-prompt extensions): text
  * analysis, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  * embedding similarity search.
  */
object LlmQueries extends QueryFamily {

  /** Oracle prologue shared by q_dedup_cluster and q_leak_safe_split:
    * 3-gram shingles → 16-hash minhash signature → 4×4 banded LSH
    * candidates → exact-Jaccard verify at 0.8 → recursive-CTE connected
    * components, ending at `comp(node, cluster_id)` (canonical = min
    * reachable id). One text, two consumers — the two oracles must stay
    * keyed on the identical cluster table. */
  private val minhashCompCtes: String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
       |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
       |  FROM documents),
       |hb AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substring(md5(shingle),1,15)) AS BIGINT) % ${Dedup.MinhashPrime} AS h
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    ${(0 until 16).map(j => s"min((h * ${Dedup.minhashA(j)} + ${Dedup.minhashB(j)}) % ${Dedup.MinhashPrime}) AS mh_$j").mkString(", ")}
       |  FROM hb GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, mh_0 || '|' || mh_1 || '|' || mh_2 || '|' || mh_3 AS band_sig FROM sig
       |  UNION ALL SELECT doc_id, 1, mh_4 || '|' || mh_5 || '|' || mh_6 || '|' || mh_7 FROM sig
       |  UNION ALL SELECT doc_id, 2, mh_8 || '|' || mh_9 || '|' || mh_10 || '|' || mh_11 FROM sig
       |  UNION ALL SELECT doc_id, 3, mh_12 || '|' || mh_13 || '|' || mh_14 || '|' || mh_15 FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
       |  FROM cand c
       |  JOIN sh x ON x.doc_id = c.id_a
       |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
       |  GROUP BY c.id_a, c.id_b),
       |pairs AS (
       |  SELECT i.id_a, i.id_b
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.id_a
       |  JOIN sizes sb ON sb.doc_id = i.id_b
       |  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.8),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |cc(node, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
       |comp AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node)""".stripMargin

  private val Stopwords = Seq("the", "a", "of", "and", "in", "to")
  private[queries] val LangProfiles = Map(
    "de" -> Seq("der", "die", "das", "und"),
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "los", "de"),
    "fr" -> Seq("le", "les", "des", "et"),
    "zh" -> Seq("的", "是", "了"))

  private def stopListSql = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // Text statistics: token count, BPE estimate, stopword ratio,
    // uniqueness ratio — pure map-side projections.
    ("q_text_stats",
      (s: SparkSession, d: String) => {
        Tables.documents(s, d).select(
            col("doc_id"),
            TextStats.tokenCount(col("text")).as("n_tokens"),
            TextStats.bpeTokenEstimate(col("n_chars")).as("bpe_est"),
            TextStats.bpeTokenCount(col("text")).as("bpe_tokens"),
            TextStats.stopwordRatio(col("text"), Stopwords).as("stop_ratio"),
            TextStats.uniqueTokenRatio(col("text")).as("uniq_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, text, n_chars, string_split(text, ' ') AS toks FROM documents)
              |SELECT doc_id,
              |  CAST(len(toks) AS INT) AS n_tokens,
              |  CAST(ceil(CAST(n_chars AS DOUBLE)/4.0) AS BIGINT) AS bpe_est,
              |  CAST(len(regexp_extract_all(text, '${TextStats.BpePretokenPattern.replace("'", "''")}')) AS INT) AS bpe_tokens,
              |  CAST(len(list_filter(toks, x -> list_contains($stopListSql, x))) AS DOUBLE)
              |    / len(toks) AS stop_ratio,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
              |FROM t ORDER BY doc_id""".stripMargin)),

    // Composite quality score + bucket.
    ("q_quality_score",
      (s: SparkSession, d: String) => {
        val score = TextStats.qualityScore(col("text"), Stopwords)
        Tables.documents(s, d).select(
            col("doc_id"), score.as("quality"),
            TextStats.qualityBucket(score).as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              |q AS (
              |  SELECT doc_id,
              |    least(1.0, CAST(len(toks) AS DOUBLE)/100.0) * 0.4 +
              |    (1.0 - CAST(len(list_filter(toks, x -> list_contains($stopListSql, x))) AS DOUBLE)/len(toks)) * 0.3 +
              |    CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) * 0.3 AS quality
              |  FROM t)
              |SELECT doc_id, quality,
              |  CASE WHEN quality >= 0.7 THEN 'high'
              |       WHEN quality >= 0.5 THEN 'medium' ELSE 'low' END AS bucket
              |FROM q ORDER BY doc_id""".stripMargin)),

    // Language-ID heuristic: marker-profile hit counts, earliest-max
    // argmax. Compared against the ground-truth lang column.
    ("q_lang_id",
      (s: SparkSession, d: String) => {
        val scores = TextStats.langScores(col("text"), LangProfiles)
        val cols = scores.map { case (l, c) => c.as(s"s_$l") }
        Tables.documents(s, d).select(
            (Seq(col("doc_id"), col("lang"),
              TextStats.predictedLang(col("text"), LangProfiles).as("predicted")) ++ cols): _*)
          .orderBy("doc_id")
      },
      Some {
        val profs = LangProfiles.toSeq.sortBy(_._1)
        val scoreExprs = profs.map { case (l, ws) =>
          val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
          s"CAST(len(list_filter(list_distinct(toks), x -> list_contains($list, x))) AS INT) AS s_$l"
        }.mkString(",\n    ")
        val langs = profs.map(_._1)
        val m = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
        val pick = langs.map(l => s"WHEN s_$l = $m THEN '$l'").mkString(" ")
        s"""WITH t AS (
           |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
           |sc AS (
           |  SELECT doc_id, lang,
           |    $scoreExprs
           |  FROM t)
           |SELECT doc_id, lang, CASE $pick END AS predicted,
           |  s_de, s_en, s_es, s_fr, s_zh
           |FROM sc ORDER BY doc_id""".stripMargin
      }),

    // End-to-end corpus curation: the standard preprocessing decision
    // chain (duplicate → low-quality → too-short/long → language
    // mismatch) composed from the individually-verified operators into
    // one keep/drop verdict with a first-failure reason — the flagship
    // "what survives into training" query. All map-side except the
    // canonical-copy join (one shuffle on doc_id).
    ("q_corpus_curation",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val canon = Dedup.exactDedup(
            docs.select(col("doc_id"), col("text")), idCol = "doc_id",
            key = TextStats.fingerprint(col("text")))
          .select(col("doc_id"), lit(true).as("is_canonical"))
        docs.select(col("doc_id"), col("lang"),
            TextStats.tokenCount(col("text")).as("n_tokens"),
            TextStats.qualityScore(col("text"), Stopwords).as("quality"),
            TextStats.predictedLang(col("text"), LangProfiles).as("predicted"))
          .join(canon, Seq("doc_id"), "left")
          .withColumn("is_canonical", coalesce(col("is_canonical"), lit(false)))
          .withColumn("drop_reason",
            when(!col("is_canonical"), "duplicate")
              .when(col("quality") < 0.5, "low_quality")
              .when(col("n_tokens") < 20, "too_short")
              .when(col("n_tokens") > 500, "too_long")
              .when(col("predicted") =!= col("lang"), "lang_mismatch"))
          .withColumn("keep", col("drop_reason").isNull)
          .select("doc_id", "n_tokens", "quality", "predicted",
            "is_canonical", "keep", "drop_reason")
          .orderBy("doc_id")
      },
      Some {
        val profs = LangProfiles.toSeq.sortBy(_._1)
        val scoreExprs = profs.map { case (l, ws) =>
          val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
          s"CAST(len(list_filter(list_distinct(toks), x -> list_contains($list, x))) AS INT) AS s_$l"
        }.mkString(",\n    ")
        val langs = profs.map(_._1)
        val m = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
        val pick = langs.map(l => s"WHEN s_$l = $m THEN '$l'").mkString(" ")
        s"""WITH fp AS (
           |  SELECT doc_id,
           |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k
           |  FROM documents),
           |canon AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY k),
           |t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
           |sc AS (
           |  SELECT doc_id, lang, toks,
           |    $scoreExprs
           |  FROM t),
           |base AS (
           |  SELECT doc_id,
           |    CAST(len(toks) AS INT) AS n_tokens,
           |    least(1.0, CAST(len(toks) AS DOUBLE)/100.0) * 0.4 +
           |    (1.0 - CAST(len(list_filter(toks, x -> list_contains($stopListSql, x))) AS DOUBLE)/len(toks)) * 0.3 +
           |    CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) * 0.3 AS quality,
           |    CASE $pick END AS predicted,
           |    lang,
           |    doc_id IN (SELECT doc_id FROM canon) AS is_canonical
           |  FROM sc),
           |reasons AS (
           |  SELECT *, CASE
           |    WHEN NOT is_canonical THEN 'duplicate'
           |    WHEN quality < 0.5 THEN 'low_quality'
           |    WHEN n_tokens < 20 THEN 'too_short'
           |    WHEN n_tokens > 500 THEN 'too_long'
           |    WHEN predicted <> lang THEN 'lang_mismatch' END AS drop_reason
           |  FROM base)
           |SELECT doc_id, n_tokens, quality, predicted, is_canonical,
           |  drop_reason IS NULL AS keep, drop_reason
           |FROM reasons ORDER BY doc_id""".stripMargin
      }),

    // Exact dedup on the canonical fingerprint (sorted distinct token set
    // → md5): keeps min doc_id per group; 21 non-trivial groups at sf0.01.
    ("q_fingerprint_dedup",
      (s: SparkSession, d: String) => {
        Dedup.exactDedup(
            Tables.documents(s, d).select(col("doc_id"), col("text")),
            idCol = "doc_id",
            key = TextStats.fingerprint(col("text")))
          .select("dedup_key", "doc_id", "group_size")
          .orderBy("doc_id")
      },
      Some("""WITH fp AS (
             |  SELECT doc_id,
             |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS dedup_key
             |  FROM documents),
             |g AS (
             |  SELECT dedup_key, min(doc_id) AS doc_id,
             |    CAST(count(*) AS BIGINT) AS group_size
             |  FROM fp GROUP BY dedup_key)
             |SELECT dedup_key, doc_id, group_size FROM g ORDER BY doc_id""".stripMargin)),

    // Corpus dedup-health report: the one-row summary a curation run
    // publishes — doc/distinct counts, dup rate (integer-exact ratio),
    // duplicate chars removable, largest clone cluster, and the cluster-
    // size histogram (as a deterministic json string). Two partial-agg
    // passes over the fingerprint groups, both map-side combined.
    ("q_dedup_report",
      (s: SparkSession, d: String) => {
        val groups = Tables.documents(s, d)
          .groupBy(TextStats.fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("sz"), sum(col("n_chars")).as("chars"),
            max(col("n_chars")).as("max_chars"))
        groups.agg(
          sum(col("sz")).as("n_docs"),
          count(lit(1)).as("n_distinct"),
          (sum(col("sz")) - count(lit(1))).as("n_duplicates"),
          sum(col("chars") - col("max_chars")).as("dup_chars_removable"),
          max(col("sz")).as("max_cluster"))
          // integer basis-point ratio: exact cross-engine, no float division
          .withColumn("dup_rate_pct",
            floor(col("n_duplicates") * 10000L / col("n_docs")).cast("long"))
      },
      Some("""WITH g AS (
             |  SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
             |    CAST(count(*) AS BIGINT) AS sz,
             |    CAST(sum(n_chars) AS BIGINT) AS chars,
             |    CAST(max(n_chars) AS BIGINT) AS max_chars
             |  FROM documents GROUP BY 1)
             |SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_distinct,
             |  CAST(sum(sz) - count(*) AS BIGINT) AS n_duplicates,
             |  CAST(sum(chars - max_chars) AS BIGINT) AS dup_chars_removable,
             |  CAST(max(sz) AS BIGINT) AS max_cluster,
             |  CAST((sum(sz) - count(*)) * 10000 // sum(sz) AS BIGINT) AS dup_rate_pct
             |FROM g""".stripMargin)),

    // Incremental ingest dedup: the batch (doc_id ≥ 300) deduped against
    // the registry of already-ingested fingerprints (doc_id < 300) by
    // anti-join — history is never re-keyed or rescanned — then
    // exact-deduped within the batch. Registry side streams (no
    // broadcast/collect): holds at a 100 TB registry.
    ("q_incremental_dedup",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val registry = docs.filter(col("doc_id") < 300)
          .select(TextStats.fingerprint(col("text")).as("dedup_key"))
        Dedup.incrementalDedup(docs.filter(col("doc_id") >= 300), "doc_id",
            TextStats.fingerprint(col("text")), registry, "dedup_key")
          .select("dedup_key", "doc_id", "group_size")
          .orderBy("doc_id")
      },
      Some("""WITH fp AS (
             |  SELECT doc_id,
             |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS dedup_key
             |  FROM documents),
             |novel AS (
             |  SELECT doc_id, dedup_key FROM fp WHERE doc_id >= 300
             |    AND dedup_key NOT IN (SELECT dedup_key FROM fp WHERE doc_id < 300)),
             |g AS (
             |  SELECT dedup_key, min(doc_id) AS doc_id,
             |    CAST(count(*) AS BIGINT) AS group_size
             |  FROM novel GROUP BY dedup_key)
             |SELECT dedup_key, doc_id, group_size FROM g ORDER BY doc_id""".stripMargin)),

    // Boilerplate line removal (RefinedWeb/MassiveText common-line
    // filter): documents re-lined into 8-token lines (the fixture has no
    // newlines; both engines run the same deterministic construction),
    // then every line whose distinct-document frequency reaches 2 —
    // planted clones make these real — is stripped from ALL its docs.
    ("q_boilerplate_strip",
      (s: SparkSession, d: String) => {
        val toks = split(col("text"), " ")
        val nLines = greatest(
          ceil(size(toks).cast("double") / 8).cast("int"), lit(1))
        val lined = Tables.documents(s, d).select(col("doc_id"),
          concat_ws("\n", transform(sequence(lit(0), nLines - 1), g =>
            array_join(slice(toks, g * 8 + 1, lit(8)), " "))).as("text"))
        Dedup.stripBoilerplateLines(lined, "doc_id", "text", minDocFreq = 2)
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |lnl AS (
             |  SELECT doc_id, list_transform(
             |    range(0, greatest(CAST(ceil(len(toks) / 8.0) AS BIGINT), 1)),
             |    g -> array_to_string(list_slice(toks, g*8 + 1, least(g*8 + 8, len(toks))), ' ')) AS ls
             |  FROM tk),
             |ln AS (
             |  SELECT doc_id, unnest(ls) AS line,
             |    generate_subscripts(ls, 1) AS idx FROM lnl),
             |bo AS (SELECT line FROM (
             |  SELECT line, count(DISTINCT doc_id) AS df FROM ln GROUP BY 1)
             |  WHERE df >= 2 AND trim(line) <> ''),
             |keep AS (SELECT * FROM ln WHERE line NOT IN (SELECT line FROM bo)),
             |rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |  string_agg(line, chr(10) ORDER BY idx) AS clean_text FROM keep GROUP BY 1),
             |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM ln GROUP BY 1)
             |SELECT t.doc_id, t.n_lines, coalesce(rb.n_kept, 0) AS n_kept,
             |  coalesce(rb.clean_text, '') AS clean_text
             |FROM tot t LEFT JOIN rb USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Span-level (C4-style) dedup: consecutive 10-word spans deduped
    // globally by first occurrence, docs reassembled from survivors —
    // sub-document dedup that whole-doc fingerprinting can't see.
    ("q_span_dedup",
      (s: SparkSession, d: String) => {
        Dedup.spanDedup(Tables.documents(s, d), idCol = "doc_id",
            textCol = "text", spanWords = 10)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (
             |  SELECT doc_id, w,
             |    unnest(range(0, greatest(CAST(ceil(len(w) / 10.0) AS BIGINT), 1))) AS i
             |  FROM toks),
             |spans AS (
             |  SELECT doc_id, CAST(i AS INT) AS span_idx,
             |    array_to_string(list_slice(w, CAST(i*10+1 AS BIGINT), CAST((i+1)*10 AS BIGINT)), ' ') AS span_text
             |  FROM idx),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY span_text ORDER BY doc_id, span_idx) AS rn
             |  FROM spans)
             |SELECT doc_id,
             |  CAST(count(*) AS BIGINT) AS n_spans,
             |  CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
             |  coalesce(string_agg(span_text, ' ' ORDER BY span_idx) FILTER (WHERE rn = 1), '') AS clean_text
             |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Exact SLIDING-window substring dedup (Lee et al. ExactSubstr):
    // any 15-token window seen earlier in the corpus marks its span;
    // merged spans are cut from the doc. Catches shared passages at ANY
    // alignment, where q_span_dedup's disjoint spans miss offsets.
    ("q_exact_substring",
      (s: SparkSession, d: String) => {
        Dedup.exactSubstringDedup(Tables.documents(s, d), idCol = "doc_id",
            textCol = "text", windowTokens = 15)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (
             |  SELECT doc_id, w,
             |    unnest(range(1, greatest(len(w) - 15 + 2, 1))) AS i
             |  FROM toks),
             |inst AS (
             |  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
             |    md5(array_to_string(list_slice(w, i, i + 14), ' ')) AS sh
             |  FROM idx),
             |ranked AS (
             |  SELECT doc_id, pos,
             |    row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn
             |  FROM inst),
             |dup AS (SELECT doc_id, pos AS s, pos + 14 AS e FROM ranked WHERE rn > 1),
             |m AS (
             |  SELECT doc_id, s, e,
             |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |      OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
             |    THEN 1 ELSE 0 END AS brk
             |  FROM dup),
             |isl AS (
             |  SELECT doc_id, s, e,
             |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY s, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM m),
             |g AS (
             |  SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e
             |  FROM isl GROUP BY 1, 2),
             |cov AS (SELECT doc_id, SUM(e - s + 1) AS n_removed FROM g GROUP BY 1),
             |tok AS (
             |  SELECT doc_id, unnest(w) AS t, unnest(range(0, len(w))) AS tpos
             |  FROM toks),
             |keep AS (
             |  SELECT tok.doc_id, tok.tpos, tok.t FROM tok
             |  WHERE NOT EXISTS (SELECT 1 FROM g
             |    WHERE g.doc_id = tok.doc_id AND tok.tpos BETWEEN g.s AND g.e)),
             |clean AS (
             |  SELECT doc_id, string_agg(t, ' ' ORDER BY tpos) AS clean_text
             |  FROM keep GROUP BY doc_id)
             |SELECT toks.doc_id, CAST(len(toks.w) AS BIGINT) AS n_tokens,
             |  CAST(coalesce(cov.n_removed, 0) AS BIGINT) AS n_removed,
             |  coalesce(clean.clean_text, '') AS clean_text
             |FROM toks LEFT JOIN cov USING (doc_id) LEFT JOIN clean USING (doc_id)
             |ORDER BY toks.doc_id""".stripMargin)),

    // MinHash + LSH near-dup detection: 3-shingles, 16 md5 min-hashes,
    // 4 bands × 4 rows (4-row bands keep the candidate rate ~3% for the
    // j≈0.3 vocabulary overlap of this corpus while recall at j≥0.9 stays
    // ≈1), candidates verified by exact Jaccard ≥ 0.8.
    ("q_minhash_lsh",
      (s: SparkSession, d: String) => {
        Dedup.minhashNearDups(
            Tables.documents(s, d), idCol = "doc_id", textCol = "text",
            shingleSize = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.8)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents),
             |hb AS (
             |  SELECT doc_id,
             |    CAST(concat('0x', substring(md5(shingle),1,15)) AS BIGINT) % ${Dedup.MinhashPrime} AS h
             |  FROM sh),
             |sig AS (
             |  SELECT doc_id,
             |    ${(0 until 16).map(j => s"min((h * ${Dedup.minhashA(j)} + ${Dedup.minhashB(j)}) % ${Dedup.MinhashPrime}) AS mh_$j").mkString(", ")}
             |  FROM hb GROUP BY doc_id),
             |bands AS (
             |  SELECT doc_id, 0 AS band, mh_0 || '|' || mh_1 || '|' || mh_2 || '|' || mh_3 AS band_sig FROM sig
             |  UNION ALL SELECT doc_id, 1, mh_4 || '|' || mh_5 || '|' || mh_6 || '|' || mh_7 FROM sig
             |  UNION ALL SELECT doc_id, 2, mh_8 || '|' || mh_9 || '|' || mh_10 || '|' || mh_11 FROM sig
             |  UNION ALL SELECT doc_id, 3, mh_12 || '|' || mh_13 || '|' || mh_14 || '|' || mh_15 FROM sig),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bands a JOIN bands b
             |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
             |  FROM cand c
             |  JOIN sh x ON x.doc_id = c.id_a
             |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
             |  GROUP BY c.id_a, c.id_b)
             |SELECT i.id_a, i.id_b, i.inter, sa.sz AS sz_a, sb.sz AS sz_b,
             |  CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.id_a
             |JOIN sizes sb ON sb.doc_id = i.id_b
             |WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // Cross-corpus incremental near-dup: odd doc_ids play "today's
    // crawl", even doc_ids the already-signed registry. Candidates come
    // from the STORED registry signature table; registry text is fetched
    // only for candidate ids (left-semi prune) — the incrementalDedup
    // pattern upgraded from exact-key to MinHash similarity.
    ("q_incremental_neardup",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val registry = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
        val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        val regSigs = Dedup.minhashSignatureArray(
          Dedup.shingleSets(
            registry.filter(size(split(col("text"), " ")) >= 3),
            "doc_id", "text", 3),
          "doc_id", 16)
        Dedup.minhashIncrementalNearDups(batch, regSigs, registry,
            "doc_id", "text", shingleSize = 3, numHashes = 16,
            rowsPerBand = 4, threshold = 0.8)
          .orderBy("batch_id", "reg_id")
      },
      Some(s"""WITH sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents),
             |hb AS (
             |  SELECT doc_id,
             |    CAST(concat('0x', substring(md5(shingle),1,15)) AS BIGINT) % ${Dedup.MinhashPrime} AS h
             |  FROM sh),
             |sig AS (
             |  SELECT doc_id,
             |    ${(0 until 16).map(j => s"min((h * ${Dedup.minhashA(j)} + ${Dedup.minhashB(j)}) % ${Dedup.MinhashPrime}) AS mh_$j").mkString(", ")}
             |  FROM hb GROUP BY doc_id),
             |bands AS (
             |  SELECT doc_id, 0 AS band, mh_0 || '|' || mh_1 || '|' || mh_2 || '|' || mh_3 AS band_sig FROM sig
             |  UNION ALL SELECT doc_id, 1, mh_4 || '|' || mh_5 || '|' || mh_6 || '|' || mh_7 FROM sig
             |  UNION ALL SELECT doc_id, 2, mh_8 || '|' || mh_9 || '|' || mh_10 || '|' || mh_11 FROM sig
             |  UNION ALL SELECT doc_id, 3, mh_12 || '|' || mh_13 || '|' || mh_14 || '|' || mh_15 FROM sig),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS reg_id
             |  FROM bands a JOIN bands b
             |    ON a.band = b.band AND a.band_sig = b.band_sig
             |   AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT c.batch_id, c.reg_id, CAST(count(*) AS BIGINT) AS inter
             |  FROM cand c
             |  JOIN sh x ON x.doc_id = c.batch_id
             |  JOIN sh y ON y.doc_id = c.reg_id AND y.shingle = x.shingle
             |  GROUP BY 1, 2)
             |SELECT i.batch_id, i.reg_id, i.inter, sa.sz AS sz_a, sb.sz AS sz_b,
             |  CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.batch_id
             |JOIN sizes sb ON sb.doc_id = i.reg_id
             |WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.8
             |ORDER BY batch_id, reg_id""".stripMargin)),

    // Incremental END-TO-END curation: the corpus arrives as two ingests
    // (history doc_id < 300, then the batch) and each batch is filtered
    // against the ACCUMULATED registry — quality gate, exact dedup vs the
    // key registry, decontamination, near-dup vs the stored signature
    // registry plus within-batch — never rescanning history
    // (Pipelines.curateIncremental). The registry state between the two
    // ingests travels THROUGH THE SEGMENTED PERSISTENCE PATH: ingest 1's
    // delta is written as a segment (writeRegistrySegment — the O(batch)
    // daily persistence) and re-opened through the watermark-guarded
    // readRegistrySegments before ingest 2, so the hash also proves the
    // store/open round-trip changes nothing. The oracle replays the
    // FULL-CORPUS filter pipeline (stages 1-4 composed from the four
    // independently-oracled stage SQLs) restricted to the batch ids: a
    // hash match IS the batch-over-registry ≡ full-corpus-curate
    // equivalence proof, which holds because ingest ids are monotonic
    // (see the curateIncremental scaladoc for the stage-by-stage
    // argument).
    ("q_curate_incremental",
      (s: SparkSession, d: String) => {
        import graft.llmops.Pipelines
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val bench = Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(97)) === 0).select("text")
        def ingest(b: DataFrame, reg: Pipelines.CurationRegistry) =
          Pipelines.curateIngest(b, "doc_id", "text", bench, "text",
            stopwords = Stopwords, minQuality = 0.5, shingleSize = 3,
            numHashes = 16, rowsPerBand = 4, nearDupThreshold = 0.8,
            decontamN = 3, registry = reg)
        val (_, delta1) = ingest(docs.filter(col("doc_id") < 300),
          Pipelines.CurationRegistry.empty(s, "doc_id", "text"))
        val seg1 = java.nio.file.Files
          .createTempDirectory("graft_curseg").toString + "/seg1"
        Pipelines.writeRegistrySegment(delta1, seg1)
        val (kept, _) = ingest(docs.filter(col("doc_id") >= 300),
          Pipelines.readRegistrySegments(s, Seq(seg1)))
        kept.select("doc_id", "n_tokens", "quality").orderBy("doc_id")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
             |q AS (
             |  SELECT doc_id, text, toks,
             |    CAST(len(toks) AS BIGINT) AS n_tokens,
             |    least(1.0, CAST(len(toks) AS DOUBLE)/100.0) * 0.4 +
             |    (1.0 - CAST(len(list_filter(toks, x -> list_contains($stopListSql, x))) AS DOUBLE)/len(toks)) * 0.3 +
             |    CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) * 0.3 AS quality
             |  FROM t),
             |qp AS (SELECT * FROM q WHERE quality >= 0.5),
             |ex AS (
             |  SELECT doc_id, text, n_tokens, quality FROM (
             |    SELECT *, md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS key
             |    FROM qp) f
             |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY key)),
             |sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM ex),
             |bsh AS (
             |  SELECT DISTINCT unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents WHERE doc_id % 97 = 0),
             |bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bsh b USING (shingle)),
             |clean AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
             |csh AS (SELECT s.doc_id, s.shingle FROM sh s JOIN clean c USING (doc_id)),
             |hb AS (
             |  SELECT doc_id,
             |    CAST(concat('0x', substring(md5(shingle),1,15)) AS BIGINT) % ${Dedup.MinhashPrime} AS h
             |  FROM csh),
             |sig AS (
             |  SELECT doc_id,
             |    ${(0 until 16).map(j => s"min((h * ${Dedup.minhashA(j)} + ${Dedup.minhashB(j)}) % ${Dedup.MinhashPrime}) AS mh_$j").mkString(", ")}
             |  FROM hb GROUP BY doc_id),
             |bands AS (
             |  SELECT doc_id, 0 AS band, mh_0 || '|' || mh_1 || '|' || mh_2 || '|' || mh_3 AS band_sig FROM sig
             |  UNION ALL SELECT doc_id, 1, mh_4 || '|' || mh_5 || '|' || mh_6 || '|' || mh_7 FROM sig
             |  UNION ALL SELECT doc_id, 2, mh_8 || '|' || mh_9 || '|' || mh_10 || '|' || mh_11 FROM sig
             |  UNION ALL SELECT doc_id, 3, mh_12 || '|' || mh_13 || '|' || mh_14 || '|' || mh_15 FROM sig),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bands a JOIN bands b
             |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM csh GROUP BY doc_id),
             |inter AS (
             |  SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
             |  FROM cand c
             |  JOIN csh x ON x.doc_id = c.id_a
             |  JOIN csh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
             |  GROUP BY c.id_a, c.id_b),
             |drops AS (
             |  SELECT DISTINCT i.id_b FROM inter i
             |  JOIN sizes sa ON sa.doc_id = i.id_a
             |  JOIN sizes sb ON sb.doc_id = i.id_b
             |  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.8)
             |SELECT doc_id, n_tokens, quality FROM clean
             |WHERE doc_id >= 300 AND doc_id NOT IN (SELECT id_b FROM drops)
             |ORDER BY doc_id""".stripMargin)),

    // Dedup-cluster canonicalization: the verified minhash pairs become
    // edges, connected components group transitive near-dups, and the min
    // doc_id per cluster is the one kept — the standard endgame of a
    // web-corpus dedup pipeline. Oracle replays the pair search and walks
    // the components as a recursive CTE.
    ("q_dedup_cluster",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.minhashNearDups(docs, idCol = "doc_id",
          textCol = "text", shingleSize = 3, numHashes = 16,
          rowsPerBand = 4, threshold = 0.8)
        Dedup.dedupClusters(docs, "doc_id", pairs).orderBy("doc_id")
      },
      Some(minhashCompCtes +
        """
          |SELECT d.doc_id,
          |  coalesce(c.cluster_id, d.doc_id) AS cluster_id,
          |  CAST(count(*) OVER (PARTITION BY coalesce(c.cluster_id, d.doc_id)) AS BIGINT) AS cluster_size,
          |  d.doc_id = coalesce(c.cluster_id, d.doc_id) AS is_kept
          |FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
          |ORDER BY d.doc_id""".stripMargin)),

    // Leak-safe split: the md5 split bucket is keyed on the near-dup
    // CLUSTER's canonical id, so a near-duplicate pair can never
    // straddle train and eval (the contamination a per-doc hash split
    // ships silently). Same pair pipeline as q_dedup_cluster; the
    // oracle shares its CTE prologue verbatim.
    ("q_leak_safe_split",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.minhashNearDups(docs, idCol = "doc_id",
          textCol = "text", shingleSize = 3, numHashes = 16,
          rowsPerBand = 4, threshold = 0.8)
        Dedup.leakSafeSplit(docs, "doc_id", pairs, pctTrain = 80, pctVal = 10)
          .orderBy("doc_id")
      },
      Some(minhashCompCtes +
        """
          |, keyed AS (
          |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
          |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
          |b AS (
          |  SELECT doc_id, cluster_id,
          |    CAST(concat('0x', substring(md5(CAST(cluster_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS bucket
          |  FROM keyed)
          |SELECT doc_id, cluster_id,
          |  CASE WHEN bucket < 80 THEN 'train'
          |       WHEN bucket < 90 THEN 'val'
          |       ELSE 'test' END AS split
          |FROM b ORDER BY doc_id""".stripMargin)),

    // Graded contamination report — the measurement step before the
    // binary decontaminate drop: per doc, what fraction of its distinct
    // 3-gram shingles appear in the benchmark suite (same % 97 bench
    // split as q_decontaminate).
    ("q_contamination_score",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0).select("text")
        Dedup.contaminationScore(docs, "doc_id", "text", bench, "text", n = 3)
          .orderBy("doc_id")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents),
             |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
             |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
             |  FROM sh GROUP BY 1),
             |hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
             |  FROM sh WHERE shingle IN (SELECT shingle FROM bench) GROUP BY 1)
             |SELECT t.doc_id, t.n_shingles,
             |  COALESCE(h.n_contaminated, 0) AS n_contaminated,
             |  CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) /
             |    CAST(t.n_shingles AS DOUBLE) AS contamination
             |FROM tot t LEFT JOIN hit h USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination: drop every corpus doc sharing ANY 3-gram
    // with the benchmark subset (doc_id % 97 == 0) — the test-set-leakage
    // guard. Benchmark shingles broadcast; corpus scanned once.
    ("q_decontaminate",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0).select("text")
        Dedup.decontaminate(docs, "doc_id", "text", bench, "text", n = 3)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents),
             |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
             |bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shingle))
             |SELECT doc_id FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
             |ORDER BY doc_id""".stripMargin)),

    // Same contamination answer via the bloom-sketch transport — the
    // form for benchmark sets too large to broadcast exactly. Identical
    // oracle: bloom false positives die in the exact verify join.
    ("q_decontaminate_bloom",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0).select("text")
        Dedup.decontaminateBloom(docs, "doc_id", "text", bench, "text", n = 3,
            expectedShingles = 1L << 14)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents),
             |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
             |bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shingle))
             |SELECT doc_id FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
             |ORDER BY doc_id""".stripMargin)),

    // Frequent 3-grams above a support fraction, exact counts, via the
    // two-pass Misra-Gries sketch + recount — no vocabulary-sized shuffle.
    // The oracle runs the classic one-pass groupBy (fine at DuckDB/fixture
    // scale); identical answers is the operator's contract.
    ("q_heavy_hitters",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        HeavyHitters.heavyHitters(docs, Dedup.ngramArray(col("text"), 3),
            minFraction = 0.0002)
          .orderBy("item")
      },
      Some("""WITH s AS (
             |  SELECT unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS item
             |  FROM documents),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
             |c AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY item)
             |SELECT item, cnt FROM c, tot
             |WHERE CAST(cnt AS DOUBLE) >= 0.0002 * CAST(n AS DOUBLE)
             |ORDER BY item""".stripMargin)),

    // BPE tokenizer-merge training: 8 merges learned from the corpus word
    // histogram (count-desc + lexicographic argmax — fully deterministic).
    // The oracle replays the whole iterative training as an unrolled CTE
    // chain with non-overlapping string replace as the merge step.
    ("q_bpe_merges",
      (s: SparkSession, d: String) => {
        val words = BpeTrainer.wordHistogram(Tables.documents(s, d), "text")
        BpeTrainer.learnMerges(words, "word", "freq", nMerges = 8)
          .orderBy("merge_rank")
      },
      Some(BpeTrainer.mergesOracleSql(8))),

    // The learned tokenizer applied back to the corpus vocabulary: per
    // word, its BPE token string + token count. Cross-engine check that
    // ENCODING with the merge list reproduces training's final state.
    ("q_bpe_encode",
      (s: SparkSession, d: String) => {
        val words = BpeTrainer.wordHistogram(Tables.documents(s, d), "text")
        val merges = BpeTrainer.learnMerges(words, "word", "freq", nMerges = 8)
          .orderBy("merge_rank").collect()
          .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
        BpeTrainer.encodeWords(words, "word", merges).orderBy("word")
      },
      Some(BpeTrainer.encodeOracleSql(8))),

    // Content-defined chunking: every document cut at rolling-hash
    // boundaries (native codegen'd scan), one fingerprinted chunk per
    // row. The oracle recomputes every window polynomial + mask cut and
    // the identical slicing in DuckDB — cut offsets, lengths, and chunk
    // md5s are all hash-compared.
    ("q_cdc_chunks",
      (s: SparkSession, d: String) => {
        Dedup.cdcChunks(Tables.documents(s, d), "doc_id", "text",
            w = 8, base = 31L, mask = 63L)
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH b AS (
             |  SELECT doc_id, text,
             |    ${graft.functions.TextExpressions.cdcBoundariesSql("text", 8, 31L, 63L)} AS cuts
             |  FROM documents),
             |a AS (
             |  SELECT doc_id, text, [0] || cuts || [length(text)] AS ac FROM b),
             |ch AS (
             |  SELECT doc_id, j - 1 AS chunk_idx,
             |    substr(text, CAST(ac[j] AS INT) + 1, CAST(ac[j+1] - ac[j] AS INT)) AS chunk
             |  FROM a, unnest(range(1, len(ac))) t(j))
             |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             |  CAST(length(chunk) AS INT) AS chunk_len, md5(chunk) AS chunk_md5
             |FROM ch WHERE length(chunk) > 0
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Greedy sequence packing: bin documents into ≤512-token training
    // packs per shard — a true recurrence (pack fill depends on previous
    // pack state), same secondary-sort scan as the rate clamp; the oracle
    // walks the identical recurrence as a recursive CTE.
    ("q_pack_sequences",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .withColumn("shard", pmod(col("doc_id"), lit(8)))
          .withColumn("n_tok", TextStats.tokenCount(col("text")))
        TextStats.packSequences(docs, "shard", "doc_id", "n_tok", maxTokens = 512)
          .orderBy("shard", "ord")
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT CAST(doc_id % 8 AS VARCHAR) AS shard,
             |    CAST(doc_id AS BIGINT) AS ord,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    CAST(row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS BIGINT) AS idx
             |  FROM documents),
             |r(shard, ord, n_tokens, idx, pack_id, pack_fill) AS (
             |  SELECT shard, ord, n_tokens, idx, CAST(0 AS BIGINT), n_tokens
             |  FROM t WHERE idx = 1
             |  UNION ALL
             |  SELECT t.shard, t.ord, t.n_tokens, t.idx,
             |    CASE WHEN r.pack_fill + t.n_tokens > 512 THEN r.pack_id + 1 ELSE r.pack_id END,
             |    CASE WHEN r.pack_fill + t.n_tokens > 512 THEN t.n_tokens ELSE r.pack_fill + t.n_tokens END
             |  FROM r JOIN t ON t.shard = r.shard AND t.idx = r.idx + 1)
             |SELECT shard, ord, n_tokens, pack_id, pack_fill
             |FROM r ORDER BY shard, ord""".stripMargin)),

    // Exact n-gram Jaccard among a bounded candidate window (doc_id < 300):
    // the exact-answer baseline the LSH path approximates.
    ("q_ngram_jaccard",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
        val sh = Dedup.shingles(docs, "doc_id", "text", 3)
        val pairs = sh.select(col("doc_id").as("id_a")).distinct()
          .join(sh.select(col("doc_id").as("id_b")).distinct(), col("id_a") < col("id_b"))
        Dedup.jaccardForPairs(pairs, sh, "doc_id")
          .filter(col("jaccard") >= 0.3)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents WHERE doc_id < 300),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
             |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
             |  GROUP BY 1, 2)
             |SELECT i.id_a, i.id_b,
             |  CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.id_a
             |JOIN sizes sb ON sb.doc_id = i.id_b
             |WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.3
             |ORDER BY id_a, id_b""".stripMargin)),

    // EXACT Jaccard ≥ 0.3 self-join over the FULL corpus via prefix
    // filtering (PPJoin candidates: index only each doc's rarest
    // sz−⌈τ·sz⌉+1 shingles in global ascending-df order — lossless by
    // the prefix-filter lemma, see Dedup.prefixFilteredJaccard). The
    // oracle is the NAIVE all-pairs Jaccard join: hash equality IS the
    // completeness proof, with no doc_id window (q_ngram_jaccard's
    // baseline must bound its corpus; this one doesn't).
    ("q_ppjoin_jaccard",
      (s: SparkSession, d: String) => {
        Dedup.prefixFilteredJaccard(Tables.documents(s, d), "doc_id", "text",
            n = 3, threshold = 0.3)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
             |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
             |  GROUP BY 1, 2)
             |SELECT i.id_a, i.id_b, i.inter, sa.sz AS sz_a, sb.sz AS sz_b,
             |  CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.id_a
             |JOIN sizes sb ON sb.doc_id = i.id_b
             |WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.3
             |ORDER BY id_a, id_b""".stripMargin)),

    // Asymmetric containment near-dup: |A∩B|/min(|A|,|B|) over df-pruned
    // inverted-index candidates (df 2..10, co-occurring in ≥2 buckets) —
    // catches excerpt/quote inclusion that Jaccard ≥ t and minhash
    // banding both miss.
    ("q_containment",
      (s: SparkSession, d: String) => {
        Dedup.containmentNearDups(Tables.documents(s, d), "doc_id", "text",
            n = 3, maxDf = 10, threshold = 0.5, minShared = 2)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingle
             |  FROM documents),
             |dfc AS (SELECT shingle FROM sh GROUP BY shingle
             |  HAVING count(*) BETWEEN 2 AND 10),
             |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN dfc USING (shingle)),
             |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
             |inter AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
             |  FROM cand c
             |  JOIN sh x ON x.doc_id = c.id_a
             |  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
             |  GROUP BY 1, 2)
             |SELECT i.id_a, i.id_b, sa.sz AS sz_a, sb.sz AS sz_b, i.inter,
             |  CAST(i.inter AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.id_a
             |JOIN sizes sb ON sb.doc_id = i.id_b
             |WHERE CAST(i.inter AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    // Brute-force cosine top-k similarity search (exact ANN baseline).
    ("q_embedding_topk",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(
            emb.filter(col("vec_id") < 10), emb,
            idCol = "vec_id", vecCol = "embedding", k = 5, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |n AS (
             |  SELECT vec_id, e,
             |    sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM v),
             |pairs AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, len(q.e)+1), i -> q.e[i]*c.e[i]), (x,y) -> x+y)
             |      / (q.nrm * c.nrm) AS cosine
             |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
             |  WHERE q.vec_id < 10),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, cand_id ASC) AS rank FROM pairs)
             |SELECT query_id, cand_id, cosine, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Hard-negative mining: per query vector, the top-5 most-similar
    // candidates with a DIFFERENT label (contrastive-training negatives).
    ("q_hard_negatives",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        Similarity.hardNegatives(
            emb.filter(col("vec_id") < 10), emb,
            idCol = "vec_id", vecCol = "embedding", labelCol = "label",
            k = 5, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |n AS (
             |  SELECT vec_id, label, e,
             |    sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM v),
             |pairs AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, len(q.e)+1), i -> q.e[i]*c.e[i]), (x,y) -> x+y)
             |      / (q.nrm * c.nrm) AS cosine
             |  FROM n q JOIN n c ON q.vec_id <> c.vec_id AND q.label <> c.label
             |  WHERE q.vec_id < 10),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, cand_id ASC) AS rank FROM pairs)
             |SELECT query_id, cand_id, cosine, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Same exact top-k, but via the bounded-heap partial aggregation
    // (functions/TopK) — the 100 TB shape: ≤ k rows per (query, partition)
    // survive the map side instead of shuffling every scored pair into a
    // per-query window sort. Oracle is the plain windowed SQL: the rows
    // must be identical.
    ("q_topk_agg",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopKAgg(
            emb.filter(col("vec_id") >= 10 && col("vec_id") < 22), emb,
            idCol = "vec_id", vecCol = "embedding", k = 8, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |n AS (
             |  SELECT vec_id, e,
             |    sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM v),
             |pairs AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, len(q.e)+1), i -> q.e[i]*c.e[i]), (x,y) -> x+y)
             |      / (q.nrm * c.nrm) AS cosine
             |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
             |  WHERE q.vec_id >= 10 AND q.vec_id < 22),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, cand_id ASC) AS rank FROM pairs)
             |SELECT query_id, cand_id, cosine, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 8 ORDER BY query_id, rank""".stripMargin)),

    // Johnson–Lindenstrauss random projection (64 → 16 dims, ±1 md5-sign
    // matrix regenerated from the seed in both engines): the coarse stage
    // of two-stage retrieval. Map-side only; components exploded to rows
    // so the hash compare is over scalar doubles. Fold order matches the
    // oracle's list_reduce, so every component is IEEE-exact.
    ("q_random_project",
      (s: SparkSession, d: String) => {
        Similarity.randomProject(Tables.embeddings(s, d),
            vecCol = "embedding", outCol = "proj",
            outDim = 16, seed = "jl", dim = 64)
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("pos", "component")))
          .orderBy("vec_id", "pos")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |p AS (
             |  SELECT vec_id, j,
             |    list_reduce(list_transform(range(1, 65), i ->
             |      e[i] * (CASE WHEN substr(md5('jl:' || j || ':' || (i - 1)), 1, 1)
             |        IN ('1','3','5','7','9','b','d','f') THEN 1.0 ELSE -1.0 END)),
             |      (a, b) -> a + b) AS component
             |  FROM v, range(0, 16) AS t(j))
             |SELECT vec_id, CAST(j AS INT) AS pos, component
             |FROM p ORDER BY vec_id, pos""".stripMargin)),

    // Two-stage retrieval: coarse top-20 in the 16-dim JL projection,
    // exact 64-dim re-rank to top-5. Both stages replayed in DuckDB from
    // the seed alone — coarse survivor sets agree because the projected
    // cosines are bit-identical and the (score desc, id asc) tie-break is
    // deterministic in both engines.
    ("q_projected_topk",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        Similarity.projectedTopK(
            emb.filter(col("vec_id") < 10), emb,
            idCol = "vec_id", vecCol = "embedding", k = 5, kCoarse = 20,
            outDim = 16, seed = "jl", dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |pc AS (
             |  SELECT vec_id, j,
             |    list_reduce(list_transform(range(1, 65), i ->
             |      e[i] * (CASE WHEN substr(md5('jl:' || j || ':' || (i - 1)), 1, 1)
             |        IN ('1','3','5','7','9','b','d','f') THEN 1.0 ELSE -1.0 END)),
             |      (a, b) -> a + b) AS comp
             |  FROM v, range(0, 16) AS t(j)),
             |p AS (SELECT vec_id, list(comp ORDER BY j) AS pj FROM pc GROUP BY vec_id),
             |pn AS (SELECT vec_id, pj,
             |  sqrt(list_reduce(list_transform(pj, x -> x*x), (a,b) -> a+b)) AS nrm FROM p),
             |cp AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, 17), i -> q.pj[i]*c.pj[i]), (x,y) -> x+y)
             |      / (q.nrm * c.nrm) AS pcos
             |  FROM pn q JOIN pn c ON q.vec_id <> c.vec_id
             |  WHERE q.vec_id < 10),
             |cr AS (SELECT query_id, cand_id FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY pcos DESC, cand_id ASC) AS r FROM cp) WHERE r <= 20),
             |n AS (SELECT vec_id, e,
             |  sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
             |ex AS (
             |  SELECT cr.query_id, cr.cand_id,
             |    list_reduce(list_transform(range(1, 65), i -> q.e[i]*c.e[i]), (x,y) -> x+y)
             |      / (q.nrm * c.nrm) AS cosine
             |  FROM cr JOIN n q ON q.vec_id = cr.query_id
             |    JOIN n c ON c.vec_id = cr.cand_id)
             |SELECT query_id, cand_id, cosine, CAST(rank AS INT) AS rank FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, cand_id ASC) AS rank FROM ex)
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Bitext mining: mutual cross-label nearest neighbors — the
    // parallel-corpus discovery step. A pair survives only when each
    // side is the other's top-1 among the OTHER label's vectors
    // (mutuality separates translation pairs from topical hubs).
    ("q_bitext_pairs",
      (s: SparkSession, d: String) => {
        Similarity.mutualNearestPairs(Tables.embeddings(s, d),
            idCol = "vec_id", vecCol = "embedding", labelCol = "label",
            minCosine = 0.0, dim = 64)
          .orderBy("id_a")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |n AS (SELECT vec_id, label, e,
             |  sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
             |p AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, 65), i -> q.e[i]*c.e[i]), (x,y) -> x+y)
             |      / (q.nrm * c.nrm) AS cosine
             |  FROM n q JOIN n c ON q.vec_id <> c.vec_id AND q.label <> c.label),
             |t AS (SELECT query_id, cand_id, cosine FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, cand_id ASC) AS rn FROM p) WHERE rn = 1),
             |m AS (SELECT f.query_id AS id_a, f.cand_id AS id_b, f.cosine
             |  FROM t f JOIN t b ON b.query_id = f.cand_id AND b.cand_id = f.query_id)
             |SELECT id_a, id_b, cosine FROM m
             |WHERE id_a < id_b AND cosine >= 0.0 ORDER BY id_a""".stripMargin)),

    // Margin-scored bitext: the CCMatrix ratio criterion — each mutual
    // pair's cosine relative to both endpoints' average top-4
    // cross-label cosine. The averages fold in RANK order (explicit
    // sorted-array fold, not an unordered SUM), which is what makes a
    // float margin hash-replayable.
    ("q_bitext_margin",
      (s: SparkSession, d: String) => {
        Similarity.marginScoredPairs(Tables.embeddings(s, d),
            idCol = "vec_id", vecCol = "embedding", labelCol = "label",
            k = 4, dim = 64)
          .orderBy("id_a")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |n AS (SELECT vec_id, label, e,
             |  sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
             |p AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, 65), i -> q.e[i]*c.e[i]), (x,y) -> x+y)
             |      / (q.nrm * c.nrm) AS cosine
             |  FROM n q JOIN n c ON q.vec_id <> c.vec_id AND q.label <> c.label),
             |t AS (SELECT query_id, cand_id, cosine, rn FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, cand_id ASC) AS rn FROM p) WHERE rn <= 4),
             |a AS (SELECT query_id,
             |  list_reduce(list(cosine ORDER BY rn), (x, y) -> x + y) / count(*) AS avg_topk
             |  FROM t GROUP BY query_id),
             |t1 AS (SELECT query_id, cand_id, cosine FROM t WHERE rn = 1),
             |m AS (SELECT f.query_id AS id_a, f.cand_id AS id_b, f.cosine
             |  FROM t1 f JOIN t1 b ON b.query_id = f.cand_id AND b.cand_id = f.query_id
             |  WHERE f.query_id < f.cand_id)
             |SELECT m.id_a, m.id_b, m.cosine,
             |  m.cosine / ((aa.avg_topk + ab.avg_topk) / 2.0) AS margin
             |FROM m JOIN a aa ON aa.query_id = m.id_a
             |  JOIN a ab ON ab.query_id = m.id_b
             |ORDER BY id_a""".stripMargin)),

    // int8-quantized top-k: symmetric per-vector scalar quantization
    // (q = floor(x/amax·127+0.5)), then exact cosine over the integer
    // codes — every product/add exact in double, so the ranking is
    // bit-reproducible cross-engine. The candidate stream is ¼ the
    // float32 bytes at corpus scale; scales cancel in the cosine.
    ("q_quantized_topk",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        Similarity.quantizedTopK(
            emb.filter(col("vec_id") < 10), emb,
            idCol = "vec_id", vecCol = "embedding", k = 5, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |qz AS (
             |  SELECT vec_id,
             |    list_transform(e, x -> floor(x / greatest(
             |      list_max(list_transform(e, y -> abs(y))), 5e-324) * 127.0 + 0.5))
             |      AS q
             |  FROM v),
             |n AS (
             |  SELECT vec_id, q,
             |    sqrt(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM qz),
             |pairs AS (
             |  SELECT qq.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, len(qq.q)+1), i -> qq.q[i]*c.q[i]), (x,y) -> x+y)
             |      / (qq.nrm * c.nrm) AS qcosine
             |  FROM n qq JOIN n c ON qq.vec_id <> c.vec_id
             |  WHERE qq.vec_id < 10),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY qcosine DESC, cand_id ASC) AS rank FROM pairs)
             |SELECT query_id, cand_id, qcosine, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Recall@5 of the int8-quantized index vs the exact float top-k over
    // the same query sample — the index-quality monitor run before
    // trusting a new index/parameter change. (queries·k)-sized eval.
    ("q_ann_recall",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 10)
        Similarity.recallReport(
            approx = Similarity.quantizedTopK(queries, emb,
              idCol = "vec_id", vecCol = "embedding", k = 5, dim = 64),
            exact = Similarity.bruteForceTopK(queries, emb,
              idCol = "vec_id", vecCol = "embedding", k = 5, dim = 64))
          .orderBy("query_id")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |n AS (SELECT vec_id, e,
             |  sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
             |ep AS (
             |  SELECT qq.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, len(qq.e)+1), i -> qq.e[i]*c.e[i]), (x,y) -> x+y)
             |      / (qq.nrm * c.nrm) AS cosine
             |  FROM n qq JOIN n c ON qq.vec_id <> c.vec_id
             |  WHERE qq.vec_id < 10),
             |er AS (SELECT query_id, cand_id FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cosine DESC, cand_id ASC) AS rank FROM ep)
             |  WHERE rank <= 5),
             |qz AS (
             |  SELECT vec_id,
             |    list_transform(e, x -> floor(x / greatest(
             |      list_max(list_transform(e, y -> abs(y))), 5e-324) * 127.0 + 0.5)) AS q
             |  FROM v),
             |nq AS (SELECT vec_id, q,
             |  sqrt(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS nrm FROM qz),
             |ap AS (
             |  SELECT qq.vec_id AS query_id, c.vec_id AS cand_id,
             |    list_reduce(list_transform(range(1, len(qq.q)+1), i -> qq.q[i]*c.q[i]), (x,y) -> x+y)
             |      / (qq.nrm * c.nrm) AS qcosine
             |  FROM nq qq JOIN nq c ON qq.vec_id <> c.vec_id
             |  WHERE qq.vec_id < 10),
             |ar AS (SELECT query_id, cand_id FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY qcosine DESC, cand_id ASC) AS rank FROM ap)
             |  WHERE rank <= 5)
             |SELECT er.query_id, CAST(count(*) AS BIGINT) AS n_exact,
             |  CAST(count(ar.cand_id) AS BIGINT) AS n_hit,
             |  CAST(count(ar.cand_id) AS DOUBLE) / count(*) AS recall
             |FROM er LEFT JOIN ar
             |  ON ar.query_id = er.query_id AND ar.cand_id = er.cand_id
             |GROUP BY er.query_id ORDER BY er.query_id""".stripMargin)),

    // One Lloyd (k-means) refinement step of the IVF coarse quantizer
    // over int8-quantized codes: map-side max-cosine assignment, then
    // per-(cell, dimension) exact integer means. Integer sums commute, so
    // the refined centroids hash-match the oracle bit-for-bit — the
    // training step float k-means can't verify cross-engine.
    ("q_kmeans_refine",
      (s: SparkSession, d: String) => {
        val q = Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding")
          .select(col("vec_id"), col("qvec").cast("array<double>").as("qv"))
        val centroids = q.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("qv").as("centroid"))
        KMeansOps.lloydStep(q, "vec_id", "qv", centroids, dim = 64)
          .orderBy("cell_id", "pos")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |qz AS (
             |  SELECT vec_id, list_transform(e, x -> floor(x / greatest(
             |    list_max(list_transform(e, y -> abs(y))), 5e-324) * 127.0 + 0.5)) AS q
             |  FROM v),
             |n AS (SELECT vec_id, q,
             |  sqrt(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS nrm FROM qz),
             |c AS (SELECT vec_id AS cell_id, q AS cq, nrm AS cnrm FROM n WHERE vec_id < 8),
             |assign AS (
             |  SELECT vec_id, cell_id FROM (
             |    SELECT v2.vec_id, c.cell_id, row_number() OVER (PARTITION BY v2.vec_id ORDER BY
             |      list_reduce(list_transform(range(1, len(v2.q)+1), i -> v2.q[i]*c.cq[i]), (x,y) -> x+y)
             |        / (v2.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
             |    FROM n v2, c) WHERE rn = 1),
             |ex AS (
             |  SELECT a.cell_id,
             |    unnest(list_transform(range(1, len(q.q)+1), i -> {'pos': i-1, 'x': q.q[i]})) AS u
             |  FROM assign a JOIN qz q USING (vec_id))
             |SELECT cell_id, CAST(u.pos AS INT) AS pos, CAST(COUNT(*) AS BIGINT) AS n_points,
             |  (CAST(SUM(CAST(u.x AS BIGINT)) AS DOUBLE) / COUNT(*)) AS mean
             |FROM ex GROUP BY cell_id, u.pos ORDER BY cell_id, pos""".stripMargin)),

    // Semantic cluster keyword report — the cross-modal exploration
    // query: every doc's embedding assigned to its max-cosine cell
    // (int8-quantized assignment, tie → lowest cell, the q_kmeans_refine
    // kernel), then each cell's most DISTINCTIVE terms by lift =
    // in-cell term share / corpus term share. Both lift factors are
    // exact integer products cast to double, so ranking replays
    // bit-exactly; a min-count floor (≥5) keeps one-off terms from
    // spiking the ratio.
    ("q_cluster_keywords",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val q = Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding")
          .select(col("vec_id"), col("qvec").cast("array<double>").as("qv"))
        val cents = q.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("qv").as("centroid"))
        val assigned = Similarity.ivfAssignments(q, "vec_id", "qv", cents, dim = 64)
          .select(col("vec_id").as("doc_id"), col("cell_id"))
        val toks = assigned
          .join(Tables.documents(s, d).select(col("doc_id"), col("text")), Seq("doc_id"))
          .select(col("cell_id"), explode(split(col("text"), " ")).as("term"))
        // ct is the ONLY aggregate over the corpus-sized explode; the
        // three totals re-aggregate ct's (cell, term)-sized output, so
        // the assign→join→explode lineage and its exchange run once
        // (ReuseExchange) instead of once per differently-keyed consumer
        val ct = toks.groupBy("cell_id", "term").agg(count(lit(1)).as("term_count"))
        val cellTot = ct.groupBy("cell_id").agg(sum("term_count").as("cell_tokens"))
        val termTot = ct.groupBy("term").agg(sum("term_count").as("corpus_count"))
        val tot = ct.agg(sum("term_count").as("corpus_tokens"))
        val w = Window.partitionBy("cell_id").orderBy(col("lift").desc, col("term").asc)
        ct.filter(col("term_count") >= 5)
          .join(cellTot, Seq("cell_id"))
          .join(termTot, Seq("term"))
          .crossJoin(broadcast(tot))
          .withColumn("lift",
            (col("term_count") * col("corpus_tokens")).cast("double") /
              (col("cell_tokens") * col("corpus_count")).cast("double"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("cell_id"), col("rank"), col("term"), col("term_count"), col("lift"))
          .orderBy("cell_id", "rank")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |qz AS (
             |  SELECT vec_id, list_transform(e, x -> floor(x / greatest(
             |    list_max(list_transform(e, y -> abs(y))), 5e-324) * 127.0 + 0.5)) AS q
             |  FROM v),
             |n AS (SELECT vec_id, q,
             |  sqrt(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS nrm FROM qz),
             |c AS (SELECT vec_id AS cell_id, q AS cq, nrm AS cnrm FROM n WHERE vec_id < 8),
             |assign AS (
             |  SELECT vec_id, cell_id FROM (
             |    SELECT v2.vec_id, c.cell_id, row_number() OVER (PARTITION BY v2.vec_id ORDER BY
             |      list_reduce(list_transform(range(1, len(v2.q)+1), i -> v2.q[i]*c.cq[i]), (x,y) -> x+y)
             |        / (v2.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
             |    FROM n v2, c) WHERE rn = 1),
             |tk AS (SELECT a.cell_id, unnest(string_split(d.text, ' ')) AS term
             |  FROM assign a JOIN documents d ON d.doc_id = a.vec_id),
             |ct AS (SELECT cell_id, term, CAST(count(*) AS BIGINT) AS term_count
             |  FROM tk GROUP BY 1, 2),
             |ctot AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS cell_tokens
             |  FROM tk GROUP BY 1),
             |ttot AS (SELECT term, CAST(count(*) AS BIGINT) AS corpus_count
             |  FROM tk GROUP BY 1),
             |gt AS (SELECT CAST(count(*) AS BIGINT) AS corpus_tokens FROM tk),
             |sc AS (SELECT ct.cell_id, ct.term, ct.term_count,
             |    CAST(ct.term_count * gt.corpus_tokens AS DOUBLE)
             |      / CAST(ctot.cell_tokens * ttot.corpus_count AS DOUBLE) AS lift
             |  FROM ct JOIN ctot USING (cell_id) JOIN ttot USING (term), gt
             |  WHERE ct.term_count >= 5)
             |SELECT cell_id, CAST(rank AS INT) AS rank, term, term_count, lift FROM (
             |  SELECT *, row_number() OVER (PARTITION BY cell_id
             |    ORDER BY lift DESC, term ASC) AS rank FROM sc)
             |WHERE rank <= 5 ORDER BY cell_id, rank""".stripMargin)),

    // Full Lloyd TRAINING (assign→mean iterated to fixed point, capped at
    // 3 rounds) over int8 codes — the loop around q_kmeans_refine's
    // single step. Early convergence composes with the oracle's fixed
    // 3-round replay: at a fixed point further rounds are the identity.
    ("q_kmeans_train",
      (s: SparkSession, d: String) => {
        val q = Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding")
          .select(col("vec_id"), col("qvec").cast("array<double>").as("qv"))
        val seed = q.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("qv").as("centroid"))
        KMeansOps.lloydTrain(q, "vec_id", "qv", seed, dim = 64, maxIter = 3)
          .orderBy("cell_id", "pos")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |qz AS (
             |  SELECT vec_id, list_transform(e, x -> floor(x / greatest(
             |    list_max(list_transform(e, y -> abs(y))), 5e-324) * 127.0 + 0.5)) AS q
             |  FROM v),
             |n AS (SELECT vec_id, q,
             |  sqrt(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS nrm FROM qz),
             |c1 AS (SELECT vec_id AS cell_id, q AS cq,
             |  sqrt(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS cnrm
             |  FROM qz WHERE vec_id < 8),
             |a1 AS (SELECT vec_id, cell_id FROM (
             |  SELECT n.vec_id, c1.cell_id, row_number() OVER (PARTITION BY n.vec_id ORDER BY
             |    list_reduce(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c1.cq[i]), (x,y) -> x+y)
             |      / (n.nrm * c1.cnrm) DESC, c1.cell_id ASC) AS rn
             |  FROM n, c1) WHERE rn = 1),
             |s1 AS (SELECT cell_id, CAST(u.pos AS INT) AS pos,
             |    CAST(COUNT(*) AS BIGINT) AS n_points,
             |    (CAST(SUM(CAST(u.x AS BIGINT)) AS DOUBLE) / COUNT(*)) AS mean
             |  FROM (SELECT a.cell_id,
             |      unnest(list_transform(range(1, len(q.q)+1), i -> {'pos': i-1, 'x': q.q[i]})) AS u
             |    FROM a1 a JOIN qz q USING (vec_id)) GROUP BY cell_id, u.pos),
             |c2 AS (SELECT cell_id, list(mean ORDER BY pos) AS cq,
             |  sqrt(list_reduce(list_transform(list(mean ORDER BY pos), x -> x*x), (a,b) -> a+b)) AS cnrm
             |  FROM s1 GROUP BY cell_id),
             |a2 AS (SELECT vec_id, cell_id FROM (
             |  SELECT n.vec_id, c2.cell_id, row_number() OVER (PARTITION BY n.vec_id ORDER BY
             |    list_reduce(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c2.cq[i]), (x,y) -> x+y)
             |      / (n.nrm * c2.cnrm) DESC, c2.cell_id ASC) AS rn
             |  FROM n, c2) WHERE rn = 1),
             |s2 AS (SELECT cell_id, CAST(u.pos AS INT) AS pos,
             |    CAST(COUNT(*) AS BIGINT) AS n_points,
             |    (CAST(SUM(CAST(u.x AS BIGINT)) AS DOUBLE) / COUNT(*)) AS mean
             |  FROM (SELECT a.cell_id,
             |      unnest(list_transform(range(1, len(q.q)+1), i -> {'pos': i-1, 'x': q.q[i]})) AS u
             |    FROM a2 a JOIN qz q USING (vec_id)) GROUP BY cell_id, u.pos),
             |c3 AS (SELECT cell_id, list(mean ORDER BY pos) AS cq,
             |  sqrt(list_reduce(list_transform(list(mean ORDER BY pos), x -> x*x), (a,b) -> a+b)) AS cnrm
             |  FROM s2 GROUP BY cell_id),
             |a3 AS (SELECT vec_id, cell_id FROM (
             |  SELECT n.vec_id, c3.cell_id, row_number() OVER (PARTITION BY n.vec_id ORDER BY
             |    list_reduce(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c3.cq[i]), (x,y) -> x+y)
             |      / (n.nrm * c3.cnrm) DESC, c3.cell_id ASC) AS rn
             |  FROM n, c3) WHERE rn = 1)
             |SELECT cell_id, CAST(u.pos AS INT) AS pos,
             |  CAST(COUNT(*) AS BIGINT) AS n_points,
             |  (CAST(SUM(CAST(u.x AS BIGINT)) AS DOUBLE) / COUNT(*)) AS mean
             |FROM (SELECT a.cell_id,
             |    unnest(list_transform(range(1, len(q.q)+1), i -> {'pos': i-1, 'x': q.q[i]})) AS u
             |  FROM a3 a JOIN qz q USING (vec_id)) GROUP BY cell_id, u.pos
             |ORDER BY cell_id, pos""".stripMargin)),

    // Cluster-balanced prototype selection: 10 most-typical vectors per
    // IVF cell via the bounded-heap TopK partial agg (no per-cell sort).
    ("q_cluster_sample",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
        Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
            centroids, dim = 64, perCell = 10)
          .orderBy("cell_id", "rank")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |n AS (SELECT vec_id, e,
             |  sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm FROM v),
             |c AS (SELECT vec_id AS cell_id, e AS ce, nrm AS cn FROM n WHERE vec_id < 8),
             |assign AS (SELECT vec_id, cell_id, cos FROM (
             |  SELECT n.vec_id, c.cell_id,
             |    list_reduce(list_transform(range(1, len(n.e)+1), i -> n.e[i]*c.ce[i]), (x,y) -> x+y)
             |      / (n.nrm * c.cn) AS cos,
             |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
             |      list_reduce(list_transform(range(1, len(n.e)+1), i -> n.e[i]*c.ce[i]), (x,y) -> x+y)
             |        / (n.nrm * c.cn) DESC, c.cell_id ASC) AS rn
             |  FROM n, c) WHERE rn = 1),
             |r AS (SELECT cell_id, vec_id, cos,
             |  row_number() OVER (PARTITION BY cell_id
             |    ORDER BY cos DESC, vec_id ASC) AS rank FROM assign)
             |SELECT cell_id, CAST(rank AS INT) AS rank, vec_id, cos AS cell_cosine
             |FROM r WHERE rank <= 10 ORDER BY cell_id, rank""".stripMargin)),

    // Product quantization ANN (Jégou et al. 2011): 4 subspace codebooks
    // cut from sample vectors (vec_id < 8), every candidate encoded as 4
    // dense code positions (the 64×-compressed index), queries ranked by
    // ADC — per-pair cost is 4 LUT lookups, zero vector math. Run over
    // int8-quantized codes so every subspace dot is integer-valued and
    // the ADC sum is exact → hash-reproducible in DuckDB.
    ("q_pq_topk",
      (s: SparkSession, d: String) => {
        val q = Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding")
          .select(col("vec_id"), col("qvec").cast("array<double>").as("qv"))
        val books = ProductQuantization.subspaceCodebooks(
          q.filter(col("vec_id") < 8), "vec_id", "qv", m = 4, dim = 64)
        val encoded = ProductQuantization.pqEncode(
          q.filter(col("vec_id") >= 8), "vec_id", "qv", books, m = 4, dim = 64)
        ProductQuantization.adcTopK(
            queries = q.filter(col("vec_id") >= 8 && col("vec_id") < 18),
            encoded = encoded, codebooks = books,
            idCol = "vec_id", vecCol = "qv", k = 5, m = 4, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |qz AS (
             |  SELECT vec_id, list_transform(e, x -> floor(x / greatest(
             |    list_max(list_transform(e, y -> abs(y))), 5e-324) * 127.0 + 0.5)) AS q
             |  FROM v),
             |subs AS (SELECT CAST(s AS INT) AS sub FROM range(4) t(s)),
             |books AS (
             |  SELECT sub, row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS code,
             |    list_slice(q, sub*16+1, sub*16+16) AS cv
             |  FROM qz, subs WHERE vec_id < 8),
             |enc AS (
             |  SELECT vec_id AS cand_id, sub, code FROM (
             |    SELECT c.vec_id, b.sub, b.code,
             |      row_number() OVER (PARTITION BY c.vec_id, b.sub ORDER BY
             |        list_reduce(list_transform(range(1, 17),
             |          i -> (list_slice(c.q, b.sub*16+1, b.sub*16+16)[i] - b.cv[i])
             |             * (list_slice(c.q, b.sub*16+1, b.sub*16+16)[i] - b.cv[i])),
             |          (a, b2) -> a + b2) ASC,
             |        b.code ASC) AS rn
             |    FROM qz c JOIN books b ON true WHERE c.vec_id >= 8) WHERE rn = 1),
             |lut AS (
             |  SELECT qq.vec_id AS query_id, b.sub, b.code,
             |    list_reduce(list_transform(range(1, 17),
             |      i -> list_slice(qq.q, b.sub*16+1, b.sub*16+16)[i] * b.cv[i]),
             |      (a, b2) -> a + b2) AS part
             |  FROM qz qq JOIN books b ON true
             |  WHERE qq.vec_id >= 8 AND qq.vec_id < 18),
             |scored AS (
             |  SELECT l.query_id, e2.cand_id, SUM(l.part) AS score
             |  FROM enc e2 JOIN lut l ON l.sub = e2.sub AND l.code = e2.code
             |  WHERE l.query_id <> e2.cand_id
             |  GROUP BY l.query_id, e2.cand_id),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, cand_id ASC) AS rank FROM scored)
             |SELECT query_id, cand_id, score, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // IVFADC — the production ANN composition: candidates coarse-
    // quantized to max-cosine cells AND PQ-encoded in one map pass;
    // queries probe their top-2 cells and ADC-score only the candidates
    // assigned there. Same integer-exactness argument as q_pq_topk, so
    // the whole two-level index replays hash-identically in DuckDB.
    ("q_ivf_pq",
      (s: SparkSession, d: String) => {
        val q = Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding")
          .select(col("vec_id"), col("qvec").cast("array<double>").as("qv"))
        val centroids = q.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("qv").as("centroid"))
        val books = ProductQuantization.subspaceCodebooks(
          q.filter(col("vec_id") < 8), "vec_id", "qv", m = 4, dim = 64)
        ProductQuantization.ivfPqTopK(
            queries = q.filter(col("vec_id") >= 8 && col("vec_id") < 18),
            candidates = q.filter(col("vec_id") >= 8),
            centroids = centroids, codebooks = books,
            idCol = "vec_id", vecCol = "qv", k = 3, nProbe = 2, m = 4, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |qz AS (
             |  SELECT vec_id, list_transform(e, x -> floor(x / greatest(
             |    list_max(list_transform(e, y -> abs(y))), 5e-324) * 127.0 + 0.5)) AS q
             |  FROM v),
             |n AS (SELECT vec_id, q,
             |  sqrt(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS nrm FROM qz),
             |c AS (SELECT vec_id AS cell_id, q AS cq, nrm AS cnrm FROM n WHERE vec_id < 8),
             |assign AS (
             |  SELECT vec_id AS cand_id, cell_id FROM (
             |    SELECT v2.vec_id, c.cell_id, row_number() OVER (PARTITION BY v2.vec_id ORDER BY
             |      list_reduce(list_transform(range(1, len(v2.q)+1), i -> v2.q[i]*c.cq[i]), (x,y) -> x+y)
             |        / (v2.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
             |    FROM n v2, c WHERE v2.vec_id >= 8) WHERE rn = 1),
             |subs AS (SELECT CAST(s AS INT) AS sub FROM range(4) t(s)),
             |books AS (
             |  SELECT sub, row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS code,
             |    list_slice(q, sub*16+1, sub*16+16) AS cv
             |  FROM qz, subs WHERE vec_id < 8),
             |enc AS (
             |  SELECT vec_id AS cand_id, sub, code FROM (
             |    SELECT cd.vec_id, b.sub, b.code,
             |      row_number() OVER (PARTITION BY cd.vec_id, b.sub ORDER BY
             |        list_reduce(list_transform(range(1, 17),
             |          i -> (list_slice(cd.q, b.sub*16+1, b.sub*16+16)[i] - b.cv[i])
             |             * (list_slice(cd.q, b.sub*16+1, b.sub*16+16)[i] - b.cv[i])),
             |          (a, b2) -> a + b2) ASC,
             |        b.code ASC) AS rn
             |    FROM qz cd JOIN books b ON true WHERE cd.vec_id >= 8) WHERE rn = 1),
             |probes AS (
             |  SELECT vec_id AS query_id, cell_id FROM (
             |    SELECT v2.vec_id, c.cell_id, row_number() OVER (PARTITION BY v2.vec_id ORDER BY
             |      list_reduce(list_transform(range(1, len(v2.q)+1), i -> v2.q[i]*c.cq[i]), (x,y) -> x+y)
             |        / (v2.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
             |    FROM n v2, c WHERE v2.vec_id >= 8 AND v2.vec_id < 18) WHERE rn <= 2),
             |lut AS (
             |  SELECT qq.vec_id AS query_id, b.sub, b.code,
             |    list_reduce(list_transform(range(1, 17),
             |      i -> list_slice(qq.q, b.sub*16+1, b.sub*16+16)[i] * b.cv[i]),
             |      (a, b2) -> a + b2) AS part
             |  FROM qz qq JOIN books b ON true
             |  WHERE qq.vec_id >= 8 AND qq.vec_id < 18),
             |scored AS (
             |  SELECT p.query_id, a.cell_id, a.cand_id, SUM(l.part) AS score
             |  FROM probes p
             |  JOIN assign a ON a.cell_id = p.cell_id AND a.cand_id <> p.query_id
             |  JOIN enc e2 ON e2.cand_id = a.cand_id
             |  JOIN lut l ON l.query_id = p.query_id AND l.sub = e2.sub AND l.code = e2.code
             |  GROUP BY p.query_id, a.cell_id, a.cand_id),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, cand_id ASC) AS rank FROM scored)
             |SELECT query_id, cell_id, cand_id, score, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // IVFADC with RESIDUAL encoding — the full Jégou construction: the
    // PQ codes quantize (vector − cell centroid), codebooks are trained
    // on sample residuals (vec_id 8..15, DISJOINT from the centroid set:
    // a centroid's own residual is zero), and the score adds the exact
    // dot(q, centroid) term back per probed cell. Inner-product
    // linearity means ONE residual LUT per query serves every probe.
    // Same integer-exactness argument as q_ivf_pq → hash-replayable.
    ("q_ivf_pq_res",
      (s: SparkSession, d: String) => {
        val q = Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding")
          .select(col("vec_id"), col("qvec").cast("array<double>").as("qv"))
        val centroids = q.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("qv").as("centroid"))
        val books = ProductQuantization.residualCodebooks(
          q.filter(col("vec_id") >= 8 && col("vec_id") < 16), "vec_id", "qv",
          centroids, m = 4, dim = 64)
        ProductQuantization.ivfPqResidualTopK(
            queries = q.filter(col("vec_id") >= 8 && col("vec_id") < 18),
            candidates = q.filter(col("vec_id") >= 8),
            centroids = centroids, codebooks = books,
            idCol = "vec_id", vecCol = "qv", k = 3, nProbe = 2, m = 4, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |qz AS (
             |  SELECT vec_id, list_transform(e, x -> floor(x / greatest(
             |    list_max(list_transform(e, y -> abs(y))), 5e-324) * 127.0 + 0.5)) AS q
             |  FROM v),
             |n AS (SELECT vec_id, q,
             |  sqrt(list_reduce(list_transform(q, x -> x*x), (a,b) -> a+b)) AS nrm FROM qz),
             |c AS (SELECT vec_id AS cell_id, q AS cq, nrm AS cnrm FROM n WHERE vec_id < 8),
             |assign AS (
             |  SELECT vec_id AS cand_id, cell_id FROM (
             |    SELECT v2.vec_id, c.cell_id, row_number() OVER (PARTITION BY v2.vec_id ORDER BY
             |      list_reduce(list_transform(range(1, len(v2.q)+1), i -> v2.q[i]*c.cq[i]), (x,y) -> x+y)
             |        / (v2.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
             |    FROM n v2, c WHERE v2.vec_id >= 8) WHERE rn = 1),
             |res AS (
             |  SELECT a.cand_id, a.cell_id,
             |    list_transform(range(1, 65), i -> z.q[i] - c.cq[i]) AS r
             |  FROM assign a JOIN qz z ON z.vec_id = a.cand_id
             |  JOIN c ON c.cell_id = a.cell_id),
             |subs AS (SELECT CAST(s AS INT) AS sub FROM range(4) t(s)),
             |books AS (
             |  SELECT sub, row_number() OVER (PARTITION BY sub ORDER BY cand_id) - 1 AS code,
             |    list_slice(r, sub*16+1, sub*16+16) AS cv
             |  FROM res, subs WHERE cand_id < 16),
             |enc AS (
             |  SELECT cand_id, cell_id, sub, code FROM (
             |    SELECT rr.cand_id, rr.cell_id, b.sub, b.code,
             |      row_number() OVER (PARTITION BY rr.cand_id, b.sub ORDER BY
             |        list_reduce(list_transform(range(1, 17),
             |          i -> (list_slice(rr.r, b.sub*16+1, b.sub*16+16)[i] - b.cv[i])
             |             * (list_slice(rr.r, b.sub*16+1, b.sub*16+16)[i] - b.cv[i])),
             |          (a, b2) -> a + b2) ASC,
             |        b.code ASC) AS rn
             |    FROM res rr JOIN books b ON true) WHERE rn = 1),
             |probes AS (
             |  SELECT vec_id AS query_id, cell_id FROM (
             |    SELECT v2.vec_id, c.cell_id, row_number() OVER (PARTITION BY v2.vec_id ORDER BY
             |      list_reduce(list_transform(range(1, len(v2.q)+1), i -> v2.q[i]*c.cq[i]), (x,y) -> x+y)
             |        / (v2.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
             |    FROM n v2, c WHERE v2.vec_id >= 8 AND v2.vec_id < 18) WHERE rn <= 2),
             |lut AS (
             |  SELECT qq.vec_id AS query_id, b.sub, b.code,
             |    list_reduce(list_transform(range(1, 17),
             |      i -> list_slice(qq.q, b.sub*16+1, b.sub*16+16)[i] * b.cv[i]),
             |      (a, b2) -> a + b2) AS part
             |  FROM qz qq JOIN books b ON true
             |  WHERE qq.vec_id >= 8 AND qq.vec_id < 18),
             |qc AS (
             |  SELECT p.query_id, p.cell_id,
             |    list_reduce(list_transform(range(1, len(z.q)+1), i -> z.q[i]*c.cq[i]), (x,y) -> x+y) AS qcdot
             |  FROM probes p JOIN qz z ON z.vec_id = p.query_id
             |  JOIN c ON c.cell_id = p.cell_id),
             |scored AS (
             |  SELECT p.query_id, e2.cell_id, e2.cand_id,
             |    ANY_VALUE(g.qcdot) + SUM(l.part) AS score
             |  FROM probes p
             |  JOIN enc e2 ON e2.cell_id = p.cell_id AND e2.cand_id <> p.query_id
             |  JOIN lut l ON l.query_id = p.query_id AND l.sub = e2.sub AND l.code = e2.code
             |  JOIN qc g ON g.query_id = p.query_id AND g.cell_id = p.cell_id
             |  GROUP BY p.query_id, e2.cell_id, e2.cand_id),
             |ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY score DESC, cand_id ASC) AS rank FROM scored)
             |SELECT query_id, cell_id, cand_id, score, CAST(rank AS INT) AS rank
             |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // IVF approximate nearest-neighbor: coarse-quantize candidates to
    // max-cosine centroid cells (centroids = vec_id < 8, deterministic),
    // queries probe their top-2 cells, exact search within. The inverted-
    // file scale path: cost ∝ probed share of the corpus.
    ("q_ann_ivf",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
        Similarity.ivfTopK(
            queries = emb.filter(col("vec_id") >= 8 && col("vec_id") < 18),
            candidates = emb.filter(col("vec_id") >= 8),
            centroids = centroids,
            idCol = "vec_id", vecCol = "embedding", k = 3, nProbe = 2, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some(ivfFullRebuildOracleSql)),

    // Incremental IVF vector registry: the corpus (vec_id >= 8) arrives
    // as a base ingest (vec_id % 5 != 0) plus a delta batch, each
    // assigned against the SAME frozen centroids and merged by pure
    // append — per-vector assignments are independent of every other
    // vector, so no ordering constraint is even needed (unlike the BM25
    // and curation registries' monotonic-id contracts). Oracle is
    // q_ann_ivf's full-rebuild SQL verbatim: hash match = delta-merge ≡
    // rebuild for the vector registry.
    ("q_ivf_incremental",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
        val centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
        val corpus = emb.filter(col("vec_id") >= 8)
        val base = Similarity.ivfBuildIndex(
          corpus.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding",
          centroids, dim = 64)
        val delta = Similarity.ivfBuildIndex(
          corpus.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
          centroids, dim = 64)
        Similarity.ivfQueryIndex(Similarity.ivfMergeIndex(base, delta),
            emb.filter(col("vec_id") >= 8 && col("vec_id") < 18),
            "vec_id", "embedding", k = 3, nProbe = 2, dim = 64)
          .orderBy("query_id", "rank")
      },
      Some(ivfFullRebuildOracleSql)),

    // Embedding-cosine near-duplicate dedup: exact all-pairs baseline
    // (bounded to vec_id < 2000 — all-pairs is the deliberately quadratic
    // correctness reference, like q_knn/q_ngram_jaccard) → per-duplicate
    // canonical decision (drop dup_id, keep canonical_id). The LSH-bucketed
    // candidate path (cosineNearDupPairsLsh) is the unbounded 100 TB
    // variant — recall-tested in LlmOpsSpec against this exact output.
    ("q_embedding_neardup",
      (s: SparkSession, d: String) => {
        val pairs = Similarity.cosineNearDupPairs(
          Tables.embeddings(s, d).filter(col("vec_id") < 2000),
          "vec_id", "embedding", threshold = 0.4, dim = 64)
        Similarity.cosineDedupDecision(pairs).orderBy("dup_id")
      },
      Some("""WITH n AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             |    sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM embeddings WHERE vec_id < 2000),
             |pairs AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |    list_reduce(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i]), (x,y) -> x+y)
             |      / (a.nrm * b.nrm) AS cosine
             |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
             |SELECT id_b AS dup_id, min(id_a) AS canonical_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_matches, max(cosine) AS max_cosine
             |FROM pairs WHERE cosine >= 0.4
             |GROUP BY id_b ORDER BY dup_id""".stripMargin)),

    // SemDeDup-style semantic dedup: embedding-cosine near-dup pairs
    // (exact, bounded subset — the LSH variant is the unverifiable scale
    // path) become edges, dedupClusters canonicalizes transitively-linked
    // vectors, min vec_id kept per semantic cluster.
    ("q_semantic_dedup",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d).filter(col("vec_id") < 2000)
        val pairs = Similarity.cosineNearDupPairs(
            emb, "vec_id", "embedding", threshold = 0.4, dim = 64)
          .select(col("id_a"), col("id_b"))
        Dedup.dedupClusters(emb.select("vec_id"), "vec_id", pairs)
          .orderBy("vec_id")
      },
      Some("""WITH RECURSIVE n AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             |    sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM embeddings WHERE vec_id < 2000),
             |pairs AS (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |  FROM n a JOIN n b ON a.vec_id < b.vec_id
             |  WHERE list_reduce(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i]), (x,y) -> x+y)
             |      / (a.nrm * b.nrm) >= 0.4),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |cc(node, label) AS (
             |  SELECT DISTINCT src, src FROM edges
             |  UNION
             |  SELECT e.dst, cc.label FROM cc JOIN edges e ON e.src = cc.node),
             |comp AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node)
             |SELECT u.vec_id,
             |  coalesce(c.cluster_id, u.vec_id) AS cluster_id,
             |  CAST(count(*) OVER (PARTITION BY coalesce(c.cluster_id, u.vec_id)) AS BIGINT) AS cluster_size,
             |  u.vec_id = coalesce(c.cluster_id, u.vec_id) AS is_kept
             |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 2000) u
             |LEFT JOIN comp c ON c.node = u.vec_id
             |ORDER BY u.vec_id""".stripMargin)),

    // Per-label embedding statistics (IVF partition stats): exact-fold
    // norms, min/max only (float-sum means are engine-order-dependent).
    ("q_embedding_label_stats",
      (s: SparkSession, d: String) => {
        Similarity.labelStats(Tables.embeddings(s, d), "label", "embedding", dim = 64)
          .orderBy("label")
      },
      Some("""WITH n AS (
             |  SELECT label,
             |    sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM embeddings)
             |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
             |  min(nrm) AS min_norm, max(nrm) AS max_norm
             |FROM n GROUP BY label ORDER BY label""".stripMargin)),

    // SimHash near-dup pairs. The oracle mirrors the construction without
    // 64-bit shifts: each signature bit is the sign of the per-bit vote
    // sum, so hamming(a,b) = count of bits whose vote signs differ —
    // computed relationally over (doc, bit) vote rows.
    ("q_simhash_neardup",
      (s: SparkSession, d: String) => {
        val docs = Dedup.simhashSignatures(
          Tables.documents(s, d).filter(col("doc_id") < 200), "doc_id", "text")
        val a = docs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
        val b = docs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
          .withColumn("hamming", Dedup.hammingDistance64(col("sig_a"), col("sig_b")))
          .filter(col("hamming") <= 6)
          .select("id_a", "id_b", "hamming")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
             |  FROM documents WHERE doc_id < 200),
             |th AS (
             |  SELECT doc_id,
             |    CAST(concat('0x', substring(md5(t), 1, 8)) AS BIGINT) AS lo,
             |    CAST(concat('0x', substring(md5(t), 9, 8)) AS BIGINT) AS hi
             |  FROM toks),
             |bits AS (
             |  SELECT doc_id, r.b,
             |    sum(CASE WHEN ((CASE WHEN r.b < 32 THEN lo >> r.b
             |                         ELSE hi >> (r.b - 32) END) & 1) = 1
             |             THEN 1 ELSE -1 END) > 0 AS bit_set
             |  FROM th, range(0, 64) r(b) GROUP BY doc_id, r.b),
             |ham AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(sum(CASE WHEN a.bit_set <> b.bit_set THEN 1 ELSE 0 END) AS INT) AS hamming
             |  FROM bits a JOIN bits b ON a.b = b.b AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id)
             |SELECT id_a, id_b, hamming FROM ham
             |WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin)),

    // SimHash pair search, CORPUS-SCALE form: pigeonhole banding over the
    // full documents table (no id bound — the banded equi-join replaces
    // the theta join). 7 chunks > maxHamming 6 ⇒ zero false negatives, so
    // the output is IDENTICAL to the exact all-pairs search, which is what
    // the oracle computes (DuckDB is fine with all-pairs at sf0.01).
    ("q_simhash_banded",
      (s: SparkSession, d: String) => {
        val sigs = Dedup.simhashSignatures(Tables.documents(s, d), "doc_id", "text")
        Dedup.simhashBandedPairs(sigs, "doc_id", maxHamming = 6, numChunks = 7)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
             |  FROM documents),
             |th AS (
             |  SELECT doc_id,
             |    CAST(concat('0x', substring(md5(t), 1, 8)) AS BIGINT) AS lo,
             |    CAST(concat('0x', substring(md5(t), 9, 8)) AS BIGINT) AS hi
             |  FROM toks),
             |bits AS (
             |  SELECT doc_id, r.b,
             |    sum(CASE WHEN ((CASE WHEN r.b < 32 THEN lo >> r.b
             |                         ELSE hi >> (r.b - 32) END) & 1) = 1
             |             THEN 1 ELSE -1 END) > 0 AS bit_set
             |  FROM th, range(0, 64) r(b) GROUP BY doc_id, r.b),
             |ham AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(sum(CASE WHEN a.bit_set <> b.bit_set THEN 1 ELSE 0 END) AS INT) AS hamming
             |  FROM bits a JOIN bits b ON a.b = b.b AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id)
             |SELECT id_a, id_b, hamming FROM ham
             |WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin)),

    // LSH-bucketed cosine top-k (the approximate scale path). The random
    // hyperplanes are md5-derived plan-time CONSTANTS, so the oracle
    // inlines the identical ±1 plane literals and reproduces the bucket
    // assignment — the whole approximate path is hash-verified, not just
    // recall-tested.
    ("q_lsh_cosine_topk",
      (s: SparkSession, d: String) => {
        Similarity.lshTopK(Tables.embeddings(s, d),
            idCol = "vec_id", vecCol = "embedding", nPlanes = 8, dim = 64, k = 5)
          .orderBy("query_id", "rank")
      },
      Some {
        val bucketSql = (0 until 8).map { j =>
          val dot = s"list_reduce(list_transform(range(1, len(e)+1), " +
            s"i -> e[i] * (${Similarity.planeSqlLiteral(j, 64)})[i]), (a,b) -> a+b)"
          s"(CASE WHEN $dot >= 0 THEN ${1L << j} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH n AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
           |    sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b)) AS nrm
           |  FROM embeddings),
           |b AS (
           |  SELECT vec_id, e, nrm, CAST($bucketSql AS BIGINT) AS bucket FROM n),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS cand_id,
           |    list_reduce(list_transform(range(1, len(q.e)+1), i -> q.e[i]*c.e[i]), (x,y) -> x+y)
           |      / (q.nrm * c.nrm) AS cosine
           |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cosine DESC, cand_id ASC) AS rank FROM pairs)
           |SELECT query_id, bucket, cand_id, cosine, CAST(rank AS INT) AS rank
           |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      }),

    // Multi-probe LSH top-k: queries additionally probe the nProbe buckets
    // reached by flipping their lowest-|margin| signature bits. The planes
    // are the same md5-derived constants, and the probe selection (|dot|
    // asc, plane asc) is integer/float-deterministic — so the whole
    // multi-probe path hash-verifies against DuckDB, including WHICH
    // buckets each query probes, not just the final neighbor set.
    ("q_lsh_multiprobe",
      (s: SparkSession, d: String) => {
        Similarity.multiProbeTopK(Tables.embeddings(s, d),
            idCol = "vec_id", vecCol = "embedding",
            nPlanes = 8, dim = 64, k = 5, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some {
        def dotSql(j: Int) = s"list_reduce(list_transform(range(1, len(e)+1), " +
          s"i -> e[i] * (${Similarity.planeSqlLiteral(j, 64)})[i]), (a,b) -> a+b)"
        val dotsArr = (0 until 8).map(dotSql).mkString("[", ", ", "]")
        val bucketSql = (0 until 8)
          .map(j => s"(CASE WHEN dots[${j + 1}] >= 0 THEN ${1L << j} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH n AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
           |    sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b)) AS nrm
           |  FROM embeddings),
           |d AS (
           |  SELECT vec_id, e, nrm, $dotsArr AS dots FROM n),
           |b AS (
           |  SELECT vec_id, e, nrm, dots, CAST($bucketSql AS BIGINT) AS bucket FROM d),
           |f AS (
           |  SELECT vec_id, bucket, CAST(1 << r.j AS BIGINT) AS mask,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY abs(dots[r.j + 1]) ASC, r.j ASC) AS rk
           |  FROM b, range(0, 8) r(j)),
           |probes AS (
           |  SELECT vec_id AS query_id, bucket FROM b
           |  UNION ALL
           |  SELECT vec_id AS query_id, xor(bucket, mask) AS bucket FROM f WHERE rk <= 2),
           |pairs AS (
           |  SELECT p.query_id, c.vec_id AS cand_id,
           |    list_reduce(list_transform(range(1, len(q.e)+1), i -> q.e[i]*c.e[i]), (x,y) -> x+y)
           |      / (q.nrm * c.nrm) AS cosine
           |  FROM probes p
           |  JOIN b q ON p.query_id = q.vec_id
           |  JOIN b c ON c.bucket = p.bucket AND c.vec_id <> p.query_id),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cosine DESC, cand_id ASC) AS rank FROM pairs)
           |SELECT query_id, cand_id, cosine, CAST(rank AS INT) AS rank
           |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      }),

    // PII redaction: email/phone/IPv4 scrub. The corpus text is synthetic
    // word soup with no PII, so contact strings are planted
    // deterministically from doc_id in BOTH engines, then redacted — the
    // compare proves the patterns match real content, not just pass
    // through. Map-side regexp chain; no shuffle.
    ("q_pii_redact",
      (s: SparkSession, d: String) => {
        val planted = Tables.documents(s, d).select(col("doc_id"),
          concat(substring(col("text"), 1, 40),
            lit(" contact u"), col("doc_id"), lit("@example.com tel 555-867-5309 at 10.0."),
            pmod(col("doc_id"), lit(256)), lit(".7 end")).as("text"))
        planted
          .select(col("doc_id"), TextStats.redactPii(col("text")).as("redacted"))
          .orderBy("doc_id")
      },
      Some(s"""WITH planted AS (
             |  SELECT doc_id,
             |    substring(text, 1, 40) || ' contact u' || doc_id ||
             |    '@example.com tel 555-867-5309 at 10.0.' || (doc_id % 256) || '.7 end' AS text
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(text,
             |    '${TextStats.EmailPattern}', '<EMAIL>', 'g'),
             |    '${TextStats.Ipv4Pattern}', '<IP>', 'g'),
             |    '${TextStats.PhonePattern}', '<PHONE>', 'g') AS redacted
             |FROM planted ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition metrics: duplicate-token fraction and the
    // top-2-gram fraction, both computed map-side per document (sorted
    // bigram array + longest-run fold — no explode/shuffle). The oracle
    // computes the same numbers relationally (unnest + group-by), proving
    // the fold against an independent formulation.
    ("q_repetition_stats",
      (s: SparkSession, d: String) => {
        // native one-pass kernel (graft_repetition_stats): bit-identical
        // to the HOF formulation (LlmOpsSpec asserts it) but O(n) compiled
        // JVM instead of interpreted per-element lambdas — STRESS.md
        // measured the HOF form as the dominant corpus-scan CPU at 64×.
        // Both output columns come from ONE struct column so the kernel
        // runs once per row (GetStructField is CSE'd under codegen).
        Tables.documents(s, d)
          .withColumn("_r",
            graft.functions.TextExpressions.repetitionStats(col("text")))
          .select(col("doc_id"),
            col("_r").getField("dup_token_frac").as("dup_token_frac"),
            col("_r").getField("top_bigram_frac").as("top_bigram_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |dup AS (
             |  SELECT doc_id,
             |    CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_token_frac
             |  FROM toks),
             |grams AS (
             |  SELECT doc_id, unnest(list_transform(
             |    range(1, greatest(len(t), 1)),
             |    i -> t[i] || ' ' || t[i+1])) AS g
             |  FROM toks),
             |counts AS (
             |  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
             |top AS (
             |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
             |  FROM counts GROUP BY doc_id)
             |SELECT d.doc_id, d.dup_token_frac,
             |  coalesce(t.top_bigram_frac, 0.0) AS top_bigram_frac
             |FROM dup d LEFT JOIN top t USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // Lexical diversity per document: type-token ratio + Gini–Simpson
    // index (1 − Σc(c−1)/(n(n−1))) — the integer-exact diversity signal
    // (Shannon entropy needs log(), which does not hash-verify across
    // engines; Simpson is rational in the counts, one division). Spark
    // computes all three counts with ONE native hash-counting pass per
    // row (graft_token_diversity — the sorted-fold HOF form it replaces
    // measured 56 s of CodegenFallback dispatch at the 64× corpus, see
    // STRESS.md; LlmOpsSpec pins kernel ≡ fold ≡ explode) — no explode,
    // no shuffle, per-row cost at any corpus size — while the oracle
    // takes the explode+groupBy route to the same exact integers.
    ("q_token_diversity",
      (s: SparkSession, d: String) => {
        // NULL text dropped to match the oracle's unnest (which emits no
        // rows for a NULL), not surfaced as a NULL-stats row
        Tables.documents(s, d)
          .filter(col("text").isNotNull)
          .withColumn("_d", graft.functions.TextExpressions
            .tokenDiversity(col("text")))
          .select(col("doc_id"),
            col("_d").getField("n_tokens").as("n_tokens"),
            col("_d").getField("n_types").as("n_types"),
            col("_d").getField("pairs").as("_pairs"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"),
            (col("n_types").cast("double") / col("n_tokens").cast("double")).as("ttr"),
            when(col("n_tokens") >= 2L,
                lit(1.0) - col("_pairs").cast("double")
                  / (col("n_tokens").cast("double") * (col("n_tokens") - 1L).cast("double")))
              .otherwise(lit(null).cast("double")).as("gini_simpson"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |c AS (
             |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
             |  FROM t GROUP BY doc_id, tok),
             |a AS (
             |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |    CAST(COUNT(*) AS BIGINT) AS n_types,
             |    CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs
             |  FROM c GROUP BY doc_id)
             |SELECT doc_id, n_tokens, n_types,
             |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
             |  CASE WHEN n_tokens >= 2
             |       THEN 1.0 - CAST(pairs AS DOUBLE)
             |            / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE))
             |       ELSE NULL END AS gini_simpson
             |FROM a ORDER BY doc_id""".stripMargin)),

    // Deterministic train/val/test split: md5-bucket assignment that is
    // stable across runs, engines, partitionings, and reprocessing —
    // never sample(). 80/10/10.
    // Sliding-window token chunking: long docs become fixed-context
    // training rows (64-token windows every 48 tokens, 16 overlap);
    // map-side explode, chunk grid is pure arithmetic.
    ("q_chunk_windows",
      (s: SparkSession, d: String) => {
        TextStats.chunkWindows(Tables.documents(s, d), idCol = "doc_id",
            textCol = "text", window = 64, stride = 48)
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (
             |  SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 48)) AS st
             |  FROM t)
             |SELECT doc_id,
             |  CAST((st // 48) AS INT) AS chunk_idx,
             |  CAST(len(list_slice(w, CAST(st + 1 AS BIGINT), CAST(st + 64 AS BIGINT))) AS INT) AS n_toks,
             |  array_to_string(list_slice(w, CAST(st + 1 AS BIGINT), CAST(st + 64 AS BIGINT)), ' ') AS chunk_text
             |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Balanced domain-mixture downsampling: over-represented languages
    // deterministically downsampled to an equal per-domain share via the
    // md5-bucket device (content-keyed, reproducible — never sample()).
    ("q_mixture_sample",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val kept = TextStats.balancedSample(docs, domainCol = "lang", idCol = "doc_id")
        docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
          .join(kept.groupBy("lang").agg(count(lit(1)).as("n_kept")), Seq("lang"), "left")
          .select(col("lang"), col("n_before"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
          .orderBy("lang")
      },
      Some("""WITH c AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
             |s AS (SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS d FROM c),
             |r AS (
             |  SELECT lang, n,
             |    least(1.0, ceil(CAST(total AS DOUBLE) / d) / n) AS rate
             |  FROM c CROSS JOIN s),
             |k AS (
             |  SELECT dd.lang FROM documents dd JOIN r USING (lang)
             |  WHERE CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 10000 AS DOUBLE) < rate * 10000),
             |ka AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept FROM k GROUP BY lang)
             |SELECT r.lang, r.n AS n_before, coalesce(ka.n_kept, 0) AS n_kept
             |FROM r LEFT JOIN ka USING (lang) ORDER BY lang""".stripMargin)),

    // Temperature (α=0.5) mixture up-sampling: low-resource languages
    // replicated toward the largest by √deficit; full replicated table
    // (doc, copy index) hash-verified — the whole replication plan is
    // deterministic from integer counts + sqrt + the md5 bucket device.
    ("q_temperature_mixture",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d).select("doc_id", "lang")
        TextStats.temperatureUpsample(docs, domainCol = "lang", idCol = "doc_id")
          .select("doc_id", "lang", "copy")
          .orderBy("doc_id", "copy")
      },
      Some("""WITH c AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
             |m AS (SELECT max(n) AS mx FROM c),
             |r AS (SELECT lang, sqrt(CAST(mx AS DOUBLE) / n) AS rr FROM c CROSS JOIN m),
             |dd AS (
             |  SELECT doc_id, d0.lang, rr,
             |    CAST(floor(rr) AS BIGINT) +
             |    CASE WHEN CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 10000 AS DOUBLE)
             |         < (rr - floor(rr)) * 10000 THEN 1 ELSE 0 END AS copies
             |  FROM documents d0 JOIN r USING (lang))
             |SELECT doc_id, lang, CAST(i AS BIGINT) AS copy
             |FROM dd, unnest(range(copies)) t(i)
             |ORDER BY doc_id, copy""".stripMargin)),

    ("q_dataset_split",
      (s: SparkSession, d: String) => {
        Tables.documents(s, d).select(col("doc_id"),
            TextStats.splitBucket(col("doc_id")).as("bucket"),
            TextStats.datasetSplit(col("doc_id"), 80, 10).as("split"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS bucket,
             |  CASE WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 80 THEN 'train'
             |       WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 < 90 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Deterministic training-shard layout: shard = md5(seed‖id) mod 8,
    // pos = rank within the shard by the same key — the shuffled-shard
    // write order, reproducible across engines (never rand()). One
    // hash-partitioned shuffle + per-shard sort, no global total order.
    ("q_training_shards",
      (s: SparkSession, d: String) => {
        TextStats.trainingShards(Tables.documents(s, d), "doc_id",
            numShards = 8, seed = "ep0")
          .select("doc_id", "shard", "pos")
          .orderBy("shard", "pos")
      },
      Some("""WITH k AS (
             |  SELECT doc_id, md5(concat('ep0-', CAST(doc_id AS VARCHAR))) AS key
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, key,
             |    CAST(concat('0x', substring(key, 1, 15)) AS BIGINT) % 8 AS shard
             |  FROM k)
             |SELECT doc_id, shard,
             |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1 AS INT) AS pos
             |FROM s ORDER BY shard, pos""".stripMargin)),

    // Per-shard integrity manifest: doc count, token total, and a
    // position-ordered content md5 per shard — what a data loader
    // verifies before an epoch. Any missing/reordered/edited doc flips
    // the shard hash, and the hash replays cross-engine.
    ("q_shard_manifest",
      (s: SparkSession, d: String) => {
        val sharded = TextStats.trainingShards(
          Tables.documents(s, d).withColumn("n_tokens",
            TextStats.tokenCount(col("text")).cast("long")),
          "doc_id", numShards = 8, seed = "ep0")
        TextStats.shardManifest(sharded, "text", "n_tokens")
          .orderBy("shard")
      },
      Some("""WITH k AS (
             |  SELECT doc_id, text,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    md5(concat('ep0-', CAST(doc_id AS VARCHAR))) AS key
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, text, n_tokens, key,
             |    CAST(concat('0x', substring(key, 1, 15)) AS BIGINT) % 8 AS shard
             |  FROM k),
             |p AS (
             |  SELECT shard, text, n_tokens,
             |    row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1 AS pos
             |  FROM s)
             |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |  md5(string_agg(md5(text), '' ORDER BY pos)) AS content_md5
             |FROM p GROUP BY shard ORDER BY shard""".stripMargin)),

    // Deterministic stratified sample: k docs per language, selected by
    // md5(doc_id) order — a reproducible per-stratum sample (same rows on
    // every run/engine/layout), unlike sample()/TABLESAMPLE. One shuffle
    // on the stratum key; k is a windowed top-k.
    ("q_stratified_sample",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select(col("lang"), col("doc_id"), col("rn"))
          .orderBy("lang", "rn")
      },
      Some("""SELECT lang, doc_id, CAST(rn AS INT) AS rn FROM (
             |  SELECT lang, doc_id, row_number() OVER (
             |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin)),

    // Weighted πps sample (sequential Poisson): 15 docs per language with
    // inclusion probability ∝ n_chars — priority = ⌊md5-uniform / weight⌋,
    // all-integer and content-keyed, so the draw replays exactly in any
    // engine (never sample()). The q_stratified_sample of the
    // quality-weighted world.
    ("q_weighted_sample",
      (s: SparkSession, d: String) => {
        TextStats.weightedSample(
            Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
            "doc_id", "n_chars", "lang", k = 15)
          .select("lang", "doc_id", "n_chars", "priority", "rn")
          .orderBy("lang", "rn")
      },
      Some("""WITH p AS (
             |  SELECT lang, doc_id, n_chars,
             |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
             |      // CAST(n_chars AS BIGINT) AS priority
             |  FROM documents WHERE CAST(n_chars AS BIGINT) >= 1),
             |r AS (
             |  SELECT lang, doc_id, n_chars, priority,
             |    CAST(row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS INT) AS rn
             |  FROM p)
             |SELECT lang, doc_id, n_chars, priority, rn
             |FROM r WHERE rn <= 15 ORDER BY lang, rn""".stripMargin)),

    // Rendezvous (HRW) sharding with a re-shard movement audit: shard =
    // argmax_s md5(id:s) at S=8 vs S=9. The audit columns ARE the HRW
    // minimal-movement theorem, oracle-checked: n_moved ≈ n/9 per shard
    // and n_moved_elsewhere ≡ 0 (a document re-shards ONLY to the new
    // shard — growing a 100 TB corpus's shard count rewrites one shard's
    // worth of data, where mod-hashing rewrites ~8/9 of everything).
    ("q_rendezvous_shards",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          TextStats.rendezvousShard(col("doc_id"), 8).as("shard8"),
          TextStats.rendezvousShard(col("doc_id"), 9).as("shard9"))
        docs.groupBy("shard8").agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("shard9") =!= col("shard8"), 1L).otherwise(0L))
              .as("n_moved"),
            sum(when(col("shard9") =!= col("shard8") && col("shard9") =!= 8, 1L)
              .otherwise(0L)).as("n_moved_elsewhere"))
          .orderBy("shard8")
      },
      Some("""WITH h AS (
             |  SELECT doc_id, s,
             |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)),1,15)) AS BIGINT) AS hv
             |  FROM documents, range(9) t(s)),
             |a AS (
             |  SELECT doc_id,
             |    arg_max(s, hv) FILTER (s < 8) AS shard8,
             |    arg_max(s, hv) AS shard9
             |  FROM h GROUP BY doc_id)
             |SELECT shard8, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
             |  CAST(sum(CASE WHEN shard9 <> shard8 AND shard9 <> 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_elsewhere
             |FROM a GROUP BY shard8 ORDER BY shard8""".stripMargin)),

    // Two-level rendezvous (the O(√S) HRW hierarchy): S=64 as 8 groups ×
    // 8 members vs S=72 as 9×8 — growth by ONE WHOLE GROUP with member
    // count fixed, the movement-preserving direction. The audit columns
    // replay the per-level theorem: n_moved ≈ n/9 per shard and
    // n_moved_elsewhere ≡ 0 (every mover lands in the NEW group, shards
    // 64–71, because old groups' hashes and their members' global shard
    // numbers are both unchanged). Cost per row is 8+8 hashes instead of
    // the flat form's 64 — the large-S fix for q_rendezvous_shards' O(S).
    ("q_rendezvous_hier",
      (s: SparkSession, d: String) => {
        val base = Tables.documents(s, d).select("doc_id")
        val docs = TextStats.hierarchicalShards(
          TextStats.hierarchicalShards(base, "doc_id", 64, "shard64"),
          "doc_id", 72, "shard72")
        docs.groupBy("shard64").agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("shard72") =!= col("shard64"), 1L).otherwise(0L))
              .as("n_moved"),
            sum(when(col("shard72") =!= col("shard64") && col("shard72") < 64, 1L)
              .otherwise(0L)).as("n_moved_elsewhere"))
          .orderBy("shard64")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, g,
             |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':g:' || CAST(g AS VARCHAR)),1,15)) AS BIGINT) AS hg
             |  FROM documents, range(9) t(g)),
             |ga AS (
             |  SELECT doc_id,
             |    arg_max(g, hg) FILTER (g < 8) AS grp64,
             |    arg_max(g, hg) AS grp72
             |  FROM g GROUP BY doc_id),
             |m AS (
             |  SELECT doc_id, j,
             |    grp64 * 8 + j AS cand64, grp72 * 8 + j AS cand72,
             |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':s:' || CAST(grp64 * 8 + j AS VARCHAR)),1,15)) AS BIGINT) AS h64,
             |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':s:' || CAST(grp72 * 8 + j AS VARCHAR)),1,15)) AS BIGINT) AS h72
             |  FROM ga, range(8) t(j)),
             |sa AS (
             |  SELECT doc_id,
             |    arg_max(cand64, h64) AS shard64,
             |    arg_max(cand72, h72) AS shard72
             |  FROM m GROUP BY doc_id)
             |SELECT shard64, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN shard72 <> shard64 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
             |  CAST(sum(CASE WHEN shard72 <> shard64 AND shard72 < 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_elsewhere
             |FROM sa GROUP BY shard64 ORDER BY shard64""".stripMargin)),

    // Exact interpolated length quantiles per language (corpus report).
    // Spark `percentile` and DuckDB `quantile_cont` both compute the
    // R-7 linear-interpolated quantile exactly, so the numbers hash-match.
    ("q_length_quantiles",
      (s: SparkSession, d: String) => {
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))").as("qs"))
          .select(col("lang"), col("n_docs"),
            col("qs")(0).as("p50"), col("qs")(1).as("p90"), col("qs")(2).as("p99"))
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  quantile_cont(n_chars, 0.5) AS p50,
             |  quantile_cont(n_chars, 0.9) AS p90,
             |  quantile_cont(n_chars, 0.99) AS p99
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Robust per-language length outliers: |len − median| > 3·1.4826·MAD.
    // The heavy-tail-safe gate beside q_zscore_outliers — a handful of
    // megadocs inflate mean AND σ (masking themselves), while median and
    // MAD both have 50% breakdown. Medians are the exact interpolated
    // percentiles of the q_length_quantiles contract, so every flag
    // hash-replays.
    ("q_mad_outliers",
      (s: SparkSession, d: String) => {
        graft.operators.Anomaly.madOutliers(
            Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
            keyCol = "lang", valueCol = "n_chars", threshold = 3.0)
          .select("lang", "doc_id", "n_chars", "med", "mad", "abs_dev", "is_outlier")
          .orderBy("doc_id")
      },
      Some("""WITH m AS (
             |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
             |  FROM documents GROUP BY lang),
             |d AS (
             |  SELECT doc_id, d0.lang, n_chars, med,
             |    abs(CAST(n_chars AS DOUBLE) - med) AS abs_dev
             |  FROM documents d0 JOIN m USING (lang)),
             |a AS (SELECT lang, quantile_cont(abs_dev, 0.5) AS mad FROM d GROUP BY lang)
             |SELECT d.lang, doc_id, n_chars, med, a.mad, abs_dev,
             |  (abs_dev > 3.0 * 1.4826 * a.mad) AS is_outlier
             |FROM d JOIN a USING (lang) ORDER BY doc_id""".stripMargin)),

    // Per-language winsorization: doc lengths clamped to the language's
    // exact [p05, p95] — the tail-taming transform before any mean/σ
    // stage. Every output is an input value or a percentile bound
    // (least/greatest selection), so the clamp hash-replays.
    ("q_winsorize",
      (s: SparkSession, d: String) => {
        graft.operators.Anomaly.winsorize(
            Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
            keyCol = "lang", valueCol = "n_chars", pLo = 0.05, pHi = 0.95)
          .select("lang", "doc_id", "n_chars", "lo", "hi", "clamped")
          .orderBy("doc_id")
      },
      Some("""WITH b AS (
             |  SELECT lang, quantile_cont(n_chars, 0.05) AS lo,
             |    quantile_cont(n_chars, 0.95) AS hi
             |  FROM documents GROUP BY lang)
             |SELECT d.lang, doc_id, n_chars, lo, hi,
             |  least(greatest(CAST(n_chars AS DOUBLE), lo), hi) AS clamped
             |FROM documents d JOIN b USING (lang) ORDER BY doc_id""".stripMargin)),

    // Binned-CDF quantiles — the scale path beside q_length_quantiles'
    // exact percentile (which buffers + sorts every group): one map-side
    // binning pass, a (groups·bins)-sized aggregate, interpolation
    // within the hit bin. Integer counts + exact double interpolation,
    // so the estimates hash-replay (t-digest/GK can't).
    ("q_binned_quantiles",
      (s: SparkSession, d: String) => {
        TextStats.binnedQuantiles(Tables.documents(s, d), "lang", "n_chars",
            lo = 0.0, hi = 4096.0, nBins = 64, qs = Seq(0.5, 0.9, 0.99))
          .orderBy("lang", "q")
      },
      Some("""WITH b AS (
             |  SELECT lang,
             |    least(greatest(CAST(floor((n_chars - 0.0) / 64.0) AS INT), 0), 63) AS bin
             |  FROM documents WHERE n_chars IS NOT NULL),
             |c AS (SELECT lang, bin, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
             |cc AS (SELECT lang, bin, cnt,
             |  SUM(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
             |  SUM(cnt) OVER (PARTITION BY lang) AS n FROM c),
             |t AS (SELECT DISTINCT lang, n FROM cc),
             |tq AS (SELECT lang, n, CAST(q AS DOUBLE) AS q,
             |    CAST(q AS DOUBLE) * n AS target
             |  FROM t, (VALUES (0.5), (0.9), (0.99)) AS v(q))
             |SELECT cc.lang, tq.q, CAST(tq.n AS BIGINT) AS n,
             |  0.0 + 64.0 * (cc.bin + (tq.target - (cc.cum - cc.cnt)) / cc.cnt) AS estimate
             |FROM cc JOIN tq USING (lang)
             |WHERE cc.cum >= tq.target AND (cc.cum - cc.cnt) < tq.target
             |ORDER BY lang, q""".stripMargin)),

    // TF-IDF-style salient terms: per-document term frequency weighted by
    // inverse document frequency, top-5 per doc. The score is the raw
    // ratio tf/df (df as a fraction of N) rather than the log form —
    // log() is a libm call whose last-ulp rounding differs across
    // engines, while add/div are IEEE-exact, keeping the oracle
    // hash-comparable. Two aggregations: per-(doc,term) counts (one
    // shuffle), then document frequencies (an agg over terms, broadcast
    // back — vocabulary-sized, not corpus-sized).
    ("q_tfidf_topk",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
        val terms = docs
          .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .withColumn("n_tokens", sum("tf").over(Window.partitionBy("doc_id")))
        val df = terms.select("doc_id", "term").distinct()
          .groupBy("term").agg(count(lit(1)).as("df"))
        // N as a broadcast 1-row aggregate, not an eager count() — the
        // whole query stays one Spark job
        val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term").asc)
        tf.join(broadcast(df), Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("score",
            (col("tf").cast("double") / col("n_tokens")) /
              (col("df").cast("double") / col("n_docs")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            col("score"), col("rank"))
          .orderBy("doc_id", "rank")
      },
      Some("""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
             |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM docs),
             |terms AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs),
             |tf AS (
             |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
             |    CAST(sum(count(*)) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tokens
             |  FROM terms GROUP BY doc_id, term),
             |df AS (
             |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM terms GROUP BY term),
             |scored AS (
             |  SELECT t.doc_id, t.term, t.tf, d.df,
             |    (CAST(t.tf AS DOUBLE) / t.n_tokens) / (CAST(d.df AS DOUBLE) / (SELECT n_docs FROM n)) AS score
             |  FROM tf t JOIN df d USING (term)),
             |ranked AS (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             |    ORDER BY score DESC, term ASC) AS INT) AS rank FROM scored)
             |SELECT doc_id, term, tf, df, score, rank
             |FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin)),

    // Sparse lexical similarity search: IDF-weighted cosine top-3 via an
    // inverted index with df-window pruning, over word BIGRAMS — on this
    // fixture's 31-word vocabulary every unigram is a stopword (df 24..393
    // of 500 docs) and the df window would rightly prune them all; bigrams
    // restore the long-tailed profile lexical search needs (915 terms,
    // df ≤ 45). Integer numerator, one float division + sqrt at the end
    // (identical operation tree in the oracle).
    ("q_sparse_topk",
      (s: SparkSession, d: String) => {
        SparseSim.cosineTopK(Tables.documents(s, d), "doc_id", "text",
            k = 3, maxDf = 50L, ngram = 2)
          .orderBy("id", "rank")
      },
      Some(sparseTopkFullRebuildOracleSql)),

    // All-pairs lexical similarity OFF THE STORED REGISTRY: the same
    // Bm25Index that serves q_bm25_incremental serves cosineTopK — its
    // postings/df tables ARE this operator's inputs, so one registry
    // amortizes both members of the index-build cost class. Base
    // (doc_id % 7 != 0) + delta segments merged, df window applied to
    // the MERGED df at query time; oracle is q_sparse_topk's
    // full-rebuild SQL verbatim, so the hash match proves the stored
    // form is indistinguishable from rebuild.
    ("q_sparse_topk_incremental",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val base = SparseSim.buildIndex(
          docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text", ngram = 2)
        val delta = SparseSim.buildIndex(
          docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", ngram = 2)
        SparseSim.cosineTopKIndex(SparseSim.mergeIndex(base, delta),
            k = 3, maxDf = 50L)
          .orderBy("id", "rank")
      },
      Some(sparseTopkFullRebuildOracleSql)),

    // BM25-style retrieval (rational IDF, exact integer sums): the first
    // 10 documents as queries against the rest of the corpus — the
    // decontamination / retrieval scorer with tf saturation + length
    // normalization. Per-term scores micro-quantize to longs, so the
    // per-doc sum is order-free.
    ("q_bm25",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        SparseSim.bm25Retrieve(
            docs.filter(col("doc_id") < 10), "doc_id", "text",
            docs.filter(col("doc_id") >= 10), "doc_id", "text",
            k = 5, maxDf = 50L, ngram = 2)
          .orderBy("qid", "rank")
      },
      Some(bm25FullRebuildOracleSql)),

    // Incremental BM25: the corpus (doc_id >= 10) arrives as a BASE
    // registry (6/7 of the docs) plus a DELTA batch (doc_id % 7 == 0) —
    // the daily-crawl shape. The delta is indexed ALONE and merged into
    // the stored registry (per-doc rows append, per-term df and corpus
    // stats sum — integer composition, the q_kmv_union playbook), and
    // retrieval runs off the merged index. The oracle is the FULL
    // REBUILD on the unioned corpus — q_bm25's own SQL verbatim — so a
    // hash match IS the proof that delta-merge ≡ rebuild: same top-5,
    // same exact integer scores, down to the window tie-breaks.
    ("q_bm25_incremental",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val corpus = docs.filter(col("doc_id") >= 10)
        val base = SparseSim.buildIndex(
          corpus.filter(col("doc_id") % 7 =!= 0), "doc_id", "text", ngram = 2)
        val delta = SparseSim.buildIndex(
          corpus.filter(col("doc_id") % 7 === 0), "doc_id", "text", ngram = 2)
        SparseSim.queryIndex(SparseSim.mergeIndex(base, delta),
            docs.filter(col("doc_id") < 10), "doc_id", "text",
            k = 5, maxDf = 50L)
          .orderBy("qid", "rank")
      },
      Some(bm25FullRebuildOracleSql)),

    // Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical arm
    // and the dense-cosine arm (each already bounded to its own top-20
    // per query) fused on RANK alone — the standard hybrid-search
    // combiner for incomparable score scales. Contributions are
    // micro-quantized to longs (⌊10^12/(60+rank)⌋) so the fused score is
    // an order-free integer sum that replays exactly; fusion input is
    // arm-bounded, so the per-query window never sees a corpus-sized
    // relation. doc_id and vec_id share the entity id space in this
    // fixture (every document has an embedding — the real hybrid-index
    // shape).
    ("q_hybrid_rrf",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val lex = SparseSim.bm25Retrieve(
            docs.filter(col("doc_id") < 10), "doc_id", "text",
            docs.filter(col("doc_id") >= 10), "doc_id", "text",
            k = 20, maxDf = 50L, ngram = 2)
          .select(col("qid"), col("id"), col("rank"))
        val emb = Tables.embeddings(s, d)
        val dense = Similarity.bruteForceTopK(
            emb.filter(col("vec_id") < 10), emb.filter(col("vec_id") >= 10),
            idCol = "vec_id", vecCol = "embedding", k = 20, dim = 64)
          .select(col("query_id").as("qid"), col("cand_id").as("id"), col("rank"))
        Similarity.rrfFuse(Seq("lex" -> lex, "dense" -> dense),
            queryCol = "qid", idCol = "id", rankCol = "rank",
            kRrf = 60, topK = 10)
          .orderBy("qid", "fused_rank")
      },
      Some {
        val (k1, b) = (1.2, 0.75)
        val (k1p1, oneMb) = ((k1 + 1.0).toString, (1.0 - b).toString)
        s"""WITH post AS (
           |  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
           |    SELECT doc_id AS id, unnest(list_transform(
           |      range(1, greatest(len(string_split(text, ' ')), 1)),
           |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS term
           |    FROM documents WHERE doc_id >= 10) t
           |  GROUP BY id, term),
           |lens AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS len FROM post GROUP BY id),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(len) AS BIGINT) AS total_tokens FROM lens),
           |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
           |w AS (SELECT term, CAST(FLOOR(1000000.0 / df) AS BIGINT) AS w
           |  FROM d WHERE df <= 50),
           |q AS (SELECT DISTINCT qid, term FROM (
           |    SELECT doc_id AS qid, unnest(list_transform(
           |      range(1, greatest(len(string_split(text, ' ')), 1)),
           |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS term
           |    FROM documents WHERE doc_id < 10) t),
           |cand AS (
           |  SELECT q.qid, p.id, CAST(round(CAST(w.w AS DOUBLE) *
           |      ((CAST(p.tf AS DOUBLE) * $k1p1) /
           |       (CAST(p.tf AS DOUBLE) + $k1 * ($oneMb + $b *
           |        (CAST(l.len * s.n_docs AS DOUBLE)
           |         / CAST(s.total_tokens AS DOUBLE)))))) AS BIGINT) AS ts
           |  FROM post p JOIN w USING (term) JOIN q USING (term)
           |    JOIN lens l ON p.id = l.id, stats s),
           |bsc AS (SELECT qid, id, CAST(SUM(ts) AS BIGINT) AS bscore FROM cand
           |  GROUP BY qid, id),
           |lr AS (SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid
           |  ORDER BY bscore DESC, id) AS INT) AS rank FROM bsc
           |  QUALIFY rank <= 20),
           |v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
           |n AS (
           |  SELECT vec_id, e,
           |    sqrt(list_reduce(list_transform(e, x -> x*x), (a,b) -> a+b)) AS nrm
           |  FROM v),
           |dpairs AS (
           |  SELECT qv.vec_id AS qid, c.vec_id AS id,
           |    list_reduce(list_transform(range(1, len(qv.e)+1), i -> qv.e[i]*c.e[i]), (x,y) -> x+y)
           |      / (qv.nrm * c.nrm) AS cosine
           |  FROM n qv JOIN n c ON c.vec_id >= 10
           |  WHERE qv.vec_id < 10),
           |dr AS (SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid
           |  ORDER BY cosine DESC, id ASC) AS INT) AS rank FROM dpairs
           |  QUALIFY rank <= 20),
           |fused AS (
           |  SELECT COALESCE(l.qid, dn.qid) AS qid, COALESCE(l.id, dn.id) AS id,
           |    CAST(COALESCE(CAST(FLOOR(1000000000000.0 / (60 + l.rank)) AS BIGINT), 0)
           |       + COALESCE(CAST(FLOOR(1000000000000.0 / (60 + dn.rank)) AS BIGINT), 0)
           |      AS BIGINT) AS score_scaled,
           |    l.rank AS rank_lex, dn.rank AS rank_dense
           |  FROM lr l FULL OUTER JOIN dr dn ON l.qid = dn.qid AND l.id = dn.id),
           |rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
           |  ORDER BY score_scaled DESC, id ASC) AS INT) AS fused_rank FROM fused)
           |SELECT qid, id, score_scaled, rank_lex, rank_dense, fused_rank
           |FROM rr WHERE fused_rank <= 10 ORDER BY qid, fused_rank""".stripMargin
      }),

    // Hybrid retrieval SERVED FROM THE REGISTRIES, as one public call
    // (Similarity.hybridQueryIndex): lexical arm off a Bm25Index, dense
    // arm off an IvfIndex (nProbe-bounded — the production approximate
    // trade), fused by RRF. Each query carries both modalities (text +
    // embedding — the shared doc_id/vec_id entity space). The oracle
    // composes the three proven devices: q_bm25's rebuild SQL for the
    // lexical arm (at the arm's top-20), q_ann_ivf's probe/assign SQL
    // for the dense arm, and q_hybrid_rrf's quantized-sum fusion — a
    // hash match proves the one-call composition changes nothing about
    // any arm.
    ("q_hybrid_indexed",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val centroids = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
        val bm25 = SparseSim.buildIndex(
          docs.filter(col("doc_id") >= 10), "doc_id", "text", ngram = 2)
        val ivf = Similarity.ivfBuildIndex(
          emb.filter(col("vec_id") >= 10), "vec_id", "embedding",
          centroids, dim = 64)
        val queries = docs.filter(col("doc_id") < 10)
          .select(col("doc_id"), col("text"))
          .join(emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
        Similarity.hybridQueryIndex(bm25, ivf, queries,
            "doc_id", "text", "embedding",
            armK = 20, maxDf = 50L, nProbe = 2, dim = 64,
            kRrf = 60, topK = 10)
          .orderBy("qid", "fused_rank")
      },
      Some {
        val (k1, b) = (1.2, 0.75)
        val (k1p1, oneMb) = ((k1 + 1.0).toString, (1.0 - b).toString)
        s"""WITH post AS (
           |  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
           |    SELECT doc_id AS id, unnest(list_transform(
           |      range(1, greatest(len(string_split(text, ' ')), 1)),
           |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS term
           |    FROM documents WHERE doc_id >= 10) t
           |  GROUP BY id, term),
           |lens AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS len FROM post GROUP BY id),
           |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(len) AS BIGINT) AS total_tokens FROM lens),
           |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
           |w AS (SELECT term, CAST(FLOOR(1000000.0 / df) AS BIGINT) AS w
           |  FROM d WHERE df <= 50),
           |q AS (SELECT DISTINCT qid, term FROM (
           |    SELECT doc_id AS qid, unnest(list_transform(
           |      range(1, greatest(len(string_split(text, ' ')), 1)),
           |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS term
           |    FROM documents WHERE doc_id < 10) t),
           |cand AS (
           |  SELECT q.qid, p.id, CAST(round(CAST(w.w AS DOUBLE) *
           |      ((CAST(p.tf AS DOUBLE) * $k1p1) /
           |       (CAST(p.tf AS DOUBLE) + $k1 * ($oneMb + $b *
           |        (CAST(l.len * s.n_docs AS DOUBLE)
           |         / CAST(s.total_tokens AS DOUBLE)))))) AS BIGINT) AS ts
           |  FROM post p JOIN w USING (term) JOIN q USING (term)
           |    JOIN lens l ON p.id = l.id, stats s),
           |bsc AS (SELECT qid, id, CAST(SUM(ts) AS BIGINT) AS bscore FROM cand
           |  GROUP BY qid, id),
           |lr AS (SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid
           |  ORDER BY bscore DESC, id) AS INT) AS rank FROM bsc
           |  QUALIFY rank <= 20),
           |n AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
           |    sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b)) AS nrm
           |  FROM embeddings),
           |c AS (SELECT vec_id AS cell_id, e AS ce, nrm AS cnrm FROM n WHERE vec_id < 8),
           |assign AS (
           |  SELECT vec_id AS cand_id, cell_id FROM (
           |    SELECT v.vec_id, c.cell_id,
           |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
           |        list_reduce(list_transform(range(1, len(v.e)+1), i -> v.e[i]*c.ce[i]), (x,y) -> x+y)
           |          / (v.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
           |    FROM n v, c WHERE v.vec_id >= 10) WHERE rn = 1),
           |probes AS (
           |  SELECT vec_id AS query_id, cell_id FROM (
           |    SELECT v.vec_id, c.cell_id,
           |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
           |        list_reduce(list_transform(range(1, len(v.e)+1), i -> v.e[i]*c.ce[i]), (x,y) -> x+y)
           |          / (v.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
           |    FROM n v, c WHERE v.vec_id < 10) WHERE rn <= 2),
           |dsc AS (
           |  SELECT p.query_id AS qid, a.cand_id AS id,
           |    list_reduce(list_transform(range(1, len(q2.e)+1), i -> q2.e[i]*x.e[i]), (x2,y2) -> x2+y2)
           |      / (q2.nrm * x.nrm) AS cosine
           |  FROM probes p
           |  JOIN assign a ON a.cell_id = p.cell_id AND a.cand_id <> p.query_id
           |  JOIN n q2 ON q2.vec_id = p.query_id
           |  JOIN n x ON x.vec_id = a.cand_id),
           |dr AS (SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid
           |  ORDER BY cosine DESC, id ASC) AS INT) AS rank FROM dsc
           |  QUALIFY rank <= 20),
           |fused AS (
           |  SELECT COALESCE(l.qid, dn.qid) AS qid, COALESCE(l.id, dn.id) AS id,
           |    CAST(COALESCE(CAST(FLOOR(1000000000000.0 / (60 + l.rank)) AS BIGINT), 0)
           |       + COALESCE(CAST(FLOOR(1000000000000.0 / (60 + dn.rank)) AS BIGINT), 0)
           |      AS BIGINT) AS score_scaled,
           |    l.rank AS rank_lex, dn.rank AS rank_dense
           |  FROM lr l FULL OUTER JOIN dr dn ON l.qid = dn.qid AND l.id = dn.id),
           |rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
           |  ORDER BY score_scaled DESC, id ASC) AS INT) AS fused_rank FROM fused)
           |SELECT qid, id, score_scaled, rank_lex, rank_dense, fused_rank
           |FROM rr WHERE fused_rank <= 10 ORDER BY qid, fused_rank""".stripMargin
      }),

    // Sequence packing, concat-and-chunk (GPT-style pretraining): each
    // shard's token stream concatenated in doc_id order and cut every
    // 512 tokens; docs may SPLIT across example boundaries, padding is
    // zero by construction. One window cumsum — a single shuffle on the
    // shard key, exact integer replay.
    ("q_token_pack",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
            TextStats.tokenCount(col("text")).cast("long").as("n_tok"))
        graft.llmops.Packing.packChunked(docs, "doc_id", "n_tok", "shard",
            capacity = 512)
          .orderBy("shard", "doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, doc_id % 8 AS shard,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY shard
             |    ORDER BY doc_id) AS BIGINT) AS e
             |  FROM t WHERE n_tokens >= 1)
             |SELECT shard, doc_id, n_tokens,
             |  CAST(e - n_tokens AS BIGINT) AS start_tok,
             |  CAST((e - n_tokens) // 512 AS BIGINT) AS first_bin,
             |  CAST((e - 1) // 512 AS BIGINT) AS last_bin,
             |  CAST((e - n_tokens) % 512 AS BIGINT) AS offset
             |FROM c ORDER BY shard, doc_id""".stripMargin)),

    // Sequence packing, greedy next-fit with ATOMIC documents (SFT-style
    // — an example must not cut an instruction): bin id depends on the
    // previous OUTPUT, so like the rate-clamp recurrence it runs as a
    // secondary-sorted O(1)-state scan, and like it the oracle is a
    // recursive CTE. fill_after of each bin's last doc exposes the
    // padding the chunked form avoids.
    ("q_pack_greedy",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
            TextStats.tokenCount(col("text")).cast("long").as("n_tok"))
        graft.llmops.Packing.packGreedy(docs, "doc_id", "n_tok", "shard",
            capacity = 512)
          .orderBy("shard", "id")
      },
      Some("""WITH RECURSIVE t AS (
             |  SELECT CAST(doc_id % 8 AS VARCHAR) AS shard, doc_id AS id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    CAST(row_number() OVER (PARTITION BY doc_id % 8
             |      ORDER BY doc_id) AS BIGINT) AS rn
             |  FROM documents WHERE len(string_split(text, ' ')) >= 1),
             |r(shard, id, n_tokens, rn, bin, fill_after) AS (
             |  SELECT shard, id, n_tokens, rn, CAST(0 AS BIGINT), n_tokens
             |  FROM t WHERE rn = 1
             |  UNION ALL
             |  SELECT t.shard, t.id, t.n_tokens, t.rn,
             |    CASE WHEN r.fill_after + t.n_tokens > 512
             |         THEN r.bin + 1 ELSE r.bin END,
             |    CASE WHEN r.fill_after + t.n_tokens > 512
             |         THEN t.n_tokens ELSE r.fill_after + t.n_tokens END
             |  FROM r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1)
             |SELECT shard, id, n_tokens, bin, fill_after
             |FROM r ORDER BY shard, id""".stripMargin)),

    // Corpus vocabulary: token frequencies, deterministic top-50
    // (freq desc, token asc). Explode → partial-agg count → global top-k;
    // the map-side partial aggregation means the shuffle carries one row
    // per (partition, token), not per token occurrence.
    // Winnowing-style document fingerprint: min over all 8-byte-window
    // rolling polynomial hashes (native O(n) Rabin-Karp expression,
    // graft_rolling_min_hash). No modulus — values stay under 2^53, so
    // the fingerprint is exact integer arithmetic in both engines.
    ("q_winnow_fingerprint",
      (s: SparkSession, d: String) => {
        import graft.functions.TextExpressions
        Tables.documents(s, d)
          .select(col("doc_id"),
            greatest(length(col("text")) - 7, lit(0)).as("n_windows"),
            TextExpressions.rollingMinHash(col("text"), w = 8, base = 31L).as("fp"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
             |  CAST(GREATEST(length(text) - 7, 0) AS INT) AS n_windows,
             |  ${graft.functions.TextExpressions.rollingMinHashSql("text", 8, 31L)} AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Corpus collocations by lift (log-free PMI): exact integer counts,
    // one deterministic double division — ranking identical to PMI
    // because log is monotone, without the transcendental engines round
    // differently. The min-count prune bounds the join input at scale.
    ("q_collocations",
      (s: SparkSession, d: String) => {
        TextStats.collocationLift(Tables.documents(s, d), "text", minCount = 5)
          .orderBy(col("lift").desc, col("w1"), col("w2"))
          .limit(30)
      },
      Some("""WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
             |uniw AS (SELECT unnest(t) AS w FROM t),
             |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM uniw GROUP BY w),
             |n AS (SELECT CAST(SUM(c_w) AS DOUBLE) AS n_tok FROM uni),
             |bp AS (
             |  SELECT unnest(list_transform(range(1, len(t)), i -> {'w1': t[i], 'w2': t[i+1]})) AS p
             |  FROM t),
             |bi AS (SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c_ab
             |  FROM bp GROUP BY 1, 2 HAVING COUNT(*) >= 5),
             |sc AS (
             |  SELECT b.w1, b.w2, b.c_ab, u1.c_w AS c_1, u2.c_w AS c_2,
             |    (CAST(b.c_ab AS DOUBLE) * (SELECT n_tok FROM n)) /
             |      (CAST(u1.c_w AS DOUBLE) * CAST(u2.c_w AS DOUBLE)) AS lift
             |  FROM bi b JOIN uni u1 ON b.w1 = u1.w JOIN uni u2 ON b.w2 = u2.w)
             |SELECT * FROM sc ORDER BY lift DESC, w1, w2 LIMIT 30""".stripMargin)),

    ("q_vocab_topk",
      (s: SparkSession, d: String) => {
        Tables.documents(s, d)
          .select(explode(TextStats.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("token").asc)
          .limit(50)
      },
      Some("""SELECT token, CAST(count(*) AS BIGINT) AS freq
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |GROUP BY token ORDER BY freq DESC, token ASC LIMIT 50""".stripMargin)),

    // Vocabulary coverage: the fraction of token OCCURRENCES per language
    // covered by the global top-50 vocabulary — the tokenizer/OOV-rate
    // report that decides whether a vocab is big enough for a corpus
    // slice. Integer occurrence counts, one int→double division; the
    // vocab is the q_vocab_topk deterministic top-k, broadcast.
    ("q_vocab_coverage",
      (s: SparkSession, d: String) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(TextStats.tokens(col("text"))).as("token"))
        val vocab = toks.groupBy("token").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("token").asc).limit(50)
          .select(col("token"), lit(1L).as("_in"))
        toks.join(broadcast(vocab), Seq("token"), "left")
          .groupBy("lang").agg(
            count(lit(1)).as("n_tokens"),
            sum(coalesce(col("_in"), lit(0L))).as("n_covered"))
          .withColumn("coverage",
            col("n_covered").cast("double") / col("n_tokens"))
          .orderBy("lang")
      },
      Some("""WITH t AS (
             |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
             |v AS (
             |  SELECT token FROM (
             |    SELECT token, count(*) AS freq FROM t GROUP BY token
             |    ORDER BY freq DESC, token ASC LIMIT 50))
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN token IN (SELECT token FROM v) THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
             |  CAST(sum(CASE WHEN token IN (SELECT token FROM v) THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*) AS coverage
             |FROM t GROUP BY lang ORDER BY lang""".stripMargin)),

    // Relative quality gate: keep the top 75% per language by length —
    // the percentile form of a quality filter (absolute thresholds rot
    // as the corpus mix shifts; per-group ranking protects low-resource
    // slices). Count-based cut (rank ≤ ceil(f·n)) so every group keeps
    // at least one doc; 0.75 is binary-exact so the cut arithmetic is
    // identical in both engines.
    ("q_quality_percentile",
      (s: SparkSession, d: String) => {
        TextStats.qualityPercentileGate(
            Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
            groupCol = "lang", scoreCol = "n_chars", idCol = "doc_id",
            keepFraction = 0.75)
          .orderBy("doc_id")
      },
      Some("""WITH r AS (
             |  SELECT doc_id, lang, n_chars,
             |    CAST(row_number() OVER (PARTITION BY lang
             |      ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS grp_rank,
             |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS grp_n
             |  FROM documents)
             |SELECT doc_id, lang, n_chars, grp_rank, grp_n FROM r
             |WHERE grp_rank <= CAST(ceil(0.75 * CAST(grp_n AS DOUBLE)) AS BIGINT)
             |ORDER BY doc_id""".stripMargin)),

    // Distinct-n diversity per language slice: distinct 3-grams over
    // total 3-gram occurrences — low ratio flags template/boilerplate-
    // heavy slices (the group-level companion of the per-doc repetition
    // metrics).
    ("q_distinct_ngrams",
      (s: SparkSession, d: String) => {
        TextStats.distinctNgramDiversity(Tables.documents(s, d),
            groupCol = "lang", textCol = "text", n = 3)
          .orderBy("lang")
      },
      Some("""WITH s AS (
             |  SELECT lang, unnest(list_transform(
             |    range(1, greatest(len(string_split(text,' ')) - 1, 1)),
             |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS gram
             |  FROM documents)
             |SELECT lang, CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams,
             |  CAST(count(*) AS BIGINT) AS total_grams,
             |  CAST(count(DISTINCT gram) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS diversity
             |FROM s GROUP BY lang ORDER BY lang""".stripMargin)),

    // Bigram-LM document scoring (the CCNet/KenLM perplexity-filter
    // pattern, log-free): MLE conditionals from the corpus itself, mean-p
    // + min-p per document. See TextStats.lmScore for why mean-p replaces
    // exp(mean log p) in the verified output.
    ("q_lm_score",
      (s: SparkSession, d: String) => {
        TextStats.lmScore(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |pairs AS (
             |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(range(1, len(t)), i -> {'w1': t[i], 'w2': t[i+1]})) AS p
             |    FROM t)),
             |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
             |  FROM pairs GROUP BY 1, 2),
             |lft AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_1 FROM big GROUP BY 1),
             |sc AS (
             |  SELECT pr.doc_id,
             |    CAST(b.c_ab AS DOUBLE) / CAST(u.c_1 AS DOUBLE) AS p
             |  FROM pairs pr JOIN big b USING (w1, w2) JOIN lft u USING (w1))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(CAST(p AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS mean_p,
             |  MIN(p) AS min_p
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Token-budget recipe planning: water-filled per-language quotas for
    // a 20k-token budget with a zh-heavy target mix — zh saturates in
    // round 1, its unfilled share redistributes until only en (the one
    // domain with spare mass) absorbs the remainder; Σ assigned = budget.
    ("q_recipe_plan",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .withColumn("n_tokens", TextStats.tokenCount(col("text")).cast("long"))
        TextStats.recipePlan(docs, "lang", "n_tokens",
            weights = Map("en" -> 10L, "de" -> 10L, "fr" -> 10L,
              "es" -> 10L, "zh" -> 60L),
            budgetTokens = 20000L, rounds = 3)
          .orderBy("lang")
      },
      Some("""WITH tk AS (
             |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS t FROM documents),
             |av AS (SELECT lang, SUM(t) AS avail FROM tk GROUP BY 1),
             |wt(lang, w) AS (VALUES ('en', CAST(10 AS BIGINT)), ('de', 10), ('fr', 10), ('es', 10), ('zh', 60)),
             |s0 AS (SELECT coalesce(wt.lang, av.lang) AS lang,
             |  coalesce(av.avail, 0) AS avail, coalesce(wt.w, 0) AS w, FALSE AS sat
             |  FROM wt FULL JOIN av ON wt.lang = av.lang),
             |r1 AS (SELECT s0.*,
             |  (SELECT coalesce(SUM(CASE WHEN sat THEN avail END), 0) FROM s0) AS satSum,
             |  (SELECT coalesce(SUM(CASE WHEN NOT sat THEN w END), 0) FROM s0) AS wAct FROM s0),
             |s1 AS (SELECT lang, avail, w, (sat OR avail <=
             |  CASE WHEN wAct = 0 THEN 0 ELSE ((20000 - satSum) * w) // wAct END) AS sat FROM r1),
             |r2 AS (SELECT s1.*,
             |  (SELECT coalesce(SUM(CASE WHEN sat THEN avail END), 0) FROM s1) AS satSum,
             |  (SELECT coalesce(SUM(CASE WHEN NOT sat THEN w END), 0) FROM s1) AS wAct FROM s1),
             |s2 AS (SELECT lang, avail, w, (sat OR avail <=
             |  CASE WHEN wAct = 0 THEN 0 ELSE ((20000 - satSum) * w) // wAct END) AS sat FROM r2),
             |r3 AS (SELECT s2.*,
             |  (SELECT coalesce(SUM(CASE WHEN sat THEN avail END), 0) FROM s2) AS satSum,
             |  (SELECT coalesce(SUM(CASE WHEN NOT sat THEN w END), 0) FROM s2) AS wAct FROM s2),
             |s3 AS (SELECT lang, avail, w, (sat OR avail <=
             |  CASE WHEN wAct = 0 THEN 0 ELSE ((20000 - satSum) * w) // wAct END) AS sat FROM r3),
             |fin AS (SELECT s3.*,
             |  (SELECT coalesce(SUM(CASE WHEN sat THEN avail END), 0) FROM s3) AS satSum,
             |  (SELECT coalesce(SUM(CASE WHEN NOT sat THEN w END), 0) FROM s3) AS wAct FROM s3),
             |res AS (SELECT lang, avail, w,
             |  CASE WHEN sat THEN avail ELSE
             |    least(CASE WHEN wAct = 0 THEN 0 ELSE ((20000 - satSum) * w) // wAct END, avail)
             |  END AS assigned FROM fin)
             |SELECT lang, CAST(avail AS BIGINT) AS avail, w,
             |  CAST(assigned AS BIGINT) AS assigned,
             |  CASE WHEN avail = 0 THEN 0.0
             |    ELSE CAST(assigned AS DOUBLE) / CAST(avail AS DOUBLE) END AS rate
             |FROM res ORDER BY lang""".stripMargin)),

    // Budget-constrained quality selection — the assembly step after
    // recipe planning: per language, documents taken in descending
    // quality until the token quota is spent (kept iff the doc STARTS
    // within budget, so overshoot is bounded by one doc). Quotas here
    // are literals; in production they come from q_recipe_plan's
    // `assigned` column.
    ("q_budget_select",
      (s: SparkSession, d: String) => {
        val spark = s
        import spark.implicits._
        val quotas = Seq(("en", 5000L), ("de", 3000L), ("fr", 2000L),
          ("es", 1000L), ("zh", 800L)).toDF("lang", "quota")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextStats.qualityScore(col("text"), Stopwords).as("quality"))
        TextStats.selectToBudget(docs, "doc_id", "lang", "n_tokens",
            "quality", quotas)
          .select("doc_id", "lang", "n_tokens", "quality", "quota",
            "cum_tokens", "keep")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
              |q AS (
              |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
              |    least(1.0, CAST(len(toks) AS DOUBLE)/100.0) * 0.4 +
              |    (1.0 - CAST(len(list_filter(toks, x -> list_contains($stopListSql, x))) AS DOUBLE)/len(toks)) * 0.3 +
              |    CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) * 0.3 AS quality
              |  FROM t),
              |qt(lang, quota) AS (VALUES ('en', CAST(5000 AS BIGINT)),
              |  ('de', 3000), ('fr', 2000), ('es', 1000), ('zh', 800)),
              |c AS (
              |  SELECT q.doc_id, q.lang, q.n_tokens, q.quality,
              |    coalesce(qt.quota, 0) AS quota,
              |    SUM(q.n_tokens) OVER (PARTITION BY q.lang
              |      ORDER BY q.quality DESC, q.doc_id ASC
              |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
              |  FROM q LEFT JOIN qt USING (lang))
              |SELECT doc_id, lang, n_tokens, quality, quota,
              |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
              |  (cum_tokens - n_tokens < quota) AS keep
              |FROM c ORDER BY doc_id""".stripMargin)),

    // DSIR-style importance scoring: hashed bigram features (1024 md5
    // buckets), target = the English slice, score = ratio-of-means
    // surrogate for the log-likelihood ratio (engine-exact; see
    // TextStats.importanceScore). High scorers are what importance
    // resampling keeps when curating toward the target domain.
    ("q_importance_score",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        TextStats.importanceScore(docs, "doc_id", "text",
            docs.filter(col("lang") === "en"), "text",
            gramN = 2, buckets = 1024)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, lang, string_split(text,' ') AS w FROM documents),
             |idx AS (SELECT doc_id, lang, w,
             |  unnest(range(1, greatest(len(w), 1))) AS i FROM toks),
             |g AS (SELECT doc_id, lang,
             |  CAST(concat('0x', substring(md5(w[i] || ' ' || w[i+1]), 1, 15)) AS BIGINT) % 1024 AS b
             |  FROM idx),
             |docx AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c_x
             |  FROM g GROUP BY 1, 2),
             |raw AS (SELECT b, CAST(SUM(c_x) AS BIGINT) AS c_r FROM docx GROUP BY 1),
             |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS c_t
             |  FROM g WHERE lang = 'en' GROUP BY 1),
             |agg AS (
             |  SELECT d.doc_id,
             |    CAST(SUM(d.c_x) AS BIGINT) AS n_grams,
             |    CAST(SUM(d.c_x * coalesce(t.c_t, 0)) AS BIGINT) AS dot_target,
             |    CAST(SUM(d.c_x * r.c_r) AS BIGINT) AS dot_raw
             |  FROM docx d JOIN raw r USING (b) LEFT JOIN tgt t USING (b)
             |  GROUP BY 1)
             |SELECT doc_id, n_grams, dot_target, dot_raw,
             |  (CAST(dot_target AS DOUBLE) * (SELECT CAST(SUM(c_r) AS DOUBLE) FROM raw)) /
             |  (CAST(dot_raw AS DOUBLE) * (SELECT CAST(SUM(c_t) AS DOUBLE) FROM tgt)) AS score
             |FROM agg ORDER BY doc_id""".stripMargin)),

    // Per-label centroid-distance outliers (embedding-curation prune):
    // decimal-exact centroid (closes the labelStats float-mean omission),
    // left-to-right distance fold, top-5 farthest per label.
    ("q_embedding_outliers",
      (s: SparkSession, d: String) => {
        Similarity.centroidOutliers(Tables.embeddings(s, d),
            idCol = "vec_id", labelCol = "label", vecCol = "embedding",
            topK = 5)
          .orderBy("label", "rank")
      },
      Some("""WITH v AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |comp AS (
             |  SELECT label,
             |    unnest(list_transform(range(1, len(e)+1), i -> {'i': i, 'x': e[i]})) AS s
             |  FROM v),
             |cent AS (
             |  SELECT label, s.i AS i,
             |    CAST(SUM(CAST(s.x AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS m
             |  FROM comp GROUP BY 1, 2),
             |ca AS (SELECT label, list(m ORDER BY i) AS c FROM cent GROUP BY label),
             |dd AS (
             |  SELECT v.vec_id, v.label,
             |    list_reduce(list_transform(range(1, len(e)+1),
             |      i -> (e[i]-c[i])*(e[i]-c[i])), (a,b) -> a+b) AS dist2
             |  FROM v JOIN ca USING (label)),
             |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY label
             |    ORDER BY dist2 DESC, vec_id) AS INT) AS rank FROM dd)
             |SELECT vec_id, label, dist2, rank FROM r
             |WHERE rank <= 5 ORDER BY label, rank""".stripMargin))
  )

  /** q_sparse_topk's full-rebuild oracle (bigrams, k=3, df window
    * [2, 50], whole documents table) — shared VERBATIM with
    * q_sparse_topk_incremental, which computes the same answer through a
    * delta-merged stored [[SparseSim.Bm25Index]] via cosineTopKIndex. */
  private def sparseTopkFullRebuildOracleSql: String =
    """WITH post AS (
      |  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id AS id, unnest(list_transform(
      |      range(1, greatest(len(string_split(text, ' ')), 1)),
      |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS term
      |    FROM documents) t
      |  GROUP BY id, term),
      |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
      |w AS (
      |  SELECT term, CAST(FLOOR(1000000.0 / df) AS BIGINT) AS w FROM d
      |  WHERE df BETWEEN 2 AND 50),
      |wp AS (SELECT p.id, p.term, p.tf, w.w FROM post p JOIN w USING (term)),
      |norms AS (SELECT id, CAST(SUM(tf * tf * w) AS BIGINT) AS s2
      |  FROM wp GROUP BY id),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    CAST(SUM(a.tf * b.tf * a.w) AS BIGINT) AS score_num
      |  FROM wp a JOIN wp b ON a.term = b.term AND a.id < b.id
      |  GROUP BY 1, 2),
      |sym AS (
      |  SELECT id_a AS id, id_b AS neighbor, score_num FROM pairs
      |  UNION ALL SELECT id_b, id_a, score_num FROM pairs),
      |sc AS (
      |  SELECT s.id, s.neighbor, s.score_num,
      |    CAST(s.score_num AS DOUBLE)
      |      / sqrt(CAST(na.s2 AS DOUBLE) * CAST(nb.s2 AS DOUBLE)) AS cosine
      |  FROM sym s JOIN norms na ON s.id = na.id
      |    JOIN norms nb ON s.neighbor = nb.id),
      |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY id
      |  ORDER BY cosine DESC, neighbor) AS INT) AS rank FROM sc)
      |SELECT id, neighbor, score_num, cosine, rank FROM r WHERE rank <= 3
      |ORDER BY id, rank""".stripMargin

  /** The IVF full-rebuild oracle (frozen centroids vec_id < 8, corpus
    * vec_id >= 8, queries 8..17, k=3, nProbe=2) — shared VERBATIM by
    * q_ann_ivf (one-shot [[Similarity.ivfTopK]]) and q_ivf_incremental
    * (a delta-merged [[Similarity.IvfIndex]]): both hashing green against
    * the same rebuild SQL is the delta-merge ≡ rebuild proof for the
    * vector registry. */
  private def ivfFullRebuildOracleSql: String =
    """WITH n AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |    sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b)) AS nrm
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cell_id, e AS ce, nrm AS cnrm FROM n WHERE vec_id < 8),
      |assign AS (
      |  SELECT vec_id AS cand_id, cell_id FROM (
      |    SELECT v.vec_id, c.cell_id,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        list_reduce(list_transform(range(1, len(v.e)+1), i -> v.e[i]*c.ce[i]), (x,y) -> x+y)
      |          / (v.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
      |    FROM n v, c WHERE v.vec_id >= 8) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, cell_id FROM (
      |    SELECT v.vec_id, c.cell_id,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        list_reduce(list_transform(range(1, len(v.e)+1), i -> v.e[i]*c.ce[i]), (x,y) -> x+y)
      |          / (v.nrm * c.cnrm) DESC, c.cell_id ASC) AS rn
      |    FROM n v, c WHERE v.vec_id >= 8 AND v.vec_id < 18) WHERE rn <= 2),
      |scored AS (
      |  SELECT p.query_id, p.cell_id, a.cand_id,
      |    list_reduce(list_transform(range(1, len(q.e)+1), i -> q.e[i]*x.e[i]), (x2,y2) -> x2+y2)
      |      / (q.nrm * x.nrm) AS cosine
      |  FROM probes p
      |  JOIN assign a ON a.cell_id = p.cell_id AND a.cand_id <> p.query_id
      |  JOIN n q ON q.vec_id = p.query_id
      |  JOIN n x ON x.vec_id = a.cand_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, cand_id ASC) AS rank FROM scored)
      |SELECT query_id, cell_id, cand_id, cosine, CAST(rank AS INT) AS rank
      |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** The BM25 full-rebuild oracle (queries doc_id < 10 against corpus
    * doc_id >= 10, bigrams, k=5, maxDf=50) — shared VERBATIM by q_bm25
    * (which scores through [[SparseSim.bm25Retrieve]]) and
    * q_bm25_incremental (which scores through a delta-merged
    * [[SparseSim.Bm25Index]]): both hashing green against the same
    * rebuild SQL is the delta-merge ≡ rebuild equivalence proof. */
  private def bm25FullRebuildOracleSql: String = {
    val (k1, b) = (1.2, 0.75)
    val (k1p1, oneMb) = ((k1 + 1.0).toString, (1.0 - b).toString)
    s"""WITH post AS (
       |  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id AS id, unnest(list_transform(
       |      range(1, greatest(len(string_split(text, ' ')), 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS term
       |    FROM documents WHERE doc_id >= 10) t
       |  GROUP BY id, term),
       |lens AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS len FROM post GROUP BY id),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len) AS BIGINT) AS total_tokens FROM lens),
       |d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
       |w AS (SELECT term, CAST(FLOOR(1000000.0 / df) AS BIGINT) AS w
       |  FROM d WHERE df <= 50),
       |q AS (SELECT DISTINCT qid, term FROM (
       |    SELECT doc_id AS qid, unnest(list_transform(
       |      range(1, greatest(len(string_split(text, ' ')), 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS term
       |    FROM documents WHERE doc_id < 10) t),
       |cand AS (
       |  SELECT q.qid, p.id, CAST(round(CAST(w.w AS DOUBLE) *
       |      ((CAST(p.tf AS DOUBLE) * $k1p1) /
       |       (CAST(p.tf AS DOUBLE) + $k1 * ($oneMb + $b *
       |        (CAST(l.len * s.n_docs AS DOUBLE)
       |         / CAST(s.total_tokens AS DOUBLE)))))) AS BIGINT) AS ts
       |  FROM post p JOIN w USING (term) JOIN q USING (term)
       |    JOIN lens l ON p.id = l.id, stats s),
       |sc AS (SELECT qid, id, CAST(SUM(ts) AS BIGINT) AS score_scaled,
       |  CAST(COUNT(*) AS BIGINT) AS n_terms FROM cand GROUP BY qid, id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |  ORDER BY score_scaled DESC, id) AS INT) AS rank FROM sc)
       |SELECT qid, id, score_scaled, n_terms, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.functions.{Aggregators, PathFunctions}

/** Remaining §2 operators: LCP aggregation (O8), segment clip (W10),
  * directory rollup (A6). */
object MiscQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // O8 — longest-common-prefix per group via a typed Aggregator with
    // map-side partial merge (reference: scene_copy.py:341-368). Oracle
    // uses the min/max trick: LCP(set) = LCP(lexicographic min, max).
    ("q_common_prefix",
      (s: SparkSession, d: String) => {
        Tables.customer(s, d)
          .groupBy("c_mktsegment")
          .agg(Aggregators.lcpAgg(col("c_name")).as("common_prefix"),
            count(lit(1)).as("n"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH mm AS (
             |  SELECT c_mktsegment, min(c_name) AS mn, max(c_name) AS mx,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM customer GROUP BY c_mktsegment)
             |SELECT c_mktsegment,
             |  substr(mn, 1, CAST(list_sum(list_transform(
             |    range(1, CAST(least(len(mn), len(mx)) AS BIGINT) + 1),
             |    i -> CASE WHEN substr(mn, 1, CAST(i AS INT)) = substr(mx, 1, CAST(i AS INT))
             |              THEN 1 ELSE 0 END)) AS INT)) AS common_prefix,
             |  n
             |FROM mm ORDER BY c_mktsegment""".stripMargin)),

    // W10 — clip behavior segments after trajectory truncation: drop
    // segments past the new end, shorten the straddling one
    // (reference: worker_create.py:536-582). Segments are synthesized per
    // order; the "new end" is the last surviving line number under a
    // quantity budget (W3).
    ("q_segment_clip",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        // Single shuffle: the cumulative sum, the per-order last surviving
        // index, the clip, and the final dedup all run over one
        // hash-partitioning on l_orderkey — no second scan, no
        // groupBy+join back. The trailing distinct stays partition-local
        // because hash(l_orderkey) already clusters its key superset.
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity")
        val ordered = Window.partitionBy("l_orderkey")
          .orderBy(col("l_linenumber"), col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val whole = Window.partitionBy("l_orderkey")
        li.withColumn("_cum", sum(col("l_quantity")).over(ordered))
          .withColumn("last_idx",
            max(when(col("_cum") <= 100.0, col("l_linenumber"))).over(whole))
          .filter(col("l_linenumber") <= col("last_idx"))
          .select(col("l_orderkey"), col("l_linenumber").as("start_idx"),
            least(col("l_linenumber") + 2, col("last_idx")).as("end_idx"))
          .dropDuplicates("l_orderkey", "start_idx", "end_idx")
          .orderBy("l_orderkey", "start_idx")
      },
      Some("""WITH c AS (
             |  SELECT l_orderkey, l_linenumber, l_quantity,
             |    SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM lineitem),
             |last AS (
             |  SELECT l_orderkey, max(l_linenumber) AS last_idx
             |  FROM c WHERE cum <= 100.0 GROUP BY l_orderkey),
             |segs AS (
             |  SELECT DISTINCT l_orderkey, l_linenumber AS start_idx,
             |    l_linenumber + 2 AS end_idx
             |  FROM lineitem)
             |SELECT DISTINCT s.l_orderkey, s.start_idx,
             |  least(s.end_idx, l.last_idx) AS end_idx
             |FROM segs s JOIN last l ON s.l_orderkey = l.l_orderkey
             |WHERE s.start_idx <= l.last_idx
             |ORDER BY s.l_orderkey, start_idx""".stripMargin)),

    // Content-hash change detection (reference: scene_registry.py
    // is_scene_downloaded / is_navmesh_baked expected-hash compare —
    // SURVEY §4's incremental-recompute convention). A new snapshot's
    // content hashes full-outer-join the registry's recorded hashes;
    // every item classifies as new / changed / unchanged / deleted, and
    // only new+changed feed reprocessing. Synthetic drift: every 5th item
    // has new content, every 7th is missing from the old registry, every
    // 11th vanished from the new snapshot — all four statuses occur.
    ("q_change_detection",
      (s: SparkSession, d: String) => {
        val files = Tables.part(s, d)
        val newSnap = files.filter(pmod(col("p_partkey"), lit(11)) =!= 0)
          .select(col("p_partkey").as("item"),
            md5(concat(col("p_type"),
              when(pmod(col("p_partkey"), lit(5)) === 0, lit("v2")).otherwise(lit(""))))
              .as("new_hash"))
        val registry = files.filter(pmod(col("p_partkey"), lit(7)) =!= 0)
          .select(col("p_partkey").as("item"), md5(col("p_type")).as("old_hash"))
        newSnap.join(registry, Seq("item"), "full_outer")
          .withColumn("status",
            when(col("old_hash").isNull, "new")
              .when(col("new_hash").isNull, "deleted")
              .when(col("new_hash") =!= col("old_hash"), "changed")
              .otherwise("unchanged"))
          .groupBy("status").agg(count(lit(1)).as("n_items"))
          .orderBy("status")
      },
      Some("""WITH new_snap AS (
             |  SELECT p_partkey AS item,
             |    md5(p_type || CASE WHEN p_partkey % 5 = 0 THEN 'v2' ELSE '' END) AS new_hash
             |  FROM part WHERE p_partkey % 11 <> 0),
             |registry AS (
             |  SELECT p_partkey AS item, md5(p_type) AS old_hash
             |  FROM part WHERE p_partkey % 7 <> 0)
             |SELECT CASE WHEN old_hash IS NULL THEN 'new'
             |            WHEN new_hash IS NULL THEN 'deleted'
             |            WHEN new_hash <> old_hash THEN 'changed'
             |            ELSE 'unchanged' END AS status,
             |  CAST(count(*) AS BIGINT) AS n_items
             |FROM new_snap FULL OUTER JOIN registry USING (item)
             |GROUP BY 1 ORDER BY status""".stripMargin)),

    // Data-quality constraint validation (reference: core/validators.py
    // prerequisite checks): all row rules in one aggregation pass, plus a
    // referential-integrity orphan count. Rules are chosen so some PASS
    // and some FAIL on the synthetic data — the checker must prove it can
    // count violations, not just emit zeros.
    ("q_quality_checks",
      (s: SparkSession, d: String) => {
        import graft.operators.Quality
        val li = Tables.lineitem(s, d)
        val rowRules = Quality.check(li, Seq(
          Quality.Rule("quantity_positive", col("l_quantity") > 0),
          Quality.Rule("quantity_le_30", col("l_quantity") <= 30),
          Quality.Rule("discount_in_range", col("l_discount") >= 0 && col("l_discount") <= 0.1),
          Quality.Rule("shipdate_not_null", col("l_shipdate").isNotNull)))
        val orphans = Quality.fkOrphans(li, Tables.orders(s, d),
            "l_orderkey", "o_orderkey")
          .agg(count(lit(1)).as("violations"))
          .select(lit("fk_orders").as("rule"), col("violations"),
            lit(null).cast("long").as("total"))
        rowRules.select(col("rule"), col("violations"), col("total"))
          .unionByName(orphans)
          .orderBy("rule")
      },
      Some("""WITH rows_checked AS (
             |  SELECT CAST(count(*) AS BIGINT) AS total,
             |    CAST(SUM(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END) AS BIGINT) AS quantity_positive,
             |    CAST(SUM(CASE WHEN l_quantity <= 30 THEN 0 ELSE 1 END) AS BIGINT) AS quantity_le_30,
             |    CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.1 THEN 0 ELSE 1 END) AS BIGINT) AS discount_in_range,
             |    CAST(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS shipdate_not_null
             |  FROM lineitem),
             |fk AS (
             |  SELECT CAST(count(*) AS BIGINT) AS violations FROM lineitem l
             |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             |SELECT rule, violations, total FROM (
             |  SELECT 'quantity_positive' AS rule, quantity_positive AS violations, total FROM rows_checked
             |  UNION ALL SELECT 'quantity_le_30', quantity_le_30, total FROM rows_checked
             |  UNION ALL SELECT 'discount_in_range', discount_in_range, total FROM rows_checked
             |  UNION ALL SELECT 'shipdate_not_null', shipdate_not_null, total FROM rows_checked
             |  UNION ALL SELECT 'fk_orders', violations, CAST(NULL AS BIGINT) FROM fk)
             |ORDER BY rule""".stripMargin)),

    // A6 — per-directory file count + byte sum + human-readable size
    // (reference: copy_scene_assets.py:172-190, run_upload_scenes.py:100-104).
    ("q_dir_rollup",
      (s: SparkSession, d: String) => {
        val files = Tables.part(s, d).select(
          concat(lit("Content/"), col("p_brand"), lit("/"), col("p_type"),
            lit("/"), col("p_name")).as("path"),
          (col("p_size").cast("long") * 1048576L).as("size"))
        files
          .withColumn("dir", concat_ws("/",
            slice(split(col("path"), "/"), 1, 2)))
          .groupBy("dir")
          .agg(count(lit(1)).as("n_files"), sum(col("size")).as("total_bytes"))
          .withColumn("total_human", PathFunctions.formatSize(col("total_bytes")))
          .orderBy("dir")
      },
      Some("""WITH files AS (
             |  SELECT 'Content/' || p_brand || '/' || p_type || '/' || p_name AS path,
             |    CAST(p_size AS BIGINT) * 1048576 AS size
             |  FROM part),
             |agg AS (
             |  SELECT array_to_string(string_split(path, '/')[1:2], '/') AS dir,
             |    CAST(COUNT(*) AS BIGINT) AS n_files,
             |    CAST(SUM(size) AS BIGINT) AS total_bytes
             |  FROM files GROUP BY 1)
             |SELECT dir, n_files, total_bytes,
             |  CASE WHEN total_bytes < 1024 THEN CAST(total_bytes AS VARCHAR) || ' B'
             |       WHEN total_bytes < 1048576 THEN CAST(round(CAST(total_bytes AS DOUBLE)/1024, 1) AS VARCHAR) || ' KB'
             |       WHEN total_bytes < 1073741824 THEN CAST(round(CAST(total_bytes AS DOUBLE)/1048576, 1) AS VARCHAR) || ' MB'
             |       WHEN total_bytes < 1099511627776 THEN CAST(round(CAST(total_bytes AS DOUBLE)/1073741824, 1) AS VARCHAR) || ' GB'
             |       WHEN total_bytes < 1125899906842624 THEN CAST(round(CAST(total_bytes AS DOUBLE)/1099511627776, 1) AS VARCHAR) || ' TB'
             |       ELSE CAST(round(CAST(total_bytes AS DOUBLE)/1125899906842624, 1) AS VARCHAR) || ' PB' END AS total_human
             |FROM agg ORDER BY dir""".stripMargin))
  )
}

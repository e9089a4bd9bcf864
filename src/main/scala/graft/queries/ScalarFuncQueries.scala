package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.functions.PathFunctions

/** Scalar-function family (SURVEY.md §2.8): path/string/date/hash
  * functions over constructed path-like columns.
  */
object ScalarFuncQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // Path scalar chain: last-segment map name (with .Object suffix strip),
    // output-dir derivation, indexed segment, safe name
    // (reference: job_utils.py:332-461; camera_exporter.py:16-33).
    ("q_path_functions",
      (s: SparkSession, d: String) => {
        val withPath = Tables.part(s, d).withColumn("path",
          concat(lit("/Game/"), col("p_brand"), lit("/Maps/"),
            col("p_name"), lit("."), col("p_name")))
        withPath.select(
            col("p_partkey"), col("path"),
            PathFunctions.extractMapName(col("path")).as("map_name"),
            PathFunctions.deriveOutputDir(col("path")).as("out_dir"),
            PathFunctions.segment(col("path"), 3).as("seg3"),
            PathFunctions.safeName(col("p_name")).as("safe_name"),
            PathFunctions.stripTrailingIndex(
              concat(col("p_name"), lit("_"), col("p_partkey"))).as("stripped"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |  '/Game/' || p_brand || '/Maps/' || p_name || '.' || p_name AS path,
             |  regexp_replace(string_split('/Game/' || p_brand || '/Maps/' || p_name || '.' || p_name, '/')[-1], '\.[^.]*$', '') AS map_name,
             |  array_to_string(string_split('/Game/' || p_brand || '/Maps/' || p_name || '.' || p_name, '/')[1:4], '/') || '/Sequence' AS out_dir,
             |  string_split('/Game/' || p_brand || '/Maps/' || p_name || '.' || p_name, '/')[3] AS seg3,
             |  replace(p_name, ' ', '_') AS safe_name,
             |  regexp_replace(p_name || '_' || CAST(p_partkey AS VARCHAR), '[_-]?[0-9]+$', '') AS stripped
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // format_size B→PB (reference: copy_scene_assets.py:192-197).
    ("q_format_size",
      (s: SparkSession, d: String) => {
        val bytes = floor(col("o_totalprice") * 1000).cast("long")
        Tables.orders(s, d)
          .select(col("o_orderkey"), bytes.as("nbytes"),
            PathFunctions.formatSize(bytes).as("size_str"))
          .orderBy("o_orderkey")
      },
      Some("""WITH b AS (SELECT o_orderkey, CAST(floor(o_totalprice * 1000) AS BIGINT) AS nbytes FROM orders)
             |SELECT o_orderkey, nbytes,
             |  CASE WHEN nbytes < 1024 THEN CAST(nbytes AS VARCHAR) || ' B'
             |       WHEN nbytes < 1048576 THEN CAST(round(CAST(nbytes AS DOUBLE)/1024, 1) AS VARCHAR) || ' KB'
             |       WHEN nbytes < 1073741824 THEN CAST(round(CAST(nbytes AS DOUBLE)/1048576, 1) AS VARCHAR) || ' MB'
             |       WHEN nbytes < 1099511627776 THEN CAST(round(CAST(nbytes AS DOUBLE)/1073741824, 1) AS VARCHAR) || ' GB'
             |       WHEN nbytes < 1125899906842624 THEN CAST(round(CAST(nbytes AS DOUBLE)/1099511627776, 1) AS VARCHAR) || ' TB'
             |       ELSE CAST(round(CAST(nbytes AS DOUBLE)/1125899906842624, 1) AS VARCHAR) || ' PB' END AS size_str
             |FROM b ORDER BY o_orderkey""".stripMargin)),

    // Date-suffix rule: append /yyyy-MM-dd unless already suffixed
    // (reference: job_utils.py:53-104). Every third dir is pre-suffixed to
    // exercise the no-op arm.
    ("q_date_suffix",
      (s: SparkSession, d: String) => {
        val preSuffixed = concat(lit("renders/"), col("o_orderpriority"),
          lit("/"), date_format(col("o_orderdate"), "yyyy-MM-dd"))
        val plain = concat(lit("renders/"), col("o_orderpriority"))
        val dir = when(col("o_orderkey") % 3 === 0, preSuffixed).otherwise(plain)
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            PathFunctions.withDateSuffix(dir, col("o_orderdate")).as("out_dir"))
          .orderBy("o_orderkey")
      },
      Some("""WITH dirs AS (
             |  SELECT o_orderkey, o_orderdate,
             |    CASE WHEN o_orderkey % 3 = 0
             |         THEN 'renders/' || o_orderpriority || '/' || strftime(o_orderdate, '%Y-%m-%d')
             |         ELSE 'renders/' || o_orderpriority END AS dir
             |  FROM orders)
             |SELECT o_orderkey,
             |  CASE WHEN regexp_matches(dir, '/[0-9]{4}-[0-9]{2}-[0-9]{2}$') THEN dir
             |       ELSE dir || '/' || strftime(o_orderdate, '%Y-%m-%d') END AS out_dir
             |FROM dirs ORDER BY o_orderkey""".stripMargin)),

    // JSON metadata extraction (reference: scene_registry.py:237, 249-251
    // metadata JSON columns).
    ("q_json_extract",
      (s: SparkSession, d: String) => {
        Tables.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Order-sensitive SHA-256 directory content hash: sort entries, fold,
    // hash (reference: scene_registry.py:608-644). Ordering made explicit
    // via sort_array / ORDER BY inside the aggregate.
    ("q_ordered_dirhash",
      (s: SparkSession, d: String) => {
        val entry = concat_ws(":",
          col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("long"))
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), entry.as("entry"))
          .groupBy("l_returnflag")
          .agg(sha2(concat_ws("|", sort_array(collect_list(col("entry")))), 256)
            .as("content_hash"),
            count(lit(1)).as("n_files"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  sha256(string_agg(
             |    CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || ':' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
             |    '|' ORDER BY CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || ':' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR))) AS content_hash,
             |  CAST(COUNT(*) AS BIGINT) AS n_files
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // snake_case→camelCase (reference: core/logger.py:10-14).
    ("q_snake_to_camel",
      (s: SparkSession, d: String) => {
        val snake = concat(lit("doc_"), col("lang"), lit("_"), col("source"))
        Tables.documents(s, d)
          .select(col("doc_id"), snake.as("snake"),
            PathFunctions.snakeToCamel(snake).as("camel"))
          .orderBy("doc_id")
      },
      Some("""WITH s AS (
             |  SELECT doc_id, 'doc_' || lang || '_' || source AS snake FROM documents)
             |SELECT doc_id, snake,
             |  string_split(snake, '_')[1] ||
             |  array_to_string(list_transform(string_split(snake, '_')[2:999],
             |    x -> upper(substr(x,1,1)) || substr(x,2)), '') AS camel
             |FROM s ORDER BY doc_id""".stripMargin))
  )
}

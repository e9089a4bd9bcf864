package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.Filters

/** Filter/predicate family (SURVEY.md §2.2 P1-P10). */
object FilterQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // P1 — case-insensitive substring exclusion list
    // (reference: scene_scanner.py:49-63).
    ("q_filter_exclusion",
      (s: SparkSession, d: String) => {
        Tables.part(s, d)
          .filter(Filters.excludeSubstrings(col("p_name"), Seq("red", "Ring", "BLUE")))
          .select("p_partkey", "p_name")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE lower(p_name) NOT LIKE '%red%'
             |  AND lower(p_name) NOT LIKE '%ring%'
             |  AND lower(p_name) NOT LIKE '%blue%'
             |ORDER BY p_partkey""".stripMargin)),

    // P2 — blacklist + underscore-prefix anti-filter
    // (reference: scene_scanner.py:96-117 system folders).
    ("q_system_folder_filter",
      (s: SparkSession, d: String) => {
        Tables.part(s, d)
          .filter(Filters.notSystemFolder(col("p_brand"), Seq("Brand#1", "Brand#7", "Brand#13")))
          .select("p_partkey", "p_brand")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_brand FROM part
             |WHERE p_brand NOT IN ('Brand#1','Brand#7','Brand#13')
             |  AND p_brand NOT LIKE '\_%' ESCAPE '\'
             |ORDER BY p_partkey""".stripMargin)),

    // P3 — fnmatch glob exclusion translated to anchored regexes
    // (reference: scene_copy.py:68-92).
    ("q_glob_exclusion",
      (s: SparkSession, d: String) => {
        Tables.part(s, d)
          .filter(Filters.excludeGlobs(col("p_name"), Seq("small *", "*widget", "red?gear")))
          .select("p_partkey", "p_name")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT regexp_matches(p_name, '^small .*$')
             |  AND NOT regexp_matches(p_name, '^.*widget$')
             |  AND NOT regexp_matches(p_name, '^red.gear$')
             |ORDER BY p_partkey""".stripMargin)),

    // P5/P6 — conjunctive bounds-validity + null-status filter
    // (reference: navmesh_injector.py:284-296; scene_registry.py:275-279).
    ("q_bounds_filter",
      (s: SparkSession, d: String) => {
        Tables.lineitem(s, d)
          .filter(Filters.validBounds(col("l_quantity"), 5.0, 45.0)
            && col("l_discount") > 0.0 && col("l_shipdate").isNotNull)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
             |WHERE l_quantity >= 5.0 AND l_quantity <= 45.0
             |  AND l_discount > 0.0 AND l_shipdate IS NOT NULL
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // P10 — search with exact-match-first fallback to substring
    // (reference: scene_download.py:169-212). Term has no exact hit, so
    // the fallback path is exercised.
    ("q_search_fallback",
      (s: SparkSession, d: String) => {
        Filters.searchWithFallback(Tables.customer(s, d), "c_name", "er#00000014")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""WITH hits AS (SELECT max(CASE WHEN lower(c_name) = 'er#00000014' THEN 1 ELSE 0 END) AS he FROM customer)
             |SELECT c_custkey, c_name FROM customer, hits
             |WHERE CASE WHEN he = 1 THEN lower(c_name) = 'er#00000014'
             |           ELSE contains(lower(c_name), 'er#00000014') END
             |ORDER BY c_custkey""".stripMargin))
  )
}

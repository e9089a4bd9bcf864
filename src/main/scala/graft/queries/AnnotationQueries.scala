package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** J7 status annotation, W1 index assignment, and the Spark SQL surface. */
object AnnotationQueries extends QueryFamily {

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // J7 — multi-source status annotation: local scan LEFT JOIN registry
    // LEFT JOIN catalog → concat_ws status tags
    // (reference: scene_scanner.py:242-309 "SQLite✓ / scenes.json✓").
    ("q_status_annotation",
      (s: SparkSession, d: String) => {
        val local = Tables.customer(s, d).select("c_custkey", "c_name")
        val registry = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")).distinct()
          .withColumn("in_registry", lit(1))
        val catalog = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey")).distinct()
          .withColumn("in_catalog", lit(1))
        local.join(registry, Seq("c_custkey"), "left")
          .join(catalog, Seq("c_custkey"), "left")
          .withColumn("status", concat_ws("/",
            when(col("in_registry") === 1, "registry"),
            when(col("in_catalog") === 1, "catalog")))
          .withColumn("status",
            when(col("status") === "", "local-only").otherwise(col("status")))
          .select("c_custkey", "c_name", "status")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name,
             |  CASE WHEN concat_ws('/',
             |      CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') THEN 'registry' END,
             |      CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O') THEN 'catalog' END) = ''
             |    THEN 'local-only'
             |    ELSE concat_ws('/',
             |      CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') THEN 'registry' END,
             |      CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O') THEN 'catalog' END)
             |  END AS status
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // W1/A13 — next-index assignment: continue numbering from the
    // existing max suffix per group (reference: worker_create.py:175-194,
    // 324-325).
    ("q_next_index",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val existingMax = Tables.customer(s, d)
          .groupBy("c_mktsegment")
          .agg(max(regexp_extract(col("c_name"), "(\\d+)$", 1).cast("long")).as("start_idx"))
        val newItems = Tables.supplier(s, d).join(Tables.nation(s, d),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"),
            element_at(array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
              lit("HOUSEHOLD"), lit("MACHINERY")),
              (col("s_suppkey") % 5 + 1).cast("int")).as("c_mktsegment"))
        val w = Window.partitionBy("c_mktsegment").orderBy("s_name")
        newItems.join(existingMax, Seq("c_mktsegment"))
          .withColumn("assigned_idx", col("start_idx") + row_number().over(w))
          .select("c_mktsegment", "s_name", "assigned_idx")
          .orderBy("c_mktsegment", "s_name")
      },
      Some("""WITH em AS (
             |  SELECT c_mktsegment,
             |    max(CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)) AS start_idx
             |  FROM customer GROUP BY c_mktsegment),
             |ni AS (
             |  SELECT s_name,
             |    (['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'])[CAST(s_suppkey % 5 + 1 AS INT)] AS c_mktsegment
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
             |SELECT ni.c_mktsegment, s_name,
             |  start_idx + row_number() OVER (PARTITION BY ni.c_mktsegment ORDER BY s_name) AS assigned_idx
             |FROM ni JOIN em ON ni.c_mktsegment = em.c_mktsegment
             |ORDER BY ni.c_mktsegment, s_name""".stripMargin)),

    // Spark SQL surface: the same engine drives plain SQL over registered
    // temp views (BASELINE: "DataFrame transformations + Spark SQL").
    ("q_sql_surface",
      (s: SparkSession, d: String) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        Tables.customer(s, d).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT c_mktsegment,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders_v JOIN customer_v ON o_custkey = c_custkey
          WHERE o_orderstatus <> 'P'
          GROUP BY c_mktsegment
          ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment,
             |  CAST(COUNT(*) AS BIGINT) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderstatus <> 'P'
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // The native Catalyst expressions through the SQL surface: graft_dot /
    // graft_dist_sq are injected by GraftExtensions and callable from
    // plain Spark SQL; the oracle reproduces the same sequential folds.
    ("q_native_fn_sql",
      (s: SparkSession, d: String) => {
        Tables.embeddings(s, d).createOrReplaceTempView("embeddings_v")
        s.sql("""
          SELECT vec_id,
                 graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS self_dot,
                 graft_dist_sq(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS self_dist
          FROM embeddings_v
          ORDER BY vec_id""")
      },
      Some("""SELECT vec_id,
             |  list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b) AS self_dot,
             |  0.0 AS self_dist
             |FROM embeddings ORDER BY vec_id""".stripMargin))
  )
}

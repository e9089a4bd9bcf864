package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` assembles every verified operator family; each entry has a
  * DuckDB oracle in `oracleSql` when the semantics are ANSI-SQL
  * expressible (sequential recurrences, LSH, etc. get rows-only checks +
  * ScalaTest property coverage instead).
  */
object SparkEntry {

  private[graft] val families: Seq[QueryFamily] = Seq(
    CatalogQueries,
    FilterQueries,
    SpatialQueries,
    WindowQueries,
    JoinQueries,
    ScalarFuncQueries,
    LlmQueries,
    TrajectoryQueries,
    StreamingQueries,
    SourceQueries,
    MiscQueries,
    AnnotationQueries,
    ScaleQueries,
    CurationQueries,
    EvalQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary rollup over the full FK chain — exercises scan →
    * broadcast joins → hash aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val ord = spark.read.parquet(s"$d/orders.parquet")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_.oracle).toMap
}

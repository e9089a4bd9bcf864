package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{BloomPrune, ZOrder}

/** Physical-layout / scan-reduction utilities (100 TB posture): bloom
  * semi-join reduction and z-order multi-dimensional layout. Both are
  * EXACT — the bloom's false positives die in the join and the z-value is
  * integer arithmetic — so both get full DuckDB oracles.
  */
object ScaleQueries extends QueryFamily {

  private val zBits = 10

  def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // Bloom-pruned join: lineitem reduced by a sketch of the selectively
    // filtered orders keys BEFORE the join shuffle. The oracle is the
    // PLAIN join — identical results is the operator's contract.
    ("q_bloom_prune",
      (s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag")
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            pmod(col("o_orderkey"), lit(7)) === 0)
          .select("o_orderkey")
        BloomPrune.prunedJoin(li, urgent, "l_orderkey", "o_orderkey",
            expectedItems = 1L << 16)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            Det.moneySum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  ${Det.moneySumSql("l_quantity")} AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Z-order layout audit: per z-range bucket, the bounding box of BOTH
    // dimensions — the quantity min/max file skipping would consult. The
    // identical interleave formula runs in DuckDB (ZOrder.zValueSql), so
    // the whole layout computation is hash-verified.
    ("q_zorder_layout",
      (s: SparkSession, d: String) => {
        val mask = (1L << zBits) - 1
        val li = Tables.lineitem(s, d).select(
          col("l_partkey").bitwiseAND(lit(mask)).as("x"),
          col("l_suppkey").bitwiseAND(lit(mask)).as("y"))
        li.withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), zBits))
          .groupBy(shiftright(col("z"), 14).as("z_bucket"))
          .agg(count(lit(1)).as("n_rows"),
            min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"))
          .orderBy("z_bucket")
      },
      Some(s"""WITH zv AS (
             |  SELECT (l_partkey & 1023) AS x, (l_suppkey & 1023) AS y,
             |    ${ZOrder.zValueSql(Seq("l_partkey", "l_suppkey"), zBits)} AS z
             |  FROM lineitem)
             |SELECT (z >> 14) AS z_bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  min(x) AS min_x, max(x) AS max_x,
             |  min(y) AS min_y, max(y) AS max_y
             |FROM zv GROUP BY 1 ORDER BY z_bucket""".stripMargin))
  )
}

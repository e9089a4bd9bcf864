package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve layout: interleave the bits of k dimension
  * columns into one sort key so that rows close in ALL dimensions land in
  * the same range partition / file.
  *
  * Why this matters at 100 TB: parquet min/max (and any range-partitioned
  * layout) can only skip data along the ONE dimension the data is sorted
  * by. A catalog scanned by both `l_partkey` and `l_suppkey` predicates
  * sorted by `l_partkey` reads everything for a supplier query. Sorting by
  * the interleaved z-value bounds BOTH dimensions per file, so either
  * predicate prunes — the same idea behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY` (reference analog: the asset registry's per-map/per-kind
  * directory layout, scene_scanner.py's two-axis lookup).
  *
  * The z-value is pure column arithmetic (shift/mask/or on longs) — every
  * term is a codegen'd builtin, there is no UDF, and the identical integer
  * formula is expressible in ANSI SQL for the oracle
  * ([[ZOrder.zValueSql]] renders it).
  */
object ZOrder {

  /** Interleaved z-value of `cols`, taking the low `bits` bits of each.
    * Bit `b` of dimension `d` (of `k`) lands at output bit `b*k + d`.
    * Columns are masked to `bits` (callers pass non-negative bucketed
    * coordinates; mask makes the expression total). Max 63 output bits.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, "z-order needs at least two dimensions")
    require(bits * k <= 63, s"bits=$bits over $k dims exceeds a long")
    val masked = cols.map(c => c.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    val terms = for {
      b <- 0 until bits
      (c, d) <- masked.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same z-value as ANSI SQL over column-expression strings —
    * verbatim integer arithmetic, so Spark and DuckDB agree bit-for-bit.
    */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    val mask = (1L << bits) - 1
    val terms = for {
      b <- 0 until bits
      (c, d) <- cols.zipWithIndex
    } yield s"((((CAST($c AS BIGINT) & $mask) >> $b) & 1) << ${b * k + d})"
    terms.mkString("(", " | ", ")")
  }

  /** Range-partition by z-value — the write-side layout step. Each output
    * partition (→ file, with a per-partition sort) covers a contiguous
    * z-range, i.e. a bounded box in every dimension, which is what makes
    * min/max skipping effective on all of them.
    */
  def repartitionByZ(df: DataFrame, dims: Seq[String], bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue(dims.map(col), bits)
    df.repartitionByRange(numPartitions, z)
      .sortWithinPartitions(z)
  }
}

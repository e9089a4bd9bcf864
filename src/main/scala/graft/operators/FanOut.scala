package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for pairwise (nested-loop / theta-join) operators.
  *
  * A broadcast nested-loop join parallelizes only over the streamed side's
  * partitions. A catalog-sized input read from one small parquet file
  * arrives as ONE partition, so an all-pairs comparison that should fan out
  * across the cluster runs as a single task. Repartitioning the streamed
  * side up to the cluster's default parallelism fixes that; inputs that
  * already have enough partitions (the 100 TB case) pass through untouched,
  * so this never *shrinks* a large scan.
  */
object FanOut {

  /** Repartition `df` to the session's default parallelism unless it
    * already has at least that many partitions. Row-set identical — only
    * the physical layout changes. */
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}

package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning over a file inventory — the lakehouse
  * maintenance pass that turns [[graft.sources.Sources.fsInventory]]
  * listings into rewrite jobs. A table that ingests streaming
  * micro-batches accretes thousands of KB-scale files per partition;
  * scan cost is then dominated by per-file open overhead, and the fix
  * is periodic bin-packed rewrite toward a target file size.
  *
  * Deterministic contiguous packing: within each directory, files are
  * ordered (size desc, then name — biggest first minimizes bin count
  * for heavy-tailed size distributions and pins ties), and a file
  * starts the bin its cumulative start offset falls in
  * (`floor(cum_before / target)`). One window shuffle on the directory
  * key; no driver-side loop — at 100 TB the inventory itself is a big
  * table. Files larger than the target occupy (and close) their own
  * bins by construction.
  */
object Compaction {

  /** Per-file bin assignment: adds `bin` (0-based within directory). */
  def assignBins(files: DataFrame, dirCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0)
    val w = Window.partitionBy(col(dirCol))
      .orderBy(col(sizeCol).desc, col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("_cum", sum(col(sizeCol)).over(w))
      .withColumn("bin", floor((col("_cum") - col(sizeCol)) / targetBytes))
      .drop("_cum")
  }

  /** Compaction job summary: one row per (directory, bin) with file
    * count and byte total — the unit of rewrite work. */
  def planBins(files: DataFrame, dirCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame =
    assignBins(files, dirCol, fileCol, sizeCol, targetBytes)
      .groupBy(col(dirCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("bytes"))
}

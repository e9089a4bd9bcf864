package graft.llmops

import org.apache.spark.sql.SparkSession

/** Atomic segment publication for the registry family
  * ([[SparseSim.Bm25Index]], [[Similarity.IvfIndex]],
  * [[Pipelines.CurationRegistry]]): every stored segment is a multi-table
  * parquet dir written SEQUENTIALLY (data first, stats derived from the
  * written data), so a crash or retried ingest mid-write would otherwise
  * leave new data beside stale stats — a segment the watermark guards can
  * still pass and the open paths would serve with silently wrong
  * statistics. Publication is therefore all-or-nothing at the dir level:
  * the tables land in a temp sibling and ONE rename publishes them.
  * The rename is atomic on local filesystems and HDFS; on object stores
  * it degrades to copy, where the temp dir still confines a partial
  * write to a non-served path.
  */
private[graft] object SegmentIO {

  /** Run `write` against a temp sibling of `dir`, then publish it as
    * `dir` via delete + rename. */
  def publish(spark: SparkSession, dir: String)(write: String => Unit): Unit = {
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "._tmp_write")
    fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(target, true)
    if (!fs.rename(tmp, target))
      sys.error(s"SegmentIO.publish: failed to publish $tmp -> $target")
  }

  /** Best-effort canonical form for self-overwrite guards: resolves
    * '.'/'..'/symlinks for local paths, falls back to the raw string for
    * URIs the local File API can't resolve (hdfs://, s3a:// — where
    * aliasing via symlinks doesn't exist anyway). */
  def canonicalPath(p: String): String =
    try new java.io.File(p).getCanonicalPath
    catch { case _: Exception => p }
}

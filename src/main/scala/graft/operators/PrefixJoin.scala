package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J2 — sequence→map resolution (reference: render_engine.py:87-158;
  * run_render_job_headless.py:95-127): strip the trailing `_NNN` index
  * from a sequence name, then match map names by exact equality first,
  * else by prefix (`pattern.startswith(map_name)`).
  *
  * Physical plan: the equality arm is a plain hash join; the prefix arm is
  * a theta join that Spark executes as BroadcastNestedLoopJoin — correct
  * here because the map side is catalog-sized (380 rows in the reference).
  * Both arms union, and a deterministic rank picks one match per sequence:
  * exact beats prefix, then longest map name, then lexicographic.
  */
object PrefixJoin {

  /** @return seqs columns + matched `mapName` column + `match_kind`
    *         ("exact" | "prefix"); unmatched sequences are kept with nulls
    *         (the reference logs them — J1's anti-join diagnostic). */
  def resolveSequenceToMap(
      seqs: DataFrame, maps: DataFrame,
      seqNameCol: String, mapNameCol: String): DataFrame = {
    val stripped = regexp_replace(col(seqNameCol), "[_-]?\\d+$", "")
    val s = seqs.withColumn("_stripped", stripped)

    val exact = s.join(maps, col("_stripped") === col(mapNameCol))
      .withColumn("_kind", lit("exact"))
    val prefix = s.join(broadcast(maps),
        col("_stripped").startsWith(col(mapNameCol)) &&
          col("_stripped") =!= col(mapNameCol))
      .withColumn("_kind", lit("prefix"))

    val matched = exact.unionByName(prefix)
    val w = Window.partitionBy(col(seqNameCol)).orderBy(
      when(col("_kind") === "exact", 0).otherwise(1).asc,
      length(col(mapNameCol)).desc, col(mapNameCol).asc)
    val best = matched.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_stripped")
      .withColumnRenamed("_kind", "match_kind")

    val unmatched = s.join(matched.select(seqNameCol).distinct(), Seq(seqNameCol), "left_anti")
      .drop("_stripped")
      .withColumn(mapNameCol, lit(null).cast("string"))
      .withColumn("match_kind", lit(null).cast("string"))
    best.unionByName(unmatched, allowMissingColumns = true)
  }
}

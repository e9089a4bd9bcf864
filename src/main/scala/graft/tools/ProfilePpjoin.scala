package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perf tool: measures the prefix-filter economics behind
  * [[graft.llmops.Dedup.prefixFilteredJaccard]] — full inverted-index
  * size vs the τ-prefix index, candidate pairs vs the full index's pair
  * volume, and the verified output — the numbers the operator's
  * "candidate volume is Σ p(s)² over prefix occurrences" claim rests on.
  * runMain graft.tools.ProfilePpjoin [sfDir] [tau]
  */
object ProfilePpjoin {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/tmp/stress_sf"
    val tau = if (args.length > 1) args(1).toDouble else 0.3
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ppjoin] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val docs = graft.model.Tables.documents(spark, d)
    // full inverted index: every (doc, distinct-shingle) posting
    val inst = graft.llmops.Dedup.shingles(docs, "doc_id", "text", 3)
      .localCheckpoint(true)
    val fullRows = inst.count()
    println(s"[ppjoin] full index rows = $fullRows")
    // full-index pair volume Σ df·(df−1)/2 — what a prefix-less inverted
    // index (containment-style without the maxDf cut) would generate
    val fullPairs = inst.groupBy("shingle").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1))).head().getLong(0) / 2
    println(s"[ppjoin] full index pair volume = $fullPairs")

    // the operator's own prefix index (same construction as the operator:
    // ascending (df, shingle), keep sz − ⌈τ·sz⌉ + 1)
    val dfc = inst.groupBy("shingle").agg(count(lit(1)).as("_dfc"))
    val prefixLen = (col("_sz") - ceil(lit(tau) * col("_sz")) + 1).cast("int")
    val prefix = inst.join(dfc, Seq("shingle"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("_dfc"), col("shingle")))).as("_ord"))
      .select(col("doc_id"), size(col("_ord")).cast("long").as("_sz"), col("_ord"))
      .select(col("doc_id"), col("_sz"),
        explode(transform(slice(col("_ord"), lit(1), prefixLen),
          s => s.getField("shingle"))).as("shingle"))
      .localCheckpoint(true)
    val prefixRows = prefix.count()
    println(f"[ppjoin] prefix index rows = $prefixRows (${100.0 * prefixRows / fullRows}%.1f%% of full)")
    val a = prefix.select(col("shingle"), col("doc_id").as("id_a"), col("_sz").as("_la"))
    val b = prefix.select(col("shingle"), col("doc_id").as("id_b"), col("_sz").as("_lb"))
    val cand = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b") &&
        least(col("_la"), col("_lb")).cast("double") >=
          lit(tau) * greatest(col("_la"), col("_lb")).cast("double"))
      .select("id_a", "id_b").distinct()
    val candPairs = time("candidate gen")(cand.count())
    println(f"[ppjoin] candidate pairs = $candPairs (${100.0 * candPairs / math.max(fullPairs, 1L)}%.2f%% of full pair volume)")

    time("full operator") {
      val out = graft.llmops.Dedup.prefixFilteredJaccard(docs, "doc_id", "text", 3, tau)
      println(s"[ppjoin] verified pairs = ${out.count()}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stress-fixture generator: replicates the sf0.1 driver fixture N× with
  * re-keyed ids, so the expensive plans can be MEASURED at real shuffle
  * sizes instead of audited at 17 MB (where everything fits in one task).
  *
  * Re-keying preserves the statistical shape that matters per table —
  * naive row duplication would measure synthetic pathologies, not scale:
  *  - lineitem/orders: orderkey + rep·STRIDE. Join fan-in per key and
  *    group sizes stay constant; row count scales — how a TPC-H-ish
  *    workload actually grows.
  *  - events: event_id/user_id + rep·STRIDE. MORE users with the same
  *    per-user series length: sessionize/window partition COUNT scales,
  *    partition size doesn't — how an event log actually grows.
  *  - documents: doc_id re-keyed AND ~40% of tokens per replica rewritten
  *    from a replica-keyed vocabulary. Pure duplication would make every
  *    doc a planted near-dup group of size N, and the minhash/simhash
  *    verify joins would measure an N² pair explosion that says nothing
  *    about normal operation. Replica 0 keeps the original text, so the
  *    fixture's own dup structure is still present once.
  *  - embeddings: vec_id re-keyed, per-(vec, rep, dim) deterministic noise
  *    decorrelates cross-replica cosines. Replica 0 unchanged.
  *
  * Usage: runMain graft.tools.ScaleFixture [reps=64] [outDir] [srcDir]
  */
object ScaleFixture {

  /** Larger than any source id, so re-keyed ids never collide. */
  val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 64
    val outDir = if (args.length > 1) args(1) else "/tmp/stress_sf"
    val srcDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-scale-fixture").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")

    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scale] wrote $t")
    }

    /** Replicate `df` reps× and shift `keys` by rep·Stride; every other
      * column passes through. */
    def replicated(df: DataFrame, keys: String*): DataFrame = {
      val cols = df.columns.toSeq
      df.crossJoin(broadcast(spark.range(reps).toDF("rep")))
        .select(cols.map(c =>
          if (keys.contains(c)) (col(c) + col("rep") * Stride).as(c)
          else col(c)): _*)
    }

    // dimension tables stay dimension-sized at any scale — copied as-is
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(src(t), t))

    write(replicated(src("lineitem"), "l_orderkey"), "lineitem")
    write(replicated(src("orders"), "o_orderkey"), "orders")
    write(replicated(src("events"), "event_id", "user_id"), "events")

    val docs = src("documents")
      .crossJoin(broadcast(spark.range(reps).toDF("rep")))
    // replica r>0: ~40% of tokens rewritten (pmod handles negative hash),
    // dropping cross-replica Jaccard to ~0.4 — below near-dup thresholds
    val perturbedText = when(col("rep") === 0, col("text")).otherwise(
      array_join(transform(split(col("text"), " "), t =>
        when(pmod(hash(t, col("rep")), lit(5)) < 2,
          concat(lit("w"), pmod(hash(t, col("rep"), lit(1)), lit(50000))))
          .otherwise(t)), " "))
    write(docs.select(
      (col("doc_id") + col("rep") * Stride).as("doc_id"),
      perturbedText.as("text"),
      col("lang"), col("source"),
      length(perturbedText).cast("long").as("n_chars")), "documents")

    val emb = src("embeddings")
      .crossJoin(broadcast(spark.range(reps).toDF("rep")))
    // ±0.15-ish per-dim noise keyed on (vec, rep, dim): cross-replica
    // cosine drops well below dedup thresholds while the value range stays
    // comparable (grid/LSH bucket geometry is exercised, not distorted)
    val noisy = when(col("rep") === 0, col("embedding")).otherwise(
      transform(col("embedding"), (x, i) =>
        x + (pmod(col("rep") * 31 + i * 17 + col("vec_id") * 13, lit(7)) - 3)
          .cast("double") * 0.05).cast("array<float>"))
    write(emb.select(
      (col("vec_id") + col("rep") * Stride).as("vec_id"),
      noisy.as("embedding"), col("label")), "embeddings")

    println(s"[scale] done: ${reps}x $srcDir -> $outDir")
    spark.stop()
  }
}

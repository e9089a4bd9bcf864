package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup
import graft.model.Tables

/** Perf tool: stage-by-stage profiler for the MinHash pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("warmup")(docs.write.format("noop").mode("overwrite").save())

    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets (map-side)")(
      sets.write.format("noop").mode("overwrite").save())
    val sigs = Dedup.minhashSignatureArray(sets, "doc_id", 16)
    time("signatures (projection)")(
      sigs.write.format("noop").mode("overwrite").save())
    val cands = Dedup.lshCandidates(sigs, "doc_id", 16, 4)
    time("candidates")(cands.write.format("noop").mode("overwrite").save())
    val sigsP = sigs.persist()
    time("sigs persist")(sigsP.write.format("noop").mode("overwrite").save())
    time("candidates from persisted sigs")(
      Dedup.lshCandidates(sigsP, "doc_id", 16, 4)
        .write.format("noop").mode("overwrite").save())
    sigsP.unpersist()
    time("full pipeline (fresh)")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.8)
        .write.format("noop").mode("overwrite").save())
    time("full pipeline (2nd run)")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.8)
        .write.format("noop").mode("overwrite").save())

    // stage split of the full pipeline: candidate materialization
    // (localCheckpoint, eager) vs the verification joins
    val sets2 = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .filter(size(col("shingles")) > 0)
    val sigs2 = Dedup.minhashSignatureArray(sets2, "doc_id", 16)
    val cands2 = time("cands localCheckpoint (eager)")(
      Dedup.lshCandidates(sigs2, "doc_id", 16, 4).localCheckpoint(true))
    println(s"[prof] candidate pairs: ${cands2.count()}")
    val candIds2 = cands2.select(col("id_a").as("doc_id"))
      .union(cands2.select(col("id_b").as("doc_id"))).distinct()
    println(s"[prof] candidate ids: ${candIds2.count()}")
    val docsRel = docs.join(broadcast(candIds2), Seq("doc_id"), "left_semi")
    val shRel = Dedup.shingles(docsRel, "doc_id", "text", 3)
    time("verify joins only")(
      Dedup.jaccardForPairs(cands2, shRel, "doc_id")
        .filter(col("jaccard") >= 0.8)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

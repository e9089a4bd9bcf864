package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup
import graft.model.Tables

/** Perf tool: stage-level profile of the banded simhash pair search. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }

    val docs = Tables.documents(spark, sfDir)
    time("tokenHashHalves only") {
      docs.select(sum(size(Dedup.tokenHashHalves(col("text"))))).collect()(0).getLong(0)
    }
    time("signatures (native)") {
      Dedup.simhashSignatures(docs, "doc_id", "text")
        .agg(expr("bit_xor(sig)")).collect()(0).getLong(0)
    }
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
    time("banding+verify from signatures") {
      Dedup.simhashBandedPairs(sigs, "doc_id", maxHamming = 6, numChunks = 7).count()
    }
    spark.stop()
  }
}

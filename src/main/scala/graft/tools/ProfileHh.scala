package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perf tool: stage-by-stage dissection of the heavy-hitters pipeline
  * (explode cost / vocabulary size / sketch pass / full two-pass) —
  * this is the harness that caught the split-re-inlining 18× (see
  * [[graft.llmops.Dedup.ngramArray]]'s scaladoc).
  * runMain graft.tools.ProfileHh [sfDir]
  */
object ProfileHh {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/tmp/stress_sf"
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hh] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val docs = graft.model.Tables.documents(spark, d)
    val items = docs.select(explode(graft.llmops.Dedup.ngramArray(col("text"), 3)).as("item"))
    println(s"[hh] items partitions: ${items.rdd.getNumPartitions}")
    time("explode+count")(println("[hh] n=" + items.count()))
    time("distinct vocab")(println("[hh] vocab=" + items.distinct().count()))
    val sketch = time("sketch pass (mapPartitions MG k=5000)") {
      val sk = items.as[String]
        .mapPartitions(p => graft.llmops.HeavyHitters.misraGries(p, 5000))
        .toDF("item", "cnt")
      println("[hh] sketch rows=" + sk.count())
      sk
    }
    time("full heavyHitters") {
      val out = graft.llmops.HeavyHitters.heavyHitters(docs,
        graft.llmops.Dedup.ngramArray(col("text"), 3), 0.0002)
      println("[hh] hh rows=" + out.count())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump one gate query's AQE-final formatted plan —
  * `runMain graft.tools.ExplainOne <name> [sfDir]`. Complements
  * [[graft.ProfileOne]] (timing) with the plan the timing bought. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}

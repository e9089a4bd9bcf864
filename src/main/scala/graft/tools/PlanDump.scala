package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write one declared query's `explain("formatted")` output to
  * a file — `runMain graft.tools.PlanDump <name> <outFile> [sfDir]`.
  * The plan is captured AFTER one execution so AQE's final shape (join
  * strategy rewrites, coalesced reads) is what lands in the file; the
  * initial (pre-execution) formatted plan is appended for the
  * PushedFilters/ReadSchema detail the adaptive dump elides. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val out = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val sb = new StringBuilder
    sb.append(s"== $name  (sf: $sfDir, AQE-final after one execution) ==\n")
    sb.append(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).toAbsolutePath.getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.result())
    println(s"[plandump] wrote $out")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Perf tool: operator-level metric breakdown for one declared query —
  * `runMain graft.tools.StageProfile <name> [sfDir] [reps]`.
  *
  * Runs the query through the same noop-sink action as the bench, then
  * walks the AQE-final executed plan and prints every operator with its
  * populated SQLMetrics (codegen durations, exchange bytes/rows, hash
  * build times, spill). This is the guide-§7.2 "where is the time"
  * evidence local mode can't get from a UI (spark.ui.enabled=false in
  * every harness main). */
object StageProfile {

  private def fmt(v: Long, tpe: String): String = tpe match {
    case "timing" => f"${v / 1e3}%.2f s"
    case "nsTiming" => f"${v / 1e9}%.2f s"
    case "size" => f"${v / 1e6}%.1f MB"
    case _ => v.toString
  }

  private def walk(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
    val ms = p.metrics.toSeq
      .filter { case (_, m) => m.value > 0 }
      .sortBy(_._1)
      .map { case (k, m) => s"$k=${fmt(m.value, m.metricType)}" }
      .mkString(", ")
    sb.append("  " * depth).append(p.nodeName)
    if (ms.nonEmpty) sb.append("  [").append(ms).append("]")
    sb.append('\n')
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1, sb)
      case q: QueryStageExec => walk(q.plan, depth + 1, sb)
      case _ => p.children.foreach(walk(_, depth + 1, sb))
    }
    p.subqueries.foreach(walk(_, depth + 1, sb))
  }

  /** Stage-level tap: (callsite name, wall ms, Σ executor run ms, tasks)
    * per completed stage — the only attribution that sees work done in
    * eager localCheckpoints during query CONSTRUCTION, which never
    * appears in the returned DataFrame's plan. */
  private final class StageTap extends org.apache.spark.scheduler.SparkListener {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Int)]
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val wall = (for (a <- i.completionTime; b <- i.submissionTime)
        yield a - b).getOrElse(0L)
      rows.add((i.name.takeWhile(_ != '\n'), wall,
        i.taskMetrics.executorRunTime, i.numTasks))
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    var df: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to reps) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // clock starts BEFORE construction: iterative operators do their
      // real work in eager localCheckpoints at build time (the bench
      // times construction + action the same way)
      val t0 = System.nanoTime()
      df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // metrics rep: foreachPartition executes through the df's OWN
    // QueryExecution (a noop write would wrap it in a fresh write plan
    // and strand the metrics there); row deserialization at the sink
    // boundary is billed to this rep but not to any operator metric
    val tap = new StageTap
    spark.sparkContext.addSparkListener(tap)
    val t0 = System.nanoTime()
    df = fn(spark, sfDir)
    // executes THIS queryExecution's plan (Dataset.foreachPartition goes
    // through the separate rddQueryExecution and would leave these
    // metrics empty/initial)
    df.queryExecution.toRdd.foreachPartition(_ => ())
    println(f"[prof] $name metrics rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // listener events are posted async — give the bus a moment to drain
    // (listenerBus.waitUntilEmpty is private[spark]; a bounded sleep is
    // enough for a dev tool)
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    val stages = tap.rows.asScala.toSeq.sortBy(-_._2)
    println(s"[prof] top stages of the metrics rep (wall ms | exec ms | tasks | site):")
    stages.take(20).foreach { case (n, w, e, t) =>
      println(f"[stage] $w%6d | $e%7d | $t%4d | $n")
    }
    val sb = new StringBuilder
    walk(df.queryExecution.executedPlan, 0, sb)
    println(sb.result())
    spark.stop()
  }
}

package graft

import java.util.concurrent.{ExecutionException, FutureTask, TimeUnit, TimeoutException}

import org.apache.spark.sql.SparkSession

/** Timeboxed execution of one Spark action: run `body` in a tagged job
  * group and cancel the group's jobs if it overruns.
  *
  * Why the harness needs this: Verify and Bench process ~100 queries
  * sequentially, so ONE pathological query (a plan regression that goes
  * quadratic, a source that blocks) doesn't just lose its own result — it
  * eats the driver's whole time budget and voids every artifact after it.
  * With the timebox, an overrun is one red row like any other failure.
  */
object Timebox {

  /** Default per-query budget (seconds); generous vs the slowest healthy
    * query (~3 s at sf0.1) while still bounding a wedged one. */
  def defaultSeconds: Long =
    sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong

  def run[T](spark: SparkSession, tag: String, seconds: Long)(body: => T): T = {
    val task = new FutureTask[T](() => {
      // job group is thread-local — set it on the thread running the action
      spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = true)
      try body finally spark.sparkContext.clearJobGroup()
    })
    val t = new Thread(task, s"timebox-$tag")
    t.setDaemon(true) // a cancelled straggler must not block JVM exit
    t.start()
    try task.get(seconds, TimeUnit.SECONDS)
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(tag)
        // cancelJobGroup is async: without a bounded join, the abandoned
        // worker can commit parquet AFTER the caller scrubs the output dir
        // (a timed-out query would then look green), or its straggler jobs
        // overlap the next query's run and skew Bench timings. Give the
        // cancellation a grace window to actually land; if the worker is
        // truly wedged past it, the caller's _FAILED marker still makes the
        // gate treat any late-committed files as a hard fail.
        t.join(TimeUnit.SECONDS.toMillis(graceSeconds))
        if (t.isAlive)
          System.err.println(
            s"[timebox] $tag worker still alive ${graceSeconds}s after cancel — relying on _FAILED marker")
        throw new TimeoutException(s"$tag exceeded ${seconds}s — jobs cancelled")
      case e: ExecutionException => throw e.getCause
    }
  }

  /** How long to wait for a cancelled worker to actually die before moving
    * on. Cancellation normally lands in milliseconds; 30 s covers a task
    * stuck in non-interruptible I/O without eating the harness budget. */
  def graceSeconds: Long =
    sys.env.getOrElse("SPARK_GRAFT_CANCEL_GRACE_SEC", "30").toLong
}

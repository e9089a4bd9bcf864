package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  *
  * Results are materialized through the `noop` sink — `.count()` would let
  * Catalyst prune every computed column (a sha2/minhash query would
  * benchmark as a row count); noop executes the full plan and discards
  * rows, which is the honest cost.
  */
object Bench {

  /** Session-global task-metrics tap: per-query shuffle-spill deltas.
    * Task-end events are the only place executor spill is visible in
    * local mode; the bench snapshots the counters around each query. */
  private final class SpillTap extends org.apache.spark.scheduler.SparkListener {
    val mem = new java.util.concurrent.atomic.AtomicLong
    val disk = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        mem.addAndGet(m.memoryBytesSpilled)
        disk.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  /** Locale-pinned decimal formatting: the f-interpolator uses the JVM
    * default locale, which on a comma-decimal locale emits `0,12` —
    * invalid JSON in the artifact. Every number in the JSON line goes
    * through here (or Double.toString, which is locale-independent). */
  private def num(x: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(x))

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  private def heapPools = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spillTap = new SpillTap
    spark.sparkContext.addSparkListener(spillTap)
    // Warm-up so JVM/codegen startup isn't billed to the measured run:
    // every query executes once against the SMALLEST scale factor first.
    // Plan shapes are identical across SFs, so this primes Spark's
    // generated-code cache (keyed by generated source) and lets C2
    // compile the hot loops; the timed pass then measures data cost, not
    // JIT. Warm-up failures are ignored — the measured loop reports them.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.foreach { case (name, fn) =>
        // timeboxed tighter than the measured loop: warm-up is sf0.001,
        // where any healthy query finishes in well under a minute
        try Timebox.run(spark, s"warmup-$name", 120) {
          fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        }
        catch { case _: Throwable => () }
      }
    }
    // Each query is timed `reps` times and reported as the MEDIAN, with
    // the SQL cache cleared between queries — one sample conflated a
    // neighbor's leaked state with the query under test in r1
    // (q_salted_join: 35 s sampled vs 2.5 s isolated). A rep that throws
    // contributes NO timing (r3/r4 reported ~0.06 s time-to-exception as
    // "results" for 16 broken queries); such queries emit null plus an
    // entry in `errors`. Sub-second queries get extra reps: the r3→r4
    // identical-binary comparison showed up to 2.9× shared-machine noise
    // on short queries, so the median needs more samples there.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val fastReps = math.max(reps, 5)
    val metrics = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      // Release prior queries' localCheckpoint blocks NOW instead of
      // waiting for ContextCleaner GC: checkpoint blocks are unevictable
      // (no lineage), and letting them accumulate across the session
      // inflated later memory-hungry queries 3-5× (q_record_linkage
      // benched 37-51 s vs 10.2 s isolated before this line).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // ContextCleaner drops dead broadcasts/shuffle files only when the
      // driver GC collects their handles — a bench session that never
      // full-GCs accumulates ~500 query executions' worth of
      // TorrentBroadcast blocks in storage memory and shuffle files on
      // disk, which is exactly the slow-creep pressure that inflated the
      // r6 driver run uniformly. One explicit GC per query keeps each
      // measurement starting from a clean session (costs ~10s over the
      // whole bench; the reps it protects cost minutes).
      System.gc()
      // Per-query observability: GC time, shuffle spill, and peak heap,
      // snapshotted around the reps — so an environmental episode (heap
      // starvation, contention) is visible IN the artifact instead of
      // indistinguishable from a plan regression.
      val gc0 = gcMillis()
      val spill0 = spillTap.mem.get(); val dspill0 = spillTap.disk.get()
      heapPools.foreach(_.resetPeakUsage())
      // timeboxed so one wedged query costs its budget once, not the
      // whole bench; a timed-out first rep also skips the remaining reps
      var timedOut = false
      def rep(): Option[Double] = {
        if (timedOut) return None
        // checkpoint-heavy queries (page_rank: 6 eager localCheckpoints)
        // accumulate unevictable blocks across REPS as well — release
        // between reps, not just between queries, or the 5th rep runs
        // against 5 reps' worth of dead pinned blocks (measured as a
        // 6.7 s GC episode on q_page_rank's 5-rep run)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        try {
          Timebox.run(spark, name, Timebox.defaultSeconds) {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: java.util.concurrent.TimeoutException =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            timedOut = true
            None
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }
      var times = (1 to reps).flatMap(_ => rep()).toVector
      if (times.nonEmpty && times.sorted.apply(times.length / 2) < 1.0)
        times ++= (times.length until fastReps).flatMap(_ => rep())
      // HEAVY queries get two extra reps as well: with 3 reps, one cold
      // first rep (broadcast/shuffle-file setup at sf0.1) sits adjacent
      // to the median and skewed q_record_linkage 9.2 vs 15.9 s across
      // otherwise-agreeing fresh-JVM runs; a median of 5 pins it to the
      // warm plateau for the few queries where a rep costs real time
      if (times.length == reps && times.sorted.apply(times.length / 2) >= 5.0)
        times ++= (1 to 2).flatMap(_ => rep())
      val sorted = times.sorted
      val gcSec = (gcMillis() - gc0) / 1e3
      val spillGb = (spillTap.mem.get() - spill0) / 1e9
      val dspillGb = (spillTap.disk.get() - dspill0) / 1e9
      val peakGb = heapPools.map(_.getPeakUsage.getUsed).sum / 1e9
      metrics(name) = s"""{"gc_sec":${num(gcSec, 2)},"spill_gb":${num(spillGb, 2)},""" +
        s""""disk_spill_gb":${num(dspillGb, 2)},"peak_heap_gb":${num(peakGb, 2)}}"""
      name -> (if (sorted.isEmpty) None else Some(sorted(sorted.length / 2)))
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.fold("null")(_.toString)
    }.mkString("{", ",", "}")
    val failures = results.collect { case (k, None) => k }
    val errs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    // Streaming throughput (rows/s, rate source, RocksDB backend): the one
    // surface with a real reference throughput requirement (queue-depth
    // alarms). Off-switch for fast local iteration; failures report a
    // null rather than voiding the batch numbers.
    val streaming =
      if (sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH", "1") == "0") ""
      else try {
        graft.streaming.StateBackends.rocksDb.foreach { case (k, v) =>
          spark.conf.set(k, v) }
        // Hang containment, same discipline as the batch loop: stop() by
        // default waits FOREVER on the stream's execution thread
        // (stopTimeout=0), so a micro-batch wedged in state-store I/O
        // would void every artifact after it. Bound stop(), and Timebox
        // the whole measurement so a hung stream costs a null streaming
        // entry, not the bench.
        spark.conf.set("spark.sql.streaming.stopTimeout", "30s")
        val t = Timebox.run(spark, "stream_task_states", Timebox.defaultSeconds) {
          graft.streaming.StreamBench.taskStatesThroughput(spark)
        }
        val f = Timebox.run(spark, "stream_funnel", Timebox.defaultSeconds) {
          graft.streaming.StreamBench.funnelThroughput(spark)
        }
        val a = Timebox.run(spark, "stream_attribution", Timebox.defaultSeconds) {
          graft.streaming.StreamBench.attributionThroughput(spark)
        }
        val r = Timebox.run(spark, "stream_registry_ingest", Timebox.defaultSeconds) {
          graft.streaming.StreamBench.registryIngestThroughput(spark)
        }
        s""","streaming":{"task_states_rows_per_sec":${num(t, 0)},"funnel_rows_per_sec":${num(f, 0)},"attribution_rows_per_sec":${num(a, 0)},"registry_ingest_rows_per_sec":${num(r, 0)}}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] streaming bench failed: ${e.getMessage}")
          ""","streaming":null"""
      }
    val qm = metrics.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val heapGb = Runtime.getRuntime.maxMemory / 1e9
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":${failures.length},"errors":$errs,"sf":"$sfDir"$streaming,""" +
      s""""jvm_max_heap_gb":${num(heapGb, 1)},"query_metrics":$qm}"""
    // Stdout-tail scraping truncated the timing object in r3/r4
    // (BENCH parsed:null) — persist the full line to a file too.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    // Print the JSON line LAST, after the session is down: r7's driver
    // artifact came back parsed:null because a RocksDB checkpoint-abort
    // stack from streaming shutdown interleaved with the line on stdout.
    // stop() failures must not void the artifact either — swallow them.
    try spark.stop()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] spark.stop failed: ${e.getMessage}") }
    println(line)
    // The full metrics line is ~20 KB at 200+ queries; a bounded stdout
    // tail capture truncates it mid-object and parses null. Emit a final
    // <200-char summary with the same headline keys so ANY tail window
    // holds one complete JSON object (full detail stays in the line above
    // and in SPARK_GRAFT_BENCH_OUT).
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","total_s":${num(total, 1)},""" +
      s""""n":${results.length},"failed":${failures.length},"sf":"$sfDir"}""")
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset for local iteration: SPARK_GRAFT_ONLY=q_a,q_b
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    // A failed query must surface as a RED row in the correctness artifact,
    // never vanish from it: on exception we still create the (empty) output
    // dir so the gate's no-parquet-files branch counts a fail. Rounds 3/4
    // lost 16 red queries because failures wrote no dir and the gate only
    // iterated dirs that existed.
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val timeoutSec = Timebox.defaultSeconds
    selected.foreach { case (name, fn) =>
      try Timebox.run(spark, name, timeoutSec) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
        val dir = new java.io.File(s"$outDir/$name")
        dir.mkdirs()
        // overwrite may have left partial parquet before the failure —
        // scrub so a half-written result can't masquerade as output.
        Option(dir.listFiles()).foreach(_.foreach { f =>
          if (f.isFile) f.delete()
        })
        // Belt-and-braces vs the cancel race: Timebox joins the cancelled
        // worker with a grace period, but if a wedged task outlives it and
        // commits parquet after this scrub, the marker still forces the
        // gate to count the query as failed (check.py hard-fails on it).
        Files.writeString(Paths.get(s"$outDir/$name/_FAILED"),
          s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}\n")
      }
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} failed: ${failed.sorted.mkString(",")}")
    // Invariant: every selected query produced either parquet output or a
    // counted failure marker — nothing may silently disappear.
    val produced = selected.keySet.filter(n => new java.io.File(s"$outDir/$n").isDirectory)
    require(produced == selected.keySet,
      s"[verify] queries with no output dir: ${(selected.keySet -- produced).mkString(",")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // restricted to the selected subset so SPARK_GRAFT_ONLY iteration
    // doesn't make the checker count every non-run query as a MISS
    val json = SparkEntry.oracleSql.filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

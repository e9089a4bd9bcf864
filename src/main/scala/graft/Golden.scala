package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical text serialization for golden-file comparison: header line +
  * one comma-joined line per row, doubles via Double.toString (shortest
  * round-trip form — any bit-level drift of a generator changes the text).
  * Collect-based: golden queries are small by construction.
  */
object Golden {
  def canonical(df: DataFrame): String = {
    val header = df.columns.mkString(",")
    val rows = df.collect().map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case null => ""
          case d: java.lang.Double => java.lang.Double.toString(d)
          case v => v.toString
        }
      }.mkString(",")
    }
    (header +: rows).mkString("\n") + "\n"
  }
}

/** Dev tool: regenerate the committed golden outputs for the seeded
  * generator queries and the media-codec queries. Run ONLY after an
  * intended semantic change to [[graft.trajectory.BehaviorGenerator]] /
  * [[graft.trajectory.Extrinsics]] (reference: behavior_executor.py:638-857,
  * camera_exporter.py:383-437) or [[graft.llmops.Multimodal]] /
  * [[graft.llmops.Codecs]]; GoldenSpec fails on any unintended drift.
  *
  *   sbt "runMain graft.DumpGolden"
  */
object DumpGolden {
  val queries: Seq[String] = Seq(
    "q_behavior_trajectory", "q_extrinsic_export",
    // media queries: deterministic synthetic payloads (md5-seeded, valid
    // PPM/WAV/Y4M containers) through the real pure-JVM codecs — byte-exact
    // goldens stand in for the missing SQL oracle (binary plumbing has no
    // DuckDB analog)
    "q_media_features", "q_media_resize", "q_frame_sample", "q_media_phash",
    "q_media_ahash")

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "src/test/resources/golden"
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (name <- queries) {
      val text = canonicalFor(spark, name)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.csv"), text)
      println(s"[golden] wrote $name (${text.linesIterator.length} lines)")
    }
    spark.stop()
  }

  /** The golden queries read only the (SF-invariant) nation table or
    * synthesize their input from seeds, so the committed text is valid at
    * every scale factor. */
  def canonicalFor(spark: SparkSession, name: String): String =
    Golden.canonical(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
}

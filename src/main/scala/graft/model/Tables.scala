package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. These are plain
  * `spark.read.parquet` scans — filters/projections applied by callers are
  * pushed down by Catalyst into the parquet reader (PushedFilters /
  * ReadSchema), which is the scan-pruning behavior the reference implements
  * by hand while walking directories (reference: scene_scanner.py:146,
  * copy_scene_assets.py:57-59).
  */
object Tables {
  /** Parquet-reading confs every loader pins BEFORE reading, so a table's
    * schema never depends on which loader ran first in the session:
    *  - nanosAsLong: TIMESTAMP(NANOS) columns (earlier fixture
    *    generations) surface as LongType instead of failing;
    *  - inferTimestampNTZ off: timestamp[us] (isAdjustedToUTC=false)
    *    columns load as session-local TimestampType — identical values
    *    under the pinned UTC sessions, and predicates on them push into
    *    the scan (no NTZ→LTZ cast above it). Without pinning, lineitem's
    *    l_shipdate would load as TIMESTAMP_NTZ before the first
    *    events() call and TimestampType after it.
    */
  private def pinParquetConfs(s: SparkSession): Unit = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    pinParquetConfs(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (earlier
    * fixture generations) and plain timestamp[us] (current ones), so the
    * loader is schema-adaptive: it branches on the type Spark actually
    * infers rather than hard-coding either era's encoding.
    *
    *  - TIMESTAMP(NANOS): Spark 4 won't map nanos to TimestampType; with
    *    `nanosAsLong` it surfaces as LongType, which we truncate to µs —
    *    exactly what DuckDB's ns→µs conversion does, so both engines see
    *    identical values.
    *  - timestamp[us] (isAdjustedToUTC=false): Spark infers TIMESTAMP_NTZ;
    *    cast to session-local TimestampType (sessions here pin UTC, so the
    *    instant is unchanged and downstream window/range arithmetic keeps
    *    the TimestampType it has always seen).
    *  - TimestampType: already what downstream expects — pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // confs pinned by table(); the NTZ match arm below stays as a safety
    // net in case a caller's session overrides inferTimestampNTZ back on
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

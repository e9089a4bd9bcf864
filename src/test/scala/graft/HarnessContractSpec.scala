package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver-contract surface itself. These exist because the
  * failure mode they catch is SILENT: `families.flatMap(_.queries).toMap`
  * would let a duplicated query name shadow another family's entry, and a
  * query added without an oracle quietly downgrades to a rows-only check.
  * Neither shows up in any functional test.
  */
class HarnessContractSpec extends AnyFunSuite {

  /** Queries intentionally shipped WITHOUT a DuckDB oracle: seeded
    * generators and synthetic-media decodes whose semantics ANSI SQL
    * cannot express. Each is byte-locked against a committed golden in
    * GoldenSpec. Adding a query here requires adding its golden.
    */
  private val goldenLocked = Set(
    // camera extrinsic matrices: RAW trig doubles (cos/sin differ by
    // ≤1 ulp between engines, measured), so the export stays golden —
    // but its exact dataflow is oracle-evidenced by q_extrinsic_traj's
    // 9-decimal replay and q_extrinsic_matrix's hash-exact kernel
    "q_extrinsic_export")

  test("query names are globally unique across families") {
    val all = SparkEntry.families.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names shadow each other: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("every query is oracle-checked or explicitly golden-locked") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == goldenLocked,
      s"queries without oracle beyond the golden allowlist: ${noOracle -- goldenLocked}; " +
        s"stale allowlist entries: ${goldenLocked -- noOracle}")
  }

  test("no oracle exists without its query") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles with no query (dead SQL): $orphaned")
  }

  test("oracle SQL references only fixture tables") {
    // cheap lexical check: each oracle must mention at least one known
    // table so a typo'd table name fails here instead of as a driver
    // SQLERR at round time
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // filesystem-backed oracles scan blobs/JSON instead of a table view;
    // seeded-synthetic oracles (q_frame_sample, q_behavior_trajectory's
    // media cousin) generate their input from range()
    val fileReaders = Seq("read_blob", "read_text", "read_json", "glob(",
      "range(")
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !tables.exists(t => sql.toLowerCase.contains(t)) &&
        !fileReaders.exists(sql.toLowerCase.contains) => name
    }
    assert(missing.isEmpty, s"oracles referencing no fixture table: $missing")
  }
}

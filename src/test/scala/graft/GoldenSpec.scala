package graft

import java.nio.charset.StandardCharsets

/** Byte-exact drift guard for every query without a SQL oracle: the
  * seeded trajectory/extrinsic generators and the media-codec queries.
  * Row counts and invariants can stay green through a silent semantic
  * change; the canonical text cannot. Regenerate ONLY for intended
  * changes: sbt "runMain graft.DumpGolden".
  */
class GoldenSpec extends SparkSpec {

  test("no-oracle queries match their committed goldens (semantic drift guard)") {
    for (name <- DumpGolden.queries) {
      val got = DumpGolden.canonicalFor(spark, name)
      val res = getClass.getResourceAsStream(s"/golden/$name.csv")
      assert(res != null, s"missing golden src/test/resources/golden/$name.csv " +
        "— run: sbt \"runMain graft.DumpGolden\"")
      val want = new String(res.readAllBytes(), StandardCharsets.UTF_8)
      assert(got == want, s"$name drifted from src/test/resources/golden/$name.csv")
    }
  }

  test("every rows-only Verify query is golden-locked") {
    // the driver records a weaker rows-only check for queries without
    // oracle SQL; each of those MUST carry a committed golden so none of
    // the 88 surface queries is unverified
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.subsetOf(DumpGolden.queries.toSet),
      s"rows-only queries without a golden: ${noOracle -- DumpGolden.queries.toSet}")
  }
}

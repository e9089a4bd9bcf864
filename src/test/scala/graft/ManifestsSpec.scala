package graft

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.sources.Manifests

class ManifestsSpec extends SparkSpec {
  private val fixturesDir = "/root/repo/src/test/resources/manifests"

  private def parse(s: String): JValue = JsonMethods.parse(s)

  test("deepMerge: manifest scalars win, nested objects merge key-wise") {
    val template = parse(
      """{"job_type":"render","output_dir":"/out/default",
        |"sequence_config":{"nav_roam":{"num_sequences":1,"speed":300}}}""".stripMargin)
    val manifest = parse(
      """{"job_id":"j1","job_type":"render",
        |"sequence_config":{"nav_roam":{"num_sequences":6}}}""".stripMargin)
    val m = Manifests.deepMerge(template, manifest)
    assert(m \ "job_id" == JString("j1"))
    assert(m \ "output_dir" == JString("/out/default")) // template default kept
    assert(m \ "sequence_config" \ "nav_roam" \ "num_sequences" == JInt(6))
    assert(m \ "sequence_config" \ "nav_roam" \ "speed" == JInt(300)) // survives merge
  }

  test("deepMerge: \"default\" placeholder keeps the template value; arrays replace") {
    val template = parse("""{"quality":"epic","maps":["A","B"]}""")
    val manifest = parse("""{"quality":"default","maps":["C"]}""")
    val m = Manifests.deepMerge(template, manifest)
    assert(m \ "quality" == JString("epic"))
    assert(m \ "maps" == JArray(List(JString("C")))) // replaced, not concatenated
  }

  test("loadManifest validates job_type and merges over the template") {
    val template = parse("""{"output_dir":"/out/default"}""")
    val m = Manifests.loadManifest(s"$fixturesDir/job_gamma.json", template)
    assert(m \ "job_id" == JString("job_gamma"))
    assert(m \ "output_dir" == JString("/out/default")) // gamma omits it
    val e = intercept[IllegalArgumentException] {
      Manifests.loadManifest(s"$fixturesDir/job_alpha.json",
        requiredType = Some("bake"))
    }
    assert(e.getMessage.contains("job_type"))
  }

  test("loadCollection reads the manifest directory with nested structs") {
    val df = Manifests.loadCollection(spark, fixturesDir)
    assert(df.count() == 3)
    val beta = df.filter(col("job_id") === "job_beta")
      .select(col("map"),
        col("sequence_config.nav_roam.num_sequences")).head()
    assert(beta.getString(0) == "DesertRuins")
    assert(beta.getLong(1) == 8L)
  }

  test("resolveDatedDirs suffixes *_dir string columns, leaves nulls and others") {
    val df = Manifests.loadCollection(spark, fixturesDir)
    val dated = Manifests.resolveDatedDirs(df, "2026_08_13")
      .select("job_id", "output_dir", "map").collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), r.getString(2))).toMap
    assert(dated("job_alpha")._1.contains("/out/alpha/2026_08_13"))
    assert(dated("job_gamma")._1.isEmpty)        // null stays null
    assert(dated("job_alpha")._2 == "CoastalTown") // non-_dir untouched
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.graph.ConnectivityCache
import graft.model.Tables

class ConnectivityCacheSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def points = Tables.embeddings(spark, sf).filter(col("vec_id") < 30)

  test("analysisDoc summarizes the island analysis in one row") {
    val fp = ConnectivityCache.inputFingerprint(points, "vec_id", "embedding", 3, 0.10)
    val doc = ConnectivityCache.analysisDoc(points, "m1", "vec_id", "embedding",
      dim = 64, k = 3, minRatio = 0.10, analysisDate = "2026-01-01",
      fingerprint = fp).head()
    assert(doc.getAs[String]("map_name") == "m1")
    assert(doc.getAs[Long]("sample_count") == 30L)
    assert(doc.getAs[Long]("num_islands") >= 1L)
    // ratios are sorted largest-first and sum to ≤ 1
    val ratios = doc.getSeq[org.apache.spark.sql.Row](doc.fieldIndex("island_ratios"))
      .map(_.getAs[Double]("ratio"))
    assert(ratios == ratios.sorted.reverse)
    assert(ratios.sum <= 1.0 + 1e-9)
  }

  test("readOrCompute: cold miss computes, identical inputs hit, changed inputs invalidate") {
    val dir = Files.createTempDirectory("conncache").toFile.getAbsolutePath
    // cold: computes and stamps the first date
    val d1 = ConnectivityCache.readOrCompute(spark, dir, points, "m1",
      "vec_id", "embedding", 64, 3, 0.10, analysisDate = "2026-01-01")
    assert(d1.head().getAs[String]("analysis_date") == "2026-01-01")
    // hit: same inputs, later date — served from cache, FIRST date proves
    // no recompute happened
    val d2 = ConnectivityCache.readOrCompute(spark, dir, points, "m1",
      "vec_id", "embedding", 64, 3, 0.10, analysisDate = "2026-02-02")
    assert(d2.head().getAs[String]("analysis_date") == "2026-01-01")
    // stale: different sample set under the same map — fingerprint
    // mismatch forces recompute and the new date lands in the cache
    val fewer = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
    val d3 = ConnectivityCache.readOrCompute(spark, dir, fewer, "m1",
      "vec_id", "embedding", 64, 3, 0.10, analysisDate = "2026-03-03")
    val r3 = d3.head()
    assert(r3.getAs[String]("analysis_date") == "2026-03-03")
    assert(r3.getAs[Long]("sample_count") == 20L)
    // parameter change alone also invalidates (k folded into fingerprint)
    val d4 = ConnectivityCache.readOrCompute(spark, dir, fewer, "m1",
      "vec_id", "embedding", 64, 4, 0.10, analysisDate = "2026-04-04")
    assert(d4.head().getAs[String]("analysis_date") == "2026-04-04")
  }

  test("readValid treats an existing-but-empty cache dir as a cold cache") {
    val dir = Files.createTempDirectory("conncache-empty").toFile.getAbsolutePath
    assert(ConnectivityCache.readValid(spark, dir, "m1", 42L).isEmpty)
    // readOrCompute over the pre-created empty dir computes instead of throwing
    val d = ConnectivityCache.readOrCompute(spark, dir, points, "m1",
      "vec_id", "embedding", 64, 3, 0.10, analysisDate = "2026-01-01")
    assert(d.head().getAs[String]("analysis_date") == "2026-01-01")
  }

  test("readValid treats a _SUCCESS-only partial write as a cold cache") {
    val root = Files.createTempDirectory("conncache-partial")
    Files.createFile(root.resolve("_SUCCESS"))
    val dir = root.toFile.getAbsolutePath
    assert(ConnectivityCache.readValid(spark, dir, "m1", 42L).isEmpty)
    val d = ConnectivityCache.readOrCompute(spark, dir, points, "m1",
      "vec_id", "embedding", 64, 3, 0.10, analysisDate = "2026-02-02")
    assert(d.head().getAs[String]("analysis_date") == "2026-02-02")
  }

  test("fingerprint is multiplicity-sensitive: {A,A,B} vs {C,C,B} differ") {
    // under a XOR fold the duplicated rows cancel and these two sample
    // sets alias (same count, same XOR); the sum fold must split them
    val base = Tables.embeddings(spark, sf)
    val a = base.filter(col("vec_id") === 0)
    val b = base.filter(col("vec_id") === 1)
    val c = base.filter(col("vec_id") === 2)
    val aab = a.union(a).union(b)
    val ccb = c.union(c).union(b)
    val fp1 = ConnectivityCache.inputFingerprint(aab, "vec_id", "embedding", 3, 0.10)
    val fp2 = ConnectivityCache.inputFingerprint(ccb, "vec_id", "embedding", 3, 0.10)
    assert(fp1 != fp2)
    // and row order does not matter
    val fp3 = ConnectivityCache.inputFingerprint(b.union(a).union(a), "vec_id", "embedding", 3, 0.10)
    assert(fp1 == fp3)
  }

  test("per-map rows coexist: refreshing one map leaves siblings untouched") {
    val dir = Files.createTempDirectory("conncache2").toFile.getAbsolutePath
    ConnectivityCache.readOrCompute(spark, dir, points, "mA",
      "vec_id", "embedding", 64, 3, 0.10, analysisDate = "2026-01-01")
    ConnectivityCache.readOrCompute(spark, dir, points, "mB",
      "vec_id", "embedding", 64, 3, 0.10, analysisDate = "2026-01-02")
    val all = spark.read.parquet(dir)
    assert(all.select("map_name").distinct().count() == 2)
    // refresh mB with changed inputs; mA's row must survive
    val fewer = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
    ConnectivityCache.readOrCompute(spark, dir, fewer, "mB",
      "vec_id", "embedding", 64, 3, 0.10, analysisDate = "2026-05-05")
    val after = spark.read.parquet(dir)
    assert(after.filter(col("map_name") === "mA").count() == 1)
    assert(after.filter(col("map_name") === "mB").head()
      .getAs[String]("analysis_date") == "2026-05-05")
  }
}

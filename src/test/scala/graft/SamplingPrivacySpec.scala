package graft

import org.apache.spark.sql.functions._
import graft.llmops.{Dedup, Privacy, TextStats}
import graft.model.Tables

/** Round-8 additions: prefix-filtered exact Jaccard (PPJoin), sequential
  * Poisson weighted sampling, rendezvous sharding, randomized response.
  * The completeness/invariant claims each operator's scaladoc makes are
  * pinned here against both synthetic edges and the real fixture.
  */
class SamplingPrivacySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- prefix-filtered Jaccard ------------------------------------------

  test("ppjoin: equals the all-pairs Jaccard baseline on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val fast = Dedup.prefixFilteredJaccard(docs, "doc_id", "text", n = 3,
        threshold = 0.3)
      .select("id_a", "id_b", "inter", "sz_a", "sz_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val allPairs = sh.select(col("doc_id").as("id_a")).distinct()
      .join(sh.select(col("doc_id").as("id_b")).distinct(),
        col("id_a") < col("id_b"))
    val naive = Dedup.jaccardForPairs(allPairs, sh, "doc_id")
      .filter(col("jaccard") >= 0.3)
      .select("id_a", "id_b", "inter", "sz_a", "sz_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(naive.nonEmpty, "fixture must contain ≥1 near-dup pair for this test to bite")
    assert(fast == naive)
  }

  test("ppjoin: τ=1.0 returns exactly the identical-shingle-set pairs") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),        // identical
      (3L, "a b c d x"),                           // near but not exact
      (4L, "p q r s t")).toDF("doc_id", "text")
    val out = Dedup.prefixFilteredJaccard(docs, "doc_id", "text", 3, 1.0)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("ppjoin: sub-shingle-length docs are excluded, not crashed on") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "x y z w v u t s r q"),
      (4L, "x y z w v u t s r q")).toDF("doc_id", "text")
    val out = Dedup.prefixFilteredJaccard(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((3L, 4L)))
  }

  // ---- sequential Poisson weighted sample --------------------------------

  test("weighted sample: k per stratum, exact integer priority, w<1 excluded") {
    val rows = Seq(
      (1L, "en", 100L), (2L, "en", 1L), (3L, "en", 50L), (4L, "en", 0L),
      (5L, "fr", 10L), (6L, "fr", 10L)).toDF("id", "lang", "w")
    val out = TextStats.weightedSample(rows, "id", "w", "lang", k = 2)
      .select("id", "lang", "priority", "rn")
      .as[(Long, String, Long, Int)].collect()
    // w=0 row never appears (⌊u/0⌋ is excluded by the w≥1 filter)
    assert(!out.exists(_._1 == 4L))
    assert(out.count(_._2 == "en") == 2 && out.count(_._2 == "fr") == 2)
    // priority replays exactly: ⌊md5-uniform(id) div w⌋
    def u(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val w = Map(1L -> 100L, 2L -> 1L, 3L -> 50L, 5L -> 10L, 6L -> 10L)
    out.foreach { case (id, _, pri, _) => assert(pri == u(id) / w(id)) }
    // within a stratum, rn follows ascending (priority, id)
    val en = out.filter(_._2 == "en").sortBy(_._4)
    assert(en.map(_._3).sorted.toSeq == en.map(_._3).toSeq)
  }

  test("weighted sample: selection is mergeable — shard-wise min-k re-ranks to the global sample") {
    val df = spark.range(1, 401).select(col("id"), lit("s").as("g"),
      (pmod(col("id"), lit(7)) + 1).as("w"))
    val full = TextStats.weightedSample(df, "id", "w", "g", k = 10)
      .select("id").as[Long].collect().toSet
    // simulate two shards sampled independently, then merged and re-ranked
    val shardA = TextStats.weightedSample(df.filter(col("id") % 2 === 0), "id", "w", "g", 10)
    val shardB = TextStats.weightedSample(df.filter(col("id") % 2 === 1), "id", "w", "g", 10)
    val merged = shardA.unionByName(shardB)
      .orderBy(col("priority"), col("id")).limit(10)
      .select("id").as[Long].collect().toSet
    assert(merged == full)
  }

  // ---- rendezvous sharding ------------------------------------------------

  test("rendezvous: minimal movement — growing S moves docs ONLY to the new shard") {
    val df = spark.range(0, 2000).select(col("id"),
      TextStats.rendezvousShard(col("id"), 8).as("s8"),
      TextStats.rendezvousShard(col("id"), 9).as("s9"))
    val bad = df.filter(col("s8") =!= col("s9") && col("s9") =!= 8).count()
    assert(bad == 0L)
    val moved = df.filter(col("s8") =!= col("s9")).count()
    // E[moved] = 2000/9 ≈ 222; allow a wide deterministic band
    assert(moved > 120 && moved < 330, s"moved=$moved")
  }

  test("rendezvous: assignment in range and balanced within 2x of fair share") {
    val counts = spark.range(0, 4000)
      .select(TextStats.rendezvousShard(col("id"), 8).as("s"))
      .groupBy("s").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == (0L until 8L).toSet)
    assert(counts.values.forall(n => n > 250 && n < 1000), counts.toString)
  }

  // ---- randomized response -------------------------------------------------

  test("randomized response: flip set is exactly the md5 bucket ≥ p rows; truth never leaks") {
    val rows = spark.range(0, 1000)
      .select(col("id"), (col("id") % 3 === 0).as("flag"))
    val rel = Privacy.randomizedResponse(rows, "id", "flag")
    assert(!rel.columns.contains("flag"))
    val joined = rel.join(rows, "id")
      .select(col("id"), col("flag"), col("reported"))
      .as[(Long, Boolean, Boolean)].collect()
    def bucket(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16) % 1000L
    joined.foreach { case (id, f, r) =>
      assert(r == (if (bucket(id) < 750) f else !f), s"id=$id") }
  }

  test("randomized response: debiased estimate lands within 5 standard errors of truth") {
    val rows = spark.range(0, 1000)
      .select(col("id"), lit("g").as("g"), (col("id") % 3 === 0).as("flag"))
    val est = Privacy.rrEstimate(
        Privacy.randomizedResponse(rows, "id", "flag"), Seq("g"))
      .select("est_true").as[Double].head()
    val truth = 334.0 // ids 0,3,…,999 → ⌈1000/3⌉
    // se = √(n·p(1−p)) / (2p−1) = √(1000·0.1875)/0.5 ≈ 27.4
    assert(math.abs(est - truth) < 5 * 27.4, s"est=$est")
  }

  test("randomized response: truthPermille bounds enforced") {
    val rows = spark.range(0, 10).select(col("id"), (col("id") < 5).as("flag"))
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(rows, "id", "flag", truthPermille = 500)
    }
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(rows, "id", "flag", truthPermille = 1000)
    }
  }
}

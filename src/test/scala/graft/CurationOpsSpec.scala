package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hll, UrlFunctions}
import graft.llmops.Privacy
import graft.operators.RangeJoin

/** URL canonicalization, interval-overlap join, k-anonymity, HLL sketch
  * — edge cases the fixture-driven oracles can't reach (null/garbage
  * URLs, multi-cell-spanning overlaps, null quasi-identifiers,
  * partitioning invariance of the sketch). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalizeUrl: case, www, default port, tracking params, param order, slash, fragment") {
    val in = Seq(
      "HTTPS://WWW.Example.COM:443/A/b/?z=1&utm_campaign=x&a=2#frag",
      "https://example.com/A/b?a=2&z=1",
      "http://example.com",
      "not a url",
      null
    ).toDF("url")
    val out = in.select(UrlFunctions.canonicalizeUrl(col("url"))).as[String].collect()
    // NOTE: path case is preserved (paths are case-sensitive on most servers)
    assert(out(0) == "https://example.com/A/b?a=2&z=1")
    assert(out(1) == "https://example.com/A/b?a=2&z=1")
    assert(out(2) == "http://example.com/")
    assert(out(3) == null)
    assert(out(4) == null)
  }

  test("registeredDomain ladder: plain, ccTLD second-level, bare host, single label") {
    val in = Seq("blogs.h3.co.uk", "a.b.example.com", "example.com", "localhost", "co.uk")
      .toDF("h")
    val out = in.select(UrlFunctions.registeredDomain(col("h"))).as[String].collect()
    assert(out.toSeq == Seq("h3.co.uk", "example.com", "example.com", "localhost", "co.uk"))
  }

  test("overlapJoin equals the naive theta join, including multi-cell spans") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map { i =>
      val lo = rnd.nextDouble() * 100; (i.toLong, lo, lo + rnd.nextDouble() * 12)
    }.toDF("lid", "llo", "lhi")
    val right = (1 to 300).map { i =>
      val lo = rnd.nextDouble() * 100; (i.toLong, lo, lo + rnd.nextDouble() * 12)
    }.toDF("rid", "rlo", "rhi")
    // cell width 3.0 << max span 12 → most pairs share several cells;
    // exactly-once emission is what's under test.
    val got = RangeJoin.overlapJoin(left, right, "llo", "lhi", "rlo", "rhi", cellWidth = 3.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = left.join(right, col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.size == RangeJoin.overlapJoin(left, right, "llo", "lhi", "rlo", "rhi", 3.0).count())
  }

  test("kAnonymize: rare combinations suppressed, common kept, nulls group together") {
    val df = (Seq.fill(5)(("NY", Some(1))) ++ Seq(("LA", Some(2))) ++
        Seq.fill(3)(("SF", None: Option[Int])))
      .zipWithIndex.map { case ((c, a), i) => (i.toLong, c, a) }
      .toDF("id", "city", "age")
    val out = Privacy.kAnonymize(df, Seq("city", "age"), k = 3)
      .orderBy("id").select("city", "age").as[(String, String)].collect()
    assert(out.take(5).forall(_ == ("NY", "1")))      // group of 5 ≥ k
    assert(out(5) == ("*", "*"))                       // singleton suppressed
    assert(out.drop(6).forall(_ == ("SF", null)))      // null-age group of 3 kept as-is
    assert(Privacy.withGroupSize(df, Seq("city", "age")).filter(col("city") === "SF")
      .select("group_size").as[Long].head() == 3L)
  }

  test("HLL estimate within tolerance and invariant to partitioning") {
    val p = 8
    val n = 20000
    val df = spark.range(n).select(Hll.hllInput(col("id"), p).as("enc"))
    def summarize(d: org.apache.spark.sql.DataFrame) =
      d.agg(Hll.hllAgg(col("enc"), p).as("h"))
        .select(col("h.vEmpty"), col("h.zScaled")).as[(Int, Long)].head()
    val (v1, z1) = summarize(df.repartition(1))
    val (v8, z8) = summarize(df.repartition(8))
    assert((v1, z1) == (v8, z8), "sketch must not depend on partitioning")
    val est = Hll.alphaNumerator(p) / z1.toDouble
    // p=8 → relative stddev ≈ 1.04/sqrt(256) ≈ 6.5%; 4σ bound.
    assert(math.abs(est - n) / n < 0.26, s"estimate $est too far from $n")
    assert(v1 == 0, "20k values into 256 buckets leave no register empty")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomPrune, ZOrder}

/** Edge semantics of the scan-reduction operators: the contract is
  * "identical results to the plain form", which has to survive empty
  * inputs, null keys, and hostile coordinates — the cases a 100 TB run
  * WILL contain somewhere.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prune with an empty key set keeps nothing (like the plain join)") {
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val keys = Seq.empty[Long].toDF("k").filter(col("k") > 0)
    val pruned = BloomPrune.semiReduce(fact, "k", keys, "k", expectedItems = 16)
    assert(pruned.count() == 0)
  }

  test("bloom pruned join equals the plain join with null and missing keys") {
    val fact = Seq(Some(1L), Some(2L), Some(3L), None, Some(99L))
      .toDF("k").withColumn("v", coalesce(col("k"), lit(-1L)) * 10)
    val dim = Seq(1L, 3L, 4L).toDF("dk")
    val pruned = BloomPrune.prunedJoin(fact, dim, "k", "dk", expectedItems = 16)
      .select("k", "v", "dk")
    val plain = fact.join(dim, fact("k") === dim("dk")).select("k", "v", "dk")
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == 2) // null and 2/99 drop, 1 and 3 survive
  }

  test("z-value masks negative and oversized coordinates instead of corrupting the key") {
    val df = Seq((-1L, 5L), (1024L + 3L, 2L)).toDF("x", "y")
    val out = df.withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 10))
      .collect().map(_.getLong(2))
    def morton(x: Long, y: Long): Long =
      (0 until 10).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
        .reduce(_ | _)
    // -1 & 1023 = 1023; 1027 & 1023 = 3 — same masking as the formula
    assert(out.toSet == Set(morton(1023L, 5L), morton(3L, 2L)))
  }

  test("z-value rejects configurations that overflow a long") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 22) // 66 bits
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("a")), 10) // one dimension is just a sort
    }
  }

  test("repartitionByZ preserves every row exactly once") {
    val df = (0L until 1000L).map(i => (i % 37, i % 53)).toDF("x", "y")
    val laid = ZOrder.repartitionByZ(df, Seq("x", "y"), bits = 6, numPartitions = 4)
    assert(laid.count() == 1000)
    assert(laid.rdd.getNumPartitions == 4)
  }

  test("z-score outliers flag the planted spike, nothing else, on any layout") {
    import graft.operators.Anomaly
    // key "a": 99 values at 10.0 and one spike at 1000.0 — only the spike
    // flags at 3 sigma; key "b" is constant, so sd = 0 and z = 0 for all
    val rows = ((1 to 99).map(i => (i.toLong, "a", 10.0)) :+ (100L, "a", 1000.0)) ++
      (101 to 110).map(i => (i.toLong, "b", 7.0))
    val df = rows.toDF("event_id", "event_type", "value")
    def flags(d: org.apache.spark.sql.DataFrame) =
      Anomaly.zScoreOutliers(d, "event_type", "value", threshold = 3.0)
        .collect().map(r => r.getAs[Long]("event_id") ->
          (r.getAs[Double]("z"), r.getAs[Boolean]("is_outlier"))).toMap
    val f = flags(df)
    assert(f(100L)._2 && f(100L)._1 > 3.0)
    assert(f.filter(_._1 != 100L).values.forall(!_._2))
    assert((101 to 110).forall(i => f(i.toLong)._1 == 0.0))
    // determinism across physical layout — the entire point of the
    // integer-moment construction: identical z maps, bit for bit
    assert(flags(df.repartition(13)) == f)
  }

  test("MAD outliers: a megadoc masks itself from the z-gate but not the MAD gate") {
    import graft.operators.Anomaly
    // 8 docs of ~1000 chars + one 500k megadoc: a single point's z is
    // bounded by √(n−1) = √8 ≈ 2.83 < 3 — the spike inflates mean and σ
    // enough to MASK ITSELF from the z-gate; the median/MAD gate (50%
    // breakdown) flags it regardless.
    val vals = (1 to 8).map(i => (i.toLong, "k", 990L + i)) :+ (9L, "k", 500000L)
    val df = vals.toDF("id", "k", "v")
    val z = Anomaly.zScoreOutliers(df, "k", "v", threshold = 3.0)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(!z(9L), "the megadoc must mask itself from the z-gate for this test to bite")
    val m = Anomaly.madOutliers(df, "k", "v", threshold = 3.0)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(m(9L))
    assert((1L to 8L).forall(i => !m(i)))
  }

  test("MAD outliers: zero MAD flags any deviating row (documented degenerate rule)") {
    import graft.operators.Anomaly
    val df = (Seq.fill(5)(10L) :+ 11L).zipWithIndex
      .map { case (v, i) => (i.toLong, "k", v) }.toDF("id", "k", "v")
    val m = Anomaly.madOutliers(df, "k", "v")
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(m(5L) && (0L to 4L).forall(i => !m(i)))
  }

  test("winsorize: clamps to exact bounds, interior rows untouched") {
    import graft.operators.Anomaly
    val df = (1 to 100).map(i => (i.toLong, "k", i.toLong)).toDF("id", "k", "v")
    val out = Anomaly.winsorize(df, "k", "v", pLo = 0.05, pHi = 0.95)
      .select("id", "lo", "hi", "clamped").as[(Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // R-7 interpolated p05/p95 of 1..100 = 5.95 / 95.05
    assert(out(1L)._2 == 5.95 && out(1L)._3 == 95.05)
    assert(out(1L)._4 == 5.95 && out(100L)._4 == 95.05)
    assert(out(50L)._4 == 50.0)
    // clamped range is exactly [lo, hi]
    assert(out.values.forall(r => r._4 >= r._2 && r._4 <= r._3))
  }
}

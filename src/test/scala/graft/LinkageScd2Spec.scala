package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.catalog.Scd2
import graft.operators.BlockingJoin

class LinkageScd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("Scd2: runs collapse, validity chains half-open, open run is current") {
    val log = Seq(
      (1L, ts(10), 1L, "new"), (1L, ts(20), 2L, "new"), (1L, ts(30), 3L, "active"),
      (1L, ts(40), 4L, "active"), (1L, ts(50), 5L, "done"),
      (2L, ts(10), 6L, "new")
    ).toDF("k", "t", "seq", "status")
    val dim = Scd2.buildDimension(log, Seq("k"), "t", Seq("status"), tieBreak = Seq("seq"))
      .select($"k", $"status", $"valid_from", $"valid_to", $"version", $"is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Int, Boolean)]
      .collect().sortBy(r => (r._1, r._5))
    assert(dim.toSeq == Seq(
      (1L, "new", ts(10), Some(ts(30)), 1, false),
      (1L, "active", ts(30), Some(ts(50)), 2, false),
      (1L, "done", ts(50), None, 3, true),
      (2L, "new", ts(10), None, 1, true)))
  }

  test("Scd2: null attribute runs collapse null-safely") {
    val log = Seq((1L, ts(1), 1L, Option.empty[String]), (1L, ts(2), 2L, None),
      (1L, ts(3), 3L, Some("x"))).toDF("k", "t", "seq", "status")
    val dim = Scd2.buildDimension(log, Seq("k"), "t", Seq("status"), Seq("seq"))
    assert(dim.count() == 2)
  }

  test("Scd2: same-timestamp changes ordered by the tie-break") {
    val log = Seq((1L, ts(5), 2L, "b"), (1L, ts(5), 1L, "a")).toDF("k", "t", "seq", "status")
    val dim = Scd2.buildDimension(log, Seq("k"), "t", Seq("status"), Seq("seq"))
      .orderBy("version").select("status").as[String].collect()
    assert(dim.toSeq == Seq("a", "b"))
  }

  test("BlockingJoin: pairs dedup across blocks, best match deterministic, unblocked absent") {
    val left = Seq((1L, "ann", "x"), (2L, "bob", "y"), (3L, "zed", "qq"))
      .toDF("lid", "lname", "lzone")
    val right = Seq((10L, "ann", "x"), (11L, "ann", "z"), (12L, "bob", "w"))
      .toDF("rid", "rname", "rzone")
    val out = BlockingJoin.bestMatch(left, right, "lid", "rid",
        blockKeys = Seq(left("lname") -> right("rname"), left("lzone") -> right("rzone")),
        score = when($"lname" === $"rname", 2).otherwise(0) +
          when($"lzone" === $"rzone", 1).otherwise(0))
      .select("lid", "rid", "match_score").as[(Long, Long, Int)].collect().sortBy(_._1)
    // lid=1 pairs with rid=10 under BOTH keys → one candidate row, score 3
    // (a double-counted pair would be caught by nondeterministic rank or
    // a duplicated output row); lid=3 has no block match → absent.
    assert(out.toSeq == Seq((1L, 10L, 3), (2L, 12L, 2)))
    val cands = BlockingJoin.candidates(left, right, "lid", "rid",
      Seq(left("lname") -> right("rname"), left("lzone") -> right("rzone")))
    assert(cands.filter($"lid" === 1 && $"rid" === 10).count() == 1)
  }

  test("BlockingJoin rejects inputs carrying its reserved working columns") {
    // withColumn silently overwrites same-named columns — an input
    // `match_score`/`_block` would corrupt the pair dedup, so it must
    // fail loudly instead.
    val left = Seq((1L, "ann", 9)).toDF("lid", "lname", "match_score")
    val right = Seq((10L, "ann")).toDF("rid", "rname")
    val e = intercept[IllegalArgumentException] {
      BlockingJoin.candidates(left, right, "lid", "rid",
        Seq(left("lname") -> right("rname")))
    }
    assert(e.getMessage.contains("match_score"))
  }
}

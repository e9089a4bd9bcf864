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

  test("sortedNeighborhood: window pairs on the merged order, gaps bounded") {
    // merged order (key, side, id): aL(1) bR(10) cL(2) dR(11) eL(3)
    val l = Seq((1L, "a"), (2L, "c"), (3L, "e")).toDF("lid", "lk")
    val r = Seq((10L, "b"), (11L, "d")).toDF("rid", "rk")
    def run(w: Int) = BlockingJoin.sortedNeighborhood(l, r, "lid", "rid",
        col("lk"), col("rk"), w)
      .select("lid", "rid", "pos_gap")
      .as[(Long, Long, Long)].collect().toSet
    // w=1: exactly the adjacent cross-side pairs
    assert(run(1) == Set((1L, 10L, 1L), (2L, 10L, 1L), (2L, 11L, 1L), (3L, 11L, 1L)))
    // w=2 adds nothing: every gap-2 neighbor in this order is same-side
    assert(run(2) == run(1))
    // w=4 spans the whole list: all 3×2 cross-side pairs, gaps in [1, 4]
    assert(run(4).size == 6)
    assert(run(4).map(p => (p._1, p._2)) ==
      Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L)))
    assert(run(4).forall(p => p._3 >= 1 && p._3 <= 4))
  }

  test("sortedNeighborhood: recall where equality blocking has none") {
    // right keys are left keys + 1 (OCR off-by-one): zero equal keys, but
    // the corrupted key sorts NEAR its original — with dense sequential
    // keys the true pair's gap is 3 (the colliding left key and its own
    // right twin sit between), the window-sizing fact the query's w=4
    // rests on
    val l = (1L to 9L).map(i => (i, f"$i%03d")).toDF("lid", "lk")
    val r = (1L to 9L).map(i => (i + 100L, f"${i + 1}%03d")).toDF("rid", "rk")
    val pairs = BlockingJoin.sortedNeighborhood(l, r, "lid", "rid",
        col("lk"), col("rk"), w = 3)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // every true pair (i, i+100) is caught...
    assert((1L to 9L).forall(i => pairs.contains((i, i + 100L))))
    // ...while the equality blocker pairs each corrupted key with the
    // WRONG record (the left record whose key it collided into) and
    // never the true one
    val lq = l.select(col("lid"), col("lk"))
    val rq = r.select(col("rid"), col("rk"))
    val eq = BlockingJoin.candidates(lq, rq, "lid", "rid",
        Seq(lq("lk") -> rq("rk")))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(eq.nonEmpty && (1L to 9L).forall(i => !eq.contains((i, i + 100L))))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a true partial aggregation (SURVEY.md §2.10; the
  * windowed top-k in O3/`Similarity.bruteForceTopK` is the baseline this
  * scales past).
  *
  * `row_number() OVER (PARTITION BY query ORDER BY score)` must shuffle
  * EVERY candidate row of a query to one task and sort it there — at
  * 100 TB that is a corpus-sized exchange and a single-task sort per hot
  * query. A bounded-heap Aggregator instead keeps at most k rows per
  * (query, input partition) on the map side and merges k-sized buffers on
  * the reduce side: the exchange carries ≤ k·numPartitions rows per query
  * no matter how many candidates were scored, and nothing is ever fully
  * sorted. Same output, shuffle shrunk by |candidates|/k.
  *
  * Determinism contract matches the windowed form exactly: descending
  * score, ascending id tie-break — a strict total order, so the k
  * survivors and their ranks are identical to `row_number`'s pick.
  */
object TopK {

  /** One scored candidate. */
  case class Scored(score: Double, id: Long)

  /** Product wrapper so the buffer gets a struct encoder (a bare Seq has
    * no `Encoders.product`); items stay sorted (score desc, id asc) and
    * bounded at k at every step. */
  case class TopKBuf(items: Seq[Scored])

  private def ordered(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Merge two (score desc, id asc)-sorted lists, keep the first k. */
  private def mergeSorted(k: Int, a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Scored]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && ordered(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  /** Aggregator keeping the k best (score desc, id asc) inputs. */
  def topK(k: Int): Aggregator[Scored, TopKBuf, Seq[Scored]] =
    new Aggregator[Scored, TopKBuf, Seq[Scored]] {
      def zero: TopKBuf = TopKBuf(Vector.empty)
      def reduce(buf: TopKBuf, in: Scored): TopKBuf = {
        val items = buf.items
        if (items.length >= k && !ordered(in, items.last)) buf
        else {
          val at = items.indexWhere(cur => ordered(in, cur)) match {
            case -1 => items.length
            case p => p
          }
          val (pre, post) = items.splitAt(at)
          TopKBuf(((pre :+ in) ++ post).take(k))
        }
      }
      def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
        TopKBuf(mergeSorted(k, a.items, b.items))
      def finish(r: TopKBuf): Seq[Scored] = r.items
      def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
      def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }

  /** Column form: `topKAgg(k, score, id)` in groupBy().agg(...); returns
    * array<struct<score,id>> sorted (score desc, id asc), length ≤ k. */
  def topKAgg(k: Int, score: Column, id: Column): Column =
    udaf(topK(k)).apply(score, id)
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregators (SURVEY.md §2.10).
  *
  * LCP is associative and commutative, so it runs as a proper partial
  * aggregation (map-side combine) instead of collecting values — the
  * reference computes it pairwise on a driver list
  * (scene_copy.py:341-368 common-prefix of parent dirs).
  */
object Aggregators {

  /** Longest common prefix of all non-null input strings; null marker as
    * the zero element (empty string is a valid LCP result, so the zero
    * must be distinguishable). */
  val longestCommonPrefix: Aggregator[String, String, String] =
    new Aggregator[String, String, String] {
      private final val Zero: String = null
      def zero: String = Zero
      private def lcp(a: String, b: String): String = {
        if (a == null) return b
        if (b == null) return a
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n && a.charAt(i) == b.charAt(i)) i += 1
        a.substring(0, i)
      }
      def reduce(buf: String, in: String): String =
        if (in == null) buf else lcp(buf, in)
      def merge(a: String, b: String): String = lcp(a, b)
      def finish(r: String): String = if (r == null) "" else r
      def bufferEncoder: Encoder[String] = Encoders.STRING
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Column form: `lcpAgg(col)` usable in groupBy().agg(...). */
  def lcpAgg(c: Column): Column = udaf(longestCommonPrefix).apply(c)
}

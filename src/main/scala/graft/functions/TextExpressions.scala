package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash (Rabin–Karp) document fingerprint: the MINIMUM
  * over all `w`-byte windows of h(i) = Σ_{k<w} byte(i+k)·31^k — the
  * winnowing-style fingerprint (min-of-window-hashes) that is robust to
  * content shifts, unlike a whole-document hash where one inserted byte
  * changes everything.
  *
  * Why a native expression: the HOF form recomputes each window from
  * scratch (O(n·w) interpreted lambda dispatches per document); this is
  * the actual ROLLING form — O(n) with the exact integer update
  * h' = (h − incoming_low_byte)/31 + outgoing_byte·31^(w−1), where the
  * subtraction leaves a multiple of 31 so the division is exact. No
  * modulus: 255·31^7·8 < 2^53, so every value is exact in a long AND in
  * the oracle's arithmetic — fingerprints are engine-reproducible.
  *
  * Byte-level (UTF-8): identical to per-character arithmetic on ASCII
  * corpora, which is what the DuckDB `ascii(substr(...))` oracle computes.
  * Documents shorter than `w` bytes have no window → NULL.
  */
case class RollingMinHash(child: Expression, w: Int, base: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 2 && w <= 16, s"window must be 2..16 bytes, got $w")
  require(base > 1, s"base must be > 1, got $base")
  require(255.0 * math.pow(base.toDouble, (w - 1).toDouble) * w < math.pow(2.0, 53.0),
    s"w=$w base=$base overflows exact-integer range")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val topPow: Long = {
    var p = 1L; var k = 0
    while (k < w - 1) { p *= base; k += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val n = b.length
    if (n < w) null
    else {
      var h = 0L
      var p = 1L
      var k = 0
      while (k < w) { h += (b(k) & 0xffL) * p; p *= base; k += 1 }
      var min = h
      var i = 1
      while (i <= n - w) {
        h = (h - (b(i - 1) & 0xffL)) / base + (b(i + w - 1) & 0xffL) * topPow
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val min = ctx.freshName("min")
      s"""
        |byte[] $b = $s.getBytes();
        |int $n = $b.length;
        |if ($n < $w) {
        |  ${ev.isNull} = true;
        |} else {
        |  long $h = 0L;
        |  long $p = 1L;
        |  for (int $k = 0; $k < $w; $k++) { $h += ($b[$k] & 0xffL) * $p; $p *= ${base}L; }
        |  long $min = $h;
        |  for (int $i = 1; $i <= $n - $w; $i++) {
        |    $h = ($h - ($b[$i - 1] & 0xffL)) / ${base}L + ($b[$i + $w - 1] & 0xffL) * ${topPow}L;
        |    if ($h < $min) $min = $h;
        |  }
        |  ${ev.value} = $min;
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_rolling_min_hash"
}

object TextExpressions {
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "graft_rolling_min_hash"),
      (es: Seq[Expression]) => {
        require(es.length == 3,
          s"graft_rolling_min_hash(text, window, base) takes 3 arguments, got ${es.length}")
        require(es(1).foldable && es(2).foldable,
          "graft_rolling_min_hash window and base must be literal")
        RollingMinHash(es(0),
          es(1).eval().toString.toInt, es(2).eval().toString.toLong)
      }))

  /** Requires a session built with [[graft.GraftExtensions]]. */
  def rollingMinHash(text: org.apache.spark.sql.Column, w: Int,
      base: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function("graft_rolling_min_hash", text, lit(w), lit(base))
  }

  /** The identical window polynomial as ANSI SQL (per-character ascii —
    * equals the expression's byte arithmetic on ASCII text), for the
    * DuckDB oracle. Renders the O(n·w) non-rolling form; exact same
    * integers, different cost model. */
  def rollingMinHashSql(textExpr: String, w: Int, base: Long): String = {
    val poly = (0 until w).map { k =>
      val p = BigInt(base).pow(k)
      s"CAST(ascii(substr($textExpr, i+$k, 1)) AS BIGINT) * $p"
    }.mkString(" + ")
    s"CASE WHEN length($textExpr) >= $w THEN " +
      s"list_min(list_transform(range(1, length($textExpr) - ${w - 2}), i -> $poly)) END"
  }
}

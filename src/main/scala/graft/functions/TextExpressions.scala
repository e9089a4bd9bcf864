package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
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

/** One-pass native kernel behind [[RepetitionStats]]: whitespace tokens →
  * (duplicate-token fraction, top-bigram fraction) with two hash maps.
  *
  * Bit-identical to the Catalyst HOF formulation in
  * `TextStats.duplicateTokenFractionOfTokens` / `topRunFraction`
  * (LlmOpsSpec asserts it): the split is the same regex split Spark's
  * `split(text, " ", -1)` performs, the max run of a SORTED bigram array
  * equals the max bigram multiplicity counted here, and both final
  * divisions are single exact-int-to-double IEEE ops. The difference is
  * cost: the HOF chain (transform + array_sort + aggregate with a struct
  * accumulator) is interpreted per ELEMENT and O(n log n); this is O(n)
  * compiled JVM — STRESS.md measured the HOF form as the corpus scan's
  * dominant CPU at 64× scale. */
object RepetitionKernel {
  val schema: StructType = StructType(Seq(
    StructField("dup_token_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  def compute(s: UTF8String): InternalRow = {
    val toks = s.split(Space, -1)
    val n = toks.length // split(-1) never yields an empty array: "" → [""]
    val seen = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) { seen.add(toks(i)); i += 1 }
    val dup = (n - seen.size).toDouble / n
    var top = 0.0
    if (n >= 2) {
      val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
      var best = 0
      var j = 0
      while (j < n - 1) {
        val bg = UTF8String.concatWs(Space, toks(j), toks(j + 1))
        val prev = counts.get(bg)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(bg, c)
        if (c > best) best = c
        j += 1
      }
      top = best.toDouble / (n - 1)
    }
    new GenericInternalRow(Array[Any](dup, top))
  }
}

/** Textbook Jaro–Winkler similarity — the edit-distance-free string
  * comparator record linkage was built on (Winkler's census matcher):
  * tolerant of transpositions and OCR-style swaps where Levenshtein
  * charges full price, with the common-prefix bonus that fits
  * identifier-shaped keys (names, codes).
  *
  * Conventions — chosen to be BIT-IDENTICAL to DuckDB's
  * `jaro_winkler_similarity` (verified on 14 000 cross-alphabet cases
  * while designing the oracle):
  *  - either side empty → 0.0 (even both-empty);
  *  - match window ⌊max(|a|,|b|)/2⌋ − 1, floored at 0;
  *  - transpositions = half the matched-but-misaligned count;
  *  - Jaro j = (m/|a| + m/|b| + (m−t)/m) / 3 evaluated in exactly that
  *    association order (every operand an exact small-int-to-double);
  *  - Winkler bonus j + ℓ·0.1·(1−j) (prefix ℓ ≤ 4) only when j > 0.7.
  *
  * Byte-level (UTF-8): identical to per-character arithmetic on ASCII
  * corpora (the [[RollingMinHash]] convention). O(|a|·window) compiled
  * JVM per pair via a static kernel call from generated code — usable as
  * a [[graft.operators.BlockingJoin]] score without leaving whole-stage
  * codegen. */
object JaroWinklerKernel {
  def similarity(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.getBytes
    val b = s2.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && a(i) == b(j)) { m1(i) = true; m2(j) = true; m += 1; matched = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val j0 = (md / l1 + md / l2 + (m - t / 2).toDouble / md) / 3.0
    if (j0 > 0.7) {
      val maxL = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxL && a(l) == b(l)) l += 1
      j0 + l * 0.1 * (1.0 - j0)
    } else j0
  }
}

/** One-pass token-multiplicity stats: n_tokens, n_types (distinct), and
  * the repeated-ordered-pair count Σc(c−1) behind the Gini–Simpson
  * diversity index. Semantics ≡ the HOF route (sort the whitespace token
  * array, fold run lengths — [[graft.llmops.TextStats.repeatPairsOfSorted]];
  * LlmOpsSpec asserts the equivalence), but ONE hash-counting pass in
  * compiled JVM instead of an interpreted sort + per-element lambda
  * fold: the HOF form measured 56 s at the 64× corpus (STRESS.md r8),
  * all of it CodegenFallback dispatch — the same wall the r7 repetition
  * kernel removed. */
object TokenDiversityKernel {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("pairs", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  def compute(s: UTF8String): InternalRow = {
    val toks = s.split(Space, -1)
    val n = toks.length // split(-1) never yields an empty array: "" → [""]
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n) {
      val prev = counts.get(toks(i))
      counts.put(toks(i), if (prev == null) 1 else prev.intValue() + 1)
      i += 1
    }
    var pairs = 0L
    val it = counts.values.iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      pairs += c * (c - 1)
    }
    new GenericInternalRow(Array[Any](n.toLong, counts.size.toLong, pairs))
  }
}

/** `graft_token_diversity(text)` → struct(n_tokens, n_types, pairs) via
  * [[TokenDiversityKernel]]. */
case class TokenDiversity(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = TokenDiversityKernel.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenDiversityKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenDiversityKernel.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_token_diversity"
}

/** `graft_jaro_winkler(a, b)` → double via [[JaroWinklerKernel]]. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.JaroWinklerKernel.similarity($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jaro_winkler"
}

/** `graft_repetition_stats(text)` → struct(dup_token_frac,
  * top_bigram_frac) via [[RepetitionKernel]]. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = RepetitionKernel.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RepetitionKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RepetitionKernel.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_repetition_stats"
}

/** Content-defined chunk boundaries (FastCDC/rsync-style): cut offsets
  * c = i + w for every w-byte window position i whose rolling polynomial
  * hash h(i) = Σ_{k<w} byte(i+k)·base^k has (h & mask) == 0. Cutting on
  * CONTENT instead of fixed offsets makes chunk identity shift-robust:
  * inserting one byte re-chunks only the window it lands in, so chunk-
  * level dedup still matches everything downstream of the edit (the same
  * shift-robustness argument as [[RollingMinHash]], applied to dedup of
  * large/binary payloads rather than fingerprinting). Same exact-integer
  * rolling update, same < 2^53 bound, engine-reproducible. Average chunk
  * length ≈ 1/(P(h & mask == 0)) ≈ mask+1 bytes for mixing hashes.
  * Returns an ascending int array of 0-based cut offsets (possibly
  * empty — a document shorter than w, or with no qualifying window, is
  * one whole chunk).
  */
case class CdcBoundaries(child: Expression, w: Int, base: Long, mask: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 2 && w <= 16, s"window must be 2..16 bytes, got $w")
  require(base > 1, s"base must be > 1, got $base")
  require(mask > 0, s"mask must be positive, got $mask")
  require(255.0 * math.pow(base.toDouble, (w - 1).toDouble) * w < math.pow(2.0, 53.0),
    s"w=$w base=$base overflows exact-integer range")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val topPow: Long = {
    var p = 1L; var k = 0
    while (k < w - 1) { p *= base; k += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val n = b.length
    if (n < w) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Int])
    else {
      val cuts = new Array[Int](n - w + 1)
      var cnt = 0
      var h = 0L
      var p = 1L
      var k = 0
      while (k < w) { h += (b(k) & 0xffL) * p; p *= base; k += 1 }
      if ((h & mask) == 0L) { cuts(cnt) = w; cnt += 1 }
      var i = 1
      while (i <= n - w) {
        h = (h - (b(i - 1) & 0xffL)) / base + (b(i + w - 1) & 0xffL) * topPow
        if ((h & mask) == 0L) { cuts(cnt) = i + w; cnt += 1 }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(cuts, cnt))
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
      val cuts = ctx.freshName("cuts")
      val cnt = ctx.freshName("cnt")
      s"""
        |byte[] $b = $s.getBytes();
        |int $n = $b.length;
        |if ($n < $w) {
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[0]);
        |} else {
        |  int[] $cuts = new int[$n - $w + 1];
        |  int $cnt = 0;
        |  long $h = 0L;
        |  long $p = 1L;
        |  for (int $k = 0; $k < $w; $k++) { $h += ($b[$k] & 0xffL) * $p; $p *= ${base}L; }
        |  if (($h & ${mask}L) == 0L) { $cuts[$cnt++] = $w; }
        |  for (int $i = 1; $i <= $n - $w; $i++) {
        |    $h = ($h - ($b[$i - 1] & 0xffL)) / ${base}L + ($b[$i + $w - 1] & 0xffL) * ${topPow}L;
        |    if (($h & ${mask}L) == 0L) { $cuts[$cnt++] = $i + $w; }
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |    java.util.Arrays.copyOf($cuts, $cnt));
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_cdc_boundaries"
}

object TextExpressions {
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => {
        require(es.length == 2,
          s"graft_jaro_winkler(a, b) takes 2 arguments, got ${es.length}")
        JaroWinklerSimilarity(es(0), es(1))
      }),
    (FunctionIdentifier("graft_rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "graft_rolling_min_hash"),
      (es: Seq[Expression]) => {
        require(es.length == 3,
          s"graft_rolling_min_hash(text, window, base) takes 3 arguments, got ${es.length}")
        require(es(1).foldable && es(2).foldable,
          "graft_rolling_min_hash window and base must be literal")
        RollingMinHash(es(0),
          es(1).eval().toString.toInt, es(2).eval().toString.toLong)
      }),
    (FunctionIdentifier("graft_token_diversity"),
      new ExpressionInfo(classOf[TokenDiversity].getName, "graft_token_diversity"),
      (es: Seq[Expression]) => {
        require(es.length == 1,
          s"graft_token_diversity(text) takes 1 argument, got ${es.length}")
        TokenDiversity(es(0))
      }),
    (FunctionIdentifier("graft_repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "graft_repetition_stats"),
      (es: Seq[Expression]) => {
        require(es.length == 1,
          s"graft_repetition_stats(text) takes 1 argument, got ${es.length}")
        RepetitionStats(es(0))
      }),
    (FunctionIdentifier("graft_cdc_boundaries"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "graft_cdc_boundaries"),
      (es: Seq[Expression]) => {
        require(es.length == 4,
          s"graft_cdc_boundaries(text, window, base, mask) takes 4 arguments, got ${es.length}")
        require(es(1).foldable && es(2).foldable && es(3).foldable,
          "graft_cdc_boundaries window, base, and mask must be literal")
        CdcBoundaries(es(0), es(1).eval().toString.toInt,
          es(2).eval().toString.toLong, es(3).eval().toString.toLong)
      }))

  /** Requires a session built with [[graft.GraftExtensions]]. */
  def rollingMinHash(text: org.apache.spark.sql.Column, w: Int,
      base: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function("graft_rolling_min_hash", text, lit(w), lit(base))
  }

  /** Requires a session built with [[graft.GraftExtensions]]. */
  def tokenDiversity(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("graft_token_diversity", text)
  }

  /** Requires a session built with [[graft.GraftExtensions]]. */
  def jaroWinkler(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("graft_jaro_winkler", a, b)
  }

  /** Requires a session built with [[graft.GraftExtensions]]. */
  def repetitionStats(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("graft_repetition_stats", text)
  }

  /** Requires a session built with [[graft.GraftExtensions]]. */
  def cdcBoundaries(text: org.apache.spark.sql.Column, w: Int, base: Long,
      mask: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function("graft_cdc_boundaries", text, lit(w), lit(base), lit(mask))
  }

  /** The identical per-window polynomial-and-mask cut rule as ANSI SQL
    * (1-based positions; equals the expression's byte arithmetic on
    * ASCII text): an ascending list of 0-based cut offsets. */
  def cdcBoundariesSql(textExpr: String, w: Int, base: Long, mask: Long): String = {
    val poly = (0 until w).map { k =>
      val p = BigInt(base).pow(k)
      s"CAST(ascii(substr($textExpr, i+$k, 1)) AS BIGINT) * $p"
    }.mkString(" + ")
    s"CASE WHEN length($textExpr) >= $w THEN " +
      s"list_filter(list_transform(range(1, length($textExpr) - ${w - 2}), " +
      s"i -> CASE WHEN (($poly) & $mask) = 0 THEN i + ${w - 1} END), x -> x IS NOT NULL) " +
      s"ELSE [] END"
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

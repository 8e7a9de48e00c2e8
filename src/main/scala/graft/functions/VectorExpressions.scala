package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}

/** Native Catalyst expression for float-vector dot products (builder-prompt
  * preference order (b): a codegen'd `Expression` beats the interpreted
  * higher-order-function formulation `aggregate(zip_with(...))`, which
  * evaluates a lambda per element per row).
  *
  * Semantics: each float is widened to double (IEEE-exact) and products are
  * accumulated left-to-right — bit-identical to the HOF fold it replaces and
  * to the DuckDB oracle's `list_dot_product(CAST(v AS DOUBLE[]), ...)`, so
  * swapping it in changes plans, not results. Null if either array is null;
  * array lengths are expected equal (fixture vectors are fixed-dim 64).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** [[FloatVectorDot]]'s `array<double>` sibling, for vectors DERIVED in
  * the engine (iterated k-means centroids are 4-dp doubles — narrowing
  * them to float would diverge from the DuckDB oracle's `DOUBLE[]`
  * arithmetic). Same left-to-right accumulation, same codegen shape. */
case class DoubleVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Native codegen MaxSim score (ColBERT-style late interaction):
  * Σᵢ q6(maxⱼ cos(qᵢ, dⱼ)) over `subs` sub-vectors of `subDim` dims each —
  * the compiled subs×subs double loop replacing the interpreted
  * `aggregate(transform(zip_with(slice…)))` tree (HOF lambdas are
  * CodegenFallback; VERDICT r10 item 1 measured the family at ~18.6 s).
  *
  * Bit-identical to the HOF formulation it replaces, term by term:
  *  - each sub-dot is the [[FloatVectorDot]] fold (floats widened to
  *    double, left-to-right over k);
  *  - each sub-cosine divides by the PRODUCT `qsn[i] * sn[j]` (one
  *    multiply, then one divide — the oracle's association);
  *  - the max over j replicates `array_max`'s nanSafeCompareDoubles
  *    semantics via strict `>` with first-wins ties (inputs are finite
  *    and non-NaN by the caller's zero-sub-norm guard);
  *  - each max is 6-dp floor-quantized `floor(m·10⁶ + 0.5) / 10⁶` (the
  *    SQL path floors to BIGINT then true-divides; scores are ≪ 2⁵³ so
  *    the double↔long round-trip is exact);
  *  - the sum over i is a left-to-right fold of the quantized terms.
  * Swapping it in changes plans, not results — `q_maxsim` family hashes
  * are pinned unchanged in CORRECTNESS_r11.
  *
  * Children: qv `array<float>`, qsn `array<double>`, v `array<float>`,
  * sn `array<double>`. Null if any input is null; arrays are expected to
  * hold `subs·subDim` floats / `subs` norms (guarded upstream). */
case class MaxSimScore(first: Expression, second: Expression,
    third: Expression, fourth: Expression, subs: Int, subDim: Int)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType),
    ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any, c: Any, e: Any): Any = {
    val qv = a.asInstanceOf[ArrayData]
    val qsn = b.asInstanceOf[ArrayData]
    val v = c.asInstanceOf[ArrayData]
    val sn = e.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < subs) {
      var best = 0.0
      var j = 0
      while (j < subs) {
        var dot = 0.0
        var k = 0
        while (k < subDim) {
          dot += qv.getFloat(i * subDim + k).toDouble *
            v.getFloat(j * subDim + k).toDouble
          k += 1
        }
        val cur = dot / (qsn.getDouble(i) * sn.getDouble(j))
        if (j == 0 || cur > best) best = cur
        j += 1
      }
      acc += math.floor(best * 1000000.0 + 0.5) / 1000000.0
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qv, qsn, v, sn) => {
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val dot = ctx.freshName("dot")
      val cur = ctx.freshName("cur")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $subs; $i++) {
         |  double $best = 0.0;
         |  for (int $j = 0; $j < $subs; $j++) {
         |    double $dot = 0.0;
         |    for (int $k = 0; $k < $subDim; $k++) {
         |      $dot += (double) $qv.getFloat($i * $subDim + $k)
         |            * (double) $v.getFloat($j * $subDim + $k);
         |    }
         |    double $cur = $dot / ($qsn.getDouble($i) * $sn.getDouble($j));
         |    if ($j == 0 || $cur > $best) $best = $cur;
         |  }
         |  $acc += java.lang.Math.floor($best * 1000000.0 + 0.5) / 1000000.0;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): MaxSimScore =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Compiled common-prefix length of two string-array suffixes:
  * `TokenLcp(a, b, pa, pb)` = the number of matching tokens of
  * `a[pa..]` vs `b[pb..]` (0-based starts) — the per-adjacent-pair LCP
  * of the suffix-array dedup rung (`ops.SuffixOps`). A HOF formulation
  * (`transform(sequence(0, m-1), …)` + `array_position`) would evaluate
  * interpreted lambdas per token per pair — the cost class
  * [[MaxSimScore]]/[[FloatVectorDot]] exist to avoid; this is the same
  * compiled-loop discipline on UTF8String equality.
  *
  * Null if any input is null. Out-of-range starts yield 0. Null array
  * ELEMENTS terminate the match (tokens are non-null by construction —
  * split() output). */
case class TokenLcp(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType),
    IntegerType, IntegerType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any, pa: Any, pb: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val i0 = pa.asInstanceOf[Int]
    val j0 = pb.asInstanceOf[Int]
    val n = math.min(x.numElements() - i0, y.numElements() - j0)
    var c = 0
    while (c < n &&
        !x.isNullAt(i0 + c) && !y.isNullAt(j0 + c) &&
        x.getUTF8String(i0 + c) == y.getUTF8String(j0 + c)) {
      c += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, pa, pb) => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements() - $pa,
         |                            $b.numElements() - $pb);
         |int $c = 0;
         |while ($c < $n &&
         |    !$a.isNullAt($pa + $c) && !$b.isNullAt($pb + $c) &&
         |    $a.getUTF8String($pa + $c).equals($b.getUTF8String($pb + $c))) {
         |  $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): TokenLcp =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Compiled interval-mask of a token array: `TokenMask(ws, los, his)`
  * keeps `ws(i)` iff no interval `[los(j), his(j))` covers `i` — the
  * materialization step of the exact-substring enforcement rung
  * (`ops.SuffixOps.spanEnforce`). The HOF formulation it replaces
  * (`filter(ws, (x, i) -> NOT exists(ivs, …))`) evaluates an
  * interpreted lambda per token PER INTERVAL — O(T·I) in the cost
  * class [[MaxSimScore]]/[[TokenLcp]] exist to avoid, on the one path
  * that touches every token of the curated corpus. The intervals
  * arrive SORTED AND DISJOINT (merged islands), so a single two-pointer
  * walk is O(T+I) — compiled, order-preserving, and trivially
  * equal-by-construction to the exists() predicate.
  *
  * Null if any input is null (the caller's `when(ivs.isNull, ws)`
  * branch handles the no-interval docs). Token elements are non-null
  * by construction (filtered split() output). */
case class TokenMask(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType),
    ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val ws = a.asInstanceOf[ArrayData]
    val los = b.asInstanceOf[ArrayData]
    val his = c.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val m = los.numElements()
    val out = new Array[AnyRef](n)
    var k = 0
    var j = 0
    var i = 0
    while (i < n) {
      while (j < m && his.getLong(j) <= i) j += 1
      if (!(j < m && i >= los.getLong(j))) {
        out(k) = ws.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ws, los, his) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $ws.numElements();
         |int $m = $los.numElements();
         |Object[] $out = new Object[$n];
         |int $k = 0;
         |int $j = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  while ($j < $m && $his.getLong($j) <= (long) $i) $j++;
         |  if (!($j < $m && (long) $i >= $los.getLong($j))) {
         |    $out[$k++] = $ws.getUTF8String($i);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TokenMask =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorExpressions {
  /** Dot product of two `array<float>` columns, accumulated in double. */
  def floatDot(a: Column, b: Column): Column =
    Bridge.column(FloatVectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Dot product of two `array<double>` columns. */
  def doubleDot(a: Column, b: Column): Column =
    Bridge.column(DoubleVectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Common-prefix token count of a[pa..] vs b[pb..] (0-based starts). */
  def tokenLcp(a: Column, b: Column, pa: Column, pb: Column): Column =
    Bridge.column(TokenLcp(Bridge.expression(a), Bridge.expression(b),
      Bridge.expression(pa), Bridge.expression(pb)))

  /** Compiled MaxSim late-interaction score of (qv, qsn) × (v, sn). */
  def maxsimScore(qv: Column, qsn: Column, v: Column, sn: Column,
      subs: Int, subDim: Int): Column =
    Bridge.column(MaxSimScore(Bridge.expression(qv), Bridge.expression(qsn),
      Bridge.expression(v), Bridge.expression(sn), subs, subDim))

  /** Tokens of ws surviving the sorted disjoint mask intervals
    * [los(j), his(j)) — compiled two-pointer walk. */
  def tokenMask(ws: Column, los: Column, his: Column): Column =
    Bridge.column(TokenMask(Bridge.expression(ws), Bridge.expression(los),
      Bridge.expression(his)))
}

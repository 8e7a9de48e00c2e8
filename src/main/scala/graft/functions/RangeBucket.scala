package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Order-aligned bucket id from sampled range bounds — the codegen'd
  * replacement for the literal binary-search CASE tree the suffix-array
  * rank phases used (`ops.SuffixOps.withRangeBuckets`). Semantics are
  * identical: with `bounds` sorted lexicographically, the bucket is the
  * FIRST index `i` with `key <= bounds(i)` (lexicographic on the long
  * key tuple), or `bounds.length` when the key is above every bound — a
  * lower-bound binary search, ⌈log₂(bounds+1)⌉ compiled comparisons per
  * row. A pure function of the row's own key: no physical-partitioning
  * dependence (the AQE reused-exchange hazard SCALE.md documents), and
  * equal keys share a bucket by construction.
  *
  * Why an expression and not the CASE tree: 255 nested `CASE WHEN`s
  * exceed the janino method budget, so the whole Project fell out of
  * WholeStageCodegen (interpreted per-row evaluation of every rank
  * phase's hot pass — the cost class [[MaxSimScore]]/[[TokenLcp]] exist
  * to avoid). Here the bounds ride along as ONE referenced `long[][]`
  * and the search is a compiled loop inside the stage.
  *
  * Children are the key columns, all LongType (callers cast integral
  * keys); null if any key part is null (never on the SA frames). Each
  * `bounds` row must have the same arity as `keys`.
  */
case class SampledRangeBucket(keys: Seq[Expression], bounds: Seq[Seq[Long]])
    extends Expression with ExpectsInputTypes {

  require(keys.nonEmpty, "SampledRangeBucket needs at least one key column")
  require(bounds.forall(_.length == keys.length),
    "every bounds row must match the key arity")

  override def children: Seq[Expression] = keys
  override def inputTypes = Seq.fill(keys.length)(LongType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = keys.exists(_.nullable)
  override def prettyName: String = "sampled_range_bucket"

  /** Bounds as primitive arrays for the search (rebuilt after
    * serialization to executors; `bounds` stays a Seq for case-class
    * structural equality / canonicalization). */
  @transient private lazy val bnds: Array[Array[Long]] =
    bounds.map(_.toArray).toArray

  // key <= bound, lexicographic
  private def leq(k: Array[Long], b: Array[Long]): Boolean = {
    var i = 0
    while (i < k.length) {
      if (k(i) < b(i)) return true
      if (k(i) > b(i)) return false
      i += 1
    }
    true
  }

  override def eval(input: InternalRow): Any = {
    val k = new Array[Long](keys.length)
    var i = 0
    while (i < keys.length) {
      val v = keys(i).eval(input)
      if (v == null) return null
      k(i) = v.asInstanceOf[Long]
      i += 1
    }
    var lo = 0
    var hi = bnds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (leq(k, bnds(mid))) hi = mid else lo = mid + 1
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = keys.map(_.genCode(ctx))
    val ref = ctx.addReferenceObj("bounds", bnds, "long[][]")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val b = ctx.freshName("b")
    val le = ctx.freshName("le")
    // lexicographic key <= b, first differing part decides
    def cmp(i: Int): String =
      if (i == keys.length - 1) s"$le = ${evals(i).value} <= $b[$i];"
      else
        s"""if (${evals(i).value} < $b[$i]) { $le = true; }
           |else if (${evals(i).value} > $b[$i]) { $le = false; }
           |else { ${cmp(i + 1)} }""".stripMargin
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    ev.copy(code =
      code"""
        |$childCode
        |boolean ${ev.isNull} = $anyNull;
        |int ${ev.value} = 0;
        |if (!${ev.isNull}) {
        |  int $lo = 0;
        |  int $hi = $ref.length;
        |  while ($lo < $hi) {
        |    int $mid = ($lo + $hi) >>> 1;
        |    long[] $b = $ref[$mid];
        |    boolean $le;
        |    ${cmp(0)}
        |    if ($le) $hi = $mid; else $lo = $mid + 1;
        |  }
        |  ${ev.value} = $lo;
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampledRangeBucket =
    copy(keys = newChildren)
}

object RangeBucket {
  /** Bucket id of the lexicographic long-tuple key among sampled sorted
    * bounds (see [[SampledRangeBucket]]). Callers cast keys to long. */
  def sampledRangeBucket(keys: Seq[Column], bounds: Seq[Seq[Long]]): Column =
    Bridge.column(SampledRangeBucket(keys.map(Bridge.expression), bounds))
}

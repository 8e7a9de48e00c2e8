package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash over a word array as one native Catalyst expression.
  *
  * Bit-identical to the SQL formulation it replaces
  * (`explode(words) → md5(word) → 16 × sum(substring(h,i,1) >= '8' ? 1 : -1)
  * → sign vector`, still stated by the DuckDB oracle): hex digit `i` of a
  * word's md5 contributes ±1 to bit `i` by `digit >= '8'` — i.e. nibble
  * ≥ 8 — and the fingerprint bit is `sum >= 0`. One compiled loop per
  * document replaces a words-cardinality row explosion plus 16 partial
  * aggregates; the only remaining shuffle in the dedup query is the tiny
  * one-row-per-doc fingerprint groupBy.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  // null also for EMPTY word arrays: the explode formulation emits no row
  // for a wordless doc, so no fingerprint is the faithful scalar analogue
  // (an all-zero count vector would silently cluster empty docs together)
  override def nullable: Boolean = true

  // per-task instance (plans deserialize per task; eval is single-threaded
  // there) — per-row getInstance would pay a JCA lookup in the hot loop.
  // digest() resets the instance, so no explicit reset is needed.
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Int](16)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // mirror the SQL formulation's `when(digit >= '8', 1).otherwise(-1)`:
        // a null word's null digits all fall to the otherwise(-1) arm
        var j = 0
        while (j < 16) { counts(j) -= 1; j += 1 }
      } else {
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        // first 16 hex digits = first 8 digest bytes, high nibble first;
        // hex digit >= '8' ⟺ nibble >= 8 (ASCII: '8'..'9' < 'a'..'f')
        var j = 0
        while (j < 16) {
          val nibble =
            if ((j & 1) == 0) (digest(j >> 1) >> 4) & 0xF
            else digest(j >> 1) & 0xF
          counts(j) += (if (nibble >= 8) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      out(j) = if (counts(j) >= 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  def simhash(words: Column): Column =
    Bridge.column(SimHash16(Bridge.expression(words)))
}

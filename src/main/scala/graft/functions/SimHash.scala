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

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](16)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    val n = arr.numElements()
    while (i < n) {
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
      md.reset()
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

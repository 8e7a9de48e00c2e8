package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mapPartitions decode-stub path must agree with the pure-expression
  * metadata path (same deterministic fake decode). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("mediaDecode (mapPartitions) equals multimodalMeta (expressions)") {
    val cols = Seq("doc_id", "n_bytes", "content_md5", "fake_width", "fake_height")
    val a = ops.Multimodal.mediaDecode(spark, sf)
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    val b = ops.Multimodal.multimodalMeta(spark, sf)
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}

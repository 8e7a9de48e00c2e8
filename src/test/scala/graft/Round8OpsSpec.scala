package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operators: Poisson-bootstrap CI, Dunning LLR keyness,
  * hashing-trick featurization, matryoshka-truncation audit. */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("bootstrap CI straddles the sample mean with sane width") {
    val rows = ops.Statistics.bootstrapCi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val mean = r.getDouble(2)
      val b = r.getLong(3); val lo = r.getDouble(4); val hi = r.getDouble(5)
      assert(b === 48L)
      assert(lo < hi, s"${r.getString(0)}: degenerate CI [$lo, $hi]")
      assert(lo <= mean && mean <= hi,
        s"${r.getString(0)}: mean $mean outside CI [$lo, $hi]")
      // Poisson-bootstrap CI width scales like sigma/sqrt(n); the event
      // values are O(100) with sigma O(50), so the width at n~200 must be
      // single-digit — a 0 or a 100 here would mean broken weights
      val width = hi - lo
      assert(width > 0.1 && width < mean,
        s"${r.getString(0)}: implausible CI width $width (n=$n)")
    }
  }

  test("LLR keyness ranks only overrepresented terms, 5 per language") {
    val rows = ops.TextAnalysis.llrTerms(spark, sf).collect()
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length),
        s"$lang: ranks not contiguous")
      assert(rs.length <= 5)
      rs.foreach { r =>
        assert(r.getLong(3) <= r.getLong(4), s"$lang/${r.getString(2)}: k11 > n_word")
        assert(r.getDouble(5) > 0.0, s"$lang/${r.getString(2)}: non-positive LLR")
      }
      // within a language the list is sorted by llr desc
      val llrs = rs.sortBy(_.getInt(1)).map(_.getDouble(5)).toSeq
      assert(llrs === llrs.sortBy(-_), s"$lang: not sorted by llr")
    }
  }

  test("feature hashing conserves token mass across 64 buckets") {
    import org.apache.spark.sql.functions._
    val rows = ops.TrainingPrep.featureHash(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    val totalTokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(rows.map(_.getLong(2)).sum === totalTokens, "token mass not conserved")
    rows.foreach { r =>
      assert(math.abs(r.getLong(3)) <= r.getLong(2), "signed sum exceeds mass")
      assert(r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(2), "terms vs tokens")
    }
  }

  test("matryoshka audit: overlap in [0,5], k pinned, probes = corpus/50") {
    val rows = ops.Similarity.matryoshkaAudit(spark, sf).collect()
    val nProbes = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0).count()
    assert(rows.length.toLong === nProbes)
    rows.foreach { r =>
      assert(r.getLong(1) === 5L)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 5L)
    }
    // the 16-dim prefix must retain SOME signal overall: a total overlap
    // of 0 across every probe means the truncated leg is broken
    assert(rows.map(_.getLong(2)).sum > 0L, "prefix ranking shares nothing with full")
  }

  test("zorder pruning: non-leading predicate prunes under zorder, not under value sort") {
    val rows = ops.Evaluation.zorderPruning(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.size === 4)
    val (nfL, scanLinBy, _, matchLinBy) = rows(("value_sorted", "by_8_11"))
    val (nfZ, scanZBy, _, matchZBy) = rows(("zorder", "by_8_11"))
    // identical matched rows per predicate regardless of layout
    assert(matchLinBy === matchZBy)
    assert(rows(("value_sorted", "bx_8_15"))._4 === rows(("zorder", "bx_8_15"))._4)
    assert(nfL === nfZ)
    // the value sort cannot prune the hour-only query (every file spans
    // all hours); the Morton layout must prune it strictly
    assert(scanLinBy === nfL, s"value-sorted unexpectedly pruned hour query: $scanLinBy/$nfL")
    assert(scanZBy < nfZ, s"zorder failed to prune hour query: $scanZBy/$nfZ")
    // and the leading-column query still prunes under BOTH layouts
    assert(rows(("value_sorted", "bx_8_15"))._2 < nfL)
    assert(rows(("zorder", "bx_8_15"))._2 < nfZ)
  }
}

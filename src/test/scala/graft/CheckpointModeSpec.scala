package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reliable-checkpoint opt-in (graft.util.Ckpt, VERDICT round-3 item 6):
  * with `spark.graft.checkpoint.dir` set, iterative/multi-branch ops
  * stage through durable checkpoint files instead of executor-local
  * blocks — and produce bit-identical results in both modes. */
class CheckpointModeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val sf = TestSpark.Sf

  private def withReliable[T](body: => T): (T, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try (body, dir)
    finally spark.conf.unset("spark.graft.checkpoint.dir")
  }

  test("dedup clusters: identical labels in local and reliable mode, files written") {
    val local = ops.Dedup.dedupClusters(spark, sf).collect().toSeq.map(_.toSeq)
    val (reliable, dir) = withReliable {
      ops.Dedup.dedupClusters(spark, sf).collect().toSeq.map(_.toSeq)
    }
    assert(reliable == local)
    // the staging actually went through the durable path
    def count(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(count).sum else 1
    assert(count(new java.io.File(dir)) > 0, s"no checkpoint files under $dir")
  }

  test("ngram jaccard: identical pairs in local and reliable mode") {
    val local = ops.Dedup.ngramJaccard(spark, sf).collect().toSeq.map(_.toSeq)
    val (reliable, _) = withReliable {
      ops.Dedup.ngramJaccard(spark, sf).collect().toSeq.map(_.toSeq)
    }
    assert(reliable == local)
  }

  test("similarity ivf: identical assignments in local and reliable mode") {
    val local = ops.Similarity.annIvf(spark, sf).collect().toSeq.map(_.toSeq)
    val (reliable, _) = withReliable {
      ops.Similarity.annIvf(spark, sf).collect().toSeq.map(_.toSeq)
    }
    assert(reliable == local)
  }
}

package graft

import graft.ops.{Curation, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the corpus-curation operators — properties the
  * DuckDB hash-compare can't express (it proves engine parity, not that
  * the result means what the operator claims). */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.session
  private val sf = TestSpark.Sf

  test("clusterRep picks exactly one representative per cluster, and it has the cluster's max n_chars") {
    val rep = Curation.clusterRep(spark, sf).cache()
    val perCluster = rep.groupBy("cluster")
      .agg(sum("is_rep").as("n_reps"),
        max("n_chars").as("max_chars"),
        max(when(col("is_rep") === 1, col("n_chars"))).as("rep_chars"))
    assert(perCluster.filter(col("n_reps") =!= 1).count() === 0)
    assert(perCluster.filter(col("rep_chars") =!= col("max_chars")).count() === 0)
    // every doc is assigned, exactly once
    val docs = Tables.documents(spark, sf).count()
    assert(rep.count() === docs)
    rep.unpersist()
  }

  test("spanDedup: span counts match ceil(words/10); dup total equals spans minus distinct") {
    val sd = Curation.spanDedup(spark, sf).cache()
    val withWords = Tables.documents(spark, sf)
      .select(col("doc_id"),
        ceil(size(split(col("text"), " ")) / 10.0).cast("long").as("want"))
      .join(sd, "doc_id")
    assert(withWords.filter(col("n_spans") =!= col("want")).count() === 0)
    sd.unpersist()
    // sf0.01's planted near-duplicate docs share 10-word spans across
    // docs; "duplicate = every occurrence beyond the corpus-wide first"
    // means total dup spans == total spans − distinct span texts, which an
    // independent distinct-count confirms
    val sf2 = "/root/testdata/sf0.01"
    val sd2 = Curation.spanDedup(spark, sf2).cache()
    val dupTotal = sd2.agg(sum("n_dup_spans")).head().getLong(0)
    val spanTotal = sd2.agg(sum("n_spans")).head().getLong(0)
    assert(dupTotal > 0, "sf0.01's near-dup docs should share spans")
    val ws = split(col("text"), " ")
    val distinctSpans = Tables.documents(spark, sf2)
      .select(explode(transform(
        sequence(lit(0), (size(ws) + lit(9)).divide(lit(10)).cast("int") - 1),
        i => concat_ws(" ", slice(ws, i * 10 + 1, lit(10))))).as("span"))
      .distinct().count()
    assert(dupTotal === spanTotal - distinctSpans)
    sd2.unpersist()
  }

  test("qualityQuantile keeps exactly ceil(n/4) docs per source") {
    val kept = Curation.qualityQuantile(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    val want = Tables.documents(spark, sf)
      .groupBy("source").agg(ceil(count(lit(1)) / 4.0).cast("long").as("n_want"))
    assert(kept.join(want, "source").filter(col("n_kept") =!= col("n_want")).count() === 0)
    assert(kept.count() === Tables.documents(spark, sf).select("source").distinct().count())
  }

  test("piiRedact finds exactly the planted PII: every 7th doc one email, every 11th one phone") {
    val r = Curation.piiRedact(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select("doc_id")
    val expected = docs.filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0).count()
    assert(r.count() === expected)
    assert(r.filter(col("doc_id") % 7 === 0).filter(col("n_emails") =!= 1).count() === 0)
    assert(r.filter(col("doc_id") % 11 === 0).filter(col("n_phones") =!= 1).count() === 0)
    assert(r.filter(col("doc_id") % 7 =!= 0).filter(col("n_emails") =!= 0).count() === 0)
    r.unpersist()
  }

  test("shardAssign partitions the corpus completely and roughly evenly") {
    val sh = Curation.shardAssign(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(sh.agg(sum("n_docs")).head().getLong(0) === docs)
    val ids = sh.select("shard").collect().map(_.getLong(0))
    assert(ids.forall(i => i >= 0 && i < Curation.NShards))
    // md5 balance: with ~500 docs over 64 shards (mean ~8), a hot shard
    // of > 4x mean would indicate a broken hash, not randomness
    val maxDocs = sh.agg(max("n_docs")).head().getLong(0)
    assert(maxDocs <= 4 * (docs / Curation.NShards).max(1),
      s"shard skew: max $maxDocs for mean ${docs / Curation.NShards}")
    sh.unpersist()
  }

  test("semanticDedup: every similarity pair lands in one cluster; labels are component minima") {
    val clusters = graft.ops.Similarity.semanticDedup(spark, sf).cache()
    // cluster label never exceeds the member id (it is a reachable min)
    assert(clusters.filter(col("cluster") > col("vec_id")).count() === 0)
    // both endpoints of every near-dup pair share a cluster
    val pairs = graft.ops.Similarity.embedNeardup(spark, sf).select("id1", "id2")
    val l1 = clusters.select(col("vec_id").as("id1"), col("cluster").as("c1"))
    val l2 = clusters.select(col("vec_id").as("id2"), col("cluster").as("c2"))
    assert(pairs.join(l1, "id1").join(l2, "id2")
      .filter(col("c1") =!= col("c2")).count() === 0)
    // every vector is labeled exactly once
    assert(clusters.count() === Tables.embeddings(spark, sf).count())
    clusters.unpersist()
  }

  test("kmeansStep: every cell-dim mean has the full membership; members total the corpus") {
    val km = graft.ops.Similarity.kmeansStep(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    // per dim, members across cells sum to the corpus size
    val perDim = km.groupBy("dim").agg(sum("n_members").as("tot"))
    assert(perDim.filter(col("tot") =!= n).count() === 0)
    // all 64 dims present for every cell
    val perCell = km.groupBy("cid").agg(count(lit(1)).as("dims"))
    assert(perCell.filter(col("dims") =!= 64).count() === 0)
    km.unpersist()
  }

  test("kmeansTrain: trained matrix is a valid partition and differs from the single step") {
    val km = graft.ops.Similarity.kmeansTrain(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    // still a partition of the corpus after iteration: per dim, members
    // across cells sum to the corpus size; every surviving cell has all
    // 64 dims
    val perDim = km.groupBy("dim").agg(sum("n_members").as("tot"))
    assert(perDim.filter(col("tot") =!= n).count() === 0)
    val perCell = km.groupBy("cid").agg(count(lit(1)).as("dims"))
    assert(perCell.filter(col("dims") =!= 64).count() === 0)
    // the loop actually moved: at least one (cid, dim) mean changed vs
    // the single Lloyd step (if this ever fails the fixture converged in
    // one step — then the train query is pointless and should say so)
    val step1 = graft.ops.Similarity.kmeansStep(spark, sf)
      .select(col("cid"), col("dim"), col("dim_mean").as("m1"))
    assert(km.join(step1, Seq("cid", "dim"), "left")
      .filter(col("m1").isNull || col("dim_mean") =!= col("m1"))
      .count() > 0)
    km.unpersist()
  }

  test("kAnonymityEnforce releases only equivalence classes of size >= k") {
    val docs = Tables.documents(spark, sf)
    val out = graft.ops.Curation.kAnonymityEnforce(spark, sf).cache()
    // partition: one decision per document
    assert(out.count() === docs.count())
    // THE k-anonymity law: every released QI value identifies >= 10 docs
    val classes = out.filter(col("action") =!= "suppress")
      .groupBy("source", "lang", "bucket_lo", "bucket_hi")
      .agg(count(lit(1)).as("n"))
    assert(classes.filter(col("n") < 10).count() === 0)
    // suppressed rows carry no bounds; released rows carry both, at the
    // width their action implies
    assert(out.filter(col("action") === "suppress")
      .filter(col("bucket_lo").isNotNull || col("bucket_hi").isNotNull).count() === 0)
    assert(out.filter(col("action") =!= "suppress")
      .filter(col("bucket_lo").isNull || col("bucket_hi").isNull).count() === 0)
    assert(out.filter(col("action") === "release")
      .filter(col("bucket_hi") - col("bucket_lo") =!= 100).count() === 0)
    assert(out.filter(col("action") === "generalize")
      .filter(col("bucket_hi") - col("bucket_lo") =!= 500).count() === 0)
    out.unpersist()
  }

  test("annIvfServed from the materialized model is bit-identical to the inline train+serve") {
    val served = graft.ops.Similarity.annIvfServed(spark, sf)
      .collect().map(_.toSeq).toSeq
    val trained = graft.ops.Similarity.annIvfTrained(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served === trained)
    assert(served.nonEmpty)
  }

  test("pqAdcServed from the materialized codes is bit-identical to the inline encode+serve") {
    val served = graft.ops.Similarity.pqAdcServed(spark, sf)
      .collect().map(_.toSeq).toSeq
    val inline = graft.ops.Similarity.pqAdc(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served === inline)
    assert(served.nonEmpty)
  }

  test("annIvfPqServed from all four materialized artifacts is bit-identical to the inline composition") {
    val served = graft.ops.Similarity.annIvfPqServed(spark, sf)
      .collect().map(_.toSeq).toSeq
    val inline = graft.ops.Similarity.annIvfPq(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served === inline)
    assert(served.nonEmpty)
  }

  test("incrementalDedup flags exactly the incoming docs sharing a band bucket with the corpus") {
    val inc = graft.ops.Dedup.incrementalDedup(spark, sf).cache()
    val incoming = Tables.documents(spark, sf).filter(col("source") === "src19")
    assert(inc.count() === incoming.count())
    // first_match is never an incoming doc and only set when flagged
    val srcOf = Tables.documents(spark, sf).select(col("doc_id").as("first_match"), col("source").as("msrc"))
    assert(inc.filter(col("is_dup_vs_corpus") === 1).join(srcOf, "first_match")
      .filter(col("msrc") === "src19").count() === 0)
    assert(inc.filter(col("is_dup_vs_corpus") === 0)
      .filter(col("first_match").isNotNull).count() === 0)
    inc.unpersist()
  }

  test("mixMaterialize allocates exactly each source's floor(weight*epoch) target") {
    val copies = Curation.mixMaterialize(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n_copies"))
    val targets = graft.ops.TrainingPrep.sourceMix(spark, sf)
      .select(col("source"),
        floor(col("weight") * Curation.EpochDocs).cast("long").as("target"))
    val joined = copies.join(targets, "source")
    assert(joined.filter(col("n_copies") =!= col("target")).count() === 0)
  }

  test("curation pipeline funnel is monotone and stages agree with standalone ops") {
    val f = Curation.curationPipeline(spark, sf).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val (raw, ex, q, fin) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw >= ex && ex >= q && q >= fin,
        s"funnel not monotone for ${r.getString(0)}: $raw/$ex/$q/$fin")
      assert(fin >= 0 && (r.getLong(5) >= 0))
    }
    // stage-1 totals must equal the standalone exact dedup's survivor count
    val exTotal = f.map(_.getLong(2)).sum
    assert(exTotal === graft.ops.Dedup.dedupExact(spark, sf).count(),
      "composed stage 1 must match standalone dedupExact")
  }

  test("quantile normalization: uniform [0,1] marginals per source, monotone in quality") {
    val bySrc = ops.Curation.quantileNorm(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getInt(3), r.getDouble(4)))
      .groupBy(_._1)
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._3)
      assert(ordered.head._4 === 0.0, s"$src: lowest rank must normalize to 0")
      assert(math.abs(ordered.last._4 - 1.0) < 1e-9, s"$src: highest rank must normalize to 1")
      // qnorm strictly increases with rank; quality non-decreasing along it
      ordered.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._4 > a._4, s"$src: qnorm not strictly increasing")
          assert(b._2 >= a._2, s"$src: quality not sorted along ranks")
        case _ =>
      }
      // rank-based normalization has an exactly uniform mean: 1/2
      val mean = ordered.map(_._4).sum / ordered.length
      assert(math.abs(mean - 0.5) < 1e-6, s"$src: mean qnorm $mean != 0.5")
    }
  }

  test("DP count: noise bounded by the 32-bit Laplace tail, keyed-deterministic") {
    val truth = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rel = ops.Curation.dpCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rel.map(_._1).toSet === truth.keySet)
    rel.foreach { case (t, eps, noisy) =>
      assert(eps === 1.0)
      // |noise| = (1/eps)|ln(1-2|t|)|; with u quantized to 2^-32 the worst
      // tail is ln(2^33) ~ 22.9
      assert(math.abs(noisy - truth(t)) <= 23.0, s"$t: $noisy vs ${truth(t)}")
      assert(noisy !== truth(t).toDouble, s"$t: mechanism must perturb")
    }
    // keyed noise: a second evaluation releases the identical draw
    val again = ops.Curation.dpCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rel.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }
}

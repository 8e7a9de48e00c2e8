package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TRUE suffix-array exact-substring dedup (closes SURVEY §2's last
  * approximation — VERDICT r10 "What's missing #2": arbitrary-length
  * repeated spans, not the fixed-8-gram two-pass stand-in).
  *
  * The corpus token stream gets a full suffix array built by DISTRIBUTED
  * PREFIX DOUBLING (Manber–Myers; the standard MapReduce/Spark SA
  * construction): round k knows each suffix's rank by its first k tokens,
  * and one equi-join on (doc_id, pos+k) + one dense re-rank doubles that
  * to 2k — ⌈log₂ maxDocLen⌉ rounds total (early-exited once every rank
  * is distinct), each a keyed join plus a SAMPLED-BOUNDS bucketed rank
  * (NEVER an unpartitioned window over the corpus, and never a window
  * whose partition can exceed the sampled-quantile grain: rank within
  * each bounds bucket, broadcast the ≤[[RankBuckets]]-row offset
  * table — see [[denseRank2]]). Suffixes never cross documents (each
  * stops
  * at its doc's end, the Lee et al. "Deduplicating Training Data"
  * setting), so the only row payload wider than three integers — the
  * doc's token array, needed once at the final LCP step — is bounded by
  * DOCUMENT length, not corpus size.
  *
  * Determinism: suffix order is the exact lexicographic order on token
  * sequences (end-of-doc = sentinel rank −1, below every real token —
  * "a" < "a b"), realized identically in DuckDB by sorting the
  * space-joined suffix STRINGS: the space separator (0x20) is below
  * every printable token byte, so string order IS token-sequence order;
  * ties (identical full suffixes, e.g. exact-duplicate docs) break on
  * (doc_id, pos) in both engines. LCPs are exact integer token counts
  * via the compiled [[graft.functions.TokenLcp]] loop.
  *
  * 100 TB shape: prefix doubling is O(log maxlen) rounds of shuffle-join
  * + bucketed sort on (corpus tokens) rows — each round the size of ONE
  * global sort pass, with no all-pairs product anywhere; the adjacent-
  * pair LCP step is a single self-join on consecutive ranks. This is the
  * published distributed SA recipe (Flick & Aluru's pDC/prefix-doubling
  * family) expressed as Catalyst plans.
  */
object SuffixOps {

  /** Range-partition count for the split-key dense rank / row_number
    * phases ([[denseRank2]], [[saTotal]]). */
  private val RankBuckets = 256
  /** Every [[SaStride]]-th suffix rank is emitted by [[suffixArray]]
    * (the audit is a deterministic sample; the FULL order exists and is
    * what [[exactSubstrings]] consumes). */
  private val SaStride = 250
  /** Span-length thresholds reported by [[exactSubstrings]]; 8 is the
    * [[Dedup]] 8-gram passes' grain, so that row is directly comparable
    * to the approximate pipeline it supersedes. */
  private val RepThresholds = Seq(4, 8, 16, 32, 64)

  private def once(df: DataFrame): DataFrame = graft.util.Ckpt.stage(df)

  /** (doc_id, ws) with empty tokens dropped (split(" ") emits "" on
    * repeated separators; every other words() consumer filters them).
    * `array_remove(…, '')` = `filter(…, x -> x <> '')` on split output
    * (split never emits nulls), but ArrayRemove is codegen'd where the
    * filter HOF is CodegenFallback — and this projection feeds every
    * token of the corpus into the SA build and the enforcement cut. */
  private def docWords(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        array_remove(split(col("text"), " "), "").as("ws"))

  /** One row per token position: (doc_id, pos 0-based, tok). */
  private def tokens(s: SparkSession, d: String): DataFrame =
    docWords(s, d).select(col("doc_id"), posexplode(col("ws")))
      .toDF("doc_id", "pos", "tok")

  /** Sample size per output bucket for [[sampleBounds]] — the
    * RangePartitioner convention (~100 sample points per partition
    * bound the max-bucket/ideal ratio to a small constant whp). */
  private val SamplePerBucket = 100

  /** Sampled range boundaries over `keyed` (the key columns only, all
    * integral): a deterministic-seed Bernoulli sample collected to the
    * driver (≤ [[RankBuckets]]·[[SamplePerBucket]] expected rows — a
    * constant, never data-proportional), sorted lexicographically,
    * thinned to the [[RankBuckets]]-quantile points. The caller must
    * pass a STAGED frame (it is consumed once here and once by the
    * rank pass). */
  private def sampleBounds(keyed: DataFrame, n: Long): IndexedSeq[Seq[Long]] = {
    val frac = math.min(1.0,
      (RankBuckets.toDouble * SamplePerBucket) / math.max(n.toDouble, 1.0))
    val s = keyed.sample(withReplacement = false, frac, seed = 42L)
      .collect()
      .map(r => r.toSeq.map(_.asInstanceOf[Number].longValue): Seq[Long])
    if (s.isEmpty) IndexedSeq.empty
    else {
      val sorted = s.sortBy(k => k)(math.Ordering.Implicits.seqOrdering)
      val L = sorted.length
      (1 until RankBuckets).map { i =>
        sorted(math.min(L - 1, math.max(0, (i.toLong * L / RankBuckets).toInt)))
      }
    }
  }

  /** Order-aligned bucket id from sampled bounds, as a PURE FUNCTION OF
    * THE DATA: a lower-bound binary search over the ≤255 boundary keys,
    * compiled by the [[graft.functions.SampledRangeBucket]] codegen
    * expression — ⌈log₂ [[RankBuckets]]⌉ comparisons per row INSIDE
    * WholeStageCodegen (the first shipped cut expanded the search into
    * a 255-node literal CASE tree, which blew the janino method budget
    * and dropped every rank phase's hot Project to interpreted
    * evaluation), and no physical-partitioning dependence. (An earlier
    * cut used `repartitionByRange` + `spark_partition_id()`: under AQE
    * the offs branch and the row branch of the downstream self-join
    * each get their OWN shuffle read of the reused exchange, so the
    * nondeterministic partition id mapped differently on the two
    * branches and the assembled ranks drifted — caught by the sf1
    * sweep. A bucket id computed from the row's own key cannot
    * disagree with itself across branches.) Equal keys share a bucket
    * by construction, so per-bucket ranks compose exactly; ranks
    * depend only on the key ORDER, not on where the sampled bounds
    * fall. */
  private def withRangeBuckets(df: DataFrame, keys: Seq[String], n: Long): DataFrame = {
    val key = keys.map(col)
    val bounds = sampleBounds(df.select(key: _*), n)
    val bkt =
      if (bounds.isEmpty) lit(0)
      else graft.functions.RangeBucket.sampledRangeBucket(
        key.map(_.cast("long")), bounds)
    df.withColumn("bkt", bkt)
  }

  /** Two-phase dense rank of (r1, r2) pairs, 0-based, bucketed by
    * SAMPLED RANGE BOUNDS (VERDICT r11 item 1 — the r11 bucket key
    * `r1 * 256 div tokenCount` collapsed early doubling rounds into
    * bucket 0 because round 1's rank domain is only the vocabulary;
    * sampling the actual key distribution keeps every round's buckets
    * ≈ rows/[[RankBuckets]] regardless of the rank domain): dense_rank
    * within each bucket, plus the cumulative per-bucket distinct-key
    * offsets (≤ [[RankBuckets]] rows, broadcast). Residual skew is
    * value-inherent only: equal keys must co-locate, so a bucket is
    * bounded by max(rows/[[RankBuckets]], hottest-key multiplicity) —
    * for doubling round k the hottest 2k-token prefix count, which
    * decays geometrically in k. `df` must be STAGED by the caller (it
    * feeds both the bounds sample and the rank pass). */
  private[graft] def denseRank2(df: DataFrame, n: Long): DataFrame = {
    val b = withRangeBuckets(df, Seq("r1", "r2"), n)
    val w = Window.partitionBy("bkt").orderBy("r1", "r2")
    val ranked = b.withColumn("dr", dense_rank().over(w))
    // ≤256 bucket rows: the value-domain-bounded unpartitioned window class
    val wb = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = ranked.groupBy("bkt").agg(max("dr").as("cnt"))
      .select(col("bkt"), (sum("cnt").over(wb) - col("cnt")).as("off"))
    ranked.join(broadcast(offs), "bkt")
      .select(col("doc_id"), col("pos"), (col("off") + col("dr") - 1).as("rank"))
  }

  /** Per-round construction telemetry for the partition-balance gate
    * ([[graft.SuffixArrayBalanceSpec]]) and SCALE.md's round curve:
    * doubling round, prefix length k entering the round, rank
    * cardinality LEAVING the round, max rows any one rank bucket
    * received, and wall ms (measurement path only — includes the
    * histogram job's own cost). */
  private[graft] final case class SaRound(
      round: Int, k: Long, card: Long, rows: Long, maxBucketRows: Long,
      wallMs: Long)

  /** The suffix-rank frame (doc_id, pos, rank): rank compares full
    * within-doc token suffixes; equal ranks ⇔ identical suffixes. */
  private def suffixRanks(s: SparkSession, d: String): DataFrame =
    suffixRanksImpl(s, d, None)

  /** Measurement twin of [[suffixRanks]]: same construction, plus a
    * per-round bucket histogram — the evidence that no doubling round
    * concentrates the corpus in one task (VERDICT r11 items 1+8).
    * Bypasses [[saServed]] deliberately: it must measure the BUILD. */
  private[graft] def suffixRoundStats(s: SparkSession, d: String): Seq[SaRound] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[SaRound]
    suffixRanksImpl(s, d, Some(buf)).count()
    buf.toSeq
  }

  private def suffixRanksImpl(s: SparkSession, d: String,
      statsTo: Option[scala.collection.mutable.ArrayBuffer[SaRound]]): DataFrame = {
    val t = once(tokens(s, d))
    val stats = t.groupBy("doc_id").agg(count(lit(1)).as("len"))
      .agg(sum("len").as("n"), max("len").as("maxlen")).head()
    val n = stats.getLong(0)
    val maxLen = stats.getLong(1)
    // round 0: rank by first token — the vocabulary is value-domain
    // bounded, so the distinct-token rank is a safe unpartitioned window
    val vocab = once(t.select("tok").distinct()
      .withColumn("vr", row_number().over(Window.orderBy("tok")) - 1))
    // rank cardinality carried round to round: it is the bucket key's
    // denominator (round 1: the vocabulary size), and card == n means
    // every suffix already has a distinct rank — the order is final and
    // the remaining doubling rounds are identity re-ranks, so stop
    var card = vocab.count()
    var r = once(t.join(broadcast(vocab), "tok")
      .select(col("doc_id"), col("pos"), col("vr").cast("long").as("rank")))
    var k = 1L
    var round = 1
    while (k < maxLen && card < n) {
      val t0 = System.nanoTime()
      val nxt = r.select(col("doc_id"), (col("pos") - lit(k)).as("pos"),
        col("rank").as("r2n"))
      // staged: consumed by the bounds sample AND the rank pass (and by
      // the stats histogram in measurement mode)
      val paired = once(r.join(nxt, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("rank").as("r1"),
          coalesce(col("r2n"), lit(-1L)).as("r2")))
      val mxRows = statsTo.map { _ =>
        // same staged frame + same fixed seed ⇒ the histogram measures
        // exactly the bucket assignment the build uses
        withRangeBuckets(paired, Seq("r1", "r2"), n)
          .groupBy("bkt").agg(count(lit(1)).as("c"))
          .agg(max("c")).head().getLong(0)
      }
      r = once(denseRank2(paired, n))
      card = r.agg(max("rank")).head().getLong(0) + 1
      statsTo.foreach(_ += SaRound(round, k, card, n, mxRows.get,
        (System.nanoTime() - t0) / 1000000L))
      k *= 2
      round += 1
    }
    r
  }

  /** The materialized SA artifact (build-once/serve-many — the
    * familyFlagsServed discipline): both queries consume the same total
    * order, so the ⌈log₂ maxlen⌉-round construction is paid once per
    * dataset and every consumer's plan is a bare parquet scan. The
    * construction is deterministic (oracled: `q_suffix_array` is a
    * stride sample of exactly this frame) and (long, int, long) columns
    * round-trip Parquet exactly. */
  private def saServed(s: SparkSession, d: String): DataFrame =
    graft.util.Served(s, "suffix_array", "v1", d, Seq("documents.parquet")) {
      saTotal(s, d)
    }

  /** Total SA order (doc_id, pos, sa 0-based): the [[suffixRanks]] frame
    * row_numbered by (rank, doc_id, pos) under the same sampled-bounds
    * bucket discipline as [[denseRank2]] — the full key is UNIQUE
    * ((doc_id, pos) is a tiebreak), so a dup-heavy corpus (many equal
    * full suffixes ⇒ hot rank values) still spreads across buckets:
    * balance comes from the sampled key distribution, not from
    * rank-value spread. Plain cumulative per-bucket counts are the
    * exact offsets (≤ [[RankBuckets]] rows, broadcast). */
  private def saTotal(s: SparkSession, d: String): DataFrame = {
    val r = once(suffixRanks(s, d))
    val n = math.max(r.count(), 1L)
    val b = withRangeBuckets(r, Seq("rank", "doc_id", "pos"), n)
    val w = Window.partitionBy("bkt").orderBy("rank", "doc_id", "pos")
    val ranked = b.withColumn("rn", row_number().over(w))
    val wb = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = ranked.groupBy("bkt").agg(count(lit(1)).as("cnt"))
      .select(col("bkt"), (sum("cnt").over(wb) - col("cnt")).as("off"))
    ranked.join(broadcast(offs), "bkt")
      .select(col("doc_id"), col("pos"), (col("off") + col("rn") - 1).as("sa"))
  }

  /** Deterministic stride sample of the full suffix array: every
    * [[SaStride]]-th rank with its (doc_id, pos) and the suffix's first
    * three tokens — the cross-engine audit that the DISTRIBUTED
    * construction produced the true lexicographic order (the oracle
    * sorts materialized suffix strings; this side never materializes
    * any suffix longer than the 3-token head). */
  def suffixArray(s: SparkSession, d: String): DataFrame =
    saServed(s, d).filter(col("sa") % SaStride === 0)
      .join(docWords(s, d), "doc_id")
      .select(col("sa"), col("doc_id"), col("pos"),
        concat_ws(" ", slice(col("ws"), col("pos") + 1, lit(3))).as("head"))
      .orderBy("sa")

  /** The Lee et al. exact-substring dedup report over the full SA: a
    * position starts a repeated span of length ≥ L iff its LCP with an
    * SA-NEIGHBOR is ≥ L (lexicographic adjacency realizes the max LCP
    * over ALL other suffixes — the suffix-array theorem that makes this
    * exact at arbitrary span length, where the 8-gram two-pass
    * ([[Dedup]]) is fixed-grain). Reports, per threshold L: repeated
    * positions, affected docs, and position coverage ppm.
    *
    * Determinism: LCPs are exact integer token counts (compiled
    * [[graft.functions.TokenLcp]] loop = the oracle's first-mismatch
    * scan); counts BIGINT; ppm one integer division. Scale shape: ONE
    * self-join on consecutive ranks, doc-bounded token arrays fetched by
    * keyed join (never broadcast), a 5×-exploded threshold aggregate,
    * and the 1-row total broadcast. */
  def exactSubstrings(s: SparkSession, d: String): DataFrame = {
    val pairs = lcpPairs(s, d)
    val rep = pairs.select(col("doc_id"), col("pos"), col("lcp"))
      .union(pairs.select(col("db"), col("pb"), col("lcp")))
      .groupBy("doc_id", "pos").agg(max("lcp").as("rep"))
    val tot = rep.agg(count(lit(1)).as("total"))
    rep.select(col("doc_id"), col("rep"),
        explode(array(RepThresholds.map(lit): _*)).as("l"))
      .groupBy("l")
      .agg(sum((col("rep") >= col("l")).cast("long")).as("n_pos"),
        countDistinct(when(col("rep") >= col("l"), col("doc_id"))).as("n_docs"))
      .crossJoin(broadcast(tot))
      .select(col("l"), col("n_pos"), col("n_docs"),
        // total>0 guard (ADVICE r11): on a ≤1-suffix corpus the rep
        // frame is empty — no row reaches this projection today, but
        // the contract must not depend on that
        expr("case when total > 0 then n_pos * 1000000 div total else 0 end")
          .as("pos_ppm"))
      .orderBy("l")
  }

  /** Adjacent-SA pairs with their LCPs — the shared back end of
    * [[exactSubstrings]], [[longestRepeat]] and [[spanMask]]. */
  private def lcpPairs(s: SparkSession, d: String): DataFrame = {
    val sa = saServed(s, d)
    val dw = once(docWords(s, d))
    val b = sa.select((col("sa") - 1).as("sa"), col("doc_id").as("db"),
      col("pos").as("pb"))
    sa.join(b, "sa")
      .join(dw, "doc_id")
      .join(dw.select(col("doc_id").as("db"), col("ws").as("wb")), "db")
      .withColumn("lcp", graft.functions.VectorExpressions.tokenLcp(
        col("ws"), col("wb"), col("pos"), col("pb")))
      .select(col("doc_id"), col("pos"), col("db"), col("pb"), col("lcp"))
  }

  /** The longest repeated token span in the corpus (the LRS witness the
    * suffix array makes computable at all — max adjacent LCP): its
    * length, how many SA-adjacent pairs attain it, the earliest
    * (doc_id, pos) occurrence, and the span text itself — the artifact
    * a curation owner actually eyeballs ("what IS the most-duplicated
    * passage?").
    *
    * Determinism: the max is an exact integer; the witness is the
    * minimum (doc_id, pos) among attaining pairs' LEFT elements; the
    * text is a byte-exact space join. Scale shape: rides [[lcpPairs]]
    * (one consecutive-rank self-join) + a 1-row max broadcast; the
    * witness text is one doc-bounded slice. */
  def longestRepeat(s: SparkSession, d: String): DataFrame = {
    val pairs = once(lcpPairs(s, d))
    val mx = pairs.agg(max("lcp").as("lcp"))
    val attain = pairs.join(broadcast(mx), "lcp")
    val wit = attain
      .groupBy("lcp")
      .agg(count(lit(1)).as("n_pairs"),
        min(struct(col("doc_id"), col("pos"))).as("w"))
      .select(col("lcp"), col("n_pairs"),
        col("w.doc_id").as("doc_id"), col("w.pos").as("pos"))
    wit.join(docWords(s, d), "doc_id")
      .select(col("lcp"), col("n_pairs"), col("doc_id"), col("pos"),
        concat_ws(" ", slice(col("ws"), col("pos") + 1, col("lcp"))).as("span"))
  }

  /** Every occurrence of every MAXIMAL repeated span — the occurrence
    * map between [[longestRepeat]] (one witness) and [[spanMask]] (the
    * ≥[[MaskL]] masking bill): the drill-down a curation owner runs
    * after the witness ("WHERE does the most-duplicated passage
    * live?"). The k occurrences of a length-L maximal span are k
    * consecutive SA entries whose k−1 adjacent LCPs all equal L (no
    * adjacent LCP can exceed the corpus max), so the distinct union of
    * BOTH sides of the max-attaining adjacent pairs enumerates every
    * occurrence — of every tying span, when distinct token sequences
    * attain the same maximal length. `lcp > 0` keeps the query
    * fixture-independent: a corpus with no repeat at all emits zero
    * rows on both engines instead of "the empty span, everywhere".
    *
    * Determinism: exact integer positions; span text is a byte-exact
    * space join; output totally ordered by (doc_id, pos). Scale shape:
    * rides [[lcpPairs]] (one consecutive-rank self-join off the served
    * SA artifact) + the 1-row max broadcast; span text is a doc-bounded
    * slice fetched by one keyed join — occurrences, not the corpus,
    * ride the final exchanges. */
  def spanLocate(s: SparkSession, d: String): DataFrame = {
    val pairs = once(lcpPairs(s, d))
    val mx = pairs.agg(max("lcp").as("lcp"))
    val attain = pairs.join(broadcast(mx), "lcp").filter(col("lcp") > 0)
    val occ = attain.select(col("lcp"), col("doc_id"), col("pos"))
      .union(attain.select(col("lcp"), col("db").as("doc_id"),
        col("pb").as("pos")))
      .distinct()
    occ.join(docWords(s, d), "doc_id")
      .select(col("doc_id"), col("pos"), col("lcp"),
        concat_ws(" ", slice(col("ws"), col("pos") + 1, col("lcp"))).as("span"))
      .orderBy("doc_id", "pos")
  }

  /** Span-length threshold for [[spanMask]]: repeats of ≥ 16 tokens are
    * the "long verbatim passage" grain Lee et al. cut (their 50-BPE ≈
    * a few dozen words; 16 keeps the fixture populated while clearly
    * above the idiom/collocation range the 4/8 rows of
    * [[exactSubstrings]] report). */
  private val MaskL = 16

  /** The ENFORCEMENT rung of exact-substring dedup — what to actually
    * cut: every position covered by some repeated span of length ≥
    * [[MaskL]] (start p has neighbor-LCP ≥ MaskL ⇒ positions
    * [p, p+lcp) are covered), merged into per-doc intervals by interval
    * union, reported as the corpus masking bill: affected docs, merged
    * intervals, masked tokens, total tokens, masked ppm. The
    * detection → enforcement split mirrors q_k_anonymity →
    * q_k_anon_enforce.
    *
    * Determinism: starts and extents are exact integers; interval union
    * is the running-max islands recipe (per-doc window over positions —
    * partitioned, doc-bounded); ppm one integer division. Scale shape:
    * rides [[lcpPairs]]; the union window partitions by doc_id; one
    * ≤5-row reduce + the 1-row token total broadcast. */
  def spanMask(s: SparkSession, d: String): DataFrame = {
    val tot = docWords(s, d)
      .agg(sum(size(col("ws"))).as("total_tokens"))
    maskIslands(s, d)
      // coalesce + the total>0 guard: on a corpus with NO repeat ≥
      // [[MaskL]] the global aggregate must emit an explicit zero row
      // (not NULLs), matching the oracle's agg-subquery cross join —
      // fixture-independence of the contract (ADVICE r11)
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_intervals"),
        coalesce(sum(col("hi") - col("lo")), lit(0L)).as("masked_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("n_docs"), col("n_intervals"), col("masked_tokens"),
        col("total_tokens"),
        expr("case when total_tokens > 0 then masked_tokens * 1000000 div total_tokens else 0 end")
          .as("masked_ppm"))
  }

  /** The merged per-doc masked intervals [lo, hi) — [[spanMask]]'s
    * islands frame, shared with [[spanEnforce]]: every position whose
    * neighbor-LCP is ≥ [[MaskL]] opens a covered extent, extents union
    * into disjoint intervals by the running-max islands recipe (per-doc
    * window over positions — partitioned, doc-bounded). */
  private def maskIslands(s: SparkSession, d: String): DataFrame = {
    val pairs = lcpPairs(s, d)
    val starts = pairs.select(col("doc_id"), col("pos"), col("lcp"))
      .union(pairs.select(col("db"), col("pb"), col("lcp")))
      .groupBy("doc_id", "pos").agg(max("lcp").as("rep"))
      .filter(col("rep") >= MaskL)
      .select(col("doc_id"), col("pos").as("lo"),
        (col("pos") + col("rep")).as("hi"))
    val w = Window.partitionBy("doc_id").orderBy("lo", "hi")
    starts
      .withColumn("runhi", max("hi").over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("newisl",
        (col("runhi").isNull || col("lo") > col("runhi")).cast("int"))
      .withColumn("isl", sum("newisl").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "isl")
      .agg(min("lo").as("lo"), max("hi").as("hi"))
  }

  /** The enforcement twin of [[spanMask]] (VERDICT r11 item 5 — the
    * q_k_anonymity → q_k_anon_enforce symmetry): MATERIALIZE the masked
    * corpus. Every doc comes back with its repeated-span intervals cut
    * (the Lee et al. pipeline's actual output): total/masked/kept token
    * counts and the kept text. masked_tokens is computed from the
    * INTERVAL SUM while the oracle derives it as total − kept from its
    * position anti-join — the cross-engine hash is itself the
    * reconciliation proof, and [[graft.Round12OpsSpec]] pins the
    * masked + kept = total law per row.
    *
    * Determinism: interval algebra is exact integers; kept text is a
    * byte-exact space join of the surviving tokens in position order.
    * Scale shape: rides [[maskIslands]] (doc-bounded intervals,
    * collect_list per doc bounded by doc length), one doc_id equi-join
    * against the corpus, and a row-local compiled interval cut
    * ([[graft.functions.TokenMask]] — the indexed-filter HOF it
    * replaces ran an interpreted lambda per token per interval, on the
    * one pass that touches every token of the curated corpus; the
    * sorted disjoint islands admit an O(tokens+intervals) two-pointer
    * walk inside WholeStageCodegen) — no exchange beyond the islands
    * frame's own; output is one row per document, the size of the
    * corpus being curated. */
  def spanEnforce(s: SparkSession, d: String): DataFrame = {
    val ivs = maskIslands(s, d)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("lo"), col("hi")))).as("ivs"),
        sum(col("hi") - col("lo")).as("m"))
    docWords(s, d).join(ivs, Seq("doc_id"), "left")
      .withColumn("kept", when(col("ivs").isNull, col("ws")).otherwise(
        graft.functions.VectorExpressions.tokenMask(col("ws"),
          col("ivs.lo").cast("array<long>"),
          col("ivs.hi").cast("array<long>"))))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("total_tokens"),
        coalesce(col("m"), lit(0L)).as("masked_tokens"),
        size(col("kept")).cast("long").as("kept_tokens"),
        concat_ws(" ", col("kept")).as("kept_text"))
      .orderBy("doc_id")
  }

  /** Cross-source contamination at ARBITRARY span length — the SA twin
    * of [[TextAnalysis.contamination]]'s fixed 5-gram screen, the same
    * fixed-grain → exact upgrade [[exactSubstrings]] made over the
    * 8-gram passes: an eval (`src0`) doc is contaminated when it shares
    * an exact token span of ≥ [[MaskL]] with any TRAINING (non-`src0`)
    * doc. SA islands make that exact: a maximal run of consecutive SA
    * entries whose adjacent LCPs are all ≥ L shares ≥ L prefix tokens
    * PAIRWISE (the min over the adjacency chain), so an island holding
    * both an eval and a training suffix certifies the leak, and the
    * eval positions in mixed islands are exactly the contaminated ones.
    * Report: one row per eval doc — contaminated position count,
    * distinct leaking islands, boolean flag — zero-rows kept via the
    * doc-list left join (fixture-independent: a corpus with no ≥L
    * cross-source span reports all-false, identically on both engines).
    *
    * Scale shape: the island id is a TWO-PHASE BUCKETED prefix sum in
    * SA order — bucket = `sa·256 div n`, a pure function of the row's
    * own dense rank (exactly balanced, no sampling needed; the AQE
    * reused-exchange discipline of [[denseRank2]]), within-bucket
    * running sums + one ≤[[RankBuckets]]-row cumulative offset
    * broadcast — NEVER an unpartitioned window over the corpus. The
    * per-entry previous-rank LCP is one consecutive-rank self-join off
    * the served artifact with doc-bounded token arrays; island source
    * flags are an island-keyed aggregate; only flagged eval positions
    * ride the final exchanges. */
  def contaminationExact(s: SparkSession, d: String): DataFrame = {
    val sa = once(saServed(s, d))
    val n = math.max(sa.count(), 1L)
    val dw = once(docWords(s, d))
    val prev = sa.select((col("sa") + 1).as("sa"), col("doc_id").as("pd"),
      col("pos").as("pp"))
    val lcpp = sa.join(prev, Seq("sa"), "left")
      .join(dw, "doc_id")
      .join(dw.select(col("doc_id").as("pd"), col("ws").as("wp")),
        Seq("pd"), "left")
      .select(col("sa"), col("doc_id"), col("pos"),
        when(col("pd").isNull, lit(-1)).otherwise(
          graft.functions.VectorExpressions.tokenLcp(
            col("ws"), col("wp"), col("pos"), col("pp"))).as("lcpp"))
    val marked = once(lcpp
      .withColumn("newisl", (col("lcpp") < MaskL).cast("long"))
      // SQL `div`: exact integer division (Column./ is double — loses
      // precision past 2^53, i.e. at real corpus scale)
      .withColumn("bkt", expr(s"cast((sa * $RankBuckets) div $n as int)")))
    val w = Window.partitionBy("bkt").orderBy("sa")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = marked.withColumn("rs", sum("newisl").over(w))
    // ≤256 bucket rows: the value-domain-bounded unpartitioned window class
    val wb = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = marked.groupBy("bkt").agg(sum("newisl").as("cnt"))
      .select(col("bkt"), (sum("cnt").over(wb) - col("cnt")).as("off"))
    val isl = once(run.join(broadcast(offs), "bkt")
      .select(col("doc_id"), col("pos"), (col("off") + col("rs")).as("isl")))
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val m = isl.join(src, "doc_id")
    val mixed = m.groupBy("isl")
      .agg(max((col("source") === "src0").cast("int")).as("has_eval"),
        max((col("source") =!= "src0").cast("int")).as("has_train"))
      .filter(col("has_eval") === 1 && col("has_train") === 1)
      .select("isl")
    val cont = m.filter(col("source") === "src0")
      .join(mixed, "isl")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"), countDistinct("isl").as("n_islands"))
    src.filter(col("source") === "src0").select("doc_id")
      .join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"))
      .withColumn("contaminated", col("n_pos") > 0)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_suffix_array" -> (suffixArray _),
    "q_exact_substrings" -> (exactSubstrings _),
    "q_longest_repeat" -> (longestRepeat _),
    "q_span_locate" -> (spanLocate _),
    "q_contamination_exact" -> (contaminationExact _),
    "q_span_mask" -> (spanMask _),
    "q_span_enforce" -> (spanEnforce _),
  )

  /** Shared oracle prefix: filtered word lists → one row per suffix with
    * its materialized space-joined string (the small-data formulation
    * whose ORDER the distributed side must reproduce). */
  private def suffixCtes: String =
    """w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents
      |), t AS (
      |  SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM w
      |), s AS (
      |  SELECT doc_id, ws, i - 1 AS pos, len(ws) - i + 1 AS slen,
      |         array_to_string(ws[i:], ' ') AS suf
      |  FROM t
      |), r AS (
      |  SELECT doc_id, ws, pos, slen,
      |         row_number() OVER (ORDER BY suf, doc_id, pos) - 1 AS sa
      |  FROM s
      |)""".stripMargin

  /** The pr → lc CTE pair (adjacent-SA pairs + exact LCPs) shared by the
    * three LCP-consuming oracles. */
  private def lcpCtes: String =
    """pr AS (
      |  SELECT a.doc_id AS da, a.pos AS pa, a.slen AS la, a.ws AS wa,
      |         b.doc_id AS db, b.pos AS pb, b.slen AS lb, b.ws AS wb
      |  FROM r a JOIN r b ON b.sa = a.sa + 1
      |), lc AS (
      |  SELECT da, pa, db, pb,
      |         -- list_position yields 0 (this build) when no mismatch
      |         -- exists: nullif routes the fully-matching case to the
      |         -- min-suffix-length arm
      |         coalesce(nullif(list_position(
      |             list_transform(range(1, least(la, lb) + 1),
      |               i -> wa[pa + i] IS NOT DISTINCT FROM wb[pb + i]),
      |             false), 0) - 1,
      |           least(la, lb)) AS lcp
      |  FROM pr
      |)""".stripMargin

  /** The rp → iv CTE chain (repeat extents ≥ [[MaskL]] merged into
    * per-doc disjoint intervals) shared by the [[spanMask]] /
    * [[spanEnforce]] oracles — the SQL twin of [[maskIslands]]. */
  private def maskCtes: String =
    """rp AS (
      |  SELECT doc_id, pos, max(lcp) AS rep FROM (
      |    SELECT da AS doc_id, pa AS pos, lcp FROM lc
      |    UNION ALL SELECT db, pb, lcp FROM lc) u
      |  GROUP BY 1, 2
      |), st AS (
      |  SELECT doc_id, pos AS lo, pos + rep AS hi FROM rp WHERE rep >= 16
      |), g AS (
      |  SELECT doc_id, lo, hi,
      |         CASE WHEN lo > coalesce(max(hi) OVER (
      |                PARTITION BY doc_id ORDER BY lo, hi
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |              -1) THEN 1 ELSE 0 END AS newisl
      |  FROM st
      |), gi AS (
      |  SELECT doc_id, lo, hi,
      |         sum(newisl) OVER (PARTITION BY doc_id ORDER BY lo, hi
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      |  FROM g
      |), iv AS (
      |  SELECT doc_id, isl, min(lo) AS lo, max(hi) AS hi
      |  FROM gi GROUP BY 1, 2
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_longest_repeat" ->
      s"""WITH $suffixCtes, $lcpCtes,
         |mx AS (SELECT max(lcp) AS lcp FROM lc),
         |at AS (SELECT lc.* FROM lc JOIN mx ON lc.lcp = mx.lcp),
         |wit AS (SELECT lcp, da, pa FROM at ORDER BY da, pa LIMIT 1),
         |np AS (SELECT count(*) AS n_pairs FROM at)
         |SELECT wit.lcp, CAST(np.n_pairs AS BIGINT) AS n_pairs,
         |       wit.da AS doc_id, CAST(wit.pa AS INTEGER) AS pos,
         |       array_to_string(w.ws[wit.pa + 1:wit.pa + wit.lcp], ' ') AS span
         |FROM wit, np JOIN w ON w.doc_id = wit.da""".stripMargin,
    "q_span_locate" ->
      s"""WITH $suffixCtes, $lcpCtes,
         |mx AS (SELECT max(lcp) AS lcp FROM lc),
         |at AS (SELECT lc.* FROM lc JOIN mx ON lc.lcp = mx.lcp AND mx.lcp > 0),
         |occ AS (
         |  -- UNION (not UNION ALL) = the Spark distinct union of both
         |  -- adjacency sides
         |  SELECT lcp, da AS doc_id, pa AS pos FROM at
         |  UNION
         |  SELECT lcp, db AS doc_id, pb AS pos FROM at
         |)
         |SELECT occ.doc_id, CAST(occ.pos AS INTEGER) AS pos, occ.lcp,
         |       array_to_string(w.ws[occ.pos + 1:occ.pos + occ.lcp], ' ') AS span
         |FROM occ JOIN w ON w.doc_id = occ.doc_id
         |ORDER BY occ.doc_id, occ.pos""".stripMargin,
    "q_contamination_exact" ->
      s"""WITH $suffixCtes,
         |le AS (
         |  -- LCP with the PREVIOUS SA entry, keyed by the entry's rank
         |  -- (the lc formula of the pair oracles, re-keyed by sa)
         |  SELECT b.sa AS sa,
         |         coalesce(nullif(list_position(
         |             list_transform(range(1, least(a.slen, b.slen) + 1),
         |               i -> a.ws[a.pos + i] IS NOT DISTINCT FROM b.ws[b.pos + i]),
         |             false), 0) - 1,
         |           least(a.slen, b.slen)) AS lcpp
         |  FROM r a JOIN r b ON b.sa = a.sa + 1
         |),
         |er AS (
         |  SELECT r.sa, r.doc_id, r.pos, coalesce(le.lcpp, -1) AS lcpp
         |  FROM r LEFT JOIN le ON le.sa = r.sa
         |),
         |isl AS (
         |  SELECT sa, doc_id, pos,
         |         sum(CASE WHEN lcpp < 16 THEN 1 ELSE 0 END)
         |           OVER (ORDER BY sa ROWS UNBOUNDED PRECEDING) AS isl
         |  FROM er
         |),
         |m AS (
         |  SELECT isl.isl, isl.doc_id, isl.pos, documents.source
         |  FROM isl JOIN documents USING (doc_id)
         |),
         |mixed AS (
         |  SELECT isl FROM m GROUP BY isl
         |  HAVING bool_or(source = 'src0') AND bool_or(source <> 'src0')
         |),
         |cont AS (
         |  SELECT m.doc_id, count(*) AS n_pos,
         |         count(DISTINCT m.isl) AS n_islands
         |  FROM m JOIN mixed USING (isl)
         |  WHERE m.source = 'src0'
         |  GROUP BY m.doc_id
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(cont.n_pos, 0) AS BIGINT) AS n_pos,
         |       CAST(coalesce(cont.n_islands, 0) AS BIGINT) AS n_islands,
         |       coalesce(cont.n_pos, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE source = 'src0') d
         |LEFT JOIN cont ON cont.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q_span_mask" ->
      s"""WITH $suffixCtes, $lcpCtes, $maskCtes,
         |tot AS (SELECT sum(len(ws)) AS total_tokens FROM w),
         |agg AS (
         |  -- aggregate subquery, NOT a GROUP BY over iv: a corpus with
         |  -- no repeat >= 16 must still emit the one zero row the
         |  -- Spark global aggregate emits (ADVICE r11)
         |  SELECT count(DISTINCT doc_id) AS n_docs, count(*) AS n_intervals,
         |         coalesce(sum(hi - lo), 0) AS masked_tokens
         |  FROM iv
         |)
         |SELECT CAST(agg.n_docs AS BIGINT) AS n_docs,
         |       CAST(agg.n_intervals AS BIGINT) AS n_intervals,
         |       CAST(agg.masked_tokens AS BIGINT) AS masked_tokens,
         |       CAST(tot.total_tokens AS BIGINT) AS total_tokens,
         |       CAST(CASE WHEN tot.total_tokens > 0
         |            THEN agg.masked_tokens * 1000000 // tot.total_tokens
         |            ELSE 0 END AS BIGINT) AS masked_ppm
         |FROM agg, tot""".stripMargin,
    "q_span_enforce" ->
      s"""WITH $suffixCtes, $lcpCtes, $maskCtes,
         |tk AS (
         |  SELECT doc_id, i - 1 AS pos, ws[i] AS tok
         |  FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM w) z
         |), km AS (
         |  -- masked derivation by position ANTI-JOIN (the Spark side
         |  -- sums interval extents): the hash compare IS the
         |  -- reconciliation proof that the two derivations agree
         |  SELECT tk.doc_id,
         |         count(*) FILTER (WHERE iv.lo IS NULL) AS kept_tokens,
         |         coalesce(string_agg(tk.tok, ' ' ORDER BY tk.pos)
         |           FILTER (WHERE iv.lo IS NULL), '') AS kept_text
         |  FROM tk LEFT JOIN iv
         |    ON iv.doc_id = tk.doc_id AND tk.pos >= iv.lo AND tk.pos < iv.hi
         |  GROUP BY tk.doc_id
         |)
         |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS total_tokens,
         |       CAST(len(w.ws) - coalesce(km.kept_tokens, 0) AS BIGINT)
         |         AS masked_tokens,
         |       CAST(coalesce(km.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |       coalesce(km.kept_text, '') AS kept_text
         |FROM w LEFT JOIN km ON km.doc_id = w.doc_id
         |ORDER BY w.doc_id""".stripMargin,
    "q_suffix_array" ->
      s"""WITH $suffixCtes
         |SELECT CAST(sa AS BIGINT) AS sa, doc_id, CAST(pos AS INTEGER) AS pos,
         |       array_to_string(ws[pos + 1:pos + 3], ' ') AS head
         |FROM r WHERE sa % $SaStride = 0 ORDER BY sa""".stripMargin,
    "q_exact_substrings" ->
      s"""WITH $suffixCtes, $lcpCtes, rep AS (
         |  SELECT doc_id, pos, max(lcp) AS rep FROM (
         |    SELECT da AS doc_id, pa AS pos, lcp FROM lc
         |    UNION ALL SELECT db, pb, lcp FROM lc) u
         |  GROUP BY 1, 2
         |), tot AS (SELECT count(*) AS total FROM rep)
         |SELECT th.l,
         |       CAST(count(*) FILTER (WHERE rep.rep >= th.l) AS BIGINT) AS n_pos,
         |       CAST(count(DISTINCT CASE WHEN rep.rep >= th.l
         |                                THEN rep.doc_id END) AS BIGINT) AS n_docs,
         |       CAST(CASE WHEN (SELECT total FROM tot) > 0
         |            THEN count(*) FILTER (WHERE rep.rep >= th.l) * 1000000
         |                 // (SELECT total FROM tot)
         |            ELSE 0 END AS BIGINT) AS pos_ppm
         |FROM (SELECT unnest([${RepThresholds.mkString(", ")}]) AS l) th
         |CROSS JOIN rep GROUP BY th.l ORDER BY th.l""".stripMargin,
  )
}

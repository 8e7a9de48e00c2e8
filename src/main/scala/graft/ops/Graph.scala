package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over a derived relational graph (north-star extension:
  * the reference's pipeline stops at flat aggregates; production data
  * platforms run link analysis on exactly this kind of derived graph —
  * entity-influence ranking, reachability/lineage hops).
  *
  * The graph: nation-level trade edges. `lineitem ⋈ orders` (the one big
  * shuffle join — at 100 TB this derivation IS the expensive stage) maps
  * each line item to (supplier nation → customer nation) through the two
  * broadcast dims, then aggregates to a weighted edge list that is tiny
  * (≤ |nations|²) no matter the input scale. The iterative algorithms run
  * on the aggregated edges: the scale-correct layout, since rank/distance
  * state never exceeds the node count, while all per-row work stays in the
  * one aggregation pass.
  *
  * Determinism: PageRank is computed in scaled fixed-point BIGINT
  * (rank × 10¹²) with floor division — no floating-point aggregate exists
  * anywhere, so Spark and the DuckDB oracle (same integer ops, `//`) agree
  * bit-for-bit regardless of partitioning or summation order. Dividing the
  * rank by out-weight BEFORE multiplying by the edge weight keeps every
  * intermediate ≤ the total rank mass (≈ |nodes| × 10¹² ≪ 2⁶³): overflow-
  * free by construction at any scale factor.
  */
object Graph {

  /** Fixed-point scale: 1 unit of rank = 10⁻¹². */
  private[ops] val Scale = 1000000000000L
  /** Damping factor 0.85 as an integer percentage. */
  private[ops] val DampPct = 85L
  private[ops] val PrIters = 5

  /** Weighted directed trade edges: supplier nation → customer nation,
    * weight = number of line items shipped on that lane. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val li   = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord  = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank over the trade graph, [[PrIters]] synchronous
    * iterations in fixed-point: rankᵢ₊₁(v) = 0.15·Scale +
    * 0.85 · Σ_{u→v} (rankᵢ(u) div outw(u)) · w(u,v). Nations with no
    * outgoing lane leak their mass (standard dangling-node behavior,
    * identical in the oracle). The edge list is staged once and reused by
    * all iterations; per-iteration state is one row per nation. */
  def pagerank(s: SparkSession, d: String): DataFrame = {
    val teleport = (100L - DampPct) * Scale / 100L
    // stage the derivation BEFORE branching into edges + out-weights:
    // both consumers read the materialized ≤|nations|² edge list, so the
    // lineitem⋈orders pass runs exactly once
    val e = graft.util.Ckpt.stage(tradeEdges(s, d))
    val ew = graft.util.Ckpt.stage(
      e.join(e.groupBy("src").agg(sum("w").as("outw")), "src"))
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
    var ranks = nodes.select(col("node"), lit(Scale).as("rank"))
    for (_ <- 1 to PrIters) {
      val inflow = ew.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("(rank div outw) * w").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      ranks = nodes.select(col("node"))
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($DampPct * coalesce(inflow, 0L)) div 100"))
            .as("rank"))
    }
    nodes.join(ranks, "node")
      .select(col("node"), col("nation"), col("rank"))
      .orderBy("node")
  }

  /** Hop distance from the hub nation (node 0) over UNDIRECTED trade
    * lanes: iterative min-distance relaxation to convergence (graph
    * diameter rounds; ≤ |nodes| hard cap), the same loop shape as
    * [[Dedup.dedupClusters]]. Unreachable nations report null. The
    * relaxation state is one (node, dist) row per nation per round —
    * at 100 TB the derivation pass dominates and the loop is free. */
  def bfsHops(s: SparkSession, d: String): DataFrame = {
    // one derivation pass (staged), then mirror the tiny edge list locally
    val e = graft.util.Ckpt.stage(tradeEdges(s, d).select(col("src"), col("dst")))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val edges = graft.util.Ckpt.stage(und)
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
    var dist = nodes.select(col("node"),
      when(col("node") === 0, lit(0L)).otherwise(lit(null).cast("long")).as("dist"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 30) {
      val relaxed = edges.join(dist.withColumnRenamed("node", "src"), "src")
        .filter(col("dist").isNotNull)
        .groupBy(col("dst").as("node")).agg(min(col("dist") + 1).as("nd"))
      val next = dist.join(relaxed, Seq("node"), "left")
        .select(col("node"), least(col("dist"), col("nd")).as("dist2"),
          (col("nd") < coalesce(col("dist"), lit(Long.MaxValue))).cast("int").as("chg"))
        .transform(graft.util.Ckpt.stage)
      changed = next.agg(coalesce(sum("chg"), lit(0L))).collect()(0).getLong(0)
      dist = next.select(col("node"), col("dist2").as("dist"))
      rounds += 1
    }
    nodes.join(dist, "node")
      .select(col("node"), col("nation"), col("dist"))
      .orderBy("node")
  }

  /** Per-nation triangle participation over the UNDIRECTED trade graph
    * (self-loops dropped): for each nation u, the number of pairs of
    * trade partners {v, w} that also trade with each other — the local
    * clustering signal behind community detection and trade-bloc
    * discovery, and the third leg of the graph family (PageRank =
    * influence, BFS = reachability, triangles = cohesion).
    *
    * Exactness: pure integer joins and counts — no arithmetic freedom
    * anywhere. The v < w ordering counts each triangle exactly once per
    * apex node (the sum over nodes is 3× the triangle total — asserted
    * in the spec).
    *
    * Scale shape: the [[tradeEdges]] derivation (the lineitem⋈orders
    * pass) dominates at 100 TB; the enumeration itself runs entirely on
    * the staged, aggregated edge list (≤ |nations|² rows), broadcast on
    * both join legs — the fact tables are never re-exchanged. On a
    * billion-node graph this step would instead pre-partition edges by
    * the degree-ordered apex, but at the nation grain the broadcast is
    * the right plan. */
  def triangleCount(s: SparkSession, d: String): DataFrame = {
    val e = graft.util.Ckpt.stage(tradeEdges(s, d).select(col("src"), col("dst")))
    val und = graft.util.Ckpt.stage(
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct())
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
    val e1 = und.select(col("src").as("u"), col("dst").as("v"))
    val e2 = und.select(col("src").as("u2"), col("dst").as("w"))
    val e3 = und.select(col("src").as("v3"), col("dst").as("w3"))
    val tris = e1.join(broadcast(e2), col("u") === col("u2") && col("v") < col("w"))
      .join(broadcast(e3), col("v") === col("v3") && col("w") === col("w3"))
      .groupBy(col("u").as("node")).agg(count(lit(1)).as("n_tri"))
    nodes.join(tris, Seq("node"), "left")
      .select(col("node"), col("nation"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy("node")
  }

  /** Degree distribution of the customer–supplier trading graph at the
    * ENTITY level (distinct partners per node, both sides of the
    * bipartite graph) — the structure check behind partition-strategy
    * choices on graph workloads: a heavy-tailed distribution means hub
    * nodes need skew handling (salting, hub replication) that a
    * near-uniform one does not. Output: (side, degree, n_nodes).
    *
    * Determinism: pure integer counts over distinct pairs. Scale shape:
    * the one big join is lineitem⋈orders on orderkey; pairs reduce by
    * DISTINCT before any per-node work, so node degree aggregates see
    * one row per edge, and the histogram is degree-domain-bounded. */
  def degreeDist(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val pairs = graft.util.Ckpt.stage(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
        .distinct())
    def hist(key: String, side: String): DataFrame =
      pairs.groupBy(key).agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .select(lit(side).as("side"), col("degree"), col("n_nodes"))
    hist("c", "customer").unionByName(hist("p", "supplier"))
      .orderBy("side", "degree")
  }

  /** Hub-degree cap for [[jaccardNeighbors]]: customers touching more
    * suppliers than this are dropped before the co-occurrence self-join.
    * At 100 TB this cap is what bounds the join fan-out (Σ deg² over the
    * kept rows ≤ |customers|·cap²) — the same df-cap discipline as the
    * dedup bigram blocks. */
  private[ops] val JaccardDegCap = 20L

  /** Supplier–supplier Jaccard similarity over shared customers — the
    * item-item collaborative-filtering / link-prediction primitive:
    * sim(a,b) = |cust(a) ∩ cust(b)| / |cust(a) ∪ cust(b)| computed from
    * the bipartite customer→supplier incidence ([[degreeDist]]'s pair
    * set). Candidates materialize through the customer-keyed self-join
    * (co-occurrence), NEVER an all-pairs supplier product, and hub
    * customers above [[JaccardDegCap]] are excluded first — an
    * everything-buyer contributes deg² near-zero-signal pairs, the
    * standard mitigation in production co-occurrence jobs. Degrees are
    * computed on the SAME capped pair set so the Jaccard denominator is
    * consistent (mirrored in the oracle).
    *
    * Determinism: set sizes are exact BIGINTs over DISTINCT pairs; the
    * similarity is ONE IEEE division floor-quantized to 6 dp; pairs are
    * canonically ordered a < b. Only pairs sharing ≥ 2 customers are
    * emitted (singleton co-occurrence is noise at any scale).
    *
    * Scale shape: one distinct-pair aggregate, a degree-cap semi-join,
    * the customer-keyed self-join with bounded fan-out, one keyed
    * reduce; degrees broadcast back onto the pair frame. */
  def jaccardNeighbors(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val pairs = graft.util.Ckpt.stage(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
        .distinct())
    val keep = pairs.groupBy("c").agg(count(lit(1)).as("cdeg"))
      .filter(col("cdeg") <= JaccardDegCap).select("c")
    val capped = graft.util.Ckpt.stage(pairs.join(keep, "c"))
    val deg = capped.groupBy("p").agg(count(lit(1)).as("deg"))
    val co = capped.select(col("c"), col("p").as("pa"))
      .join(capped.select(col("c"), col("p").as("pb")), "c")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    co.join(broadcast(deg.withColumnRenamed("p", "pa").withColumnRenamed("deg", "deg_a")), "pa")
      .join(broadcast(deg.withColumnRenamed("p", "pb").withColumnRenamed("deg", "deg_b")), "pb")
      .select(col("pa").as("supp_a"), col("pb").as("supp_b"),
        col("co"), col("deg_a"), col("deg_b"),
        (floor(col("co").cast("double") /
          (col("deg_a") + col("deg_b") - col("co")).cast("double")
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("jaccard"))
      .orderBy("supp_a", "supp_b")
  }

  /** Market-basket co-occurrence: pairs of parts appearing in the same
    * order, counted across orders — the item-item co-purchase graph a
    * recommender or "frequently bought together" feature is built from.
    * Top 100 pairs by support, fully-ordered tiebreak for determinism.
    *
    * Scale shape: TWO exchanges total — an order-keyed aggregate that
    * builds each order's sorted distinct part array, and the pair-count
    * aggregate over (part_a, part_b, count) triples. Pair generation is
    * row-local array expansion, bounded by order SIZE (≤7 lines in
    * TPC-H-shaped data, so ≤21 pairs/row), not by catalog or order count
    * — that intrinsic bound is what makes it safe at 100 TB (contrast
    * [[jaccardNeighbors]], where customer fan-out is unbounded and needs
    * an explicit degree cap). The support≥2 filter drops the long
    * singleton tail before the final top-k, which is a TakeOrdered, not
    * a global sort. */
  def copurchasePairs(s: SparkSession, d: String): DataFrame = {
    // one order-keyed aggregate builds each order's sorted distinct part
    // set (collect_set dedups in the same exchange a distinct would cost
    // on its own); pairs are generated ROW-LOCALLY from the array with
    // nested transform/slice — strictly ordered, so part_a < part_b by
    // construction — instead of a second order-keyed self-join exchange
    val pairs = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS part_a, y AS part_b))))""".stripMargin)).as("pr"))
      .select(col("pr.part_a"), col("pr.part_b"))
    pairs
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .orderBy(col("n_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(100)
  }

  /** Association rules over the co-purchase baskets — the
    * [[copurchasePairs]] support counts lifted to directional rules
    * a→b with confidence n_ab/n_a and lift N·n_ab/(n_a·n_b), the
    * "customers who bought X also bought Y" scoring layer (confidence
    * alone rewards popular consequents; lift corrects for the base
    * rate). Top 50 by (lift, confidence), fully-ordered tiebreak.
    *
    * Determinism: supports and pair counts are exact integers; each of
    * confidence and lift is ONE correctly-rounded IEEE division of
    * exact-integer products, floor-quantized to 6 dp; the final order
    * includes (antecedent, consequent), a total order. N·n_ab and
    * n_a·n_b stay in BIGINT to ~10⁹ baskets per item pair.
    *
    * Scale shape: baskets are built once (the [[copurchasePairs]]
    * row-local expansion — pair generation bounded by basket size, not
    * catalog); supports are one item-keyed aggregate of the same staged
    * distinct frame; the rule join touches only surviving pairs, with
    * the catalog-bounded support table broadcast; top-50 is a
    * TakeOrdered, not a global sort. */
  def assocRules(s: SparkSession, d: String): DataFrame = {
    val li = graft.util.Ckpt.stage(Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct())
    val supp = li.groupBy("p").agg(count(lit(1)).as("n_i"))
    val nOrders = li.agg(countDistinct("o").as("n_orders"))
    val pairs = li
      .groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS pa, y AS pb))))""".stripMargin)).as("pr"))
      .select(col("pr.pa"), col("pr.pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    val dir = pairs.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("n_ab"))
      .union(pairs.select(col("pb").as("antecedent"), col("pa").as("consequent"), col("n_ab")))
    dir
      .join(broadcast(supp.select(col("p").as("antecedent"), col("n_i").as("n_ante"))),
        "antecedent")
      .join(broadcast(supp.select(col("p").as("consequent"), col("n_i").as("n_cons"))),
        "consequent")
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"),
        col("n_ab").as("n_both"), col("n_ante"), col("n_cons"),
        (floor(col("n_ab").cast("double") / col("n_ante").cast("double")
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("confidence"),
        (floor((col("n_orders") * col("n_ab")).cast("double")
          / (col("n_ante") * col("n_cons")).cast("double")
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("lift"))
      .orderBy(col("lift").desc, col("confidence").desc,
        col("antecedent").asc, col("consequent").asc)
      .limit(50)
  }

  /** k for [[kcorePeel]] — the smallest k where peeling does real work
    * on the co-purchase graph (k=2 only strips leaf chains). */
  private[ops] val CoreK = 3
  /** Bounded peel passes — the per-pass trace IS the output, so an
    * unconverged tail is visible rather than silently truncated. */
  private[ops] val CorePasses = 6

  /** k-core peeling of the co-purchase graph: repeatedly remove nodes
    * with degree < [[CoreK]] until (at most [[CorePasses]] passes) the
    * k-core remains — the standard dense-substructure extraction that
    * separates "parts with a real co-purchase neighborhood" from the
    * long tail a recommender should not trust. Output is the per-pass
    * (n_nodes, n_edges) trace: a fixpoint shows as a flat tail, an
    * unconverged graph as a still-falling one.
    *
    * Determinism: peeling is order-free (all sub-k nodes drop
    * simultaneously each pass — the result is the unique maximal
    * k-core regardless of schedule), and every traced quantity is an
    * integer count. The oracle unrolls the identical passes CTE by CTE.
    *
    * Scale shape: the iterative-algorithm discipline ([[pagerank]],
    * kmeans): state per pass is the surviving edge list (monotonically
    * shrinking, staged via Ckpt so lineage stays bounded) plus a
    * node-keyed degree aggregate; the base pairs derivation is the
    * [[copurchasePairs]] row-local expansion. No pass ever touches the
    * raw fact table again. */
  def kcorePeel(s: SparkSession, d: String): DataFrame = {
    val base = graft.util.Ckpt.stage(Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS pa, y AS pb))))""".stripMargin)).as("pr"))
      .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .agg(count(lit(1)).as("n_o"))
      .filter(col("n_o") >= 2)
      .select("pa", "pb"))
    var edges = base
    val trace = (1 to CorePasses).map { p =>
      val deg = edges.select(col("pa").as("node"))
        .union(edges.select(col("pb").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
      val keep = deg.filter(col("dg") >= CoreK).select("node")
      edges = graft.util.Ckpt.stage(edges
        .join(keep.withColumnRenamed("node", "pa"), "pa")
        .join(keep.withColumnRenamed("node", "pb"), "pb")
        .select("pa", "pb"))
      val nodes = edges.select(col("pa").as("node"))
        .union(edges.select(col("pb").as("node")))
      edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(nodes.agg(countDistinct("node").as("n_nodes")))
        .select(lit(p).as("pass"), col("n_nodes"), col("n_edges"))
    }
    trace.reduce(_.union(_)).orderBy("pass")
  }

  private[ops] val LpaRounds = 3

  /** Shared LPA machinery for [[labelProp]] and [[modularity]]: the node
    * frame, the staged undirected weighted edge list (self-loops dropped,
    * parallel lanes merged), and the label frame after [[LpaRounds]]
    * synchronous rounds. Both consumers and both oracles derive from the
    * SAME rounds, so the community partition [[modularity]] scores is by
    * construction the one [[labelProp]] reports. */
  private def lpaState(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = graft.util.Ckpt.stage(tradeEdges(s, d))
    val und = graft.util.Ckpt.stage(
      e.select(col("src"), col("dst"), col("w"))
        .unionAll(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(sum("w").as("w")))
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
    var labs = nodes.select(col("node"), col("node").as("lab"))
    for (_ <- 1 to LpaRounds) {
      val votes = und.join(labs.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("lab")).agg(sum("w").as("vw"))
      val pick = votes.withColumn("rn", row_number().over(
          Window.partitionBy("node").orderBy(col("vw").desc, col("lab").asc)))
        .filter(col("rn") === 1).select(col("node"), col("lab").as("newlab"))
      labs = labs.join(pick, Seq("node"), "left")
        .select(col("node"), coalesce(col("newlab"), col("lab")).as("lab"))
    }
    (nodes, und, graft.util.Ckpt.stage(labs))
  }

  /** Weighted label-propagation communities over the undirected trade
    * graph, [[LpaRounds]] SYNCHRONOUS rounds — the community-detection
    * leg of the graph family (components say "connected at all"; LPA
    * says "more tied to each other than to the rest", splitting a
    * connected graph into trade blocs): every node simultaneously adopts
    * the label with the largest total incident edge weight among its
    * neighbors (ties → smallest label, the deterministic LPA variant);
    * isolated nodes keep their own label.
    *
    * Determinism: edge weights and vote sums are exact BIGINTs; the
    * adopt decision is a row_number over (vote weight DESC, label ASC) —
    * pure integer ordering, no arithmetic freedom. The oracle unrolls
    * the same [[LpaRounds]] rounds as generated CTEs (the [[pagerank]]
    * discipline); synchronous updates make the unroll exact.
    *
    * Scale shape: the [[tradeEdges]] derivation dominates; each round is
    * one join + one keyed aggregate + one per-node top-1 window over the
    * staged ≤|nations|² edge list, with per-round state one (node,
    * label) row per node. At a billion-node graph the top-1 window
    * becomes the [[graft.plans.TopKPerGroup]] bounded-heap operator;
    * at the nation grain the window is the right plan. */
  def labelProp(s: SparkSession, d: String): DataFrame = {
    val (nodes, _, labs) = lpaState(s, d)
    nodes.join(labs, "node")
      .withColumn("community_size",
        count(lit(1)).over(Window.partitionBy("lab")))
      .select(col("node"), col("nation"), col("lab").as("label"),
        col("community_size"))
      .orderBy("node")
  }

  /** Newman modularity of the [[labelProp]] partition over the undirected
    * weighted trade graph — the quality score for the communities the LPA
    * leg reports (community detection without a quality metric is
    * unfalsifiable; Q ≈ 0 says "no better than random given the degree
    * sequence", Q > 0.3 says real bloc structure): per community c,
    * contrib(c) = w_in(c)/m2 − (w_tot(c)/m2)², with w_in the weight inside
    * c, w_tot the total degree-weight of c's nodes, and m2 the total
    * directed-both-ways weight (= 2m); Q = Σ_c contrib(c), emitted as a
    * label = −1 total row after the per-community rows.
    *
    * Determinism: w_in/w_tot/m2 are exact BIGINT sums over the SAME
    * [[lpaState]] rounds the LPA query runs (the oracle chains the
    * identical unrolled CTEs); each contribution is a fixed sequence of
    * IEEE divisions/products on exact integers, 8-dp floor-quantized; the
    * total sums the quantized contributions in DECIMAL(20,8) — exact and
    * order-free — so Q is bit-identical in both engines.
    *
    * Scale shape: the [[tradeEdges]] derivation dominates; everything
    * after it is three keyed aggregates over the staged ≤|nations|² edge
    * list with the ≤|nations|-row label frame joined in, plus a 1-row m2
    * broadcast. At a billion-node graph the same three aggregates shuffle
    * on community id — modularity stays one-pass whatever the scale. */
  def modularity(s: SparkSession, d: String): DataFrame = {
    val (_, und, labs) = lpaState(s, d)
    val m2 = und.agg(sum("w").as("m2"))
    val win = und
      .join(labs.select(col("node").as("src"), col("lab").as("lab_s")), "src")
      .join(labs.select(col("node").as("dst"), col("lab").as("lab_d")), "dst")
      .filter(col("lab_s") === col("lab_d"))
      .groupBy(col("lab_s").as("label")).agg(sum("w").as("w_in"))
    val wtot = und.groupBy("src").agg(sum("w").as("dw"))
      .join(labs.withColumnRenamed("node", "src"), "src")
      .groupBy(col("lab").as("label")).agg(sum("dw").as("w_tot"))
    val nsz = labs.groupBy(col("lab").as("label")).agg(count(lit(1)).as("n_nodes"))
    val per = nsz
      .join(wtot, Seq("label"), "left")
      .join(win, Seq("label"), "left")
      .crossJoin(broadcast(m2))
      .select(col("label"), col("n_nodes"),
        coalesce(col("w_in"), lit(0L)).as("w_in"),
        coalesce(col("w_tot"), lit(0L)).as("w_tot"), col("m2"))
      .withColumn("contrib",
        when(col("m2") === 0L, lit(0.0)).otherwise(graft.util.Det.q8(
          col("w_in").cast("double") / col("m2").cast("double")
            - (col("w_tot").cast("double") / col("m2").cast("double"))
              * (col("w_tot").cast("double") / col("m2").cast("double")))))
      .transform(graft.util.Ckpt.stage)
    val total = per.agg(sum("n_nodes").as("n_nodes"), sum("w_in").as("w_in"),
        sum("w_tot").as("w_tot"),
        sum(expr("CAST(contrib AS DECIMAL(20,8))")).cast("double").as("contrib"))
      .select(lit(-1).as("label"), col("n_nodes"), col("w_in"), col("w_tot"),
        col("contrib"))
    per.select("label", "n_nodes", "w_in", "w_tot", "contrib")
      .unionByName(total)
      .orderBy("label")
  }

  /** Degree assortativity of the undirected trade graph (distinct lanes,
    * self-loops dropped): the Pearson correlation of the FULL degrees at
    * the two ends of each edge, computed over the directed-both-ways
    * endpoint list (the standard estimator; each undirected edge
    * contributes both orientations, making the coefficient symmetric).
    * r > 0 = hubs trade with hubs (assortative), r < 0 = hub-and-spoke
    * (disassortative — the shape that concentrates shuffle skew on the
    * hub keys and motivates salting).
    *
    * Determinism: every moment (m, Σx, Σxy, Σx²) is an exact BIGINT sum
    * of bounded integers (degree ≤ |nations|, m ≤ |nations|² — the
    * products stay ≲ 10¹⁷ ≪ 2⁶³ at ANY scale factor since the nation
    * grain is fixed); r is one integer-exact numerator divided by one
    * sqrt of an integer-exact product, 6-dp floor-quantized. A
    * degree-regular graph has zero variance → null, stated rather than
    * NaN.
    *
    * Scale shape: the [[tradeEdges]] derivation dominates; degrees are
    * one keyed count over the staged edge list, joined back broadcast;
    * the moments are a single 1-row reduce. */
  def assortativity(s: SparkSession, d: String): DataFrame = {
    val e = graft.util.Ckpt.stage(tradeEdges(s, d).select(col("src"), col("dst")))
    val und = graft.util.Ckpt.stage(
      e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct())
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val ends = und
      .join(broadcast(deg.select(col("src"), col("deg").as("dx"))), "src")
      .join(broadcast(deg.select(col("src").as("dst"), col("deg").as("dy"))), "dst")
    ends.agg(count(lit(1)).as("m_ends"), sum("dx").as("sum_deg"),
        sum(col("dx") * col("dy")).as("sum_prod"),
        sum(col("dx") * col("dx")).as("sum_sq"),
        sum(col("dy") * col("dy")).as("sum_sq_y"))
      .select(col("m_ends"), col("sum_deg"), col("sum_prod"), col("sum_sq"),
        when((col("m_ends") * col("sum_sq") - col("sum_deg") * col("sum_deg")) === 0L
          || (col("m_ends") * col("sum_sq_y") - col("sum_deg") * col("sum_deg")) === 0L,
          lit(null).cast("double"))
          .otherwise(graft.util.Det.q6(
            (col("m_ends") * col("sum_prod") - col("sum_deg") * col("sum_deg"))
              .cast("double") /
            sqrt(((col("m_ends") * col("sum_sq") - col("sum_deg") * col("sum_deg"))
              * (col("m_ends") * col("sum_sq_y") - col("sum_deg") * col("sum_deg")))
              .cast("double"))))
          .as("assortativity"))
  }

  /** Reciprocity of the DIRECTED trade graph (distinct lanes, self-loops
    * dropped): per exporter nation, the fraction of its outgoing lanes
    * whose reverse lane also exists, plus a node = −1 'ALL' total — the
    * directed-structure audit that tells a partitioner whether a
    * bidirectional edge representation (half the exchange volume for
    * symmetric graphs) is worth it.
    *
    * Determinism: lane sets are DISTINCT integer pairs; reciprocated
    * lanes come from an exact self semi-join; the ratio is ONE IEEE
    * division of exact BIGINTs, 6-dp floor-quantized. Nations with no
    * outgoing lane report null, stated rather than NaN.
    *
    * Scale shape: the [[tradeEdges]] derivation dominates; the semi-join
    * runs on the staged ≤|nations|² lane list against its own reversal,
    * both keyed aggregates are node-bounded. */
  def reciprocity(s: SparkSession, d: String): DataFrame = {
    val e = graft.util.Ckpt.stage(tradeEdges(s, d)
      .select(col("src"), col("dst")).filter(col("src") =!= col("dst")).distinct())
    val rec = e.join(e.select(col("dst").as("r_src"), col("src").as("r_dst")),
      col("src") === col("r_src") && col("dst") === col("r_dst"), "left_semi")
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
    val nOut = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("n_out"))
    val nRec = rec.groupBy(col("src").as("node")).agg(count(lit(1)).as("n_rec"))
    val per = nodes
      .join(nOut, Seq("node"), "left")
      .join(nRec, Seq("node"), "left")
      .select(col("node"), col("nation"),
        coalesce(col("n_out"), lit(0L)).as("n_out"),
        coalesce(col("n_rec"), lit(0L)).as("n_rec"))
      .transform(graft.util.Ckpt.stage)
    val total = per.agg(sum("n_out").as("n_out"), sum("n_rec").as("n_rec"))
      .select(lit(-1).as("node"), lit("ALL").as("nation"), col("n_out"),
        col("n_rec"))
    per.select("node", "nation", "n_out", "n_rec")
      .unionByName(total)
      .withColumn("reciprocity",
        when(col("n_out") === 0L, lit(null).cast("double"))
          .otherwise(graft.util.Det.q6(
            col("n_rec").cast("double") / col("n_out").cast("double"))))
      .orderBy("node")
  }

  private[ops] val HitsIters = 2

  /** Weighted HITS (hubs & authorities) over the DIRECTED trade graph,
    * [[HitsIters]] mutual-reinforcement rounds — the directed complement
    * to [[pagerank]]'s single score: an authority nation is IMPORTED
    * into by strong exporters, a hub nation EXPORTS to strong importers;
    * the two scores split "trade influence" into its two directions
    * (a(v) = Σ_{u→v} h(u)·w, then h(u) = Σ_{u→v} a(v)·w).
    *
    * Determinism — integer fixed-point like [[pagerank]], with MAX
    * normalization instead of HITS' usual L2 (an L2 norm is a sqrt of a
    * float sum — engine freedom; max-normalize keeps every score an
    * exact integer in [0, Scale]): products promote to DECIMAL(38,0)/
    * HUGEINT (score·w ≤ 10¹²·|lineitem| wraps BIGINT), each round's
    * scores rescale by `(x·Scale) div max` — exact integer division —
    * and the oracle unrolls the identical rounds as generated CTEs.
    * Ranking ties break on the node key in the consumer, never needed
    * here (scores are exact).
    *
    * Scale shape: the [[tradeEdges]] derivation dominates; each round is
    * two joins + two keyed aggregates over the staged ≤|nations|² edge
    * list with a 1-row max broadcast back — per-round state is one row
    * per nation. */
  def hits(s: SparkSession, d: String): DataFrame = {
    val e = graft.util.Ckpt.stage(tradeEdges(s, d))
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
    val dec0 = "DECIMAL(38,0)"
    var hub = nodes.select(col("node"), lit(Scale).as("sc"))
    var auth = hub
    for (_ <- 1 to HitsIters) {
      val a = e.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(expr(s"sum(CAST(sc AS $dec0) * CAST(w AS $dec0))").as("raw"))
      val am = a.agg(max("raw").as("mx"))
      auth = nodes.join(a, Seq("node"), "left").crossJoin(broadcast(am))
        .select(col("node"), expr(
          s"coalesce((raw * CAST($Scale AS $dec0)) div mx, CAST(0 AS BIGINT))")
          .as("sc"))
      val h = e.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(expr(s"sum(CAST(sc AS $dec0) * CAST(w AS $dec0))").as("raw"))
      val hm = h.agg(max("raw").as("mx"))
      hub = nodes.join(h, Seq("node"), "left").crossJoin(broadcast(hm))
        .select(col("node"), expr(
          s"coalesce((raw * CAST($Scale AS $dec0)) div mx, CAST(0 AS BIGINT))")
          .as("sc"))
    }
    nodes
      .join(hub.withColumnRenamed("sc", "hub"), "node")
      .join(auth.withColumnRenamed("sc", "authority"), "node")
      .select(col("node"), col("nation"), col("hub"), col("authority"))
      .orderBy("node")
  }

  /** Closeness centrality over the UNDIRECTED trade graph by all-pairs
    * hop relaxation — the fourth centrality leg (PageRank = recursive
    * influence, HITS = directed hub/authority, triangles = local
    * cohesion; closeness = "how few hops to everyone?", the score that
    * ranks distribution hubs): C(u) = (r−1)/Σd over the r−1 nodes u
    * reaches, with the reach count reported so disconnected graphs stay
    * honest.
    *
    * Determinism: pure integer min-distance relaxation to a fixpoint
    * ([[bfsHops]] multi-sourced — same convergence-scalar loop, same
    * exact integer state); closeness is ONE division of exact integers,
    * 6-dp floor-quantized. The oracle reaches the same fixpoint with a
    * depth-bounded recursive closure + min().
    *
    * Scale shape: the [[tradeEdges]] derivation dominates; the
    * relaxation state is |nations|² (src, node, dist) rows over the
    * staged edge list, `Ckpt`-staged per round with a 1-row convergence
    * scalar — the established iterative shape. At a million-node graph
    * closeness switches to sampled sources or HyperBall sketches; at
    * the nation grain the exact loop is the right plan. */
  /** All-pairs hop distances over the undirected trade graph at the
    * relaxation fixpoint — the shared front end of [[closeness]] and
    * [[hopHistogram]]: (nodes, dist) with dist = (s0, node, dist) for
    * every reachable ordered pair (self-pairs included at dist 0). */
  private def apspDist(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val e = graft.util.Ckpt.stage(tradeEdges(s, d).select(col("src"), col("dst")))
    val und = graft.util.Ckpt.stage(
      e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct())
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
    (nodes, relaxAll(nodes, und))
  }

  /** Min-hop relaxation to the fixpoint from every source over the given
    * undirected edge list — the loop body shared by [[apspDist]] (full
    * graph) and [[hopHistogram]] (strong-lane graph). */
  private def relaxAll(nodes: DataFrame, und: DataFrame): DataFrame = {
    var dist = nodes.select(col("node").as("s0"), col("node"), lit(0L).as("dist"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 30) {
      val relaxed = und.join(dist.withColumnRenamed("node", "src"), "src")
        .groupBy(col("s0"), col("dst").as("node"))
        .agg(min(col("dist") + 1).as("nd"))
      val next = dist.join(relaxed, Seq("s0", "node"), "full")
        .select(col("s0"), col("node"),
          least(coalesce(col("dist"), lit(Long.MaxValue)),
            coalesce(col("nd"), lit(Long.MaxValue))).as("dist2"),
          (coalesce(col("nd"), lit(Long.MaxValue)) <
            coalesce(col("dist"), lit(Long.MaxValue))).cast("int").as("chg"))
        .transform(graft.util.Ckpt.stage)
      changed = next.agg(coalesce(sum("chg"), lit(0L))).collect()(0).getLong(0)
      dist = next.select(col("s0"), col("node"), col("dist2").as("dist"))
      rounds += 1
    }
    dist
  }

  def closeness(s: SparkSession, d: String): DataFrame = {
    val (nodes, dist) = apspDist(s, d)
    val q6 = (c: Column) => floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val per = dist.filter(col("s0") =!= col("node"))
      .groupBy(col("s0").as("node"))
      .agg(count(lit(1)).as("n_reach"), sum("dist").as("sum_dist"))
    nodes.join(per, Seq("node"), "left")
      .select(col("node"), col("nation"),
        coalesce(col("n_reach"), lit(0L)).as("n_reach"),
        coalesce(col("sum_dist"), lit(0L)).as("sum_dist"),
        when(coalesce(col("sum_dist"), lit(0L)) === 0L, lit(null).cast("double"))
          .otherwise(q6(col("n_reach").cast("double") /
            col("sum_dist").cast("double"))).as("closeness"))
      .orderBy("node")
  }

  /** Pairwise hop-distance distribution + effective diameter over the
    * STRONG-lane trade graph — the neighborhood-function audit behind
    * "how many rounds does an iterative graph algorithm need?". The raw
    * trade graph is complete at every fixture scale (25 nations, every
    * pair trades), so the distribution runs on the backbone that has
    * actual structure: lanes carrying MORE than the mean lane weight
    * (`w · n_lanes > total_w` — a pure integer test, no division).
    * For each hop count d ≥ 1: the number of reachable ordered pairs at
    * exactly d hops, the running total, and the p90 flag whose FIRST
    * true row is the effective diameter (the standard 90th-percentile
    * definition — robust to a few stragglers, unlike the max).
    *
    * Determinism: distances come from the [[relaxAll]] integer
    * relaxation fixpoint (the [[closeness]] loop, shared); the strong
    * filter, the histogram, the cumulative count (a triangular
    * self-join over the ≤diameter-row histogram — never an
    * unpartitioned running-sum window), and the p90 test
    * `10·cum ≥ 9·total` are all exact integer algebra.
    *
    * Scale shape: the [[tradeEdges]] derivation dominates; the strong
    * threshold is a 1-row broadcast against the aggregated lane list;
    * the relaxation is the established per-round staged loop; the
    * histogram is domain-bounded (≤ graph diameter rows), so the
    * cumulative join and the 1-row total broadcast are metadata-sized.
    * On a billion-node graph the exact APSP front end gives way to
    * HyperANF/HyperBall sketches; the distribution-then-percentile
    * shape is unchanged. */
  def hopHistogram(s: SparkSession, d: String): DataFrame = {
    val e = graft.util.Ckpt.stage(tradeEdges(s, d))
    val tw = e.agg(sum("w").as("tw"), count(lit(1)).as("nl"))
    val strong = e.crossJoin(broadcast(tw))
      .filter(col("w") * col("nl") > col("tw"))
      .select(col("src"), col("dst"))
    val und = graft.util.Ckpt.stage(
      strong.unionAll(strong.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct())
    val nodes = Tables.nation(s, d)
      .select(col("n_nationkey").as("node"), col("n_name").as("nation"))
    val dist = relaxAll(nodes, und)
    val hist = graft.util.Ckpt.stage(
      dist.filter(col("s0") =!= col("node"))
        .groupBy("dist").agg(count(lit(1)).as("n_pairs")))
    val tot = hist.agg(sum("n_pairs").as("total"))
    hist
      .join(broadcast(hist.select(col("dist").as("d2"), col("n_pairs").as("c2"))),
        col("d2") <= col("dist"))
      .groupBy("dist", "n_pairs").agg(sum("c2").as("cum_pairs"))
      .crossJoin(broadcast(tot))
      .select(col("dist"), col("n_pairs"), col("cum_pairs"),
        (col("cum_pairs") * 10 >= col("total") * 9).as("reached_p90"))
      .orderBy("dist")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hop_histogram" -> (hopHistogram _),
    "q_modularity" -> (modularity _),
    "q_assortativity" -> (assortativity _),
    "q_reciprocity" -> (reciprocity _),
    "q_closeness" -> (closeness _),
    "q_hits" -> (hits _),
    "q_label_prop" -> (labelProp _),
    "q_kcore_peel" -> (kcorePeel _),
    "q_assoc_rules" -> (assocRules _),
    "q_copurchase_pairs" -> (copurchasePairs _),
    "q_jaccard_neighbors" -> (jaccardNeighbors _),
    "q_degree_dist" -> (degreeDist _),
    "q_pagerank"  -> (pagerank _),
    "q_graph_bfs" -> (bfsHops _),
    "q_triangle_count" -> (triangleCount _),
  )

  /** Shared edge-derivation CTE (the SQL twin of [[tradeEdges]]).
    * `sum(w)` is HUGEINT in DuckDB — cast back to BIGINT so `//` and the
    * result column match Spark's long arithmetic exactly. */
  private val EdgeCte =
    """e AS (
      |  SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey  = s_suppkey
      |  JOIN customer ON o_custkey  = c_custkey
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** The PageRank oracle unrolls [[PrIters]] iterations as generated CTEs
    * from the same Scale/DampPct constants as the Spark plan. */
  private def pagerankOracle: String = {
    val teleport = (100L - DampPct) * Scale / 100L
    val iters = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CAST($teleport + ($DampPct * coalesce(inf.i, 0)) // 100 AS BIGINT) AS rank
         |  FROM n LEFT JOIN (
         |    SELECT ew.dst, CAST(sum((r.rank // ew.outw) * ew.w) AS BIGINT) AS i
         |    FROM ew JOIN r${i - 1} r ON ew.src = r.node
         |    GROUP BY ew.dst) inf
         |  ON n.node = inf.dst
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCte, ow AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY src
       |), ew AS (
       |  SELECT e.src, e.dst, CAST(e.w AS BIGINT) AS w, ow.outw
       |  FROM e JOIN ow USING (src)
       |), n AS (
       |  SELECT n_nationkey AS node, n_name AS nation FROM nation
       |), r0 AS (
       |  SELECT node, CAST($Scale AS BIGINT) AS rank FROM n
       |), $iters
       |SELECT n.node, n.nation, r.rank
       |FROM n JOIN r$PrIters r USING (node)
       |ORDER BY n.node""".stripMargin
  }

  /** Shared oracle CTE chain for the LPA rounds (the SQL twin of
    * [[lpaState]]): edges → und → n → l0 → unrolled rounds ending at
    * `l{LpaRounds}`. [[labelPropOracle]] and the [[modularity]] oracle
    * both chain from it, mirroring the shared Spark machinery. */
  private def lpaCtes: String = {
    val rounds = (1 to LpaRounds).map { i =>
      s"""v$i AS (
         |  SELECT u.dst AS node, l.lab, CAST(sum(u.w) AS BIGINT) AS vw
         |  FROM und u JOIN l${i - 1} l ON u.src = l.node
         |  GROUP BY 1, 2
         |), p$i AS (
         |  SELECT node, lab FROM (
         |    SELECT node, lab,
         |           row_number() OVER (PARTITION BY node
         |                              ORDER BY vw DESC, lab ASC) AS rn
         |    FROM v$i) t WHERE rn = 1
         |), l$i AS (
         |  SELECT l.node, COALESCE(p.lab, l.lab) AS lab
         |  FROM l${i - 1} l LEFT JOIN p$i p ON l.node = p.node
         |)""".stripMargin
    }.mkString(", ")
    s"""$EdgeCte, und AS (
       |  SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT src, dst, w FROM e
       |    UNION ALL SELECT dst AS src, src AS dst, w FROM e
       |  ) b WHERE src <> dst GROUP BY 1, 2
       |), n AS (
       |  SELECT n_nationkey AS node, n_name AS nation FROM nation
       |), l0 AS (
       |  SELECT node, node AS lab FROM n
       |), $rounds""".stripMargin
  }

  /** The [[labelProp]] oracle unrolls [[LpaRounds]] synchronous rounds
    * as generated CTEs over the same undirected weighted edge list. */
  private def labelPropOracle: String =
    s"""WITH $lpaCtes
       |SELECT n.node, n.nation, l.lab AS label,
       |       CAST(count(*) OVER (PARTITION BY l.lab) AS BIGINT)
       |         AS community_size
       |FROM n JOIN l$LpaRounds l USING (node)
       |ORDER BY n.node""".stripMargin

  /** The [[modularity]] oracle chains [[lpaCtes]] (the identical unrolled
    * LPA rounds) into the three community aggregates, quantizing each
    * contribution to 8 dp and totalling in DECIMAL(20,8) exactly as the
    * Spark plan does. */
  private def modularityOracle: String =
    s"""WITH $lpaCtes, labf AS (
       |  SELECT node, lab FROM l$LpaRounds
       |), m2 AS (
       |  SELECT CAST(sum(w) AS BIGINT) AS m2 FROM und
       |), wi AS (
       |  SELECT ls.lab AS label, CAST(sum(u.w) AS BIGINT) AS w_in
       |  FROM und u
       |  JOIN labf ls ON u.src = ls.node
       |  JOIN labf ld ON u.dst = ld.node
       |  WHERE ls.lab = ld.lab GROUP BY 1
       |), wt AS (
       |  SELECT l.lab AS label, CAST(sum(dw) AS BIGINT) AS w_tot
       |  FROM (SELECT src, CAST(sum(w) AS BIGINT) AS dw FROM und GROUP BY src) dg
       |  JOIN labf l ON dg.src = l.node GROUP BY 1
       |), ns AS (
       |  SELECT lab AS label, CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM labf GROUP BY 1
       |), per AS (
       |  SELECT ns.label, ns.n_nodes,
       |         COALESCE(wi.w_in, 0) AS w_in,
       |         COALESCE(wt.w_tot, 0) AS w_tot,
       |         CASE WHEN m2.m2 = 0 THEN 0.0 ELSE
       |           floor((CAST(COALESCE(wi.w_in, 0) AS DOUBLE) / CAST(m2.m2 AS DOUBLE)
       |                  - (CAST(COALESCE(wt.w_tot, 0) AS DOUBLE) / CAST(m2.m2 AS DOUBLE))
       |                    * (CAST(COALESCE(wt.w_tot, 0) AS DOUBLE) / CAST(m2.m2 AS DOUBLE)))
       |                 * 100000000 + 0.5) / 100000000
       |         END AS contrib
       |  FROM ns LEFT JOIN wt USING (label) LEFT JOIN wi USING (label), m2
       |)
       |SELECT label, n_nodes, w_in, w_tot, contrib FROM per
       |UNION ALL
       |SELECT CAST(-1 AS INTEGER), CAST(sum(n_nodes) AS BIGINT),
       |       CAST(sum(w_in) AS BIGINT), CAST(sum(w_tot) AS BIGINT),
       |       CAST(sum(CAST(contrib AS DECIMAL(20,8))) AS DOUBLE)
       |FROM per
       |ORDER BY label""".stripMargin

  /** The [[hits]] oracle unrolls [[HitsIters]] rounds as generated CTEs
    * with the same Scale constant and max-normalization. */
  private def hitsOracle: String = {
    val rounds = (1 to HitsIters).map { i =>
      s"""ar$i AS (
         |  SELECT e.dst AS node, sum(CAST(h${i - 1}.sc AS HUGEINT) * e.w) AS raw
         |  FROM e JOIN h${i - 1} ON e.src = h${i - 1}.node GROUP BY 1
         |), am$i AS (SELECT max(raw) AS mx FROM ar$i),
         |a$i AS (
         |  SELECT n.node,
         |    CAST(COALESCE((ar$i.raw * $Scale) // am$i.mx, 0) AS BIGINT) AS sc
         |  FROM n LEFT JOIN ar$i ON n.node = ar$i.node CROSS JOIN am$i
         |), hr$i AS (
         |  SELECT e.src AS node, sum(CAST(a$i.sc AS HUGEINT) * e.w) AS raw
         |  FROM e JOIN a$i ON e.dst = a$i.node GROUP BY 1
         |), hm$i AS (SELECT max(raw) AS mx FROM hr$i),
         |h$i AS (
         |  SELECT n.node,
         |    CAST(COALESCE((hr$i.raw * $Scale) // hm$i.mx, 0) AS BIGINT) AS sc
         |  FROM n LEFT JOIN hr$i ON n.node = hr$i.node CROSS JOIN hm$i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH $EdgeCte, n AS (
       |  SELECT n_nationkey AS node, n_name AS nation FROM nation
       |), h0 AS (
       |  SELECT node, CAST($Scale AS BIGINT) AS sc FROM n
       |), $rounds
       |SELECT n.node, n.nation, h.sc AS hub, a.sc AS authority
       |FROM n JOIN h$HitsIters h USING (node) JOIN a$HitsIters a USING (node)
       |ORDER BY n.node""".stripMargin
  }

  /** Depth bound for the oracle-side recursive shortest-path walks:
    * |nation nodes| − 1 = 24, the longest possible shortest path on a
    * 25-node graph (ADVICE r10 — previously a magic 24 that would
    * silently truncate long paths if the node grain ever changed; the
    * Spark side iterates relaxAll to the fixpoint, so only the oracle
    * needed the bound made structural). */
  private val NationNodes = 25
  private def WalkDepthBound: Int = NationNodes - 1

  val oracle: Map[String, String] = Map(
    // the [[closeness]] oracle's depth-bounded recursive closure reaches
    // the same integer fixpoint; histogram, triangular cumsum, and the
    // 10·cum ≥ 9·total p90 rule are pure integer algebra
    "q_hop_histogram" ->
      s"""WITH RECURSIVE $EdgeCte, thr AS (
         |  SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(count(*) AS BIGINT) AS nl
         |  FROM e
         |), strong AS (
         |  SELECT src, dst FROM e, thr WHERE w * nl > tw
         |), und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM strong
         |    UNION ALL SELECT dst AS src, src AS dst FROM strong) b
         |  WHERE src <> dst
         |), n AS (
         |  SELECT n_nationkey AS node FROM nation
         |), walk(s0, node, d) AS (
         |  SELECT node, node, 0 FROM n
         |  UNION
         |  SELECT w.s0, u.dst, w.d + 1
         |  FROM walk w JOIN und u ON u.src = w.node WHERE w.d < $WalkDepthBound
         |), sp AS (
         |  SELECT s0, node, CAST(min(d) AS BIGINT) AS dist
         |  FROM walk GROUP BY 1, 2
         |), h AS (
         |  SELECT dist, CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM sp WHERE s0 <> node GROUP BY 1
         |), t AS (
         |  SELECT CAST(sum(n_pairs) AS BIGINT) AS total FROM h
         |), c AS (
         |  SELECT a.dist, a.n_pairs, CAST(sum(b.n_pairs) AS BIGINT) AS cum_pairs
         |  FROM h a JOIN h b ON b.dist <= a.dist
         |  GROUP BY 1, 2
         |)
         |SELECT c.dist, c.n_pairs, c.cum_pairs,
         |       (c.cum_pairs * 10 >= t.total * 9) AS reached_p90
         |FROM c, t ORDER BY c.dist""".stripMargin,
    "q_modularity" -> modularityOracle,
    "q_assortativity" ->
      s"""WITH $EdgeCte, und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM e
         |    UNION ALL SELECT dst AS src, src AS dst FROM e) b
         |  WHERE src <> dst
         |), deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY src
         |), ends AS (
         |  SELECT dx.deg AS dx, dy.deg AS dy
         |  FROM und
         |  JOIN deg dx ON und.src = dx.src
         |  JOIN deg dy ON und.dst = dy.src
         |), m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m_ends,
         |         CAST(sum(dx) AS BIGINT) AS sum_deg,
         |         CAST(sum(dx * dy) AS BIGINT) AS sum_prod,
         |         CAST(sum(dx * dx) AS BIGINT) AS sum_sq,
         |         CAST(sum(dy * dy) AS BIGINT) AS sum_sq_y
         |  FROM ends
         |)
         |SELECT m_ends, sum_deg, sum_prod, sum_sq,
         |  CASE WHEN (m_ends * sum_sq - sum_deg * sum_deg) = 0
         |         OR (m_ends * sum_sq_y - sum_deg * sum_deg) = 0 THEN NULL
         |       ELSE floor(CAST(m_ends * sum_prod - sum_deg * sum_deg AS DOUBLE)
         |                  / sqrt(CAST((m_ends * sum_sq - sum_deg * sum_deg)
         |                              * (m_ends * sum_sq_y - sum_deg * sum_deg)
         |                              AS DOUBLE))
         |                  * 1000000 + 0.5) / 1000000
         |  END AS assortativity
         |FROM m""".stripMargin,
    "q_reciprocity" ->
      s"""WITH $EdgeCte, e2 AS (
         |  SELECT DISTINCT src, dst FROM e WHERE src <> dst
         |), r AS (
         |  SELECT a.src, a.dst
         |  FROM e2 a JOIN e2 b ON a.src = b.dst AND a.dst = b.src
         |), n AS (
         |  SELECT n_nationkey AS node, n_name AS nation FROM nation
         |), no AS (
         |  SELECT src AS node, CAST(count(*) AS BIGINT) AS n_out
         |  FROM e2 GROUP BY 1
         |), nr AS (
         |  SELECT src AS node, CAST(count(*) AS BIGINT) AS n_rec
         |  FROM r GROUP BY 1
         |), per AS (
         |  SELECT n.node, n.nation,
         |         COALESCE(no.n_out, 0) AS n_out, COALESCE(nr.n_rec, 0) AS n_rec
         |  FROM n LEFT JOIN no USING (node) LEFT JOIN nr USING (node)
         |), u AS (
         |  SELECT node, nation, n_out, n_rec FROM per
         |  UNION ALL
         |  SELECT CAST(-1 AS INTEGER), 'ALL',
         |         CAST(sum(n_out) AS BIGINT), CAST(sum(n_rec) AS BIGINT)
         |  FROM per
         |)
         |SELECT node, nation, n_out, n_rec,
         |  CASE WHEN n_out = 0 THEN NULL
         |       ELSE floor(CAST(n_rec AS DOUBLE) / CAST(n_out AS DOUBLE)
         |                  * 1000000 + 0.5) / 1000000
         |  END AS reciprocity
         |FROM u ORDER BY node""".stripMargin,
    // depth-bounded recursive closure + min() reaches the same integer
    // fixpoint as the engine's relaxation loop
    "q_closeness" ->
      s"""WITH RECURSIVE $EdgeCte, und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM e
         |    UNION ALL SELECT dst AS src, src AS dst FROM e) b
         |  WHERE src <> dst
         |), n AS (
         |  SELECT n_nationkey AS node, n_name AS nation FROM nation
         |), walk(s0, node, d) AS (
         |  SELECT node, node, 0 FROM n
         |  UNION
         |  SELECT w.s0, u.dst, w.d + 1
         |  FROM walk w JOIN und u ON u.src = w.node WHERE w.d < $WalkDepthBound
         |), sp AS (
         |  SELECT s0, node, CAST(min(d) AS BIGINT) AS dist
         |  FROM walk GROUP BY 1, 2
         |), per AS (
         |  SELECT s0 AS node, CAST(count(*) AS BIGINT) AS n_reach,
         |         CAST(sum(dist) AS BIGINT) AS sum_dist
         |  FROM sp WHERE s0 <> node GROUP BY 1
         |)
         |SELECT n.node, n.nation,
         |  COALESCE(per.n_reach, 0) AS n_reach,
         |  COALESCE(per.sum_dist, 0) AS sum_dist,
         |  CASE WHEN COALESCE(per.sum_dist, 0) = 0 THEN NULL
         |       ELSE floor(CAST(per.n_reach AS DOUBLE)
         |                  / CAST(per.sum_dist AS DOUBLE) * 1000000 + 0.5)
         |            / 1000000
         |  END AS closeness
         |FROM n LEFT JOIN per USING (node)
         |ORDER BY n.node""".stripMargin,
    "q_hits" -> hitsOracle,
    "q_label_prop" -> labelPropOracle,
    "q_kcore_peel" -> {
      val passes = (1 to CorePasses).map { p =>
        s"""d$p AS MATERIALIZED (
           |  SELECT node, count(*) AS dg
           |  FROM (SELECT pa AS node FROM e${p - 1} UNION ALL SELECT pb FROM e${p - 1}) u
           |  GROUP BY node
           |), k$p AS MATERIALIZED (SELECT node FROM d$p WHERE dg >= $CoreK),
           |e$p AS MATERIALIZED (
           |  SELECT e.pa, e.pb FROM e${p - 1} e
           |  JOIN k$p ka ON e.pa = ka.node
           |  JOIN k$p kb ON e.pb = kb.node
           |)""".stripMargin
      }.mkString(",\n")
      val rows = (1 to CorePasses).map { p =>
        s"""SELECT $p AS pass,
           |  CAST((SELECT count(DISTINCT node) FROM
           |        (SELECT pa AS node FROM e$p UNION ALL SELECT pb FROM e$p) t)
           |       AS BIGINT) AS n_nodes,
           |  CAST((SELECT count(*) FROM e$p) AS BIGINT) AS n_edges""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
         |), e0 AS MATERIALIZED (
         |  SELECT a.p AS pa, b.p AS pb
         |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
         |  GROUP BY 1, 2 HAVING count(*) >= 2
         |),
         |$passes
         |$rows
         |ORDER BY pass""".stripMargin
    },
    "q_assoc_rules" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), supp AS (
        |  SELECT p, CAST(count(*) AS BIGINT) AS n_i FROM li GROUP BY p
        |), n AS (
        |  SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM li
        |), pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), dir AS (
        |  SELECT pa AS antecedent, pb AS consequent, n_ab FROM pairs
        |  UNION ALL
        |  SELECT pb AS antecedent, pa AS consequent, n_ab FROM pairs
        |)
        |SELECT d.antecedent, d.consequent, d.n_ab AS n_both,
        |  sa.n_i AS n_ante, sc.n_i AS n_cons,
        |  floor(CAST(d.n_ab AS DOUBLE) / CAST(sa.n_i AS DOUBLE)
        |        * 1000000.0 + 0.5) / 1000000.0 AS confidence,
        |  floor(CAST(n.n_orders * d.n_ab AS DOUBLE)
        |        / CAST(sa.n_i * sc.n_i AS DOUBLE)
        |        * 1000000.0 + 0.5) / 1000000.0 AS lift
        |FROM dir d
        |JOIN supp sa ON d.antecedent = sa.p
        |JOIN supp sc ON d.consequent = sc.p, n
        |ORDER BY lift DESC, confidence DESC, antecedent ASC, consequent ASC
        |LIMIT 50""".stripMargin,
    "q_copurchase_pairs" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |)
        |SELECT a.p AS part_a, b.p AS part_b, count(*) AS n_orders
        |FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |GROUP BY 1, 2
        |HAVING count(*) >= 2
        |ORDER BY n_orders DESC, part_a ASC, part_b ASC
        |LIMIT 100""".stripMargin,
    "q_jaccard_neighbors" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |), keep AS (
         |  SELECT c FROM pairs GROUP BY c HAVING count(*) <= $JaccardDegCap
         |), capped AS (
         |  SELECT pairs.c, pairs.p FROM pairs JOIN keep USING (c)
         |), deg AS (
         |  SELECT p, CAST(count(*) AS BIGINT) AS deg FROM capped GROUP BY p
         |), co AS (
         |  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS co
         |  FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
         |  GROUP BY a.p, b.p HAVING count(*) >= 2
         |)
         |SELECT co.pa AS supp_a, co.pb AS supp_b, co.co,
         |       da.deg AS deg_a, db.deg AS deg_b,
         |       floor(CAST(co.co AS DOUBLE) / CAST(da.deg + db.deg - co.co AS DOUBLE)
         |             * 1000000.0 + 0.5) / 1000000.0 AS jaccard
         |FROM co JOIN deg da ON co.pa = da.p JOIN deg db ON co.pb = db.p
         |ORDER BY supp_a, supp_b""".stripMargin,
    "q_degree_dist" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS p
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), cd AS (SELECT c, CAST(count(*) AS BIGINT) AS degree FROM pairs GROUP BY c),
        |sd AS (SELECT p, CAST(count(*) AS BIGINT) AS degree FROM pairs GROUP BY p)
        |SELECT side, degree, n_nodes FROM (
        |  SELECT 'customer' AS side, degree, CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM cd GROUP BY degree
        |  UNION ALL
        |  SELECT 'supplier', degree, CAST(count(*) AS BIGINT) FROM sd GROUP BY degree
        |) t ORDER BY side, degree""".stripMargin,
    "q_pagerank" -> pagerankOracle,
    "q_triangle_count" ->
      s"""WITH $EdgeCte, und AS (
         |  SELECT src, dst FROM e WHERE src <> dst
         |  UNION
         |  SELECT dst, src FROM e WHERE src <> dst
         |), n AS (
         |  SELECT n_nationkey AS node, n_name AS nation FROM nation
         |), t AS (
         |  SELECT e1.src AS node, count(*) AS n_tri
         |  FROM und e1
         |  JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  JOIN und e3 ON e3.src = e1.dst AND e3.dst = e2.dst
         |  GROUP BY 1
         |)
         |SELECT n.node, n.nation, CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri
         |FROM n LEFT JOIN t USING (node)
         |ORDER BY n.node""".stripMargin,
    "q_graph_bfs" ->
      s"""WITH RECURSIVE $EdgeCte, und AS (
         |  SELECT src, dst FROM e UNION SELECT dst, src FROM e
         |), n AS (
         |  SELECT n_nationkey AS node, n_name AS nation FROM nation
         |), reach(node, dist) AS (
         |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |  UNION
         |  SELECT und.dst, r.dist + 1
         |  FROM reach r JOIN und ON und.src = r.node
         |  WHERE r.dist < 30
         |), best AS (
         |  SELECT node, min(dist) AS dist FROM reach GROUP BY node
         |)
         |SELECT n.node, n.nation, best.dist
         |FROM n LEFT JOIN best USING (node)
         |ORDER BY n.node""".stripMargin,
  )
}

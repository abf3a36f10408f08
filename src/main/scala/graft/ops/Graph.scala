package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics expressed as joins + aggregations — the
  * Spark-native shape for link-quality signals over crawl-scale domain
  * graphs (PageRank-family centrality is a standard quality input when
  * curating web corpora: rank donors/receivers surface spam clusters and
  * authoritative sources).
  */
object Graph {

  /** Weighted PageRank with a FIXED iteration count, computed entirely in
    * fixed-point micro-units (Long): rank starts at 1e6 per node and each
    * round is
    *
    *   r'(v) = (1−d)·1e6 + Σ_{(u,v,w)} (r(u) · d% · w) div (100 · W(u))
    *
    * with W(u) the total out-weight of u and every division an integer
    * floor — no float anywhere, so the result is bit-identical across
    * engines, partitionings, and aggregation orders (the property that
    * lets a SQL oracle replay it exactly). Dangling-node mass is dropped,
    * not redistributed — a documented simplification that keeps each
    * round one join + one aggregation; ranks are a relative quality
    * signal, not a probability distribution.
    *
    * Inputs: `edges` with columns (src, dst, w), `nodes` with column
    * (node) — every node that should carry rank, including those with no
    * edges. Returns (node, r) with r in micro-units.
    *
    * Scale shape: each iteration is one equi-join of the edge list with
    * the (node-sized) rank frame plus one groupBy(dst) — the textbook
    * distributed PageRank step, linear in edges with both shuffles on
    * node keys. The edge subtree is IDENTICAL across iterations, so
    * Catalyst's ReusedExchange serves rounds 2..k from round 1's shuffle
    * files instead of recomputing the edge build. The iteration count is
    * a bounded driver loop (plan depth grows linearly with `iters`; for
    * long chains at scale, checkpoint the rank frame every ~20 rounds to
    * cut lineage — the componentsScoped discipline).
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
      dampingPct: Int = 85): DataFrame = {
    // Overflow envelope (fixed-point Long): the per-edge product is
    // r · dampingPct · w, with r bounded by the total injected mass
    // ≈ n_nodes · 1e6 micro-units in the absorbing worst case. It stays
    // below 2⁶³ while n_nodes · max(w) < ~1.08e11 (e.g. 1e9 nodes with
    // weights ≤ 100) — beyond that, pre-scale the weights or rescale the
    // rank unit before calling; the div applies AFTER the product, so the
    // product is the binding term, not the rank itself.
    require(iters >= 1 && iters <= 50,
      "iters must be in [1, 50] — beyond that, checkpoint between calls")
    require(dampingPct >= 0 && dampingPct <= 100,
      "dampingPct is a percentage")
    val outW = edges.groupBy("src").agg(sum(col("w")).as("wt"))
    val ew = edges.join(outW, Seq("src"))
    val base = (100L - dampingPct) * 10000L // (1−d) · 1e6
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ew.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"),
          expr(s"(r * $dampingPct * w) div (100 * wt)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), (lit(base) + coalesce(col("c"), lit(0L))).as("r"))
    }
    ranks
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with a FIXED
    * round count — community detection over the crawl/domain graph (the
    * coarser cousin of connected components: components find reachable
    * sets, LPA finds densely-linked clusters — link rings, topic hubs —
    * inside one component). Deterministic by construction: labels start
    * as the node id, each round every node adopts the MODE of its
    * neighbors' labels with ties to the SMALLEST label, all nodes update
    * simultaneously. No float, no randomness — a SQL oracle replays the
    * rounds exactly. Fixed rounds are a documented approximation of the
    * fixpoint (like [[kCoreScoped]]'s bounded peel); synchronous LPA can
    * 2-cycle on bipartite structures, which fixed rounds also bound.
    *
    * Input: `edges` (a, b) any orientation (symmetrized, self-loops
    * dropped), `nodes` (node). Returns (node, label). NODE IDS MUST BE
    * NUMERIC (castable to long) — labels are seeded from the id itself,
    * and a string id that casts to NULL would silently null every
    * label, so the seed raises loudly instead (hash string ids to a
    * 52-bit key upstream, e.g. [[graft.ops.Kmv.hash52]], before calling).
    *
    * Scale shape — the [[pageRank]] discipline: each round is one
    * edge-to-labels equi-join + one (node, label) count + one argmax
    * aggregate, every shuffle node-keyed, and the previous state is
    * referenced exactly ONCE (isolated nodes fall back to their INITIAL
    * label — semantically identical, since a neighborless node's label
    * can never change — so the fallback needs no second state
    * reference and lineage stays linear in `iters`).
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50,
      "iters must be in [1, 50] — beyond that, checkpoint between calls")
    val und = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val sym = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
    // loud seed: a non-numeric id must fail HERE, not propagate as a
    // NULL label through every round (cast-to-long of e.g. "siteA" is
    // NULL, and NULL labels would win no argmax yet poison coalesce)
    val seed = when(col("node").isNotNull && col("node").cast("long").isNotNull,
        col("node").cast("long"))
      .otherwise(raise_error(concat(
        lit("labelPropagation: node id not castable to long: "),
        coalesce(col("node").cast("string"), lit("NULL")))).cast("long"))
    var labels = nodes.select(col("node"), seed.as("label"))
    for (_ <- 1 to iters) {
      val freq = sym
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("a")
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("a").as("node"), (-col("m.neg")).as("nl"))
      labels = nodes
        .join(freq, Seq("node"), "left")
        .select(col("node"), coalesce(col("nl"), seed).as("label"))
    }
    labels
  }

  /** Triangle enumeration by DEGREE ORIENTATION — the O(m^{3/2})
    * algorithm every distributed triangle counter uses (a naive wedge
    * join pays Σ deg² and melts on hub nodes; orienting each undirected
    * edge from its lower-(degree, id) endpoint to the higher bounds
    * every out-degree by O(√m) regardless of skew, and counts each
    * triangle exactly once, at its lowest-ranked corner). Triangle
    * link-structure is a standard crawl-quality input next to
    * [[pageRank]]: spam farms and link rings are triangle-dense, genuine
    * editorial graphs are triangle-sparse.
    *
    * Input: `edges` with columns (a, b) — any direction, self-loops and
    * duplicates tolerated (canonicalized + dropped). Returns one row per
    * triangle (x, y, z) in orientation order (x the lowest-ranked
    * corner).
    *
    * Scale shape: degree agg (linear) → two equi-joins on node keys —
    * the wedge join fans out ≤ outdeg² per node, bounded by the
    * orientation; the closing join is an equi-semi on the oriented edge
    * key. No product anywhere; every shuffle is node-keyed.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    // orient low-(deg, id) → high-(deg, id); carry the dst rank key for
    // the wedge ordering below
    val or = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("s"), col("b").as("t"),
          struct(col("db").as("d"), col("b").as("n")).as("tr")))
        .otherwise(
          struct(col("b").as("s"), col("a").as("t"),
            struct(col("da").as("d"), col("a").as("n")).as("tr"))).as("e"))
      .select(col("e.s").as("src"), col("e.t").as("dst"),
        col("e.tr").as("dr"))
    val wedges = or.as("e1").join(or.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dr") < col("e2.dr"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"),
        col("e2.dst").as("z"))
    wedges.join(or.select(col("src").as("y"), col("dst").as("z")),
      Seq("y", "z"), "left_semi")
  }

  /** Bounded k-core peel — the degeneracy screen behind link-farm /
    * engagement-ring detection: iteratively remove nodes of degree < k;
    * what survives `rounds` removals is the (bounded) k-core. The true
    * core fixpoint can need up to n rounds on a path; a FIXED round
    * count keeps the plan finite and the SQL oracle replayable, and is a
    * documented over-approximation (nodes alive after `rounds` may yet
    * peel — raise `rounds` or re-call on the survivor subgraph to
    * tighten). Input (a, b) edge pairs; self-loops dropped, both
    * orientations deduped. Returns EVERY original node:
    * (node, core_deg, in_core) with core_deg its degree inside the
    * surviving set (0 outside).
    *
    * Scale shape — LINEAR lineage by construction. The iterated state is
    * the SYMMETRIC surviving edge list itself (both orientations), and a
    * peel round is two windowed counts over it — `count(*) over
    * (partition by a)` is deg(a), the same over `b` is deg(b) — followed
    * by the filter `deg(a) ≥ k AND deg(b) ≥ k` (an edge survives iff
    * both endpoints survive; the condition is symmetric, so both
    * orientations drop together and the state stays symmetric). Each
    * round references the previous state exactly ONCE, so the logical
    * plan grows linearly in `rounds`. The previous join formulation
    * (alive-node set re-joined against the edge list per endpoint)
    * referenced the prior state TWICE per round, DOUBLING the logical
    * tree per round — Catalyst compile time went exponential (~8 s to
    * plan 4 rounds, ~30 s for 6 at sf0.1, vs 0.1 s to execute) and the
    * `localCheckpoint` calls that bounded it cost more than the whole
    * peel. With linear lineage no mid-loop checkpoint is needed: each
    * round is two node-keyed shuffles whose materialized shuffle files
    * are the executor-loss replay bound, exactly like any deep
    * multi-stage SQL plan.
    *
    * Skew note for power-law graphs: a windowed count has no map-side
    * combine, so a celebrity node's edges sort in one task; the degree
    * filter still only SHUFFLES the edge list (no blowup). If one node
    * holds a meaningful fraction of all edges at cluster scale, peel on
    * a degree-capped or salted projection first — the same discipline
    * every node-keyed operator here uses ([[pageRank]] caps, Dedup block
    * caps). The cached edge table is scoped to the returned handle
    * ([[kCoreScoped]]).
    */
  def kCoreScoped(edges: DataFrame, k: Int, rounds: Int): Dedup.Scoped = {
    require(k >= 1, "k must be positive")
    require(rounds >= 1 && rounds <= 100,
      "rounds must be in [1, 100] — beyond that, re-call on the survivors")
    val und = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    // the edge list seeds the peel AND the all-nodes report side —
    // persist it once instead of re-deriving the (possibly join-heavy)
    // upstream per consumer (the jaccardPairsScoped discipline)
    val sym = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .persist()
    val all = sym.select(col("a").as("node")).distinct()
    var state = sym.select("a", "b")
    val byA = org.apache.spark.sql.expressions.Window.partitionBy("a")
    val byB = org.apache.spark.sql.expressions.Window.partitionBy("b")
    for (_ <- 1 to rounds)
      state = state
        .withColumn("da", count(lit(1)).over(byA))
        .withColumn("db", count(lit(1)).over(byB))
        .where(col("da") >= k && col("db") >= k)
        .select("a", "b")
    // final state is still symmetric, so core degree is a plain count of
    // surviving rows per `a` — one aggregate, one state reference
    val coreDeg = state.groupBy("a").agg(count(lit(1)).as("core_deg"))
      .select(col("a").as("node"), col("core_deg"))
    val out = all.join(coreDeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("core_deg"), lit(0L)).as("core_deg"),
        col("core_deg").isNotNull.as("in_core"))
    Dedup.Scoped(out, () => { sym.unpersist(); () })
  }

  /** [[kCoreScoped]] without the handle — callers owning the session
    * lifecycle bound the edge-table pin with `clearCache()` (Verify /
    * Bench), long-lived sessions should prefer the Scoped form.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    kCoreScoped(edges, k, rounds).df
}

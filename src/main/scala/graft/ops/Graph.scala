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
}

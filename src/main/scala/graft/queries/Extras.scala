package graft.queries

import org.apache.spark.sql.functions._

import graft.etl.Stages
import graft.functions.MedianCombine
import graft.model.CustomCombine

/** Coverage extensions: rollup/grouping sets, statistical aggregates, exact
  * percentiles, the SQL entry point, and the custom-Aggregator combiner slot.
  */
object Extras {

  val defs: Map[String, QueryFn] = Map(
    // multi-level aggregation: ROLLUP (subtotals + grand total)
    "q_rollup_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * lit(100), 0).cast("long")).as("qty_c"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // multi-level aggregation: CUBE (every grouping-set combination)
    "q_cube_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * lit(100), 0).cast("long")).as("qty_c"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // link-quality centrality: weighted PageRank over the nation-level
    // trade graph (customer nation → supplier nation per lineitem), 3
    // fixed-point integer rounds — the crawl-curation quality signal
    // (domain-graph centrality) as pure joins+aggs; the per-round edge
    // exchange is identical so Catalyst reuses it across iterations
    // label propagation communities over the same nation trade graph:
    // 3 synchronous rounds, mode-of-neighbor-labels with smallest-label
    // ties — deterministic, integer-only, oracle-unrollable; the coarser
    // community signal next to components/kcore/pagerank/triangles
    "q_graph_label_prop" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val edges = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        // keep only heavier trade links so communities are non-trivial
        .groupBy(col("c_nationkey").as("a"), col("s_nationkey").as("b"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 3)
        .select("a", "b")
      val nodes = t(s, dir, "nation").select(col("n_nationkey").as("node"))
      graft.ops.Graph.labelPropagation(edges, nodes, 3).orderBy("node")
    }),

    "q_graph_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val edges = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      val nodes = t(s, dir, "nation").select(col("n_nationkey").as("node"))
      graft.ops.Graph.pageRank(edges, nodes, 3).orderBy("node")
    }),

    // triangle counting by degree orientation over the same nation trade
    // graph: per-node triangle participation (each triangle credited to
    // all three corners); the oriented wedge join + closing semi is the
    // O(m^1.5) shape — no Σdeg² hub blowup, no product
    "q_graph_triangles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val edges = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").cast("long").as("a"),
          col("s_nationkey").cast("long").as("b"))
      val tri = graft.ops.Graph.triangles(edges)
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_triangles"))
        .orderBy("node")
    }),

    // bounded k-core peel over the SPARSE customer–supplier graph (only
    // near-max-quantity lineitems keep an edge): the 4-core cascades for
    // every one of the 6 rounds at sf0.01 (233→157 survivors measured) —
    // the degeneracy screen behind link-farm detection
    "q_graph_kcore" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .where(col("l_quantity") >= 49)
        .select("l_orderkey", "l_suppkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val edges = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("a"),
          (col("l_suppkey") + lit(1000000L)).as("b"))
      graft.ops.Graph.kCore(edges, k = 4, rounds = 6).orderBy("node")
    }),

    // data-quality profiler: per-column n/null/distinct/min/max in ONE
    // melted aggregate (ingest's first look at an unknown table)
    "q_profile" -> ((s, dir) =>
      graft.ops.Profiler.profile(t(s, dir, "lineitem"), ProfileCols)
        .orderBy("col_name")),

    // statistical aggregates (sample stddev/variance, correlation).
    // Pearson r is computed algebraically — covar/(sd·sd) with a nullif
    // guard — NOT via corr(): under Spark 4's ANSI mode corr() THROWS
    // DIVIDE_BY_ZERO on a zero-variance group (probed), where DuckDB's
    // returns NULL; the explicit form yields NULL in both engines AND
    // shares the exact op order with the oracle (the built-in's different
    // association would diverge at rounding boundaries).
    "q_stats_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")) /
            nullif(stddev_samp(col("l_quantity")) *
              stddev_samp(col("l_extendedprice")), lit(0.0)), 6).as("corr_qe"))
        .orderBy("l_returnflag")),

    // exact interpolated percentiles
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"))
        .orderBy("l_returnflag")),

    // equi-depth histogram: exact quartile boundaries over INTEGER CENTS
    // (interpolation of longs is the same exact double arithmetic in both
    // engines — boundaries over raw doubles could differ in the last ulp
    // and flip a row at a bucket edge), then one bucketed count pass with
    // the 1-row boundary frame broadcast
    "q_histogram" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * 100, 0).cast("long")
      val li = t(s, dir, "lineitem").select(cents.as("c"))
      val b = li.agg(
        expr("percentile(c, array(0.25, 0.5, 0.75))").as("bs"))
      li.crossJoin(broadcast(b))
        .withColumn("bucket",
          when(col("c") <= col("bs")(0), 0)
            .when(col("c") <= col("bs")(1), 1)
            .when(col("c") <= col("bs")(2), 2)
            .otherwise(3))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("c").as("min_c"), max("c").as("max_c"))
        .orderBy("bucket")
    }),

    // SQL entry point: the same engine driven through spark.sql + temp view
    // GROUPING SETS: the third multi-dimensional agg flavor next to
    // rollup/cube — exactly the requested combinations (here (priority),
    // (status), ()), one Expand + one aggregate, never three passes.
    // grouping_id disambiguates the null-key rows
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderpriority, o_orderstatus,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(grouping(o_orderpriority) * 2
              |    + grouping(o_orderstatus) AS INT) AS gid
              |FROM orders_gs
              |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
              |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin)
    }),

    "q_sql_api" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
              |FROM orders_v
              |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              |GROUP BY o_orderpriority
              |HAVING count(*) > 10
              |ORDER BY o_orderpriority""".stripMargin)
    }),

    // approximate sketches: HLL distinct counts + quantile sketch. The raw
    // estimates are engine-specific (no other engine reproduces Spark's HLL
    // register math), so the gate row instead emits DETERMINISTIC
    // ASSERTIONS: exact counts both engines compute identically, plus
    // boolean error-bound checks that Spark evaluates against its sketches
    // and DuckDB states as literal TRUE. Hash-exact when the sketches hold
    // their documented bounds — so the gate actually tests the error bound,
    // not just row counts. Bounds: 3 sigma for HLL (rsd 0.05 → 15%,
    // rsd 0.01 → 3%); approx_percentile's rank-error guarantee is
    // 1/accuracy = 0.001, checked against exact quantiles ±0.02 rank.
    "q_approx_sketch" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("exact_parts"),
          count_distinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
            .as("pq"),
          expr("percentile(l_extendedprice, array(0.48, 0.52, 0.93, 0.97))")
            .as("pe"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")).cast("double") <=
            col("exact_parts") * lit(0.15)).as("parts_ok"),
          (abs(col("ao") - col("exact_orders")).cast("double") <=
            col("exact_orders") * lit(0.03)).as("orders_ok"),
          (element_at(col("pq"), 1) >= element_at(col("pe"), 1) &&
            element_at(col("pq"), 1) <= element_at(col("pe"), 2)).as("p50_ok"),
          (element_at(col("pq"), 2) >= element_at(col("pe"), 3) &&
            element_at(col("pq"), 2) <= element_at(col("pe"), 4)).as("p95_ok"))
        .orderBy("l_returnflag")),

    // skew-salted two-phase aggregation must equal the plain aggregate —
    // proven through the oracle, not just the unit spec: the salt spreads
    // each key over 8 reducers, the final fold collapses them
    "q_skew_salted_agg" -> ((s, dir) =>
      graft.etl.Skew.saltedAgg(
        t(s, dir, "lineitem").select("l_returnflag", "l_quantity"),
        keys = Seq("l_returnflag"), saltBuckets = 8,
        partialAggs = Seq(
          sum(round(col("l_quantity") * lit(100), 0).cast("long")).as("qty_c"),
          count(lit(1)).as("n")),
        finalAggs = Seq(sum(col("qty_c")).as("qty_c"), sum(col("n")).as("n")))
        .orderBy("l_returnflag")),

    // data-contract audit: 5 declarative expectations over lineitem in ONE
    // aggregate pass (one scan for N rules, not N jobs); the under-5pct
    // rule intentionally fails — the report records drift, callers decide
    // severity
    "q_expectations" -> ((s, dir) =>
      graft.ops.Expectations.check(t(s, dir, "lineitem"), Seq(
        "discount_bounded" ->
          (col("l_discount") >= 0 && col("l_discount") <= 0.1),
        "discount_under_5pct" -> (col("l_discount") <= 0.05),
        "price_positive" -> (col("l_extendedprice") > lit(0)),
        "quantity_in_range" -> col("l_quantity").between(1, 50),
        "shipdate_not_null" -> col("l_shipdate").isNotNull))
        .orderBy("rule")),

    // skew-salted large-large JOIN: the left side salts each row (content
    // hash, retry-safe), the right side replicates once per salt, so a
    // heavy-hitter join key spreads over 8 reducers instead of one
    // straggler task. The merge hint forces the sort-merge shape the salt
    // exists for (broadcast would dodge shuffle skew entirely and AQE
    // would hide it at this SF); the oracle proves salting changes nothing
    "q_join_salted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.etl.Skew.saltedJoin(li, ord.hint("merge"), "l_orderkey", 8)
        .groupBy("o_orderpriority")
        .agg(sum(round(col("l_quantity") * lit(100), 0).cast("long"))
          .as("qty_c"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // custom-Aggregator combiner slot: exact median per (user, type, window)
    "q_ts_combine_median" -> ((s, dir) => {
      Stages.combine(TimeSeries.bucketized(s, dir),
          CustomCombine(MedianCombine.median_combine))
        .select(col("stay_id").as("user_id"), col("feature_id").as("event_type"),
          col("tidx"), round(col("value"), 6).as("med_value"))
        .orderBy("user_id", "event_type", "tidx")
    }))

  /** Profiled lineitem columns: ints, doubles, strings, and a timestamp —
    * each type exercising the cast-through-string comparison semantics.
    */
  private val ProfileCols = Seq("l_orderkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus",
    "l_shipdate")

  val oracles: Map[String, String] = Map(
    "q_profile" -> graft.ops.Profiler.profileSql("lineitem", ProfileCols),

    // orientation replay: canonical undirected edges, (deg, id) rank
    // compare spelled as the OR-chain, wedge join ordered on the dst
    // rank, EXISTS as the closing semi, triangles exploded to corners
    "q_graph_triangles" ->
      """WITH e0 AS (
        |  SELECT DISTINCT c_nationkey AS a0, s_nationkey AS b0
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey),
        |und AS (SELECT DISTINCT least(a0, b0) AS a, greatest(a0, b0) AS b
        |  FROM e0 WHERE a0 <> b0),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
        |  FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
        |  GROUP BY n),
        |wd AS (SELECT und.a, und.b, x.d AS da, y.d AS db
        |  FROM und JOIN deg x ON x.n = und.a JOIN deg y ON y.n = und.b),
        |o AS (SELECT
        |    CASE WHEN (da < db) OR (da = db AND a < b) THEN a ELSE b END
        |      AS src,
        |    CASE WHEN (da < db) OR (da = db AND a < b) THEN b ELSE a END
        |      AS dst,
        |    CASE WHEN (da < db) OR (da = db AND a < b) THEN db ELSE da END
        |      AS dd
        |  FROM wd),
        |w AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        |  FROM o e1 JOIN o e2 ON e1.src = e2.src
        |    AND ((e1.dd < e2.dd) OR (e1.dd = e2.dd AND e1.dst < e2.dst))),
        |tri AS (SELECT w.x, w.y, w.z FROM w
        |  WHERE EXISTS (SELECT 1 FROM o
        |    WHERE o.src = w.y AND o.dst = w.z))
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM (SELECT unnest([x, y, z]) AS node FROM tri)
        |GROUP BY node ORDER BY node""".stripMargin,

    // peel replay: one CTE per round (a1..a6), each re-deriving alive
    // degrees from sym ⋈ alive ⋈ alive with HAVING >= k — the bounded
    // fixpoint is replayed round-for-round, then core degrees off a6
    "q_graph_kcore" -> {
      val peels = (1 to 6).map { i =>
        s"""a$i AS (SELECT s.a AS node FROM sym s
           |  JOIN a${i - 1} x ON s.a = x.node
           |  JOIN a${i - 1} y ON s.b = y.node
           |  GROUP BY s.a HAVING count(*) >= 4)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey AS a0, 1000000 + l_suppkey AS b0
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_quantity >= 49),
         |und AS (SELECT DISTINCT least(a0, b0) AS a, greatest(a0, b0) AS b
         |  FROM e0 WHERE a0 <> b0),
         |sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
         |a0 AS (SELECT DISTINCT a AS node FROM sym),
         |$peels,
         |cd AS (SELECT s.a AS node, CAST(count(*) AS BIGINT) AS core_deg
         |  FROM sym s JOIN a6 x ON s.a = x.node JOIN a6 y ON s.b = y.node
         |  GROUP BY s.a)
         |SELECT n.node, coalesce(cd.core_deg, CAST(0 AS BIGINT))
         |    AS core_deg,
         |  cd.core_deg IS NOT NULL AS in_core
         |FROM a0 n LEFT JOIN cd USING (node) ORDER BY node""".stripMargin
    },

    // LPA replay: 3 synchronous rounds unrolled — per round, the mode of
    // neighbor labels via count + row_number (cnt DESC, label ASC = the
    // engine's max(struct(cnt, -label)) tie pin), isolated nodes fall
    // back to their initial id
    "q_graph_label_prop" ->
      """WITH e0 AS (
        |  SELECT c_nationkey AS sa, s_nationkey AS sb,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |und AS (SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
        |  FROM e0 WHERE w >= 3 AND sa <> sb),
        |sym AS (SELECT a, b FROM und
        |  UNION ALL SELECT b AS a, a AS b FROM und),
        |n AS (SELECT n_nationkey AS node FROM nation),
        |l0 AS (SELECT node, CAST(node AS BIGINT) AS label FROM n),
        |f1 AS (SELECT s.a, l.label, count(*) AS cnt
        |  FROM sym s JOIN l0 l ON l.node = s.b GROUP BY s.a, l.label),
        |p1 AS (SELECT a, label, row_number() OVER (PARTITION BY a
        |  ORDER BY cnt DESC, label ASC) AS rn FROM f1),
        |l1 AS (SELECT n.node,
        |    coalesce(p.label, CAST(n.node AS BIGINT)) AS label
        |  FROM n LEFT JOIN (SELECT a, label FROM p1 WHERE rn = 1) p
        |    ON p.a = n.node),
        |f2 AS (SELECT s.a, l.label, count(*) AS cnt
        |  FROM sym s JOIN l1 l ON l.node = s.b GROUP BY s.a, l.label),
        |p2 AS (SELECT a, label, row_number() OVER (PARTITION BY a
        |  ORDER BY cnt DESC, label ASC) AS rn FROM f2),
        |l2 AS (SELECT n.node,
        |    coalesce(p.label, CAST(n.node AS BIGINT)) AS label
        |  FROM n LEFT JOIN (SELECT a, label FROM p2 WHERE rn = 1) p
        |    ON p.a = n.node),
        |f3 AS (SELECT s.a, l.label, count(*) AS cnt
        |  FROM sym s JOIN l2 l ON l.node = s.b GROUP BY s.a, l.label),
        |p3 AS (SELECT a, label, row_number() OVER (PARTITION BY a
        |  ORDER BY cnt DESC, label ASC) AS rn FROM f3),
        |l3 AS (SELECT n.node,
        |    coalesce(p.label, CAST(n.node AS BIGINT)) AS label
        |  FROM n LEFT JOIN (SELECT a, label FROM p3 WHERE rn = 1) p
        |    ON p.a = n.node)
        |SELECT node, label FROM l3 ORDER BY node""".stripMargin,

    // exact replay of the fixed-point rounds: every division is an integer
    // floor on non-negative operands, so the chained CTEs reproduce the
    // engine's ranks bit-for-bit
    "q_graph_pagerank" ->
      """WITH e AS (
        |  SELECT c_nationkey AS src, s_nationkey AS dst,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS wt FROM e GROUP BY src),
        |ew AS (SELECT e.src, e.dst, e.w, ow.wt FROM e JOIN ow USING (src)),
        |n AS (SELECT n_nationkey AS node FROM nation),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT ew.dst AS node,
        |    sum((r0.r * 85 * ew.w) // (100 * ew.wt)) AS c
        |  FROM ew JOIN r0 ON r0.node = ew.src GROUP BY ew.dst),
        |r1 AS (SELECT n.node, CAST(150000 + COALESCE(c1.c, 0) AS BIGINT) AS r
        |  FROM n LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT ew.dst AS node,
        |    sum((r1.r * 85 * ew.w) // (100 * ew.wt)) AS c
        |  FROM ew JOIN r1 ON r1.node = ew.src GROUP BY ew.dst),
        |r2 AS (SELECT n.node, CAST(150000 + COALESCE(c2.c, 0) AS BIGINT) AS r
        |  FROM n LEFT JOIN c2 USING (node)),
        |c3 AS (SELECT ew.dst AS node,
        |    sum((r2.r * 85 * ew.w) // (100 * ew.wt)) AS c
        |  FROM ew JOIN r2 ON r2.node = ew.src GROUP BY ew.dst),
        |r3 AS (SELECT n.node, CAST(150000 + COALESCE(c3.c, 0) AS BIGINT) AS r
        |  FROM n LEFT JOIN c3 USING (node))
        |SELECT node, r FROM r3 ORDER BY node""".stripMargin,

    "q_cube_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(grouping(o_orderpriority) * 2
        |    + grouping(o_orderstatus) AS INT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderpriority NULLS FIRST,
        |  o_orderstatus NULLS FIRST""".stripMargin,

    "q_rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag, round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_discount), 6) AS var_disc,
        |  round(covar_samp(l_quantity, l_extendedprice)
        |    / nullif(stddev_samp(l_quantity) * stddev_samp(l_extendedprice), 0),
        |    6) AS corr_qe
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_histogram" ->
      """WITH li AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem),
        |b AS (
        |  SELECT quantile_cont(c, 0.25) AS b0, quantile_cont(c, 0.5) AS b1,
        |    quantile_cont(c, 0.75) AS b2
        |  FROM li)
        |SELECT CASE WHEN c <= b0 THEN 0 WHEN c <= b1 THEN 1
        |            WHEN c <= b2 THEN 2 ELSE 3 END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(c) AS min_c, max(c) AS max_c
        |FROM li CROSS JOIN b
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_sql_api" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY o_orderpriority
        |HAVING count(*) > 10
        |ORDER BY o_orderpriority""".stripMargin,

    // the assertions are constructed so an INDEPENDENT engine states them
    // as literals: exact counts match by computation, the bound checks by
    // the sketches' documented guarantees (a sketch drifting outside its
    // bound flips a Spark-side boolean and fails the hash)
    "q_approx_sketch" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  TRUE AS parts_ok, TRUE AS orders_ok, TRUE AS p50_ok, TRUE AS p95_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_skew_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_expectations" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN NOT coalesce(l_discount >= 0 AND l_discount <= 0.1, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v0,
        |  CAST(sum(CASE WHEN NOT coalesce(l_discount <= 0.05, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |  CAST(sum(CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |  CAST(sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v4
        |  FROM lineitem)
        |SELECT rule, n_rows, n_violations, n_violations = 0 AS passed FROM (
        |  SELECT 'discount_bounded' AS rule, n_rows, v0 AS n_violations FROM a
        |  UNION ALL SELECT 'discount_under_5pct', n_rows, v1 FROM a
        |  UNION ALL SELECT 'price_positive', n_rows, v2 FROM a
        |  UNION ALL SELECT 'quantity_in_range', n_rows, v3 FROM a
        |  UNION ALL SELECT 'shipdate_not_null', n_rows, v4 FROM a)
        |ORDER BY rule""".stripMargin,

    "q_join_salted" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_ts_combine_median" -> (TimeSeries.idxSql +
      """SELECT user_id, event_type, tidx, round(median(value), 6) AS med_value
        |FROM b WHERE tidx <= tw
        |GROUP BY user_id, event_type, tidx
        |ORDER BY user_id, event_type, tidx""".stripMargin))
}

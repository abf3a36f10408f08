package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.1-§2.6, §2.8) exercised over
  * the driver's TPC-H-ish tables, each paired with a DuckDB oracle.
  *
  * Float-determinism policy: Spark and DuckDB re-associate large double sums
  * differently, so any aggregate over many rows of money-like doubles is
  * computed in EXACT integer cents (`round(x*100)` → BIGINT sum) which is
  * order-independent and hash-identical across engines. Derived averages are
  * integer-cent divisions — identical IEEE ops on identical inputs. Small
  * per-row arithmetic stays plain double (deterministic: same inputs, same
  * single expression).
  */
object Relational {

  /** Exact integer cents of a money-ish double: `round(x*100) → long`.
    * Positive/negative safe: Spark HALF_UP and DuckDB's round are both
    * half-away-from-zero on the same product double.
    */
  private def cents(c: Column): Column = round(c * lit(100), 0).cast("long")

  val defs: Map[String, QueryFn] = Map(
    // S1+P3+A3/A4 analog: scan → filter → multi-key hash agg (TPC-H Q1 shape)
    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c"),
          count(lit(1)).as("n"))
        .withColumn("avg_qty", col("sum_qty_c").cast("double") / (col("n") * lit(100.0)))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P1-P5: projection + pushed-down filter + per-row arithmetic
    "q_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_quantity") > lit(45) &&
          col("l_shipdate") >= to_timestamp(lit("1997-01-01")))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1: broadcast hash join fact ⋈ small dim
    "q_join_broadcast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    // chained broadcast joins over the dimension snowflake
    "q_join_multiway" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("total_c"))
        .orderBy("r_name", "n_name")
    }),

    // J2/P6: left-semi membership (EXISTS)
    "q_join_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val bld = t(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      o.join(broadcast(bld), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_c"))
        .orderBy("o_orderpriority")
    }),

    // bloom-prefiltered semi-join — the 100 TB form of the runtime
    // filter: when the key set is too big to ship as an in-list, ship
    // fixed-size bloom BITS into the fact scan (Spark's own codegen'd
    // BloomFilterMightContain) and let the exact semi-join clean up the
    // false positives — scan volume drops, the RESULT is exactly the
    // plain semi-join's (the oracle states the bloom-free query)
    "q_join_bloom_prefilter" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bits = graft.ops.Bloom.buildFilter(urgent, col("o_orderkey"),
        expectedItems = 50000L, fpp = 0.01)
      t(s, dir, "lineitem")
        .where(graft.ops.Bloom.mightContain(bits, col("l_orderkey")))
        .join(urgent, col("l_orderkey") === col("o_orderkey"),
          "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_quantity"))).as("qty_c"))
        .orderBy("l_returnflag")
    }),

    // J3/P7: left-anti membership (NOT EXISTS)
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(cents(col("c_acctbal"))).as("bal_c"))
        .orderBy("c_mktsegment")
    }),

    // J-family completion: FULL OUTER join — both null sides exercised by
    // restricting the customer side to even keys (odd-key customers'
    // orders surface as order_only). Shuffle hash join on the key; the
    // outer sides can't broadcast, which is exactly the plan a 100 TB
    // fact-vs-fact reconciliation wants.
    "q_join_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .where(pmod(col("c_custkey"), lit(2)) === 0)
        .select(col("c_custkey"))
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          when(col("c_custkey").isNull, lit("order_only"))
            .when(col("o_custkey").isNull, lit("cust_only"))
            .otherwise(lit("both")).as("side"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .groupBy("side")
        .agg(count(lit(1)).as("n_keys"), sum("n_orders").as("total_orders"))
        .orderBy("side")
    }),

    // A11: distinct
    "q_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")),

    // set op: union-all + re-agg
    "q_set_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").as("nk"), lit("c").as("src"))
      val su = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nk"), lit("s").as("src"))
      c.unionByName(su).groupBy("nk")
        .agg(count(lit(1)).as("n"), countDistinct(col("src")).as("n_src"))
        .orderBy("nk")
    }),

    // set op: EXCEPT (distinct semantics)
    "q_set_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.except(su).orderBy("nk")
    }),

    // set op: INTERSECT (distinct semantics)
    "q_set_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.intersect(su).orderBy("nk")
    }),

    // top-k with total tie-break (deterministic LIMIT analog).
    // orderBy().limit(k) plans as TakeOrderedAndProject — per-partition
    // top-k with a driver merge of k×partitions rows — NOT a global
    // row_number window, which would move the whole table to one partition
    // (the round-1 scale hazard). The rank is then recomputed over the k
    // surviving rows by a tiny ordering self-join, keeping the plan free of
    // single-partition WindowExec.
    "q_topk" -> ((s, dir) => {
      val top = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
      top.as("a").join(top.as("b"),
          col("b.o_totalprice") > col("a.o_totalprice") ||
            (col("b.o_totalprice") === col("a.o_totalprice") &&
              col("b.o_orderkey") < col("a.o_orderkey")), "left")
        .groupBy(col("a.o_orderkey").as("o_orderkey"),
          col("a.o_custkey").as("o_custkey"),
          col("a.o_totalprice").as("o_totalprice"))
        .agg((count(col("b.o_orderkey")) + 1).cast("int").as("rk"))
        .select("rk", "o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("rk")
    }),

    // grouped top-k: the k best rows PER GROUP via the bounded k-heap
    // Aggregator (map-side combined, k-bounded shuffle buffers) — the
    // per-group analog of q_topk's TakeOrderedAndProject discipline. A
    // row_number window (q_window_rank's shape) sorts every group's FULL
    // row set on one task; fine for many small groups, a killer when one
    // group holds a large share of a 100 TB table. Exact integer cents
    // make the heap order engine-portable.
    "q_topk_group" -> ((s, dir) => {
      val top = graft.functions.TopKAgg.smallest_k_long(3)
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          cents(col("o_totalprice")).as("cents"))
        .groupBy("o_orderpriority")
        .agg(top(negate(col("cents")), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("int").as("rk"),
          col("e.id").as("o_orderkey"),
          (negate(col("e.key")) / 100.0).as("o_totalprice"))
        .orderBy("o_orderpriority", "rk")
    }),

    // W: ranking window per partition
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // W: running aggregate (explicit ROWS frame). (l_orderkey, l_linenumber)
    // is NOT unique in this data — the qty-cents tiebreak makes the running
    // sequence deterministic (equal-key rows are interchangeable).
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), cents(col("l_quantity")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          sum(cents(col("l_quantity"))).over(w).as("run_qty_c"))
        .orderBy("l_orderkey", "l_linenumber", "run_qty_c")
    }),

    // F: CASE bucketing + conditional agg
    "q_case_bucket" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumn("bucket",
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(cents(col("c_acctbal"))).as("bal_c"))
        .orderBy("bucket")
    }),

    // F1/F2: datetime extraction
    "q_scalar_datetime" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
        .groupBy("yr")
        .agg(count(lit(1)).as("n"), countDistinct(col("mo")).as("n_months"))
        .orderBy("yr")
    }),

    // F9: string functions + conditional sum
    "q_scalar_string" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(when(col("p_type").contains("ECONOMY"), 1).otherwise(0)).as("n_economy"),
          max(length(col("p_name"))).as("max_name_len"),
          countDistinct(upper(substring(col("p_type"), 1, 3))).as("n_pfx"))
        .orderBy("p_brand")
    }),

    // A7 analog: pivot long→wide (fixed value set, so one global pivot works)
    "q_pivot_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(cents(col("l_quantity"))))
        .orderBy("l_returnflag")
    }),

    // P6: isin membership filter
    "q_isin_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(cents(col("l_discount"))).as("disc_c"))
        .orderBy("l_returnflag")
    }))

  private val centsSql = (x: String) => s"CAST(round(($x)*100) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
         |  CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_c,
         |  CAST(sum(${centsSql("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS sum_disc_c,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${centsSql("l_quantity")}) AS DOUBLE) / (count(*)*100.0) AS avg_qty
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice*(1-l_discount)*(1+l_tax) AS net_price
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT p_brand,
         |  CAST(sum(${centsSql("l_extendedprice*(1-l_discount)")}) AS BIGINT) AS revenue_c,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_multiway" ->
      s"""SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_c
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_join_semi" ->
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_c
         |FROM orders
         |WHERE EXISTS (SELECT 1 FROM customer
         |  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_anti" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${centsSql("c_acctbal")}) AS BIGINT) AS bal_c
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // bloom prefilter: the oracle is the BLOOM-FREE semi-join — the
    // filter must never change the result, only the scan volume
    "q_join_bloom_prefilter" ->
      s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS qty_c
         |FROM lineitem
         |WHERE EXISTS (SELECT 1 FROM orders
         |  WHERE o_orderkey = l_orderkey
         |    AND o_orderpriority = '1-URGENT')
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_outer" ->
      """WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0),
        |o AS (SELECT o_custkey, count(*) AS n_orders
        |      FROM orders GROUP BY o_custkey),
        |j AS (SELECT
        |    CASE WHEN c.c_custkey IS NULL THEN 'order_only'
        |         WHEN o.o_custkey IS NULL THEN 'cust_only'
        |         ELSE 'both' END AS side,
        |    coalesce(o.n_orders, 0) AS n_orders
        |  FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey)
        |SELECT side, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n_orders) AS BIGINT) AS total_orders
        |FROM j GROUP BY side ORDER BY side""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_set_union" ->
      """SELECT nk, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT src) AS BIGINT) AS n_src
        |FROM (SELECT c_nationkey AS nk, 'c' AS src FROM customer
        |      UNION ALL
        |      SELECT s_nationkey AS nk, 's' AS src FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "q_set_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_topk" ->
      """SELECT rk, o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        |  FROM orders)
        |WHERE rk <= 10 ORDER BY rk""".stripMargin,

    "q_topk_group" ->
      s"""SELECT o_orderpriority, rk, o_orderkey, cents / 100.0 AS o_totalprice
         |FROM (
         |  SELECT o_orderpriority, o_orderkey, ${centsSql("o_totalprice")} AS cents,
         |    CAST(row_number() OVER (PARTITION BY o_orderpriority
         |      ORDER BY ${centsSql("o_totalprice")} DESC, o_orderkey) AS INT) AS rk
         |  FROM orders)
         |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(sum(${centsSql("l_quantity")}) OVER (PARTITION BY l_orderkey
         |    ORDER BY l_linenumber, ${centsSql("l_quantity")}
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_qty_c
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, run_qty_c""".stripMargin,

    "q_case_bucket" ->
      s"""SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
         |  WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${centsSql("c_acctbal")}) AS BIGINT) AS bal_c
         |FROM customer GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_scalar_datetime" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT month(o_orderdate)) AS BIGINT) AS n_months
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,

    "q_scalar_string" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN p_type LIKE '%ECONOMY%' THEN 1 ELSE 0 END) AS BIGINT) AS n_economy,
        |  CAST(max(length(p_name)) AS INT) AS max_name_len,
        |  CAST(count(DISTINCT upper(substr(p_type, 1, 3))) AS BIGINT) AS n_pfx
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_pivot_agg" ->
      s"""SELECT l_returnflag,
         |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN ${centsSql("l_quantity")} END) AS BIGINT) AS F,
         |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN ${centsSql("l_quantity")} END) AS BIGINT) AS O
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_isin_filter" ->
      s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(${centsSql("l_discount")}) AS BIGINT) AS disc_c
         |FROM lineitem WHERE l_returnflag IN ('A','R')
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}

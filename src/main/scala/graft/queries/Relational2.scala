package graft.queries

import graft.operators.SkewOps
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second wave of relational plan shapes: outer joins, correlated
  * subqueries, HAVING, conditional + distinct aggregation.
  */
object Relational2 {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(28, 6))).cast("double")

  /** q16 — FULL OUTER join with null-side aggregation: per-nation
    * supplier/customer presence (nations can lack either side).
    */
  def q16OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    s.join(c, Seq("nationkey"), "full_outer")
      .select(
        col("nationkey").cast("int").as("nationkey"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers")
      )
  }

  val q16OuterJoinSql: String =
    """WITH s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      |           FROM supplier GROUP BY 1),
      |     c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      |           FROM customer GROUP BY 1)
      |SELECT CAST(COALESCE(s.nationkey, c.nationkey) AS INT) AS nationkey,
      |  COALESCE(n_suppliers, 0) AS n_suppliers,
      |  COALESCE(n_customers, 0) AS n_customers
      |FROM s FULL OUTER JOIN c ON s.nationkey = c.nationkey""".stripMargin

  /** q17 — TPC-H Q17 shape: correlated scalar aggregate (per-part
    * average quantity) filtering the fact table. Catalyst rewrites the
    * correlation into an aggregate + join; the decimal discipline keeps
    * the avg threshold bit-identical.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val avgQty = li
      .groupBy(col("l_partkey").as("p_key"))
      .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    li.join(avgQty, li("l_partkey") === avgQty("p_key"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(
        dsum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_small")
      )
  }

  val q17SmallQtySql: String =
    """WITH avgq AS (
      |  SELECT l_partkey AS p_key,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
      |      / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
      |  COUNT(*) AS n_small
      |FROM lineitem JOIN avgq ON l_partkey = p_key
      |WHERE l_quantity < 0.5 * avg_qty""".stripMargin

  /** q18 — GROUP BY computed key + HAVING + conditional aggregation:
    * order-year stats for years with enough volume, with a
    * filtered-count (high-value orders) per group.
    */
  def q18Having(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L))
          .as("n_big"),
        countDistinct(col("o_custkey")).as("n_customers")
      )
      .filter(col("n_orders") >= 100)
      .orderBy(col("order_year"))

  val q18HavingSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |  COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders
      |GROUP BY 1 HAVING COUNT(*) >= 100
      |ORDER BY order_year""".stripMargin

  /** q19 — EXISTS-correlated anti pattern + scalar subquery in SELECT:
    * parts never ordered below retail price, with the global average
    * retail price alongside (scalar subquery).
    */
  def q19Subqueries(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val discounted = li
      .join(p, li("l_partkey") === p("p_partkey"))
      .filter(col("l_extendedprice") / col("l_quantity") <
        col("p_retailprice"))
      .select(col("p_partkey").as("bad_key"))
      .distinct()
    val globalAvg = p
      .agg((dsum(col("p_retailprice")) / count(lit(1))).as("avg_retail"))
    p.join(discounted, p("p_partkey") === discounted("bad_key"),
        "left_anti")
      .crossJoin(globalAvg)
      .select(col("p_partkey"), col("p_retailprice"), col("avg_retail"))
  }

  val q19SubqueriesSql: String =
    """SELECT p_partkey, p_retailprice,
      |  (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(28,6))) AS DOUBLE)
      |     / COUNT(*) FROM part) AS avg_retail
      |FROM part
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey
      |    AND l_extendedprice / l_quantity < p_retailprice)""".stripMargin

  /** q64 — salted equi-join: the hot-key mitigation (skewed side salted
    * in [0,8), compact dimension exploded 8×) must produce EXACTLY the
    * plain join's result — which is what the oracle checks. At local SF
    * the join isn't skewed; the point is the REWRITE's correctness, so
    * the same operator is safe to reach for when a 100 TB key
    * distribution is (q64 pairs with SkewOps.keySkewProfile, the
    * diagnostic that decides).
    */
  def q64SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    SkewOps.saltedJoin(events, dim, "user_id", saltFactor = 8)
      .groupBy("segment")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double")
          .as("total_value")
      )
      .orderBy("segment")
  }

  val q64SaltedJoinSql: String =
    """SELECT c_mktsegment AS segment, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q67 — exact per-group percentiles by rank selection: the value at
    * rank `ceil(p·n)` of each group's sorted multiset (discrete/type-1
    * quantile). Engine-neutral by construction — selecting a member of
    * the multiset needs no interpolation arithmetic, so the hash compare
    * is safe where `percentile_cont` families differ in float rounding.
    * Shape at scale: one partial-agg'd shuffle builds a per-group value
    * histogram; the rank pick runs over the histogram (bounded by the
    * value vocabulary), never over raw rows.
    */
  def q67Percentiles(spark: SparkSession, dir: String): DataFrame = {
    // Exact percentiles via a VALUE HISTOGRAM, not a per-row window:
    // aggregate counts per (flag, value) first — one partial-agg'd
    // shuffle of ≤ |flags|·|distinct values| rows — then pick the order
    // statistic rank k = ceil(n·q) from the cumulative counts
    // (`cum−c < k ≤ cum` selects exactly the value the naive
    // row_number()=k pick would, since equal values are contiguous).
    // The previous row_number() form funneled the whole table through
    // |flags| single-threaded window tasks — 3 tasks sorting 200k rows
    // each at sf0.1, and a straight scale-killer at 100 TB.
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val wAll = Window.partitionBy("l_returnflag")
    def pick(q: Double): org.apache.spark.sql.Column = {
      val k = ceil(col("n") * q)
      max(when(col("cum") - col("c") < k && k <= col("cum"),
        col("l_quantity")))
    }
    counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy("l_returnflag")
      .agg(
        pick(0.5).as("median_qty"),
        pick(0.95).as("p95_qty"),
        pick(0.99).as("p99_qty"),
        sum(col("c")).as("n_rows"))
      .orderBy("l_returnflag")
  }

  val q67PercentilesSql: String =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_quantity,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_quantity) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN l_quantity END)
      |    AS median_qty,
      |  MAX(CASE WHEN rn = CEIL(n * 0.95) THEN l_quantity END)
      |    AS p95_qty,
      |  MAX(CASE WHEN rn = CEIL(n * 0.99) THEN l_quantity END)
      |    AS p99_qty,
      |  COUNT(*) AS n_rows
      |FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q75 — TPC-H Q5 shape: six-table join (region→nation→customer→
    * orders→lineitem→supplier with the customer-and-supplier-same-
    * nation condition), selective region/date filters, revenue
    * aggregate. The canonical join-order/broadcast-planning workout:
    * region and nation broadcast, the orders date filter pushes to the
    * scan, and only the orders⋈lineitem⋈customer backbone shuffles.
    */
  def q75RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir)
      .filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
    val lineitem = Tables.lineitem(spark, dir)
    val supplier = Tables.supplier(spark, dir)
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(28, 6))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val q75RegionRevenueSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q76 — per-user outlier flags from decimal-exact moments: mean and
    * variance are DERIVED from exact decimal sums (Σv, Σv², n) so the
    * float arithmetic that follows is a fixed per-row scalar sequence —
    * identical on any engine and any partial-agg order, making a
    * statistical operator hash-comparable. Flags events beyond 3σ and
    * reports per-user counts. One groupBy shuffle + one broadcast-able
    * join back.
    */
  def q76UserOutliers(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        // DECIMAL(18,6), not (28,6): the square must stay exact, and
        // 18+18+1 = 37 ≤ 38 keeps Spark's product type at scale 12
        // (a (28,6) square would round to DecimalType(38,6) while the
        // oracle keeps 12 decimals). Contract: |value| < 10^12 — beyond
        // that BOTH engines fail the cast loudly (Spark ANSI and DuckDB
        // alike), they just never silently diverge
        col("value").cast(DecimalType(18, 6)).as("v"))
    val stats = events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .filter(col("n") >= 2)
      .select(col("user_id"), col("n"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        // sample variance from exact sums: (s2 - s1²/n) / (n-1)
        ((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n").cast("double")) /
          (col("n").cast("double") - 1.0)).as("variance"))
    events
      .join(stats, "user_id")
      .filter(col("variance") > 0.0)
      .groupBy(col("user_id"), col("n"))
      .agg(
        sum(when(
          abs(col("v").cast("double") - col("mean")) >
            lit(3.0) * sqrt(col("variance")), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("user_id"), col("n").as("n_events"), col("n_outliers"))
      .orderBy("user_id")
  }

  val q76UserOutliersSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(value AS DECIMAL(18,6)) AS v
      |  FROM events),
      |stats AS (
      |  SELECT user_id, COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2
      |  FROM e GROUP BY user_id HAVING COUNT(*) >= 2),
      |m AS (
      |  SELECT user_id, n,
      |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS variance
      |  FROM stats)
      |SELECT e.user_id, m.n AS n_events,
      |  CAST(SUM(CASE WHEN ABS(CAST(e.v AS DOUBLE) - m.mean)
      |    > 3.0 * SQRT(m.variance) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM e JOIN m ON e.user_id = m.user_id
      |WHERE m.variance > 0.0
      |GROUP BY e.user_id, m.n ORDER BY e.user_id""".stripMargin

  /** q77 — table profile (the Deequ shape): per-column row/null/exact-
    * distinct counts over lineitem in ONE aggregation pass (multiple
    * count-distincts plan as a single Expand + aggregate — one shuffle
    * of rows×cols).
    */
  private val profileCols = Seq("l_orderkey", "l_partkey", "l_quantity",
    "l_returnflag", "l_shipdate")

  def q77Profile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling
      .profile(Tables.lineitem(spark, dir), profileCols)
      .orderBy("col_name")

  val q77ProfileSql: String = profileCols.sorted.map { c =>
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
       |  COUNT(*) - COUNT($c) AS n_nulls,
       |  COUNT(DISTINCT $c) AS n_distinct FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** q82 — Z-order layout audit: orders mapped onto a (custkey, order
    * day) Morton grid, grouped by 256-cell z-tile, reporting each
    * tile's row count and min/max range on BOTH dimensions — the
    * pruning index a lakehouse keeps per file after a Z-ORDER/liquid
    * clustering pass ([[graft.operators.Layout]]). Tight tile ranges
    * on both columns are the property that lets a scan filtering on
    * EITHER of them skip files. Static unrolled bit-interleave
    * (codegen'd) + one partial-agg'd hash aggregate: one shuffle of
    * ≤ |tiles| rows.
    */
  def q82Zorder(spark: SparkSession, dir: String): DataFrame = {
    val x = col("o_custkey") % 4096
    val y = (datediff(to_date(col("o_orderdate")),
      to_date(lit("1995-01-01"))) % 4096).cast("long")
    Tables.orders(spark, dir)
      .select(graft.operators.Layout.zValue(x, y, 12).as("zval"),
        x.as("xk"), y.as("yk"))
      .groupBy(shiftright(col("zval"), 8).as("ztile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("xk")).as("min_cust"), max(col("xk")).as("max_cust"),
        min(col("yk")).as("min_day"), max(col("yk")).as("max_day"))
  }

  /** q85 — Bloom-prefiltered selective join: urgent orders of every
    * 25th customer (<1% of orders) joined to their lineitems, with the
    * fact side pre-filtered through a broadcast Bloom filter on the dim
    * keys BEFORE the shuffle ([[SkewOps.bloomPrefilter]]) — the
    * runtime-filter pattern that ships ~1% of a 100 TB fact table to
    * the join instead of all of it. False positives die in the real
    * join, so the result (and the oracle) is exactly the plain join's.
    */
  def q85BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_custkey") % 25 === 0)
      .select("o_orderkey", "o_custkey")
    val fact = graft.operators.SkewOps.bloomPrefilter(
      Tables.lineitem(spark, dir), "l_orderkey", dim, "o_orderkey",
      expectedItems = 100000L, fpp = 0.01)
    fact
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
  }

  val q85BloomJoinSql: String =
    """SELECT o.o_custkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT' AND o.o_custkey % 25 = 0
      |GROUP BY o.o_custkey""".stripMargin

  val q82ZorderSql: String = {
    val z = graft.operators.Layout.zValueSql("xk", "yk", 12)
    s"""WITH d AS (
       |  SELECT o_custkey % 4096 AS xk,
       |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
       |      % 4096 AS yk
       |  FROM orders),
       |z AS (SELECT xk, yk, $z AS zval FROM d)
       |SELECT zval >> 8 AS ztile, COUNT(*) AS n_orders,
       |  MIN(xk) AS min_cust, MAX(xk) AS max_cust,
       |  MIN(yk) AS min_day, MAX(yk) AS max_day
       |FROM z GROUP BY 1""".stripMargin
  }

  /** q97 — blocked fuzzy entity matching: near-identical part names
    * (edit distance ≤ 3) paired within a last-token blocking key, over
    * the canonicalized distinct-name vocabulary — the record-linkage
    * blocking discipline ([[graft.operators.FuzzyJoin]]): the quadratic
    * stage is |block|² over VOCABULARY entries, never corpus rows.
    */
  def q97FuzzyNames(spark: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin.blockedNamePairs(
      Tables.part(spark, dir),
      "p_name",
      name => regexp_extract(name, "(\\S+)$", 1),
      maxDist = 3)

  val q97FuzzyNamesSql: String =
    """WITH names AS (
      |  SELECT p_name AS name, COUNT(*) AS n_rows FROM part GROUP BY 1),
      |a AS (SELECT name AS name_a, n_rows AS n_a,
      |        regexp_extract(name, '(\S+)$', 1) AS blk FROM names),
      |b AS (SELECT name AS name_b, n_rows AS n_b,
      |        regexp_extract(name, '(\S+)$', 1) AS blk FROM names)
      |SELECT name_a, name_b,
      |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist, n_a, n_b
      |FROM a JOIN b USING (blk)
      |WHERE name_a < name_b AND levenshtein(name_a, name_b) <= 3""".stripMargin

  /** q145 — referential-integrity gate over the lake: orphan counts
    * for four foreign-key relationships in ONE pass each (left-anti
    * join against the dimension; dims broadcast where small, the fact
    * side never collects). Every 97th order's first lineitem is
    * re-keyed to a bogus order id so the violated-constraint path is
    * actually exercised (n_orphans > 0, ok = false); the other three
    * constraints hold. The Deequ-style cross-TABLE complement of the
    * single-table q88 gate.
    */
  def q145Integrity(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .withColumn("l_orderkey",
        when(col("l_linenumber") === 1 && col("l_orderkey") % 97 === 0,
          col("l_orderkey") + 900000000L)
          .otherwise(col("l_orderkey")))
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val p = Tables.part(spark, dir)
    def check(name: String, fact: DataFrame, factKey: String,
        dim: DataFrame, dimKey: String): DataFrame = {
      val orphans = fact
        .join(dim, fact(factKey) === dim(dimKey), "left_anti")
      fact.agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("check_name"), col("n_rows"),
          col("n_orphans"), (col("n_orphans") === 0L).as("ok"))
    }
    check("customer_nation", c, "c_nationkey", n, "n_nationkey")
      .unionByName(check("lineitem_orders", l, "l_orderkey", o, "o_orderkey"))
      .unionByName(check("lineitem_part", l, "l_partkey", p, "p_partkey"))
      .unionByName(check("orders_customer", o, "o_custkey", c, "c_custkey"))
      .orderBy("check_name")
  }

  val q145IntegritySql: String =
    """WITH lbad AS (
      |  SELECT CASE WHEN l_linenumber = 1 AND l_orderkey % 97 = 0
      |              THEN l_orderkey + 900000000 ELSE l_orderkey END
      |           AS l_orderkey,
      |         l_partkey
      |  FROM lineitem),
      |checks AS (
      |  SELECT 'customer_nation' AS check_name,
      |    (SELECT COUNT(*) FROM customer) AS n_rows,
      |    (SELECT COUNT(*) FROM customer
      |     WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
      |      AS n_orphans
      |  UNION ALL
      |  SELECT 'lineitem_orders',
      |    (SELECT COUNT(*) FROM lbad),
      |    (SELECT COUNT(*) FROM lbad
      |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |  UNION ALL
      |  SELECT 'lineitem_part',
      |    (SELECT COUNT(*) FROM lbad),
      |    (SELECT COUNT(*) FROM lbad
      |     WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
      |  UNION ALL
      |  SELECT 'orders_customer',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders
      |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)))
      |SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_orphans AS BIGINT) AS n_orphans, n_orphans = 0 AS ok
      |FROM checks ORDER BY check_name""".stripMargin

  /** q154 — entity resolution end-to-end: the q97 blocked fuzzy pairs
    * (last-token block, levenshtein ≤ 3 on the distinct-name
    * vocabulary) closed into clusters by distributed
    * connected-components ([[graft.operators.GraphOps]]), each cluster
    * summarized with its golden record — the canonical name by
    * (row count desc, name desc). Names enter CC as md5-60 ids (the
    * engine-neutral hash family), so cluster labels = min reachable id
    * reproduce in SQL; the oracle closes the same pair list with a
    * recursive CTE. The standard record-linkage pipeline: block →
    * score → cluster → survivorship, all vocabulary-bounded.
    */
  def q154EntityClusters(spark: SparkSession, dir: String): DataFrame = {
    def nid(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val pairs = graft.operators.FuzzyJoin.blockedNamePairs(
      Tables.part(spark, dir), "p_name",
      name => regexp_extract(name, "(\\S+)$", 1), maxDist = 3)
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("id", nid(col("name")))
    val comps = graft.operators.GraphOps.connectedComponents(
      spark,
      pairs.select(nid(col("name_a")).as("id_a"),
        nid(col("name_b")).as("id_b")),
      "id_a", "id_b", nodes = Some(names.select(col("id"))))
    comps.join(names, "id")
      .groupBy(col("comp").as("cluster"))
      .agg(count(lit(1)).as("n_names"),
        sum("n_rows").as("total_rows"),
        max(struct(col("n_rows"), col("name"))).getField("name")
          .as("canonical"))
      .orderBy("cluster")
  }

  val q154EntityClustersSql: String =
    """WITH RECURSIVE names AS (
      |  SELECT p_name AS name, COUNT(*) AS n_rows FROM part GROUP BY 1),
      |ids AS (
      |  SELECT name, n_rows,
      |    ('0x' || substr(md5(name), 1, 15))::BIGINT AS id
      |  FROM names),
      |blk AS (
      |  SELECT name, regexp_extract(name, '(\S+)$', 1) AS b FROM names),
      |pr AS (
      |  SELECT ia.id AS id_a, ib.id AS id_b
      |  FROM blk a JOIN blk b ON a.b = b.b AND a.name < b.name
      |  JOIN ids ia ON ia.name = a.name
      |  JOIN ids ib ON ib.name = b.name
      |  WHERE levenshtein(a.name, b.name) <= 3),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pr
      |  UNION
      |  SELECT id_b AS src, id_a AS dst FROM pr),
      |reach AS (
      |  SELECT id, id AS comp FROM ids
      |  UNION
      |  SELECT e.dst AS id, r.comp
      |  FROM reach r JOIN edges e ON e.src = r.id
      |  WHERE r.comp < e.dst),
      |comps AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
      |joined AS (
      |  SELECT c.comp AS cluster, i.name, i.n_rows
      |  FROM comps c JOIN ids i USING (id)),
      |ranked AS (
      |  SELECT cluster, name, n_rows, ROW_NUMBER() OVER (
      |    PARTITION BY cluster ORDER BY n_rows DESC, name DESC) AS rn
      |  FROM joined)
      |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_names,
      |  CAST(SUM(n_rows) AS BIGINT) AS total_rows,
      |  MAX(CASE WHEN rn = 1 THEN name END) AS canonical
      |FROM ranked GROUP BY cluster ORDER BY cluster""".stripMargin

  /** q155 — robust outlier detection (median/MAD, the
    * moment-free complement of q76's z-scores): per event type, the
    * exact median, the median absolute deviation, and the count of
    * values beyond 3·1.4826·MAD (the normal-consistent robust
    * z-threshold). Medians use the q67 VALUE-HISTOGRAM discipline —
    * aggregate counts per (type, value), pick the order statistic
    * from cumulative counts — so nothing windows over raw rows and
    * the shuffle is ≤ |types|·|distinct values| at any scale; the
    * per-type medians/MADs broadcast back. Lower-rank convention (no
    * interpolation) keeps every quantity an exact input value, so the
    * oracle reproduces it bit-for-bit.
    */
  def q155RobustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    def medianOf(df: DataFrame, valCol: String, outCol: String): DataFrame = {
      val counts = df.groupBy(col("event_type"), col(valCol).as("v"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("event_type").orderBy("v")
      val wAll = Window.partitionBy("event_type")
      val k = ceil(col("n") * 0.5)
      counts
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
        .groupBy("event_type")
        .agg(max(when(col("cum") - col("c") < k && k <= col("cum"),
          col("v"))).as(outCol))
    }
    val med = medianOf(e, "value", "median_value")
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("median_value")))
    val mad = medianOf(dev.select(col("event_type"), col("dev")),
      "dev", "mad")
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        max(col("median_value")).as("median_value"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  val q155RobustOutliersSql: String =
    """WITH e AS (
      |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
      |r1 AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |med AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS med
      |  FROM r1 GROUP BY event_type),
      |d AS (
      |  SELECT e.event_type, e.value, m.med,
      |    abs(e.value - m.med) AS dev
      |  FROM e JOIN med m USING (event_type)),
      |r2 AS (
      |  SELECT event_type, dev,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM d),
      |mad AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CEIL(n * 0.5) THEN dev END) AS mad
      |  FROM r2 GROUP BY event_type)
      |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MAX(d.med) AS median_value, MAX(mm.mad) AS mad,
      |  CAST(SUM(CASE WHEN d.dev > 3.0 * 1.4826 * mm.mad
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN mad mm USING (event_type)
      |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  /** q158 — grouped trend regression: per event type, the exact OLS
    * slope/intercept of value against time. The sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) aggregate as DECIMALs — exact integer-
    * scaled arithmetic, so partial-aggregation order can't perturb
    * them — over x = seconds since 2024-01-01 (bounding Σx² so
    * n·Σx² fits DECIMAL(38)); only the final closed-form division
    * runs in doubles, as the identical IEEE expression on both
    * engines. The moment discipline of q76 applied to regression:
    * grouped model fitting as ONE map-side-combinable aggregate —
    * no per-key iteration, no driver state, any number of groups.
    */
  def q158GroupedTrend(spark: SparkSession, dir: String): DataFrame = {
    val epoch0 = 1704067200L // 2024-01-01T00:00:00Z
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        // integer seconds since 2024-01-01: pure long `div`, then one
        // cast — no fractional intermediate
        (expr("unix_micros(ts) div 1000000") - lit(epoch0))
          .cast("decimal(18,0)").as("x"),
        col("value").cast("decimal(28,6)").as("y"))
    val agg = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nD = col("n").cast("double")
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    agg
      .withColumn("slope", num / den)
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / nD)
      .select(col("event_type"), col("n"), col("slope"), col("intercept"))
      .orderBy("event_type")
  }

  val q158GroupedTrendSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(epoch_us(date_trunc('microseconds', ts)) // 1000000
      |      - 1704067200 AS DECIMAL(18,0)) AS x,
      |    CAST(value AS DECIMAL(28,6)) AS y
      |  FROM events WHERE value IS NOT NULL),
      |a AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
      |  FROM e GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
      |  (CAST(sy AS DOUBLE)
      |    - (CAST(n * sxy - sx * sy AS DOUBLE)
      |       / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS intercept
      |FROM a ORDER BY event_type""".stripMargin

  /** q166 — sorted-neighborhood blocking
    * ([[graft.operators.Blocking.sortedNeighborPairs]]): every customer
    * paired with its 2 successors in (c_name, c_custkey) order, scored
    * with exact edit distance — the merge/purge candidate generator that
    * complements q154's equi-key blocking. The oracle reproduces the
    * neighborhood with a ROW_NUMBER self-join.
    */
  def q166SortedNeighbors(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Blocking
      .sortedNeighborPairs(
        Tables.customer(spark, dir).select(col("c_custkey"), col("c_name")),
        "c_name", "c_custkey", window = 3)
      .select(col("l_id"), col("l_key").as("l_name"),
        col("r_id"), col("r_key").as("r_name"),
        levenshtein(col("l_key"), col("r_key")).cast("long").as("dist"))
      .orderBy("l_id", "r_id")

  val q166SortedNeighborsSql: String =
    """WITH r AS (
      |  SELECT c_custkey, c_name,
      |         ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rnk
      |  FROM customer)
      |SELECT a.c_custkey AS l_id, a.c_name AS l_name,
      |       b.c_custkey AS r_id, b.c_name AS r_name,
      |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 2
      |ORDER BY l_id, r_id""".stripMargin

  /** q168 — skyline ([[graft.operators.Skyline.skyline]]): customers on
    * the Pareto frontier of (account balance, lifetime spend) — no
    * other customer is at least as good on both and strictly better on
    * one. Spend is a decimal sum cast to double at the edge, so the
    * dominance comparisons see identical values on both engines; the
    * oracle is the textbook NOT EXISTS dominance query (quadratic —
    * exactly what the two-phase operator avoids).
    */
  def q168Skyline(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("spend"))
    val c = Tables.customer(spark, dir)
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("spend"))
    graft.operators.Skyline.skyline(c, Seq("c_acctbal", "spend"))
      .orderBy("c_custkey")
  }

  val q168SkylineSql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_name, c_acctbal,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |      AS spend
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey, c_name, c_acctbal)
      |SELECT c_custkey, c_name, c_acctbal, spend FROM c a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM c b
      |  WHERE b.c_acctbal >= a.c_acctbal AND b.spend >= a.spend
      |    AND (b.c_acctbal > a.c_acctbal OR b.spend > a.spend))
      |ORDER BY c_custkey""".stripMargin
}

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
    * row `ceil(p·n)` of each group's sorted stream (discrete/type-1
    * quantile). Engine-neutral by construction — selecting a member of
    * the multiset needs no interpolation arithmetic, so the hash compare
    * is safe where `percentile_cont` families differ in float rounding.
    * Shape at scale: ONE shuffle on the group key; the window sort and
    * the rank filter pipeline map-side after it.
    */
  def q67Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("l_returnflag")))
      .groupBy("l_returnflag")
      .agg(
        max(when(col("rn") === ceil(col("n") * 0.5), col("l_quantity")))
          .as("median_qty"),
        max(when(col("rn") === ceil(col("n") * 0.95), col("l_quantity")))
          .as("p95_qty"),
        max(when(col("rn") === ceil(col("n") * 0.99), col("l_quantity")))
          .as("p99_qty"),
        count(lit(1)).as("n_rows"))
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
}

package graft.queries

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operators over the synthetic TPC-H-ish tables.
  *
  * Each query has a matching DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  * Numeric discipline: SUMs of doubles go through DecimalType (exact,
  * order-independent) and are cast back to double at the end, so Spark's
  * partial-aggregation order can never produce a different float than the
  * single-threaded oracle.
  */
object Relational {

  /** Exact (order-independent) sum of a double column, returned as double. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(28, 6))).cast("double")

  /** q1_agg — pricing summary (TPC-H Q1 shape): scan → filter → hash agg.
    * Exercises: parquet scan w/ predicate pushdown, partial aggregation.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2_join_agg — orders ⋈ customer (shuffle, both large at scale)
    * ⋈ nation (broadcast dim): revenue per nation.
    */
  def q2JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue")
      )
      .orderBy(col("n_name"))
  }

  val q2JoinAggSql: String =
    """SELECT n_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q3_topk — top-10 orders; Spark plans TakeOrderedAndProject (no full
    * sort materialization — the O-series sort/limit semantics at scale).
    */
  def q3TopK(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val q3TopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** q4_semi_join — cohort-selection shape (SURVEY §2.5 J4): customers
    * having at least one qualifying order, as a LEFT SEMI join.
    */
  def q4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val cohort = Tables
      .orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey"))
    c.join(cohort, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  val q4SemiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin

  /** q5_anti_join — finished-groups exclusion shape (SURVEY §2.3 P6):
    * customers with no high-value order, as a LEFT ANTI join.
    */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables
      .orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  val q5AntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin

  /** q6_filter_agg — TPC-H Q6 shape: tight range filters (pushed to the
    * parquet scan) into a single global aggregate.
    */
  def q6FilterAgg(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24
      )
      .agg(
        dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows")
      )

  val q6FilterAggSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** q7_window — per-customer order sequence + running revenue (the O2
    * stable-ordering shape, SURVEY §2.7, as window functions).
    */
  def q7Window(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        // cast: Spark row_number is int, DuckDB's is bigint
        row_number().over(w).cast("long").as("rn"),
        sum(col("o_totalprice").cast(DecimalType(28, 6)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double")
          .as("run_total")
      )
  }

  val q7WindowSql: String =
    """SELECT o_orderkey, o_custkey,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_total
      |FROM orders""".stripMargin

  /** q9_shipping_priority — TPC-H Q3 shape: selective filters on both
    * sides of a 3-way join, aggregation, then top-10 — the classic
    * join-order + TakeOrdered plan.
    */
  def q9ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
  }

  val q9ShippingPrioritySql: String =
    """SELECT l_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin

  /** q8_setops — INTERSECT / EXCEPT (SURVEY §2.8): customers buying in
    * both price bands vs only the high band.
    */
  def q8SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val high = o
      .filter(col("o_totalprice") >= 3000)
      .select(col("o_custkey").as("custkey"))
      .distinct()
    val low = o
      .filter(col("o_totalprice") < 1000)
      .select(col("o_custkey").as("custkey"))
      .distinct()
    high
      .intersect(low)
      .withColumn("tag", lit("both"))
      .unionByName(high.except(low).withColumn("tag", lit("high_only")))
  }

  val q8SetOpsSql: String =
    """WITH high AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice >= 3000),
      |     low  AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice < 1000)
      |SELECT custkey, 'both' AS tag FROM (SELECT custkey FROM high INTERSECT SELECT custkey FROM low)
      |UNION ALL
      |SELECT custkey, 'high_only' AS tag FROM (SELECT custkey FROM high EXCEPT SELECT custkey FROM low)""".stripMargin
}

package graft.queries

import graft.operators.MergeOps
import graft.operators.MergeOps.MergeSpec
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked exercises of the merge/upsert operator family
  * ([[graft.operators.MergeOps]]) — the reference's Delta sink semantics
  * (SURVEY.md §2.2 K1-K3, §2.5 J1-J3, §2.6 A1) over the synthetic tables.
  *
  * Derived target/updates tables are deterministic key-modulus slices of
  * `orders`, so DuckDB can reproduce the merge with a FULL OUTER JOIN.
  */
object MergeQueries {

  private def target(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_orderkey") % 3 =!= 0)

  private def updates(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") * 2)

  private val targetSql = "SELECT * FROM orders WHERE o_orderkey % 3 <> 0"
  private val updatesSql =
    """SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
      |  o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin

  /** Emit one output column per orders column, picking the update side
    * when `take` holds.
    */
  private def pickSql(take: String): String =
    Seq(
      "o_orderkey",
      "o_custkey",
      "o_orderstatus",
      "o_totalprice",
      "o_orderdate",
      "o_orderpriority"
    ).map(c => s"  CASE WHEN $take THEN u.$c ELSE t.$c END AS $c")
      .mkString(",\n")

  /** J1: plain upsert — matched rows replaced, unmatched inserted. */
  def qMergeUpsert(spark: SparkSession, dir: String): DataFrame =
    MergeOps.merge(
      target(spark, dir),
      updates(spark, dir),
      MergeSpec(Seq("o_orderkey"))
    )

  val qMergeUpsertSql: String =
    s"""WITH t AS ($targetSql), u AS ($updatesSql)
       |SELECT
       |${pickSql("u.o_orderkey IS NOT NULL")}
       |FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey""".stripMargin

  /** J2: upsert with the lastUpdated-style guard — matched update applies
    * only when the update's timestamp is not strictly older (`<=` so equal
    * timestamps still refresh, deltalake.py:215-223). Updates shift
    * o_orderdate ±1 day by key parity to exercise both guard branches.
    */
  def qMergeGuarded(spark: SparkSession, dir: String): DataFrame = {
    val u = updates(spark, dir).withColumn(
      "o_orderdate",
      expr(
        "o_orderdate + make_dt_interval(" +
          "CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE -1 END, 0, 0, 0)"
      )
    )
    MergeOps.merge(
      target(spark, dir),
      u,
      MergeSpec(Seq("o_orderkey"), guardField = Some("o_orderdate"))
    )
  }

  val qMergeGuardedSql: String = {
    val shiftedUpdates =
      """SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |  o_totalprice * 2 AS o_totalprice,
        |  o_orderdate + (CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE -1 END) * INTERVAL 1 DAY AS o_orderdate,
        |  o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin
    val take =
      "u.o_orderkey IS NOT NULL AND (t.o_orderkey IS NULL OR t.o_orderdate <= u.o_orderdate)"
    s"""WITH t AS ($targetSql), u AS ($shiftedUpdates)
       |SELECT
       |${pickSql(take)}
       |FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey""".stripMargin
  }

  /** Insert-only mode (`update_existing=False`): matched rows keep the
    * target version; only unmatched keys are inserted.
    */
  def qMergeInsertOnly(spark: SparkSession, dir: String): DataFrame =
    MergeOps.merge(
      target(spark, dir),
      updates(spark, dir),
      MergeSpec(Seq("o_orderkey"), updateExisting = false)
    )

  val qMergeInsertOnlySql: String =
    s"""WITH t AS ($targetSql), u AS ($updatesSql)
       |SELECT
       |${pickSql("t.o_orderkey IS NULL")}
       |FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey""".stripMargin

  /** J3: group replacement — rows of a touched group (o_custkey) absent
    * from the update batch are deleted (whenNotMatchedBySourceDelete).
    */
  def qGroupReplace(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.orders(spark, dir)
    val u = all
      .filter(col("o_custkey") % 10 === 0 && col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    MergeOps.merge(
      all,
      u,
      MergeSpec(Seq("o_orderkey"), groupField = Some("o_custkey"))
    )
  }

  val qGroupReplaceSql: String = {
    val u =
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_custkey % 10 = 0 AND o_orderkey % 2 = 0""".stripMargin
    s"""WITH u AS ($u)
       |SELECT
       |${pickSql("u.o_orderkey IS NOT NULL")}
       |FROM orders t LEFT JOIN u ON t.o_orderkey = u.o_orderkey
       |WHERE u.o_orderkey IS NOT NULL
       |   OR t.o_custkey NOT IN (SELECT o_custkey FROM u)""".stripMargin
  }

  // shared scenario for the CDF pair (q83/q84): target misses every
  // third order; updates double the price of even-keyed orders of
  // every tenth customer; group-replace on o_custkey — so the feed
  // contains all four change types' triggers (inserts: update keys
  // divisible by 3; updates: matched keys; deletes: untouched target
  // rows of touched customers)
  private def cdfUpdates(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .filter(col("o_custkey") % 10 === 0 && col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)

  private val cdfUpdatesSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_custkey % 10 = 0 AND o_orderkey % 2 = 0""".stripMargin

  private val cdfSpec = MergeSpec(Seq("o_orderkey"),
    groupField = Some("o_custkey"))

  /** q83 — change data feed of a group-replace merge: the Delta-CDF
    * row-level change stream ([[MergeOps.changeFeed]]), oracle-checked
    * against DuckDB deriving the same four change classes from
    * target/update snapshot joins.
    */
  def qChangeFeed(spark: SparkSession, dir: String): DataFrame =
    MergeOps.changeFeed(target(spark, dir), cdfUpdates(spark, dir), cdfSpec)

  val qChangeFeedSql: String = {
    val uCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    s"""WITH t AS ($targetSql), u AS ($cdfUpdatesSql)
       |SELECT 'insert' AS _change_type, ${uCols.map("u." + _).mkString(", ")}
       |FROM u LEFT JOIN t ON u.o_orderkey = t.o_orderkey
       |WHERE t.o_orderkey IS NULL
       |UNION ALL
       |SELECT 'update_preimage', t.*
       |FROM t JOIN u ON t.o_orderkey = u.o_orderkey
       |UNION ALL
       |SELECT 'update_postimage', ${uCols.map("u." + _).mkString(", ")}
       |FROM t JOIN u ON t.o_orderkey = u.o_orderkey
       |UNION ALL
       |SELECT 'delete', t.*
       |FROM t LEFT JOIN u ON t.o_orderkey = u.o_orderkey
       |WHERE u.o_orderkey IS NULL
       |  AND t.o_custkey IN (SELECT o_custkey FROM u)""".stripMargin
  }

  /** q84 — incremental aggregate maintenance: a per-customer
    * (count, sum) aggregate of the target is folded forward with q83's
    * change feed ([[graft.operators.IncrementalAgg]]) instead of
    * recomputed; the oracle computes the aggregate from scratch over
    * the fully-merged table, so the hash check proves
    * incremental == full recompute (sums carried as DECIMAL(28,6),
    * where addition is exact).
    */
  def qIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalAgg
    val t = target(spark, dir)
    val base = IncrementalAgg.countSum(t, "o_custkey", "o_totalprice")
    val changes = MergeOps.changeFeed(t, cdfUpdates(spark, dir), cdfSpec)
    IncrementalAgg
      .applyChanges(base, changes, "o_custkey", "o_totalprice")
      .select(col("o_custkey"), col("n").as("n_orders"),
        col("s").cast("double").as("total"))
  }

  val qIncrementalAggSql: String =
    s"""WITH t AS ($targetSql), u AS ($cdfUpdatesSql),
       |merged AS (
       |SELECT
       |${pickSql("u.o_orderkey IS NOT NULL")}
       |FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey
       |WHERE u.o_orderkey IS NOT NULL
       |   OR t.o_custkey NOT IN (SELECT o_custkey FROM u))
       |SELECT o_custkey, COUNT(*) AS n_orders,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
       |FROM merged GROUP BY 1""".stripMargin

  /** K3: delete-by-id as a distributed anti-join. */
  def qDeleteIds(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val ids = orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey")
    MergeOps.deleteByIds(orders, "o_orderkey", ids)
  }

  val qDeleteIdsSql: String =
    "SELECT * FROM orders WHERE o_orderkey % 7 <> 0"

  /** A1: within-batch last-wins dedup on (user_id, event_type), later
    * events win; event_id breaks ties deterministically.
    */
  def qDedupLastWins(spark: SparkSession, dir: String): DataFrame =
    MergeOps
      .dedupLastWins(
        Tables.events(spark, dir),
        Seq("user_id", "event_type"),
        Seq(col("ts"), col("event_id"))
      )
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  val qDedupLastWinsSql: String =
    """SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id,
      |  event_type, value, props
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY user_id, event_type
      |    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1""".stripMargin
}

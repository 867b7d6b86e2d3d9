package graft.queries

import graft.deid.Codebook
import graft.functions.DeidFunctions._
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** De-identification scalar functions (SURVEY §2.4) exercised over
  * synthetic PII-shaped columns derived deterministically from the TPC-H
  * tables, so DuckDB can replicate every transform.
  */
object DeidQueries {

  private val restrictedList =
    RestrictedZips.map(z => s"'$z'").mkString(", ")

  /** q40 — date generalization (year), date chop, and zip3
    * generalization with the restricted-prefix table.
    */
  def qDeidScalars(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val dstr = date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
    val zip = lpad(((col("o_orderkey") * 37) % 100000).cast("string"), 5, "0")
    o.select(
      col("o_orderkey"),
      yearOf(dstr).as("birth_year"),
      dateChop(dstr).as("event_date"),
      zipGeneralize(zip).as("zip3")
    )
  }

  val qDeidScalarsSql: String =
    s"""WITH src AS (
       |  SELECT o_orderkey,
       |    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS dstr,
       |    lpad(CAST((o_orderkey * 37) % 100000 AS VARCHAR), 5, '0') AS zip
       |  FROM orders)
       |SELECT o_orderkey,
       |  substr(dstr, 1, 4) AS birth_year,
       |  substr(dstr, 1, 10) AS event_date,
       |  (CASE WHEN substr(zip, 1, 3) IN ($restrictedList) THEN '000'
       |        ELSE substr(zip, 1, 3) END)
       |    || translate(substr(zip, 4), '123456789', '000000000') AS zip3
       |FROM src""".stripMargin

  /** q41 — content checksum (the NLP cache key, F11): sha256 hex. */
  def qChecksum(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), contentChecksum(col("text")).as("checksum"))

  val qChecksumSql: String =
    "SELECT doc_id, sha256(text) AS checksum FROM documents"

  /** q42 — Epic custom code-system guard (F7) over synthetic
    * (system, code, display) triples covering every branch.
    */
  def qCheckSystem(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val system = when(col("p_partkey") % 3 === 0,
      lit("urn:oid:1.2.840.114350.1.13"))
      .when(col("p_partkey") % 3 === 1, lit("http://loinc.org"))
      .otherwise(lit(null))
    val code = when(col("p_partkey") % 5 === 0, lit(null))
      .when(col("p_partkey") % 5 === 1, lit("0"))
      .when(col("p_partkey") % 5 === 2, lit("ABC"))
      .otherwise(col("p_partkey").cast("string"))
    val display = when(col("p_partkey") % 2 === 0, col("p_name"))
      .otherwise(lit(null))
    p.select(col("p_partkey"),
        checkSystem(system, code, display).as("cleaned"))
      .select(
        col("p_partkey"),
        col("cleaned.code").as("code"),
        col("cleaned.display").as("display")
      )
  }

  val qCheckSystemSql: String =
    """WITH src AS (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 3 = 0 THEN 'urn:oid:1.2.840.114350.1.13'
      |         WHEN p_partkey % 3 = 1 THEN 'http://loinc.org'
      |         ELSE NULL END AS system,
      |    CASE WHEN p_partkey % 5 = 0 THEN NULL
      |         WHEN p_partkey % 5 = 1 THEN '0'
      |         WHEN p_partkey % 5 = 2 THEN 'ABC'
      |         ELSE CAST(p_partkey AS VARCHAR) END AS code,
      |    CASE WHEN p_partkey % 2 = 0 THEN p_name ELSE NULL END AS display
      |  FROM part),
      |flags AS (
      |  SELECT *,
      |    system IS NOT NULL
      |      AND starts_with(system, 'urn:oid:1.2.840.114350.') AS in_epic,
      |    code IS NOT NULL
      |      AND regexp_matches(code, '^-?[0-9]+$') AS numeric_code
      |  FROM src)
      |SELECT p_partkey,
      |  CASE WHEN NOT in_epic OR code IS NULL OR numeric_code
      |       THEN code ELSE NULL END AS code,
      |  CASE WHEN (NOT in_epic OR code IS NULL OR numeric_code)
      |        AND (NOT in_epic OR (code IS NOT NULL AND numeric_code
      |             AND NOT (code = '0' AND display IS NOT NULL)))
      |       THEN display ELSE NULL END AS display
      |FROM flags""".stripMargin

  /** q43 — partial FHIR date parsing (F10): "1980", "1980-06", full dates
    * all resolve to a DATE (first day of the period).
    */
  def qPartialDates(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val full = date_format(col("o_orderdate"), "yyyy-MM-dd")
    val partial = when(col("o_orderkey") % 3 === 0, substring(full, 1, 4))
      .when(col("o_orderkey") % 3 === 1, substring(full, 1, 7))
      .otherwise(full)
    o.select(
      col("o_orderkey"),
      partial.as("raw"),
      parseFhirDate(partial).as("parsed")
    )
  }

  val qPartialDatesSql: String =
    """WITH src AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 3 = 0
      |           THEN strftime(o_orderdate, '%Y')
      |         WHEN o_orderkey % 3 = 1
      |           THEN strftime(o_orderdate, '%Y-%m')
      |         ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw
      |  FROM orders)
      |SELECT o_orderkey, raw,
      |  CASE WHEN length(raw) = 4 THEN CAST(strptime(raw, '%Y') AS DATE)
      |       WHEN length(raw) = 7 THEN CAST(strptime(raw, '%Y-%m') AS DATE)
      |       ELSE CAST(strptime(raw, '%Y-%m-%d') AS DATE) END AS parsed
      |FROM src""".stripMargin

  /** q44 — pseudonymous IDs + reference rewriting (F1/F2). Rows-only by
    * necessity: DuckDB's sha256() accepts VARCHAR only, and the HMAC
    * construction needs a digest over raw bytes (opad ‖ inner-digest),
    * which a VARCHAR can't carry — so no SQL oracle is expressible.
    * The primitive is pinned by RFC 4231 test vectors in DeidSpec and
    * the golden-file harness locks end-to-end fake IDs under a pinned
    * salt.
    */
  def qAnonIds(spark: SparkSession, dir: String): DataFrame = {
    val cb = Codebook.withSalt("42" * 32)
    val c = Tables.customer(spark, dir)
    c.select(
      col("c_custkey"),
      cb.fakeId(col("c_custkey").cast("string")).as("fake_id"),
      cb.anonRef(concat(lit("Patient/"), col("c_custkey").cast("string")))
        .as("fake_ref")
    )
  }

  /** q163 — k-anonymity / l-diversity audit: the measurable gate on
    * the de-identification story (F1-F14 scrub, then PROVE the
    * release is safe). Quasi-identifiers (nation, market segment,
    * phone country code) partition customers into equivalence
    * classes; each class reports its size k, the diversity l of the
    * sensitive attribute (account-balance thousands bucket), and the
    * k≥5 ∧ l≥2 verdict. ONE aggregate over the release — map-side
    * combinable, any number of classes; re-identification risk =
    * 1/k per class, auditable before any data leaves.
    */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).as("bal_bucket"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("k"),
        countDistinct(col("bal_bucket")).as("l"))
      .withColumn("ok", col("k") >= 5L && col("l") >= 2L)
      .orderBy("c_nationkey", "c_mktsegment")

  val qKAnonymitySql: String =
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(COUNT(*) AS BIGINT) AS k,
      |  CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
      |    AS BIGINT) AS l,
      |  (COUNT(*) >= 5 AND
      |   COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 2)
      |    AS ok
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin
}

package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness's synthetic parquet tables (TESTDATA.md).
  *
  * Plain parquet scans: Catalyst pushes filters/projections into the scan,
  * so callers should NOT cache or materialize here — each query's plan
  * decides what is actually read.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). Read it as a nanos long via the
    * legacy conf and convert to a microsecond timestamp (floor-truncated,
    * matching DuckDB's `date_trunc('microseconds', ts)`).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      // integer `div`, not `/` — double division loses precision at 1.7e18 ns
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}

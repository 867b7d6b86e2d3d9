package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame
  * operator — the third member of the sketch family beside HLL distinct
  * (q72) and SpaceSaving heavy hitters (q86).
  *
  * The sketch TABLE is (depth, bucket, cnt) with
  * `cnt = Σ weight of keys hashing to bucket under hash_depth` — a plain
  * integer aggregation, so unlike most sketches it is ORACLE-EXACT: the
  * hash family is the md5-60-bit convention the q25 oracle twin uses
  * (`('0x'||substr(md5(d||':'||key),1,15))::BIGINT % width` in DuckDB),
  * built here from codegen'd builtins (md5/conv/pmod), no UDF.
  *
  * Scale shape: build = one partial-agg'd shuffle of depth×|keys| narrow
  * rows into ≤ depth×width cells (constant memory; the point of a CMS);
  * probe = a broadcast join of the ≤ depth×width sketch against the probe
  * keys, estimate = min over depths — overcounts only, never undercounts.
  */
object CountMinSketch {

  /** md5-60-bit bucket of `key` under hash index `d`. */
  def bucket(key: Column, d: Column, width: Int): Column =
    pmod(
      conv(substring(md5(concat(d.cast("string"), lit(":"), key)), 1, 15),
        16, 10).cast("long"),
      lit(width.toLong))

  /** Build the sketch table from a (key, weight) frame:
    * one output row per non-empty (depth, bucket) cell.
    */
  def build(
      keyed: DataFrame,
      keyCol: String,
      weightCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    keyed
      .select(col(keyCol).cast("string").as("__k"),
        col(weightCol).cast("long").as("__w"),
        explode(array((0 until depth).map(lit): _*)).as("depth"))
      .select(col("depth"),
        bucket(col("__k"), col("depth"), width).as("bucket"),
        col("__w"))
      .groupBy("depth", "bucket")
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Point estimates for `probes` (a frame with `keyCol`): min over
    * depths of the probed cells. The sketch side is tiny (≤ depth×width
    * rows) and broadcasts. The join is LEFT OUTER with empty cells
    * counting as ZERO — an inner join would silently drop keys whose
    * cells are all empty and inflate estimates for keys with some empty
    * cells (a cell the key hashes into that holds no mass bounds its
    * count at 0; that IS the minimum).
    */
  def probe(
      sketch: DataFrame,
      probes: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val exploded = probes
      .withColumn("depth", explode(array((0 until depth).map(lit): _*)))
      .withColumn("bucket", bucket(col(keyCol).cast("string"), col("depth"), width))
    exploded
      .join(broadcast(sketch), Seq("depth", "bucket"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}

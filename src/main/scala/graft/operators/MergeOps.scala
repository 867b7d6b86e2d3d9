package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert/merge semantics of the reference's Delta Lake sink, re-expressed
  * as pure DataFrame transforms (no Delta on the classpath).
  *
  * Semantics mirrored (reference: cumulus_etl/formats/deltalake.py):
  *  - equi-merge on uniqueness keys, insert-when-not-matched
  *    (deltalake.py:110-119)
  *  - matched update guarded by a "lastUpdated"-style timestamp condition:
  *    update unless BOTH sides have the field and the update is strictly
  *    older (deltalake.py:187-232; `<=` keeps equal-timestamp refreshes)
  *  - insert-only mode (`update_existing=False`)
  *  - group replacement: target rows of a touched group that are absent
  *    from the update are deleted (`whenNotMatchedBySourceDelete`,
  *    deltalake.py:124-128)
  *  - delete-by-id (deltalake.py:134-153)
  *  - within-batch last-wins dedup on the merge keys
  *    (etl/tasks/base.py:303-335)
  *
  * Scale notes: the merge is one shuffle (full-outer hash join on the
  * keys); the touched-group probe is a broadcast join on the distinct
  * group values (small by construction — groups are export batches);
  * dedup is a single window over the same key partitioning, so AQE can
  * reuse the exchange.
  */
object MergeOps {

  /** Parameters of one output table's merge — the Spark-native equivalent
    * of the reference's `OutputTable` (etl/tasks/base.py:23-77).
    */
  case class MergeSpec(
      keys: Seq[String],
      updateExisting: Boolean = true,
      guardField: Option[String] = None,
      groupField: Option[String] = None
  )

  /** A1: dedup on `keys`, keeping the LAST occurrence by `order`
    * ("updates appended later win", etl/tasks/base.py:308-316).
    * One shuffle on `keys`; ordering columns must form a total order
    * within a key group for determinism.
    */
  def dedupLastWins(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column]
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full merge: returns the post-merge table contents. Schema evolution:
    * the result has the union of both schemas (autoMerge behavior,
    * deltalake.py:71), missing columns null-filled.
    */
  def merge(target: DataFrame, updates: DataFrame, spec: MergeSpec): DataFrame = {
    val cols = mergedColumns(target, updates)
    val t = align(target, cols)
    val u = align(updates, cols)
    val names = cols.map(_._1)

    val tPacked =
      t.select(spec.keys.map(col) :+ struct(names.map(col): _*).as("__t"): _*)
    val uPacked =
      u.select(spec.keys.map(col) :+ struct(names.map(col): _*).as("__u"): _*)
    val joined = tPacked.join(uPacked, spec.keys, "full_outer")

    val guardOk: Column = guardCondition(spec, cols)
    val takeUpdate = col("__u").isNotNull &&
      (col("__t").isNull || (lit(spec.updateExisting) && guardOk))
    val chosen = when(takeUpdate, col("__u")).otherwise(col("__t"))

    val unpacked = joined
      .select(col("__u").isNull.as("__targetOnly"), chosen.as("__row"))
      .select(col("__targetOnly"), col("__row.*"))

    val result = spec.groupField match {
      case Some(g) =>
        val touched = u.select(col(g).as("__tg")).distinct()
        unpacked
          .join(broadcast(touched), col(g) === col("__tg"), "left_outer")
          .filter(!(col("__targetOnly") && col("__tg").isNotNull))
          .drop("__tg")
      case None => unpacked
    }
    result.drop("__targetOnly")
  }

  /** Change data feed of a [[merge]]: the row-level changes the merge
    * would apply, in Delta CDF vocabulary — `_change_type` ∈ `insert` /
    * `update_preimage` / `update_postimage` / `delete` (the feed Delta
    * emits when `delta.enableChangeDataFeed` is on; the reference's
    * sink tables could turn it on without any pipeline change). Derived
    * from the SAME full-outer key join as the merge itself — one
    * shuffle — with group-replace deletions probed against the
    * broadcast touched-groups set; matched rows blocked by the guard
    * (or by insert-only mode) emit nothing. Matched updates emit the
    * pre/post pair even when values are identical, like Delta.
    * [[IncrementalAgg]] consumes exactly this stream.
    */
  def changeFeed(
      target: DataFrame,
      updates: DataFrame,
      spec: MergeSpec
  ): DataFrame = {
    val cols = mergedColumns(target, updates)
    val t = align(target, cols)
    val u = align(updates, cols)
    val names = cols.map(_._1)

    val tPacked =
      t.select(spec.keys.map(col) :+ struct(names.map(col): _*).as("__t"): _*)
    val uPacked =
      u.select(spec.keys.map(col) :+ struct(names.map(col): _*).as("__u"): _*)
    val joined = tPacked.join(uPacked, spec.keys, "full_outer")

    val guardOk: Column = guardCondition(spec, cols)
    val base = spec.groupField match {
      case Some(g) =>
        val touched = u.select(col(g).as("__tg")).distinct()
        joined
          .join(broadcast(touched), col(s"__t.$g") === col("__tg"),
            "left_outer")
          .withColumn("__del",
            col("__u").isNull && col("__t").isNotNull &&
              col("__tg").isNotNull)
      case None => joined.withColumn("__del", lit(false))
    }
    val isInsert = col("__u").isNotNull && col("__t").isNull
    val isUpdate = col("__u").isNotNull && col("__t").isNotNull &&
      lit(spec.updateExisting) && guardOk
    def mk(ct: String, r: Column) =
      struct(lit(ct).as("_change_type"), r.as("__r"))
    base
      .select(explode(
        when(isInsert, array(mk("insert", col("__u"))))
          .when(isUpdate, array(mk("update_preimage", col("__t")),
            mk("update_postimage", col("__u"))))
          .when(col("__del"), array(mk("delete", col("__t"))))
          .otherwise(lit(null))
      ).as("__c"))
      .select(col("__c._change_type").as("_change_type") +:
        names.map(n => col(s"__c.__r.$n").as(n)): _*)
  }

  /** K3: delete rows whose id appears in `ids` (single key column in
    * `ids`). Distributed anti-join — no driver-side id collection, so the
    * reference's 50k-chunk OOM guard (deltalake.py:143-152) is unneeded.
    */
  def deleteByIds(df: DataFrame, key: String, ids: DataFrame): DataFrame = {
    val idCol = ids.columns.head
    df.join(
      broadcast(ids.select(col(idCol).as(key)).distinct()),
      Seq(key),
      "left_anti"
    )
  }

  /** The matched-update guard as a Column over the packed `__t`/`__u`
    * structs: update unless BOTH sides carry the timestamp and the update
    * is strictly older (deltalake.py:187-232; `<=` keeps equal-timestamp
    * refreshes). Mirrors the reference's auto-detection
    * (deltalake.py:120-122): a guard path absent from the merged schema
    * disables the guard instead of failing resolution, so the same
    * MergeSpec serves FHIR tables (which always have `meta.lastUpdated`)
    * and schema-less custom tables alike.
    */
  private def guardCondition(
      spec: MergeSpec,
      cols: Seq[(String, org.apache.spark.sql.types.DataType)]
  ): Column = spec.guardField match {
    case Some(g) if hasPath(cols, g) =>
      col(s"__t.$g").isNull || col(s"__u.$g").isNull ||
      col(s"__t.$g").cast("timestamp") <= col(s"__u.$g").cast("timestamp")
    case _ => lit(true)
  }

  /** Whether the dotted `path` resolves through the merged column list
    * (struct fields walked level by level).
    */
  private def hasPath(
      cols: Seq[(String, org.apache.spark.sql.types.DataType)],
      path: String
  ): Boolean = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val parts = path.split('.')
    def walk(dt: DataType, rest: List[String]): Boolean = (dt, rest) match {
      case (_, Nil) => true
      case (s: StructType, h :: t) =>
        s.fields.find(_.name == h).exists(f => walk(f.dataType, t))
      case _ => false
    }
    cols.find(_._1 == parts.head)
      .exists { case (_, dt) => walk(dt, parts.toList.tail) }
  }

  private def mergedColumns(
      target: DataFrame,
      updates: DataFrame
  ): Seq[(String, org.apache.spark.sql.types.DataType)] = {
    val tCols = target.schema.map(f => f.name -> f.dataType)
    val have = tCols.map(_._1).toSet
    tCols ++ updates.schema.collect {
      case f if !have.contains(f.name) => f.name -> f.dataType
    }
  }

  private def align(
      df: DataFrame,
      cols: Seq[(String, org.apache.spark.sql.types.DataType)]
  ): DataFrame = {
    val have = df.columns.toSet
    df.select(cols.map { case (n, t) =>
      if (have.contains(n)) col(n) else lit(null).cast(t).as(n)
    }: _*)
  }
}

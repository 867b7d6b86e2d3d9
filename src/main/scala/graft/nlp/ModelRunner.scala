package graft.nlp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** External NLP/LLM model invocation (SURVEY §2.10, §3.2): per-partition
  * batched calls behind the content-addressed cache join, so executors
  * amortize connection setup and the driver never sees note text.
  */
object ModelRunner {

  /** The provider boundary: one batch of prompts in, one answer per
    * prompt out, executor-side. HTTP/bedrock/vLLM clients implement
    * this; tests use deterministic fakes. Implementations must be
    * Serializable (constructed on the driver, used on executors) and
    * should lazily open connections per partition.
    */
  trait ModelClient extends Serializable {
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** Annotate notes with model results, cache-first:
    *  1. checksum join against `cache` (checksum, result) — hits skip
    *     the model entirely (J8/S10);
    *  2. misses stream through `client` in `batchSize` groups per
    *     partition (mapPartitions — the reference's async batching,
    *     nlp/models.py:207-448, collapsed to the Spark-native form);
    *  3. returns (annotated notes, fresh cache entries to merge back).
    */
  def annotate(
      notes: DataFrame,
      idCol: String,
      textCol: String,
      cache: DataFrame,
      client: ModelClient,
      batchSize: Int = 32
  ): (DataFrame, DataFrame) = {
    val spark = notes.sparkSession
    val withSum = notes
      .withColumn("__checksum", sha2(col(textCol), 256))
    val joined = withSum.join(
      cache.select(col("checksum").as("__checksum"),
        col("result").as("__cached")),
      Seq("__checksum"), "left_outer")

    val hitRows = joined.filter(col("__cached").isNotNull)
      .select(col(idCol), col("__checksum").as("checksum"),
        col("__cached").as("result"))

    val missSchema = StructType(Seq(
      StructField(idCol, joined.schema(idCol).dataType),
      StructField("checksum", StringType),
      StructField("result", StringType)
    ))
    val misses = joined.filter(col("__cached").isNull)
      .select(col(idCol), col("__checksum"), col(textCol))
    val computed = spark.createDataFrame(
      misses.rdd.mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { group =>
          val answers = client.complete(group.map(_.getString(2)))
          group.zip(answers).map { case (r, a) =>
            Row(r.get(0), r.getString(1), a)
          }
        }
      },
      missSchema
    )

    val annotated = hitRows.unionByName(computed)
    val fresh = computed
      .select("checksum", "result")
      .dropDuplicates("checksum")
      .join(cache.select("checksum"), Seq("checksum"), "left_anti")
    (annotated, fresh)
  }
}

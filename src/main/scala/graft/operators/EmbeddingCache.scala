package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-addressed embedding cache (SURVEY §7.5: the NLP response
  * cache S10 generalized to the embedding pipeline). Embedding models
  * are the expensive stage of a training-data pipeline; re-runs over a
  * mostly-unchanged corpus should pay model cost only for NEW content.
  *
  * Unlike the per-row coalesce shape of [[graft.nlp.NoteOps.cachedResults]]
  * (right for scalar expressions), this splits hits from misses so the
  * model sees ONLY miss rows as a batch-friendly DataFrame — the shape a
  * GPU/mapPartitions embedder needs — then unions results back.
  *
  * Scale: one shuffle join on the 64-hex checksum (both sides
  * partitioned by it), model cost ∝ misses, and the fresh-entries side
  * output merges into the cache table keyed on checksum (idempotent).
  */
object EmbeddingCache {

  def checksum(text: Column): Column = sha2(text, 256)

  /** Resolve embeddings for `docs` against `cache`.
    *
    * @param docs    corpus with `idCol` and `textCol`
    * @param cache   existing cache, columns (checksum, embedding)
    * @param embed   model: DataFrame of miss rows (idCol, textCol,
    *                checksum) → DataFrame with (checksum, embedding);
    *                called once, lazily, over misses only
    * @return (all docs with an `embedding` column, fresh cache rows to
    *         merge back — distinct checksums absent from the cache)
    */
  def resolve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cache: DataFrame,
      embed: DataFrame => DataFrame
  ): (DataFrame, DataFrame) = {
    val withSum = docs.withColumn("checksum", checksum(col(textCol)))
    val joined = withSum.join(cache, Seq("checksum"), "left_outer")
    val hits = joined.filter(col("embedding").isNotNull)
    val misses = joined.filter(col("embedding").isNull).drop("embedding")

    // model sees each DISTINCT missing content once, even if the corpus
    // repeats it — cache semantics, not per-row semantics
    val missContent = misses
      .select(col("checksum"), col(idCol), col(textCol))
      .dropDuplicates("checksum")
    // persisted: feeds BOTH the resolved output and the fresh-entries
    // side output — without it the model would run twice per miss
    val computed = embed(missContent).select("checksum", "embedding")
      .cache()

    val resolvedMisses = misses.join(computed, Seq("checksum"), "left_outer")
    val all = hits.unionByName(resolvedMisses)
    val fresh = computed
      .filter(col("embedding").isNotNull)
      .join(cache.select("checksum"), Seq("checksum"), "left_anti")
    (all, fresh)
  }
}

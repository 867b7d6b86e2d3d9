package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style boilerplate-paragraph detection: a paragraph is boilerplate
  * within a source when it appears in at least `minNum/minDen` of that
  * source's documents (navigation bars, footers, cookie banners). Unlike
  * [[NearDedup.paragraphDedup]] — which keeps the first occurrence of a
  * globally duplicated paragraph — the document-frequency rule removes
  * EVERY occurrence once the per-source share crosses the threshold, the
  * behaviour web-corpus pipelines (CCNet §3.1) use for template text.
  *
  * Scale shape: the canonical two-pass df algorithm — pass one aggregates
  * per-(source, paragraph-hash) document frequencies with map-side
  * partials; the flagged set is by construction a small fraction of
  * distinct paragraphs, so pass two joins it back onto the exploded
  * paragraph stream — AQE broadcasts it at realistic sizes, and the
  * corpus itself is never re-shuffled (plan audit:
  * two text scans plus one column-pruned scan for the per-source doc
  * counts, which Catalyst strips down to the id/source columns). The
  * threshold compares with integer cross-multiplication
  * (`minDen * df >= minNum * srcDocs`), so engines never disagree on a
  * float ratio at the boundary.
  */
object Boilerplate {

  /** One row per non-empty paragraph of `textCol` (split on blank lines):
    * (id, source, idx, plen, h, para_docs, src_docs, boiler).
    *
    * @param idCol  unique document id column
    * @param minNum / @param minDen  flag threshold as an exact fraction of
    *        the source's document count
    */
  def flagBoilerplate(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      textCol: String,
      minNum: Long,
      minDen: Long): DataFrame = {
    require(minNum > 0 && minDen > 0, "threshold fraction must be positive")
    val paras = docs
      .select(col(idCol).as("id"), col(sourceCol).as("source"),
        posexplode(split(col(textCol), "\n\n")).as(Seq("idx", "para")))
      .withColumn("para", trim(col("para")))
      .filter(length(col("para")) > 0)
      .select(col("id"), col("source"), col("idx").cast("long").as("idx"),
        length(col("para")).cast("long").as("plen"), md5(col("para")).as("h"))
    // paragraph document frequency within each source (distinct docs)
    val df = paras.groupBy(col("source"), col("h"))
      .agg(countDistinct(col("id")).as("para_docs"))
    // per-source doc counts: one row per source, broadcast-sized
    val srcDocs = docs.groupBy(col(sourceCol).as("source"))
      .agg(countDistinct(col(idCol)).as("src_docs"))
    val flagged = df
      .join(broadcast(srcDocs), "source")
      .filter(lit(minDen) * col("para_docs") >= lit(minNum) * col("src_docs"))
    // no broadcast hint on the flagged set: in a normal corpus it is
    // broadcast-sized and AQE will broadcast it, but a degenerate input
    // (every paragraph shared) makes it as large as the paragraph
    // vocabulary — forcing the hint there would be a driver OOM, the
    // cosinePairsAbove lesson
    paras
      .join(flagged, Seq("source", "h"), "left")
      .withColumn("boiler", col("para_docs").isNotNull)
  }
}

package graft

import java.nio.file.{Files, Paths}

import graft.deid.{Codebook, ScrubCompiler}
import graft.nlp.CovidSymptom
import graft.nlp.CovidSymptom.{ConceptAttr, SymptomMatch}
import graft.sources.NdjsonSource
import org.apache.spark.sql.functions._

/** Cross-validation of the covid-symptom NLP study against the
  * REFERENCE's covid fixture (tests/data/covid): scrub its
  * DocumentReferences under its pinned codebook, run the study with
  * fake NLP clients that fabricate exactly what the reference's
  * ctakesmock does (2nd word = fever + nausea mentions, 3rd word = a
  * non-covid itch; cNLP all-positive for the negation model, first span
  * negative for term-exists), and demand structural equality with BOTH
  * checked-in golden tables.
  */
/** ctakesmock.fake_ctakes_extract (ctakesmock.py:150-280) — top level
  * so the task closure stays serializable.
  */
private object FakeCtakes extends CovidSymptom.CtakesClient {
  def signSymptoms(note: String): Seq[SymptomMatch] = {
    val words = note.split("\\s+").toSeq
    if (words.length < 3) return Nil
    val feverBegin = words.head.length + 1
    val feverEnd = feverBegin + words(1).length
    val itchBegin = feverEnd + 1
    val itchEnd = itchBegin + words(2).length
    Seq(
      SymptomMatch(feverBegin, feverEnd, words(1), 0, Seq(
        ConceptAttr("386661006", "C0015967", "SNOMEDCT_US", "T184"),
        ConceptAttr("50177009", "C0015967", "SNOMEDCT_US", "T184")),
        "SignSymptomMention"),
      SymptomMatch(feverBegin, feverEnd, words(1), 0, Seq(
        ConceptAttr("422587007", "C0027497", "SNOMEDCT_US", "T184")),
        "SignSymptomMention"),
      SymptomMatch(itchBegin, itchEnd, words(2), 0, Seq(
        ConceptAttr("418290006", "C0033774", "SNOMEDCT_US", "T184"),
        ConceptAttr("279333002", "C0033774", "SNOMEDCT_US", "T184")),
        "SignSymptomMention")
    )
  }
}

/** ctakesmock.fake_transformer_list_polarity (:282-294). */
private class FakePolarity(termExists: Boolean)
    extends CovidSymptom.PolarityClient {
  def polarities(note: String, spans: Seq[(Int, Int)]): Seq[Int] =
    if (termExists && spans.nonEmpty) 1 +: Seq.fill(spans.length - 1)(0)
    else Seq.fill(spans.length)(0)
}

class CovidCompatSpec extends SparkSpecBase {

  private val refData = "/root/reference/tests/data/covid"
  private def available: Boolean = Files.exists(Paths.get(refData))

  private val covidCuis = Set("C0015967", "C0027497") // fever, nausea

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  mapper.configure(com.fasterxml.jackson.databind.SerializationFeature
    .ORDER_MAP_ENTRIES_BY_KEYS, true)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(to_json(struct(df.columns.map(col): _*),
        Map("ignoreNullFields" -> "true")).as("j"))
      .collect().map { r =>
        val node = mapper.readTree(r.getString(0))
        mapper.writeValueAsString(mapper.treeToValue(node, classOf[Object]))
      }.sorted.toSeq

  private def run(termExists: Boolean) = {
    val cb = Codebook.loadOrCreate(refData)
    val docrefs = ScrubCompiler.scrub(
      NdjsonSource.readResource(spark, s"$refData/input",
        "DocumentReference"),
      "DocumentReference", cb, nlpMode = true)
    CovidSymptom.extract(docrefs, FakeCtakes, new FakePolarity(termExists),
      covidCuis, generatedOn = "2021-09-14T21:23:45+00:00")
  }

  test("negation-model results match the reference's covid golden") {
    assume(available)
    val golden = canon(spark.read.json(
      s"$refData/output/covid_symptom/nlp_results_v4/nlp_results_v4.000.ndjson"))
    assert(canon(run(termExists = false)) === golden)
  }

  test("term-exists results match the reference's term-exists golden") {
    assume(available)
    val golden = canon(spark.read.json(
      s"$refData/term-exists/covid_symptom/nlp_results_term_exists_v4/" +
        "nlp_results_term_exists_v4.000.ndjson"))
    assert(canon(run(termExists = true)) === golden)
  }
}

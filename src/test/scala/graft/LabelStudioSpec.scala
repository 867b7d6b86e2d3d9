package graft

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper

import graft.nlp.LabelStudio
import graft.nlp.LabelStudio.{Highlight, LsNote}
import org.scalatest.funsuite.AnyFunSuite

/** K11 chart-review upload: task payload shape, highlight/sublabel
  * grouping, the hidden philter layer, and skip-vs-overwrite push
  * reconciliation with bounded batches — against an in-memory fake of
  * the HTTP boundary (the reference mocks the Label Studio SDK the same
  * way, tests/upload_notes).
  */
class LabelStudioSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def note(id: String, text: String = "fever and chills"): LsNote =
    LsNote(
      uniqueId = id,
      patientId = s"pat-$id",
      anonPatientId = s"anon-$id",
      encounterId = Some(s"enc-$id"),
      anonEncounterId = Some(s"anon-enc-$id"),
      text = text,
      date = Some("2021-06-07T08:09:10"),
      docMappings = Seq(s"doc-$id" -> s"anon-doc-$id"),
      docSpans = Seq(s"doc-$id" -> (0, text.length))
    )

  private class FakeTransport(existing: Map[String, Long] = Map.empty)
      extends LabelStudio.LabelStudioTransport {
    val deleted = mutable.Buffer[Long]()
    val importedBatches = mutable.Buffer[Seq[String]]()
    val searchBatchSizes = mutable.Buffer[Int]()
    def searchExisting(ids: Seq[String]): Map[String, Long] = {
      searchBatchSizes += ids.size
      existing.filter(e => ids.contains(e._1))
    }
    def deleteTask(taskId: Long): Unit = deleted += taskId
    def importTasks(batch: Seq[String]): Unit = importedBatches += batch
  }

  test("task data block carries ids, mappings, and span pairs") {
    val json = LabelStudio.formatTask(note("n1"), "label", "text")
    val node = mapper.readTree(json)
    val data = node.get("data")
    assert(data.get("unique_id").asText() === "n1")
    assert(data.get("anon_patient_id").asText() === "anon-n1")
    assert(data.get("docref_mappings").get("doc-n1").asText() === "anon-doc-n1")
    val span = data.get("docref_spans").get("doc-n1")
    assert(span.get(0).asInt() === 0 && span.get(1).asInt() === 16)
    assert(data.get("label").isArray) // dynamic-label slot always present
  }

  test("highlights group by (label, span, origin) into per-origin predictions") {
    val n = note("n2").copy(highlights = Seq(
      Highlight("Symptom", 0, 5, "ctakes"),
      Highlight("Symptom", 0, 5, "ctakes",
        Some("Symptom severity"), Some("mild")),
      Highlight("Symptom", 10, 16, "llm")))
    val node = mapper.readTree(LabelStudio.formatTask(n, "label", "text"))
    val preds = node.get("predictions")
    assert(preds.size() === 2) // one per origin
    val ctakes = preds.get(0)
    assert(ctakes.get("model_version").asText() === "ctakes")
    // parent label + sublabel rows share one span id
    val results = ctakes.get("result")
    assert(results.size() === 2)
    assert(results.get(0).get("id").asText() ===
      results.get(1).get("id").asText())
    assert(results.get(0).get("value").get("text").asText() === "fever")
    assert(results.get(1).get("from_name").asText() === "Symptom severity")
    // sublabel data columns get slugged names ("Symptom " prefix dropped)
    val data = node.get("data")
    assert(data.get("symptom_severity_label").asText() === "mild")
    assert(data.get("symptom_severity_text").asText() === "fever")
    // used labels recorded for dynamic configs
    assert(data.get("label").get(0).get("value").asText() === "Symptom")
  }

  test("philter spans land in a hidden _philter prediction layer") {
    val n = note("n3").copy(philterSpans = Seq((10, 16), (0, 5)))
    val node = mapper.readTree(LabelStudio.formatTask(n, "label", "text"))
    val preds = node.get("predictions")
    assert(preds.size() === 1)
    assert(preds.get(0).get("model_version").asText() === "Philter")
    val results = preds.get(0).get("result")
    assert(results.size() === 2)
    // sorted by span start
    assert(results.get(0).get("value").get("start").asInt() === 0)
    assert(results.get(0).get("value").get("labels").get(0).asText()
      === "_philter")
  }

  test("existing tasks are skipped without overwrite, deleted with it") {
    val notes = Seq(note("a"), note("b"), note("c"))
    val skip = new FakeTransport(Map("b" -> 7L))
    val s1 = LabelStudio.pushTasks(skip, notes, "label", "text")
    assert(s1 === LabelStudio.PushStats(imported = 2, deleted = 0,
      skipped = 1))
    assert(skip.deleted.isEmpty)
    val ids = skip.importedBatches.flatten.map(j =>
      mapper.readTree(j).get("data").get("unique_id").asText())
    assert(ids === Seq("a", "c"))

    val over = new FakeTransport(Map("b" -> 7L))
    val s2 = LabelStudio.pushTasks(over, notes, "label", "text",
      overwrite = true)
    assert(s2 === LabelStudio.PushStats(imported = 3, deleted = 1,
      skipped = 0))
    assert(over.deleted === Seq(7L))
  }

  test("searches and imports are batched to the server limits") {
    val notes = (1 to 1100).map(i => note(s"n$i"))
    val t = new FakeTransport()
    LabelStudio.pushTasks(t, notes, "label", "text")
    assert(t.searchBatchSizes.toSeq === Seq(500, 500, 100))
    assert(t.importedBatches.map(_.size).toSeq === Seq(300, 300, 300, 200))
  }
}

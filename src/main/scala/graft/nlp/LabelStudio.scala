package graft.nlp

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Chart-review upload to Label Studio (SURVEY §2.2 K11; reference:
  * cumulus_etl/upload_notes/labelstudio.py).
  *
  * The data plane — building import-task payloads from notes, grouping
  * highlight spans into predictions, sublabel data columns, the hidden
  * `_philter` prediction layer, skip-vs-overwrite reconciliation and
  * request batching — is pure and tested here. The HTTP boundary is a
  * three-method [[LabelStudioTransport]] trait; a production deployment
  * implements it with any HTTP client against the public Label Studio
  * API, tests use an in-memory fake.
  */
object LabelStudio {

  /** One labeled span (labelstudio.py:28-36). */
  final case class Highlight(
      label: String,
      begin: Int,
      end: Int,
      origin: String,
      sublabelName: Option[String] = None,
      sublabelValue: Option[String] = None
  )

  /** Everything Label Studio needs for one (possibly grouped) note
    * (labelstudio.py:39-67).
    */
  final case class LsNote(
      uniqueId: String,
      patientId: String,
      anonPatientId: String,
      encounterId: Option[String],
      anonEncounterId: Option[String],
      text: String,
      date: Option[String] = None,
      docMappings: Seq[(String, String)] = Nil,
      docSpans: Seq[(String, (Int, Int))] = Nil,
      highlights: Seq[Highlight] = Nil,
      philterSpans: Seq[(Int, Int)] = Nil
  )

  /** The HTTP boundary (push_tasks' three server interactions,
    * labelstudio.py:77-126). Payloads are the JSON strings built by
    * [[formatTask]].
    */
  trait LabelStudioTransport {
    /** unique_id → server task id for tasks that already exist. */
    def searchExisting(uniqueIds: Seq[String]): Map[String, Long]
    def deleteTask(taskId: Long): Unit
    def importTasks(batch: Seq[String]): Unit
  }

  final case class PushStats(imported: Int, deleted: Int, skipped: Int)

  /** Import batches of 300 ("I've seen batches of 700 fail, but 600
    * succeed", labelstudio.py:98-100) and existence searches of 500 ids
    * (URI-length guard, labelstudio.py:107-112).
    */
  val ImportBatchSize = 300
  val SearchBatchSize = 500

  private val NonAlphanum = "[^a-z0-9]".r
  private val Underscores = "_+".r

  /** push_tasks (labelstudio.py:77-103): find existing tasks by
    * unique_id; with overwrite delete + re-import them, without it skip
    * them; import the rest in bounded batches.
    */
  def pushTasks(
      transport: LabelStudioTransport,
      notes: Seq[LsNote],
      labelsName: String,
      toName: String,
      overwrite: Boolean = false
  ): PushStats = {
    val existing = notes.map(_.uniqueId).distinct
      .grouped(SearchBatchSize)
      .foldLeft(Map.empty[String, Long])((acc, b) =>
        acc ++ transport.searchExisting(b))
    val (deleted, toPush) =
      if (existing.isEmpty) (0, notes)
      else if (overwrite) {
        existing.values.foreach(transport.deleteTask)
        (existing.size, notes)
      } else (0, notes.filterNot(n => existing.contains(n.uniqueId)))
    toPush
      .map(n => formatTask(n, labelsName, toName))
      .grouped(ImportBatchSize)
      .foreach(transport.importTasks)
    PushStats(
      imported = toPush.size,
      deleted = deleted,
      skipped = notes.size - toPush.size)
  }

  /** _format_task_for_note (labelstudio.py:157-181): the task `data`
    * block plus highlight + philter prediction layers, as one JSON
    * object ready for the import API.
    */
  def formatTask(note: LsNote, labelsName: String, toName: String): String = {
    val mapper = new ObjectMapper()
    val task = mapper.createObjectNode()
    val data = task.putObject("data")
    data.put("text", note.text)
    data.put("unique_id", note.uniqueId)
    data.put("patient_id", note.patientId)
    data.put("anon_patient_id", note.anonPatientId)
    note.encounterId.fold(data.putNull("encounter_id"): Unit)(v =>
      data.put("encounter_id", v): Unit)
    note.anonEncounterId.fold(data.putNull("anon_encounter_id"): Unit)(v =>
      data.put("anon_encounter_id", v): Unit)
    note.date.fold(data.putNull("date"): Unit)(v =>
      data.put("date", v): Unit)
    val mappings = data.putObject("docref_mappings")
    note.docMappings.foreach { case (k, v) => mappings.put(k, v) }
    val spans = data.putObject("docref_spans")
    note.docSpans.foreach { case (k, (b, e)) =>
      val arr = spans.putArray(k); arr.add(b); arr.add(e)
    }
    val predictions = task.putArray("predictions")

    // --- highlight predictions, grouped by (label, span, origin) with
    // sublabel fan-out (labelstudio.py:243-291)
    val grouped = mutable.LinkedHashMap[(String, Int, Int, String),
      mutable.LinkedHashMap[Option[String], mutable.Buffer[Option[String]]]]()
    note.highlights.foreach { h =>
      grouped
        .getOrElseUpdate((h.label, h.begin, h.end, h.origin),
          mutable.LinkedHashMap())
        .getOrElseUpdate(h.sublabelName, mutable.Buffer())
        .append(h.sublabelValue)
    }
    // (label, sublabelName) -> (value, casefolded text) -> text
    val sublabelCols = mutable.LinkedHashMap[(String, String),
      mutable.Map[(String, String), String]]()
    val byOrigin = mutable.LinkedHashMap[String, ArrayNode]()
    grouped.foreach { case ((label, begin, end, origin), sublabels) =>
      val result = byOrigin.getOrElseUpdate(origin, {
        val p = predictions.addObject()
        p.put("model_version", origin)
        p.putArray("result")
      })
      val labelId = md5Hex(s"${label}__($begin, $end)__$origin")
      val text = note.text.substring(begin, end)
      result.add(matchNode(mapper, labelsName, toName, begin, end, text,
        Seq(label), Some(labelId)))
      sublabels.foreach {
        case (Some(subName), values) =>
          result.add(matchNode(mapper, subName, toName, begin, end, text,
            values.flatten.toSeq, Some(labelId)))
          val vals = sublabelCols.getOrElseUpdate((label, subName),
            mutable.LinkedHashMap())
          values.flatten.foreach(v =>
            vals((v, text.toLowerCase)) = text)
        case _ => // parent label only
      }
    }

    // dynamic-label config support: data[labelsName] lists used labels
    // (labelstudio.py:339-355)
    val usedLabels = note.highlights.map(_.label).distinct.sorted
    val labelArr = data.putArray(labelsName)
    usedLabels.foreach(l => labelArr.addObject().put("value", l))

    // sublabel data columns with slugged names (labelstudio.py:295-315)
    sublabelCols.foreach { case ((label, subName), valsWithText) =>
      val trimmedSub = if (subName.startsWith(s"$label "))
        subName.drop(label.length + 1) else subName
      var slug = if (trimmedSub.nonEmpty && label != trimmedSub)
        s"${label}_$trimmedSub" else label
      slug = NonAlphanum.replaceAllIn(slug.toLowerCase, "_")
      slug = Underscores.replaceAllIn(slug, "_")
      val keys = valsWithText.keys.toSeq.sorted
      data.put(s"${slug}_label", keys.map(_._1.trim).mkString(" ✦ "))
      data.put(s"${slug}_text", keys.map(k => valsWithText(k).trim)
        .mkString(" ✦ "))
    }

    // --- hidden philter layer (labelstudio.py:317-337)
    if (note.philterSpans.nonEmpty) {
      val p = predictions.addObject()
      p.put("model_version", "Philter")
      val result = p.putArray("result")
      note.philterSpans.sorted.foreach { case (b, e) =>
        result.add(matchNode(mapper, labelsName, toName, b, e,
          note.text.substring(b, e), Seq("_philter"), None))
      }
    }
    mapper.writeValueAsString(task)
  }

  /** _format_match for a `Labels`-type tag (labelstudio.py:183-241). */
  private def matchNode(
      mapper: ObjectMapper,
      fromName: String,
      toName: String,
      begin: Int,
      end: Int,
      text: String,
      labels: Seq[String],
      labelId: Option[String]
  ): ObjectNode = {
    val m = mapper.createObjectNode()
    m.put("from_name", fromName)
    m.put("to_name", toName)
    m.put("type", "labels")
    labelId.foreach(id => m.put("id", id))
    val value = m.putObject("value")
    value.put("start", begin)
    value.put("end", end)
    value.put("score", 1.0)
    value.put("text", text)
    val arr = value.putArray("labels")
    labels.foreach(arr.add)
    m
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
}

package graft.nlp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The covid-symptom NLP study (reference:
  * etl/studies/covid_symptom/covid_tasks.py + covid_ctakes.py): select
  * emergency-department DocumentReferences, run their notes through a
  * cTAKES-style sign/symptom extractor, keep positive covid-CUI
  * matches, double-check polarity with a cNLP model, and emit one row
  * per surviving match (or a single null-match row per processed note,
  * so downstream SQL can tell "processed, no symptoms" from "never
  * seen").
  *
  * NLP services live behind two small traits, called from ONE
  * `mapPartitions` pass (executor-side HTTP in production, fakes in
  * tests); everything else is plain column work.
  */
object CovidSymptom {

  /** ED note codings (covid_tasks.py:18-62: LOINC + two site systems). */
  val EdCodes: Map[String, Set[String]] = Map(
    "http://loinc.org" -> Set(
      "18842-5", "28568-4", "34111-5", "34878-9", "51846-4", "54094-8",
      "57053-1", "57054-9", "59258-4", "60280-5", "68552-9", "74187-6",
      "74211-4"),
    "http://cumulus.smarthealthit.org/i2b2" -> Set(
      "NOTE:3710480", "NOTE:3807712", "NOTE:149798455", "NOTE:159552404",
      "NOTE:189094576", "NOTE:189094619", "NOTE:189094644",
      "NOTE:318198107", "NOTE:318198110", "NOTE:318198113"),
    "https://fhir.cerner.com/96976f07-eccb-424c-9825-e0d0b887148b/codeSet/72" ->
      Set("3710480", "3807712", "149798455", "159552404", "189094576",
        "189094619", "189094644", "318198107", "318198110", "318198113")
  )

  final case class ConceptAttr(code: String, cui: String,
      codingScheme: String, tui: String)

  final case class SymptomMatch(begin: Int, end: Int, text: String,
      polarity: Int, conceptAttributes: Seq[ConceptAttr], `type`: String)

  /** cTAKES boundary: positive sign/symptom mentions for one note. */
  trait CtakesClient extends Serializable {
    def signSymptoms(note: String): Seq[SymptomMatch]
  }

  /** cNLP polarity boundary: one polarity per span (0 = positive,
    * matching ctakesclient's Polarity.pos ordinal use).
    */
  trait PolarityClient extends Serializable {
    def polarities(note: String, spans: Seq[(Int, Int)]): Seq[Int]
  }

  final case class SymptomRow(
      id: String,
      docref_id: String,
      encounter_id: String,
      subject_id: String,
      generated_on: String,
      task_version: Int,
      `match`: Option[SymptomMatch])

  /** Run the study over SCRUBBED DocumentReferences.
    *
    * @param covidCuis  covid symptom CUI allow-list (the reference loads
    *                   ctakesclient's BSV; supplied by the caller here)
    * @param generatedOn pinned timestamp (the reference freezes the
    *                    clock in tests; production passes now())
    */
  def extract(
      docrefs: DataFrame,
      ctakes: CtakesClient,
      polarity: PolarityClient,
      covidCuis: Set[String],
      generatedOn: String,
      taskVersion: Int = 4
  ): DataFrame = {
    val spark = docrefs.sparkSession
    import spark.implicits._

    // "we check both type and category for safety" (covid_tasks.py:71-79);
    // tolerate either field being absent from this export's schema
    val present = docrefs.columns.toSet
    val typeMatch =
      if (present("type")) NoteOps.codingMatches(col("type.coding"), EdCodes)
      else lit(false)
    val catMatch =
      if (present("category"))
        NoteOps.codingMatches(flatten(col("category.coding")), EdCodes)
      else lit(false)
    val ed = docrefs.filter(
      coalesce(typeMatch, lit(false)) || coalesce(catMatch, lit(false)))

    val notes: Dataset[(String, String, String, String)] = ed
      .select(
        col("id").cast("string"),
        col("context.encounter")(0).getField("reference").cast("string"),
        col("subject.reference").cast("string"),
        NoteOps.noteText(col("content")).cast("string"))
      .as[(String, String, String, String)]

    notes.mapPartitions { rows =>
      rows.flatMap { case (docrefId, encRef, subjRef, note) =>
        if (note == null || encRef == null || subjRef == null) Iterator.empty
        else {
          val encounterId = encRef.split("/").last
          val subjectId = subjRef.split("/").last
          // covid-CUI filter, then the reference's regression-stable
          // ordering: stable sort by first concept code, then by begin
          // (primary sort applied LAST, covid_ctakes.py:78-82)
          val matches = ctakes.signSymptoms(note)
            .filter(_.conceptAttributes.exists(a => covidCuis(a.cui)))
            .sortBy(m => m.conceptAttributes.headOption.map(_.code)
              .getOrElse(""))
            .sortBy(_.begin)
          val pols = polarity.polarities(note,
            matches.map(m => (m.begin, m.end)))
          val positive = matches.zipWithIndex
            .filter { case (_, i) => pols(i) == 0 }
            .map { case (m, i) =>
              SymptomRow(s"$docrefId.$i", docrefId, encounterId,
                subjectId, generatedOn, taskVersion, Some(m))
            }
          if (positive.nonEmpty) positive.iterator
          else Iterator(SymptomRow(s"$docrefId.0", docrefId, encounterId,
            subjectId, generatedOn, taskVersion, None))
        }
      }
    }.toDF()
  }
}

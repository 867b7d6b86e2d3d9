package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The de-identification scalar function library (SURVEY §2.4 F1-F14),
  * expressed as codegen-friendly Column trees. The keyed hash (F1) lives
  * in [[HmacSha256Hex]]; everything else is builtins.
  */
object DeidFunctions {

  /** F3: date generalization — keep the year (first 4 chars of a FHIR
    * date string). reference: deid/scrubber.py:258-259.
    */
  def yearOf(c: Column): Column = substring(c, 1, 4)

  /** F9: datetime → date chop (first 10 chars).
    * reference: loaders/i2b2/transform.py:318-326.
    */
  def dateChop(c: Column): Column = substring(c, 1, 10)

  /** Low-population zip3 prefixes that must be fully generalized.
    * reference: deid/scrubber.py:393-410.
    */
  val RestrictedZips: Seq[String] = Seq("036", "059", "102", "203", "205",
    "369", "556", "692", "821", "823", "878", "879", "884", "893")

  /** F4: zip generalization — keep the 3-digit prefix (000 if
    * restricted), zero remaining digits, keep non-digits (non-US zips).
    * reference: deid/scrubber.py:411-419.
    */
  def zipGeneralize(c: Column): Column = {
    val prefix = substring(c, 1, 3)
    val safePrefix =
      when(prefix.isin(RestrictedZips: _*), lit("000")).otherwise(prefix)
    val suffix = c.substr(lit(4), greatest(length(c) - 3, lit(0)))
    concat(safePrefix, translate(suffix, "123456789", "000000000"))
  }

  /** F8: whitespace strip; empty string → null ("match MS deid tool
    * behavior", deid/scrubber.py:236-243).
    */
  def cleanString(c: Column): Column = nullif(trim(c), lit(""))

  /** F11: content checksum for cache keys (nlp/utils.py:93-94). */
  def contentChecksum(c: Column): Column = sha2(c, 256)

  /** F2: anonymize a FHIR reference string "Type/id" → "Type/hmac(id)".
    * The type/id split is on the FIRST '/' OR '?' (the reference's
    * RELATIVE_SEPARATOR_REGEX, fhir/fhir_utils.py:13-14,68), so
    * conditional references like "Practitioner?identifier=…" hash the
    * whole search clause and re-emit as "Practitioner/{hash}" — exactly
    * the reference's unref→ref round trip. Contained refs ("#id") keep
    * their prefix with the bare id hashed; bare ids hash directly.
    * reference: deid/scrubber.py:377-389.
    */
  def anonRef(salt: Array[Byte], ref: Column): Column = {
    val slash = instr(ref, "/")
    val question = instr(ref, "?")
    val sep = when(
      question > 0 && (slash === 0 || question < slash), question)
      .otherwise(slash)
    val refType = ref.substr(lit(1), sep - 1)
    val bareId = ref.substr(sep + 1, length(ref))
    when(ref.isNull, lit(null))
      .when(
        ref.startsWith("#"),
        concat(lit("#"), HmacSha256Hex(salt, ref.substr(lit(2), length(ref))))
      )
      .when(sep > 0, concat(refType, lit("/"), HmacSha256Hex(salt, bareId)))
      .otherwise(HmacSha256Hex(salt, ref))
  }

  /** F7: Epic custom code-system guard — inside the Epic extension-point
    * OID, strip display when no code / code "0" / non-numeric code, and
    * strip non-numeric codes entirely (free-text PHI risk). Returns a
    * struct(code, display) of the cleaned pair.
    * reference: deid/scrubber.py:421-467.
    */
  def checkSystem(system: Column, code: Column, display: Column): Column = {
    val inEpic = system.isNotNull &&
      system.startsWith("urn:oid:1.2.840.114350.")
    val numericCode = code.rlike("^-?[0-9]+$")
    val codeOk = !inEpic || code.isNull || numericCode
    val displayOk = !inEpic ||
      (code.isNotNull && numericCode && !(code === "0" && display.isNotNull))
    struct(
      when(codeOk, code).otherwise(lit(null)).as("code"),
      when(codeOk && displayOk, display).otherwise(lit(null)).as("display")
    )
  }

  /** F13: concept display text — `text` else the first coding display.
    * reference: fhir/fhir_utils.py:155-181.
    */
  def conceptDisplay(concept: Column): Column =
    coalesce(
      concept.getField("text"),
      get(
        filter(concept.getField("coding"),
          c => c.getField("display").isNotNull),
        lit(0)
      ).getField("display")
    )

  /** F14: human-name priority — prefer use=official > usual > anything.
    * Input: array of name structs {use, text}; output: best text.
    * reference: fhir/fhir_utils.py:184-203.
    */
  def bestHumanName(names: Column): Column = {
    val prioritized = array_sort(
      transform(
        names,
        n =>
          struct(
            when(n.getField("use") === "official", lit(0))
              .when(n.getField("use") === "usual", lit(1))
              .otherwise(lit(2))
              .as("prio"),
            n.getField("text").as("text")
          )
      )
    )
    get(prioritized, lit(0)).getField("text")
  }

  /** F10: graceful partial FHIR date parse — "1980" and "1980-12" resolve
    * to the first day. reference: fhir/fhir_utils.py:82-106.
    */
  def parseFhirDate(c: Column): Column = {
    // pad by observed precision (ANSI mode: to_date throws on bad input,
    // so dispatch on length instead of a try/coalesce ladder)
    val padded = when(length(c) === 4, concat(c, lit("-01-01")))
      .when(length(c) === 7, concat(c, lit("-01")))
      .otherwise(substring(c, 1, 10))
    to_date(padded, "yyyy-MM-dd")
  }

  /** F5: masked-field marker — the data-absent-reason extension struct
    * the scrubber writes in place of masked values
    * (deid/scrubber.py:320-335).
    */
  def maskedExtension: Column =
    array(
      struct(
        lit("http://hl7.org/fhir/StructureDefinition/data-absent-reason")
          .as("url"),
        lit("masked").as("valueCode")
      )
    )
}

package graft.fhir

import org.apache.spark.sql.types._

/** Spec-derived wide StructTypes for the engine's resource set — the
  * equivalent of the reference's external `cumulus-fhir-support` schema
  * catalog (SURVEY §1.2, §7.4 risk 1): reading NDJSON with an explicit
  * schema pins column sets independent of which fields a given export
  * happens to exercise ("push schema changes up so downstream SQL can be
  * dumber", etl/tasks/base.py:139-144), and lets the JSON scan prune.
  *
  * Field shapes follow the public FHIR R4 spec (hl7.org/fhir/R4),
  * depth-bounded like the reference's catalog.
  */
object FhirSchemas {

  private val extensionType: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("valueCode", StringType),
    StructField("valueString", StringType),
    StructField("valueCoding", StructType(Seq(
      StructField("system", StringType),
      StructField("code", StringType),
      StructField("display", StringType)
    ))),
    // one bounded level of nested extension (us-core race/ethnicity use it)
    StructField("extension", ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("valueCode", StringType),
      StructField("valueString", StringType),
      StructField("valueCoding", StructType(Seq(
        StructField("system", StringType),
        StructField("code", StringType),
        StructField("display", StringType)
      )))
    ))))
  ))

  private val codingType = StructType(Seq(
    StructField("system", StringType),
    StructField("version", StringType),
    StructField("code", StringType),
    StructField("display", StringType),
    StructField("userSelected", BooleanType)
  ))

  private val codeableConceptType = StructType(Seq(
    StructField("coding", ArrayType(codingType)),
    StructField("text", StringType)
  ))

  private val referenceType = StructType(Seq(
    StructField("reference", StringType),
    StructField("type", StringType),
    StructField("display", StringType)
  ))

  private val periodType = StructType(Seq(
    StructField("start", StringType),
    StructField("end", StringType)
  ))

  private val quantityType = StructType(Seq(
    StructField("value", DoubleType),
    StructField("comparator", StringType),
    StructField("unit", StringType),
    StructField("system", StringType),
    StructField("code", StringType)
  ))

  private val identifierType = StructType(Seq(
    StructField("use", StringType),
    StructField("system", StringType),
    StructField("value", StringType),
    StructField("type", codeableConceptType),
    StructField("period", StructType(Seq(
      StructField("start", StringType),
      StructField("end", StringType)
    ))),
    StructField("assigner", StructType(Seq(
      StructField("reference", StringType),
      StructField("type", StringType),
      StructField("display", StringType)
    )))
  ))

  private val ratioType = StructType(Seq(
    StructField("numerator", StructType(Seq(
      StructField("value", DoubleType),
      StructField("unit", StringType),
      StructField("system", StringType),
      StructField("code", StringType)
    ))),
    StructField("denominator", StructType(Seq(
      StructField("value", DoubleType),
      StructField("unit", StringType),
      StructField("system", StringType),
      StructField("code", StringType)
    )))
  ))

  private val metaType = StructType(Seq(
    StructField("lastUpdated", StringType),
    StructField("profile", ArrayType(StringType)),
    StructField("source", StringType),
    StructField("versionId", StringType),
    StructField("security", ArrayType(codingType)),
    StructField("tag", ArrayType(codingType))
  ))

  private val addressType = StructType(Seq(
    StructField("use", StringType),
    StructField("type", StringType),
    StructField("line", ArrayType(StringType)),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postalCode", StringType),
    StructField("country", StringType)
  ))

  private val humanNameType = StructType(Seq(
    StructField("use", StringType),
    StructField("text", StringType),
    StructField("family", StringType),
    StructField("given", ArrayType(StringType))
  ))

  private val attachmentType = StructType(Seq(
    StructField("contentType", StringType),
    StructField("language", StringType),
    StructField("data", StringType),
    StructField("url", StringType),
    StructField("size", LongType),
    StructField("creation", StringType)
  ))

  /** BackboneElement base fields: nested resource parts can carry
    * extensions AND meaning-altering modifierExtensions at any depth
    * (hl7.org/fhir/R4/backboneelement.html); the schema must surface
    * them so the scrub compiler's reject predicate can see unknown
    * nested modifiers (scrubber.py rejects the whole resource).
    */
  private val backboneBase: Seq[StructField] = Seq(
    StructField("extension", ArrayType(extensionType)),
    StructField("modifierExtension", ArrayType(extensionType))
  )

  private def backbone(fields: StructField*): StructType =
    StructType(backboneBase ++ fields)

  private def resourceBase(fields: StructField*): StructType =
    StructType(Seq(
      StructField("resourceType", StringType),
      StructField("id", StringType),
      StructField("meta", metaType),
      StructField("implicitRules", StringType),
      StructField("language", StringType),
      StructField("extension", ArrayType(extensionType)),
      StructField("modifierExtension", ArrayType(extensionType))
    ) ++ fields)

  val patient: StructType = resourceBase(
    StructField("identifier", ArrayType(identifierType)),
    StructField("active", BooleanType),
    StructField("name", ArrayType(humanNameType)),
    StructField("gender", StringType),
    StructField("birthDate", StringType),
    StructField("deceasedBoolean", BooleanType),
    StructField("deceasedDateTime", StringType),
    StructField("address", ArrayType(addressType)),
    StructField("maritalStatus", codeableConceptType),
    StructField("multipleBirthBoolean", BooleanType),
    StructField("multipleBirthInteger", IntegerType),
    StructField("generalPractitioner", ArrayType(referenceType)),
    StructField("managingOrganization", referenceType)
  )

  val encounter: StructType = resourceBase(
    StructField("identifier", ArrayType(identifierType)),
    StructField("status", StringType),
    StructField("class", codingType),
    StructField("type", ArrayType(codeableConceptType)),
    StructField("serviceType", codeableConceptType),
    StructField("priority", codeableConceptType),
    StructField("subject", referenceType),
    StructField("period", periodType),
    StructField("reasonCode", ArrayType(codeableConceptType)),
    StructField("serviceProvider", referenceType)
  )

  val observation: StructType = resourceBase(
    StructField("status", StringType),
    StructField("basedOn", ArrayType(referenceType)),
    StructField("partOf", ArrayType(referenceType)),
    StructField("category", ArrayType(codeableConceptType)),
    StructField("code", codeableConceptType),
    StructField("subject", referenceType),
    StructField("encounter", referenceType),
    StructField("effectiveDateTime", StringType),
    StructField("effectivePeriod", periodType),
    StructField("issued", StringType),
    StructField("performer", ArrayType(referenceType)),
    StructField("valueQuantity", quantityType),
    StructField("valueCodeableConcept", codeableConceptType),
    StructField("valueString", StringType),
    StructField("valueBoolean", BooleanType),
    StructField("valueDateTime", StringType),
    StructField("dataAbsentReason", codeableConceptType),
    StructField("interpretation", ArrayType(codeableConceptType)),
    StructField("bodySite", codeableConceptType),
    StructField("method", codeableConceptType)
  )

  val condition: StructType = resourceBase(
    StructField("clinicalStatus", codeableConceptType),
    StructField("verificationStatus", codeableConceptType),
    StructField("category", ArrayType(codeableConceptType)),
    StructField("severity", codeableConceptType),
    StructField("code", codeableConceptType),
    StructField("bodySite", ArrayType(codeableConceptType)),
    StructField("subject", referenceType),
    StructField("encounter", referenceType),
    StructField("onsetDateTime", StringType),
    StructField("abatementDateTime", StringType),
    StructField("recordedDate", StringType)
  )

  val documentReference: StructType = resourceBase(
    StructField("status", StringType),
    StructField("docStatus", StringType),
    StructField("type", codeableConceptType),
    StructField("category", ArrayType(codeableConceptType)),
    StructField("subject", referenceType),
    StructField("date", StringType),
    StructField("author", ArrayType(referenceType)),
    StructField("custodian", referenceType),
    StructField("context", backbone(
      StructField("encounter", ArrayType(referenceType)),
      StructField("period", periodType),
      StructField("facilityType", codeableConceptType),
      StructField("practiceSetting", codeableConceptType)
    )),
    StructField("content", ArrayType(backbone(
      StructField("attachment", attachmentType),
      StructField("format", codingType)
    )))
  )

  val medicationRequest: StructType = resourceBase(
    StructField("status", StringType),
    StructField("statusReason", codeableConceptType),
    StructField("intent", StringType),
    StructField("category", ArrayType(codeableConceptType)),
    StructField("priority", StringType),
    StructField("reportedBoolean", BooleanType),
    StructField("medicationCodeableConcept", codeableConceptType),
    StructField("medicationReference", referenceType),
    StructField("subject", referenceType),
    StructField("encounter", referenceType),
    StructField("authoredOn", StringType),
    StructField("requester", referenceType),
    StructField("reasonCode", ArrayType(codeableConceptType)),
    StructField("courseOfTherapyType", codeableConceptType)
  )

  val procedure: StructType = resourceBase(
    StructField("status", StringType),
    StructField("statusReason", codeableConceptType),
    StructField("category", codeableConceptType),
    StructField("code", codeableConceptType),
    StructField("subject", referenceType),
    StructField("encounter", referenceType),
    StructField("performedDateTime", StringType),
    StructField("performedPeriod", periodType),
    StructField("recorder", referenceType),
    StructField("performer", ArrayType(backbone(
      StructField("function", codeableConceptType),
      StructField("actor", referenceType)
    ))),
    StructField("reasonCode", ArrayType(codeableConceptType)),
    StructField("bodySite", ArrayType(codeableConceptType)),
    StructField("outcome", codeableConceptType)
  )

  val immunization: StructType = resourceBase(
    StructField("status", StringType),
    StructField("statusReason", codeableConceptType),
    StructField("vaccineCode", codeableConceptType),
    StructField("patient", referenceType),
    StructField("encounter", referenceType),
    StructField("occurrenceDateTime", StringType),
    StructField("primarySource", BooleanType),
    StructField("site", codeableConceptType),
    StructField("route", codeableConceptType),
    StructField("doseQuantity", quantityType)
  )

  val allergyIntolerance: StructType = resourceBase(
    StructField("clinicalStatus", codeableConceptType),
    StructField("verificationStatus", codeableConceptType),
    StructField("type", StringType),
    StructField("category", ArrayType(StringType)),
    StructField("criticality", StringType),
    StructField("code", codeableConceptType),
    StructField("patient", referenceType),
    StructField("encounter", referenceType),
    StructField("onsetDateTime", StringType),
    StructField("recordedDate", StringType),
    StructField("recorder", referenceType),
    StructField("asserter", referenceType),
    StructField("lastOccurrence", StringType)
  )

  private val dosageType = backbone(
    StructField("sequence", IntegerType),
    StructField("timing", backbone(
      StructField("event", ArrayType(StringType)),
      StructField("code", codeableConceptType)
    )),
    StructField("asNeededBoolean", BooleanType),
    StructField("site", codeableConceptType),
    StructField("route", codeableConceptType),
    StructField("method", codeableConceptType),
    StructField("doseAndRate", ArrayType(StructType(Seq(
      StructField("type", codeableConceptType),
      StructField("doseQuantity", quantityType)
    ))))
  )

  val device: StructType = resourceBase(
    StructField("udiCarrier", ArrayType(backbone(
      StructField("deviceIdentifier", StringType),
      StructField("issuer", StringType),
      StructField("jurisdiction", StringType),
      StructField("carrierAIDC", StringType),
      StructField("carrierHRF", StringType),
      StructField("entryType", StringType)
    ))),
    StructField("status", StringType),
    StructField("statusReason", ArrayType(codeableConceptType)),
    StructField("distinctIdentifier", StringType),
    StructField("manufacturer", StringType),
    StructField("manufactureDate", StringType),
    StructField("expirationDate", StringType),
    StructField("lotNumber", StringType),
    StructField("serialNumber", StringType),
    StructField("deviceName", ArrayType(backbone(
      StructField("name", StringType),
      StructField("type", StringType)
    ))),
    StructField("modelNumber", StringType),
    StructField("partNumber", StringType),
    StructField("type", codeableConceptType),
    StructField("patient", referenceType),
    StructField("owner", referenceType),
    StructField("location", referenceType),
    StructField("parent", referenceType)
  )

  val diagnosticReport: StructType = resourceBase(
    StructField("basedOn", ArrayType(referenceType)),
    StructField("status", StringType),
    StructField("category", ArrayType(codeableConceptType)),
    StructField("code", codeableConceptType),
    StructField("subject", referenceType),
    StructField("encounter", referenceType),
    StructField("effectiveDateTime", StringType),
    StructField("effectivePeriod", periodType),
    StructField("issued", StringType),
    StructField("performer", ArrayType(referenceType)),
    StructField("resultsInterpreter", ArrayType(referenceType)),
    StructField("specimen", ArrayType(referenceType)),
    StructField("result", ArrayType(referenceType)),
    StructField("conclusionCode", ArrayType(codeableConceptType)),
    StructField("presentedForm", ArrayType(attachmentType))
  )

  val episodeOfCare: StructType = resourceBase(
    StructField("status", StringType),
    StructField("statusHistory", ArrayType(backbone(
      StructField("status", StringType),
      StructField("period", periodType)
    ))),
    StructField("type", ArrayType(codeableConceptType)),
    StructField("diagnosis", ArrayType(backbone(
      StructField("condition", referenceType),
      StructField("role", codeableConceptType),
      StructField("rank", IntegerType)
    ))),
    StructField("patient", referenceType),
    StructField("managingOrganization", referenceType),
    StructField("period", periodType),
    StructField("careManager", referenceType),
    StructField("team", ArrayType(referenceType))
  )

  val location: StructType = resourceBase(
    StructField("identifier", ArrayType(identifierType)),
    StructField("status", StringType),
    StructField("name", StringType),
    StructField("alias", ArrayType(StringType)),
    StructField("mode", StringType),
    StructField("type", ArrayType(codeableConceptType)),
    StructField("address", addressType),
    StructField("physicalType", codeableConceptType),
    StructField("managingOrganization", referenceType),
    StructField("partOf", referenceType)
  )

  val medication: StructType = resourceBase(
    StructField("code", codeableConceptType),
    StructField("status", StringType),
    StructField("manufacturer", referenceType),
    StructField("form", codeableConceptType),
    StructField("amount", ratioType),
    StructField("ingredient", ArrayType(backbone(
      StructField("itemCodeableConcept", codeableConceptType),
      StructField("itemReference", referenceType),
      StructField("isActive", BooleanType),
      StructField("strength", ratioType)
    ))),
    StructField("batch", backbone(
      StructField("lotNumber", StringType),
      StructField("expirationDate", StringType)
    ))
  )

  val medicationDispense: StructType = resourceBase(
    StructField("status", StringType),
    StructField("category", codeableConceptType),
    StructField("medicationCodeableConcept", codeableConceptType),
    StructField("medicationReference", referenceType),
    StructField("subject", referenceType),
    StructField("context", referenceType),
    StructField("performer", ArrayType(backbone(
      StructField("function", codeableConceptType),
      StructField("actor", referenceType)
    ))),
    StructField("quantity", quantityType),
    StructField("daysSupply", quantityType),
    StructField("whenPrepared", StringType),
    StructField("whenHandedOver", StringType),
    StructField("destination", referenceType),
    StructField("receiver", ArrayType(referenceType)),
    StructField("dosageInstruction", ArrayType(dosageType)),
    StructField("substitution", backbone(
      StructField("wasSubstituted", BooleanType),
      StructField("type", codeableConceptType),
      StructField("reason", ArrayType(codeableConceptType)),
      StructField("responsibleParty", ArrayType(referenceType))
    ))
  )

  val organization: StructType = resourceBase(
    StructField("identifier", ArrayType(identifierType)),
    StructField("active", BooleanType),
    StructField("type", ArrayType(codeableConceptType)),
    StructField("name", StringType),
    StructField("alias", ArrayType(StringType)),
    StructField("address", ArrayType(addressType)),
    StructField("partOf", referenceType),
    StructField("contact", ArrayType(backbone(
      StructField("purpose", codeableConceptType),
      StructField("address", addressType)
    )))
  )

  val practitioner: StructType = resourceBase(
    StructField("identifier", ArrayType(identifierType)),
    StructField("active", BooleanType),
    StructField("address", ArrayType(addressType)),
    StructField("gender", StringType),
    StructField("birthDate", StringType),
    StructField("qualification", ArrayType(backbone(
      StructField("identifier", ArrayType(identifierType)),
      StructField("code", codeableConceptType),
      StructField("period", periodType),
      StructField("issuer", referenceType)
    ))),
    StructField("communication", ArrayType(codeableConceptType))
  )

  val practitionerRole: StructType = resourceBase(
    StructField("identifier", ArrayType(identifierType)),
    StructField("active", BooleanType),
    StructField("period", periodType),
    StructField("practitioner", referenceType),
    StructField("organization", referenceType),
    StructField("code", ArrayType(codeableConceptType)),
    StructField("specialty", ArrayType(codeableConceptType)),
    StructField("location", ArrayType(referenceType))
  )

  val serviceRequest: StructType = resourceBase(
    StructField("basedOn", ArrayType(referenceType)),
    StructField("status", StringType),
    StructField("intent", StringType),
    StructField("category", ArrayType(codeableConceptType)),
    StructField("priority", StringType),
    StructField("doNotPerform", BooleanType),
    StructField("code", codeableConceptType),
    StructField("quantityQuantity", quantityType),
    StructField("subject", referenceType),
    StructField("encounter", referenceType),
    StructField("occurrenceDateTime", StringType),
    StructField("occurrencePeriod", periodType),
    StructField("authoredOn", StringType),
    StructField("requester", referenceType),
    StructField("performer", ArrayType(referenceType)),
    StructField("reasonCode", ArrayType(codeableConceptType)),
    StructField("bodySite", ArrayType(codeableConceptType))
  )

  val specimen: StructType = resourceBase(
    StructField("status", StringType),
    StructField("type", codeableConceptType),
    StructField("subject", referenceType),
    StructField("receivedTime", StringType),
    StructField("parent", ArrayType(referenceType)),
    StructField("request", ArrayType(referenceType)),
    StructField("collection", backbone(
      StructField("collector", referenceType),
      StructField("collectedDateTime", StringType),
      StructField("collectedPeriod", periodType),
      StructField("quantity", quantityType),
      StructField("method", codeableConceptType),
      StructField("bodySite", codeableConceptType)
    )),
    StructField("condition", ArrayType(codeableConceptType))
  )

  /** Catalog lookup; None → caller falls back to schema inference. */
  def forResource(resourceType: String): Option[StructType] =
    resourceType match {
      case "Patient" => Some(patient)
      case "Encounter" => Some(encounter)
      case "Observation" => Some(observation)
      case "Condition" => Some(condition)
      case "DocumentReference" => Some(documentReference)
      case "MedicationRequest" => Some(medicationRequest)
      case "Procedure" => Some(procedure)
      case "Immunization" => Some(immunization)
      case "AllergyIntolerance" => Some(allergyIntolerance)
      case "Device" => Some(device)
      case "DiagnosticReport" => Some(diagnosticReport)
      case "EpisodeOfCare" => Some(episodeOfCare)
      case "Location" => Some(location)
      case "Medication" => Some(medication)
      case "MedicationDispense" => Some(medicationDispense)
      case "Organization" => Some(organization)
      case "Practitioner" => Some(practitioner)
      case "PractitionerRole" => Some(practitionerRole)
      case "ServiceRequest" => Some(serviceRequest)
      case "Specimen" => Some(specimen)
      case _ => None
    }

  /** K7 (schema half): StructType → Athena/Hive DDL column clauses
    * (formats/nlp.py:95-135 handles exactly these types).
    */
  def toAthenaDdl(schema: StructType, tableName: String,
      location: String): String = {
    def sqlType(dt: DataType): String = dt match {
      case StringType => "STRING"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case DoubleType | FloatType => "DOUBLE"
      case BooleanType => "BOOLEAN"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case ArrayType(e, _) => s"ARRAY<${sqlType(e)}>"
      case st: StructType =>
        st.fields.map(f => s"${f.name}: ${sqlType(f.dataType)}")
          .mkString("STRUCT<", ", ", ">")
      case other =>
        throw new IllegalArgumentException(s"unsupported type $other")
    }
    val cols = schema.fields
      .map(f => s"  `${f.name}` ${sqlType(f.dataType)}")
      .mkString(",\n")
    s"""CREATE EXTERNAL TABLE IF NOT EXISTS `$tableName` (
       |$cols
       |)
       |STORED AS PARQUET
       |LOCATION '$location'""".stripMargin
  }
}

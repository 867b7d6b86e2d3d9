package graft.deid

/** Allow-list scrub policy model — the engine's equivalent of the
  * reference's scrub-rules.toml (cumulus_etl/deid/scrub-rules.toml:1-23
  * documents the action vocabulary; deid/scrubber.py:117-306 interprets
  * it). Type-directed: each FHIR element type declares its allowed
  * fields; unknown fields are dropped; `_extends` chains merge parent
  * rules. Expressed as a Scala DSL so the compiler gets a typed tree
  * instead of re-parsing TOML.
  */
object Rule {
  sealed trait Rule

  /** keep the leaf value (after whitespace/empty cleanup) */
  case object Val extends Rule

  /** drop the value (PHI), leaving null */
  case object Mask extends Rule

  /** mask unless the pipeline runs in NLP mode (clinical-note text) */
  case object MaskNote extends Rule

  /** pseudonymize a string id via the codebook hash */
  case object AnonId extends Rule

  /** rewrite "Type/id" reference strings with hashed ids */
  case object AnonRef extends Rule

  /** generalize a date to its year */
  case object Year extends Rule

  /** generalize a zip to its safe 3-digit prefix */
  case object Zip extends Rule

  /** free-text field: philter target when enabled, else kept */
  case object Philter extends Rule

  /** guard the leaf with the Epic custom-code-system check first
    * (scrub-rules.toml "check-system;val" / "check-system;philter",
    * scrubber.py _check_invalid_for_system): if the sibling `system` is
    * an Epic extension-point OID and the code/display pair looks like a
    * free-form customization, the value is dropped and the parent gains
    * a data-absent-reason extension; otherwise `inner` applies.
    */
  final case class CheckSystem(inner: Rule) extends Rule

  /** contained resources (scrub-rules `contained = "Resource"`): each
    * element is scrubbed under ITS OWN resourceType's policy, falling
    * back to the base Resource policy for types the allow-list doesn't
    * know (reference: _scrub_resource_node, scrubber.py:117-129)
    */
  case object Contained extends Rule

  /** descend using the named element type's policy; when `conditions`
    * is non-empty the node is kept only if each condition field's value
    * is in the allowed set (the reference's conditional sub-schemas,
    * e.g. "Identifier;system=http://hl7.org/fhir/sid/us-npi" —
    * scrubber.py:282-287 and :141-144: non-matching nodes are skipped)
    */
  final case class TypeRef(
      name: String,
      conditions: Map[String, Set[String]] = Map.empty
  ) extends Rule
}

final case class ElementPolicy(
    extendsType: Option[String],
    fields: Map[String, Rule.Rule]
)

final case class ScrubPolicy(
    types: Map[String, ElementPolicy],
    allowedExtensions: Set[String],
    allowedModifierExtensions: Set[String],
    /** Known-but-unwanted urls: dropped like unknown extensions but NOT
      * counted in the census (scrub-rules.toml [extensions] `ignored`).
      */
    ignoredExtensions: Set[String] = Set.empty
) {

  /** Field rules for a type with the `_extends` chain folded in
    * (child wins).
    */
  def resolve(typeName: String): Map[String, Rule.Rule] =
    types.get(typeName) match {
      case None => Map.empty
      case Some(p) =>
        p.extendsType.map(resolve).getOrElse(Map.empty) ++ p.fields
    }

  /** Concrete resource types: policies whose `_extends` chain reaches
    * Resource (used to dispatch contained elements by resourceType).
    */
  lazy val resourceTypeNames: Set[String] = {
    def reachesResource(name: String): Boolean =
      name == "Resource" || types.get(name).exists(
        _.extendsType.exists(reachesResource))
    types.keySet
      .filter(t => t != "Resource" && t != "DomainResource" &&
        reachesResource(t))
  }
}

/** Default policy covering the engine's initial resource set. Field
  * lists follow the reference policy's choices for the same resources
  * (scrub-rules.toml [allowed.*] sections) re-expressed in the DSL.
  */
object DefaultScrubPolicy {
  import Rule._

  private val CC = TypeRef("CodeableConcept")
  private val Ref = TypeRef("Reference")
  private val Qty = TypeRef("Quantity")
  private val Per = TypeRef("Period")

  /** US-Core-sanctioned identifier systems for non-patient-linked
    * resources (scrub-rules.toml:418,605,657,675).
    */
  private val NpiIdentifier =
    TypeRef("Identifier", Map("system" ->
      Set("http://hl7.org/fhir/sid/us-npi")))
  private val OrgIdentifier =
    TypeRef("Identifier", Map("system" -> Set(
      "http://hl7.org/fhir/sid/us-npi",
      "urn:oid:2.16.840.1.113883.4.7",
      "urn:oid:2.16.840.1.113883.6.300")))

  val policy: ScrubPolicy = ScrubPolicy(
    types = Map(
      "Resource" -> ElementPolicy(None, Map(
        "resourceType" -> Val,
        "id" -> AnonId,
        "meta" -> TypeRef("Meta"),
        "implicitRules" -> Val,
        "language" -> Val
      )),
      "DomainResource" -> ElementPolicy(Some("Resource"), Map(
        // text skipped, like the reference
        "contained" -> Contained,
        "extension" -> TypeRef("Extension"),
        "modifierExtension" -> TypeRef("Extension")
      )),
      "Element" -> ElementPolicy(None, Map(
        "extension" -> TypeRef("Extension")
      )),
      // Backbone elements (nested resource parts) may carry
      // meaning-altering modifierExtensions at any depth; the compiled
      // reject predicate propagates up, so an unknown nested modifier
      // rejects the whole resource like the reference
      // (scrubber.py SkipResource via _check_modifier_extensions).
      "BackboneElement" -> ElementPolicy(Some("Element"), Map(
        "modifierExtension" -> TypeRef("Extension")
      )),
      "Meta" -> ElementPolicy(Some("Element"), Map(
        "lastUpdated" -> Val,
        "profile" -> Val,
        "source" -> Val,
        "versionId" -> Val,
        "security" -> TypeRef("Coding"),
        "tag" -> TypeRef("Coding")
      )),
      "CodeableConcept" -> ElementPolicy(Some("Element"), Map(
        "coding" -> TypeRef("Coding"),
        "text" -> Philter
      )),
      // code/display guarded by the Epic custom-system check
      // (scrub-rules.toml:83-84) — display is additionally a philter
      // target when the philter pass is enabled
      "Coding" -> ElementPolicy(Some("Element"), Map(
        "system" -> Val,
        "version" -> Val,
        "code" -> CheckSystem(Val),
        "display" -> CheckSystem(Philter),
        "userSelected" -> Val
      )),
      "Reference" -> ElementPolicy(Some("Element"), Map(
        "reference" -> AnonRef,
        "type" -> Val
      )),
      // full reference section (scrub-rules.toml:362-370); only reachable
      // through conditional sub-schemas or explicitly identifier-safe
      // fields, so `value` is allowed here
      "Identifier" -> ElementPolicy(Some("Element"), Map(
        "use" -> Val,
        "type" -> CC,
        "system" -> Val,
        "value" -> Val,
        "period" -> Per,
        "assigner" -> Ref
      )),
      "Period" -> ElementPolicy(Some("Element"), Map(
        "start" -> Val,
        "end" -> Val
      )),
      // Quantity.code is check-system-guarded too (scrub-rules.toml:738)
      "Quantity" -> ElementPolicy(Some("Element"), Map(
        "value" -> Val,
        "comparator" -> Val,
        "unit" -> Val,
        "system" -> Val,
        "code" -> CheckSystem(Val)
      )),
      // exactly the reference's Address section (scrub-rules.toml:24-29)
      // — `use`/`type`/`city`/`line` are all skipped there, and a deid
      // policy must never be WIDER than its source
      "Address" -> ElementPolicy(Some("Element"), Map(
        "state" -> Val,
        "postalCode" -> Zip,
        "country" -> Val
      )),
      "Patient" -> ElementPolicy(Some("DomainResource"), Map(
        "active" -> Val,
        "gender" -> Val,
        "birthDate" -> Year,
        "deceasedBoolean" -> Val,
        "deceasedDateTime" -> Val,
        "address" -> TypeRef("Address"),
        "maritalStatus" -> CC,
        "multipleBirthBoolean" -> Val,
        "multipleBirthInteger" -> Val,
        "contact" -> TypeRef("PatientContact"),
        "communication" -> TypeRef("PatientCommunication"),
        "generalPractitioner" -> Ref,
        "managingOrganization" -> Ref,
        "link" -> TypeRef("PatientLink")
      )),
      "PatientContact" -> ElementPolicy(Some("BackboneElement"), Map(
        "relationship" -> CC,
        "address" -> TypeRef("Address"),
        "gender" -> Val,
        "organization" -> Ref,
        "period" -> Per
      )),
      "PatientCommunication" -> ElementPolicy(Some("BackboneElement"), Map(
        "language" -> CC,
        "preferred" -> Val
      )),
      "PatientLink" -> ElementPolicy(Some("BackboneElement"), Map(
        "other" -> Ref,
        "type" -> Val
      )),
      "Encounter" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "statusHistory" -> TypeRef("EncounterStatusHistory"),
        "class" -> TypeRef("Coding"),
        "classHistory" -> TypeRef("EncounterClassHistory"),
        "type" -> CC,
        "serviceType" -> CC,
        "priority" -> CC,
        "subject" -> Ref,
        "episodeOfCare" -> Ref,
        "basedOn" -> Ref,
        "participant" -> TypeRef("EncounterParticipant"),
        "appointment" -> Ref,
        "period" -> Per,
        "length" -> Qty,
        "reasonCode" -> CC,
        "reasonReference" -> Ref,
        "diagnosis" -> TypeRef("EncounterDiagnosis"),
        "account" -> Ref,
        "hospitalization" -> TypeRef("EncounterHospitalization"),
        "location" -> TypeRef("EncounterLocation"),
        "serviceProvider" -> Ref,
        "partOf" -> Ref
      )),
      "EncounterStatusHistory" -> ElementPolicy(Some("BackboneElement"),
        Map("status" -> Val, "period" -> Per)),
      "EncounterClassHistory" -> ElementPolicy(Some("BackboneElement"),
        Map("class" -> TypeRef("Coding"), "period" -> Per)),
      "EncounterParticipant" -> ElementPolicy(Some("BackboneElement"),
        Map("type" -> CC, "period" -> Per, "individual" -> Ref)),
      "EncounterDiagnosis" -> ElementPolicy(Some("BackboneElement"),
        Map("condition" -> Ref, "use" -> CC, "rank" -> Val)),
      "EncounterHospitalization" -> ElementPolicy(Some("BackboneElement"),
        Map(
          "origin" -> Ref,
          "admitSource" -> CC,
          "reAdmission" -> CC,
          "dietPreference" -> CC,
          "specialCourtesy" -> CC,
          "specialArrangement" -> CC,
          "destination" -> Ref,
          "dischargeDisposition" -> CC
        )),
      "EncounterLocation" -> ElementPolicy(Some("BackboneElement"),
        Map("location" -> Ref, "status" -> Val, "physicalType" -> CC,
          "period" -> Per)),
      "Observation" -> ElementPolicy(Some("DomainResource"), Map(
        "basedOn" -> Ref,
        "partOf" -> Ref,
        "status" -> Val,
        "category" -> CC,
        "code" -> CC,
        "subject" -> Ref,
        "focus" -> Ref,
        "encounter" -> Ref,
        "effectiveDateTime" -> Val,
        "effectivePeriod" -> Per,
        "effectiveTiming" -> TypeRef("Timing"),
        "effectiveInstant" -> Val,
        "issued" -> Val,
        "performer" -> Ref,
        "valueQuantity" -> Qty,
        "valueCodeableConcept" -> CC,
        "valueString" -> Mask,
        "valueBoolean" -> Val,
        "valueInteger" -> Val,
        "valueRange" -> TypeRef("Range"),
        "valueRatio" -> TypeRef("Ratio"),
        "valueSampledData" -> TypeRef("SampledData"),
        "valueTime" -> Val,
        "valueDateTime" -> Val,
        "valuePeriod" -> Per,
        "dataAbsentReason" -> CC,
        "interpretation" -> CC,
        "bodySite" -> CC,
        "method" -> CC,
        "specimen" -> Ref,
        "device" -> Ref,
        "hasMember" -> Ref,
        "derivedFrom" -> Ref,
        "component" -> TypeRef("ObservationComponent")
      )),
      "ObservationComponent" -> ElementPolicy(Some("BackboneElement"), Map(
        "code" -> CC,
        "valueQuantity" -> Qty,
        "valueCodeableConcept" -> CC,
        "valueString" -> Mask,
        "valueBoolean" -> Val,
        "valueInteger" -> Val,
        "valueRange" -> TypeRef("Range"),
        "valueRatio" -> TypeRef("Ratio"),
        "valueSampledData" -> TypeRef("SampledData"),
        "valueTime" -> Val,
        "valueDateTime" -> Val,
        "valuePeriod" -> Per,
        "dataAbsentReason" -> CC,
        "interpretation" -> CC
      )),
      "Condition" -> ElementPolicy(Some("DomainResource"), Map(
        "clinicalStatus" -> CC,
        "verificationStatus" -> CC,
        "category" -> CC,
        "severity" -> CC,
        "code" -> CC,
        "bodySite" -> CC,
        "subject" -> Ref,
        "encounter" -> Ref,
        "onsetDateTime" -> Val,
        "onsetAge" -> Qty,
        "onsetPeriod" -> Per,
        "onsetRange" -> TypeRef("Range"),
        "abatementDateTime" -> Val,
        "abatementAge" -> Qty,
        "abatementPeriod" -> Per,
        "abatementRange" -> TypeRef("Range"),
        "recordedDate" -> Val,
        "recorder" -> Ref,
        "asserter" -> Ref,
        "stage" -> TypeRef("ConditionStage"),
        "evidence" -> TypeRef("ConditionEvidence")
      )),
      "ConditionStage" -> ElementPolicy(Some("BackboneElement"),
        Map("summary" -> CC, "assessment" -> Ref, "type" -> CC)),
      "ConditionEvidence" -> ElementPolicy(Some("BackboneElement"),
        Map("code" -> CC, "detail" -> Ref)),
      "DocumentReference" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "docStatus" -> Val,
        "type" -> CC,
        "category" -> CC,
        "subject" -> Ref,
        "date" -> Val,
        "author" -> Ref,
        "authenticator" -> Ref,
        "custodian" -> Ref,
        "relatesTo" -> TypeRef("DocumentReferenceRelatesTo"),
        "securityLabel" -> CC,
        "context" -> TypeRef("DocumentReferenceContext"),
        "content" -> TypeRef("DocumentReferenceContent")
      )),
      "DocumentReferenceRelatesTo" -> ElementPolicy(Some("BackboneElement"),
        Map("code" -> Val, "target" -> Ref)),
      "DocumentReferenceContext" -> ElementPolicy(Some("BackboneElement"), Map(
        "encounter" -> Ref,
        "event" -> CC,
        "period" -> Per,
        "facilityType" -> CC,
        "practiceSetting" -> CC,
        "sourcePatientInfo" -> Ref,
        "related" -> Ref
      )),
      "DocumentReferenceContent" -> ElementPolicy(Some("BackboneElement"), Map(
        "attachment" -> TypeRef("Attachment"),
        "format" -> TypeRef("Coding")
      )),
      "Attachment" -> ElementPolicy(Some("Element"), Map(
        "contentType" -> Val,
        "language" -> Val,
        "data" -> MaskNote,
        "url" -> MaskNote,
        "size" -> Val,
        "creation" -> Val
      )),
      "MedicationRequest" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "statusReason" -> CC,
        "intent" -> Val,
        "category" -> CC,
        "priority" -> Val,
        "doNotPerform" -> Val,
        "reportedBoolean" -> Val,
        "reportedReference" -> Ref,
        "medicationCodeableConcept" -> CC,
        "medicationReference" -> Ref,
        "subject" -> Ref,
        "encounter" -> Ref,
        "supportingInformation" -> Ref,
        "authoredOn" -> Val,
        "requester" -> Ref,
        "performer" -> Ref,
        "performerType" -> CC,
        "recorder" -> Ref,
        "reasonCode" -> CC,
        "reasonReference" -> Ref,
        "instantiatesCanonical" -> Val,
        "instantiatesUri" -> Val,
        "basedOn" -> Ref,
        "courseOfTherapyType" -> CC,
        "insurance" -> Ref,
        "dosageInstruction" -> TypeRef("Dosage"),
        "dispenseRequest" -> TypeRef("MedicationRequestDispenseRequest"),
        "substitution" -> TypeRef("MedicationRequestSubstitution"),
        "priorPrescription" -> Ref,
        "detectedIssue" -> Ref,
        "eventHistory" -> Ref
      )),
      "MedicationRequestDispenseRequest" -> ElementPolicy(
        Some("BackboneElement"), Map(
          "initialFill" -> TypeRef("MedicationRequestInitialFill"),
          "dispenseInterval" -> Qty,
          "validityPeriod" -> Per,
          "numberOfRepeatsAllowed" -> Val,
          "quantity" -> Qty,
          "expectedSupplyDuration" -> Qty,
          "performer" -> Ref
        )),
      "MedicationRequestInitialFill" -> ElementPolicy(
        Some("BackboneElement"),
        Map("quantity" -> Qty, "duration" -> Qty)),
      "MedicationRequestSubstitution" -> ElementPolicy(
        Some("BackboneElement"),
        Map("allowedBoolean" -> Val, "allowedCodeableConcept" -> CC,
          "reason" -> CC)),
      "Procedure" -> ElementPolicy(Some("DomainResource"), Map(
        "instantiatesCanonical" -> Val,
        "instantiatesUri" -> Val,
        "basedOn" -> Ref,
        "partOf" -> Ref,
        "status" -> Val,
        "statusReason" -> CC,
        "category" -> CC,
        "code" -> CC,
        "subject" -> Ref,
        "encounter" -> Ref,
        "performedDateTime" -> Val,
        "performedPeriod" -> Per,
        "performedAge" -> Qty,
        "performedRange" -> TypeRef("Range"),
        "recorder" -> Ref,
        "asserter" -> Ref,
        "performer" -> TypeRef("ProcedurePerformer"),
        "location" -> Ref,
        "reasonCode" -> CC,
        "reasonReference" -> Ref,
        "bodySite" -> CC,
        "outcome" -> CC,
        "report" -> Ref,
        "complication" -> CC,
        "complicationDetail" -> Ref,
        "followUp" -> CC,
        "focalDevice" -> TypeRef("ProcedureFocalDevice"),
        "usedReference" -> Ref,
        "usedCode" -> CC
      )),
      "ProcedurePerformer" -> ElementPolicy(Some("BackboneElement"), Map(
        "function" -> CC,
        "actor" -> Ref,
        "onBehalfOf" -> Ref
      )),
      "ProcedureFocalDevice" -> ElementPolicy(Some("BackboneElement"), Map(
        "action" -> CC,
        "manipulated" -> Ref
      )),
      "Immunization" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "statusReason" -> CC,
        "vaccineCode" -> CC,
        "patient" -> Ref,
        "encounter" -> Ref,
        "occurrenceDateTime" -> Val,
        "recorded" -> Val,
        "primarySource" -> Val,
        "reportOrigin" -> CC,
        "location" -> Ref,
        "manufacturer" -> Ref,
        "lotNumber" -> Val,
        "expirationDate" -> Val,
        "site" -> CC,
        "route" -> CC,
        "doseQuantity" -> Qty,
        "performer" -> TypeRef("ImmunizationPerformer"),
        "reasonCode" -> CC,
        "reasonReference" -> Ref,
        "isSubpotent" -> Val,
        "subpotentReason" -> CC,
        "education" -> TypeRef("ImmunizationEducation"),
        "programEligibility" -> CC,
        "fundingSource" -> CC,
        "reaction" -> TypeRef("ImmunizationReaction"),
        "protocolApplied" -> TypeRef("ImmunizationProtocolApplied")
      )),
      "ImmunizationPerformer" -> ElementPolicy(Some("BackboneElement"),
        Map("function" -> CC, "actor" -> Ref)),
      "ImmunizationEducation" -> ElementPolicy(Some("BackboneElement"),
        Map("documentType" -> Val, "publicationDate" -> Val,
          "presentationDate" -> Val)),
      "ImmunizationReaction" -> ElementPolicy(Some("BackboneElement"),
        Map("date" -> Val, "detail" -> Ref, "reported" -> Val)),
      "ImmunizationProtocolApplied" -> ElementPolicy(Some("BackboneElement"),
        Map(
          "series" -> Val,
          "authority" -> Ref,
          "targetDisease" -> CC,
          "doseNumberPositiveInt" -> Val,
          "doseNumberString" -> Val,
          "seriesDosesPositiveInt" -> Val,
          "seriesDosesString" -> Val
        )),
      "AllergyIntolerance" -> ElementPolicy(Some("DomainResource"), Map(
        "clinicalStatus" -> CC,
        "verificationStatus" -> CC,
        "type" -> Val,
        "category" -> Val,
        "criticality" -> Val,
        "code" -> CC,
        "patient" -> Ref,
        "encounter" -> Ref,
        "onsetDateTime" -> Val,
        // the reference marks these "val", which its walker rejects for
        // dict values (config-error path); structured onsets descend
        // their element policies here instead — stricter than both
        "onsetAge" -> Qty,
        "onsetPeriod" -> Per,
        "onsetRange" -> TypeRef("Range"),
        "recordedDate" -> Val,
        "recorder" -> Ref,
        "asserter" -> Ref,
        "lastOccurrence" -> Val,
        "reaction" -> TypeRef("AllergyIntoleranceReaction")
      )),
      "AllergyIntoleranceReaction" -> ElementPolicy(Some("BackboneElement"),
        Map(
          "substance" -> CC,
          "manifestation" -> CC,
          "onset" -> Val,
          "severity" -> Val,
          "exposureRoute" -> CC
        )),
      // ---- remaining task resources (scrub-rules.toml sections) ----
      "Device" -> ElementPolicy(Some("DomainResource"), Map(
        "definition" -> Ref,
        "udiCarrier" -> TypeRef("DeviceUdiCarrier"),
        "status" -> Val,
        "statusReason" -> CC,
        "distinctIdentifier" -> Val,
        "manufacturer" -> Val,
        "manufactureDate" -> Val,
        "expirationDate" -> Val,
        "lotNumber" -> Val,
        "serialNumber" -> Val,
        "deviceName" -> TypeRef("DeviceName"),
        "modelNumber" -> Val,
        "partNumber" -> Val,
        "type" -> CC,
        "specialization" -> TypeRef("DeviceSpecialization"),
        "version" -> TypeRef("DeviceVersion"),
        "property" -> TypeRef("DeviceProperty"),
        "patient" -> Ref,
        "owner" -> Ref,
        "location" -> Ref,
        "safety" -> CC,
        "parent" -> Ref
      )),
      "DeviceUdiCarrier" -> ElementPolicy(Some("BackboneElement"), Map(
        "deviceIdentifier" -> Val,
        "issuer" -> Val,
        "jurisdiction" -> Val,
        "carrierAIDC" -> Val,
        "carrierHRF" -> Val,
        "entryType" -> Val
      )),
      "DeviceName" -> ElementPolicy(Some("BackboneElement"),
        Map("name" -> Val, "type" -> Val)),
      "DeviceSpecialization" -> ElementPolicy(Some("BackboneElement"),
        Map("systemType" -> CC, "version" -> Val)),
      "DeviceVersion" -> ElementPolicy(Some("BackboneElement"),
        Map("type" -> CC, "component" -> TypeRef("Identifier"),
          "value" -> Val)),
      "DeviceProperty" -> ElementPolicy(Some("BackboneElement"),
        Map("type" -> CC, "valueQuantity" -> Qty, "valueCode" -> CC)),
      "DiagnosticReport" -> ElementPolicy(Some("DomainResource"), Map(
        "basedOn" -> Ref,
        "status" -> Val,
        "category" -> CC,
        "code" -> CC,
        "subject" -> Ref,
        "encounter" -> Ref,
        "effectiveDateTime" -> Val,
        "effectivePeriod" -> Per,
        "issued" -> Val,
        "performer" -> Ref,
        "resultsInterpreter" -> Ref,
        "specimen" -> Ref,
        "result" -> Ref,
        "imagingStudy" -> Ref,
        "media" -> TypeRef("DiagnosticReportMedia"),
        "conclusionCode" -> CC,
        "presentedForm" -> TypeRef("Attachment")
      )),
      "DiagnosticReportMedia" -> ElementPolicy(Some("BackboneElement"),
        Map("link" -> Ref)),
      "EpisodeOfCare" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "statusHistory" -> TypeRef("EncounterStatusHistory"),
        "type" -> CC,
        "diagnosis" -> TypeRef("EpisodeOfCareDiagnosis"),
        "patient" -> Ref,
        "managingOrganization" -> Ref,
        "period" -> Per,
        "referralRequest" -> Ref,
        "careManager" -> Ref,
        "team" -> Ref,
        "account" -> Ref
      )),
      "EpisodeOfCareDiagnosis" -> ElementPolicy(Some("BackboneElement"),
        Map("condition" -> Ref, "role" -> CC, "rank" -> Val)),
      "Location" -> ElementPolicy(Some("DomainResource"), Map(
        "identifier" -> NpiIdentifier,
        "status" -> Val,
        "operationalStatus" -> TypeRef("Coding"),
        "name" -> Val,
        "alias" -> Val,
        "mode" -> Val,
        "type" -> CC,
        "address" -> TypeRef("Address"),
        "physicalType" -> CC,
        "managingOrganization" -> Ref,
        "partOf" -> Ref,
        "hoursOfOperation" -> TypeRef("LocationHoursOfOperation"),
        "endpoint" -> Ref
      )),
      "LocationHoursOfOperation" -> ElementPolicy(Some("BackboneElement"),
        Map("daysOfWeek" -> Val, "allDay" -> Val, "openingTime" -> Val,
          "closingTime" -> Val)),
      "Medication" -> ElementPolicy(Some("DomainResource"), Map(
        "code" -> CC,
        "status" -> Val,
        "manufacturer" -> Ref,
        "form" -> CC,
        "amount" -> TypeRef("Ratio"),
        "ingredient" -> TypeRef("MedicationIngredient"),
        "batch" -> TypeRef("MedicationBatch")
      )),
      "MedicationIngredient" -> ElementPolicy(Some("BackboneElement"),
        Map(
          "itemCodeableConcept" -> CC,
          "itemReference" -> Ref,
          "isActive" -> Val,
          "strength" -> TypeRef("Ratio")
        )),
      "MedicationBatch" -> ElementPolicy(Some("BackboneElement"),
        Map("lotNumber" -> Val, "expirationDate" -> Val)),
      "MedicationDispense" -> ElementPolicy(Some("DomainResource"), Map(
        "partOf" -> Ref,
        "status" -> Val,
        "statusReasonCodeableConcept" -> CC,
        "statusReasonReference" -> Ref,
        "category" -> CC,
        "medicationCodeableConcept" -> CC,
        "medicationReference" -> Ref,
        "subject" -> Ref,
        "context" -> Ref,
        "supportingInformation" -> Ref,
        "performer" -> TypeRef("MedicationDispensePerformer"),
        "location" -> Ref,
        "authorizingPrescription" -> Ref,
        "type" -> CC,
        "quantity" -> Qty,
        "daysSupply" -> Qty,
        "whenPrepared" -> Val,
        "whenHandedOver" -> Val,
        "destination" -> Ref,
        "receiver" -> Ref,
        "dosageInstruction" -> TypeRef("Dosage"),
        "substitution" -> TypeRef("MedicationDispenseSubstitution"),
        "detectedIssue" -> Ref,
        "eventHistory" -> Ref
      )),
      "MedicationDispensePerformer" -> ElementPolicy(
        Some("BackboneElement"),
        Map("function" -> CC, "actor" -> Ref)),
      "MedicationDispenseSubstitution" -> ElementPolicy(
        Some("BackboneElement"),
        Map("wasSubstituted" -> Val, "type" -> CC, "reason" -> CC,
          "responsibleParty" -> Ref)),
      "Organization" -> ElementPolicy(Some("DomainResource"), Map(
        "identifier" -> OrgIdentifier,
        "active" -> Val,
        "type" -> CC,
        "name" -> Val,
        "alias" -> Val,
        "address" -> TypeRef("Address"),
        "partOf" -> Ref,
        "contact" -> TypeRef("OrganizationContact"),
        "endpoint" -> Ref
      )),
      "OrganizationContact" -> ElementPolicy(Some("BackboneElement"),
        Map("purpose" -> CC, "address" -> TypeRef("Address"))),
      "Practitioner" -> ElementPolicy(Some("DomainResource"), Map(
        "identifier" -> NpiIdentifier,
        "active" -> Val,
        "address" -> TypeRef("Address"),
        "gender" -> Val,
        "birthDate" -> Year,
        "qualification" -> TypeRef("PractitionerQualification"),
        "communication" -> CC
      )),
      "PractitionerQualification" -> ElementPolicy(Some("BackboneElement"),
        Map("identifier" -> TypeRef("Identifier"), "code" -> CC,
          "period" -> Per, "issuer" -> Ref)),
      "PractitionerRole" -> ElementPolicy(Some("DomainResource"), Map(
        "identifier" -> NpiIdentifier,
        "active" -> Val,
        "period" -> Per,
        "practitioner" -> Ref,
        "organization" -> Ref,
        "code" -> CC,
        "specialty" -> CC,
        "location" -> Ref,
        "healthcareService" -> Ref,
        "availableTime" -> TypeRef("PractitionerRoleAvailableTime"),
        "notAvailable" -> TypeRef("PractitionerRoleNotAvailable"),
        "endpoint" -> Ref
      )),
      "PractitionerRoleAvailableTime" -> ElementPolicy(
        Some("BackboneElement"),
        Map("daysOfWeek" -> Val, "allDay" -> Val,
          "availableStartTime" -> Val, "availableEndTime" -> Val)),
      "PractitionerRoleNotAvailable" -> ElementPolicy(
        Some("BackboneElement"),
        Map("during" -> Per)),
      "ServiceRequest" -> ElementPolicy(Some("DomainResource"), Map(
        "instantiatesCanonical" -> Val,
        "instantiatesUri" -> Val,
        "basedOn" -> Ref,
        "replaces" -> Ref,
        "status" -> Val,
        "intent" -> Val,
        "category" -> CC,
        "priority" -> Val,
        "doNotPerform" -> Val,
        "code" -> CC,
        "orderDetail" -> CC,
        "quantityQuantity" -> Qty,
        "quantityRatio" -> TypeRef("Ratio"),
        "quantityRange" -> TypeRef("Range"),
        "subject" -> Ref,
        "encounter" -> Ref,
        "occurrenceDateTime" -> Val,
        "occurrencePeriod" -> Per,
        "occurrenceTiming" -> TypeRef("Timing"),
        "asNeededBoolean" -> Val,
        "asNeededCodeableConcept" -> CC,
        "authoredOn" -> Val,
        "requester" -> Ref,
        "performerType" -> CC,
        "performer" -> Ref,
        "locationCode" -> CC,
        "locationReference" -> Ref,
        "reasonCode" -> CC,
        "reasonReference" -> Ref,
        "insurance" -> Ref,
        "supportingInfo" -> Ref,
        "specimen" -> Ref,
        "bodySite" -> CC,
        "relevantHistory" -> Ref
      )),
      "Specimen" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "type" -> CC,
        "subject" -> Ref,
        "receivedTime" -> Val,
        "parent" -> Ref,
        "request" -> Ref,
        "collection" -> TypeRef("SpecimenCollection"),
        "processing" -> TypeRef("SpecimenProcessing"),
        "container" -> TypeRef("SpecimenContainer"),
        "condition" -> CC
      )),
      "SpecimenCollection" -> ElementPolicy(Some("BackboneElement"), Map(
        "collector" -> Ref,
        "collectedDateTime" -> Val,
        "collectedPeriod" -> Per,
        "duration" -> Qty,
        "quantity" -> Qty,
        "method" -> CC,
        "bodySite" -> CC,
        "fastingStatusCodeableConcept" -> CC,
        "fastingStatusDuration" -> Qty
      )),
      "SpecimenProcessing" -> ElementPolicy(Some("BackboneElement"), Map(
        "procedure" -> CC,
        "additive" -> Ref,
        "timeDateTime" -> Val,
        "timePeriod" -> Per
      )),
      "SpecimenContainer" -> ElementPolicy(Some("BackboneElement"), Map(
        "type" -> CC,
        "capacity" -> Qty,
        "specimenQuantity" -> Qty,
        "additiveCodeableConcept" -> CC,
        "additiveReference" -> Ref
      )),
      // ---- shared element types (scrub-rules.toml:221-242,740-749,860-881) ----
      "Dosage" -> ElementPolicy(Some("BackboneElement"), Map(
        "sequence" -> Val,
        "additionalInstruction" -> CC,
        "timing" -> TypeRef("Timing"),
        "asNeededBoolean" -> Val,
        "asNeededCodeableConcept" -> CC,
        "site" -> CC,
        "route" -> CC,
        "method" -> CC,
        "doseAndRate" -> TypeRef("DosageDoseAndRate"),
        "maxDosePerPeriod" -> TypeRef("Ratio"),
        "maxDosePerAdministration" -> Qty,
        "maxDosePerLifetime" -> Qty
      )),
      "DosageDoseAndRate" -> ElementPolicy(Some("Element"), Map(
        "type" -> CC,
        "doseRange" -> TypeRef("Range"),
        "doseQuantity" -> Qty,
        "rateRatio" -> TypeRef("Ratio"),
        "rateRange" -> TypeRef("Range"),
        "rateQuantity" -> Qty
      )),
      "Timing" -> ElementPolicy(Some("BackboneElement"), Map(
        "event" -> Val,
        "repeat" -> TypeRef("TimingRepeat"),
        "code" -> CC
      )),
      "TimingRepeat" -> ElementPolicy(Some("Element"), Map(
        "boundsDuration" -> Qty,
        "boundsRange" -> TypeRef("Range"),
        "boundsPeriod" -> Per,
        "count" -> Val,
        "countMax" -> Val,
        "duration" -> Val,
        "durationMax" -> Val,
        "durationUnit" -> Val,
        "frequency" -> Val,
        "frequencyMax" -> Val,
        "period" -> Val,
        "periodMax" -> Val,
        "periodUnit" -> Val,
        "dayOfWeek" -> Val,
        "timeOfDay" -> Val,
        "when" -> Val,
        "offset" -> Val
      )),
      "Range" -> ElementPolicy(Some("Element"), Map(
        "low" -> Qty,
        "high" -> Qty
      )),
      "Ratio" -> ElementPolicy(Some("Element"), Map(
        "numerator" -> Qty,
        "denominator" -> Qty
      )),
      "SampledData" -> ElementPolicy(Some("Element"), Map(
        "origin" -> Qty,
        "period" -> Val,
        "factor" -> Val,
        "lowerLimit" -> Val,
        "upperLimit" -> Val,
        "dimensions" -> Val,
        "data" -> Val
      )),
      "Money" -> ElementPolicy(Some("Element"), Map(
        "value" -> Val,
        "currency" -> Val
      )),
      // full value[x] surface of the reference's [allowed.Extension]
      // (scrub-rules.toml:308-361) — allow-listed extensions are trusted,
      // so primitive values pass (valueString "caution" comment kept) and
      // ids are pseudonymized
      "Extension" -> ElementPolicy(None, Map(
        // complex extensions nest sub-extensions (us-core race/ethnicity
        // ombCategory); once inside an allow-listed extension the url
        // filter does NOT re-apply (scrubber.py inside_extension=True)
        "extension" -> TypeRef("Extension"),
        "url" -> Val,
        "valueBase64Binary" -> Val,
        "valueBoolean" -> Val,
        "valueCanonical" -> Val,
        "valueCode" -> Val,
        "valueDate" -> Val,
        "valueDateTime" -> Val,
        "valueDecimal" -> Val,
        "valueId" -> AnonId,
        "valueInstant" -> Val,
        "valueInteger" -> Val,
        "valueOid" -> Val,
        "valuePositiveInt" -> Val,
        "valueString" -> Val,
        "valueTime" -> Val,
        "valueUnsignedInt" -> Val,
        "valueUri" -> Val,
        "valueUrl" -> Val,
        "valueUuid" -> Val,
        "valueAddress" -> TypeRef("Address"),
        "valueAge" -> Qty,
        "valueAttachment" -> TypeRef("Attachment"),
        "valueCodeableConcept" -> CC,
        "valueCoding" -> TypeRef("Coding"),
        "valueCount" -> Qty,
        "valueDistance" -> Qty,
        "valueDuration" -> Qty,
        "valueIdentifier" -> TypeRef("Identifier"),
        "valueMoney" -> TypeRef("Money"),
        "valuePeriod" -> Per,
        "valueQuantity" -> Qty,
        "valueRange" -> TypeRef("Range"),
        "valueRatio" -> TypeRef("Ratio"),
        "valueReference" -> Ref,
        "valueSampledData" -> TypeRef("SampledData"),
        "valueTiming" -> TypeRef("Timing"),
        "valueDosage" -> TypeRef("Dosage"),
        "valueMeta" -> TypeRef("Meta")
      ))
    ),
    // the reference's full [extensions.normal] allowed list
    // (scrub-rules.toml:888-994): base-spec, US Core (+ the DSTU1 urls
    // still seen in the wild), Cerner, Epic, and Synthea extensions with
    // clinical/QA relevance; anything unknown is dropped (counted) and
    // unknown modifier extensions reject the whole resource
    allowedExtensions = Set(
      "http://hl7.org/fhir/StructureDefinition/annotationType",
      "http://hl7.org/fhir/StructureDefinition/condition-assertedDate",
      "http://hl7.org/fhir/StructureDefinition/data-absent-reason",
      "http://hl7.org/fhir/StructureDefinition/derivation-reference",
      "http://hl7.org/fhir/StructureDefinition/event-performerFunction",
      "http://hl7.org/fhir/StructureDefinition/individual-pronouns",
      "http://hl7.org/fhir/StructureDefinition/iso21090-PQ-translation",
      "http://hl7.org/fhir/StructureDefinition/patient-genderIdentity",
      "http://hl7.org/fhir/StructureDefinition/patient-preferenceType",
      "http://hl7.org/fhir/StructureDefinition/patient-proficiency",
      "http://hl7.org/fhir/StructureDefinition/workflow-supportingInfo",
      "http://hl7.org/fhir/5.0/StructureDefinition/extension-DocumentReference.attester",
      "http://terminology.hl7.org/CodeSystem/data-absent-reason",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-genderIdentity",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-jurisdiction",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-medication-adherence",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-sex",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-tribal-affiliation",
      "http://hl7.org/fhir/Profile/us-core#ethnicity",
      "http://hl7.org/fhir/Profile/us-core#race",
      "https://fhir-ehr.cerner.com/r4/StructureDefinition/client-organization",
      "https://fhir-ehr.cerner.com/r4/StructureDefinition/precision",
      "https://fhir-ehr.cerner.com/r4/StructureDefinition/pharmacy-verification-status",
      "http://electronichealth.se/fhir/StructureDefinition/NLLDosePackaging",
      "http://electronichealth.se/fhir/StructureDefinition/NLLPrescriptionFormat",
      "http://electronichealth.se/fhir/StructureDefinition/NLLRegistrationBasis",
      "http://open.epic.com/FHIR/StructureDefinition/extension/accidentrelated",
      "http://open.epic.com/FHIR/StructureDefinition/extension/basis-at-begin-exam",
      "http://open.epic.com/FHIR/StructureDefinition/extension/calculated-pronouns-to-use-for-text",
      "http://open.epic.com/FHIR/StructureDefinition/extension/clinical-note-attached-media",
      "http://open.epic.com/FHIR/StructureDefinition/extension/clinical-note-authentication-instant",
      "http://open.epic.com/FHIR/StructureDefinition/extension/clinical-note-author-provider-type",
      "http://open.epic.com/FHIR/StructureDefinition/extension/clinical-note-interval-update",
      "http://open.epic.com/FHIR/StructureDefinition/extension/clinical-note-interval-update-source",
      "http://open.epic.com/FHIR/StructureDefinition/extension/clinical-note-post-procedure-diagnosis",
      "http://open.epic.com/FHIR/StructureDefinition/extension/clinical-note-pre-procedure-diagnosis",
      "http://open.epic.com/FHIR/StructureDefinition/extension/clinical-note-service",
      "http://open.epic.com/FHIR/StructureDefinition/extension/data-conversion-warning",
      "http://open.epic.com/FHIR/StructureDefinition/extension/edd-at-begin-exam",
      "http://open.epic.com/FHIR/StructureDefinition/extension/historical-fhir-id",
      "http://open.epic.com/FHIR/StructureDefinition/extension/ip-admit-datetime",
      "http://open.epic.com/FHIR/StructureDefinition/extension/legal-sex",
      "http://open.epic.com/FHIR/StructureDefinition/extension/log-level-procedure-codes",
      "http://open.epic.com/FHIR/StructureDefinition/extension/observation-datetime",
      "http://open.epic.com/FHIR/StructureDefinition/extension/patient-type",
      "http://open.epic.com/FHIR/StructureDefinition/extension/sex-for-clinical-use",
      "http://open.epic.com/FHIR/StructureDefinition/extension/smartdata",
      "http://open.epic.com/FHIR/StructureDefinition/extension/specialty",
      "http://open.epic.com/FHIR/StructureDefinition/extension/surgical-history-laterality",
      "http://open.epic.com/FHIR/StructureDefinition/extension/surgical-history-source",
      "http://open.epic.com/FHIR/StructureDefinition/extension/template-id",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-center",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-donor-or-recipient",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-admission-date",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-center-waitlist-date",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-committee-review-date",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-discharge-date",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-donated-date",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-evaluation",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-referral-date",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-transplanted-date",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-event-waitlist-date",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-organ",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-organ-coordinator",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-phase-status",
      "http://open.epic.com/FHIR/StructureDefinition/extension/transplant-waitlist-score",
      "http://open.epic.com/FHIR/STU3/StructureDefinition/patient-preferred-provider-language",
      "http://open.epic.com/FHIR/STU3/StructureDefinition/patient-preferred-provider-sex",
      "http://open.epic.com/FHIR/STU3/StructureDefinition/temperature-in-fahrenheit",
      "http://open.epic.com/FHIR/R4/StructureDefinition/patient-preferred-provider-sex",
      "https://open.epic.com/fhir/extensions/specialty",
      "https://open.epic.com/FHIR/StructureDefinition/patient-merge-target-reference",
      "https://open.epic.com/FHIR/StructureDefinition/patient-merge-unmerge-instant",
      "https://open.epic.com/FHIR/StructureDefinition/patient-unmerge-source",
      "https://open.epic.com/FHIR/StructureDefinition/patient-unmerge-target",
      "http://nictiz.nl/fhir/StructureDefinition/BodySite-Qualifier",
      "http://synthetichealth.github.io/synthea/bed-count-extension",
      "http://synthetichealth.github.io/synthea/disability-adjusted-life-years",
      "http://synthetichealth.github.io/synthea/quality-adjusted-life-years",
      "http://synthetichealth.github.io/synthea/utilization-encounters-extension",
      "http://synthetichealth.github.io/synthea/utilization-labs-extension",
      "http://synthetichealth.github.io/synthea/utilization-prescriptions-extension",
      "http://synthetichealth.github.io/synthea/utilization-procedures-extension"
    ),
    // [extensions.modifier] allowed (scrub-rules.toml:1033-1040)
    allowedModifierExtensions = Set(
      "http://fhir-registry.smarthealthit.org/StructureDefinition/nlp-polarity",
      "http://fhir-registry.smarthealthit.org/StructureDefinition/nlp-source"
    ),
    // [extensions] ignored (scrub-rules.toml:996-1031): dropped without
    // a census entry — known urls that duplicate standard extensions or
    // carry PHI
    ignoredExtensions = Set(
      "http://hl7.org/fhir/StructureDefinition/geolocation",
      "http://hl7.org/fhir/StructureDefinition/iso21090-EN-qualifier",
      "http://hl7.org/fhir/StructureDefinition/iso21090-TEL-address",
      "http://hl7.org/fhir/StructureDefinition/patient-birthPlace",
      "http://hl7.org/fhir/StructureDefinition/patient-birthTime",
      "http://hl7.org/fhir/StructureDefinition/patient-mothersMaidenName",
      "http://hl7.org/fhir/StructureDefinition/rendered-value",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-direct",
      "https://fhir-ehr.cerner.com/r4/StructureDefinition/clinical-instruction",
      "https://fhir-ehr.cerner.com/r4/StructureDefinition/custom-attribute",
      "https://fhir-ehr.cerner.com/r4/StructureDefinition/estimated-financial-responsibility-amount",
      "http://open.epic.com/FHIR/StructureDefinition/extension/birth-location",
      "http://open.epic.com/FHIR/StructureDefinition/extension/ce-encounter-id",
      "http://open.epic.com/FHIR/StructureDefinition/extension/episode-comments",
      "http://open.epic.com/FHIR/StructureDefinition/extension/episode-name",
      "http://open.epic.com/FHIR/StructureDefinition/extension/lab-e-signature",
      "http://open.epic.com/FHIR/StructureDefinition/extension/team-name",
      "http://open.epic.com/FHIR/StructureDefinition/extension/technical-details"
    )
  )
}

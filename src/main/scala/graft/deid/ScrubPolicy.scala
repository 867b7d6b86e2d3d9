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

  /** descend using the named element type's policy */
  final case class TypeRef(name: String) extends Rule
}

final case class ElementPolicy(
    extendsType: Option[String],
    fields: Map[String, Rule.Rule]
)

final case class ScrubPolicy(
    types: Map[String, ElementPolicy],
    allowedExtensions: Set[String],
    allowedModifierExtensions: Set[String]
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
}

/** Default policy covering the engine's initial resource set. Field
  * lists follow the reference policy's choices for the same resources
  * (scrub-rules.toml [allowed.*] sections) re-expressed in the DSL.
  */
object DefaultScrubPolicy {
  import Rule._

  private val CC = TypeRef("CodeableConcept")
  private val Ref = TypeRef("Reference")

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
        // text skipped; contained handled as opaque drop in v1
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
        "versionId" -> Val
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
      "Identifier" -> ElementPolicy(Some("Element"), Map(
        "use" -> Val,
        "system" -> Val,
        "type" -> CC
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
      "Address" -> ElementPolicy(Some("Element"), Map(
        "use" -> Val,
        "type" -> Val,
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
        "generalPractitioner" -> Ref,
        "managingOrganization" -> Ref
      )),
      "Encounter" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "class" -> TypeRef("Coding"),
        "type" -> CC,
        "serviceType" -> CC,
        "priority" -> CC,
        "subject" -> Ref,
        "period" -> TypeRef("Period"),
        "reasonCode" -> CC,
        "serviceProvider" -> Ref
      )),
      "Observation" -> ElementPolicy(Some("DomainResource"), Map(
        "basedOn" -> Ref,
        "partOf" -> Ref,
        "status" -> Val,
        "category" -> CC,
        "code" -> CC,
        "subject" -> Ref,
        "encounter" -> Ref,
        "effectiveDateTime" -> Val,
        "effectivePeriod" -> TypeRef("Period"),
        "issued" -> Val,
        "performer" -> Ref,
        "valueQuantity" -> TypeRef("Quantity"),
        "valueCodeableConcept" -> CC,
        "valueString" -> Mask,
        "valueBoolean" -> Val,
        "valueDateTime" -> Val,
        "dataAbsentReason" -> CC,
        "interpretation" -> CC,
        "bodySite" -> CC,
        "method" -> CC
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
        "abatementDateTime" -> Val,
        "recordedDate" -> Val
      )),
      "DocumentReference" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "docStatus" -> Val,
        "type" -> CC,
        "category" -> CC,
        "subject" -> Ref,
        "date" -> Val,
        "author" -> Ref,
        "custodian" -> Ref,
        "context" -> TypeRef("DocumentReferenceContext"),
        "content" -> TypeRef("DocumentReferenceContent")
      )),
      "DocumentReferenceContext" -> ElementPolicy(Some("BackboneElement"), Map(
        "encounter" -> Ref,
        "period" -> TypeRef("Period"),
        "facilityType" -> CC,
        "practiceSetting" -> CC
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
        "reportedBoolean" -> Val,
        "medicationCodeableConcept" -> CC,
        "medicationReference" -> Ref,
        "subject" -> Ref,
        "encounter" -> Ref,
        "authoredOn" -> Val,
        "requester" -> Ref,
        "reasonCode" -> CC,
        "courseOfTherapyType" -> CC
      )),
      "Procedure" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "statusReason" -> CC,
        "category" -> CC,
        "code" -> CC,
        "subject" -> Ref,
        "encounter" -> Ref,
        "performedDateTime" -> Val,
        "performedPeriod" -> TypeRef("Period"),
        "recorder" -> Ref,
        "performer" -> TypeRef("ProcedurePerformer"),
        "reasonCode" -> CC,
        "bodySite" -> CC,
        "outcome" -> CC
      )),
      "ProcedurePerformer" -> ElementPolicy(Some("BackboneElement"), Map(
        "function" -> CC,
        "actor" -> Ref
      )),
      "Immunization" -> ElementPolicy(Some("DomainResource"), Map(
        "status" -> Val,
        "statusReason" -> CC,
        "vaccineCode" -> CC,
        "patient" -> Ref,
        "encounter" -> Ref,
        "occurrenceDateTime" -> Val,
        "primarySource" -> Val,
        "site" -> CC,
        "route" -> CC,
        "doseQuantity" -> TypeRef("Quantity")
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
        "recordedDate" -> Val,
        "recorder" -> Ref,
        "asserter" -> Ref,
        "lastOccurrence" -> Val
      )),
      "Extension" -> ElementPolicy(None, Map(
        "url" -> Val,
        "valueCode" -> Val,
        "valueCoding" -> TypeRef("Coding"),
        "valueCodeableConcept" -> CC,
        "valueString" -> Mask
      ))
    ),
    // mirrors scrub-rules.toml [extensions] intent: benign demographic
    // extensions pass; anything unknown is dropped (counted) and unknown
    // modifier extensions reject the whole resource
    allowedExtensions = Set(
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity",
      "http://hl7.org/fhir/StructureDefinition/data-absent-reason"
    ),
    allowedModifierExtensions = Set.empty
  )
}

package graft.fhir

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FHIR cross-resource joins (SURVEY §2.5 J5). */
object FhirJoins {

  /** J5: practitioner enrichment — resolve each note's author reference
    * ("Practitioner/x" or "PractitionerRole/y") through PractitionerRole
    * to role/specialty codes and practitioner names.
    *
    * The reference does an acknowledged O(notes×roles) Python loop
    * (fhir/fhir_utils.py:206-293, "a little slow"); here it's two
    * broadcast hash joins (roles/practitioners are small dims) plus one
    * aggregation — per-note cost O(matches).
    *
    * Inputs: notes(noteId, authorRef);
    * roles(id, practitionerRef, codes, specialties);
    * practitioners(id, name).
    */
  def enrichAuthors(
      notes: DataFrame,
      noteId: String,
      authorRef: String,
      roles: DataFrame,
      practitioners: DataFrame
  ): DataFrame = {
    val n = notes.select(
      col(noteId).as("__noteId"),
      substring_index(col(authorRef), "/", 1).as("__refType"),
      substring_index(col(authorRef), "/", -1).as("__refId")
    )
    val r = roles.select(
      col("id").as("__roleId"),
      substring_index(col("practitionerRef"), "/", -1).as("__practId"),
      col("codes").as("__codes"),
      col("specialties").as("__specialties")
    )
    val joined = n.join(
      broadcast(r),
      (col("__refType") === "PractitionerRole" &&
        col("__refId") === col("__roleId")) ||
        (col("__refType") === "Practitioner" &&
          col("__refId") === col("__practId")),
      "left_outer"
    )
    val p = practitioners.select(col("id").as("__pid"),
      col("name").as("__pname"))
    // sort_array: collect_list order is partition-arrival order, so the
    // raw distinct arrays are nondeterministic under distributed replay;
    // the sorted form is the canonical output (and what lets an external
    // oracle reproduce the operator bit-for-bit)
    joined
      .join(broadcast(p), col("__practId") === col("__pid"), "left_outer")
      .groupBy(col("__noteId").as(noteId))
      .agg(
        sort_array(array_distinct(flatten(collect_list(col("__codes")))))
          .as("author_roles"),
        sort_array(array_distinct(flatten(collect_list(col("__specialties")))))
          .as("author_specialties"),
        sort_array(array_distinct(collect_list(col("__pname"))))
          .as("author_names")
      )
  }
}

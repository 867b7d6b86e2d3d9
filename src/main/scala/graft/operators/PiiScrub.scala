package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus PII redaction — the pretraining-pipeline counterpart
  * of the FHIR-aware de-identification in `graft.deid` (which handles
  * structured resources and clinical notes; this handles free-text web
  * corpora where only pattern-level PII can exist).
  *
  * Pure `Column` expression trees over `regexp_count`/`regexp_replace`
  * builtins: per-row kernels inside whole-stage codegen, zero shuffles,
  * scales embarrassingly. The patterns stay inside the regex subset that
  * Java regex and RE2 (the DuckDB oracle) interpret identically — no
  * backreferences, no lookaround — so redaction is engine-exact and q102
  * hash-checks it.
  *
  * Redaction order is fixed (email → SSN → phone → IPv4) and counts are
  * taken on the ORIGINAL text, so counting and replacing commute the
  * same way on every engine. Replacement tokens contain no digits or
  * `@`, so earlier replacements can never create later matches.
  */
object PiiScrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The four (pattern, replacement) rules in redaction order. */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", EmailPattern, "[EMAIL]"),
    ("ssn", SsnPattern, "[SSN]"),
    ("phone", PhonePattern, "[PHONE]"),
    ("ip", Ipv4Pattern, "[IP]"))

  /** Redacted text column. */
  def scrubText(text: Column): Column =
    Rules.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Appends `scrubbed` + one `n_<rule>` count column per rule (counts
    * over the original text) + `n_pii` total.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val counted = Rules.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(text, lit(pat)).cast("long"))
    }
    counted
      .withColumn("n_pii",
        Rules.map { case (name, _, _) => col(s"n_$name") }.reduce(_ + _))
      .withColumn("scrubbed", scrubText(text))
  }
}

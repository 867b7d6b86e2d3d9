package graft.deid

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Philter-lite, regex subset (SURVEY §7.4 risk 4, option (a)): the
  * reference's philter pass (deid/philter.py:13-43) combines 1,904 lines
  * of regex + POS-tag rules; the POS component is Python-only, so this
  * engine ships the high-signal regex subset as a codegen'd
  * regexp_replace chain — each match replaced by '*' runs of equal
  * length, preserving offsets like the reference does. Fidelity drift
  * from the full philter is expected and documented; the pass is
  * opt-in, mirroring the reference's default-off flag (etl/cli.py:27-29).
  */
object Philter {

  /** PHI-shaped patterns, most specific first. Public, standard formats
    * (the same categories philter's regex rules target: identifiers,
    * contact info, dates, network addresses, extreme ages).
    */
  private[deid] val patterns: Seq[String] = Seq(
    "\\b\\d{3}-\\d{2}-\\d{4}\\b", // SSN
    "\\b\\(?\\d{3}\\)?[-. ]\\d{3}[-.]\\d{4}\\b", // US phone
    "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\b", // email
    "(?i)\\b(mrn|medical record number)[:# ]*\\d+\\b", // labeled MRN
    "(?i)\\bhttps?://[^\\s]+", // URL
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", // IPv4
    "\\b\\d{1,2}/\\d{1,2}/\\d{2,4}\\b", // slash date
    "\\b\\d{4}-\\d{2}-\\d{2}\\b", // ISO date
    "(?i)\\b(?:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)[a-z]*\\.? \\d{1,2},? \\d{4}\\b", // written date
    "(?i)\\b(?:aged?|age:) (?:9\\d|1[0-9]\\d)\\b", // ages 90+ (HIPAA >89)
    "\\b\\d{7,10}\\b" // bare long id runs
  )

  /** Patterns compiled ONCE (driver side, shipped in the task closure):
    * Pattern.compile dominates matching cost and java.util.regex.Pattern
    * is Serializable.
    */
  private lazy val compiled: Seq[java.util.regex.Pattern] =
    patterns.map(java.util.regex.Pattern.compile)

  /** Replace each PHI match with '*' of the same length (offset-stable,
    * like philter's asterisk masking). ONE UDF invocation runs every
    * precompiled pattern over the value in a single pass — per-row regex
    * masking has no codegen equivalent (no per-match callbacks in SQL),
    * and one boundary crossing beats one per pattern. Applied only when
    * philter is enabled, off the default hot path.
    */
  def scrubText(c: Column): Column = maskAllUdf(c)

  private val maskAllUdf =
    udf { (text: String) =>
      if (text == null) null
      else {
        val sb = new StringBuilder(text)
        compiled.foreach { p =>
          val m = p.matcher(sb)
          while (m.find()) {
            var i = m.start
            while (i < m.end) { sb.setCharAt(i, '*'); i += 1 }
          }
        }
        sb.toString
      }
    }
}

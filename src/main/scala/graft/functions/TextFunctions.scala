package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document pipelines:
  * tokenization, quality stats, fingerprinting, language ID.
  *
  * All of these are pure `Column` expression trees built from Spark
  * builtins + higher-order array functions, so they stay inside
  * whole-stage codegen — no UDF in the hot path except [[langIdUdf]]
  * (profile table lookup) which is applied once per document.
  */
object TextFunctions {

  /** Whitespace tokenization, trimming first so trailing blanks don't
    * produce empty tokens. Empty text → empty array (not [""]).
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Distinct-token count (vocabulary size of the document). */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Type-token ratio: |distinct| / |tokens| — a repetition/quality
    * signal (≈1 diverse, →0 degenerate repetition).
    */
  def typeTokenRatio(text: Column): Column = {
    val n = size(tokens(text))
    when(n === 0, lit(0.0))
      .otherwise(size(array_distinct(tokens(text))).cast("double") /
        n.cast("double"))
  }

  /** Ratio of alphabetic characters to all characters. */
  def alphaRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
        n.cast("double"))
  }

  /** Ratio of punctuation characters (fixed class for engine parity). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^.,!?;:'\"()-]", "")).cast("double") /
        n.cast("double"))
  }

  /** Mean token length, 0 for empty docs. */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(ts).cast("double"))
  }

  /** Stopword ratio against a caller-provided list (broadcast literal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ts = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(ts) === 0, lit(0.0)).otherwise(
      size(filter(ts, t => array_contains(sw, t))).cast("double") /
        size(ts).cast("double"))
  }

  /** Word n-grams as space-joined strings (shingles for dedup). Documents
    * shorter than n yield a single shingle of the whole text.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val ts = tokens(text)
    val count = greatest(size(ts) - (n - 1), lit(1))
    transform(
      sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(ts, i + 1, lit(n)))
    )
  }

  /** Rolling-hash document fingerprint: min of xxhash64 over word 5-gram
    * shingles (winnowing-style min-sampling; SURVEY §7.5). Equal
    * fingerprints ⇒ likely shared 5-gram content.
    */
  def fingerprint(text: Column, n: Int = 5): Column =
    array_min(transform(wordNgrams(text, n), g => xxhash64(g)))

  /** BPE-ish subword count estimate: whitespace tokens split further at
    * letter/digit/other boundaries (a cheap proxy for tokenizer cost).
    */
  def subwordCount(text: Column): Column =
    size(
      filter(
        split(
          regexp_replace(
            trim(text),
            "([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+)",
            "$1"
          ),
          "[\\s]+"
        ),
        t => length(t) > 0
      )
    ).cast("long")

  // --- language ID -------------------------------------------------------

  /** Tiny per-language character-trigram profiles (hand-built from common
    * function words; public-knowledge linguistics, no external data).
    */
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ",
      "ing", "ng ", " to", "to ", "ion", " in", "ed "),
    "de" -> Seq(" de", "der", "er ", "ie ", " di", "die", "und", " un",
      "nd ", "ein", "ch ", "sch", "en ", "ung", " ge"),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", " la", "la ", "ent",
      "nt ", "que", " qu", "ue ", "les", " et", "et "),
    "es" -> Seq(" de", "de ", " la", "la ", "el ", " el", "os ", " en",
      "en ", "que", " qu", "ue ", "ión", "ado", "ar "),
    "it" -> Seq(" di", "di ", " la", "la ", "to ", " il", "il ", "re ",
      "one", "la ", " co", "del", " de", "che", " ch")
  )

  /** Heuristic language ID: CJK-range detection first, else the language
    * whose trigram profile has the most hits in the text. Deterministic
    * tie-break on language code. Applied once per document (driver-side
    * profile map, executor-side pure function).
    */
  val langIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null || text.isEmpty) "und"
      else {
        val cjk = text.codePoints().toArray.count(cp =>
          (cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3040 && cp <= 0x30ff))
        if (cjk * 4 > text.length) "zh"
        else {
          val lower = " " + text.toLowerCase + " "
          val scored = profiles.toSeq.map { case (lang, grams) =>
            (lang, grams.count(lower.contains))
          }
          val best = scored.sortBy { case (lang, hits) => (-hits, lang) }.head
          if (best._2 == 0) "und" else best._1
        }
      }
    }

  def langId(text: Column): Column = langIdUdf(text)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-span REMOVAL — the consumer of [[SuffixRank]] and
  * the transform half of "Deduplicating Training Data Makes Language
  * Models Better" (Lee et al., 2022): find every occurrence of a
  * spanLen-character span that appears more than once in the corpus,
  * keep the globally-first occurrence of each span class, and cut the
  * characters covered by all other occurrences out of their
  * documents.
  *
  * Semantics, fully deterministic and integer-only (which is what
  * lets an external SQL engine reproduce the cleaned text
  * byte-for-byte):
  *   1. positions with a FULL spanLen window (pos ≤ len − spanLen + 1)
  *      are classed by their [[SuffixRank]] rank — equal rank ⇔
  *      identical spanLen-char span;
  *   2. a position is a duplicate occurrence iff its class has ≥ 2
  *      members and it is not the class minimum under the total order
  *      (doc, pos) — one canonical occurrence always survives;
  *   3. a character is covered iff some duplicate position's
  *      [pos, pos+spanLen−1] window contains it; maximal covered runs
  *      (interval union) are the cut list;
  *   4. the cleaned document is the concatenation of the uncovered
  *      segments, in order.
  *
  * Scale shape: the rank ladder is [[SuffixRank.rank]]; class stats
  * are one window over the rank key (the hottest class — the most
  * duplicated span — costs its member count, linear; the
  * aggregate+probe-join alternative was measured slower, see the
  * in-body note); interval union is the classic gaps-and-islands
  * pair of per-DOC windows; the cut application joins each doc to its
  * own (bounded-by-length) interval list. No stage is quadratic in
  * anything and no driver state exists.
  */
object SpanDedup {

  /** Position-key bound: (doc, pos) is totalled as doc·POS_BOUND + pos
    * so the class minimum is a plain integer MIN in every engine; docs
    * longer than this would alias (enforced).
    */
  private val PosBound = 100000L

  /** (id, cut_start, cut_end): maximal character runs (1-based,
    * inclusive) covered by non-canonical occurrences of
    * corpus-duplicated spanLen-char spans.
    */
  def cutIntervals(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanLen: Int = 32,
      initChars: Int = 32): DataFrame = {
    require(initChars >= spanLen,
      s"initChars=$initChars < spanLen=$spanLen: span classing needs " +
        "the direct-rank regime (see SuffixRank.fullWindowsOnly)")
    val lens = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        length(col(textCol)).cast("long").as("__len"))
    // the (doc, pos) total order as one integer so "globally first
    // occurrence" is MIN in any engine; guarded, not assumed — and
    // checked BEFORE the (eager, expensive) ranking pass so a
    // contract violation fails fast instead of after the suffix sort
    val guard = lens.filter(col("__len") >= PosBound).limit(1).collect()
    require(guard.isEmpty,
      s"document longer than $PosBound chars aliases the position key")
    // fullWindowsOnly: the ranking itself drops short-window positions,
    // so the corpus-sized (ranked ⋈ lens) join + filter this used to do
    // is gone outright (guide §2.4 remove shuffles / §2.3 fewer bytes:
    // the explode, the dense-rank key table, and every downstream
    // shuffle shed the per-doc short-window tail). Rank VALUES differ
    // from the all-positions ranking but the class structure — all this
    // consumer uses — is identical (equal rank ⇔ identical span).
    val ranked = SuffixRank.rank(docs, idCol, textCol, spanLen, initChars,
      fullWindowsOnly = true)
    val full = ranked
      .withColumn("__key", col("id") * PosBound + col("pos"))
    // ONE pass over the position table: the rank-class window (count +
    // canonical-min over the same partition spec = a single shuffle +
    // sort) then the duplicate filter. The tempting aggregate+probe-
    // join rewrite was MEASURED SLOWER at 30M positions (177s vs 129s:
    // it needs `full` twice, so a corpus-sized checkpoint write plus a
    // second 30M-row pass outweigh the sort it saves) — keep the
    // window.
    val wc = Window.partitionBy("rank")
    val dups = full
      .withColumn("__n", count(lit(1)).over(wc))
      .withColumn("__firstKey", min(col("__key")).over(wc))
      .filter(col("__n") > 1 && col("__key") =!= col("__firstKey"))
      .select(col("id"), col("pos"))
    // interval union (gaps and islands): every interval has the same
    // length, so the running max end over previous rows is
    // max(prev pos) + spanLen − 1; a position beyond prevMax + 1
    // starts a new island (adjacent runs merge — coverage is about
    // CHARACTERS, and adjacent covered chars are one run)
    val wd = Window.partitionBy("id").orderBy("pos")
    val prevMax = max(col("pos") + (spanLen - 1))
      .over(wd.rowsBetween(Window.unboundedPreceding, -1))
    dups
      .withColumn("__prevMax", prevMax)
      .withColumn("__new",
        when(col("__prevMax").isNull ||
          col("pos") > col("__prevMax") + 1, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wd))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("pos")).as("cut_start"),
        (max(col("pos")) + (spanLen - 1)).as("cut_end"))
      .select("id", "cut_start", "cut_end")
  }

  /** (id, clean_text): every document with its covered runs removed
    * (documents with nothing to cut pass through unchanged).
    */
  def removeSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanLen: Int = 32,
      initChars: Int = 32): DataFrame = {
    val cuts = cutIntervals(docs, idCol, textCol, spanLen, initChars)
    // disjoint intervals: sorting starts and ends independently keeps
    // them paired, so two primitive arrays beat a struct collect
    val perDoc = cuts.groupBy("id")
      .agg(sort_array(collect_list(col("cut_start"))).as("__ss"),
        sort_array(collect_list(col("cut_end"))).as("__es"))
    val cutUdf = udf {
      (text: String, ss: Seq[Long], es: Seq[Long]) =>
        val sb = new StringBuilder(text.length)
        var from = 1L // 1-based next uncut char
        var i = 0
        while (i < ss.length) {
          if (ss(i) > from)
            sb.append(text.substring(from.toInt - 1, ss(i).toInt - 1))
          from = es(i) + 1
          i += 1
        }
        if (from <= text.length)
          sb.append(text.substring(from.toInt - 1))
        sb.toString
    }
    docs
      .select(col(idCol).as("id"), col(textCol).as("__t"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        when(col("__ss").isNull, col("__t"))
          .otherwise(cutUdf(col("__t"), col("__ss"), col("__es")))
          .as("clean_text"))
  }
}

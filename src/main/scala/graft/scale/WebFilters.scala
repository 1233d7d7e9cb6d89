package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Cleaning.qcol

/** C4/FineWeb-style web-corpus line filters (Raffel 2020 §2.2's
  * cleaning heuristics, re-expressed as one row-local flag pass) —
  * the rule layer a crawl pipeline runs BEFORE the model-based quality
  * scores this repo already has (Gopher, classifier floor): drop
  * boilerplate-bearing pages (code braces, lorem ipsum placeholder,
  * cookie/policy notices) and keep only pages with enough real
  * sentence-like lines.
  *
  * A LINE is kept when it has at least `minWordsPerLine` whitespace
  * words AND ends in a terminal character (`.`, `!`, `?`, or a closing
  * quote after one — C4's "terminal punctuation" rule); a DOCUMENT is
  * kept when none of the boilerplate flags fire and at least
  * `minKeptLines` lines survive. C4's published defaults are 5 words
  * and 3 lines; both are parameters.
  *
  * Scale: entirely row-local (split + a linear pass over each doc's
  * lines — work proportional to the bytes any implementation must
  * read); no shuffle, no UDF, a codegen-friendly single projection.
  * Composes with [[Curation.curate]]'s quality floor as the cheap
  * first stage: at 100 TB the rule layer deletes the bulk before any
  * model scores run.
  */
object WebFilters {

  /** The C4 policy-phrase screen (lowercased substring match). */
  val DefaultPolicyPhrases: Seq[String] =
    Seq("uses cookies", "privacy policy", "terms of use", "cookie policy")

  /** Per-document flag table: the input columns plus
    * `has_brace`, `has_lorem`, `has_policy`, `n_lines`,
    * `n_kept_lines`, `kept_ratio_micro` (kept/total, half-up micro; 0
    * for empty docs), and the composite `keep`. */
  def c4LineFilters(
      docs: DataFrame, textCol: String = "text",
      minWordsPerLine: Int = 5, minKeptLines: Int = 3,
      policyPhrases: Seq[String] = DefaultPolicyPhrases): DataFrame = {
    require(minWordsPerLine >= 1, "c4LineFilters: minWordsPerLine must be >= 1")
    require(minKeptLines >= 1, "c4LineFilters: minKeptLines must be >= 1")
    require(policyPhrases.nonEmpty, "c4LineFilters: need at least one policy phrase")
    val t = coalesce(qcol(textCol).cast("string"), lit(""))
    val low = lower(t)
    val lines = split(t, "\n", -1)
    // terminal rule: ends in . ! ? or a "/' immediately after one —
    // spelled as endsWith over the 9 literal suffixes (no negative
    // substring indexing, whose out-of-range behavior is engine-local)
    val terminalSuffixes =
      for (p <- Seq(".", "!", "?"); q <- Seq("", "\"", "'")) yield p + q
    val lastOk: Column => Column = l =>
      terminalSuffixes.map(sfx => l.endsWith(lit(sfx))).reduce(_ || _)
    val keptLine: Column => Column = l =>
      size(split(trim(l), "\\s+", -1)) >= minWordsPerLine && lastOk(trim(l))
    val nLines = size(lines)
    val nKept = size(filter(lines, keptLine))
    docs
      .withColumn("has_brace", t.contains("{") || t.contains("}"))
      .withColumn("has_lorem", low.contains("lorem ipsum"))
      .withColumn("has_policy",
        policyPhrases.map(p => low.contains(p.toLowerCase)).reduce(_ || _))
      .withColumn("n_lines", nLines.cast("long"))
      .withColumn("n_kept_lines", nKept.cast("long"))
      .withColumn("kept_ratio_micro",
        when(nLines > 0,
          floor(nKept.cast("double") / nLines.cast("double") * lit(1000000.0)
            + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("keep",
        !col("has_brace") && !col("has_lorem") && !col("has_policy") &&
          col("n_kept_lines") >= minKeptLines)
  }

  /** Template/boilerplate prefix detection — the structural dedup
    * signal the hash families miss: template-stamped pages (mailers,
    * listing pages, auto-generated posts) share their first `k`
    * characters verbatim while differing later, so a prefix whose
    * share within a slice is abnormal marks a template. Returns one
    * row per (slice, prefix) with `n` occurrences past `minCount`,
    * the slice total and the exact integer share — feed high-share
    * prefixes into the blocklist/near-dup path.
    *
    * Scale: one (slice, prefix) aggregate + one |slices|-row total
    * aggregate broadcast back. Prefixes are `prefixChars` bytes — the
    * shuffle carries a fixed-width key, never the documents.
    */
  def templatePrefixShares(
      docs: DataFrame, sliceCol: String, textCol: String = "text",
      prefixChars: Int = 24, minCount: Long = 2L): DataFrame = {
    require(prefixChars >= 1, "templatePrefixShares: prefixChars must be >= 1")
    require(minCount >= 1, "templatePrefixShares: minCount must be >= 1")
    val p = docs
      .filter(qcol(sliceCol).isNotNull && qcol(textCol).isNotNull)
      .select(qcol(sliceCol).as("slice"),
        substring(qcol(textCol), 1, prefixChars).as("prefix"))
    val counts = p.groupBy(col("slice"), col("prefix"))
      .agg(count(lit(1)).as("n"))
    val totals = p.groupBy(col("slice")).agg(count(lit(1)).as("slice_total"))
    counts.filter(col("n") >= minCount)
      .join(broadcast(totals), Seq("slice"))
      .withColumn("share_micro", expr("(n * 1000000L) div slice_total"))
  }
}

package graft.scale

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** C4 line filters: the terminal-punctuation/word-count line rule, the
  * three boilerplate flags, and the composite keep decision.
  */
class WebFiltersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("line rule: word count + terminal punctuation, quotes after punctuation count") {
    val docs = Seq(
      (1L, "This is a proper sentence line.\nshort.\nno terminal punctuation here\nHe said \"this line ends in a quote.\"\nAnother full sentence ends right here!"),
      (2L, ""),
      (3L, "one two three four five")
    ).toDF("doc_id", "text")
    val out = WebFilters.c4LineFilters(docs, "text", minWordsPerLine = 5, minKeptLines = 3)
      .select("doc_id", "n_lines", "n_kept_lines", "kept_ratio_micro", "keep")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // doc 1: 5 lines; kept = line1 (6 words, '.'), line4 (quote after '.'), line5 ('!')
    assert(out(1L) === ((5L, 3L, 600000L, true)))
    // empty doc: split('') -> one empty line, nothing kept
    assert(out(2L) === ((1L, 0L, 0L, false)))
    // enough words but no terminal punctuation
    assert(out(3L) === ((1L, 0L, 0L, false)))
  }

  test("boilerplate flags: brace, lorem ipsum, policy phrases each veto keep") {
    val docs = Seq(
      (1L, "A clean first sentence stands here.\nA clean second sentence stands here.\nA clean third sentence stands here."),
      (2L, "A clean first sentence stands here.\nA clean second sentence stands here.\nfunction f() { return 1; }\nA clean third sentence stands here."),
      (3L, "Lorem Ipsum dolor sit amet is here.\nA clean second sentence stands here.\nA clean third sentence stands here."),
      (4L, "This website uses cookies to track you.\nA clean second sentence stands here.\nA clean third sentence stands here.")
    ).toDF("doc_id", "text")
    val out = WebFilters.c4LineFilters(docs, "text")
      .select("doc_id", "has_brace", "has_lorem", "has_policy", "keep")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((false, false, false, true)))
    assert(out(2L) === ((true, false, false, false)))
    assert(out(3L) === ((false, true, false, false)))  // case-insensitive
    assert(out(4L) === ((false, false, true, false)))
  }

  test("templatePrefixShares: shared k-char prefixes surface with exact shares") {
    val docs = Seq(
      (1L, "s0", "Subscribe now! offer one"),
      (2L, "s0", "Subscribe now! offer two"),
      (3L, "s0", "Subscribe now! offer three"),
      (4L, "s0", "completely organic text"),
      (5L, "s1", "Subscribe now! elsewhere"),
      (6L, "s1", "other text entirely here")
    ).toDF("doc_id", "source", "text")
    val got = WebFilters.templatePrefixShares(docs, "source", "text",
        prefixChars = 14, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // only s0's template passes minCount; share = 3/4
    assert(got.size === 1)
    assert(got(("s0", "Subscribe now!")) === ((3L, 4L, 750000L)))
  }

  test("minKeptLines gate: two good lines fail the default 3-line floor") {
    val docs = Seq((1L, "A clean first sentence stands here.\nA clean second sentence stands here."))
      .toDF("doc_id", "text")
    val out = WebFilters.c4LineFilters(docs, "text").select("n_kept_lines", "keep").collect()
    assert(out(0).getLong(0) === 2L && !out(0).getBoolean(1))
  }
}

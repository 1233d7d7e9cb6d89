package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE application — the "encode the full corpus with a learned
  * merge table" hot path of [[graft.scale.TextAnalysis]].
  *
  * The composed form ([[graft.scale.TextAnalysis.bpeEncodeComposed]])
  * folds the merge table into `merges` nested literal `regexp_replace`
  * passes: one full regex scan of every word representation PER MERGE,
  * and an expression tree whose depth equals the vocabulary size. At
  * the 6-merge gate that is a neat narrow plan; at a production
  * 32k-merge vocabulary janino cannot even compile the tree, and the
  * work is O(merges × corpus). This expression computes the identical
  * result in one pass per word with the standard tokenizer algorithm:
  * repeatedly find the adjacent unit pair with the LOWEST merge rank
  * and merge all its occurrences leftmost-first, until no adjacent
  * pair is ranked — O(word × applied-merges), independent of the
  * vocabulary size.
  *
  * Bit-exactness with the composed form (and hence with the unrolled
  * DuckDB oracle) is argued case by case:
  *
  *  - The composed form applies merges SEQUENTIALLY in rank order, one
  *    leftmost-first non-overlapping `replace` pass each. The min-rank
  *    greedy loop is equivalent iff applying merge k never creates a
  *    new occurrence of a merge j <= k. A new adjacency after merge k
  *    always involves the new unit s = left_k + right_k; a pair
  *    involving s can be in the table at rank j only if the unit
  *    string s existed during FIT before round j — impossible when all
  *    merge output strings are distinct (s is then creatable only by
  *    merge k itself; initial units are single code points, shorter
  *    than s; glued units from line-terminator words always contain a
  *    terminator or bar, which s — built from bar-free, terminator-free
  *    units — never does). [[MergeTable.canUseGreedy]] checks this
  *    precondition at build time (distinct outputs + every side
  *    constructible below its rank, so it also holds for arbitrary
  *    SQL-supplied tables, not just fit-produced ones); tables that
  *    fail it take the exact sequential path instead.
  *  - Words containing code points Java's `(.)` regex does NOT match
  *    (the line terminators \n \r U+0085 U+2028 U+2029 — only the last
  *    three survive the `\s+` word split) produce partially-wrapped
  *    representations whose unit structure the bar-delimited replace
  *    sees differently; such words are simulated exactly at the
  *    representation-string level (literal `String.replace` has the
  *    same leftmost-first non-overlapping semantics as the
  *    quoted-literal `regexp_replace`).
  *  - The string pipeline before the split (strip `|`, trim ASCII
  *    spaces, lowercase) runs through the same `UTF8String` methods
  *    Spark's `trim`/`lower` expressions call, and the word split uses
  *    `Pattern.split(s, -1)` — the exact call `StringSplit` makes —
  *    so leading/trailing empty-word behavior matches.
  *
  * The merge table rides in the expression as two string arrays —
  * serialized once per task like [[Native.HyperplaneLshKeys]]'s planes;
  * a 32k-merge vocabulary is a few hundred KB, well under task-size
  * limits. Parity with the composed form is pinned by BpeNativeSpec;
  * the >=1k-merge probe the composed form cannot run is
  * [[graft.tools.BpeProbe]].
  */
object Bpe {

  private val Whitespace = Pattern.compile("\\s+")
  private val DoubleBar = Pattern.compile("\\|\\|")

  private def isLineTerminator(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  /** Unit list of a representation string — the exact image of
    * `split(trim(rep, "|"), "\\|\\|")`: strip leading/trailing bar
    * RUNS, then split on double bars keeping leading/trailing empties
    * (Pattern.split limit -1, the call StringSplit makes). Shared with
    * [[graft.scale.TextAnalysis.bpeFitFast]]'s driver loop so the
    * word-histogram fit splits units exactly like the distributed
    * rounds do. */
  private[graft] def splitUnits(rep: String): Array[String] = {
    var from = 0
    var until = rep.length
    while (from < until && rep.charAt(from) == '|') from += 1
    while (until > from && rep.charAt(until - 1) == '|') until -= 1
    DoubleBar.split(rep.substring(from, until), -1)
  }

  /** Lookup structure built once per expression instance (transient —
    * rebuilt per executor after deserialization). */
  final class MergeTable(val lefts: Array[String], val rights: Array[String])
      extends Serializable {
    require(lefts.length == rights.length, "merge table sides differ in length")
    val size: Int = lefts.length

    /** rank lookup: left -> (right -> rank). Nested maps avoid a tuple
      * allocation per adjacent-pair probe in the scan loop. */
    @transient lazy val rank: java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
      val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
      var i = 0
      while (i < size) {
        var inner = m.get(lefts(i))
        if (inner == null) {
          inner = new java.util.HashMap[String, Integer]()
          m.put(lefts(i), inner)
        }
        if (!inner.containsKey(rights(i))) inner.put(rights(i), Integer.valueOf(i))
        i += 1
      }
      m
    }

    /** Precondition for the min-rank greedy loop. Two parts:
      *  - all merge OUTPUT strings are distinct, and
      *  - every merge SIDE is constructible below its rank: a single
      *    code point, or the output of an earlier merge.
      * Together these guarantee a unit equal to output_k can only ever
      * be created by merge k, so no pair involving it is ranked before
      * k and applying merges min-rank-first equals applying them in
      * rank order. Tables from [[graft.scale.TextAnalysis.bpeFit]]
      * satisfy both by construction (except pairs learned from glued
      * line-terminator units — not single code points and not outputs);
      * arbitrary SQL-supplied tables may not, and an
      * adversarially-ordered one (a pair referencing a LATER merge's
      * output) would make the greedy loop apply merges sequential
      * application skips. Failing tables take [[encodeSequential]] —
      * exact at O(merges) per word. */
    @transient lazy val canUseGreedy: Boolean = {
      val outputs = new java.util.HashSet[String](size * 2)
      var i = 0
      var ok = true
      while (ok && i < size) {
        def constructible(s: String): Boolean =
          (s.nonEmpty && s.codePointCount(0, s.length) == 1) || outputs.contains(s)
        ok = constructible(lefts(i)) && constructible(rights(i)) &&
          outputs.add(lefts(i) + rights(i))
        i += 1
      }
      ok
    }
  }

  /** One leftmost-first non-overlapping merge pass over the unit list —
    * the unit-level image of `replace(rep, "|l||r|", "|lr|")`: on a
    * match both units collapse and the scan continues AFTER the merged
    * unit (it can be neither side of another match in the same pass). */
  private def mergePass(units: Array[String], l: String, r: String): Array[String] = {
    val n = units.length
    val out = new Array[String](n)
    var i = 0
    var j = 0
    while (i < n) {
      if (i < n - 1 && units(i) == l && units(i + 1) == r) {
        out(j) = units(i) + units(i + 1)
        i += 2
      } else {
        out(j) = units(i)
        i += 1
      }
      j += 1
    }
    if (j == n) units else java.util.Arrays.copyOf(out, j)
  }

  /** Whether the pair (l, r) occurs adjacently — cheap pre-check so the
    * sequential fallback can skip the vast majority of its passes. */
  private def hasPair(units: Array[String], l: String, r: String): Boolean = {
    var i = 0
    while (i < units.length - 1) {
      if (units(i) == l && units(i + 1) == r) return true
      i += 1
    }
    false
  }

  /** Fast path: min-rank greedy via a doubly-linked unit list + a
    * (rank, position) min-heap — O(len log len) total, so a
    * pathological unbroken megabyte "word" (base64/DNA blobs are real
    * in web crawls) stays tractable where a rescan-per-merge loop
    * would be O(len²).
    *
    * Heap entries are CLAIMS "the pair starting at node i has rank r";
    * a popped claim is re-validated against the live list (node alive,
    * successor alive, current pair's rank equals the claimed rank) and
    * skipped when stale. Equivalence to the pass-based form: claims
    * pop in (rank, position) order, so all occurrences of the minimum
    * rank merge left-to-right before any higher rank — exactly one
    * leftmost-first pass per rank (an overlapping same-rank occurrence
    * dies with its consumed node, reproducing the scan's
    * skip-after-merge); and under [[MergeTable.canUseGreedy]] no merge
    * can create a pair ranked at or below the rank being processed, so
    * no pass would ever need re-running (same argument as the object
    * scaladoc). Requires canUseGreedy.
    */
  private def encodeGreedy(units0: Array[String], t: MergeTable): Array[String] = {
    val n = units0.length
    if (n < 2) return units0
    val unit = units0.clone()
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    val alive = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      next(i) = i + 1 // n == end-of-list sentinel
      prev(i) = i - 1
      alive(i) = true
      i += 1
    }
    def rankOf(l: String, r: String): Int = {
      val inner = t.rank.get(l)
      if (inner == null) Int.MaxValue
      else {
        val rk = inner.get(r)
        if (rk == null) Int.MaxValue else rk.intValue
      }
    }
    // claim key packs (rank, pos) into one Long so natural ordering is
    // rank-major, position-minor
    val heap = new java.util.PriorityQueue[java.lang.Long]()
    def claim(pos: Int): Unit = {
      val j = next(pos)
      if (j < n) {
        val rk = rankOf(unit(pos), unit(j))
        if (rk != Int.MaxValue) heap.add((rk.toLong << 32) | pos.toLong)
      }
    }
    i = 0
    while (i < n - 1) { claim(i); i += 1 }
    var remaining = n
    while (!heap.isEmpty && remaining >= 2) {
      val key = heap.poll().longValue
      val rk = (key >>> 32).toInt
      val pos = (key & 0xffffffffL).toInt
      val j = next(pos)
      if (alive(pos) && j < n && alive(j) && rankOf(unit(pos), unit(j)) == rk) {
        unit(pos) = unit(pos) + unit(j)
        alive(j) = false
        val k = next(j)
        next(pos) = k
        if (k < n) prev(k) = pos
        remaining -= 1
        if (prev(pos) >= 0) claim(prev(pos))
        claim(pos)
      }
    }
    val out = new Array[String](remaining)
    var p = 0
    var o = 0
    while (p < n) {
      if (alive(p)) { out(o) = unit(p); o += 1 }
      p += 1
    }
    out
  }

  /** Exact fallback: every merge in rank order, one pass each, exactly
    * as the composed form replays it. */
  private def encodeSequential(units0: Array[String], t: MergeTable): Array[String] = {
    var units = units0
    var k = 0
    while (k < t.size && units.length >= 2) {
      if (hasPair(units, t.lefts(k), t.rights(k))) {
        units = mergePass(units, t.lefts(k), t.rights(k))
      }
      k += 1
    }
    units
  }

  /** Exact representation-string simulation for words containing line
    * terminators (rare): build the partially-wrapped rep exactly as
    * `regexp_replace(w, "(.)", "|$1|")` would, replay every merge as a
    * literal replace, then split units exactly as
    * `split(trim(rep, "|"), "\\|\\|")` does. Returns (units, n_chars
    * contribution = codePointCount(rep) - 2 * units.length). */
  private def encodeWeird(word: String, t: MergeTable): (Array[String], Long) = {
    val sb = new java.lang.StringBuilder(word.length * 3)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      if (isLineTerminator(cp)) sb.appendCodePoint(cp)
      else { sb.append('|'); sb.appendCodePoint(cp); sb.append('|') }
      i += Character.charCount(cp)
    }
    var rep = sb.toString
    var k = 0
    while (k < t.size) {
      rep = rep.replace("|" + t.lefts(k) + "||" + t.rights(k) + "|",
        "|" + t.lefts(k) + t.rights(k) + "|")
      k += 1
    }
    val units = splitUnits(rep)
    (units, (rep.codePointCount(0, rep.length) - 2L * units.length))
  }

  /** Shared pipeline: text -> words (exactly bpeInit's strip/trim/lower/
    * split) -> per-word final units. Callback per word so stats and
    * token outputs share one implementation. */
  private def encodeWords(text: UTF8String, t: MergeTable)(
      f: (Array[String], Long) => Unit): Int = {
    val stripped = UTF8String.fromString(text.toString.replace("|", ""))
    val trimmed = stripped.trim()
    if (trimmed.numBytes() == 0) return 0
    val words = Whitespace.split(trimmed.toLowerCase.toString, -1)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.isEmpty) {
        // regexp_replace("", "(.)", ...) = ""; split(trim("","|"),"\\|\\|") = [""]
        f(Array(""), -2L)
      } else {
        var weird = false
        var i = 0
        var cps = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          if (isLineTerminator(cp)) weird = true
          cps += 1
          i += Character.charCount(cp)
        }
        if (weird) {
          val (units, chars) = encodeWeird(word, t)
          f(units, chars)
        } else {
          val initial = new Array[String](cps)
          var j = 0
          i = 0
          while (i < word.length) {
            val cp = word.codePointAt(i)
            val cc = Character.charCount(cp)
            initial(j) = word.substring(i, i + cc)
            j += 1
            i += cc
          }
          val units =
            if (t.canUseGreedy) encodeGreedy(initial, t)
            else encodeSequential(initial, t)
          // merges preserve total code points: n_chars = cp(word)
          f(units, cps.toLong)
        }
      }
      w += 1
    }
    words.length
  }

  /** bpe_stats(text) -> struct<n_words, n_units, n_chars> — the
    * token-budget numbers [[graft.scale.TextAnalysis.bpeEncode]]
    * reports, computed in one native pass. */
  case class BpeStats(child: Expression, lefts: Array[String], rights: Array[String])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val table = new MergeTable(lefts, rights)

    override def dataType: DataType = StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_units", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))

    override def nullSafeEval(input: Any): Any = {
      var nUnits = 0L
      var nChars = 0L
      val nWords = encodeWords(input.asInstanceOf[UTF8String], table) { (units, chars) =>
        nUnits += units.length
        nChars += chars
      }
      InternalRow(nWords.toLong, nUnits, nChars)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "bpe_stats"
  }

  /** bpe_tokens(text) -> array<string> — the final post-merge units of
    * every word, flattened in document order (what a token-id mapping
    * join consumes downstream). */
  case class BpeTokens(child: Expression, lefts: Array[String], rights: Array[String])
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val table = new MergeTable(lefts, rights)

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val out = new scala.collection.mutable.ArrayBuffer[UTF8String](64)
      encodeWords(input.asInstanceOf[UTF8String], table) { (units, _) =>
        var i = 0
        while (i < units.length) {
          out += UTF8String.fromString(units(i))
          i += 1
        }
      }
      new GenericArrayData(out.toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "bpe_tokens"
  }
}

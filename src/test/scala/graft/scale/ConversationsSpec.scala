package graft.scale

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Conversation/SFT operators: role-aware dedup must never merge
  * across roles, keeper election must be the earliest (conv, turn),
  * and packing must keep every conversation inside exactly one
  * (shard, pack_id).
  */
class ConversationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def convs = Seq(
    // conv 1: boilerplate on both sides
    (1L, 1L, "user", "thanks!"),
    (1L, 2L, "assistant", "thanks!"),
    (1L, 3L, "user", "how do I reset my password"),
    // conv 2: repeats conv 1's user boilerplate and question
    (2L, 1L, "user", "thanks!"),
    (2L, 2L, "assistant", "click the reset link"),
    (2L, 3L, "user", "how do I reset my password"),
    // conv 3: assistant repeats, plus a unique turn
    (3L, 1L, "assistant", "thanks!"),
    (3L, 2L, "user", "completely unique turn text")
  ).toDF("conv_id", "turn", "role", "text")

  test("turnDedupExact: keeper is earliest (conv, turn), per role — never across roles") {
    val out = Conversations.turnDedupExact(convs)
    val byKey = out.collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn")) ->
      ((r.getAs[String]("role"), r.getAs[Long]("keeper_conv"), r.getAs[Long]("keeper_turn"),
        r.getAs[Long]("dup_count"), r.getAs[Boolean]("is_keeper")))).toMap
    assert(byKey.size == 8) // annotation, not row loss
    // user "thanks!" group: (1,1) keeps, (2,1) is a dup of it
    assert(byKey((1L, 1L)) == (("user", 1L, 1L, 2L, true)))
    assert(byKey((2L, 1L)) == (("user", 1L, 1L, 2L, false)))
    // assistant "thanks!" group is SEPARATE: (1,2) keeps, (3,1) dups
    assert(byKey((1L, 2L)) == (("assistant", 1L, 2L, 2L, true)))
    assert(byKey((3L, 1L)) == (("assistant", 1L, 2L, 2L, false)))
    // question group: earliest is (1,3)
    assert(byKey((1L, 3L))._5 && !byKey((2L, 3L))._5)
    // unique turns are their own keepers
    assert(byKey((3L, 2L)) == (("user", 3L, 2L, 1L, true)))
    // deduped corpus = keepers only: one boilerplate per ROLE survives
    val kept = out.filter(col("is_keeper")).collect()
    assert(kept.count(_.getAs[String]("text") == "thanks!") == 2)
  }

  test("turnDedupExact: NULL role/text turns are grouped and annotated, never dropped") {
    val withNulls = Seq(
      (1L, 1L, "user", "hello"),
      (2L, 1L, null.asInstanceOf[String], "hello"),   // null role, twice
      (3L, 1L, null.asInstanceOf[String], "hello"),
      (4L, 1L, "user", null.asInstanceOf[String]),    // null text, twice
      (5L, 1L, "user", null.asInstanceOf[String])
    ).toDF("conv_id", "turn", "role", "text")
    val out = Conversations.turnDedupExact(withNulls)
    // every input turn survives the annotation join (null-safe <=>)
    assert(out.count() === 5)
    // the two null-role turns form ONE group (DuckDB GROUP BY parity):
    // keeper = conv 2, dup_count = 2
    val nullRole = out.filter(col("role").isNull)
      .select(col("conv_id"), col("keeper_conv"), col("dup_count"), col("is_keeper"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted
    assert(nullRole.toSeq === Seq((2L, 2L, 2L, true), (3L, 2L, 2L, false)))
    val nullText = out.filter(col("text").isNull)
      .select(col("conv_id"), col("keeper_conv"), col("dup_count"), col("is_keeper"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted
    assert(nullText.toSeq === Seq((4L, 4L, 2L, true), (5L, 4L, 2L, false)))
  }

  test("turnDedupNearPairs: same-role pairs only, endpoints decode correctly") {
    val near = Seq(
      (1L, 1L, "user", "the quick brown fox jumps over the lazy dog"),
      (2L, 5L, "user", "the quick brown fox jumps over the lazy cat"),
      (3L, 2L, "assistant", "the quick brown fox jumps over the lazy dog"),
      (4L, 1L, "assistant", "entirely different content here")
    ).toDF("conv_id", "turn", "role", "text")
    val pairs = Conversations.turnDedupNearPairs(near, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the user fox pair is found; the cross-role identical pair
    // (1,1)x(3,2) must NOT appear
    assert(pairs.contains((1L, 1L, 2L, 5L)))
    assert(!pairs.exists(p => (p._1, p._2) == ((1L, 1L)) && (p._3, p._4) == ((3L, 2L))))
    assert(!pairs.exists(p => (p._1, p._2) == ((3L, 2L)) || (p._3, p._4) == ((3L, 2L))))
  }

  test("packConversations: every conversation lands in exactly one (shard, pack_id)") {
    val big = (0L until 400L).map { i =>
      (i % 40, i / 40 + 1, if (i % 2 == 0) "user" else "assistant",
        s"turn $i with some words " + ("pad " * (i % 7).toInt))
    }.toDF("conv_id", "turn", "role", "text")
    val packed = Conversations.packConversations(big, budget = 64, shards = 4)
    // conversation-level manifest: one row per conversation
    assert(packed.count() == 40)
    assert(packed.select("conv_id").distinct().count() == 40)
    // turns inherit their conversation's single placement — join back
    // and check each conversation maps to exactly one (shard, pack)
    val placements = big.join(packed, "conv_id")
      .groupBy("conv_id")
      .agg(countDistinct(struct(col("shard"), col("pack_id"))).as("n_places"))
      .agg(max("n_places")).head().getLong(0)
    assert(placements == 1L)
    // equivalence with packByCount over the conversation aggregate
    val perConv = big.groupBy(col("conv_id"))
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n"))
    val direct = TextAnalysis.packByCount(perConv, "conv_id", "n", 64, 4)
      .collect().toSet
    assert(packed.collect().toSet == direct)
  }

  test("packConversations never splits even a conversation larger than the budget") {
    val giant = (1L to 30L).map(t => (7L, t, "user", "w " * 50)).toDF("conv_id", "turn", "role", "text")
    val packed = Conversations.packConversations(giant, budget = 64, shards = 2).collect()
    assert(packed.length == 1) // one atomic unit, one placement
    assert(packed.head.getAs[Long]("token_count") == 1500L)
  }

  test("truncateToBudget keeps the newest-turn suffix within budget; newest always survives") {
    val data = Seq(
      // conv 1: turns of 10/20/30/40 tokens — budget 60 keeps suffix {4,3} (70 would include turn 2)
      (1L, 1L, "user", "w " * 10), (1L, 2L, "assistant", "w " * 20),
      (1L, 3L, "user", "w " * 30), (1L, 4L, "assistant", "w " * 40),
      // conv 2: newest turn alone blows the budget — still kept
      (2L, 1L, "user", "w " * 5), (2L, 2L, "assistant", "w " * 500)
    ).toDF("conv_id", "turn", "role", "text")
    val out = Conversations.truncateToBudget(data, budget = 60)
      .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn")) ->
        ((r.getAs[Long]("turn_tokens"), r.getAs[Boolean]("kept")))).toMap
    assert(out((1L, 4L)) == ((40L, true)))
    assert(out((1L, 3L)) == ((30L, false))) // 40+30=70 > 60
    assert(out((1L, 2L)) == ((20L, false)) && out((1L, 1L)) == ((10L, false)))
    assert(out((2L, 2L)) == ((500L, true)))  // newest always kept
    assert(out((2L, 1L)) == ((5L, false)))
    // a conversation fully inside the budget keeps everything
    val small = Seq((3L, 1L, "user", "a b"), (3L, 2L, "assistant", "c d e"))
      .toDF("conv_id", "turn", "role", "text")
    assert(Conversations.truncateToBudget(small, budget = 60)
      .filter(!col("kept")).count() == 0)
  }

  test("conversationStats: shape profile per conversation") {
    val got = Conversations.conversationStats(convs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // conv 1: 3 turns, 2 roles, tokens 1+1+6=8, max 6, turns 1..3
    assert(got(1L) == ((3L, 2L, 8L, 6L, 1L, 3L)))
    // conv 3: 2 turns, 2 roles, tokens 1+4=5
    assert(got(3L) == ((2L, 2L, 5L, 4L, 1L, 2L)))
  }

  test("conversationOverlapPairs: exact turn-set jaccard, df cap drops boilerplate, role-aware") {
    val data = Seq(
      // convs 1 and 2 share 2 of 3 distinct turns each -> j = 2/4 = 0.5
      (1L, "user", "shared q1"), (1L, "assistant", "shared a1"), (1L, "user", "only in 1"),
      (2L, "user", "shared q1"), (2L, "assistant", "shared a1"), (2L, "user", "only in 2"),
      // conv 3 shares "shared q1" but as ASSISTANT -> not the same turn
      (3L, "assistant", "shared q1"), (3L, "user", "unrelated"), (3L, "user", "more unrelated"),
      // boilerplate in every conv: df=4 > cap=3 -> dropped before pairing
      (1L, "user", "thanks!"), (2L, "user", "thanks!"), (3L, "user", "thanks!"), (4L, "user", "thanks!"),
      (4L, "user", "fourth conv body")
    ).toDF("conv_id", "role", "text")
    val got = Conversations.conversationOverlapPairs(
      data, threshold = 0.3, maxTurnDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set((1L, 2L))) // role blocks conv 3; cap blocks the thanks! pairs
    assert(got((1L, 2L)) == ((2L, 3L, 3L, 0.5)))
    // without the boilerplate plant exceeding the cap, raising maxTurnDf
    // lets the boilerplate connect everything — the cap is what holds
    val loose = Conversations.conversationOverlapPairs(
      data, threshold = 0.1, maxTurnDf = 10)
    assert(loose.count() > 1)
  }

  test("alternationAudit: adjacent same-role pairs counted, first/last by turn") {
    val df = Seq(
      (1L, 1L, "user"), (1L, 2L, "assistant"), (1L, 3L, "user"),     // clean
      (2L, 1L, "user"), (2L, 2L, "user"), (2L, 3L, "user"),          // 2 violations
      (3L, 1L, "assistant"), (3L, 2L, "assistant"), (3L, 3L, "user") // starts wrong, 1 violation
    ).toDF("conv_id", "turn", "role")
    val got = Conversations.alternationAudit(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got(1L) === ((3L, 0L, "user", "user")))
    assert(got(2L) === ((3L, 2L, "user", "user")))
    assert(got(3L) === ((3L, 1L, "assistant", "user")))
  }

  test("renderTemplate: segments join in turn order; NULL turn text renders empty") {
    val df = Seq(
      (1L, 2L, "assistant", "hi there"),
      (1L, 1L, "user", "hello"),          // out of order on purpose
      (2L, 1L, "user", null)
    ).toDF("conv_id", "turn", "role", "text")
    val got = Conversations.renderTemplate(df)
      .collect().map(r => r.getAs[Long]("conv_id") ->
        ((r.getAs[Long]("n_turns"), r.getAs[Long]("rendered_chars"),
          r.getAs[String]("rendered")))).toMap
    assert(got(1L) === ((2L, 37L, "<|user|>\nhello\n<|assistant|>\nhi there")))
    assert(got(2L) === ((1L, 9L, "<|user|>\n")))
  }

  test("renderTemplate: rendered_chars counts codepoints, not UTF-16 units") {
    // U+1F600 is a supplementary-plane char: 2 UTF-16 units, 1 codepoint
    val df = Seq((1L, 1L, "user", "😀")).toDF("conv_id", "turn", "role", "text")
    val r = Conversations.renderTemplate(df).collect().head
    assert(r.getAs[Long]("rendered_chars") == 10L) // "<|user|>\n" = 9 + 1
    assert(r.getAs[String]("rendered").length == 11) // Java length = UTF-16 units
  }

  test("lossMaskSpans: spans slice the render exactly; only maskRole turns masked") {
    val df = Seq(
      (1L, 1L, "user", "hello"),
      (1L, 2L, "assistant", "hi there"),
      (1L, 3L, "user", "bye"),
      (2L, 1L, "assistant", "solo answer")
    ).toDF("conv_id", "turn", "role", "text")
    val rendered = Conversations.renderTemplate(df)
      .collect().map(r => r.getAs[Long]("conv_id") -> r.getAs[String]("rendered")).toMap
    val spans = Conversations.lossMaskSpans(df).collect()
    assert(spans.length == 4)
    spans.foreach { r =>
      val (c, role, text) = (r.getAs[Long]("conv_id"), r.getAs[String]("role"),
        r.getAs[String]("text"))
      val (s, e) = (r.getAs[Long]("start_char").toInt, r.getAs[Long]("end_char").toInt)
      val seg = s"<|$role|>\n$text"
      // the cross-op invariant: the span extracts the turn's segment
      assert(rendered(c).substring(s, e) == seg, s"conv $c turn span mismatch")
      assert(r.getAs[Boolean]("masked") == (role == "assistant"))
    }
    // spans never overlap a separator: end of turn 1 + 1 = start of turn 2
    val c1 = spans.filter(_.getAs[Long]("conv_id") == 1L)
      .sortBy(_.getAs[Long]("start_char"))
    assert(c1(0).getAs[Long]("end_char") + 1 == c1(1).getAs[Long]("start_char"))
    assert(c1(1).getAs[Long]("end_char") + 1 == c1(2).getAs[Long]("start_char"))
  }

  test("lossMaskSpans: NULL role renders as empty marker and is never masked") {
    val df = Seq((1L, 1L, null: String, "x"), (1L, 2L, "assistant", "y"))
      .toDF("conv_id", "turn", "role", "text")
    val spans = Conversations.lossMaskSpans(df).collect()
      .sortBy(_.getAs[Long]("turn"))
    assert(spans(0).getAs[Long]("end_char") - spans(0).getAs[Long]("start_char") == 6L) // "<||>\nx"
    assert(!spans(0).getAs[Boolean]("masked"))
    assert(spans(1).getAs[Boolean]("masked"))
    // NULL-role turn still shifts the next turn's offsets (rendering is total)
    assert(spans(1).getAs[Long]("start_char") == 7L)
  }

  test("turnKey encoding is order-preserving and decodable") {
    val pairs = Seq((0L, 0L), (0L, 999999L), (1L, 0L), (5L, 123L), (5L, 124L))
    val keys = pairs.map { case (c, t) => c * Conversations.TurnKeyBase + t }
    assert(keys == keys.sorted)
    pairs.zip(keys).foreach { case ((c, t), k) =>
      assert(k / Conversations.TurnKeyBase == c && k % Conversations.TurnKeyBase == t)
    }
  }
}

package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Cleaning.qcol

/** Conversation/SFT-shaped data operators — multi-turn chat corpora
  * (conv_id, turn, role, text) need two properties the document-level
  * operators don't enforce:
  *
  *  1. **role awareness**: a user turn and an assistant turn with the
  *     same text are NOT duplicates of each other (boilerplate
  *     questions vs boilerplate answers are different training
  *     signals), so every dedup key/block includes the role;
  *  2. **conversation integrity**: packing must never split a
  *     conversation across training windows — a window that opens
  *     mid-conversation orphans the assistant turns from the context
  *     they answer (the grouped analogue of the leakage-safe grouped
  *     split: assignment happens at the GROUP level, members inherit).
  *
  * Turn identity is the encoded `conv_id * TurnKeyBase + turn` long:
  * order-preserving ((c1,t1) < (c2,t2) lexicographically iff the keys
  * compare the same way, given turn < TurnKeyBase), integer-exact in
  * any engine, and decodable with div/mod. API contract (same style as
  * `Stats.weightedQuantile`'s integer-weight precondition): `turn`
  * must be in [0, TurnKeyBase) and `conv_id` non-negative — chat data
  * is thousands of turns per conversation at the extreme, a millionfold
  * margin below the contract bound.
  */
object Conversations {

  /** Turn-key encoding base: supports conversations up to 1e6 turns
    * and conv_ids up to ~9.2e12 without long overflow. */
  val TurnKeyBase = 1000000L

  /** The encoded turn identity (see object doc). */
  def turnKey(convCol: Column, turnCol: Column): Column =
    convCol.cast("long") * TurnKeyBase + turnCol.cast("long")

  /** Role-aware EXACT turn dedup: elects, per (role, text), the keeper
    * turn — the earliest by (conv_id, turn) — and annotates every turn
    * with its group's keeper and multiplicity. Keeper election is an
    * aggregate + equi-join back on the group key (never a window over
    * the turn key — the same scale rule as `dedupLines`). Returns the
    * input columns plus `keeper_conv`, `keeper_turn`, `dup_count`,
    * `is_keeper`; `filter(col("is_keeper"))` is the deduped corpus.
    *
    * NULL parity: a NULL role or text is a real group — DuckDB's
    * GROUP BY groups NULLs together, and Spark's groupBy does too, so
    * the join back must be null-safe (`<=>`); a plain equi-join would
    * silently DROP null-keyed turns instead of annotating them.
    *
    * Scale: two shuffles on (role, text) — one for the election
    * aggregate, one for the join (AQE reuses the co-partitioning;
    * EqualNullSafe keys hash-partition like plain equality).
    * Dup groups concentrate mass exactly where dedup wins, so the
    * aggregate is the reducing side; no driver participation.
    */
  def turnDedupExact(
      convs: DataFrame, convCol: String = "conv_id", turnCol: String = "turn",
      roleCol: String = "role", textCol: String = "text"): DataFrame = {
    val key = turnKey(qcol(convCol), qcol(turnCol))
    val keepers = convs.groupBy(qcol(roleCol), qcol(textCol))
      .agg(min(key).as("__keeper_key"), count(lit(1)).as("dup_count"))
      .withColumnRenamed(roleCol, "__k_role")
      .withColumnRenamed(textCol, "__k_text")
    convs.join(keepers,
        qcol(roleCol) <=> col("__k_role") && qcol(textCol) <=> col("__k_text"))
      .drop("__k_role", "__k_text")
      .withColumn("keeper_conv", expr(s"__keeper_key div $TurnKeyBase"))
      .withColumn("keeper_turn", pmod(col("__keeper_key"), lit(TurnKeyBase)))
      .withColumn("is_keeper", key === col("__keeper_key"))
      .drop("__keeper_key")
  }

  /** Role-aware NEAR-dup turn pairs: n-gram Jaccard with the role
    * folded into the blocking key (cross-role pairs never form — see
    * [[Dedup.nearDupNgram]]'s `extraBlockCols`). Returns
    * (conv_a, turn_a, conv_b, turn_b, jaccard), pair order = encoded
    * turn-key order.
    *
    * Scale: inherits nearDupNgram's contract — blocked bounded
    * quadratic with the deterministic block cap; role blocking only
    * SHRINKS blocks (a block is now per (role, lenband, t0)).
    */
  def turnDedupNearPairs(
      convs: DataFrame, convCol: String = "conv_id", turnCol: String = "turn",
      roleCol: String = "role", textCol: String = "text",
      k: Int = 3, threshold: Double = 0.5,
      maxBlockSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    val keyed = convs.select(
      turnKey(qcol(convCol), qcol(turnCol)).as("__tk"),
      qcol(roleCol).as("__role"), qcol(textCol).as("__text"))
    Dedup.nearDupNgram(keyed, "__tk", "__text", k, threshold, maxBlockSize,
        extraBlockCols = Seq("__role"))
      .select(
        expr(s"id_a div $TurnKeyBase").as("conv_a"),
        pmod(col("id_a"), lit(TurnKeyBase)).as("turn_a"),
        expr(s"id_b div $TurnKeyBase").as("conv_b"),
        pmod(col("id_b"), lit(TurnKeyBase)).as("turn_b"),
        col("jaccard"))
  }

  /** CONVERSATION-level near-dup pairs — two conversations are
    * near-copies when they SHARE most of their turns (re-posted
    * threads, template-stamped dialogues): Jaccard over each
    * conversation's distinct (role, text) turn set, computed EXACTLY
    * by a self-join on shared turns — no hashing, no shingles, so the
    * oracle replays it verbatim. Returns (conv_a, conv_b, shared,
    * size_a, size_b, jaccard) for pairs at or above `threshold`.
    *
    * `maxTurnDf` caps a turn's document frequency (the number of
    * conversations it appears in): boilerplate turns ("thanks!") that
    * occur in a corpus-scale fraction of conversations are dropped
    * BEFORE the pair join — the standard df-cap move (see
    * `Dedup.containmentPairs`): without it the join on a boilerplate
    * turn is O(df²) and grows quadratically with the corpus. Sizes
    * are measured over the CAPPED turn set, so jaccard stays in [0,1]
    * and engines agree.
    *
    * Scale: one distinct + one df-aggregate + a self-equi-join on the
    * (role, text) key whose per-key fan-out is ≤ maxTurnDf², then a
    * per-pair aggregate — bounded quadratic, same contract as the
    * blocked dedup family.
    */
  def conversationOverlapPairs(
      convs: DataFrame, convCol: String = "conv_id",
      roleCol: String = "role", textCol: String = "text",
      threshold: Double = 0.5, maxTurnDf: Int = 64): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"threshold must be in [0,1]")
    require(maxTurnDf >= 2, s"maxTurnDf must be >= 2, got $maxTurnDf")
    val t0 = convs.select(qcol(convCol).as("conv"),
      qcol(roleCol).as("role"), qcol(textCol).as("text")).distinct()
    val dfc = t0.groupBy(col("role"), col("text"))
      .agg(countDistinct(col("conv")).as("__df"))
      .filter(col("__df") <= maxTurnDf)
      .select(col("role"), col("text"))
    val t = t0.join(dfc, Seq("role", "text"))
    val sizes = t.groupBy(col("conv")).agg(count(lit(1)).as("sz"))
    val shared = t.select(col("role"), col("text"), col("conv").as("conv_a"))
      .join(t.select(col("role"), col("text"), col("conv").as("conv_b")),
        Seq("role", "text"))
      .filter(col("conv_a") < col("conv_b"))
      .groupBy(col("conv_a"), col("conv_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("conv").as("conv_a"), col("sz").as("size_a")), "conv_a")
      .join(sizes.select(col("conv").as("conv_b"), col("sz").as("size_b")), "conv_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("size_a") + col("size_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("conv_a"), col("conv_b"), col("shared"),
        col("size_a"), col("size_b"), col("jaccard"))
  }

  /** Conversation shape audit — the per-conversation profile an SFT
    * pipeline reads before packing/truncation (and the filter input
    * for malformed data: single-role conversations, monster turns,
    * non-contiguous turn numbering): turn count, distinct roles, total
    * and max turn token counts, first/last turn index. All integer —
    * engines agree bitwise.
    *
    * Scale: ONE hash aggregate to |conversations| rows.
    */
  def conversationStats(
      convs: DataFrame, convCol: String = "conv_id", turnCol: String = "turn",
      roleCol: String = "role", textCol: String = "text"): DataFrame = {
    val tok = TextAnalysis.tokenCount(qcol(textCol)).cast("long")
    convs.groupBy(qcol(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        countDistinct(qcol(roleCol)).as("n_roles"),
        sum(tok).as("total_tokens"),
        max(tok).as("max_turn_tokens"),
        min(qcol(turnCol).cast("long")).as("first_turn"),
        max(qcol(turnCol).cast("long")).as("last_turn"))
  }

  /** Role-alternation audit — the SFT-shape QC the packer assumes: a
    * chat template expects user/assistant turns to alternate, and a
    * conversation with consecutive same-role turns (merged scrapes,
    * dropped turns, system-message spam) breaks loss masking. Per
    * conversation: turn count, number of adjacent same-role pairs,
    * and the first/last roles (arg-min/max by the unique turn key —
    * deterministic, engine-portable). `n_violations = 0 AND
    * first_role = 'user'` is the standard template precondition.
    *
    * Scale: one conversation-partitioned lag window + one aggregate to
    * |conversations| rows.
    */
  def alternationAudit(
      convs: DataFrame, convCol: String = "conv_id", turnCol: String = "turn",
      roleCol: String = "role"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qcol(convCol)).orderBy(qcol(turnCol))
    convs
      .withColumn("__prev", lag(qcol(roleCol), 1).over(w))
      .groupBy(qcol(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        coalesce(sum(when(qcol(roleCol) === col("__prev"), 1L)), lit(0L))
          .as("n_violations"),
        min_by(qcol(roleCol), qcol(turnCol)).as("first_role"),
        max_by(qcol(roleCol), qcol(turnCol)).as("last_role"))
  }

  /** SFT context-window truncation: keep each conversation's SUFFIX —
    * the most recent turns whose combined whitespace token count fits
    * `budget` — dropping history from the front (the standard chat
    * fine-tuning prep: the latest exchange matters, old context is
    * expendable). The newest turn is ALWAYS kept even if it alone
    * exceeds the budget (dropping it would silently delete the
    * conversation; a trainer truncates tokens inside the turn
    * downstream). Returns the input columns plus `turn_tokens`,
    * `kept` (boolean).
    *
    * API contract (same style as the TurnKeyBase contract above):
    * (convCol, turnCol) must be UNIQUE — the suffix window orders by
    * turn alone, so duplicate (conv_id, turn) rows would make the
    * running sum (and therefore `kept`) nondeterministic across runs
    * and engines. Run [[turnDedupExact]] (or a distinct on the key)
    * first if the input can carry duplicates.
    *
    * Scale: one window per conversation key (turn-descending running
    * sum) — partitioned by the real conversation key, never global.
    */
  def truncateToBudget(
      convs: DataFrame, convCol: String = "conv_id", turnCol: String = "turn",
      textCol: String = "text", budget: Int = 512): DataFrame = {
    require(budget > 0, s"truncateToBudget: budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qcol(convCol)).orderBy(qcol(turnCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    convs
      .withColumn("turn_tokens", TextAnalysis.tokenCount(qcol(textCol)).cast("long"))
      .withColumn("__sfx", sum(col("turn_tokens")).over(w))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(qcol(convCol)).orderBy(qcol(turnCol).desc)))
      .withColumn("kept", col("__rn") === 1 || col("__sfx") <= budget)
      .drop("__sfx", "__rn")
  }

  /** Chat-template rendering: each turn becomes the segment
    * `<|role|>` + newline + text, and a conversation renders as its
    * segments joined by `sep` in turn order — the serialization step
    * between dedup/truncation and tokenization in an SFT pipeline
    * (the template markers are placeholders; swap the literals for a
    * real tokenizer's control tokens, the assembly is the operator).
    * Returns one row per conversation: (convCol, n_turns,
    * rendered_chars, rendered).
    *
    * Assembly is a sorted-struct aggregate (collect turn segments,
    * `array_sort` on the turn key, join) — the same deterministic
    * move as the T5 span-corruption builder, never a window + last().
    * NULL text renders as the empty string and a NULL role as an
    * empty marker (`<||>`): rendering is TOTAL — a malformed turn
    * must show up in the rendered text where a human sees it, not
    * vanish and silently shift every later turn's offsets.
    *
    * API contract (the [[truncateToBudget]] rule): (convCol, turnCol)
    * unique — duplicate turn keys would make the sort order, and so
    * the rendered text, nondeterministic.
    *
    * Scale: one hash aggregate to |conversations| rows; the sort is
    * per-conversation over its own turns (bounded by conversation
    * length, never a shuffle). Character counts are codepoint counts
    * in both engines (Spark `length` = UTF8String.numChars, DuckDB
    * `length` = codepoints), so offsets agree on any script.
    */
  def renderTemplate(
      convs: DataFrame, convCol: String = "conv_id", turnCol: String = "turn",
      roleCol: String = "role", textCol: String = "text",
      sep: String = "\n"): DataFrame = {
    val seg = segment(qcol(roleCol), qcol(textCol))
    convs
      .groupBy(qcol(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(qcol(turnCol).cast("long").as("t"),
              seg.as("s")))),
            x => x.getField("s")),
          sep).as("rendered"))
      .withColumn("rendered_chars", length(col("rendered")).cast("long"))
      .select(qcol(convCol), col("n_turns"), col("rendered_chars"),
        col("rendered"))
  }

  /** Loss-mask spans over [[renderTemplate]]'s output: per turn, the
    * 0-based [start_char, end_char) codepoint span its segment
    * occupies in the rendered conversation, plus `masked` = whether
    * the turn's role is the training-target role (`maskRole`,
    * default assistant). A trainer maps these char spans to token
    * spans after tokenization and zeroes the loss outside them — the
    * standard "learn the assistant turns, condition on the rest" SFT
    * prep. Same template, separator, and uniqueness contract as
    * [[renderTemplate]]; the spec pins the cross-op invariant
    * `substring(rendered, start_char+1, len) == segment` for every
    * turn.
    *
    * Offsets are exact integer window sums: turn i (rank r_i in turn
    * order) starts at sum(seg_len before i) + (r_i - 1) * len(sep) —
    * separators sit BETWEEN segments, so span [start, end) covers the
    * segment only, never its separator.
    *
    * Scale: one conversation-partitioned window pass (running sum +
    * row_number share the frame) — partitioned by the real
    * conversation key, never global.
    */
  def lossMaskSpans(
      convs: DataFrame, convCol: String = "conv_id", turnCol: String = "turn",
      roleCol: String = "role", textCol: String = "text",
      sep: String = "\n", maskRole: String = "assistant"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qcol(convCol)).orderBy(qcol(turnCol))
    val wsum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val sepLen = sep.codePointCount(0, sep.length).toLong
    convs
      .withColumn("__seg_len",
        length(segment(qcol(roleCol), qcol(textCol))).cast("long"))
      .withColumn("__run", sum(col("__seg_len")).over(wsum))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("start_char",
        col("__run") - col("__seg_len") + (col("__rn") - 1L) * sepLen)
      .withColumn("end_char", col("start_char") + col("__seg_len"))
      .withColumn("masked", qcol(roleCol) <=> lit(maskRole))
      .drop("__seg_len", "__run", "__rn")
  }

  /** The per-turn template segment shared by [[renderTemplate]] and
    * [[lossMaskSpans]] — one definition so the render and its offsets
    * can never drift apart. */
  private def segment(role: Column, text: Column): Column =
    concat(lit("<|"), coalesce(role.cast("string"), lit("")), lit("|>"),
      lit("\n"), coalesce(text.cast("string"), lit("")))

  /** Conversation-preserving chat packing: token-sums each conversation
    * (whitespace token count over every turn), then runs the standard
    * shard-partitioned concat-and-chunk layout at the CONVERSATION
    * level — a conversation is one atomic unit, so it can never be
    * split across packs by construction (its turns all inherit the
    * single (shard, pack_id) of their conversation).
    * Returns the conversation-level manifest (convCol, shard,
    * token_count, pack_id, pack_offset); join turns back by convCol
    * for the turn-level layout.
    *
    * Scale: one aggregate to |conversations| rows, then
    * [[TextAnalysis.packByCount]]'s per-shard running-sum window —
    * never a global sort.
    */
  def packConversations(
      convs: DataFrame, convCol: String = "conv_id", textCol: String = "text",
      budget: Int = 512, shards: Int = 8): DataFrame = {
    val perConv = convs.groupBy(qcol(convCol))
      .agg(sum(TextAnalysis.tokenCount(qcol(textCol)).cast("long")).as("__conv_tokens"))
    TextAnalysis.packByCount(perConv, convCol, "__conv_tokens", budget, shards)
  }
}

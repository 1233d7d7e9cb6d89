package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins. AQE's skew-join handling splits
  * oversized SORT-MERGE partitions at runtime, but a replicated salt
  * join is still the explicit tool when one key dominates (the "null
  * key" / "guest user" / "empty string" pathology) and the small side
  * is modest: it spreads the hot key across `salts` tasks
  * deterministically, independent of runtime statistics.
  */
object Skew {

  /** Salted equi-join: the (big, skewed) left side gets a uniform salt
    * in [0, salts); the (small) right side is replicated once per salt
    * value, so every left row still finds its match while the hot key's
    * rows fan out over `salts` reducers instead of one.
    *
    * The salt derives from a row-unique id, NOT the join key (salting
    * by key would put the hot key back in one bucket). Join OUTPUT is
    * exactly the plain join's — the salt is internal — so results stay
    * deterministic and oracle-able even though the salt itself isn't.
    *
    * Cost: |right| × salts replicated rows — use for dimension-sized
    * right sides (or pre-filter to the hot keys and union a plain join
    * of the rest).
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!left.columns.contains("__salt__") && !right.columns.contains("__salt__"),
      "__salt__ column name is reserved by saltedJoin")
    // right/full outer would emit `salts` copies of every unmatched
    // right row (one per replica) — refuse rather than corrupt
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "semi", "anti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-side joins only, got $joinType")
    val l = left.withColumn("__salt__",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt__",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt__"), joinType).drop("__salt__")
  }

  /** Join-key skew audit + salt recommendation — the measurement that
    * decides BETWEEN the mitigations: AQE's skew split handles mild
    * imbalance for free; [[saltedJoin]] pays |right| × salts
    * replication and is only worth it when specific keys are provably
    * hot. This reports the `topK` heaviest keys with, per key: exact
    * row count, corpus share in micro-units (exact integer division —
    * no float drift), the salt factor `saltedJoin` would need to bound
    * each key's reducer at ~`rowsPerTask` rows (`ceil(n /
    * rowsPerTask)`), and a `skewed` verdict (salt > 1). Null keys —
    * THE classic hot key — group under the literal key "null" instead
    * of vanishing from the audit.
    *
    * Scale: one hash aggregate by key (map-side partials), a broadcast
    * 1-row total, then a `topK` TakeOrdered head (count desc, key asc
    * — deterministic) — never a global sort, output is `topK` rows.
    * At 100 TB this is the profile run BEFORE the big join, on the
    * join column only (column-pruned scan).
    */
  def saltAdvisor(
      df: DataFrame, keyCol: String, rowsPerTask: Long,
      topK: Int = 20): DataFrame = {
    require(rowsPerTask > 0, s"rowsPerTask must be positive, got $rowsPerTask")
    require(topK > 0, s"topK must be positive, got $topK")
    val k = Cleaning.qcol(keyCol).cast("string")
    val counts = df
      .groupBy(coalesce(k, lit("null")).as("key"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("n"),
        // exact integer micro-share and ceil-division (long `div`,
        // never a double quotient — a double can round up across the
        // integer boundary the truncation is supposed to floor at)
        expr("n * 1000000 div __t").as("share_micro"),
        expr(s"(n + ${rowsPerTask - 1L}) div ${rowsPerTask}").as("salt"),
        (col("n") > lit(rowsPerTask)).as("skewed"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topK)
  }
}

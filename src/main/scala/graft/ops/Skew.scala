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
}

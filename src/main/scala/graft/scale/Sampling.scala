package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for large-scale pipelines.
  *
  * Random `df.sample()` is non-reproducible across partitionings (seed
  * is per-partition), which breaks both auditability and any oracle
  * check. These samplers are pure functions of the row key: re-runs,
  * re-partitions, and other engines agree exactly.
  *
  * Scale: all variants are a single narrow `filter` — no shuffle, fully
  * pushdown-friendly (the modulo predicate reaches the scan).
  */
object Sampling {

  /** Systematic sampling: keep rows where `key % mod == hit`.
    * Exactly reproducible anywhere; use when the key is uniformly
    * distributed across the modulus (e.g. a dense surrogate id).
    */
  def systematic(df: DataFrame, keyCol: String, mod: Long, hit: Long = 0L): DataFrame = {
    require(mod > 0 && hit >= 0 && hit < mod, s"need 0 <= hit < mod, got $hit % $mod")
    df.filter(pmod(graft.ops.Cleaning.qcol(keyCol).cast("long"), lit(mod)) === hit)
  }

  /** Hash-based sampling: keep ~fraction of rows by hashing the key —
    * robust to non-uniform / clustered keys (the production default;
    * xxhash64 is not mirrored by the DuckDB oracle, so tests cover it
    * via invariance properties instead).
    */
  def byHash(df: DataFrame, keyCol: String, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    val buckets = 1000000L
    val cut = (fraction * buckets).toLong
    df.filter(pmod(xxhash64(graft.ops.Cleaning.qcol(keyCol), lit(seed)), lit(buckets)) < cut)
  }

  /** Stratified systematic sampling: an independent systematic sample
    * within every stratum, with per-stratum modulus (sampling rate).
    * Strata missing from `mods` fall back to `defaultMod`.
    */
  def stratifiedSystematic(
      df: DataFrame, strataCol: String, keyCol: String,
      mods: Map[String, Long], defaultMod: Long): DataFrame = {
    val s = graft.ops.Cleaning.qcol(strataCol).cast("string")
    val modExpr = mods.foldLeft(lit(defaultMod)) { case (acc, (k, m)) =>
      when(s === k, lit(m)).otherwise(acc)
    }
    df.filter(pmod(graft.ops.Cleaning.qcol(keyCol).cast("long"), modExpr) === 0)
  }
}

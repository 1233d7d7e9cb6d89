package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The two engine-portable hash kernels every deterministic sampler /
  * splitter / fingerprint shares, in ONE place. These are
  * parity-critical: each DuckDB oracle embeds the same constants
  * literally, so the Scala side must never drift copy-by-copy — any
  * change here is a deliberate, repo-wide semantics change.
  *
  * Affine round: h(k) = ((k mod P)·514229 + 741103) mod P over the
  * prime P = 1000003. Products stay < 2⁴⁰ for any long key — exact
  * under ANSI overflow checking in every engine. `affineUniform`
  * folds h into [0, 1) for rate comparisons.
  *
  * Poly fold: the 31-base polynomial rolling hash of a string's
  * codepoints mod 2³¹−1 (products < 2³⁶) — the oracle-expressible
  * alternative to xxhash64 (cf. [[graft.scale.TextAnalysis.portableFingerprint]]).
  */
object PortableHash {
  val P = 1000003L
  val MulA = 514229L
  val AddB = 741103L
  val PolyMod = 2147483647L

  /** Seeded affine hash mod P; the seed folds mod P up front so the
    * affine sum stays < 2⁴⁰ for ANY long seed. seed = 0 is the
    * canonical unseeded round. */
  def affineHash(key: Column, seed: Long = 0L): Column =
    pmod(pmod(key.cast("long"), lit(P)) * MulA + AddB + java.lang.Math.floorMod(seed, P), lit(P))

  /** The per-key uniform u(k) ∈ [0, 1) every rate filter compares
    * against — reproducible across runs, partitionings, and engines. */
  def affineUniform(key: Column): Column =
    affineHash(key) / lit(P).cast("double")

  /** 31-base polynomial fold of a string's codepoints mod 2³¹−1.
    * Null input folds to null; empty string folds to 0. */
  def polyHash31(s: Column): Column =
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, code) => (acc * 31L + code) % PolyMod)

  /** The KMV key kernel: [[polyHash31]] followed by an affine
    * bijection mod the Mersenne prime (x → (x·514229 + 741103) mod
    * 2³¹−1; 514229 is coprime to the prime, so nothing collides that
    * didn't already). The KMV estimator reads hash ORDER STATISTICS as
    * uniform on [0, M): a raw 31-base fold of SHORT keys (user ids,
    * small codes) lands near 0 and inflates the estimate by orders of
    * magnitude — the scramble spreads any key length across the full
    * range while staying a one-line DuckDB replay
    * (EntryShared.kmvHashSqlOf). Intermediate product < 2³¹·514229 ≈
    * 1.1e15, exact in a long both engines. */
  def kmvHash31(s: Column): Column =
    (polyHash31(s) * lit(MulA) + lit(AddB)) % lit(PolyMod)
}

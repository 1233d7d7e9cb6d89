package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Cleaning.qcol

/** Data-contract validation — the ingest gate a pipeline runs before
  * anything downstream trusts a delivery (beyond-reference, the QC
  * sibling of the profile/drift family): referential integrity between
  * fact and dimension tables, counted exactly in one pass per rule.
  * A violation here means silently dropped rows in every inner join
  * downstream — the failure mode that looks like "the numbers are a
  * bit low" and costs days.
  */
object Contracts {

  /** Referential-integrity audit: one summary row per call —
    * `(rule, n_child, n_null_keys, n_orphans)` where an orphan is a
    * NON-NULL child key with no matching parent key (null keys are
    * counted separately: they are a different contract violation with
    * a different fix). Compose several calls with `union` for the
    * delivery-level contract report.
    *
    * Scale: the parent side reduces to DISTINCT keys first (dimension
    * keys are the small side — broadcast when they fit), then ONE left
    * join + ONE aggregate over the child. Never an anti-join pass per
    * rule on top of a count pass — one scan of the child covers all
    * three counters.
    */
  def referentialAudit(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, rule: String): DataFrame = {
    val c = child.select(qcol(childKey).as("__ck"))
    val p = parent.select(qcol(parentKey).as("__ck"))
      .filter(col("__ck").isNotNull).distinct()
      .withColumn("__hit", lit(1L))
    c.join(p, Seq("__ck"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        coalesce(sum(when(col("__ck").isNull, 1L)), lit(0L)).as("n_null_keys"),
        coalesce(sum(when(col("__ck").isNotNull && col("__hit").isNull, 1L)), lit(0L))
          .as("n_orphans"))
      .select(lit(rule).as("rule"), col("n_child"), col("n_null_keys"),
        col("n_orphans"))
  }

  /** Id-sequence gap/duplicate audit — the completeness side of the
    * contract: a surrogate-key column that should be dense (event ids,
    * row sequence numbers) is summarized as
    * `(rule, n_rows, n_distinct, min_id, max_id, n_missing, n_dupes)`
    * where `n_missing = span − distinct` (ids absent from the range)
    * and `n_dupes = rows − distinct`. Nonzero missing on a
    * should-be-dense key means a delivery dropped rows upstream.
    *
    * Scale: ONE aggregate (count-distinct adds its standard two-phase
    * expand); no window, no join.
    */
  def sequenceGapAudit(df: DataFrame, idCol: String, rule: String): DataFrame =
    df.filter(qcol(idCol).isNotNull)
      .agg(
        count(lit(1)).as("n_rows"),
        // distinct over the SAME long cast as min/max: a non-integral
        // id column (strings '01' vs '1') would otherwise make
        // n_missing/n_dupes internally inconsistent. A non-numeric id
        // column fails the cast loudly (ANSI) on every counter alike —
        // the audit's contract is an integral sequence
        countDistinct(qcol(idCol).cast("long")).as("n_distinct"),
        min(qcol(idCol).cast("long")).as("min_id"),
        max(qcol(idCol).cast("long")).as("max_id"))
      .select(lit(rule).as("rule"), col("n_rows"), col("n_distinct"),
        col("min_id"), col("max_id"),
        (col("max_id") - col("min_id") + 1L - col("n_distinct")).as("n_missing"),
        (col("n_rows") - col("n_distinct")).as("n_dupes"))
}

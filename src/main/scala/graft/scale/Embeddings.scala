package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for vector pipelines at scale:
  * symmetric int8 quantization (the standard 4× storage/bandwidth cut
  * for ANN serving) with per-vector reconstruction-quality metrics.
  *
  * Everything is a narrow row-local map over the embedding column —
  * no shuffle, no driver materialization. Arithmetic is double-precision
  * with sequential left-to-right folds, the same evaluation order the
  * DuckDB oracle uses, so results are engine-exact (the same contract
  * `Similarity.dot` relies on).
  */
object Embeddings {

  /** Round-half-up in double precision — identical formula on the
    * oracle side (see Rounding.scala for why `round()` is a trap). */
  private def halfUp(c: Column): Column = floor(c + 0.5)

  /** Per-vector symmetric int8 quantization:
    *   scale = max(|v_i|) / 127        (null for the all-zero vector)
    *   q_i   = clamp(halfUp(v_i / scale), -127, 127)
    *   v'_i  = q_i * scale
    * Returns (id, qscale, cos_recon, max_abs_err) — the scale factor
    * plus reconstruction quality: cosine(v, v') and max_i |v_i - v'_i|.
    * Metrics are rounded to 6 dp (`Rounding.halfUp`) for stable
    * cross-engine comparison of the already-engine-exact doubles.
    *
    * The quantized codes themselves are a row-local `transform` away
    * (see `quantize` below) — this table form emits the scalar columns
    * the driver's oracle can hash (array columns are not hashable by
    * the compare harness).
    */
  def quantizeInt8Table(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val id = graft.ops.Cleaning.qcol(idCol)
    val v = graft.ops.Cleaning.qcol(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    df.select(id, v.as("__v"),
        (when(maxAbs > 0, maxAbs) / 127.0).as("__scale"))
      .withColumn("__recon", quantizeRecon(col("__v"), col("__scale")))
      .select(
        id,
        graft.ops.Rounding.halfUp(col("__scale"), 9).as("qscale"),
        graft.ops.Rounding.halfUp(
          cosineFold(col("__v"), col("__recon")), 6).as("cos_recon"),
        graft.ops.Rounding.halfUp(
          array_max(zip_with(col("__v"), col("__recon"),
            (a, b) => abs(a.cast("double") - b))), 6).as("max_abs_err"))
  }

  /** Quantized int8 codes as an array column (for writers that persist
    * the compressed form alongside `qscale`). */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      least(greatest(halfUp(x.cast("double") / scale), lit(-127.0)), lit(127.0))
        .cast("int"))

  /** Dequantized reconstruction v'_i = q_i * scale (as doubles). */
  def quantizeRecon(v: Column, scale: Column): Column =
    transform(v, x =>
      least(greatest(halfUp(x.cast("double") / scale), lit(-127.0)), lit(127.0)) * scale)

  /** Cosine via the sequential aggregate fold (not the native
    * expression): the reconstruction side is a derived double array the
    * oracle reproduces element-wise, so both engines must accumulate in
    * the same left-to-right order. Vectors here are 64-dim — three
    * short folds per row, negligible next to the native path's use
    * cases (million-pair verification loops).
    */
  private def cosineFold(a: Column, b: Column): Column = {
    val dt = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dt / when(na * nb > 0, na * nb)
  }
}

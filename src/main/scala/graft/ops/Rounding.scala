package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic rounding.
  *
  * Spark's `round()` converts the double to its shortest decimal string
  * and applies BigDecimal HALF_UP; DuckDB's `round()` works on the raw
  * binary double. On boundary values (e.g. 4.35 stored as 4.34999…96)
  * the two disagree — which would break hash-equality between the engine
  * and the DuckDB oracle. `halfUp` instead uses only IEEE primitives
  * (`*`, `+`, `floor`, `/`) that every engine evaluates bit-identically:
  *
  *   halfUp(x, d) = floor(x * 10^d + 0.5) / 10^d
  *
  * For non-negative inputs (all percent/score columns here) this is
  * round-half-up, matching the reference's positive-value behavior.
  * The oracle SQL must use the same formula.
  */
object Rounding {

  def halfUp(c: Column, decimals: Int): Column = {
    val p = math.pow(10, decimals)
    floor(c * p + 0.5) / p
  }

  /** SQL fragment for the DuckDB oracle using the identical formula. */
  def halfUpSql(expr: String, decimals: Int): String = {
    val p = math.pow(10, decimals).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }
}

package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric parity helpers.
  *
  * The t2 gate hash-compares our results against DuckDB (FIXTURES.md §B).
  * Scalar double arithmetic is IEEE-754 deterministic and therefore
  * bit-identical across engines, but the ORDER of a floating `SUM` is
  * not. So aggregates funnel through an exact decimal(38,9) accumulator
  * (cast of a double to decimal is order-free and deterministic) and
  * come back out as double. `davg` divides the exact sum by the count in
  * double space — again IEEE-identical on both engines.
  */
package object analytics {
  // Scale 6, not 9: the double→decimal conversion is only unambiguous
  // while |x|·10^scale stays far inside double's 53-bit integer range.
  // At scale 9 a ~5e4-magnitude addend needs 17 significant digits, so
  // the two engines' conversions can round the 9th decimal differently
  // (observed at sf0.1: q1/j2 sums drifting ~5e-7). At scale 6 every
  // in-repo addend (money shapes: ≤6 exact decimal places, |x| < 1e9)
  // converts exactly on both engines, keeping the summed result
  // bit-identical at any scale factor.
  private val Dec = DecimalType(38, 6)

  /** Order-insensitive exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-insensitive avg: exact decimal sum / count, in double space. */
  def davg(c: Column): Column =
    sum(c.cast(Dec)).cast("double") / count(c)

  /** SQL twin of [[dsum]] for the DuckDB oracle. */
  def sqlDsum(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE)"

  /** SQL twin of [[davg]]. */
  def sqlDavg(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE) / count($e)"
}

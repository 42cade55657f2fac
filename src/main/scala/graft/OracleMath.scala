package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable aggregate forms shared by the query battery and
  * its DuckDB oracle SQL.
  *
  * A `round(sum(<double>), 2)` is NOT stable across engines: partial
  * aggregation accumulates in partition order, so the double sum can
  * differ in the last ulp and flip the 2dp rounding (observed: 3 of
  * ~3000 q36 groups). Summing in DECIMAL(18,4) is order-independent and
  * exact — per-row 2dp×2dp products are exact at 4dp, and both engines
  * round the identical decimal the same way for positive values.
  */
object OracleMath {
  /** Order-independent 2dp sum of a double expression, as double. */
  def stableSum(c: Column): Column =
    round(sum(c.cast("decimal(18,4)")), 2).cast("double")

  /** The identical form for the DuckDB oracle SQL. */
  def stableSumSql(expr: String): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(18,4))), 2) AS DOUBLE)"

  /** Order-independent 2dp average: exact decimal sum, then one double
    * division (IEEE-identical in both engines; decimal *division* is
    * avoided because its scale rules are engine-specific).
    */
  def stableAvg(c: Column): Column =
    round(sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1)), 2)

  def stableAvgSql(expr: String): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / count(*), 2)"

  /** Cross-engine-stable 2dp rounding of an already-computed double.
    * Spark's `round(double, 2)` goes through BigDecimal.valueOf (the
    * SHORTEST decimal rendering) with HALF_UP, DuckDB rounds the binary
    * value — a double that renders as "…245" but sits below .245 in
    * binary flips between the two (observed on percentile midpoints).
    * floor(x*100 + 0.5)/100 is pure IEEE arithmetic, so both engines
    * produce the identical bit pattern for identical input.
    */
  def stableRound2(c: Column): Column = stableRound(c, 2)

  def stableRound2Sql(expr: String): String = stableRoundSql(expr, 2)

  /** Generalized stable rounding of a non-negative double at `digits`
    * decimal places (powers of ten through 1e15 are exactly
    * representable, so the scale factor itself introduces no error).
    */
  def stableRound(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + lit(0.5)) / p
  }

  def stableRoundSql(expr: String, digits: Int): String = {
    val p = BigDecimal(10).pow(digits).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }
}

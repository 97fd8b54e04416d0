package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers (SURVEY.md §2.0).
  *
  * `r(c, n)` — portable rounding: floor(x·10ⁿ + 0.5)/10ⁿ. Spark's round()
  * is HALF_UP (BigDecimal) while DuckDB's double round() is half-to-even,
  * so values landing exactly on a .xx5 boundary hash-mismatch (observed at
  * sf0.01). floor/mul/add are plain IEEE ops that evaluate bit-identically
  * in both engines, so equal inputs give equal outputs. The SQL twin is
  * `floor(x * 10^n + 0.5) / 10^n`.
  */
object Det {
  def r(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
  def r2(c: Column): Column = r(c, 2)

  /** Exact-cents summation for non-integral doubles (prices, balances).
    *
    * SUM of doubles is order-dependent (FP addition is not associative);
    * Spark's partial-agg order ≠ DuckDB's, so the last ulp — and hence a
    * rounded cent — can differ (observed at sf0.001). Fix: round each term
    * to integer "cents" (bit-identical per row on both engines), sum as
    * integers (exact, order-independent), divide back. SQL twin:
    * `CAST(SUM(CAST(floor(x*10ⁿ + 0.5) AS BIGINT)) AS DOUBLE) / 10ⁿ`.
    * Overflow bound: 2⁶³ cents ≈ 9·10¹⁶ — fine for any realistic money
    * sum; at 100 TB revenue-class sums stay < 10¹⁵.
    */
  def cents(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) // LongType in Spark
  }
  def sumMoney(c: Column, n: Int = 2): Column = {
    val p = math.pow(10, n)
    sum(cents(c, n)).cast("double") / lit(p)
  }
  /** avg over exact cents, then display-rounded to n decimals. */
  def avgMoney(c: Column, n: Int = 2): Column =
    r(sumMoney(c, n) / count(c), n)
}

package graft

import org.apache.spark.sql.Column

/** The exact-arithmetic contract shared by every oracle-visible operator
  * (README "Determinism & oracle discipline"). One definition so a future
  * precision change cannot silently diverge a subset of queries.
  */
object Exact {
  /** Money: 2-decimal doubles -> DECIMAL(18,2). Sums become
    * order-independent (no fp non-associativity across partitions). */
  def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Decimal literal 1 at money scale, for (1 - discount)-style factors. */
  def one: Column = org.apache.spark.sql.functions.lit(1).cast("decimal(18,2)")

  /** Money as integer cents (LONG) — [[money]]'s exact unscaled value.
    * A product of two cents-scaled factors lives at 4dp (units of 10^-4
    * dollars) and accumulates exactly in integers. For sums whose group
    * size is BOUNDED (e.g. per-order: ≤7 lineitems) a raw BIGINT sum is
    * exact at any corpus scale; for unbounded groups feed
    * `plans.Sum128` — the int128 sum — instead of SUM(DECIMAL), whose
    * >18-digit buffer pays a BigDecimal round-trip per row. The final
    * scaled-integer -> DOUBLE conversion is correctly rounded on both
    * paths (the integer is exact below 2^53 / the decimal cast is
    * BigDecimal.doubleValue), so results stay hash-equal to the
    * DECIMAL-sum oracle form. */
  def cents(c: Column): Column = (money(c) * 100).cast("long")
}

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
}

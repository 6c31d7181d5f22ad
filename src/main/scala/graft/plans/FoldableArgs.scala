package graft.plans

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.unsafe.types.UTF8String

/** Shared literal-argument extraction for the graft function builders
  * (minhash_sigs / shingle_hashes / rademacher_sigs). The builders fold
  * their scalar parameters at build time; a non-foldable argument (e.g. a
  * column reference) used to surface as an unbound-attribute exception from
  * deep inside `eval(InternalRow.empty)` — here it fails fast as a clean
  * `AnalysisException(NON_FOLDABLE_ARGUMENT)` naming the function and
  * parameter. */
private[plans] object FoldableArgs {

  private def folded(fn: String, name: String, tpe: String, e: Expression): Any = {
    if (!e.foldable)
      throw new AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`",
          "paramName" -> s"`$name`",
          "paramType" -> s""""$tpe""""))
    e.eval(InternalRow.empty)
  }

  def int(fn: String, name: String, e: Expression): Int =
    folded(fn, name, "INT", e) match {
      case n: Int => n
      // reject (not truncate) an out-of-range BIGINT literal — 4294967301
      // silently becoming 5 is worse than the type error
      case n: Long if n.isValidInt => n.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: parameter $name must be an INT-range integer literal, got $other")
    }

  def long(fn: String, name: String, e: Expression): Long =
    folded(fn, name, "BIGINT", e) match {
      case n: Int => n.toLong
      case n: Long => n
      case other => throw new IllegalArgumentException(
        s"$fn: parameter $name must be an integer literal, got $other")
    }

  def string(fn: String, name: String, e: Expression): String =
    folded(fn, name, "STRING", e) match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: parameter $name must be a string literal, got $other")
    }
}

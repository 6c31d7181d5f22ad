package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: sequential-fold dot product of two FLOAT
  * arrays in double precision.
  *
  * This is the §2.11 preference ladder in action (SURVEY.md): where the
  * composed built-in (`aggregate(zip_with(...))`) allocates an
  * intermediate array per row and evaluates two lambdas, this expression
  * generates a single fused loop inside whole-stage codegen — the shape
  * the similarity hot path (graft.llm.Similarity) wants when scanning
  * billions of embeddings. Fold order is left-to-right, identical to the
  * composed form and to the DuckDB oracle's `list_sum`, so results are
  * bit-equal across all three.
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  /** Nullable also when an ELEMENT can be null (a null element nullifies
    * the sum) — the default BinaryExpression.nullable only looks at the
    * arrays themselves, which would make ev.isNull a compile-time
    * constant and silently turn the null path into 0.0. */
  private def elementsNullable(t: DataType): Boolean = t match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
  override def nullable: Boolean =
    left.nullable || right.nullable ||
      elementsNullable(left.dataType) || elementsNullable(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element nullifies the product sum — identical to the
      // composed aggregate(zip_with(...)) form and the DuckDB oracle
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // when the expression is non-nullable (no null elements possible),
      // ev.isNull is the constant `false` — emitting an assignment to it
      // would be invalid Java, so the check is only generated when needed
      val nullCheck =
        if (nullable) s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

object DotF32 {
  private val info = new ExpressionInfo(classOf[DotF32].getName, "dot_f32")
  private val builder = (exprs: Seq[Expression]) => DotF32(exprs.head, exprs(1))

  /** Runtime registration (idempotent) — usable on any session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("dot_f32", builder, "internal")
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the native
  * function at session build time — the deployment-config path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      (exprs: Seq[Expression]) => DotF32(exprs.head, exprs(1))))
}

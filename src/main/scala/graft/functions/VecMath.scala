package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd vector kernels for the similarity-search family (q21/q23/q27/
  * q49 and the norm projections). Semantically identical to the SQL
  * higher-order-function folds they replace —
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, e) -> s + e)` —
  * including the left-to-right double accumulation order (bit-exact vs the
  * DuckDB oracle's list_reduce fold), but compiled into whole-stage codegen
  * instead of interpreted per-element lambda evaluation with boxing. On the
  * 526k-pair sf0.1 probe join this is the hot path: the interpreted fold
  * dominated the stage (see PLANS.md round-4 notes).
  *
  * Null contract: null input array -> null (nullSafe); RAGGED input (length
  * mismatch) -> null, matching the zip_with fold (zip_with pads the shorter
  * side with null, poisoning the sum). Null ELEMENTS within equal-length
  * arrays are skipped — a deliberate deviation from the SQL fold (which
  * would return null); our vectors are dense, non-null by construction
  * (vecsD casts a parquet float array), so the branch is never taken there.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = VecMath.checkVecInputs(this)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged inputs yield null
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VecMath.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.VecMath.dot($a, $b); }""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Sum of squared component differences (squared L2 distance). Same fold
  * order as `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0D, ...)`;
  * same null contract as [[DotProduct]] (ragged -> null). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = VecMath.checkVecInputs(this)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged inputs yield null
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VecMath.sqDist(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.VecMath.sqDist($a, $b); }""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDist =
    copy(left = l, right = r)
}

object VecMath {
  private[functions] def checkVecInputs(e: BinaryExpression): TypeCheckResult = {
    val ok = Seq(e.left, e.right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${e.prettyName} requires two array<double> arguments, got " +
        s"(${e.left.dataType.simpleString}, ${e.right.dataType.simpleString})")
  }

  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  def sqDist(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.GraftShim.{column, expression}

  /** Column API. */
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def sqDist(a: Column, b: Column): Column =
    column(SqDist(expression(a), expression(b)))

  /** Register for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftShim.registerFunction(spark, "dot_product",
      exprs => DotProduct(exprs.head, exprs(1)))
    org.apache.spark.sql.GraftShim.registerFunction(spark, "sq_dist",
      exprs => SqDist(exprs.head, exprs(1)))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native int64 dot product over ARRAY<BIGINT> columns — SURVEY.md §4's
  * anticipated custom Expression: the built-in composition
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,x) -> acc+x)` is a
  * higher-order function chain that Spark evaluates with interpreted
  * lambdas outside whole-stage codegen, and it sits in the innermost loop
  * of every vector operator (cosine top-k, LSH/IVF ANN, embedding
  * near-dup) — millions of 64-element dots per batch. This expression
  * evaluates as one tight primitive loop inside codegen. Semantically
  * identical to the composition (and to the oracle's list_sum form).
  */
case class DotLExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, false) ||
        left.dataType == ArrayType(LongType, true)) {
      if (right.dataType == ArrayType(LongType, false) ||
          right.dataType == ArrayType(LongType, true)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"dot_l right needs ARRAY<BIGINT>, got ${right.dataType}")
    } else TypeCheckResult.TypeCheckFailure(s"dot_l left needs ARRAY<BIGINT>, got ${left.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_l"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotL.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotL.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLExpr =
    copy(left = newLeft, right = newRight)
}

object DotL {
  /** Called from generated code — one primitive loop, no allocation. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotLExpr(GraftShim.expression(a), GraftShim.expression(b)))

  /** Register `dot_l` for the SQL surface. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShim.registerFunction(spark, "dot_l",
      exprs => DotLExpr(exprs(0), exprs(1)))
}

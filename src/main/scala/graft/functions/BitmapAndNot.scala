package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native bitmap difference `a AND NOT b` over the BINARY bitmaps the
  * built-in `bitmap_construct_agg` / `bitmap_or_agg` family produces —
  * the missing algebra member that makes bitmap state RETRACTABLE:
  * Spark ships construct/or/count but no and-not, so deletion support
  * for exact-distinct bitmap state (L48's pk bitmaps; takedown/GDPR
  * retraction, VERDICT r13 #1) would otherwise need a position-level
  * explode join — millions of rows where one byte loop suffices.
  *
  * Pure byte-wise a & ~b; result length = left length (a shorter right
  * clears nothing past its end — absent tombstone bytes mean "no bits
  * retracted there"). Same §2.K preference order as H64/DotL: a codegen
  * Expression, one static call in the generated loop, no UDF boxing.
  */
case class BitmapAndNotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"bitmap_andnot left needs BINARY, got ${left.dataType}")
    else if (right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"bitmap_andnot right needs BINARY, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_andnot"

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapAndNot.andNot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapAndNot.andNot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BitmapAndNotExpr =
    copy(left = newLeft, right = newRight)
}

object BitmapAndNot {
  /** Called from generated code — one primitive loop, allocates only
    * the result buffer. */
  def andNot(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { out(i) = (a(i) & ~b(i)).toByte; i += 1 }
    while (i < a.length) { out(i) = a(i); i += 1 }
    out
  }

  def andNot(a: Column, b: Column): Column =
    GraftShim.column(BitmapAndNotExpr(GraftShim.expression(a), GraftShim.expression(b)))

  /** Register `bitmap_andnot` for the SQL surface. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShim.registerFunction(spark, "bitmap_andnot",
      exprs => BitmapAndNotExpr(exprs(0), exprs(1)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native form of the q_text_fingerprint kernel (§2.L12): the minimum
  * rolling polynomial hash (base 257 mod 1e9+7) over all 8-token windows
  * of a document's token array, where each token is first hashed with
  * the engine's portable h64.
  *
  * Value-identical to the declarative chain
  *   `array_min(transform(sequence(8, n), i ->
  *      aggregate(slice(hs, i-7, 8), 0L, (a,h) -> (a*257 + h) % p)))`
  * with `hs = transform(toks, t -> h64(t))` — the shape mirrored in the
  * DuckDB oracle (Oracle.scala q_text_fingerprint) — but evaluated as a
  * single O(n) pass: one md5 per token (vs one in the lambda too), and
  * an O(1) rolling update per window (vs an interpreted 8-step fold +
  * slice allocation per window; higher-order functions are
  * CodegenFallback in Spark, so that chain never enters codegen). The
  * rolling update removes the outgoing token with its 257^7 weight:
  * window_i = (window_{i-1} - h_out·257^7)·257 + h_in  (mod p).
  *
  * Returns NULL for arrays of fewer than 8 tokens (no complete window) —
  * the same result the oracle's empty `range(8, n+1)` produces.
  */
case class RollFpExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"roll_fp requires ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "roll_fp"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < 8) null else RollFp.minFp(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() < 8) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.RollFp.minFp($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RollFpExpr =
    copy(child = newChild)
}

object RollFp {
  val Mod = 1000000007L
  val Base = 257L
  /** 257^7 mod p — the weight of the outgoing token in the rolling update. */
  val Pow7: Long = {
    var x = 1L; var i = 0
    while (i < 7) { x = x * Base % Mod; i += 1 }
    x
  }

  /** Called from generated code; caller guarantees numElements >= 8.
    * Token h64 values are < 2^60 and window values < p < 2^30, so every
    * product here stays inside int64. */
  def minFp(arr: ArrayData): Long = {
    val n = arr.numElements()
    val ring = new Array[Long](8) // last 8 token hashes, for removal
    var r = 0L
    var i = 0
    while (i < 8) {
      val h = H64.hash(arr.getUTF8String(i))
      ring(i) = h
      r = (r * Base + h) % Mod
      i += 1
    }
    var mn = r
    while (i < n) {
      val h = H64.hash(arr.getUTF8String(i))
      val out = ring(i % 8) % Mod
      ring(i % 8) = h
      r = ((r - out * Pow7 % Mod + Mod) % Mod * Base + h) % Mod
      if (r < mn) mn = r
      i += 1
    }
    mn
  }

  /** Column-level entry point: min rolling hash over 8-token windows. */
  def fp(c: Column): Column = GraftShim.column(RollFpExpr(GraftShim.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of the engine's portable 60-bit hash
  * (U.h64 / SURVEY.md §2.L): the first 15 hex digits of md5(input),
  * i.e. the top 60 bits of the digest, as a non-negative int64.
  *
  * Semantically identical to the composed built-ins
  * `conv(substring(md5(x), 1, 15), 16, 10)` — same value in DuckDB via
  * Oracle.h64Sql — but evaluated directly from the digest bytes: no hex
  * string materialization, no base conversion, one static call inside
  * whole-stage codegen. This is the §2.K "custom Expression beats UDF"
  * path; it sits under every sketch operator (MinHash, SimHash, LSH,
  * language-ID, fingerprints), which hash millions of tokens per batch.
  */
case class H64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"h64 requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "h64"

  override def nullSafeEval(input: Any): Any =
    H64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H64Expr =
    copy(child = newChild)
}

object H64 {
  // One digest instance per executor thread — getInstance() does a
  // provider lookup + allocation, which is measurable when sketch
  // operators hash millions of tokens per batch. digest() leaves the
  // instance reset, so reuse is safe.
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes) — equals parsing the first 15 hex chars
    * big-endian. Called from generated code; must stay static + cheap. */
  def hash(s: UTF8String): Long = {
    val md = mdLocal.get()
    val d = md.digest(s.getBytes)
    // first 8 bytes as big-endian unsigned, dropping the low nibble
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  /** Column-level entry point. */
  def h64(c: Column): Column = GraftShim.column(H64Expr(GraftShim.expression(c)))

  /** Register `h64` for the SQL surface of an existing session
    * (`SELECT h64(col) ...`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShim.registerFunction(spark, "h64", exprs => H64Expr(exprs.head))
}

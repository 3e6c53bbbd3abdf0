package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: whitespace token count over a string column.
  *
  * The one custom-Expression extension point earmarked in SURVEY.md §4.3 —
  * a scalar hot enough at 100 TB (token accounting over every document) to
  * justify staying inside whole-stage codegen instead of a Scala UDF
  * (no ScalaUDF boxing, no codegen fence; the loop is inlined into the
  * generated task loop over UTF-8 bytes, no String decode). */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_count"

  // reject non-string arguments at ANALYSIS time (clear error), not as a
  // codegen ClassCastException at execution time
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    WsTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val inTok = ctx.freshName("inTok")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val ws = ctx.freshName("ws")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = 0;
         |boolean $inTok = false;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  boolean $ws = $b == 32 || $b == 9 || $b == 10 || $b == 13 || $b == 12 || $b == 11;
         |  if (!$ws && !$inTok) { $n++; $inTok = true; }
         |  else if ($ws) { $inTok = false; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

object WsTokenCount {
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == 32 || b == 9 || b == 10 || b == 13 || b == 12 || b == 11
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  /** Column API (Spark 4 classic Column<->Expression bridge). */
  def ws_token_count(c: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      WsTokenCount(org.apache.spark.sql.graftbridge.toExpression(c)))

  /** SQL registration: `SELECT ws_token_count(text) ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ws_token_count", exprs => WsTokenCount(exprs.head), "scala_udf")
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the 64-bit content hashes the dedup /
  * fingerprint family computes over every document — the second tier of
  * the custom-Expression surface after [[WsTokenCount]]. The kernels are
  * too stateful to inline as generated Java (tokenizer + hash map), so
  * codegen emits a STATIC call into the same JVM kernel the function API
  * uses: no ScalaUDF null/boxing machinery, no codegen fence splitting the
  * whole-stage loop, and exact equality with the function path by
  * construction (one kernel, two entries). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // reject `simhash64(123)`-style SQL at ANALYSIS time with a clear error
  // instead of a codegen ClassCastException at execution (AbstractDataType /
  // ExpectsInputTypes are private[sql], so the public check hook is used)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Dedup.simhashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Dedup.simhashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextAnalysis.fingerprintUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextAnalysis.fingerprintUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object HashExprs {
  def simhash64(c: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      SimHash64(org.apache.spark.sql.graftbridge.toExpression(c)))

  def fingerprint64(c: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      Fingerprint64(org.apache.spark.sql.graftbridge.toExpression(c)))
}

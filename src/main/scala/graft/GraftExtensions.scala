package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native Catalyst
  * functions available in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (the (c)-tier extension
  * route from the build brief — registered rules/strategies would go here
  * too if an operator ever outgrows the expression/API level). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("ws_token_count"),
      new ExpressionInfo(classOf[ops.WsTokenCount].getName, "ws_token_count"),
      (exprs: Seq[Expression]) => ops.WsTokenCount(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[ops.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => ops.SimHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[ops.Fingerprint64].getName, "fingerprint64"),
      (exprs: Seq[Expression]) => ops.Fingerprint64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[ops.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => ops.CosineSim(exprs.head, exprs(1))))
  }
}

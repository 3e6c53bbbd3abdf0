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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    }
}

object GraftExtensions {

  /** Arity gate for an injected builder: the per-expression
    * `checkInputDataTypes` hooks only fire after construction, so a
    * wrong-arg-count call would otherwise die in the builder with a bare
    * IndexOutOfBoundsException instead of a diagnosable analysis error. */
  private def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"Invalid number of arguments for function $name: expected $n, got ${exprs.length}")

  /** (name, expression class, arity-checked builder) for every injected
    * native function — data, so tests can drive the builders directly. */
  val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("ws_token_count", classOf[ops.WsTokenCount],
      (exprs: Seq[Expression]) => {
        arity("ws_token_count", 1, exprs); ops.WsTokenCount(exprs.head) }),
    ("simhash64", classOf[ops.SimHash64],
      (exprs: Seq[Expression]) => {
        arity("simhash64", 1, exprs); ops.SimHash64(exprs.head) }),
    ("fingerprint64", classOf[ops.Fingerprint64],
      (exprs: Seq[Expression]) => {
        arity("fingerprint64", 1, exprs); ops.Fingerprint64(exprs.head) }),
    ("cosine_sim", classOf[ops.CosineSim],
      (exprs: Seq[Expression]) => {
        arity("cosine_sim", 2, exprs); ops.CosineSim(exprs.head, exprs(1)) }))
}

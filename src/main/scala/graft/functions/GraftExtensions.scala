package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration surface for graft's native Catalyst expressions.
  *
  * Two entry points, same registry row:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *    standard extensions hook, makes `dot_f(a, b)` resolvable in SQL
  *    text for any session built with the config;
  *  - [[GraftFunctions.ensureRegistered]] — imperative registration on
  *    an existing session (idempotent), used by the query builders so
  *    the driver harness needs no session-config coupling.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotF)
    ext.injectFunction(GraftFunctions.simhashF)
  }
}

object GraftFunctions {

  private[functions] val dotF
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_f"),
    new ExpressionInfo(classOf[DotProductF].getName, null, "dot_f"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"dot_f expects 2 arguments, got ${children.size}")
      DotProductF(children.head, children(1))
    })

  private[functions] val simhashF
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_bits"),
    new ExpressionInfo(classOf[SimhashBits].getName, null, "simhash_bits"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"simhash_bits expects 2 arguments, got ${children.size}")
      SimhashBits(children.head, children(1))
    })

  /** Idempotent imperative registration on a live session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    Seq(dotF, simhashF).foreach { case (id, info, builder) =>
      if (!registry.functionExists(id))
        registry.registerFunction(id, info, builder)
    }
  }

  /** Column-API handle for [[SimhashBits]]. */
  def simhash(vals: Column, nbits: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimhashBits(
        org.apache.spark.sql.GraftColumnBridge.expression(vals),
        org.apache.spark.sql.catalyst.expressions.Literal(nbits)))

  /** Column-API handle (works without SQL-text resolution). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DotProductF(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}

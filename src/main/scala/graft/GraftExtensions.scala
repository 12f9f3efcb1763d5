package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, InnerProduct}
import graft.plans.AsOfJoinStrategy

/** Session extensions: installs graft's custom planner strategy
  * (native as-of join) and SQL functions into every session built
  * with `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[GraftSession.configure]]). This is the supported, catalog-free
  * way to extend Catalyst — no forked Spark, no reflection into the
  * optimizer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[InnerProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        InnerProduct(exprs.head, exprs(1))))
  }
}

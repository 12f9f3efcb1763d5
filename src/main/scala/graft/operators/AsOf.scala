package graft.operators

import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.{DataFrame, GraftSqlShim}

/** User-facing facade for the native as-of join
  * ([[graft.plans.AsOfJoinPlan]] — see there for semantics and the
  * scale story). Requires the session to carry
  * [[graft.GraftExtensions]] (GraftSession does).
  */
object AsOf {

  /** Backward as-of join: each left row gains the right row with the
    * greatest `rightTime <= leftTime` among right rows whose
    * `rightKey` equals the left row's `leftKey` (right columns null
    * when no such row). Right columns keep their names — alias
    * upstream on collisions.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           tolerance: Option[Long] = None): DataFrame =
    joinMulti(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime, tolerance)

  /** Multi-key variant (composite join keys, e.g. (tenant, user)).
    * `tolerance` (same units as the long time columns, e.g. micros)
    * bounds staleness pandas-merge_asof-style: a match older than
    * `leftTime - tolerance` is emitted as nulls instead.
    */
  def joinMulti(left: DataFrame, right: DataFrame,
                leftKeys: Seq[String], rightKeys: Seq[String],
                leftTime: String, rightTime: String,
                tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key lists must be non-empty and equal-length: $leftKeys vs $rightKeys")
    val spark = left.sparkSession
    // Defensive: sessions built outside GraftSession (no
    // spark.sql.extensions) still get the strategy via the runtime
    // extraStrategies hook — injection is idempotent.
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lPlan = GraftSqlShim.analyzedPlan(left)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    // SQL join semantics: NULL keys (or NULL times) never match. The
    // merge compares with a natural ordering where null == null, so
    // enforce it here by dropping null-keyed/timed RIGHT rows — a
    // null-keyed left row then finds no partner and gets nulls.
    val rightNonNull = rightKeys.foldLeft(
      right.filter(right.col(rightTime).isNotNull)) {
      (df, k) => df.filter(df.col(k).isNotNull)
    }
    val rPlanNN = GraftSqlShim.analyzedPlan(rightNonNull)
    val plan = AsOfJoinPlan(
      lPlan, rPlanNN,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlanNN, _)),
      attr(lPlan, leftTime), attr(rPlanNN, rightTime), tolerance)
    GraftSqlShim.ofRows(spark, plan)
  }
}

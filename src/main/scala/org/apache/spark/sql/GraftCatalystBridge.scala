package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge for the graft library. The classic
  * helpers are `private[sql]`, so library code outside this package cannot
  * wrap a custom Expression (e.g. the PPM decoder) into a user-facing
  * Column without it.
  */
object GraftCatalystBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** LogicalPlan -> DataFrame (`Dataset.ofRows` is `private[sql]`): the SQL
    * MERGE rewrite carries the analyzed source plan into its command and
    * re-materializes it as a frame at execution time.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** V2 Predicate -> v1 Filter (`PredicateUtils.toV1` is `private[sql]`):
    * the SupportsPushDownV2Filters lane translates to v1 and reuses the
    * whole zone-map / directory-pruning compile pipeline. */
  def predicateToV1(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
}

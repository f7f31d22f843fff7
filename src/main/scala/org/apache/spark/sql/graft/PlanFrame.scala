package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** One-method bridge into Spark's `private[sql]` surface: turning a
  * hand-transformed `LogicalPlan` back into a DataFrame requires
  * `classic.Dataset.ofRows`, which is `private[sql]` at the Scala
  * level. Living under `org.apache.spark.sql` to reach it is the
  * established pattern for external connectors (delta-spark and
  * iceberg's spark module do exactly this — see [[StreamingFrame]] for
  * the streaming twin). Used by the lake's read path to re-wrap a scan
  * whose `LogicalRelation` was annotated with log-derived catalog
  * statistics; nothing else of the internal API is touched. */
object PlanFrame {

  /** `plan` as a DataFrame on `spark` (Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

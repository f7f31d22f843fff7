package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** One-method bridge into Spark's `private[sql]` surface: a V1 streaming
  * `Source.getBatch` must return a DataFrame whose logical plan is
  * streaming-tagged, and the only constructor for that
  * (`SparkSession.internalCreateDataFrame(…, isStreaming = true)`) is
  * `private[sql]` at the Scala level. Living under `org.apache.spark.sql`
  * to reach it is the established pattern for external connectors
  * (delta-spark and iceberg's spark module do exactly this). Nothing else
  * of the internal API is touched and no behavior is overridden — the
  * frame's rows and schema pass through unchanged. */
object StreamingFrame {

  /** Re-tag a batch DataFrame as a streaming micro-batch result. */
  def tag(df: DataFrame): DataFrame =
    df.sparkSession.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
        isStreaming = true)
}

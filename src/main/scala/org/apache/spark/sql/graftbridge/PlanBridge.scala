package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]` (like the Column converters in
  * [[ColumnBridge]]); the SQL MERGE command needs it to turn the parsed
  * source plan (an arbitrary relation or subquery) into a DataFrame at
  * execution time. Standard extension-library bridge.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-wrap a batch DataFrame as a STREAMING one (isStreaming = true) —
    * what a DSv1 `Source.getBatch` must hand MicroBatchExecution. Same
    * route the built-in Kafka source takes (`internalCreateDataFrame`
    * over the batch plan's InternalRow RDD); the upstream scan keeps its
    * own whole-stage-codegen'd batch plan and feeds the stream as an RDD.
    */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cs.internalCreateDataFrame(cdf.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}

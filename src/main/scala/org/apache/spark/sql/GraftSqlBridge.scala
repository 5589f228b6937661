package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to `private[sql]` constructors that every Spark extension
  * library needs: Column → catalyst Expression and LogicalPlan → DataFrame.
  * Lives in the org.apache.spark.sql package solely for access; no Spark
  * internals are modified.
  */
object GraftSqlBridge {

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The materialized-RDD leaf Dataset.checkpoint builds internally
    * (LogicalRDD with the origin's attributes/partitioning), exposed for
    * iterative kernels that persist each round's rows but must keep the
    * RDD LINEAGE intact so an evicted block is recomputed rather than
    * fatal (localCheckpoint discards lineage: any block loss is
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). The logical plan is still
    * truncated to a leaf, so per-round Catalyst analysis stays flat.
    */
  def fromRdd(origin: Dataset[_], rdd: RDD[InternalRow]): DataFrame = {
    val ds = origin.asInstanceOf[classic.Dataset[_]]
    classic.Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(rdd, ds, isStreaming = false))
  }

  def internalRdd(origin: Dataset[_]): RDD[InternalRow] =
    origin.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd
}

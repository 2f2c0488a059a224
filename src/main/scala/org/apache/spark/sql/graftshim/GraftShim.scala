package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Minimal bridge to the two `private[sql]` surfaces a library-level
  * custom operator needs: unwrapping a DataFrame's analyzed plan and
  * wrapping a custom [[LogicalPlan]] back into a DataFrame. Lives under
  * `org.apache.spark.sql` for access only — nothing is overridden or
  * patched; this is the standard packaging trick public Spark extension
  * libraries use for plan-level operators. */
object GraftShim {

  /** `Dataset.ofRows` — a DataFrame over an arbitrary logical plan. */
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(s.asInstanceOf[CSparkSession], plan)

  /** The analyzed logical plan behind a DataFrame (resolved attributes
    * with stable expression ids — what a custom binary node composes). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[Row]].queryExecution.analyzed
}

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

  /** Whether every partition of `rdd` still has at least one live block
    * replica registered with the block-manager master. A
    * `localCheckpoint` RDD whose blocks were unpersisted (or died with
    * an executor) has NO lineage to recompute from — consumers fail at
    * action time — so cache layers must health-check before reusing.
    * (BlockManager is `private[spark]`; this is the access shim.) */
  def allBlocksPresent(rdd: org.apache.spark.rdd.RDD[_]): Boolean = {
    if (rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE) return false
    // A context racing into stop() nulls SparkEnv / kills the master
    // endpoint; report "healthy" in that case so the caller returns the
    // cached value and the ACTION fails with Spark's clean
    // shut-down error, instead of an NPE escaping from a cache probe.
    val env = org.apache.spark.SparkEnv.get
    if (env == null || rdd.sparkContext.isStopped) return true
    try {
      val ids: Array[org.apache.spark.storage.BlockId] =
        rdd.partitions.map(p =>
          org.apache.spark.storage.RDDBlockId(rdd.id, p.index)
            : org.apache.spark.storage.BlockId)
      env.blockManager.master.getLocations(ids).forall(_.nonEmpty)
    } catch { case _: NullPointerException => true }
  }
}

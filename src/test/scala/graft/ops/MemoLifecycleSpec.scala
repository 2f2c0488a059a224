package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** Lifecycle contract of the memo layer (`Tables.memoized` /
  * `Tables.invalidate`): building pins checkpoint blocks, invalidating
  * a session releases exactly that session's blocks, and a rebuild
  * after invalidation reproduces the identical relation. Runs against
  * its OWN child SparkSession (same SparkContext) so it can never race
  * the shared session's memo entries used by parallel suites. */
class MemoLifecycleSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  /** The persisted RDD id backing a localCheckpoint'ed DataFrame. */
  private def checkpointRddId(df: DataFrame): Int =
    GraftShim.analyzed(df) match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      case other => fail(s"memoized relation is not checkpoint-backed: ${other.nodeName}")
    }

  test("invalidate releases the session's checkpoint blocks; rebuild matches") {
    assume(hasTestData)
    val s2 = spark.newSession()
    val built = Tables.memoized("lifecycle_probe", s2, sf) {
      Tables.documents(s2, sf).groupBy(col("source")).agg(count(lit(1)).as("n"))
    }
    val before = built.collect().map(_.toSeq).toSet
    val rddId = checkpointRddId(built)
    assert(spark.sparkContext.getRDDStorageInfo.exists(_.id == rddId),
      "checkpoint blocks missing right after an eager localCheckpoint build")

    // memo hit returns the same checkpointed instance, no rebuild
    val again = Tables.memoized("lifecycle_probe", s2, sf) {
      fail("memo rebuilt on a warm key"): DataFrame
    }
    assert(checkpointRddId(again) == rddId)

    val released = Tables.invalidate(s2)
    assert(released >= 1, "invalidate found no entries for the session that built one")
    // unpersist is async (blocking=false) — bounded wait for the blocks to drop
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.sparkContext.getRDDStorageInfo.exists(_.id == rddId) &&
           System.nanoTime() < deadline) Thread.sleep(50)
    assert(!spark.sparkContext.getRDDStorageInfo.exists(_.id == rddId),
      "invalidate left the memoized relation's checkpoint blocks in the block manager")

    // cold rebuild after invalidation: fresh checkpoint, identical rows
    val rebuilt = Tables.memoized("lifecycle_probe", s2, sf) {
      Tables.documents(s2, sf).groupBy(col("source")).agg(count(lit(1)).as("n"))
    }
    assert(checkpointRddId(rebuilt) != rddId, "rebuild did not produce a fresh checkpoint")
    assert(rebuilt.collect().map(_.toSeq).toSet === before)
    Tables.invalidate(s2)
  }

  test("blocks lost BEHIND the cache's back: next consumer self-heals with a rebuild") {
    assume(hasTestData)
    val s2 = spark.newSession()
    def build() = Tables.memoized("lifecycle_loss", s2, sf) {
      Tables.documents(s2, sf).groupBy(col("source")).agg(count(lit(1)).as("n"))
    }
    val built = build()
    val before = built.collect().map(_.toSeq).toSet
    val rddId = checkpointRddId(built)

    // simulate executor loss: strip the checkpoint's blocks without
    // telling the cache (rdd.unpersist, not Tables.invalidate)
    GraftShim.analyzed(built) match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true)
      case other => fail(s"not checkpoint-backed: ${other.nodeName}")
    }
    assert(!GraftShim.allBlocksPresent(
      GraftShim.analyzed(built).asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd),
      "unpersist left blocks behind — loss simulation is vacuous")

    // the stale entry can only throw; memoized must detect the husk,
    // drop it, and rebuild — the next consumer sees correct rows
    val healed = build()
    assert(checkpointRddId(healed) != rddId,
      "memo served the block-less husk instead of rebuilding")
    assert(healed.collect().map(_.toSeq).toSet === before)
    Tables.invalidate(s2)
  }

  test("invalidate touches only the target session's entries") {
    assume(hasTestData)
    val sA = spark.newSession()
    val sB = spark.newSession()
    val a = Tables.memoized("lifecycle_iso", sA, sf) {
      Tables.documents(sA, sf).select(col("doc_id")).limit(5)
    }
    val b = Tables.memoized("lifecycle_iso", sB, sf) {
      Tables.documents(sB, sf).select(col("doc_id")).limit(5)
    }
    val (idA, idB) = (checkpointRddId(a), checkpointRddId(b))
    Tables.invalidate(sA)
    assert(spark.sparkContext.getRDDStorageInfo.exists(_.id == idB),
      "invalidating session A must not release session B's blocks")
    // B's memo is still warm — same instance comes back
    val bAgain = Tables.memoized("lifecycle_iso", sB, sf) {
      fail("memo rebuilt for an uninvalidated session"): DataFrame
    }
    assert(checkpointRddId(bAgain) == idB)
    assert(idA != idB)
    Tables.invalidate(sB)
  }
}

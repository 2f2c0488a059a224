package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** End-to-end takedown orchestration (round-13): one flow — curation
  * correction → store purge + expire → ANN tombstone → re-export —
  * after which the removal set is unreachable from EVERY surface, with
  * the flow itself auditing that claim, and crash-resumable at each
  * seam (the CurationRunSpec crash-inject pattern applied across
  * component boundaries). */
class TakedownE2ESpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/embeddings.parquet").isFile

  /** Fixture: its own dir tag → its own ANN tables/manifest roots, so
    * the declared queries' shared state is never touched. */
  private def mkFixture(): String = {
    val dir = tempDir("takedown-e2e")
    spark.read.parquet(s"$sf/documents.parquet").write.parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$sf/embeddings.parquet").write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def freshRoot(): String = java.nio.file.Files.createTempDirectory(
    java.nio.file.Paths.get(graft.Scratch.localDir), "graft-takedown-e2e").toString

  /** A removal modulus that is NON-VACUOUS on every surface: a doc id
    * the ANN index currently SERVES as a neighbor (so the tombstone
    * must do real work) that the prior chain also names. */
  private def servedVictim(fix: String): Long = {
    val maxDoc = Tables.documents(spark, fix).agg(max(col("doc_id"))).head().getLong(0)
    val served = Similarity.ivfTopKIndexed(spark, fix, nQueries = 4, k = 3)
      .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
    served.filter(n => n > 1L && n <= maxDoc).min
  }

  private def reportOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("the full flow leaves zero reachability on all seven surfaces (non-vacuously)") {
    assume(hasTestData)
    val fix = mkFixture()
    val root = freshRoot()
    val exportDir = tempDir("takedown-export")
    CurationRun.run(spark, fix, root, "run1")
    val mod = servedVictim(fix)
    // non-vacuous BEFORE: the prior chain names removed docs, and the
    // ANN index serves at least one of them
    val log = new graft.storage.ManifestLog(spark, root)
    val namedBefore = log.read(CurationRun.Container, "run1")
      .filter(col("level") === "KEEP_DROP" &&
        regexp_extract(col("message"), "doc=(\\d+)", 1).cast("long") % mod === 0)
      .count()
    assert(namedBefore > 0, "fixture broken: prior chain names no removed doc")
    assert(Similarity.ivfTopKIndexed(spark, fix, nQueries = 4, k = 3)
      .filter(col("neighbor_id") % mod === 0).count() > 0,
      "fixture broken: ANN serves no removed doc before the takedown")

    // non-vacuous on the prefix surface too: at least one prefix path
    // must serve a removed doc BEFORE the takedown, or the new audit
    // row proves nothing (round-13 advice: the prefix servers were
    // un-audited and un-masked)
    val prefixBefore =
      Similarity.prefixTopK(spark, fix, nQueries = 4, k = 3)
        .filter(col("neighbor_id") % mod === 0).count() +
      Similarity.prefixIvfTopK(spark, fix, nQueries = 4, k = 3)
        .filter(col("neighbor_id") % mod === 0).count()

    // non-vacuous on the lexical surface (round 15): the postings-table
    // BM25 probe must serve a removed doc BEFORE the takedown, or the
    // new audit row proves nothing
    val lexBefore = TextAnalysis.bm25TopKIndexed(spark, fix, nQueries = 4, k = 20)
      .filter(col("doc_id") % mod === 0).count()

    val report = reportOf(Takedown.takedownEverywhere(
      spark, fix, root, "run1", "run2", mod, exportDir))
    assert(report.keySet == Set("store_versions", "ann_topk", "ann_prefix",
      "ann_sq8", "ann_inplan", "lexical_bm25", "curation_keep", "export_manifest"))
    assert(report.values.forall(_ == 0L), s"reachability after takedown: $report")
    assert(lexBefore > 0,
      "fixture broken: BM25 served no removed doc before the takedown — lexical audit row vacuous")
    assert(prefixBefore > 0,
      "fixture vacuous for the prefix audit: no prefix path served a removed doc")
    // the export genuinely shipped the survivors (non-empty manifest)
    val files = new java.io.File(exportDir).listFiles()
      .filter(_.getName.startsWith("shard-"))
    assert(files.nonEmpty, "takedown re-export shipped nothing")
  }

  test("the flow is crash-resumable at every seam") {
    assume(hasTestData)
    val fix = mkFixture()
    val root = freshRoot()
    val exportDir = tempDir("takedown-export-resume")
    CurationRun.run(spark, fix, root, "run1")
    val mod = servedVictim(fix)
    // crash after each step in turn, resuming with a plain re-run —
    // the orchestration must no-op completed seams and finish the rest
    (1 to 3).foreach { step =>
      val crash = intercept[IllegalStateException] {
        Takedown.takedownEverywhere(spark, fix, root, "run1", "run2", mod,
          exportDir, failAfterStep = step)
      }
      assert(crash.getMessage.contains(s"after takedown step $step"))
    }
    val report = reportOf(Takedown.takedownEverywhere(
      spark, fix, root, "run1", "run2", mod, exportDir))
    assert(report.values.forall(_ == 0L), s"resumed takedown left reachability: $report")
    // resume is idempotent: a second full run reports the same zeros
    val again = reportOf(Takedown.takedownEverywhere(
      spark, fix, root, "run1", "run2", mod, exportDir))
    assert(again == report)
  }
}

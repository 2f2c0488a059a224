package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The resumable curation run: killed between stages and resumed, the
  * committed shard artifact must be byte-identical to a one-shot run's
  * — the idempotency-tag ledger is doing the resumption, not luck. */
class CurationRunSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  private def freshRoot(): String = java.nio.file.Files.createTempDirectory(
    java.nio.file.Paths.get(graft.Scratch.localDir), "graft-curation-spec").toString

  private def artifact(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("a run killed after stage 1 resumes to byte-identical shards") {
    assume(hasTestData)
    val oneShot = artifact(CurationRun.run(spark, sf, freshRoot(), "run1"))
    assert(oneShot.nonEmpty, "vacuous: the keep set produced no shards")
    val root = freshRoot()
    val crash = intercept[IllegalStateException] {
      CurationRun.run(spark, sf, root, "run1", 8, failAfterStage = 1)
    }
    assert(crash.getMessage.contains("after stage 1"))
    val resumed = artifact(CurationRun.run(spark, sf, root, "run1"))
    assert(resumed == oneShot,
      s"resumed artifact diverged from the one-shot run:\n$resumed\nvs\n$oneShot")
  }

  test("a run killed after stage 2 resumes to byte-identical shards") {
    assume(hasTestData)
    val oneShot = artifact(CurationRun.run(spark, sf, freshRoot(), "run1"))
    val root = freshRoot()
    intercept[IllegalStateException] {
      CurationRun.run(spark, sf, root, "run1", 8, failAfterStage = 2)
    }
    val resumed = artifact(CurationRun.run(spark, sf, root, "run1"))
    assert(resumed == oneShot)
  }

  test("a completed run re-invoked is a no-op: same artifact, no duplicate versions") {
    assume(hasTestData)
    val root = freshRoot()
    val first = artifact(CurationRun.run(spark, sf, root, "run1"))
    val log = new graft.storage.ManifestLog(spark, root)
    val versionsAfterFirst = log.versions(CurationRun.Container, "run1")
    val second = artifact(CurationRun.run(spark, sf, root, "run1"))
    assert(second == first)
    // every stage no-ops at its tag — including stage 3's maintenance
    // (the committed CITE row carries the pin, so a replay neither
    // re-compacts nor re-pins): no new versions at all
    val kd = log.read(CurationRun.Container, "run1")
      .filter(col("level") === "KEEP_DROP").count()
    val decisions = Pipeline.curationDecisions(spark, sf).count()
    assert(kd == decisions,
      s"replayed run duplicated keep/drop rows: $kd vs $decisions documents")
    assert(log.versions(CurationRun.Container, "run1").max == versionsAfterFirst.max,
      "a replayed completed run added manifest versions")
  }

  test("the committed shard receipt matches the direct derivation over the keep set") {
    assume(hasTestData)
    val served = artifact(CurationRun.run(spark, sf, freshRoot(), "run1")
      .select("shard_id", "n_docs", "total_tokens", "content_digest"))
    val keep = Pipeline.curationDecisions(spark, sf)
      .filter(col("decision") === "keep").select(col("doc_id"))
    val kept = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .join(keep, Seq("doc_id"))
    val direct = artifact(Pipeline.shardManifestOf(kept, 8))
    assert(served == direct,
      "the store roundtrip changed the shard receipt")
    // and the keep set is genuinely a strict subset (the gates did work)
    val total = Tables.documents(spark, sf).count()
    val keptN = keep.count()
    assert(keptN > 0 && keptN < total, s"degenerate keep set: $keptN of $total")
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The committed ADMISSION chain (round-13): the O(batch) sibling of
  * the delta run — frozen-rule decisions committed under idempotency
  * tags, the working-set receipt derived from committed artifacts,
  * the citation chained to the prior pin, and the digest index grown
  * so later batches gate against what was already accepted. Runs on a
  * FIXTURE copy of the corpus: the admission digest table is MUTATED
  * by the gate evolution, and the declared queries' oracle contract
  * needs the shared testdata-keyed table to stay pure-base. */
class AdmitRunSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  private def mkFixture(): String = {
    val dir = tempDir("admit-run")
    spark.read.parquet(s"$sf/documents.parquet").write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def freshRoot(): String = java.nio.file.Files.createTempDirectory(
    java.nio.file.Paths.get(graft.Scratch.localDir), "graft-admit-run").toString

  private def artifact(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  private def thrOf(dir: String): Long =
    9L * Tables.documents(spark, dir).agg(max(col("doc_id"))).head().getLong(0) / 10L

  test("the committed receipt equals the direct derivation over prior keeps + frozen-admitted keeps") {
    assume(hasTestData)
    val fix = mkFixture()
    val root = freshRoot()
    val thr = thrOf(fix)
    CurationRun.run(spark, fix, root, "prior", 8, Int.MaxValue, maxDocId = thr)
    // expected decisions BEFORE the run's gate evolution grows the
    // digest table (the run's own A1 executes against the same pure
    // table — the append happens strictly after the A1 commit)
    val frozenKeeps = Pipeline.admissionFrozenIndexed(spark, fix, thr)
      .filter(col("decision") === "keep").select(col("doc_id")).localCheckpoint()
    val served = artifact(CurationRun.admitRun(spark, fix, root, "prior", "admit",
      thr, 8, Int.MaxValue).select("shard_id", "n_docs", "total_tokens",
        "content_digest", "n_new"))
    val priorKeeps = Pipeline.curationDecisionsUpTo(spark, fix, thr)
      .filter(col("decision") === "keep").select(col("doc_id"))
    val kept = Tables.documents(spark, fix).select(col("doc_id"), col("text"))
      .join(priorKeeps.unionByName(frozenKeeps), Seq("doc_id"))
      .withColumn("is_new", col("doc_id") > thr)
    val direct = artifact(Pipeline.shardManifestWithNew(kept, 8)
      .select(col("shard_id"), col("n_docs"), col("total_tokens"),
        col("content_digest"), col("n_new")))
    assert(served == direct, "committed admission receipt diverged from the direct derivation")
    // non-vacuous: the batch actually contributed keeps
    assert(served.map(_(4).asInstanceOf[Long]).sum > 0, "no admitted doc landed in any shard")
  }

  test("a run killed after each stage resumes to byte-identical artifacts") {
    assume(hasTestData)
    val fixA = mkFixture()
    val rootA = freshRoot()
    val thr = thrOf(fixA)
    CurationRun.run(spark, fixA, rootA, "prior", 8, Int.MaxValue, maxDocId = thr)
    val oneShot = artifact(CurationRun.admitRun(spark, fixA, rootA, "prior", "admit",
      thr, 8, Int.MaxValue))
    // same corpus content under a separate fixture (its own digest
    // table), so crash effects can't leak into the one-shot baseline;
    // receipts are content-addressed and so directly comparable
    val fixB = mkFixture()
    val rootB = freshRoot()
    CurationRun.run(spark, fixB, rootB, "prior", 8, Int.MaxValue, maxDocId = thr)
    (1 to 2).foreach { stage =>
      val fixC = mkFixture()
      val rootC = freshRoot()
      CurationRun.run(spark, fixC, rootC, "prior", 8, Int.MaxValue, maxDocId = thr)
      intercept[IllegalStateException] {
        CurationRun.admitRun(spark, fixC, rootC, "prior", "admit", thr, 8,
          failAfterStage = stage)
      }
      val resumed = artifact(CurationRun.admitRun(spark, fixC, rootC, "prior", "admit",
        thr, 8, Int.MaxValue))
      assert(resumed == oneShot, s"resume after stage-$stage crash diverged from one-shot")
    }
    // and a completed run re-invoked is a pure no-op
    val again = artifact(CurationRun.admitRun(spark, fixB, rootB, "prior", "admit",
      thr, 8, Int.MaxValue))
    assert(again == oneShot)
    assert(artifact(CurationRun.admitRun(spark, fixB, rootB, "prior", "admit",
      thr, 8, Int.MaxValue)) == again, "re-invocation changed the committed artifact")
  }
}

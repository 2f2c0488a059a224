package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Export-integrity loop (round-12 verdict #4): [[Pipeline.exportShards]]
  * writes one parquet file per shard, re-reads the WRITTEN BYTES,
  * re-derives every digest from them, and requires equality with the
  * in-plan receipt. Proven here: the verified manifest equals the
  * receipt; a partial export (crash after some shards published)
  * resumes without rewriting completed shards; a tampered shard file
  * fails the verify loudly instead of shipping; and — round-13, the
  * r12 advice item — a re-export after a keep-set change at the SAME
  * nShards converges, because shard names are content-addressed
  * (layout + digest prefix) so changed shards get fresh files instead
  * of being trusted and then failing verification forever. */
class ExportShardsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The published name of a verified-manifest row: layout and content
    * epoch in the name — the exportShardsOf contract. */
  private def nameOf(k: Long, n: Int, dg: String) =
    f"shard-$k%05d-of-$n%d-${dg.take(8)}%s.parquet"

  test("export-then-verify equals the in-plan receipt, value by value") {
    assume(hasTestData)
    val out = tempDir("export")
    val verified = Pipeline.exportShards(spark, sf, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val receipt = Pipeline.shardManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(verified == receipt)
    // one physical file per shard, at the published (content-addressed) names
    receipt.foreach { case (k, _, _, dg) =>
      assert(fs.exists(new Path(out, nameOf(k, 8, dg))), s"shard $k missing")
    }
  }

  test("a crashed export resumes: completed shards are not rewritten, missing ones are") {
    assume(hasTestData)
    val out = tempDir("export")
    Pipeline.exportShards(spark, sf, out)
    val all = fs.listStatus(new Path(out)).filter(_.getPath.getName.startsWith("shard-"))
    assert(all.length >= 3)
    // simulate the crash window: some shards published, some not, and a
    // staging orphan left behind
    val (kept, lost) = all.sortBy(_.getPath.getName).splitAt(all.length / 2)
    lost.foreach(st => fs.delete(st.getPath, false))
    fs.mkdirs(new Path(out, ".staging-orphan"))
    val keptM = kept.map(st => st.getPath.getName -> st.getModificationTime).toMap
    Thread.sleep(20) // mtime resolution guard
    val verified = Pipeline.exportShards(spark, sf, out).collect()
    assert(verified.length == all.length, "resume did not restore every shard")
    // completed shards were skipped, not rewritten (immutable once published)
    fs.listStatus(new Path(out)).filter(st => keptM.contains(st.getPath.getName))
      .foreach { st =>
        assert(st.getModificationTime == keptM(st.getPath.getName),
          s"${st.getPath.getName} was rewritten on resume")
      }
    // a COMPLETED export sweeps crashed attempts' staging orphans
    Pipeline.exportShards(spark, sf, out)
    assert(!fs.exists(new Path(out, ".staging-orphan")),
      "completed export left a stale staging orphan")
  }

  test("re-export with a different nShards sweeps stale shard files; an empty keep set exports cleanly") {
    assume(hasTestData)
    val out = tempDir("export")
    Pipeline.exportShards(spark, sf, out, nShards = 8)
    val before = fs.listStatus(new Path(out)).count(_.getPath.getName.startsWith("shard-"))
    val after4 = Pipeline.exportShards(spark, sf, out, nShards = 4).collect()
    val left = fs.listStatus(new Path(out))
      .map(_.getPath.getName).filter(_.startsWith("shard-")).toSet
    // the dir equals exactly the new receipt — no stale nShards=8
    // files survive for a consumer's shard-*.parquet glob
    assert(left == after4.map(r => nameOf(r.getLong(0), 4, r.getString(3))).toSet,
      s"stale shards survived the re-export: $left (was $before files)")
    // the atomic consumer manifest names exactly the verified files
    val mf = new String(
      org.apache.commons.io.IOUtils.toByteArray(
        fs.open(new Path(out, "_export_manifest.json"))), "UTF-8")
    after4.foreach { r =>
      assert(mf.contains(nameOf(r.getLong(0), 4, r.getString(3))) &&
             mf.contains(r.getString(3)),
        s"manifest missing shard ${r.getLong(0)} or its digest")
    }
    assert(!mf.contains("-of-8-"), "manifest still names the old layout")
    // empty keep set (a takedown can empty a source): zero shards,
    // zero files, an empty verified manifest — not an AnalysisException
    val empty = tempDir("export")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(0)
    assert(Pipeline.exportShardsOf(spark, docs, empty, 8).collect().isEmpty)
    assert(!fs.listStatus(new Path(empty)).exists(_.getPath.getName.startsWith("shard-")))
  }

  test("re-export after a keep-set change at the SAME nShards converges (r12 advice)") {
    assume(hasTestData)
    val out = tempDir("export")
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val full = Pipeline.exportShardsOf(spark, docs, out, 4).collect()
    // takedown-shaped change: drop some docs, keep the layout
    val dropped = docs.select(col("doc_id")).orderBy(col("doc_id")).limit(5)
      .collect().map(_.getLong(0)).toSet
    val kept = docs.filter(!col("doc_id").isin(dropped.toSeq: _*))
    // pre-fix behavior: every shard file "existed" under its old name,
    // nothing was rewritten, and the byte-level verify threw forever.
    // Content-addressed names give changed shards fresh files instead.
    val after = Pipeline.exportShardsOf(spark, kept, out, 4).collect()
    val receipt = Pipeline.shardManifestOf(kept, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(after.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      == receipt, "re-export did not verify against the new keep set's receipt")
    // some shard really changed content (else the scenario is vacuous)
    val oldDigests = full.map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(after.exists(r => oldDigests(r.getLong(0)) != r.getString(3)),
      "keep-set change did not change any shard digest — test fixture too small")
    // zero grace: the dir equals exactly the new receipt, stale
    // old-content files are gone
    val left = fs.listStatus(new Path(out))
      .map(_.getPath.getName).filter(_.startsWith("shard-")).toSet
    assert(left == after.map(r => nameOf(r.getLong(0), 4, r.getString(3))).toSet,
      s"stale old-content shards survived the converged re-export: $left")
    // idempotent: a third run with the same keep set rewrites nothing
    val names = fs.listStatus(new Path(out)).filter(_.getPath.getName.startsWith("shard-"))
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    Thread.sleep(20)
    Pipeline.exportShardsOf(spark, kept, out, 4)
    fs.listStatus(new Path(out)).filter(st => names.contains(st.getPath.getName))
      .foreach(st => assert(st.getModificationTime == names(st.getPath.getName),
        s"${st.getPath.getName} rewritten by an idempotent re-export"))
  }

  test("a retention grace keeps the retired layout readable for in-flight old-manifest readers") {
    assume(hasTestData)
    val out = tempDir("export")
    Pipeline.exportShards(spark, sf, out, nShards = 8)
    val old8 = fs.listStatus(new Path(out))
      .map(_.getPath.getName).filter(_.contains("-of-8-")).toSet
    assert(old8.nonEmpty)
    val grace = java.time.Duration.ofHours(1)
    // flip to nShards=4 under a 1h grace: the 8-layout was named by
    // the manifest THIS flip replaces, so a reader that fetched it
    // just before the flip keeps every file — nothing retires yet
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    Pipeline.exportShardsOf(spark, docs, out, 4, grace)
    val afterFlip = fs.listStatus(new Path(out)).map(_.getPath.getName).toSet
    assert(old8.forall(afterFlip.contains),
      "grace-protected layout was swept at the flip that retired it")
    // a SECOND graced export moments later: the 8-layout is now an
    // earlier flip's retiree, but the prior flip is seconds old —
    // still inside the grace, still protected
    Pipeline.exportShardsOf(spark, docs, out, 4, grace)
    val afterSecond = fs.listStatus(new Path(out)).map(_.getPath.getName).toSet
    assert(old8.forall(afterSecond.contains),
      "stale layout swept before the grace elapsed since its retiring flip")
    // zero grace converges immediately (the throwaway/test default)
    Pipeline.exportShardsOf(spark, docs, out, 4)
    val afterZero = fs.listStatus(new Path(out))
      .map(_.getPath.getName).filter(_.startsWith("shard-")).toSet
    assert(afterZero.forall(_.contains("-of-4-")),
      s"zero-grace export did not converge: $afterZero")
  }

  test("a tampered shard file fails the verify instead of shipping") {
    assume(hasTestData)
    val out = tempDir("export")
    val rows = Pipeline.exportShards(spark, sf, out).collect()
    assert(rows.length >= 2)
    // swap one shard's bytes for another's: the receipt-named file
    // exists, so the writer skips — the verify pass must catch the
    // divergence (content-addressed names defend against STALE
    // exports; in-place tamper of a published name is still possible
    // and still must fail loudly)
    val a = new Path(out, nameOf(rows(0).getLong(0), 8, rows(0).getString(3)))
    val b = new Path(out, nameOf(rows(1).getLong(0), 8, rows(1).getString(3)))
    fs.delete(a, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, b, fs, a, false,
      spark.sparkContext.hadoopConfiguration)
    val e = intercept[IllegalArgumentException](Pipeline.exportShards(spark, sf, out))
    assert(e.getMessage.contains("export verification FAILED"))
    // the FAILED re-export never re-published the consumer manifest:
    // it still describes the original verified export (consistent
    // even though the dir's bytes are now tampered — a consumer
    // verifying digests against the manifest catches the tamper too)
    val mf = new String(
      org.apache.commons.io.IOUtils.toByteArray(
        fs.open(new Path(out, "_export_manifest.json"))), "UTF-8")
    rows.foreach(r => assert(mf.contains(r.getString(3)),
      "a failed re-export corrupted the consumer manifest"))
  }
}

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

  // ---- the incremental delta run (round-11) ----

  private def thrOf(dir: String): Long =
    9L * Tables.documents(spark, dir).agg(max(col("doc_id"))).head().getLong(0) / 10L

  test("delta ∘ prior ≡ full: the delta receipt equals a full run's over the combined corpus") {
    assume(hasTestData)
    val thr = thrOf(sf)
    val root = freshRoot()
    CurationRun.run(spark, sf, root, "run1", 8, Int.MaxValue, maxDocId = thr)
    val delta = CurationRun.deltaRun(spark, sf, root, "run1", "run2", thr, 8, Int.MaxValue)
    val full = CurationRun.run(spark, sf, freshRoot(), "full")
    val deltaCommon = artifact(delta.select("shard_id", "n_docs", "total_tokens", "content_digest"))
    val fullCommon = artifact(full.select("shard_id", "n_docs", "total_tokens", "content_digest"))
    assert(deltaCommon == fullCommon,
      s"delta ∘ prior diverged from the full run:\n$deltaCommon\nvs\n$fullCommon")
    // the batch genuinely landed: n_new sums to the combined keep set's
    // batch members
    val nNew = delta.agg(sum(col("n_new"))).head().getLong(0)
    val batchKeep = Pipeline.curationDecisions(spark, sf)
      .filter(col("decision") === "keep" && col("doc_id") > thr).count()
    assert(nNew == batchKeep && nNew > 0, s"n_new $nNew vs batch keeps $batchKeep")
  }

  test("a delta run killed after each stage resumes to byte-identical shards") {
    assume(hasTestData)
    val thr = thrOf(sf)
    val oneRoot = freshRoot()
    CurationRun.run(spark, sf, oneRoot, "run1", 8, Int.MaxValue, maxDocId = thr)
    val oneShot = artifact(CurationRun.deltaRun(spark, sf, oneRoot, "run1", "run2", thr, 8, Int.MaxValue))
    assert(oneShot.nonEmpty)
    Seq(1, 2).foreach { crashAfter =>
      val root = freshRoot()
      CurationRun.run(spark, sf, root, "run1", 8, Int.MaxValue, maxDocId = thr)
      val crash = intercept[IllegalStateException] {
        CurationRun.deltaRun(spark, sf, root, "run1", "run2", thr, 8, failAfterStage = crashAfter)
      }
      assert(crash.getMessage.contains(s"after delta stage $crashAfter"))
      val resumed = artifact(CurationRun.deltaRun(spark, sf, root, "run1", "run2", thr, 8, Int.MaxValue))
      assert(resumed == oneShot,
        s"delta resumed after stage-$crashAfter crash diverged:\n$resumed\nvs\n$oneShot")
    }
  }

  test("a completed delta run re-invoked is a no-op; it refuses to run before the prior chain is sealed") {
    assume(hasTestData)
    val thr = thrOf(sf)
    val root = freshRoot()
    // no prior chain at all → loud refusal
    val bare = intercept[IllegalStateException] {
      CurationRun.deltaRun(spark, sf, root, "run1", "run2", thr, 8, Int.MaxValue)
    }
    assert(bare.getMessage.contains("no committed citation"))
    CurationRun.run(spark, sf, root, "run1", 8, Int.MaxValue, maxDocId = thr)
    val first = artifact(CurationRun.deltaRun(spark, sf, root, "run1", "run2", thr, 8, Int.MaxValue))
    val log = new graft.storage.ManifestLog(spark, root)
    val vMax = log.versions(CurationRun.Container, "run2").max
    val second = artifact(CurationRun.deltaRun(spark, sf, root, "run1", "run2", thr, 8, Int.MaxValue))
    assert(second == first)
    assert(log.versions(CurationRun.Container, "run2").max == vMax,
      "a replayed completed delta run added manifest versions")
    // the citation carries the chain reference to the prior pin
    val chainRows = log.read(CurationRun.Container, "run2")
      .filter(col("level") === "CITE" && col("message").contains("prior_run=run1")).count()
    assert(chainRows == 1L, "delta citation lost its prior-run chain reference")
  }

  /** A corpus where the batch BRIDGES two prior near-dup clusters: base
    * clusters {A,B} (keeper A) and {C,D} (keeper C); batch doc E is
    * Jaccard-0.5 to both B and C (E = B ++ C with the junction words
    * shared so E's shingle set is exactly the union), so the combined
    * component is {A..E} with keeper A — C's prior `keep` must be
    * REVOKED by a correction row, and the receipt must still equal a
    * full run's over the combined corpus. */
  test("a bridging batch doc revokes a prior keeper; delta still equals the full run") {
    val w = 30
    // 4-5 char words, two stopwords per doc part, all-distinct otherwise
    def words(prefix: String): Seq[String] =
      (1 to w).map {
        case 5 => "the"
        case 20 => "the"
        case i => f"$prefix${i}%02dxx".take(5)
      }
    val bWords = words("b")
    val cWords = bWords.takeRight(2) ++ words("c").drop(2)
    val aText = bWords.dropRight(1).mkString(" ")
    val bText = bWords.mkString(" ")
    val cText = cWords.mkString(" ")
    val dText = cWords.dropRight(1).mkString(" ")
    val eText = (bWords ++ cWords.drop(2)).mkString(" ")
    val fillers = (4 to 23).map { i =>
      (i.toLong, (1 to w).map {
        case 5 => "the"
        case 20 => "the"
        case j => f"f$i%02d$j%02dx".take(5)
      }.mkString(" "))
    }
    val rows = (Seq(0L -> aText, 1L -> bText, 2L -> cText, 3L -> dText) ++ fillers ++
      Seq(24L -> eText)).map { case (id, t) =>
      (id, t, "en", "web", t.length.toLong)
    }
    val dir = tempDir("curation-bridge")
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val thr = 23L
    val root = freshRoot()
    CurationRun.run(spark, dir, root, "run1", 4, Int.MaxValue, maxDocId = thr)
    val log = new graft.storage.ManifestLog(spark, root)
    // the prior run kept BOTH cluster keepers
    val priorKeeps = log.read(CurationRun.Container, "run1")
      .filter(col("level") === "KEEP_DROP" && col("message").endsWith("dec=keep"))
      .select(regexp_extract(col("message"), "doc=(\\d+)", 1).cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(priorKeeps.contains(0L) && priorKeeps.contains(2L),
      s"fixture broken: prior keepers not {0, 2} in $priorKeeps")
    val delta = CurationRun.deltaRun(spark, dir, root, "run1", "run2", thr, 4, Int.MaxValue)
    val deltaCommon = artifact(delta.select("shard_id", "n_docs", "total_tokens", "content_digest"))
    val full = CurationRun.run(spark, dir, freshRoot(), "full", 4)
    assert(deltaCommon == artifact(full.select("shard_id", "n_docs", "total_tokens", "content_digest")),
      "bridge case: delta receipt diverged from the full run")
    // the revocation is explicit in the committed delta artifact
    val revoked = log.read(CurationRun.Container, "run2")
      .filter(col("level") === "DELTA_KEEP_DROP" &&
        col("message").contains("doc=2 ") && col("message").contains("was=keep"))
      .count()
    assert(revoked == 1L, "prior keeper 2's revocation row missing from the delta artifact")
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

  test("the committed receipt matches a PHYSICAL export of the keep set, byte-for-byte (round-12)") {
    assume(hasTestData)
    // the full loop a release actually ships: run → committed receipt
    // → write the shard FILES → re-derive every digest from the bytes
    // on disk → equality. exportShardsOf requires disk == its own
    // receipt internally; this pins the remaining edge — that ITS
    // receipt over the keep set is the RUN'S committed one.
    val served = artifact(CurationRun.run(spark, sf, freshRoot(), "run1")
      .select("shard_id", "n_docs", "total_tokens", "content_digest"))
    val keep = Pipeline.curationDecisions(spark, sf)
      .filter(col("decision") === "keep").select(col("doc_id"))
    val kept = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .join(keep, Seq("doc_id"))
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Scratch.localDir), "curation-export").toString
    try {
      val exported = artifact(Pipeline.exportShardsOf(spark, kept, out, 8))
      assert(exported == served,
        "bytes on disk verify against a receipt that is NOT the run's committed one")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  // ---- the takedown run (round-11) ----

  test("takedown ∘ prior ≡ full-on-filtered: the receipt equals a full run minus the removed set") {
    assume(hasTestData)
    val root = freshRoot()
    CurationRun.run(spark, sf, root, "run1")
    val td = CurationRun.takedownRun(spark, sf, root, "run1", "run2", 13L, 8, Int.MaxValue)
    // the ground truth: a from-scratch run over a physically filtered corpus
    val filteredDir = tempDir("takedown-filtered")
    Tables.documents(spark, sf).filter(col("doc_id") % 13 =!= 0)
      .write.parquet(s"$filteredDir/documents.parquet")
    val full = CurationRun.run(spark, filteredDir, freshRoot(), "full")
    assert(artifact(td.select("shard_id", "n_docs", "total_tokens", "content_digest")) ==
           artifact(full.select("shard_id", "n_docs", "total_tokens", "content_digest")),
      "takedown receipt diverged from the full run over the filtered corpus")
    // every removed doc has its removal row in the committed artifact
    val log = new graft.storage.ManifestLog(spark, root)
    val removedRows = log.read(CurationRun.Container, "run2")
      .filter(col("level") === "TAKEDOWN_KEEP_DROP" && col("message").contains("dec=removed"))
      .count()
    val removedDocs = Tables.documents(spark, sf).filter(col("doc_id") % 13 === 0).count()
    assert(removedRows == removedDocs && removedDocs > 0,
      s"removal rows $removedRows vs removed docs $removedDocs")
  }

  test("a takedown run killed after each stage resumes to byte-identical shards") {
    assume(hasTestData)
    val oneRoot = freshRoot()
    CurationRun.run(spark, sf, oneRoot, "run1")
    val oneShot = artifact(CurationRun.takedownRun(spark, sf, oneRoot, "run1", "run2", 13L, 8, Int.MaxValue))
    assert(oneShot.nonEmpty)
    Seq(1, 2).foreach { crashAfter =>
      val root = freshRoot()
      CurationRun.run(spark, sf, root, "run1")
      val crash = intercept[IllegalStateException] {
        CurationRun.takedownRun(spark, sf, root, "run1", "run2", 13L, 8, failAfterStage = crashAfter)
      }
      assert(crash.getMessage.contains(s"after takedown stage $crashAfter"))
      val resumed = artifact(CurationRun.takedownRun(spark, sf, root, "run1", "run2", 13L, 8, Int.MaxValue))
      assert(resumed == oneShot,
        s"takedown resumed after stage-$crashAfter crash diverged:\n$resumed\nvs\n$oneShot")
    }
  }

  test("removing a keeper re-admits its suppressed duplicates — both exact and near-dup re-election") {
    val w = 30
    def words(prefix: String): Seq[String] =
      (1 to w).map {
        case 5 => "the"
        case 20 => "the"
        case i => f"$prefix${i}%02dxx".take(5)
      }
    // exact-dup pair: 13 (keeper, removed) and 20 (suppressed copy)
    val dupText = words("d").mkString(" ")
    // near-dup trio: 26 (component-min keeper, removed), 27, 28
    val nWords = words("n")
    val t26 = nWords.mkString(" ")
    val t27 = nWords.dropRight(1).mkString(" ")
    val t28 = (nWords.take(1) ++ nWords.drop(2)).mkString(" ")
    val fillerIds = ((1 to 12) ++ (14 to 19) ++ (21 to 25)).map(_.toLong)
    val fillers = fillerIds.map { i =>
      (i, (1 to w).map {
        case 5 => "the"
        case 20 => "the"
        case j => f"f$i%02d$j%02dx".take(5)
      }.mkString(" "))
    }
    val rows = (fillers ++ Seq(13L -> dupText, 20L -> dupText,
      26L -> t26, 27L -> t27, 28L -> t28)).map { case (id, t) =>
      (id, t, "en", "web", t.length.toLong)
    }
    val dir = tempDir("takedown-reelect")
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val root = freshRoot()
    CurationRun.run(spark, dir, root, "run1", 4)
    val log = new graft.storage.ManifestLog(spark, root)
    def decOf(runId: String, level: String): Map[Long, String] =
      log.read(CurationRun.Container, runId)
        .filter(col("level") === level)
        .select(regexp_extract(col("message"), "doc=(\\d+)", 1).cast("long"),
                regexp_extract(col("message"), "dec=(\\w+)", 1))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val prior = decOf("run1", "KEEP_DROP")
    assert(prior(13L) == "keep" && prior(20L) == "exact_dup",
      s"fixture broken: exact pair decisions ${prior(13L)}/${prior(20L)}")
    assert(prior(26L) == "keep" && prior(27L) == "near_dup" && prior(28L) == "near_dup",
      s"fixture broken: trio decisions ${prior(26L)}/${prior(27L)}/${prior(28L)}")

    val td = CurationRun.takedownRun(spark, dir, root, "run1", "run2", 13L, 4, Int.MaxValue)
    val t1 = decOf("run2", "TAKEDOWN_KEEP_DROP")
    // removals recorded with their prior decision
    assert(t1(13L) == "removed" && t1(26L) == "removed")
    // the re-elections are explicit correction rows
    assert(t1.get(20L).contains("keep"),
      s"exact-dup copy not re-admitted after its keeper's removal: $t1")
    assert(t1.get(27L).contains("keep"),
      s"near-dup cluster did not re-elect a keeper: $t1")
    assert(!t1.contains(28L) || t1(28L) == "near_dup",
      "the non-minimum survivor must stay suppressed under the re-elected keeper")
    // and the receipt still equals a full run over the filtered corpus
    val filteredDir = tempDir("takedown-reelect-f")
    Tables.documents(spark, dir).filter(col("doc_id") % 13 =!= 0)
      .write.parquet(s"$filteredDir/documents.parquet")
    val full = CurationRun.run(spark, filteredDir, freshRoot(), "full", 4)
    assert(artifact(td.select("shard_id", "n_docs", "total_tokens", "content_digest")) ==
           artifact(full.select("shard_id", "n_docs", "total_tokens", "content_digest")),
      "re-election case: takedown receipt diverged from the filtered full run")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The EXECUTABLE curation run — the declared stages composed into one
  * resumable artifact chain, written THROUGH [[graft.storage.ManifestLog]]
  * so the run inherits the store's commit semantics instead of inventing
  * its own:
  *
  *   1. KEEP_DROP — one decision per document
  *      ([[Pipeline.curationDecisions]]: exact-dup → near-dup → quality
  *      → keep), committed as a tagged append;
  *   2. SHARD — the export receipt ([[Pipeline.shardManifestOf]]) over
  *      the KEEP set, derived from the COMMITTED stage-1 artifact (read
  *      back and parsed, never from a re-run of the derivation — the
  *      structural guarantee that a resume cannot fork the shard
  *      content even if an upstream derivation were nondeterministic);
  *   3. CITE — the replay-proven citation: per-level row counts +
  *      order-independent integer digests of the pinned version,
  *      recomputed after an in-run compaction + grace GC and required
  *      identical BEFORE the citation is emitted
  *      ([[LogQueries.pipeSnapshotPin]]'s contract, now sealing a
  *      whole run).
  *
  * RESUMABILITY is the manifest's idempotency-tag ledger: every stage
  * commits under a fixed tag, a replayed stage no-ops at the tag
  * pre-check (the artifact DataFrame is lazy, so a committed stage's
  * derivation is never recomputed), and a run killed between stages
  * resumes by simply calling [[run]] again — the spec proves the
  * resumed shards are byte-identical to a one-shot run's. Artifact
  * rows carry a CONSTANT timestamp: the chain's identity lives in the
  * message content, and wall-clock stamps would break byte-identity
  * across runs.
  *
  * Scale shape: every stage is a declared-operator plan (their scale
  * stories hold unchanged); the only driver-side rows are the
  * nShards-sized shard receipt and the per-level citation. */
object CurationRun {

  val Container = "curation"
  private val KeepDropTag = "stage1-keepdrop"
  private val ShardsTag = "stage2-shards"
  private val CiteTag = "stage3-cite"
  private val RunTs = "2024-01-01 00:00:00"

  def run(s: SparkSession, dir: String, root: String, runId: String,
          nShards: Int = 8): DataFrame =
    run(s, dir, root, runId, nShards, Int.MaxValue)

  /** `failAfterStage` is the crash-injection seam for the resume spec:
    * the run throws AFTER stage N's commit, exactly the window a real
    * crash hits. */
  private[ops] def run(s: SparkSession, dir: String, root: String, runId: String,
                       nShards: Int, failAfterStage: Int): DataFrame = {
    val log = new graft.storage.ManifestLog(s, root)
    def msgRows(level: String, messages: DataFrame): DataFrame =
      messages.select(lit(RunTs).cast("timestamp").as("timestamp"),
        lit(level).as("level"), col("message"))

    // ---- stage 1: per-document keep/drop manifest -------------------
    log.appendIdempotent(msgRows("KEEP_DROP",
      Pipeline.curationDecisions(s, dir).select(
        concat(lit("doc="), col("doc_id"), lit(" src="), col("source"),
               lit(" dec="), col("decision")).as("message"))),
      Container, runId, KeepDropTag)
    if (failAfterStage <= 1)
      throw new IllegalStateException("injected crash after stage 1")

    // ---- stage 2: shard receipt over the COMMITTED keep set ---------
    val keepIds = log.read(Container, runId)
      .filter(col("level") === "KEEP_DROP" && col("message").endsWith("dec=keep"))
      .select(regexp_extract(col("message"), "doc=(\\d+)", 1).cast("long").as("doc_id"))
    val kept = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .join(keepIds, Seq("doc_id"))
    log.appendIdempotent(msgRows("SHARD",
      Pipeline.shardManifestOf(kept, nShards).select(
        concat(lit("shard="), col("shard_id"), lit(" n="), col("n_docs"),
               lit(" tok="), col("total_tokens"), lit(" dg="), col("content_digest"))
          .as("message"))),
      Container, runId, ShardsTag)
    if (failAfterStage <= 2)
      throw new IllegalStateException("injected crash after stage 2")

    // ---- stage 3: replay-proven citation of the pinned version ------
    // The citation IS the run's memory: a re-invocation of a COMPLETED
    // run reads the pinned version back from the committed CITE row and
    // skips the maintenance below entirely — replays must not re-pin
    // (the artifact would drift) or re-compact (version churn for
    // nothing). A resume that crashed between the compaction and the
    // CITE commit pins the compacted version instead — same logical
    // rows by the compaction contract, so the digests cannot differ.
    val committedCite = log.read(Container, runId)
      .filter(col("level") === "CITE")
      .select(regexp_extract(col("message"), "pinned=(\\d+)", 1).cast("long"))
      .limit(1).collect()
    val pinned = if (committedCite.nonEmpty) committedCite(0).getLong(0) else {
      val v = log.versions(Container, runId).max
      def citationOf(at: Long): Seq[(String, Long, Long)] =
        log.readAt(Container, runId, at)
          .groupBy(col("level"))
          .agg(count(lit(1)).as("n_rows"),
               sum(expr(
                 "CAST(conv(substr(md5(message), 1, 15), 16, 10) AS BIGINT) % 1000000007"))
                 .as("digest"))
          .orderBy(col("level"))
          .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val cite = citationOf(v)
      log.compact(Container, runId)
      log.expire(Container, runId, java.time.Instant.now().minusSeconds(3600))
      val replay = citationOf(v)
      require(cite == replay,
        s"pinned snapshot v$v failed to replay after compaction+GC: $cite vs $replay")
      log.appendIdempotent(msgRows("CITE",
        s.createDataFrame(cite.map { case (lv, n, dg) =>
          Tuple1(s"level=$lv n=$n digest=$dg pinned=$v")
        }).toDF("message")),
        Container, runId, CiteTag)
      v
    }

    // the run's return value: the shard receipt parsed back from the
    // PINNED snapshot — the committed artifact, not the in-plan rows
    log.readAt(Container, runId, pinned)
      .filter(col("level") === "SHARD")
      .select(
        regexp_extract(col("message"), "shard=(\\d+)", 1).cast("long").as("shard_id"),
        regexp_extract(col("message"), " n=(\\d+)", 1).cast("long").as("n_docs"),
        regexp_extract(col("message"), "tok=(\\d+)", 1).cast("long").as("total_tokens"),
        regexp_extract(col("message"), "dg=([0-9a-f]+)", 1).as("content_digest"))
      .withColumn("pinned_version", lit(pinned))
      .orderBy(col("shard_id"))
  }

  /** The declared-query wrapper (`pipe_curation_run`): a one-shot run
    * against a throwaway store, its nShards-sized receipt collected so
    * the temp root can be cleaned before the DataFrame is served
    * ([[LogQueries.logSnapshotRead]]'s pattern). */
  def runSelfContained(s: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Scratch.localDir), "graft-curation").toString
    try {
      val df = run(s, dir, root, "run1")
      val rows = df.collect().toSeq
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), df.schema)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}

package graft.storage

import org.apache.spark.sql.DataFrame

/** The read-path storage surface [[graft.engine.QueryEngine]] serves
  * from — the seam that makes the single-node store ([[LogStore]]) and
  * the cluster store ([[ManifestLog]]) interchangeable behind the same
  * query engine: a user of one can switch to the other without
  * touching a query.
  *
  * The visibility contract differs by implementation and that is the
  * point: [[LogStore]] guards scans against compaction's publish phase
  * with a per-session read lock, so [[withReadSnapshot]] wraps the
  * materializing action; [[ManifestLog]] reads are snapshot-isolated
  * by construction (a resolved manifest's files are immutable until
  * grace-window GC), so its [[withReadSnapshot]] is a no-op — the
  * default here. Both deliver the same guarantee the engine needs:
  * the file set a query scans stays live for the duration of the
  * action. */
trait LogTier {

  /** The session's rows (bag semantics, duplicates preserved). */
  def read(container: String, session: String): DataFrame

  /** Append a batch (timestamp, level, message); returns published
    * bytes. Ack point per the reference contract: durable, not
    * necessarily archived. */
  def append(df: DataFrame, container: String, session: String): Long

  /** (cold files, cold bytes, hot files, hot bytes) from the file
    * index — the A4-A6 summary surface; never a data scan. */
  def tierStats(container: String, session: String): (Long, Long, Long, Long)

  /** Every (container, session) present in storage — the maintenance
    * loop's work list. */
  def sessions(): Seq[(String, String)]

  /** Hot-tier byte size from the file index (the rotation trigger's
    * input; default derives from [[tierStats]]). */
  def hotBytes(container: String, session: String): Long =
    tierStats(container, session)._4

  /** Rewrite the session's hot tier into sized cold files with
    * exactly-once visibility; returns retired hot bytes. */
  def compact(container: String, session: String): Long

  /** Run a materializing action with the session's visible file set
    * guaranteed live. Default: no-op (snapshot-isolated stores). */
  def withReadSnapshot[T](container: String, session: String)(f: => T): T = f

  /** Tier stats and unfiltered row count from ONE consistent view of
    * the session — the summary endpoint's contract. The default wraps
    * both calls in a single [[withReadSnapshot]] window, which is
    * sufficient for lock-based stores; snapshot stores (one manifest
    * resolve per call) override to derive both from a single resolve
    * (round-7 advice: two independent resolves could mix file counts
    * and row totals from different snapshots). */
  def statsAndRows(container: String, session: String): ((Long, Long, Long, Long), Long) =
    withReadSnapshot(container, session) {
      (tierStats(container, session), read(container, session).count())
    }
}

/** Listing rules shared by both stores (one definition, so the tiers
  * can never diverge on which staged files count as publishable):
  * recursive descent, hidden (`_`/`.`) names skipped, parquet files
  * only, vanished directories treated as empty. */
private[graft] object StoreFiles {
  def walkParquet(fs: org.apache.hadoop.fs.FileSystem,
                  dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    def go(d: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      try fs.listStatus(d).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Seq.empty
        else if (st.isDirectory) go(st.getPath)
        else if (name.endsWith(".parquet")) Seq(st)
        else Seq.empty
      } catch { case _: java.io.FileNotFoundException => Seq.empty }
    if (!fs.exists(dir)) Seq.empty else go(dir)
  }
}

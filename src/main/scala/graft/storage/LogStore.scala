package graft.storage

import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.LogSchema

/** Two-tier partitioned Parquet log store (SURVEY §1.5, §7.1).
  *
  * Layout on one root:
  * {{{
  *   <root>/hot/container=<c>/session=<s>/<uuid>.parquet   // small append files
  *   <root>/cold/container=<c>/session=<s>/<uuid>.parquet  // compacted archives
  * }}}
  *
  * Design vs the reference (writer.py, reader.py):
  *  - The reference's hot tier is Arrow IPC stream files rotated at
  *    10 MiB; here the hot tier is small Parquet files — one columnar
  *    format end-to-end, and both tiers are a single `spark.read` with
  *    directory-partition pruning on (container, session) replacing the
  *    SQLite file catalog (metadata.py:44-53).
  *  - Reads union cold + hot (reader.py:488-510 bag semantics) and are
  *    read-your-writes: an append is visible to the next read.
  *  - Compaction rewrites a session's hot files into sized cold files and
  *    then retires exactly the input files — fixing the reference's
  *    double-count-on-restart bug (writer.py:181-231, SURVEY §7.4.1).
  *
  * Scale notes: partition dirs bound fan-out to (container, session);
  * appends coalesce to one file per batch to limit small-file pressure;
  * compaction sizes output by bytes (targetFileBytes) so cold files stay
  * scan-friendly at 100 TB.
  */
final class LogStore(spark: SparkSession, root: String,
                     targetFileBytes: Long = 128L * 1024 * 1024) extends LogTier {

  private val hotDir = s"$root/hot"
  private val coldDir = s"$root/cold"

  private def fs: FileSystem = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Crash recovery: a compaction that died between its staging write and
  // publish leaves an orphaned .staging-* dir; its hot snapshot was never
  // retired, so the data is intact — the orphan is garbage. One store
  // instance owns a root at a time (single-writer, like the reference's
  // per-process buffer manager), so construction is a safe point to sweep.
  locally {
    val rootPath = new Path(root)
    if (fs.exists(rootPath))
      fs.listStatus(rootPath).foreach { st =>
        if (st.isDirectory && st.getPath.getName.startsWith(".staging-"))
          fs.delete(st.getPath, true)
      }
  }

  /** Append a batch for one (container, session). Synchronous — ack means
    * rows are durable in the hot tier (reference main.py:330-337 semantics:
    * 201 = buffered, not archived).
    *
    * Writes go through a per-call UNIQUE staging dir and publish with one
    * atomic rename: concurrent appends to the same session never share a
    * committer `_temporary` dir (direct `SaveMode.Append` writers racing
    * in one directory can clobber each other's temp files — the reference
    * serializes appends per session for the same reason, writer.py:238),
    * and a batch is never partially visible to readers.
    *
    * Returns the published file's size in bytes — callers feed it to
    * [[graft.engine.Compactor.noteAppend]] so rotation triggers from an
    * in-memory counter (the reference's size accounting, writer.py:
    * 246-249) instead of re-listing the directory on every append. */
  def append(df: DataFrame, container: String, session: String): Long =
    stagedAppend(df, container, session, None)

  /** Append with a caller-supplied idempotency tag: the batch lands as a
    * single `<tag>.parquet` file plus a durable commit marker under
    * `<root>/tags/`, and a replay of the same tag is a no-op (returns
    * -1). This is the exactly-once hook for Structured Streaming's
    * `foreachBatch` (tag = batch id).
    *
    * The marker — not the hot file — is the replay check: compaction
    * moves hot files to cold (destroying a file-existence marker, the
    * round-2 exactly-once hole), but never touches `tags/`. A crash
    * after publish therefore still skips the replayed batch even when
    * the batch's file has already been compacted away. */
  def appendIdempotent(df: DataFrame, container: String, session: String, tag: String): Long =
    stagedAppend(df, container, session, Some(tag))

  private def tagMarker(container: String, session: String, tag: String): Path =
    new Path(s"$root/tags/container=$container/session=$session/$tag")

  /** Stage to a unique dir, publish as `<tag>.parquet` with one atomic
    * rename; -1 if the tag was already committed (idempotent replay),
    * else the published byte count. */
  private def stagedAppend(df: DataFrame, container: String, session: String,
                           idemTag: Option[String]): Long = {
    require(LogSchema.isValidId(container), s"invalid container id: $container")
    require(LogSchema.isValidId(session), s"invalid session id: $session")
    // the tag becomes a filename AND a marker-file name; a ':' would
    // parse as a URI scheme in Hadoop Path — filename-safe charset only
    idemTag.foreach(t => require(t.nonEmpty && t.forall(c =>
        c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"invalid idempotency tag (use letters, digits, '.', '_', '-'): $t"))
    val tag = idemTag.getOrElse(s"append-${UUID.randomUUID()}")
    val target = new Path(s"$hotDir/container=$container/session=$session")
    val dst = new Path(target, s"$tag.parquet")
    // Replay check: durable marker first (survives compaction), hot file
    // second (covers the publish-then-crash-before-marker window while
    // the file is still hot). When the hot file exists but the marker is
    // missing (that crash window), BACKFILL the marker before skipping.
    // The check+backfill runs under the session view READ lock so it can
    // never interleave with compaction's write-locked retire phase
    // (marker-absent → file-retired → file-check-fails → re-publish);
    // compaction additionally writes markers for every tagged hot file
    // it retires, so the crash-window file is marker-covered no matter
    // which of replay or compaction reaches it first.
    val alreadyCommitted = withViewLock(container, session) {
      if (idemTag.isDefined && fs.exists(tagMarker(container, session, tag))) true
      else if (fs.exists(dst)) {
        idemTag.foreach { t =>
          val m = tagMarker(container, session, t)
          fs.mkdirs(m.getParent)
          if (!fs.exists(m)) fs.create(m, true).close()
        }
        true
      } else false
    }
    if (alreadyCommitted) return -1L
    val staging = new Path(s"$root/.staging-$tag-$container-$session")
    df.select("timestamp", "level", "message")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val staged = walkFiles(staging.toString)
    // A successful write always produces exactly one file (even for an
    // empty batch); an empty listing means the listing itself failed —
    // abort loudly rather than silently dropping an acked batch.
    val st = staged.headOption.getOrElse(
      throw new java.io.IOException(s"append: staging $staging produced no visible file"))
    fs.mkdirs(target)
    // Publish + marker under the session's view read-lock: compaction
    // retires hot files only under the write side, so it cannot observe
    // the new file and delete it before the marker exists — the replay
    // check above is never caught between "file compacted away" and
    // "marker not yet written".
    withViewLock(container, session) {
      if (!fs.rename(st.getPath, dst))
        throw new java.io.IOException(s"append: rename ${st.getPath} -> $dst failed")
      idemTag.foreach { t =>
        val m = tagMarker(container, session, t)
        fs.mkdirs(m.getParent)
        fs.create(m, true).close()
      }
    }
    // Staging cleanup is best-effort: the batch is PUBLISHED (rename +
    // marker done), so an IOException here must not convert a durable
    // append into a "failed" one — the write-behind buffer would
    // re-buffer and retry under a fresh random tag, storing every row
    // twice (round-7 review). Orphaned staging dirs are swept at
    // construction.
    try fs.delete(staging, true)
    catch { case e: java.io.IOException =>
      System.err.println(s"[store] staging cleanup $staging failed (batch already published): ${e.getMessage}")
    }
    st.getLen
  }

  private def tierDf(dir: String): Option[DataFrame] =
    if (fs.exists(new Path(dir)))
      Some(spark.read.schema(LogSchema.schema)
        .option("basePath", dir).parquet(dir)
        .select(LogSchema.schema.fieldNames.map(col): _*))
    else None

  /** Unified view over both tiers (UNION ALL bag semantics, duplicates
    * preserved — reader.py:488-510). With container/session predicates
    * Catalyst prunes to the matching directories. */
  def read(): DataFrame = {
    val tiers = Seq(tierDf(coldDir), tierDf(hotDir)).flatten
    if (tiers.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], LogSchema.schema)
    else tiers.reduce(_ unionAll _)
  }

  def read(container: String, session: String): DataFrame =
    read().filter(col("container") === container && col("session") === session)

  /** Recursive parquet-file walk that is safe against concurrent writers:
    * hidden dirs (`_temporary`, `.`-prefixed) are skipped, lengths come
    * from the listing itself (no second stat call to race), and a subtree
    * that VANISHES mid-walk (an append commit cleaning `_temporary`, a
    * compaction retiring its snapshot) reads as absent. Only
    * FileNotFoundException is swallowed — any other listing failure (a
    * transient FS error, a permission problem) propagates, so a broken
    * filesystem reads as an error, not as an empty session (round-2
    * advice: a 200-with-zero-logs on an IO failure also silently
    * disabled size-based rotation). */
  private def walkFiles(dir: String): Seq[org.apache.hadoop.fs.FileStatus] =
    StoreFiles.walkParquet(fs, new Path(dir))

  private def listFiles(dir: String): Seq[Path] = walkFiles(dir).map(_.getPath)

  /** Per-tier file stats for summaries (SURVEY §2.4 A4-A6) — file counts
    * and bytes come from the file index, not a data scan. */
  def tierStats(container: String, session: String): (Long, Long, Long, Long) = {
    def stats(dir: String): (Long, Long) = {
      val files = walkFiles(s"$dir/container=$container/session=$session")
      (files.size.toLong, files.map(_.getLen).sum)
    }
    val (cf, cb) = stats(coldDir)
    val (hf, hb) = stats(hotDir)
    (cf, cb, hf, hb)
  }

  override def hotBytes(container: String, session: String): Long =
    tierStats(container, session)._4

  // One lock per (container, session): two concurrent compactions of the
  // same session would both claim the same snapshot files (the reference
  // holds a per-session lock for the same reason, writer.py:238).
  private val compactLocks = new java.util.concurrent.ConcurrentHashMap[(String, String), Object]()

  // Reader-visibility lock per session: compaction's PUBLISH phase (rename
  // staged files cold + retire the hot snapshot — pure file ops, no Spark
  // job) takes the write side; query materialization takes the read side.
  // Without it a scan that listed hot files just before they were retired
  // dies with FILE_NOT_EXIST mid-read (the reference has the same race and
  // silently returns partial data, reader.py:297-302 — we exclude it
  // instead; the heavy parquet rewrite stays outside the lock so readers
  // only ever wait for a few renames). On a multi-node deployment this
  // becomes a manifest/snapshot swap; the single-JVM lock is the local
  // stand-in for that atomic visibility flip.
  private val viewLocks = new java.util.concurrent.ConcurrentHashMap[(String, String), java.util.concurrent.locks.ReentrantReadWriteLock]()

  private def viewLock(container: String, session: String) =
    viewLocks.computeIfAbsent((container, session), _ => new java.util.concurrent.locks.ReentrantReadWriteLock)

  /** Run `f` (typically a DataFrame action) with compaction publishes for
    * this session excluded, so the file set it scans stays live. */
  def withViewLock[T](container: String, session: String)(f: => T): T = {
    val l = viewLock(container, session).readLock
    l.lock(); try f finally l.unlock()
  }

  /** [[LogTier]]'s snapshot guarantee is this store's view lock —
    * directory-as-truth needs reader exclusion during the publish
    * phase ([[ManifestLog]] gets the same guarantee lock-free). */
  override def withReadSnapshot[T](container: String, session: String)(f: => T): T =
    withViewLock(container, session)(f)

  /** Compact one session: rewrite the *current snapshot* of hot files
    * into sized cold files, then delete exactly that snapshot. Appends
    * that land mid-compaction stay in the hot tier untouched, so the
    * row multiset is preserved exactly once (fixes SURVEY §1.5).
    * Returns the byte size of the retired hot snapshot — callers doing
    * size accounting ([[graft.engine.Compactor]]) subtract exactly what
    * was compacted instead of zeroing a counter that concurrent appends
    * may have bumped mid-compaction. */
  def compact(container: String, session: String): Long =
    compactLocks.computeIfAbsent((container, session), _ => new Object).synchronized {
      compactLocked(container, session)
    }

  private def compactLocked(container: String, session: String): Long = {
    val snapshotStatus = walkFiles(s"$hotDir/container=$container/session=$session")
    if (snapshotStatus.isEmpty) return 0L
    val snapshot = snapshotStatus.map(_.getPath)
    val bytes = snapshotStatus.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val df = spark.read.schema(LogSchema.fileSchema)
      .parquet(snapshot.map(_.toString): _*)
    val staging = new Path(s"$root/.staging-${UUID.randomUUID()}")
    // Range-cluster by timestamp (not hash-repartition): each cold file
    // covers a tight, mostly non-overlapping time slice, so its parquet
    // footer min/max actually prunes — time-range reads skip whole files
    // and retentionSweep's file-level TTL retires files promptly instead
    // of being pinned by one straggler row. Same row multiset either way;
    // this is purely a layout choice, and at 100 TB layout IS the read
    // path (the reference gets this for free only because each buffer
    // flush is one contiguous ingest slice, writer.py:300-335).
    // (message as range tiebreak: a snapshot whose rows share one
    // timestamp must still split into nOut sized files)
    df.repartitionByRange(nOut, col("timestamp"), col("message"))
      .sortWithinPartitions(col("timestamp"))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)

    val target = new Path(s"$coldDir/container=$container/session=$session")
    fs.mkdirs(target)
    // PUBLISH phase, under the session's view write-lock (readers excluded
    // for the duration of a few renames only — the parquet rewrite above
    // ran lock-free). Rename every staged file before retiring any hot
    // input; a failed rename aborts with the hot snapshot intact (no loss,
    // worst case a re-compaction re-reads the same snapshot). Only after
    // all renames succeed do we delete the inputs — the crash window
    // between rename-all and delete-all leaves duplicates, never loss.
    val wl = viewLock(container, session).writeLock
    wl.lock()
    try {
      val staged = listFiles(staging.toString)
      // The rewrite of a non-empty snapshot always produces ≥1 file; an
      // empty listing means the listing failed — retiring the snapshot
      // against it would LOSE the session's hot data. Abort instead.
      if (staged.isEmpty)
        throw new java.io.IOException(
          s"compact: staging $staging lists no files for a non-empty snapshot; hot snapshot retained")
      staged.foreach { p =>
        val dst = new Path(target, s"compact-${UUID.randomUUID()}.parquet")
        if (!fs.rename(p, dst))
          throw new java.io.IOException(s"compact: rename $p -> $dst failed; hot snapshot retained")
      }
      fs.delete(staging, true)
      snapshot.foreach { p =>
        // Idempotency tags publish as <tag>.parquet (anything not the
        // plain append-<uuid> prefix): make sure the tag's durable marker
        // exists BEFORE the hot file disappears, so a replay after a
        // crash-between-publish-and-marker still skips (T6).
        val name = p.getName.stripSuffix(".parquet")
        if (!name.startsWith("append-")) {
          val m = tagMarker(container, session, name)
          fs.mkdirs(m.getParent)
          if (!fs.exists(m)) fs.create(m, true).close()
        }
        fs.delete(p, false)
      }
      bytes
    } finally wl.unlock()
  }

  /** PHYSICAL ROW-LEVEL PURGE — [[ManifestLog.rewriteExcluding]]'s
    * single-node mirror on the directory-as-truth store: rewrite every
    * file (either tier) holding rows that match `pred` with those rows
    * dropped, publish the replacements cold, and delete the affected
    * originals. `pred` ranges over the file columns (timestamp, level,
    * message); NULL keeps the row. Files with no matching row are
    * untouched (the affected set comes from one `input_file_name()`
    * pass). Unlike the manifest tier there is no version chain, so the
    * deletion is immediate and complete — no expire step needed; the
    * crash window between rename-all and delete-all leaves survivor
    * duplicates plus still-present matching rows (never loss), exactly
    * compaction's contract, and a re-run purges what remains. Retired
    * tagged files get their durable replay markers backfilled first,
    * so a redelivered ingest batch cannot re-append purged rows.
    * Returns rows purged. */
  def rewriteExcluding(container: String, session: String,
                       pred: org.apache.spark.sql.Column): Long =
    compactLocks.computeIfAbsent((container, session), _ => new Object).synchronized {
      val all = walkFiles(s"$hotDir/container=$container/session=$session") ++
        walkFiles(s"$coldDir/container=$container/session=$session")
      if (all.isEmpty) return 0L
      val hit = pred <=> lit(true) // null-safe: NULL keeps the row
      val affectedPaths = spark.read.schema(LogSchema.fileSchema)
        .parquet(all.map(_.getPath.toString): _*)
        .filter(hit).select(input_file_name().as("f")).distinct()
        .collect().map(r => new Path(r.getString(0)).toUri.getPath).toSet
      val snapshot = all.filter(st => affectedPaths.contains(st.getPath.toUri.getPath))
      if (snapshot.isEmpty) return 0L
      val bytes = snapshot.map(_.getLen).sum
      val aff = spark.read.schema(LogSchema.fileSchema)
        .parquet(snapshot.map(_.getPath.toString): _*)
      val purged = aff.filter(hit).count()
      val survivors = aff.filter(!hit)
      val nSurv = survivors.count()
      val staging = new Path(s"$root/.staging-${UUID.randomUUID()}")
      if (nSurv > 0) {
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
        survivors.repartitionByRange(nOut, col("timestamp"), col("message"))
          .sortWithinPartitions(col("timestamp"))
          .write.mode(SaveMode.Overwrite).parquet(staging.toString)
      }
      val target = new Path(s"$coldDir/container=$container/session=$session")
      fs.mkdirs(target)
      // PUBLISH + RETIRE under the view write-lock, like compact: the
      // heavy rewrite above ran lock-free; readers only wait for the
      // renames and deletes
      val wl = viewLock(container, session).writeLock
      wl.lock()
      try {
        if (nSurv > 0) {
          val staged = listFiles(staging.toString)
          if (staged.isEmpty)
            throw new java.io.IOException(
              s"purge: staging $staging lists no files for $nSurv surviving rows; snapshot retained")
          staged.foreach { p =>
            val dst = new Path(target, s"purge-${UUID.randomUUID()}.parquet")
            if (!fs.rename(p, dst))
              throw new java.io.IOException(s"purge: rename $p -> $dst failed; snapshot retained")
          }
          fs.delete(staging, true)
        }
        snapshot.foreach { st =>
          val name = st.getPath.getName.stripSuffix(".parquet")
          if (!name.startsWith("append-") && !name.startsWith("compact-") &&
              !name.startsWith("purge-")) {
            val m = tagMarker(container, session, name)
            fs.mkdirs(m.getParent)
            if (!fs.exists(m)) fs.create(m, true).close()
          }
          fs.delete(st.getPath, false)
        }
        // drop memoized derived relations over this root — the purge
        // mutated the store under them (see ManifestLog.rewriteExcluding)
        graft.ops.Tables.invalidateDir(root)
        purged
      } finally wl.unlock()
    }

  /** Retention sweep: delete cold files whose entire contents predate
    * `cutoff`, decided from each file's parquet FOOTER max-timestamp
    * statistic — file-level TTL with no data scan, the same min/max
    * stats the reference's writer emits for pruning (writer.py:314-315).
    * Requires INT64 timestamp output (`spark.sql.parquet.
    * outputTimestampType=TIMESTAMP_MICROS`, set by the server session) —
    * INT96 files carry no usable stats and are conservatively KEPT.
    * A file with any row at/after the cutoff is kept whole (file-level
    * granularity; compaction will naturally age it out later). Deletes
    * run under the session's view write-lock so concurrent readers never
    * lose a listed file. Returns the number of files deleted. */
  def retentionSweep(container: String, session: String, cutoff: java.time.Instant): Long = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val files = walkFiles(s"$coldDir/container=$container/session=$session")
    val cutoffMicros = cutoff.getEpochSecond * 1000000L + cutoff.getNano / 1000L
    val expired = files.filter { st =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromStatus(st, spark.sparkContext.hadoopConfiguration))
      try {
        val blocks = reader.getFooter.getBlocks
        // every row group's timestamp max must be below the cutoff
        var allBelow = blocks.size() > 0
        var i = 0
        while (allBelow && i < blocks.size()) {
          // look the chunk up by column path, not position
          val tsChunk = blocks.get(i).getColumns.asScala
            .find(_.getPath.toDotString == "timestamp").orNull
          val stats = if (tsChunk == null) null else tsChunk.getStatistics
          allBelow = stats != null && stats.hasNonNullValue &&
            (stats.genericGetMax match {
              case l: java.lang.Long => l < cutoffMicros
              case _ => false // INT96 or unexpected physical type → keep
            })
          i += 1
        }
        allBelow
      } finally reader.close()
    }
    if (expired.isEmpty) 0L
    else {
      val wl = viewLock(container, session).writeLock
      wl.lock()
      try { expired.foreach(st => fs.delete(st.getPath, false)); expired.size.toLong }
      finally wl.unlock()
    }
  }

  /** Prune idempotency markers older than `olderThan` (file mtime).
    * Markers accumulate one tiny file per streamed micro-batch; once the
    * stream's checkpoint has advanced past a batch, that batch can never
    * replay, so its marker is dead weight. Safe retention horizon =
    * anything comfortably beyond the checkpoint's replay window (hours),
    * swept on the same cadence as [[retentionSweep]]. Returns the number
    * of markers deleted. */
  def tagSweep(container: String, session: String, olderThan: java.time.Instant): Long = {
    val dir = new Path(s"$root/tags/container=$container/session=$session")
    if (!fs.exists(dir)) return 0L
    val cutoff = olderThan.toEpochMilli
    // Destructive marker retirement runs under the session view WRITE
    // lock, like compaction's retire phase: marker WRITES hold the read
    // side, so without exclusion a sweep with an aggressive horizon can
    // delete a marker file mid-creation (observed as a Hadoop
    // create→chmod race crashing the append that had already published).
    val wl = viewLock(container, session).writeLock
    wl.lock()
    try {
      val dead = fs.listStatus(dir).filter(st => st.isFile && st.getModificationTime < cutoff)
      dead.foreach(st => fs.delete(st.getPath, false))
      dead.length.toLong
    } finally wl.unlock()
  }

  /** Youngest cold archive of a session (A8: the reference's
    * `ORDER BY created_at DESC LIMIT 1` over its SQLite catalog,
    * metadata.py:55-66) — served from the file index's modification
    * times, no manifest table needed. */
  def youngestArchive(container: String, session: String): Option[(String, Long, Long)] =
    walkFiles(s"$coldDir/container=$container/session=$session")
      .sortBy(st => (-st.getModificationTime, st.getPath.getName))
      .headOption
      .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))

  /** Containers/sessions present in storage (directory listing — the
    * moral equivalent of the reference's SQLite catalog scan). */
  def sessions(): Seq[(String, String)] = {
    def list(dir: String): Seq[(String, String)] = {
      val base = new Path(dir)
      if (!fs.exists(base)) Seq.empty
      else for {
        c <- fs.listStatus(base).toSeq if c.isDirectory && c.getPath.getName.startsWith("container=")
        s <- fs.listStatus(c.getPath).toSeq if s.isDirectory && s.getPath.getName.startsWith("session=")
      } yield (c.getPath.getName.stripPrefix("container="), s.getPath.getName.stripPrefix("session="))
    }
    (list(coldDir) ++ list(hotDir)).distinct.sorted
  }
}

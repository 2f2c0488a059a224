package graft.ingest

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row

/** Per-session write-behind buffer for the HTTP ingest path — the Spark
  * counterpart of the reference's in-memory IPC buffer batching
  * (writer.py:233-259): a POST acks 201 once its rows are accepted into
  * the session buffer, and one storage append covers MANY posts. The
  * reference's own ack contract is "201 = buffered, not archived"
  * (main.py:330-337) with the buffer living in process memory until a
  * size-triggered flush, so acked-but-unflushed rows lost to a hard
  * crash are the same durability window the reference has — bounded
  * here by a per-session byte threshold, a GLOBAL byte bound across all
  * sessions, and a periodic timer, and closed entirely on graceful
  * shutdown ([[close]] drains everything or throws).
  *
  * Why it exists: a Spark parquet append is a (small) distributed job
  * with ~tens of ms of fixed dispatch cost. Paying it once per 40-row
  * POST caps the service path at ~20 appends/s regardless of cluster
  * size; paying it once per flushed BATCH amortizes the dispatch over
  * hundreds of posts, which is exactly how the reference reaches its
  * throughput (one Arrow IPC write per 10 MiB of buffered rows).
  *
  * Memory bound: `flushBytes` caps ONE session, but N hot sessions
  * would otherwise hold ~N·flushBytes on the gateway heap between timer
  * ticks. `globalFlushBytes` is the whole-process cap: when total
  * buffered bytes cross it, the ADDING thread synchronously flushes the
  * LARGEST sessions until the total is back under — hot sessions
  * backpressure themselves, cold sessions keep batching. On a cluster
  * this is the per-gateway admission bound.
  *
  * Read-your-writes is preserved by the server calling [[flush]] before
  * every read of the same session: a completed `flush(c, s)` is
  * guaranteed to cover every row whose `add(c, s, ...)` returned before
  * the flush began (the per-session flush mutex serializes flushes, and
  * the snapshot is taken under the buffer lock adds also hold).
  *
  * Failure semantics, per path:
  *  - [[add]]: a size-triggered flush that FAILS is swallowed (stderr
  *    only) and the POST still acks — the rows are safely buffered and
  *    the timer retries; surfacing a 500 for already-accepted rows
  *    would make the client retry and duplicate acked data.
  *  - [[flush]] (the explicit read-path barrier): failures re-buffer
  *    the snapshot at the FRONT of the queue and RETHROW — here the
  *    error signals a real visibility failure the reader must see.
  *  - [[close]]: drains with bounded retries and THROWS if any session
  *    still holds acked rows, so a caller can never report a clean
  *    shutdown that silently dropped data (the T5 contract).
  */
final class IngestBuffer(flushBytes: Long = 4L * 1024 * 1024,
                         flushIntervalMs: Long = 100,
                         globalFlushBytes: Long = 64L * 1024 * 1024,
                         idleFlushMs: Long = 25)
                        (flushFn: (String, String, Seq[Row]) => Unit)
    extends AutoCloseable {

  private final class Buf {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var bytes = 0L
    var lastAddNanos = System.nanoTime()
  }

  private val bufs = new ConcurrentHashMap[(String, String), Buf]()
  // Flush mutex per session, separate from the buffer lock: the storage
  // append runs OUTSIDE the buffer lock (posters keep buffering while a
  // flush writes), but two flushes of one session never interleave.
  private val flushLocks = new ConcurrentHashMap[(String, String), Object]()
  // Total buffered bytes across every session — the globalFlushBytes
  // admission counter. Updated under each Buf's lock (add, snapshot,
  // failure restore), so it tracks the sum of buf.bytes exactly.
  private val totalBytes = new AtomicLong(0L)

  /** Rough in-memory size of one row — only drives the flush threshold,
    * so a constant per-row overhead estimate is fine. */
  private def rowBytes(r: Row): Long =
    24L + String.valueOf(r.get(1)).length + String.valueOf(r.get(2)).length

  /** Accept `rows` for (container, session). Returns after the rows are
    * buffered (the ack point); triggers a synchronous flush when this
    * session crosses its byte threshold (so a hot session backpressures
    * its own writers) or when the PROCESS crosses the global bound (so
    * many warm sessions can't stack unbounded heap between timer
    * ticks). Flush failures here are swallowed — see class doc. */
  def add(container: String, session: String, rows: Seq[Row]): Unit = {
    // Rejecting after close() is part of the T5 contract: without it a
    // POST handler racing shutdown could buffer + ack AFTER the final
    // drain cleared the maps (the timer is already stopped, so nothing
    // would ever flush those rows) — a clean-looking shutdown that
    // silently dropped acked data (round-7 review).
    if (closed) throw new IllegalStateException("ingest buffer is closed")
    val buf = bufs.computeIfAbsent((container, session), _ => new Buf)
    val over = buf.synchronized {
      // RE-check under the buffer lock (round-8, closing the round-7
      // advice window): close() sets the flag and then drains each
      // buffer under this same lock, so an insert that raced past the
      // unsynchronized check above either lands before the drain's
      // snapshot (flushed) or observes closed=true here (rejected) —
      // it can never slip in after the final drain.
      if (closed) throw new IllegalStateException("ingest buffer is closed")
      buf.rows ++= rows
      buf.lastAddNanos = System.nanoTime()
      val b = rows.iterator.map(rowBytes).sum
      buf.bytes += b
      totalBytes.addAndGet(b)
      buf.bytes >= flushBytes
    }
    if (over) quietFlush(container, session)
    if (totalBytes.get() >= globalFlushBytes) flushLargestUntilUnder()
  }

  private def quietFlush(container: String, session: String): Unit =
    try flush(container, session)
    catch { case scala.util.control.NonFatal(e) =>
      // rows remain buffered (front of queue) and the timer retries —
      // the POST that triggered this flush still acks. FATAL errors
      // (OOM, stack overflow) propagate: swallowing one would keep a
      // broken JVM acking 201s, maximizing the loss when it dies.
      System.err.println(s"[ingest] size-triggered flush $container/$session " +
        s"failed (buffered, timer will retry): ${e.getMessage}")
    }

  /** Drive total buffered bytes back under the global bound by flushing
    * the largest sessions first (most bytes recovered per storage
    * dispatch). Stops when under the bound, when nothing is left to
    * flush, or when every remaining candidate's flush failed (storage
    * down — rows stay buffered; the timer owns the retry). */
  private def flushLargestUntilUnder(): Unit = {
    val tried = scala.collection.mutable.Set.empty[(String, String)]
    var continue = true
    while (totalBytes.get() >= globalFlushBytes && continue) {
      val largest = bufs.entrySet().asScala
        .filter(e => !tried.contains(e.getKey))
        .maxByOption(e => e.getValue.synchronized(e.getValue.bytes))
      largest match {
        case Some(e) =>
          tried += e.getKey
          quietFlush(e.getKey._1, e.getKey._2)
        case None => continue = false // every session tried once — timer owns retries
      }
    }
  }

  /** Synchronously write this session's buffered rows via `flushFn`.
    * No-op when empty. On failure the snapshot is restored ahead of any
    * rows buffered during the attempt, and the error propagates. */
  def flush(container: String, session: String): Unit = {
    val buf = bufs.get((container, session))
    if (buf == null) return
    flushLocks.computeIfAbsent((container, session), _ => new Object).synchronized {
      val snapshot = buf.synchronized {
        if (buf.rows.isEmpty) Vector.empty[Row]
        else {
          val r = buf.rows.toVector
          buf.rows.clear(); totalBytes.addAndGet(-buf.bytes); buf.bytes = 0L
          r
        }
      }
      if (snapshot.nonEmpty) {
        try flushFn(container, session, snapshot)
        catch {
          case e: Throwable =>
            buf.synchronized {
              buf.rows.prependAll(snapshot)
              val b = snapshot.iterator.map(rowBytes).sum
              buf.bytes += b
              totalBytes.addAndGet(b)
            }
            throw e
        }
      }
      // reaching here — a successful flush OR an already-empty buffer —
      // proves the session is drained, so clear any idle-backoff
      // marker. Clearing on the EMPTY case too closes a race (third
      // review pass): a failing idle flush's marker-put can land after
      // a concurrent timer flush drained its re-buffered rows; the
      // timer's flushAll revisits every buffered session each tick and
      // lands here with an empty snapshot, so such a raced-in marker
      // lives at most one tick, never until close().
      idleFailedAt.remove((container, session))
    }
  }

  /** Flush every session with buffered rows (timer tick / shutdown).
    * Per-session failures are contained so one sick session can't
    * starve the rest of the tick. */
  def flushAll(): Unit =
    bufs.keys.asScala.toSeq.foreach { case (c, s) => quietFlush(c, s) }

  /** Total bytes currently buffered across all sessions (test hook /
    * metrics surface for the gateway's admission bound). */
  def bufferedBytes: Long = totalBytes.get()

  /** IDLE-TRIGGERED early flush (round-12 verdict #5): flush sessions
    * that have gone quiet for `idleFlushMs`, AHEAD of their first GET.
    * The read path's p99 was the read-your-writes flush on first-touch
    * reads — a GET landing inside the `flushIntervalMs` window pays
    * the session's whole remaining buffer synchronously. A session
    * still posting is never idle, so hot-session batching (and with it
    * ingest throughput) is untouched; a session that just went quiet
    * drains on the sweeper's dime instead of the first reader's. The
    * cost is one cheap lock-and-check per buffered session per sweep
    * plus the flushes themselves, which the 100 ms timer would have
    * paid anyway — just later, and on the read path.
    *
    * Idle flushes dispatch CONCURRENTLY on a small pool (at most one
    * in flight per session — the set guard): when a whole fleet of
    * writers goes quiet at once (end of an ingest wave, exactly the
    * measured first-touch shape), a sequential sweep would drain N
    * sessions at one storage-append latency EACH, and first readers
    * keep blocking on the per-session flush mutex for the whole
    * convoy; overlapping the appends bounds the drain at ~one append
    * latency total. What this does and does not buy is MEASURED
    * (SURVEY §17): a reader arriving ≥ idle horizon + append latency
    * after the session quiesced now pays ZERO flush (spec-pinned —
    * pre-change it raced the 100 ms timer); a reader arriving INSIDE
    * that window still pays the append, because read-your-writes
    * means someone must, and that residual IS the bench's p99 term
    * (its settled-read phase starts within ms of quiesce). */
  private def flushIdle(): Unit = {
    val now = System.nanoTime()
    val horizon = now - idleFlushMs * 1000000L
    // a session whose LAST idle flush failed backs off to the periodic
    // timer's cadence (review-caught): quietFlush re-buffers on
    // failure without touching lastAddNanos, so without this guard a
    // storage outage would have the sweeper re-dispatching (and
    // error-logging) every quiet session's doomed flush at the 25 ms
    // cadence — 4× the retry pressure of the 100 ms timer, against a
    // backend that is already struggling
    val retryHorizon = now - flushIntervalMs * 1000000L
    bufs.entrySet().asScala.foreach { e =>
      val key = e.getKey
      val idle = e.getValue.synchronized(
        e.getValue.rows.nonEmpty && e.getValue.lastAddNanos < horizon)
      val backedOff = {
        val f = idleFailedAt.get(key)
        f != null && f.longValue > retryHorizon
      }
      if (idle && !backedOff && idleInFlight.add(key))
        try idlePool.execute { () =>
          // success clears the backoff marker inside flush() itself
          try flush(key._1, key._2)
          catch {
            case scala.util.control.NonFatal(e2) =>
              idleFailedAt.put(key, System.nanoTime())
              System.err.println(s"[ingest] idle flush ${key._1}/${key._2} " +
                s"failed (buffered, backing off to timer cadence): ${e2.getMessage}")
          } finally idleInFlight.remove(key)
        } catch {
          // pool shut down by close() while this sweep was mid-iteration
          // (the only rejection path of an unbounded-queue fixed pool):
          // the task never ran, so ITS key cleanup never ran — release
          // the in-flight claim here, and don't let the rejection abort
          // the scheduled sweep task (round-12 advice: the leaked key
          // would pin the session out of idle flushing forever if the
          // sweeper were ever reused past a close/reopen cycle)
          case _: java.util.concurrent.RejectedExecutionException =>
            idleInFlight.remove(key)
        }
    }
  }

  private val idleInFlight = ConcurrentHashMap.newKeySet[(String, String)]()
  private val idleFailedAt = new ConcurrentHashMap[(String, String), java.lang.Long]()
  private val idlePool = Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "graft-ingest-idle"); t.setDaemon(true); t
  })

  private val timer = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-ingest-flush"); t.setDaemon(true); t
  })
  timer.scheduleWithFixedDelay(() => flushAll(),
    flushIntervalMs, flushIntervalMs, TimeUnit.MILLISECONDS)
  timer.scheduleWithFixedDelay(() => flushIdle(),
    idleFlushMs, idleFlushMs, TimeUnit.MILLISECONDS)

  /** Stop the timer, then drain everything — after close() returns
    * normally, every acked row is durable (the T5 graceful-shutdown
    * contract). Transient storage errors get bounded retries; if rows
    * REMAIN buffered after the last attempt, close() throws with the
    * stranded sessions so no caller can mistake a lossy shutdown for a
    * clean one. On a full drain the session maps are cleared, so a
    * long-lived process cycling many sessions doesn't accumulate empty
    * Buf/lock entries. */
  @volatile private var closed = false

  override def close(): Unit = {
    closed = true // new add()s reject from here; buffered rows drain below
    timer.shutdown()
    idlePool.shutdown() // queued idle flushes still run; the lock barrier below waits them out
    try {
      timer.awaitTermination(30, TimeUnit.SECONDS)
      idlePool.awaitTermination(30, TimeUnit.SECONDS)
    }
    catch { case _: InterruptedException => Thread.currentThread.interrupt() }
    var attempt = 0
    while (totalBytes.get() > 0 && attempt < 3) {
      if (attempt > 0) Thread.sleep(200L << attempt)
      flushAll()
      attempt += 1
    }
    // BARRIER against in-flight flushes: a size-triggered flush that
    // started before `closed` was set can still be INSIDE flushFn with
    // its snapshot in hand — invisible to both the byte counter and the
    // buffers, so the loop above may have seen nothing to drain. Taking
    // each session's flush mutex once waits those flushes out: success
    // landed the rows durably; failure restored them to the buffer
    // where the re-check below sees (and re-drains) them. add() rejects
    // after `closed`, so no NEW flush can start behind this barrier.
    flushLocks.values().asScala.foreach(l => l.synchronized(()))
    def strandedNow() = bufs.entrySet().asScala
      .filter(e => e.getValue.synchronized(e.getValue.rows.nonEmpty))
    // an add() that read closed=false just before the flag was set can
    // land after the byte-counter read above skipped the drain loop —
    // its rows are acked and buffered, so drain them (once) instead of
    // reporting a spurious stranding
    if (strandedNow().nonEmpty) flushAll()
    val stranded = strandedNow()
      .map { e => s"${e.getKey._1}/${e.getKey._2}(${e.getValue.bytes}B)" }
    if (stranded.nonEmpty)
      throw new IllegalStateException(
        s"ingest close(): acked rows still buffered after retries — ${stranded.mkString(", ")}")
    bufs.clear(); flushLocks.clear(); idleFailedAt.clear()
  }
}

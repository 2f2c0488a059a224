package graft.engine

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import graft.storage.LogStore

/** Storage lifecycle driver — the reference's rotation + async-flush
  * machinery (writer.py:233-335) re-expressed for the two-tier Parquet
  * store:
  *
  *  - T2 size-based rotation: after an append, when a session's hot tier
  *    reaches `thresholdBytes` (reference: 10 MiB, main.py:28) the
  *    session is queued for compaction;
  *  - T3 async flush: compaction runs on a bounded background pool, so
  *    the append ack never waits for archival (ack = durable in hot,
  *    main.py:330-337);
  *  - T5 graceful shutdown: `close()` drains the queue and synchronously
  *    compacts every remaining hot session (main.py:350-365).
  *
  * Exactly-once is the store's job (snapshot compaction, LogStore), so a
  * duplicate trigger is merely a no-op compaction of an empty hot dir.
  * At cluster scale each compaction is a distributed Spark job; the pool
  * here only bounds how many such jobs are in flight at once.
  */
final class Compactor(store: LogStore,
                      thresholdBytes: Long = 10L * 1024 * 1024,
                      workers: Int = math.max(1, Runtime.getRuntime.availableProcessors / 4))
    extends AutoCloseable {

  private val pool = Executors.newFixedThreadPool(workers, r => {
    val t = new Thread(r, "graft-compactor"); t.setDaemon(true); t
  })
  // Sessions queued-or-running: collapses repeated triggers into one run.
  private val inFlight = ConcurrentHashMap.newKeySet[(String, String)]()
  // In-memory hot-bytes accounting per session (writer.py:246-249): the
  // trigger check is a counter read, not a directory walk per append.
  // Seeded EAGERLY at construction for every session already on disk
  // (covers restarts with pre-existing hot data); sessions born after
  // construction start at 0 and accumulate purely from append sizes —
  // no lazy-seed race that could double-count a concurrent first append.
  private val hotCounters = new ConcurrentHashMap[(String, String), java.util.concurrent.atomic.AtomicLong]()
  store.sessions().foreach { case (c, s) =>
    val hot = store.hotBytes(c, s)
    if (hot > 0) hotCounters.put((c, s), new java.util.concurrent.atomic.AtomicLong(hot))
  }
  @volatile private var closed = false

  /** Record an append's published byte count (LogStore.append's return)
    * and queue compaction when the accumulated hot size crosses the
    * rotation threshold (writer.py:252-259 semantics). */
  def noteAppend(container: String, session: String, bytes: Long): Unit = {
    if (closed || bytes <= 0) return
    val cnt = hotCounters.computeIfAbsent((container, session),
      _ => new java.util.concurrent.atomic.AtomicLong(0L))
    if (cnt.addAndGet(bytes) >= thresholdBytes) trigger(container, session, cnt)
  }

  /** Listing-based trigger check — for callers without byte accounting.
    * The refresh only ever RAISES the counter (CAS from the observed
    * value, and only when the listing is larger): the counter's failure
    * mode is undercounting (seed gaps, missed noteAppend), which delays
    * rotation — that is what the listing corrects. Lowering it here
    * could combine with a concurrent trigger's retired-bytes subtraction
    * into a double-subtract that erases live mid-compaction appends
    * (listing taken after the snapshot delete, subtraction applied after
    * the refresh); over-counting, by contrast, costs at most one no-op
    * compaction. */
  def maybeCompact(container: String, session: String): Unit =
    if (!closed) {
      val cnt = hotCounters.computeIfAbsent((container, session),
        _ => new java.util.concurrent.atomic.AtomicLong(0L))
      val observed = cnt.get
      val actual = store.hotBytes(container, session)
      if (actual > observed) cnt.compareAndSet(observed, actual)
      if (cnt.get >= thresholdBytes) trigger(container, session, cnt)
    }

  private def trigger(container: String, session: String,
                      cnt: java.util.concurrent.atomic.AtomicLong): Unit =
    if (inFlight.add((container, session))) {
      pool.submit(new Runnable {
        def run(): Unit =
          // Subtract exactly the bytes the compaction retired (its hot
          // snapshot), never `set(0)`: appends landing mid-compaction
          // stay counted and re-trigger naturally once this run's
          // inFlight slot frees.
          try {
            val retired = store.compact(container, session)
            cnt.updateAndGet(v => math.max(0L, v - retired))
          } catch { case e: Exception =>
            System.err.println(s"[compactor] $container/$session failed: ${e.getMessage}")
          } finally inFlight.remove((container, session))
      })
    }

  /** Synchronously compact every session with hot data (shutdown flush). */
  def flushAll(): Unit =
    store.sessions().foreach { case (c, s) =>
      if (store.hotBytes(c, s) > 0) store.compact(c, s)
    }

  private var maintenance: Option[java.util.concurrent.ScheduledExecutorService] = None

  /** Background maintenance loop — the operational completeness around
    * rotation: every `period`, each known session gets a listing-based
    * rotation check ([[maybeCompact]], catching sessions whose appends
    * bypassed byte accounting), an idempotency-marker sweep past the
    * streaming replay horizon ([[graft.storage.LogStore.tagSweep]]), and,
    * when `retention` is set, a footer-stats file-level TTL sweep
    * ([[graft.storage.LogStore.retentionSweep]]). One scheduler thread;
    * each tick's work is driver-cheap (listings) plus at most the
    * compactions it queues on the bounded pool. Idempotent to call once;
    * stopped by [[close]]. */
  def startMaintenance(period: java.time.Duration,
                       retention: Option[java.time.Duration] = None,
                       tagHorizon: java.time.Duration = java.time.Duration.ofHours(24)): Unit =
    synchronized {
      if (closed || maintenance.isDefined) return
      val sched = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-maintenance"); t.setDaemon(true); t
      })
      sched.scheduleWithFixedDelay(new Runnable {
        def run(): Unit =
          try {
            val now = java.time.Instant.now()
            store.sessions().foreach { case (c, s) =>
              maybeCompact(c, s)
              store.tagSweep(c, s, now.minus(tagHorizon))
              retention.foreach(r => store.retentionSweep(c, s, now.minus(r)))
            }
          } catch { case e: Exception =>
            System.err.println(s"[compactor] maintenance tick failed: ${e.getMessage}")
          }
      }, period.toMillis, period.toMillis, TimeUnit.MILLISECONDS)
      maintenance = Some(sched)
    }

  /** Drain pending work, then final flush (reference cleanup_handler). */
  override def close(): Unit = {
    closed = true
    synchronized { maintenance.foreach(_.shutdownNow()); maintenance = None }
    pool.shutdown()
    pool.awaitTermination(60, TimeUnit.SECONDS)
    flushAll()
  }
}

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
  @volatile private var closed = false

  /** Call after every append: queue compaction when the hot tier crossed
    * the rotation threshold (writer.py:252-259 semantics). */
  def maybeCompact(container: String, session: String): Unit = {
    if (!closed && store.hotBytes(container, session) >= thresholdBytes &&
        inFlight.add((container, session))) {
      pool.submit(new Runnable {
        def run(): Unit =
          try store.compact(container, session)
          catch { case e: Exception =>
            System.err.println(s"[compactor] $container/$session failed: ${e.getMessage}")
          } finally inFlight.remove((container, session))
      })
    }
  }

  /** Synchronously compact every session with hot data (shutdown flush). */
  def flushAll(): Unit =
    store.sessions().foreach { case (c, s) =>
      if (store.hotBytes(c, s) > 0) store.compact(c, s)
    }

  /** Drain pending work, then final flush (reference cleanup_handler). */
  override def close(): Unit = {
    closed = true
    pool.shutdown()
    pool.awaitTermination(60, TimeUnit.SECONDS)
    flushAll()
  }
}

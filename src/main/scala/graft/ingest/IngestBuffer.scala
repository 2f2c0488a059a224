package graft.ingest

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
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
  * here by BOTH a byte threshold and a periodic timer, and closed
  * entirely on graceful shutdown ([[close]] flushes everything).
  *
  * Why it exists: a Spark parquet append is a (small) distributed job
  * with ~tens of ms of fixed dispatch cost. Paying it once per 40-row
  * POST caps the service path at ~20 appends/s regardless of cluster
  * size; paying it once per flushed BATCH amortizes the dispatch over
  * hundreds of posts, which is exactly how the reference reaches its
  * throughput (one Arrow IPC write per 10 MiB of buffered rows).
  *
  * Read-your-writes is preserved by the server calling [[flush]] before
  * every read of the same session: a completed `flush(c, s)` is
  * guaranteed to cover every row whose `add(c, s, ...)` returned before
  * the flush began (the per-session flush mutex serializes flushes, and
  * the snapshot is taken under the buffer lock adds also hold).
  *
  * `flushFn` failures re-buffer the snapshot at the FRONT of the queue
  * and rethrow, so a transient storage error delays rows instead of
  * dropping acked data.
  */
final class IngestBuffer(flushBytes: Long = 4L * 1024 * 1024,
                         flushIntervalMs: Long = 100)
                        (flushFn: (String, String, Seq[Row]) => Unit)
    extends AutoCloseable {

  private final class Buf {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var bytes = 0L
  }

  private val bufs = new ConcurrentHashMap[(String, String), Buf]()
  // Flush mutex per session, separate from the buffer lock: the storage
  // append runs OUTSIDE the buffer lock (posters keep buffering while a
  // flush writes), but two flushes of one session never interleave.
  private val flushLocks = new ConcurrentHashMap[(String, String), Object]()

  /** Rough in-memory size of one row — only drives the flush threshold,
    * so a constant per-row overhead estimate is fine. */
  private def rowBytes(r: Row): Long =
    24L + String.valueOf(r.get(1)).length + String.valueOf(r.get(2)).length

  /** Accept `rows` for (container, session). Returns after the rows are
    * buffered (the ack point); triggers a synchronous flush when the
    * buffer crosses the byte threshold, so a hot session backpressures
    * its own writers instead of growing without bound. */
  def add(container: String, session: String, rows: Seq[Row]): Unit = {
    val buf = bufs.computeIfAbsent((container, session), _ => new Buf)
    val over = buf.synchronized {
      buf.rows ++= rows
      buf.bytes += rows.iterator.map(rowBytes).sum
      buf.bytes >= flushBytes
    }
    if (over) flush(container, session)
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
        else { val r = buf.rows.toVector; buf.rows.clear(); buf.bytes = 0L; r }
      }
      if (snapshot.nonEmpty) {
        try flushFn(container, session, snapshot)
        catch {
          case e: Throwable =>
            buf.synchronized {
              buf.rows.prependAll(snapshot)
              buf.bytes += snapshot.iterator.map(rowBytes).sum
            }
            throw e
        }
      }
    }
  }

  /** Flush every session with buffered rows (timer tick / shutdown). */
  def flushAll(): Unit =
    bufs.keys.asScala.toSeq.foreach { case (c, s) =>
      try flush(c, s)
      catch { case e: Throwable =>
        System.err.println(s"[ingest] background flush $c/$s failed: ${e.getMessage}")
      }
    }

  private val timer = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-ingest-flush"); t.setDaemon(true); t
  })
  timer.scheduleWithFixedDelay(() => flushAll(),
    flushIntervalMs, flushIntervalMs, TimeUnit.MILLISECONDS)

  /** Stop the timer, then flush everything — after close() returns, all
    * acked rows are durable (the T5 graceful-shutdown contract). */
  override def close(): Unit = {
    timer.shutdown()
    try timer.awaitTermination(30, TimeUnit.SECONDS)
    catch { case _: InterruptedException => Thread.currentThread.interrupt() }
    flushAll()
  }
}

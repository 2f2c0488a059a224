package graft.engine

import java.sql.Timestamp
import java.time.Instant
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import graft.SparkSuite
import graft.model.LogSchema
import graft.storage.LogStore

class CompactorSpec extends SparkSuite {

  private def append(store: LogStore, n: Int, c: String = "c", s: String = "s"): Unit =
    store.append(spark.createDataFrame(
      (1 to n).map(i => Row(Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")), "INFO", s"row$i")).asJava,
      LogSchema.fileSchema), c, s)

  test("size-triggered rotation: hot drains to cold once the threshold is crossed, counts identical") {
    val store = new LogStore(spark, tempDir("compactor"))
    val compactor = new Compactor(store, thresholdBytes = 1) // any append triggers
    try {
      append(store, 10)
      compactor.maybeCompact("c", "s")
      // async: wait for the background compaction to land. Deadline is
      // deliberately huge — suites share one SparkSession and this job
      // can be starved behind other suites' FIFO-queued jobs (observed
      // as a full-suite-only flake); the common case exits in seconds.
      val deadline = System.currentTimeMillis + 240000
      while (store.hotBytes("c", "s") > 0 && System.currentTimeMillis < deadline) Thread.sleep(100)
      val (coldFiles, _, hotFiles, _) = store.tierStats("c", "s")
      assert(coldFiles > 0 && hotFiles === 0, "hot tier should have drained to cold")
      assert(store.read("c", "s").count() === 10)
    } finally compactor.close()
  }

  test("below threshold: no compaction queued") {
    val store = new LogStore(spark, tempDir("compactor"))
    val compactor = new Compactor(store, thresholdBytes = Long.MaxValue)
    try {
      append(store, 3)
      compactor.maybeCompact("c", "s")
      Thread.sleep(300)
      val (coldFiles, _, hotFiles, _) = store.tierStats("c", "s")
      assert(coldFiles === 0 && hotFiles === 1)
    } finally compactor.close()
  }

  test("noteAppend: counter-based rotation triggers only once the accumulated bytes cross the threshold") {
    // probe: measure the size of one batch file, then start clean
    val probeStore = new LogStore(spark, tempDir("compactor-probe"))
    val oneBatch = probeStore.append(spark.createDataFrame(
      (1 to 3).map(i => Row(Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")), "INFO", s"row$i")).asJava,
      LogSchema.fileSchema), "c", "s")
    assert(oneBatch > 0)

    val store = new LogStore(spark, tempDir("compactor"))
    // threshold just above one batch: the first noteAppend must NOT
    // trigger, the second (accumulated) must
    val compactor = new Compactor(store, thresholdBytes = oneBatch + 1)
    try {
      def appendBatch(): Long = store.append(spark.createDataFrame(
        (1 to 3).map(i => Row(Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")), "INFO", s"row$i")).asJava,
        LogSchema.fileSchema), "c", "s")
      compactor.noteAppend("c", "s", appendBatch())
      Thread.sleep(300)
      assert(store.tierStats("c", "s")._1 === 0, "compacted below threshold")
      compactor.noteAppend("c", "s", appendBatch())
      val deadline = System.currentTimeMillis + 240000 // see rotation test
      while (store.hotBytes("c", "s") > 0 && System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(store.hotBytes("c", "s") === 0, "accumulated bytes should have triggered rotation")
      assert(store.read("c", "s").count() === 6)
    } finally compactor.close()
  }

  test("maintenance loop over a ManifestLog: rotation + opt-in snapshot GC collect retired files") {
    val root = tempDir("maint-ml")
    val store = new graft.storage.ManifestLog(spark, root)
    val compactor = new Compactor(store, thresholdBytes = 1)
    try {
      val b = spark.createDataFrame(
        Seq(Row(Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")), "INFO", "x"),
            Row(Timestamp.from(Instant.parse("2024-01-01T00:01:00Z")), "INFO", "y")).asJava,
        LogSchema.fileSchema)
      store.append(b, "c", "s")
      store.append(b, "c", "s")
      // small-but-nonzero grace: zero would race compaction's
      // publish window (a renamed-but-unswapped cold file matches
      // expire's never-visible rule the instant it lands), aborting
      // and retrying the compaction — 2 s dwarfs the ms-scale
      // rename→commit gap while keeping the test fast; no reader is
      // pinned to an old manifest here
      compactor.startMaintenance(java.time.Duration.ofMillis(100),
        manifestGcGrace = Some(java.time.Duration.ofSeconds(2)))
      def hotFilesOnDisk(): Int = {
        val d = new java.io.File(s"$root/hot/container=c/session=s")
        if (!d.isDirectory) 0
        else d.listFiles.count(f => f.isFile && f.getName.endsWith(".parquet"))
      }
      val deadline = System.currentTimeMillis + 480000
      while ((store.tierStats("c", "s")._3 > 0 || hotFilesOnDisk() > 0) &&
             System.currentTimeMillis < deadline) Thread.sleep(200)
      // rotation moved hot → cold (manifest view) AND the GC sweep
      // deleted the retired hot files from disk, not just the manifest
      assert(store.tierStats("c", "s")._3 == 0, "maintenance never rotated the manifest session")
      assert(hotFilesOnDisk() == 0, "snapshot GC left retired hot files on disk")
      assert(store.read("c", "s").count() === 4)
    } finally compactor.close()
  }

  test("maintenance loop rotates hot sessions and sweeps expired idempotency markers") {
    val store = new LogStore(spark, tempDir("maint"))
    val compactor = new Compactor(store, thresholdBytes = 1) // any hot byte rotates
    try {
      val b = spark.createDataFrame(
        Seq(Row(Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")), "INFO", "x")).asJava,
        LogSchema.fileSchema)
      // appended WITHOUT noteAppend — only the maintenance listing can see it
      store.appendIdempotent(b, "c", "s", "stream-old")
      compactor.startMaintenance(java.time.Duration.ofMillis(100),
        tagHorizon = Some(java.time.Duration.ZERO)) // opt-in: markers expire immediately
      // rotation + marker sweep both observed once a replay of the old tag
      // is ACCEPTED again (hot file compacted away, marker swept).
      // Deliberately huge deadline: suites run in parallel on ONE shared
      // SparkSession, so this test's compaction job can be starved for
      // minutes behind other suites' FIFO-queued jobs; the common case
      // exits in a few seconds.
      val deadline = System.currentTimeMillis + 480000
      var replayed = -1L
      while (replayed <= 0 && System.currentTimeMillis < deadline) {
        Thread.sleep(200)
        // replay may race the marker sweep: hot can drain a beat before the
        // sweep removes the old tag, making appendIdempotent return 0 (still
        // suppressed, no side effect) — keep retrying until it is accepted
        if (store.tierStats("c", "s")._3 == 0)
          replayed = store.appendIdempotent(b, "c", "s", "stream-old")
      }
      assert(replayed > 0, "maintenance should have rotated the session and swept the marker")
      assert(store.tierStats("c", "s")._1 > 0, "rows landed cold")
      assert(store.read("c", "s").count() === 2) // original + accepted replay
    } finally compactor.close()
  }

  test("close() performs the shutdown flush (T5): all hot sessions compacted synchronously") {
    val store = new LogStore(spark, tempDir("compactor"))
    val compactor = new Compactor(store, thresholdBytes = Long.MaxValue)
    append(store, 2, "c1", "s1")
    append(store, 2, "c2", "s2")
    compactor.close()
    assert(store.hotBytes("c1", "s1") === 0 && store.hotBytes("c2", "s2") === 0)
    assert(store.read("c1", "s1").count() === 2)
    assert(store.read("c2", "s2").count() === 2)
  }
}

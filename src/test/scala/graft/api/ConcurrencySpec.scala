package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.util.concurrent.atomic.AtomicInteger
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.BeforeAndAfterAll
import graft.SparkSuite

/** The reference's only concurrency artifact is the threaded
  * writer+reader demo (client.py:307-458): one thread appending, one
  * reading, asserting reads never fail and eventually see all writes.
  * Port of that as a real test, with the buffer threshold forced low so
  * rotation+async compaction happen mid-traffic (writer.py:252-259). */
class ConcurrencySpec extends SparkSuite with BeforeAndAfterAll {

  private var server: LogServer = _
  private def base = s"http://localhost:${server.boundPort}"
  private val mapper = new ObjectMapper()

  override def beforeAll(): Unit = {
    // ~1 KiB threshold: every few appends trigger an async compaction.
    server = new LogServer(spark, tempDir("conc"), bufferSizeLimit = 1024).start()
  }
  override def afterAll(): Unit = server.close()

  test("concurrent writer and reader: read-your-writes holds across rotation and compaction") {
    val client = HttpClient.newHttpClient()
    def send(method: String, path: String, body: Option[String], token: Option[String]): HttpResponse[String] = {
      var b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      b = body.fold(b.method(method, BodyPublishers.noBody()))(j =>
        b.method(method, BodyPublishers.ofString(j)).header("Content-Type", "application/json"))
      token.foreach(t => b = b.header("Authorization", s"Bearer $t"))
      client.send(b.build(), BodyHandlers.ofString())
    }
    val token = mapper.readTree(send("POST", "/api/auth/login",
      Some("""{"username":"admin","password":"admin"}"""), None).body).get("token").asText
    send("POST", "/api/containers", Some("""{"container_id":"conc"}"""), Some(token))
    send("POST", "/api/containers/conc/sessions", Some("""{"session_id":"race"}"""), Some(token))

    val nBatches = 10
    val rowsPerBatch = 5
    val written = new AtomicInteger(0)
    val readerErrors = new AtomicInteger(0)
    @volatile var monotonic = true
    @volatile var lastSeen = 0

    val writer = new Thread(() => {
      for (b <- 1 to nBatches) {
        val logs = (1 to rowsPerBatch).map(i =>
          s"""{"level":"INFO","message":"b$b-r$i","timestamp":"2025-01-01T00:0${b % 10}:0${i % 10}Z"}""")
          .mkString("[", ",", "]")
        val r = send("POST", "/api/logs/conc/race", Some(s"""{"logs":$logs}"""), Some(token))
        if (r.statusCode == 201) written.addAndGet(rowsPerBatch)
      }
    }, "writer")

    val reader = new Thread(() => {
      while (written.get < nBatches * rowsPerBatch) {
        val r = send("GET", "/api/logs/conc/race", None, Some(token))
        if (r.statusCode != 200) {
          readerErrors.incrementAndGet()
          System.err.println(s"[conctest] read failed: ${r.statusCode} ${r.body.take(500)}")
        }
        else {
          val n = mapper.readTree(r.body).get("total_rows").asInt
          // visible row count must never go backwards (no double counts,
          // no lost rows mid-compaction)
          if (n < lastSeen) monotonic = false
          lastSeen = n
        }
      }
    }, "reader")

    writer.start(); reader.start()
    writer.join(120000); reader.join(120000)

    assert(readerErrors.get === 0, "reads failed during concurrent writes")
    assert(monotonic, "visible row count went backwards during compaction")
    assert(written.get === nBatches * rowsPerBatch)
    // final read sees every row exactly once
    val fin = send("GET", "/api/logs/conc/race", None, Some(token))
    assert(mapper.readTree(fin.body).get("total_rows").asInt === nBatches * rowsPerBatch)
  }

  test("multiple concurrent writers to ONE session: no lost or duplicated batches") {
    val client = HttpClient.newHttpClient()
    def send(method: String, path: String, body: Option[String], token: Option[String]): HttpResponse[String] = {
      var b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      b = body.fold(b.method(method, BodyPublishers.noBody()))(j =>
        b.method(method, BodyPublishers.ofString(j)).header("Content-Type", "application/json"))
      token.foreach(t => b = b.header("Authorization", s"Bearer $t"))
      client.send(b.build(), BodyHandlers.ofString())
    }
    val token = mapper.readTree(send("POST", "/api/auth/login",
      Some("""{"username":"admin","password":"admin"}"""), None).body).get("token").asText
    send("POST", "/api/containers", Some("""{"container_id":"multi"}"""), Some(token))
    send("POST", "/api/containers/multi/sessions", Some("""{"session_id":"shared"}"""), Some(token))

    val nWriters = 4
    val batchesPerWriter = 5
    val ok = new AtomicInteger(0)
    val writers = (1 to nWriters).map { w =>
      new Thread(() => {
        for (b <- 1 to batchesPerWriter) {
          val r = send("POST", "/api/logs/multi/shared",
            Some(s"""{"logs":[{"level":"INFO","message":"w$w-b$b","timestamp":"2025-01-01T00:00:00Z"}]}"""),
            Some(token))
          if (r.statusCode == 201) ok.incrementAndGet()
        }
      }, s"writer-$w")
    }
    writers.foreach(_.start()); writers.foreach(_.join(120000))
    assert(ok.get === nWriters * batchesPerWriter, "some appends failed")

    val fin = send("GET", "/api/logs/multi/shared", None, Some(token))
    val logs = mapper.readTree(fin.body).get("logs")
    val msgs = (0 until logs.size).map(i => logs.get(i).get("message").asText).sorted
    val expected = (for (w <- 1 to nWriters; b <- 1 to batchesPerWriter) yield s"w$w-b$b").sorted
    assert(msgs === expected) // every batch exactly once, none clobbered
  }

  test("ingest buffering keeps multiset exactly-once across graceful restart") {
    // The round-6 write-behind buffer moves the ack point ahead of the
    // storage append; this pins the contract that makes that legal:
    // every 201-acked row is durable after close() (graceful-shutdown
    // flush) and visible EXACTLY once to a fresh server on the same
    // root — no loss from dropped buffers, no double-publish from the
    // timer racing a threshold flush. Buffer thresholds are forced low
    // (1 KiB / 10 ms) so size-triggered, timer-triggered and
    // read-triggered flushes all fire mid-traffic, alongside 1 KiB
    // rotation compaction.
    val root = tempDir("restart")
    val s1 = new LogServer(spark, root, bufferSizeLimit = 1024,
      ingestFlushBytes = 1024, ingestFlushMs = 10).start()
    val client = HttpClient.newHttpClient()
    def sendTo(port: Int)(method: String, path: String, body: Option[String],
                          token: Option[String]): HttpResponse[String] = {
      var b = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      b = body.fold(b.method(method, BodyPublishers.noBody()))(j =>
        b.method(method, BodyPublishers.ofString(j)).header("Content-Type", "application/json"))
      token.foreach(t => b = b.header("Authorization", s"Bearer $t"))
      client.send(b.build(), BodyHandlers.ofString())
    }
    val send1 = sendTo(s1.boundPort) _
    val token = mapper.readTree(send1("POST", "/api/auth/login",
      Some("""{"username":"admin","password":"admin"}"""), None).body).get("token").asText
    send1("POST", "/api/containers", Some("""{"container_id":"rst"}"""), Some(token))
    val nSessions = 3
    (1 to nSessions).foreach { s =>
      send1("POST", "/api/containers/rst/sessions",
        Some(s"""{"session_id":"s$s"}"""), Some(token))
    }
    val nWriters = 6 // 2 writers share each session — cross-post interleaving
    val batches = 8
    val acked = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writers = (1 to nWriters).map { w =>
      new Thread(() => {
        val sess = (w - 1) % nSessions + 1
        for (b <- 1 to batches) {
          val msgs = (1 to 3).map(i => s"s$sess-w$w-b$b-r$i")
          val logs = msgs.map(m =>
            s"""{"level":"INFO","message":"$m","timestamp":"2025-01-01T00:00:00Z"}""")
            .mkString("[", ",", "]")
          val r = send1("POST", s"/api/logs/rst/s$sess", Some(s"""{"logs":$logs}"""), Some(token))
          if (r.statusCode == 201) msgs.foreach(m => acked.add(s"s$sess|$m"))
        }
      }, s"rst-writer-$w")
    }
    writers.foreach(_.start()); writers.foreach(_.join(120000))
    s1.close() // graceful: buffer flush + compactor drain

    val s2 = new LogServer(spark, root, bufferSizeLimit = 1024).start()
    try {
      val send2 = sendTo(s2.boundPort) _
      val token2 = mapper.readTree(send2("POST", "/api/auth/login",
        Some("""{"username":"admin","password":"admin"}"""), None).body).get("token").asText
      val seen = (1 to nSessions).flatMap { sess =>
        val r = send2("GET", s"/api/logs/rst/s$sess", None, Some(token2))
        assert(r.statusCode === 200)
        val logs = mapper.readTree(r.body).get("logs")
        (0 until logs.size).map(i => s"s$sess|${logs.get(i).get("message").asText}")
      }
      import scala.jdk.CollectionConverters._
      assert(seen.sorted === acked.asScala.toSeq.sorted,
        "restarted server must see every acked row exactly once")
    } finally s2.close()
  }
}

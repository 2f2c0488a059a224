package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.BeforeAndAfterAll
import graft.SparkSuite
import graft.storage.ManifestLog

/** TWO LogServer instances sharing ONE ManifestLog storage root — the
  * multi-gateway deployment the round-8 CAS commit exists for: every
  * manifest commit from either server races through the version CAS,
  * and a read through one gateway sees every batch either gateway has
  * flushed. Each instance keeps its OWN catalog (auth state is
  * per-gateway, like any sticky-session deployment); only the DATA
  * tier is shared, via the injected tier factory.
  *
  * Read-your-writes is per-gateway by design (a GET flushes ITS
  * server's write-behind buffer, not the peer's) — the cross-instance
  * contract is: once a gateway has flushed (its own GET, timer, or
  * shutdown), the rows are in the shared manifest and every other
  * gateway's next read sees them. The tests below force that ordering
  * explicitly rather than sleeping on the flush timer.
  */
class LogServerMultiInstanceSpec extends SparkSuite with BeforeAndAfterAll {

  private var sharedData: String = _
  private var a: LogServer = _
  private var b: LogServer = _
  private val client = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  override def beforeAll(): Unit = {
    sharedData = tempDir("multi-data")
    def make(root: String): LogServer =
      new LogServer(spark, root,
        makeTier = (sp, _) => new ManifestLog(sp, sharedData)).start()
    a = make(tempDir("multi-a"))
    b = make(tempDir("multi-b"))
  }
  override def afterAll(): Unit = { a.close(); b.close() }

  private def req(server: LogServer, method: String, path: String,
                  body: Option[String] = None, token: Option[String] = None)
      : HttpResponse[String] = {
    var rb = HttpRequest.newBuilder(
      URI.create(s"http://localhost:${server.boundPort}$path"))
    rb = body match {
      case Some(j) => rb.method(method, BodyPublishers.ofString(j))
        .header("Content-Type", "application/json")
      case None => rb.method(method, BodyPublishers.noBody())
    }
    token.foreach(t => rb = rb.header("Authorization", s"Bearer $t"))
    client.send(rb.build(), BodyHandlers.ofString())
  }

  private def login(server: LogServer): String =
    mapper.readTree(req(server, "POST", "/api/auth/login",
      Some("""{"username":"admin","password":"admin"}""")).body).get("token").asText

  private def setup(server: LogServer, token: String, c: String, s: String): Unit = {
    req(server, "POST", "/api/containers", Some(s"""{"container_id":"$c"}"""), Some(token))
    req(server, "POST", s"/api/containers/$c/sessions",
      Some(s"""{"session_id":"$s"}"""), Some(token))
  }

  private def post(server: LogServer, token: String, c: String, s: String,
                   msgs: Seq[String]): Int = {
    val logs = msgs.map(m =>
      s"""{"level":"INFO","message":"$m","timestamp":"2025-01-01T00:00:00Z"}""")
      .mkString("[", ",", "]")
    req(server, "POST", s"/api/logs/$c/$s", Some(s"""{"logs":$logs}"""), Some(token))
      .statusCode
  }

  private def totalRows(server: LogServer, token: String, c: String, s: String): Int =
    mapper.readTree(req(server, "GET", s"/api/logs/$c/$s", token = Some(token)).body)
      .get("total_rows").asInt

  test("writes through either gateway are visible through both once each has flushed") {
    val (ta, tb) = (login(a), login(b))
    setup(a, ta, "shared", "s1"); setup(b, tb, "shared", "s1")
    assert(post(a, ta, "shared", "s1", Seq("a1", "a2", "a3")) == 201)
    assert(post(b, tb, "shared", "s1", Seq("b1", "b2")) == 201)
    // each gateway's GET flushes its OWN buffer into the shared store;
    // after both have read once, both see the union
    totalRows(b, tb, "shared", "s1")
    totalRows(a, ta, "shared", "s1")
    assert(totalRows(a, ta, "shared", "s1") == 5)
    assert(totalRows(b, tb, "shared", "s1") == 5)
  }

  test("concurrent writers through both gateways: every acked batch lands exactly once") {
    val (ta, tb) = (login(a), login(b))
    setup(a, ta, "shared", "race"); setup(b, tb, "shared", "race")
    val perThread = 5
    val acked = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = Seq((a, ta, "A"), (b, tb, "B")).flatMap { case (srv, tok, tag) =>
      (1 to 2).map { t =>
        new Thread(() => (1 to perThread).foreach { i =>
          if (post(srv, tok, "shared", "race", Seq(s"$tag$t-$i", s"$tag$t-$i")) == 201)
            acked.incrementAndGet()
        }, s"multi-writer-$tag$t")
      }
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(acked.get == 4 * perThread, s"only ${acked.get} posts acked")
    totalRows(a, ta, "shared", "race"); totalRows(b, tb, "shared", "race")
    assert(totalRows(a, ta, "shared", "race") == 4 * perThread * 2)
  }

  test("compaction through one gateway never loses the other gateway's flushed rows") {
    val (ta, tb) = (login(a), login(b))
    setup(a, ta, "shared", "cmp"); setup(b, tb, "shared", "cmp")
    assert(post(a, ta, "shared", "cmp", Seq("pre-1", "pre-2")) == 201)
    totalRows(a, ta, "shared", "cmp") // flush A
    assert(post(b, tb, "shared", "cmp", Seq("mid-1")) == 201)
    totalRows(b, tb, "shared", "cmp") // flush B
    // compact via A's tier object; B reads from the swapped manifest
    a.store.compact("shared", "cmp")
    assert(totalRows(b, tb, "shared", "cmp") == 3)
    assert(post(b, tb, "shared", "cmp", Seq("post-1")) == 201)
    totalRows(b, tb, "shared", "cmp")
    assert(totalRows(a, ta, "shared", "cmp") == 4)
  }
}

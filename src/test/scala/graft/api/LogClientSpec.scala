package graft.api

import org.scalatest.BeforeAndAfterAll
import graft.SparkSuite
import graft.api.LogClient.{AuthenticationError, LogClientError, LogEntry}

/** SDK counterpart of the reference's client demo (client.py:53-305):
  * the full endpoint surface through [[LogClient]], including the error
  * mapping (401 → AuthenticationError, other 4xx → LogClientError). */
class LogClientSpec extends SparkSuite with BeforeAndAfterAll {

  private var server: LogServer = _
  private def client = new LogClient(s"http://localhost:${server.boundPort}")

  override def beforeAll(): Unit = server = new LogServer(spark, tempDir("cli")).start()
  override def afterAll(): Unit = server.close()

  test("full client workflow against the live server") {
    val c = client
    val login = c.login("admin", "admin")
    assert(login.get("expires_in_hours").asInt === 24 && c.userId === Some("admin"))

    assert(c.createContainer("sdk-app").get("message").asText === "Container created successfully")
    assert(c.createSession("sdk-app", "run1").get("session_id").asText === "run1")
    val w = c.writeLogs("sdk-app", "run1", Seq(
      LogEntry("2025-06-01T08:00:00Z", "INFO", "up"),
      LogEntry("2025-06-01T09:00:00Z", "ERROR", "down")))
    assert(w.get("count").asInt === 2)

    val all = c.readLogs("sdk-app", "run1")
    assert(all.get("total_rows").asInt === 2)
    val ranged = c.readLogs("sdk-app", "run1",
      startTs = Some("2025-06-01T08:30:00Z"), endTs = Some("2025-06-01T09:00:00Z"))
    assert(ranged.get("total_rows").asInt === 1)
    assert(ranged.get("logs").get(0).get("message").asText === "down")
    // explicit-offset timestamps survive URL encoding ('+' must not
    // decode to a space server-side)
    val offset = c.readLogs("sdk-app", "run1",
      startTs = Some("2025-06-01T09:30:00+01:00"), endTs = Some("2025-06-01T10:00:00+01:00"))
    assert(offset.get("total_rows").asInt === 1)
    // space-separated naive datetimes (the same form POST accepts) work too
    val spaced = c.readLogs("sdk-app", "run1", startTs = Some("2025-06-01 08:30:00"))
    assert(spaced.get("total_rows").asInt === 1)
    val streamed = c.readLogs("sdk-app", "run1", stream = true)
    assert(streamed.get("logs").size === 2)

    assert(c.listContainers().get("count").asInt >= 1)
    assert(c.listSessions("sdk-app").get("sessions").get(0).get("session_id").asText === "run1")
    c.logout()
    intercept[AuthenticationError](c.listContainers()) // token cleared + revoked
  }

  test("error mapping: 401 → AuthenticationError, 4xx → LogClientError with server message") {
    val c = client
    intercept[AuthenticationError](c.login("admin", "wrong"))
    intercept[AuthenticationError](c.listContainers()) // never logged in
    c.login("admin", "admin")
    c.createContainer("sdk-dup")
    val e = intercept[LogClientError](c.createContainer("sdk-dup"))
    assert(e.getMessage === "API error (409): Container already exists")
    val v = intercept[LogClientError](c.writeLogs("sdk-dup", "nosess", Seq(
      LogEntry("2025-06-01T08:00:00Z", "INFO", "x"))))
    assert(v.getMessage.contains("403"))
  }
}

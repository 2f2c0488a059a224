package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Client SDK mirroring the reference's `LogClient` (client.py:53-305):
  * every endpoint, token kept on the instance after login, 401 mapped to
  * [[LogClient.AuthenticationError]] and other 4xx/5xx to
  * [[LogClient.LogClientError]] carrying the server's error message. */
object LogClient {
  class LogClientError(msg: String) extends RuntimeException(msg)
  final class AuthenticationError(msg: String) extends LogClientError(msg)

  final case class LogEntry(timestamp: String, level: String, message: String)
}

final class LogClient(baseUrl: String) {
  import LogClient._

  private val base = baseUrl.stripSuffix("/")
  private val http = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()
  @volatile private var token: Option[String] = None
  @volatile var userId: Option[String] = None

  private def request(method: String, path: String, body: Option[JsonNode]): JsonNode = {
    var b = HttpRequest.newBuilder(URI.create(s"$base$path"))
    b = body match {
      case Some(j) => b.method(method, BodyPublishers.ofString(mapper.writeValueAsString(j)))
        .header("Content-Type", "application/json")
      case None => b.method(method, BodyPublishers.noBody())
    }
    token.foreach(t => b = b.header("Authorization", s"Bearer $t"))
    val resp: HttpResponse[String] = http.send(b.build(), BodyHandlers.ofString())
    val data =
      try mapper.readTree(resp.body)
      catch { case _: Exception =>
        val n = mapper.createObjectNode(); n.put("error", resp.body); n
      }
    def errMsg = Option(data.get("error")).map(_.asText).getOrElse("Unknown error")
    if (resp.statusCode == 401) throw new AuthenticationError(errMsg)
    if (resp.statusCode >= 400) throw new LogClientError(s"API error (${resp.statusCode}): $errMsg")
    data
  }

  private def obj(kv: (String, String)*): JsonNode = {
    val n = mapper.createObjectNode()
    kv.foreach { case (k, v) => n.put(k, v) }
    n
  }

  /** POST /api/auth/login — stores the token for subsequent calls. */
  def login(username: String, password: String): JsonNode = {
    val r = request("POST", "/api/auth/login", Some(obj("username" -> username, "password" -> password)))
    token = Option(r.get("token")).map(_.asText)
    userId = Option(r.get("user_id")).map(_.asText)
    r
  }

  /** POST /api/auth/logout — clears the stored token. */
  def logout(): JsonNode = {
    val r = request("POST", "/api/auth/logout", None)
    token = None; userId = None
    r
  }

  def createContainer(containerId: String): JsonNode =
    request("POST", "/api/containers", Some(obj("container_id" -> containerId)))

  def listContainers(): JsonNode = request("GET", "/api/containers", None)

  def createSession(containerId: String, sessionId: String): JsonNode =
    request("POST", s"/api/containers/$containerId/sessions", Some(obj("session_id" -> sessionId)))

  def listSessions(containerId: String): JsonNode =
    request("GET", s"/api/containers/$containerId/sessions", None)

  /** POST /api/logs — write a batch of log entries. */
  def writeLogs(container: String, session: String, logs: Seq[LogEntry]): JsonNode = {
    val n = mapper.createObjectNode()
    val arr = n.putArray("logs")
    logs.foreach { e =>
      val o = mapper.createObjectNode()
      o.put("timestamp", e.timestamp); o.put("level", e.level); o.put("message", e.message)
      arr.add(o)
    }
    request("POST", s"/api/logs/$container/$session", Some(n))
  }

  /** GET /api/logs with optional inclusive time range and stream mode.
    * Values are URL-encoded — a '+' in an offset timestamp would
    * otherwise decode to a space server-side. */
  def readLogs(container: String, session: String,
               startTs: Option[String] = None, endTs: Option[String] = None,
               stream: Boolean = false): JsonNode = {
    def enc(v: String) = java.net.URLEncoder.encode(v, java.nio.charset.StandardCharsets.UTF_8)
    val params = startTs.map(s => s"start_ts=${enc(s)}").toSeq ++
      endTs.map(e => s"end_ts=${enc(e)}").toSeq ++
      (if (stream) Seq("stream=true") else Seq.empty)
    val qs = if (params.isEmpty) "" else params.mkString("?", "&", "")
    request("GET", s"/api/logs/$container/$session$qs", None)
  }
}

package graft.catalog

import java.nio.file.Files
import java.time.{Clock, Duration, Instant, ZoneOffset}
import org.scalatest.funsuite.AnyFunSuite

/** Auth/tenancy semantics from the reference (auth.py:25-249): SHA-256
  * passwords, default admin, 24 h lazy token expiry, ownership checks,
  * duplicate → conflict, restart persistence. */
class CatalogServiceSpec extends AnyFunSuite {

  /** Mutable clock so expiry is testable without sleeping. */
  private final class FakeClock(var now: Instant) extends Clock {
    def getZone = ZoneOffset.UTC
    override def withZone(z: java.time.ZoneId): Clock = this
    def instant() = now
  }

  test("default admin/admin exists; wrong password and unknown user fail") {
    val c = new CatalogService()
    assert(c.verifyPassword("admin", "admin"))
    assert(!c.verifyPassword("admin", "wrong"))
    assert(!c.verifyPassword("ghost", "admin"))
  }

  test("token round-trip: create, verify, revoke") {
    val c = new CatalogService()
    val t = c.createToken("admin")
    assert(c.verifyToken(t) === Some("admin"))
    c.revokeToken(t)
    assert(c.verifyToken(t) === None)
  }

  test("tokens expire after 24h and are deleted lazily on verify") {
    val clock = new FakeClock(Instant.parse("2026-01-01T00:00:00Z"))
    val c = new CatalogService(clock = clock)
    val t = c.createToken("admin", expiresInHours = 24)
    clock.now = clock.now.plus(Duration.ofHours(23))
    assert(c.verifyToken(t) === Some("admin"))
    clock.now = clock.now.plus(Duration.ofHours(2))
    assert(c.verifyToken(t) === None) // expired → deleted
    clock.now = clock.now.minus(Duration.ofHours(10))
    assert(c.verifyToken(t) === None) // stays deleted even if time rewinds
  }

  test("container create: duplicate rejected even across users") {
    val c = new CatalogService()
    c.createUser("alice", "pw")
    assert(c.createContainer("admin", "app"))
    assert(!c.createContainer("admin", "app"))
    assert(!c.createContainer("alice", "app")) // global id namespace (PRIMARY KEY)
  }

  test("session create requires container ownership; duplicate rejected") {
    val c = new CatalogService()
    c.createUser("alice", "pw")
    assert(c.createContainer("admin", "app"))
    assert(!c.createSession("alice", "app", "app_run")) // not the owner
    assert(!c.createSession("admin", "ghost", "ghost_run")) // no such container
    assert(c.createSession("admin", "app", "app_run"))
    assert(!c.createSession("admin", "app", "app_run")) // duplicate
  }

  test("access checks compare owners (auth.py:205-223)") {
    val c = new CatalogService()
    c.createUser("alice", "pw")
    c.createContainer("admin", "app")
    c.createSession("admin", "app", "app_run")
    assert(c.verifyContainerAccess("admin", "app"))
    assert(!c.verifyContainerAccess("alice", "app"))
    assert(c.verifySessionAccess("admin", "app_run"))
    assert(!c.verifySessionAccess("alice", "app_run"))
    assert(!c.verifySessionAccess("admin", "nope"))
  }

  test("listings are owner-scoped and newest-first") {
    val clock = new FakeClock(Instant.parse("2026-01-01T00:00:00Z"))
    val c = new CatalogService(clock = clock)
    c.createContainer("admin", "app1")
    clock.now = clock.now.plusSeconds(60)
    c.createContainer("admin", "app2")
    c.createUser("alice", "pw")
    c.createContainer("alice", "hers")
    assert(c.userContainers("admin").map(_._1) === Seq("app2", "app1"))
    c.createSession("admin", "app1", "app1_r1")
    clock.now = clock.now.plusSeconds(60)
    c.createSession("admin", "app1", "app1_r2")
    assert(c.containerSessions("admin", "app1").map(_._1) === Seq("app1_r2", "app1_r1"))
    assert(c.containerSessions("alice", "app1") === Seq.empty) // not the owner → empty
  }

  test("cleanupExpiredTokens removes only the expired ones") {
    val clock = new FakeClock(Instant.parse("2026-01-01T00:00:00Z"))
    val c = new CatalogService(clock = clock)
    val shortLived = c.createToken("admin", expiresInHours = 1)
    val longLived = c.createToken("admin", expiresInHours = 48)
    clock.now = clock.now.plus(Duration.ofHours(2))
    c.cleanupExpiredTokens()
    assert(c.verifyToken(shortLived) === None)
    assert(c.verifyToken(longLived) === Some("admin"))
  }

  test("createUser rejects duplicates; tokens are url-safe and unique") {
    val c = new CatalogService()
    assert(c.createUser("dana", "pw"))
    assert(!c.createUser("dana", "other"))
    val tokens = (1 to 20).map(_ => c.createToken("dana"))
    assert(tokens.distinct.size === 20)
    assert(tokens.forall(_.matches("^[A-Za-z0-9_-]+$"))) // url-safe base64, no padding
  }

  test("state survives restart via catalog.json (tokens included)") {
    val dir = Files.createTempDirectory("catalog")
    val c1 = new CatalogService(Some(dir))
    c1.createUser("bob", "secret")
    c1.createContainer("bob", "box")
    c1.createSession("bob", "box", "box_run")
    val t = c1.createToken("bob")
    val c2 = new CatalogService(Some(dir)) // fresh instance, same dir
    assert(c2.verifyPassword("bob", "secret"))
    assert(c2.verifyToken(t) === Some("bob"))
    assert(c2.verifyContainerAccess("bob", "box"))
    assert(c2.verifySessionAccess("bob", "box_run"))
    assert(!c2.createContainer("bob", "box")) // still a duplicate after reload
  }
}

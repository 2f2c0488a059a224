package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import graft.storage.Cas

/** Versioned single-record state store committed through the engine's
  * CAS primitive ([[graft.storage.Cas]]) — the control-plane twin of
  * [[graft.storage.ManifestLog]]'s version chain, built for the shared
  * multi-gateway catalog: every committed version is a COMPLETE
  * snapshot of the catalog state at `<dir>/v<%020d>.json`, claimed with
  * an atomic create-if-absent, so any number of gateway processes on
  * one shared root serialize their catalog mutations without a lock
  * and read each other's commits immediately.
  *
  * The record is framed (`#graft-state <bytes>` header line before the
  * payload) so a mid-write read on an O_EXCL-fallback mount parses as
  * INCOMPLETE and is skipped/retried, never half-applied — the same
  * detectability contract the manifest header/footer provides.
  *
  * Old versions are pruned on successful commit (keep the newest
  * [[keepVersions]], and only past a grace window so a concurrent
  * reader that just resolved an older version can still read it; a
  * reader losing that race gets FileNotFound and re-resolves). Unlike
  * data manifests there is nothing to time-travel here — the catalog
  * is current-state-only, exactly like the reference's SQLite tables
  * (auth.py:25-84).
  */
object CasStateStore {
  /** Minimum prune grace for the O(1) fresh-resolve commit guard: the
    * freshness window is grace/4, leaving ≥ 3·grace/4 (15 s here) of
    * slack that must dominate cross-host clock skew — NTP-disciplined
    * fleets sit at milliseconds; a fleet that can't promise seconds of
    * agreement should raise the grace, not shrink this. */
  private[catalog] val MinFastPathGraceMs = 20000L
}

final class CasStateStore(fs: FileSystem, dir: Path,
                          keepVersions: Int = 32,
                          pruneGraceMs: Long = 60000L) {

  require(keepVersions >= 1, "keepVersions must retain at least the frontier")

  private val versionRe = "v\\d{20}\\.json".r

  private def pathOf(v: Long): Path = new Path(dir, f"v$v%020d.json")
  private def versionOf(p: Path): Long =
    p.getName.stripPrefix("v").stripSuffix(".json").toLong

  private def frame(payload: Array[Byte]): Array[Byte] = {
    val h = s"#graft-state ${payload.length}\n".getBytes("UTF-8")
    h ++ payload
  }

  /** Payload if the record is complete (frame length matches), else
    * None (a fresh in-flight O_EXCL write, or external damage). */
  private def readValid(p: Path): Option[String] = {
    val in = fs.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var k = in.read(buf)
      while (k >= 0) { out.write(buf, 0, k); k = in.read(buf) }
      out.toByteArray
    } finally in.close()
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    val head = new String(bytes, 0, nl, "UTF-8")
    if (!head.startsWith("#graft-state ")) return None
    val declared = try head.stripPrefix("#graft-state ").trim.toInt
                   catch { case _: NumberFormatException => return None }
    if (bytes.length - nl - 1 != declared) None
    else Some(new String(bytes, nl + 1, declared, "UTF-8"))
  }

  /** (claim slot, newest valid version, its payload). The claim slot
    * is the highest version FILE present regardless of validity — a
    * committer must never claim past an in-flight/corrupt frontier
    * with a version built on older state, or it would supersede the
    * concurrent commit it could not read (the lost-update hazard the
    * manifest commit loop also guards). (0, 0, None) on a fresh dir.
    *
    * FAST PATH (the manifest tier's version-hint recipe): the catalog
    * resolve sits on the auth path of EVERY request, and the listing
    * is a paged LIST per call on object stores. Once a CLEAN frontier
    * (slot == valid) is known, the next resolve probes `v(slot+1)` for
    * absence and re-confirms `v(slot)` exists — two existence checks,
    * no listing, no re-read (records are immutable once complete).
    * Safe against [[prune]] for the same structural reason as the
    * manifest probe: pruning deletes ascending and only versions ≤
    * latest − keepVersions, so "slot readable and slot+1 absent" can
    * only mean slot IS the frontier; a pruned-under-us hint fails the
    * re-confirm and falls back to the listing. An UNCLEAN frontier
    * (valid < slot: in-flight record whose content may complete later)
    * is never cached. */
  def resolve(): (Long, Long, Option[String]) = {
    val h = frontierHint
    if (h != null) {
      try {
        if (!fs.exists(pathOf(h._1 + 1)) && fs.exists(pathOf(h._1))) return h
      } catch { case _: java.io.IOException => () } // fall through to listing
    }
    if (!fs.exists(dir)) return (0L, 0L, None)
    val files = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && versionRe.matches(st.getPath.getName))
      .sortBy(st => -versionOf(st.getPath))
    val slot = files.headOption.map(st => versionOf(st.getPath)).getOrElse(0L)
    val r = files.iterator.flatMap { st =>
      try readValid(st.getPath).map((versionOf(st.getPath), _))
      catch { case _: java.io.FileNotFoundException => None } // pruned under us
    }.nextOption() match {
      case Some((v, payload)) => (slot, v, Some(payload))
      case None => (slot, 0L, None)
    }
    frontierHint = if (r._1 > 0 && r._1 == r._2) r else null
    r
  }

  /** Last known CLEAN frontier: (slot, valid, payload) with
    * slot == valid. Null until the first clean full resolve. */
  @volatile private var frontierHint: (Long, Long, Option[String]) = null

  /** Claim `version` with `payload`; true = committed (and old
    * versions pruned). False = slot taken — the caller re-resolves,
    * re-applies its mutation, and retries at the new frontier.
    *
    * `resolvedAtMs` (0 = unknown) is when the caller's resolve
    * observed the predecessor frontier — it selects the ABA guard:
    *
    *  - FRESH resolve (younger than a QUARTER of the prune grace): ONE
    *    existence probe of the target slot suffices. The hazard the
    *    guard exists for is a target slot CLAIMED by someone else and
    *    then VACATED by prune below the live frontier — but prune only
    *    deletes files whose mtime predates the grace horizon, and any
    *    claim of the target after our resolve carries an mtime newer
    *    than the resolve, so within the freshness window a vacated
    *    slot is structurally impossible: a lost slot still HAS its
    *    file, and the probe sees it. (The target cannot have been
    *    claimed BEFORE our resolve either — resolve's clean-frontier
    *    proof is "slot readable ∧ slot+1 absent", and prune deletes
    *    ascending.) This keeps the commit path at O(1) filesystem ops
    *    regardless of how many in-grace version files a mutation burst
    *    has accumulated — the listing guard made a 10⁴-mutation burst
    *    quadratic (measured in ServiceScaleCheck's catalog rows).
    *    CLOCK CONTRACT: the freshness argument compares THIS host's
    *    clock against mtimes another gateway's prune judged by ITS
    *    clock (the same cross-host assumption prune's reader grace
    *    already makes), so the fast path demands margin: it engages
    *    only when the grace is large enough that the remaining
    *    3/4-grace slack dominates any NTP-grade skew
    *    ([[CasStateStore.MinFastPathGraceMs]] ≥ 20 s grace → ≥ 15 s
    *    slack), and otherwise falls back to the listing guard, which
    *    has no clock dependency.
    *  - STALE/UNKNOWN resolve: the original full listing — if any
    *    version ≥ the target exists, this attempt already lost. A
    *    version created AFTER this listing cannot have been pruned yet
    *    (grace exceeds listing→claim latency in any real config;
    *    graceMs=0 is test-only). */
  def tryCommit(version: Long, payload: String,
                resolvedAtMs: Long = 0L): Boolean = {
    fs.mkdirs(dir)
    val freshResolve = resolvedAtMs > 0L &&
      pruneGraceMs >= CasStateStore.MinFastPathGraceMs &&
      System.currentTimeMillis() - resolvedAtMs < pruneGraceMs / 4
    val occupied = try {
      if (freshResolve) fs.exists(pathOf(version))
      else fs.listStatus(dir).exists { st =>
        st.isFile && versionRe.matches(st.getPath.getName) &&
          versionOf(st.getPath) >= version
      }
    } catch { case _: java.io.FileNotFoundException => false }
    if (occupied) { frontierHint = null; return false }
    val ok = Cas.tryClaim(fs, pathOf(version),
      frame(payload.getBytes("UTF-8")), ownerOnly = true)
    if (ok) {
      frontierHint = (version, version, Some(payload)) // our commit IS the clean frontier
      prune(version)
    }
    ok
  }

  private def prune(latest: Long): Unit = {
    val horizon = System.currentTimeMillis() - pruneGraceMs
    try {
      val all = fs.listStatus(dir).toSeq
      // version files are deleted in ASCENDING order — the frontier
      // probe's safety ("slot readable and slot+1 absent ⇒ slot is the
      // frontier") requires that no deletion ever removes v+1 while v
      // still exists, even transiently mid-sweep
      all.filter(st => st.isFile && versionRe.matches(st.getPath.getName))
        .sortBy(st => versionOf(st.getPath))
        .foreach { st =>
          if (versionOf(st.getPath) <= latest - keepVersions &&
              st.getModificationTime < horizon)
            fs.delete(st.getPath, false)
        }
      // committers killed between temp write and link/rename leave
      // .tmp- orphans no one else sweeps (the manifest tier's expire
      // handles its own); the grace window far exceeds any in-flight
      // few-KB write
      all.foreach { st =>
        if (st.isFile && st.getPath.getName.startsWith(".tmp-") &&
            st.getModificationTime < horizon)
          fs.delete(st.getPath, false)
      }
    } catch { case _: java.io.FileNotFoundException => () }
  }
}

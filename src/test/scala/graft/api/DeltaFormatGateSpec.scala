package graft.api

import org.apache.hadoop.fs.Path
import graft.SparkSuite
import graft.catalog.CasStateStore

/** The shared catalog's delta-format compatibility gate
  * ([[LogServer.deltaFormatCadence]]): delta records are only written
  * to roots THIS binary generation initialized (or that an operator
  * explicitly migrated), because a pre-delta gateway parses only
  * full-snapshot records — the first delta landing in a mixed-version
  * fleet would read there as a torn frontier. */
class DeltaFormatGateSpec extends SparkSuite {

  private def fsOf(p: Path) =
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())

  test("a fresh root is claimed for delta commits; every later gateway honors the marker") {
    val dir = new Path(tempDir("delta-gate-fresh"), "catalog-cas")
    val fs = fsOf(dir)
    assert(LogServer.deltaFormatCadence(fs, dir) == 16)
    assert(fs.exists(new Path(dir, "format-delta-v1")),
      "initializing gateway did not claim the format marker")
    // a second (also-new) gateway mounting the same root
    assert(LogServer.deltaFormatCadence(fs, dir) == 16)
    // ...and the store actually commits a delta at a non-checkpoint slot
    val store = new CasStateStore(fs, dir, checkpointEvery = 16)
    assert(store.tryCommit(1L, """{"op":"noop"}""", isDelta = true))
  }

  test("a root initialized by a pre-delta binary keeps full-snapshot commits until the operator migrates") {
    val dir = new Path(tempDir("delta-gate-old"), "catalog-cas")
    val fs = fsOf(dir)
    // simulate the old binary: full-snapshot store, one committed state
    val old = new CasStateStore(fs, dir, checkpointEvery = 1)
    assert(old.tryCommit(1L, """{"state":"v1"}"""))
    assert(LogServer.deltaFormatCadence(fs, dir) == 1,
      "a pre-delta root must stay on full snapshots in a possibly-mixed fleet")
    assert(!fs.exists(new Path(dir, "format-delta-v1")),
      "the gate must not silently migrate a pre-delta root")
    // the operator migrates (fleet fully upgraded): touch the marker
    graft.storage.Cas.tryClaim(fs, new Path(dir, "format-delta-v1"),
      "delta-chain v1\n".getBytes("UTF-8"))
    assert(LogServer.deltaFormatCadence(fs, dir) == 16)
  }
}

package graft.ops

import java.sql.Timestamp
import java.time.Instant
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.model.LogSchema
import graft.storage.ManifestLog

/** Cache coherence on store mutation (round-12 verdict #2):
  * [[Tables.memoized]]'s contract assumes a key's data dir is immutable
  * for the life of a session; the row-level purge
  * ([[ManifestLog.rewriteExcluding]]) is the engine's first in-store
  * mutator and violates that. Proven here: a memoized derived relation
  * over a purged store is dropped by the purge and the next read in
  * the SAME session re-derives without the purged rows; entries over
  * unrelated dirs survive; entries over a PARENT dir (which can
  * transitively derive from the store) are invalidated too. */
class MemoInvalidationSpec extends SparkSuite {

  private def batch(rows: (String, String, String)*): DataFrame =
    spark.createDataFrame(
      rows.map { case (ts, lvl, msg) =>
        Row(Timestamp.from(Instant.parse(ts)), lvl, msg)
      }.asJava,
      LogSchema.fileSchema)

  test("purge drops the memo entry: a same-session re-query no longer serves purged rows") {
    val root = tempDir("memo-purge")
    val log = new ManifestLog(spark, root)
    log.append(batch(("2024-01-01T10:00:00Z", "error", "secret"),
                     ("2024-01-01T10:01:00Z", "info", "keep")), "c", "s")
    var builds = 0
    def levels(): Seq[String] = {
      val rel = Tables.memoized("spec_memo_purge", spark, root) {
        builds += 1
        log.read("c", "s").select(col("level")).distinct()
      }
      rel.collect().map(_.getString(0)).toSeq.sorted
    }
    assert(levels() == Seq("error", "info"))
    assert(builds == 1)
    // genuinely memoized: the second call serves the checkpoint
    assert(levels() == Seq("error", "info"))
    assert(builds == 1)
    // the purge mutates the store under the memo — without
    // invalidation this session would keep serving "error" forever
    assert(log.rewriteExcluding("c", "s", col("level") === "error") == 1L)
    assert(levels() == Seq("info"),
      "memoized relation served purged rows after rewriteExcluding")
    assert(builds == 2, "purge did not drop the memo entry")
  }

  test("unrelated dirs survive the purge; parent-dir entries are invalidated") {
    val root = tempDir("memo-purge")
    val other = tempDir("memo-other")
    val log = new ManifestLog(spark, root)
    log.append(batch(("2024-01-01T10:00:00Z", "error", "x")), "c", "s")
    var parentBuilds = 0
    var otherBuilds = 0
    // a relation memoized over the PARENT dir can transitively derive
    // from the store below it — conservative overlap invalidates it
    val parent = new java.io.File(root).getParent
    def buildParent() = Tables.memoized("spec_memo_parent", spark, parent) {
      parentBuilds += 1; log.read("c", "s").select(col("level"))
    }
    def buildOther() = Tables.memoized("spec_memo_other", spark, other) {
      otherBuilds += 1; spark.range(3).toDF("n")
    }
    buildParent(); buildOther()
    assert(parentBuilds == 1 && otherBuilds == 1)
    assert(log.rewriteExcluding("c", "s", col("level") === "error") == 1L)
    buildOther()
    assert(otherBuilds == 1, "purge invalidated a memo over an unrelated dir")
    buildParent()
    assert(parentBuilds == 2, "purge did not invalidate a parent-dir memo entry")
    Tables.invalidateDir(other) // teardown: don't leak into other suites
    Tables.invalidateDir(parent)
  }
}

package graft.engine

import java.time.Instant
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.storage.LogStore

/** Reference-parity read path (SURVEY §2.2, §2.4, §3 entry point 1).
  *
  * Filters are conjunctive (col, op, value) triples — the reference's
  * entire predicate algebra (reader.py:30-59). Deviation (SURVEY §7.4.4):
  * unknown operators are REJECTED, not silently skipped. Time-range
  * bounds are both inclusive (reader.py:457-473). Catalyst pushes the
  * resulting predicates into the parquet scan (row-group stats) and
  * prunes (container, session) directories — the SQLite catalog's job
  * in the reference (metadata.py:44-53), free here.
  */
final class QueryEngine(store: LogStore) {

  /** Supported pushdown operators (reader.py:39-59). */
  private val ops: Map[String, (Column, Any) => Column] = Map(
    "==" -> ((c, v) => c === v), "=" -> ((c, v) => c === v),
    "!=" -> ((c, v) => c =!= v),
    ">=" -> ((c, v) => c >= v), "<=" -> ((c, v) => c <= v),
    ">"  -> ((c, v) => c > v),  "<"  -> ((c, v) => c < v))

  private def toCol(f: (String, String, Any)): Column = f match {
    case (name, op, v) =>
      val fn = ops.getOrElse(op,
        throw new IllegalArgumentException(s"unsupported filter operator: $op"))
      val value = v match {
        case i: Instant => java.sql.Timestamp.from(i)
        case other => other
      }
      fn(col(name), value)
  }

  /** Filtered read over both tiers; AND-only conjunction. */
  def readLogs(container: String, session: String,
               start: Option[Instant] = None, end: Option[Instant] = None,
               filters: Seq[(String, String, Any)] = Seq.empty): DataFrame = {
    val base = store.read(container, session)
    val timeFilters =
      start.map(ts => col("timestamp") >= java.sql.Timestamp.from(ts)).toSeq ++
      end.map(ts => col("timestamp") <= java.sql.Timestamp.from(ts)).toSeq
    val predicates = timeFilters ++ filters.map(toCol)
    predicates.foldLeft(base)(_ filter _)
  }

  /** Filtered count (A1-A3: reader.py:181-206, 348-386, 548-558). */
  def count(container: String, session: String,
            start: Option[Instant] = None, end: Option[Instant] = None,
            filters: Seq[(String, String, Any)] = Seq.empty): Long =
    readLogs(container, session, start, end, filters).count()

  /** Summary (A4-A6): total_rows is UNFILTERED by design — the
    * reference's get_summary scans with no filter (reader.py:227-231) —
    * while file/byte counts come from the file index, not a scan. */
  def summary(container: String, session: String): LogSummary = {
    val (coldFiles, coldBytes, hotFiles, hotBytes) = store.tierStats(container, session)
    val totalRows = store.read(container, session).count()
    LogSummary(
      filesScanned = coldFiles + hotFiles,
      totalRows = totalRows,
      totalSizeBytes = coldBytes + hotBytes,
      archiveFiles = coldFiles,
      bufferFiles = hotFiles)
  }
}

final case class LogSummary(filesScanned: Long, totalRows: Long,
                            totalSizeBytes: Long, archiveFiles: Long,
                            bufferFiles: Long)

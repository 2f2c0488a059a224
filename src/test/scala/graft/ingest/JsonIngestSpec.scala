package graft.ingest

import java.time.Instant
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.JsonIngest.IngestValidationException

/** The reference's ingest validation contract (writer.py:23-93): required
  * keys, ISO-8601-with-Z timestamp cast, all-or-nothing batches, and
  * first-row diagnostics on failure. */
class JsonIngestSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def json(s: String) = mapper.readTree(s)

  test("valid batch parses: Z suffix, explicit offset, naive UTC, space separator") {
    val rows = JsonIngest.toRows(json(
      """[{"timestamp":"2025-11-30T10:00:00Z","level":"INFO","message":"a"},
         |{"timestamp":"2025-11-30T11:00:00+01:00","level":"WARN","message":"b"},
         |{"timestamp":"2025-11-30T12:00:00.123456","level":"ERROR","message":"c"},
         |{"timestamp":"2025-11-30 13:00:00","level":"INFO","message":"d"}]""".stripMargin))
    assert(rows.map(_.getTimestamp(0).toInstant) === Seq(
      Instant.parse("2025-11-30T10:00:00Z"),
      Instant.parse("2025-11-30T10:00:00Z"), // +01:00 normalizes back an hour
      Instant.parse("2025-11-30T12:00:00.123456Z"),
      Instant.parse("2025-11-30T13:00:00Z")))
    assert(rows.map(_.getString(1)) === Seq("INFO", "WARN", "ERROR", "INFO"))
  }

  test("bare dates parse as midnight UTC (Python fromisoformat parity, shared with start_ts)") {
    val rows = JsonIngest.toRows(json(
      """[{"timestamp":"2025-11-30","level":"INFO","message":"d"}]"""))
    assert(rows.head.getTimestamp(0).toInstant === Instant.parse("2025-11-30T00:00:00Z"))
    assert(JsonIngest.parseIsoFlexible("2024-01-01") === Instant.parse("2024-01-01T00:00:00Z"))
    intercept[IllegalArgumentException] { JsonIngest.parseIsoFlexible("not-a-time") }
  }

  test("integral timestamps are epoch microseconds (Arrow int64 cast semantics)") {
    val rows = JsonIngest.toRows(json(
      """[{"timestamp":1733000000000000,"level":"INFO","message":"x"}]"""))
    assert(rows.head.getTimestamp(0).toInstant === Instant.ofEpochSecond(1733000000L))
  }

  test("non-array logs → '\"logs\" must be an array'") {
    val e = intercept[IngestValidationException](JsonIngest.toRows(json(""""nope"""")))
    assert(e.getMessage === "\"logs\" must be an array")
  }

  test("empty array → cannot be empty") {
    val e = intercept[IngestValidationException](JsonIngest.toRows(json("[]")))
    assert(e.getMessage === "\"logs\" array cannot be empty")
  }

  test("non-object entry → all entries must be dictionaries") {
    val e = intercept[IngestValidationException](
      JsonIngest.toRows(json("""[{"timestamp":"2025-01-01T00:00:00Z","level":"I","message":"m"}, 42]""")))
    assert(e.getMessage === "All log entries must be dictionaries")
  }

  test("missing field is named in the error") {
    val e = intercept[IngestValidationException](
      JsonIngest.toRows(json("""[{"timestamp":"2025-01-01T00:00:00Z","message":"m"}]""")))
    assert(e.getMessage === "Missing required field 'level' in at least one log entry")
  }

  test("bad timestamp fails the whole batch with first-row diagnostics") {
    val e = intercept[IngestValidationException](
      JsonIngest.toRows(json(
        """[{"timestamp":"2025-01-01T00:00:00Z","level":"I","message":"first"},
           |{"timestamp":"not-a-time","level":"I","message":"second"}]""".stripMargin)))
    assert(e.getMessage.contains("Invalid ISO-8601 timestamp: 'not-a-time'"))
    assert(e.getMessage.contains("Sample data (first log entry)"))
    assert(e.getMessage.contains("\"first\"")) // diagnostics show row 0, like writer.py:85-89
  }

  test("non-string level rejected") {
    val e = intercept[IngestValidationException](
      JsonIngest.toRows(json("""[{"timestamp":"2025-01-01T00:00:00Z","level":5,"message":"m"}]""")))
    assert(e.getMessage.contains("'level' must be a string"))
  }
}

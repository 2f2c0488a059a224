package graft.streaming

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import graft.SparkSuite

/** Event-time windowed aggregation with watermarks (SURVEY §2.8 T7
  * superset — absent in the reference): tumbling windows in append mode
  * only emit once the watermark passes their end, and the watermark
  * persists in the checkpoint across stream restarts. */
class StreamingWindowSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("ts", StringType), StructField("user", StringType),
    StructField("value", DoubleType)))

  test("tumbling window + watermark: windows finalize exactly once as event time advances") {
    val in = tempDir("win-in")
    val ckpt = tempDir("win-ckpt")
    val out = mutable.Buffer.empty[(String, Long, Double)]

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(in)
        .withColumn("ts", to_timestamp(col("ts")))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .writeStream
        .outputMode("append") // emit only finalized windows
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            out.synchronized {
              out += ((r.getStruct(0).getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
            }
          }
          ()
        }
        .start()
      q.awaitTermination(120000)
    }

    def drop(name: String, lines: String*): Unit =
      Files.write(Paths.get(in, name), String.join("\n", lines: _*).getBytes)

    // hour-10 and hour-11 events. AvailableNow runs a final flush batch
    // after the watermark advances to 11:10 (= 11:20 max - 10 min), so
    // the hour-10 window (ends 11:00 ≤ watermark) finalizes in THIS run;
    // hour-11 stays open.
    drop("b1.json",
      """{"ts":"2025-01-01T10:05:00Z","user":"u1","value":1.0}""",
      """{"ts":"2025-01-01T10:45:00Z","user":"u2","value":2.0}""",
      """{"ts":"2025-01-01T11:20:00Z","user":"u1","value":4.0}""")
    runOnce()
    assert(out.toList === List(("2025-01-01 10:00:00.0", 2L, 3.0)))

    // restart from the checkpoint (watermark persisted): event at 13:00
    // advances the watermark to 12:50 → hour-11 finalizes, exactly once
    drop("b2.json", """{"ts":"2025-01-01T13:00:00Z","user":"u3","value":8.0}""")
    runOnce()
    assert(out.sorted.toList === List(
      ("2025-01-01 10:00:00.0", 2L, 3.0),
      ("2025-01-01 11:00:00.0", 1L, 4.0)))

    // event at 15:00 → watermark 14:50 → hour-13 finalizes
    drop("b3.json", """{"ts":"2025-01-01T15:00:00Z","user":"u3","value":16.0}""")
    runOnce()
    assert(out.sorted.toList === List(
      ("2025-01-01 10:00:00.0", 2L, 3.0),
      ("2025-01-01 11:00:00.0", 1L, 4.0),
      ("2025-01-01 13:00:00.0", 1L, 8.0)))
  }

  test("session_window aggregation groups by activity gaps") {
    val in = tempDir("sess-in")
    val ckpt = tempDir("sess-ckpt")
    val out = mutable.Buffer.empty[(String, Long)]

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(in)
        .withColumn("ts", to_timestamp(col("ts")))
        .withWatermark("ts", "5 minutes")
        .groupBy(col("user"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(r => out.synchronized { out += ((r.getString(0), r.getLong(2))) })
          ()
        }
        .start()
      q.awaitTermination(120000)
    }

    // u1: two events 10 min apart (one session), then a 2-hour gap (new session)
    Files.write(Paths.get(in, "s1.json"), String.join("\n",
      """{"ts":"2025-01-01T10:00:00Z","user":"u1","value":1.0}""",
      """{"ts":"2025-01-01T10:10:00Z","user":"u1","value":1.0}""",
      """{"ts":"2025-01-01T12:10:00Z","user":"u1","value":1.0}""").getBytes)
    runOnce()
    // close everything out with a far-future event
    Files.write(Paths.get(in, "s2.json"),
      """{"ts":"2025-01-01T20:00:00Z","user":"u2","value":1.0}""".getBytes)
    runOnce()

    assert(out.sorted.toList === List(("u1", 1L), ("u1", 2L)))
  }
}

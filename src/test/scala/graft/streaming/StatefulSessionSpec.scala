package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import graft.SparkSuite

object StatefulSessionSpec {
  final case class Ev(user: String, ts: Timestamp, value: Double)
  final case class SessState(start: Long, last: Long, n: Int, total: Double)
  final case class SessOut(user: String, n: Int, total: Double)

  private val gapMs = 30L * 60 * 1000

  /** Explicit session state machine: accumulate events per user; when the
    * event-time timeout fires (watermark passed last-event + gap), emit
    * the closed session and clear state. */
  def track(user: String, events: Iterator[Ev],
            state: GroupState[SessState]): Iterator[SessOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(SessOut(user, s.n, s.total))
    } else {
      val st0 = state.getOption.getOrElse(SessState(0L, 0L, 0, 0.0))
      val st = events.foldLeft(st0) { (acc, e) =>
        SessState(if (acc.n == 0) e.ts.getTime else acc.start,
          math.max(acc.last, e.ts.getTime), acc.n + 1, acc.total + e.value)
      }
      state.update(st)
      state.setTimeoutTimestamp(st.last + gapMs)
      Iterator.empty
    }
  }
}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.8 —
  * the builder-prompt's KeyValueGroupedDataset state surface): per-user
  * session tracking with an event-time timeout, closed sessions emitted
  * exactly once across checkpointed restarts. */
class StatefulSessionSpec extends SparkSuite {
  import StatefulSessionSpec._

  private val schema = StructType(Seq(
    StructField("ts", StringType), StructField("user", StringType),
    StructField("value", DoubleType)))

  test("flatMapGroupsWithState closes sessions on event-time timeout, exactly once") {
    val in = tempDir("state-in")
    val ckpt = tempDir("state-ckpt")
    val out = mutable.Buffer.empty[(String, Int, Double)]
    val sp = spark; import sp.implicits._

    def runOnce(): Unit = {
      val evs: Dataset[Ev] = spark.readStream.schema(schema).json(in)
        .withColumn("ts", to_timestamp(col("ts")))
        .withWatermark("ts", "10 minutes")
        .as[Ev]
      val q = evs.groupByKey(_.user)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(track)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[SessOut], _: Long) =>
          batch.collect().foreach(s =>
            out.synchronized { out += ((s.user, s.n, s.total)) })
          ()
        }
        .start()
      q.awaitTermination(120000)
    }

    // u1: two events 10 min apart — one session; u2: one event
    Files.write(Paths.get(in, "b1.json"), String.join("\n",
      """{"ts":"2025-01-01T10:00:00Z","user":"u1","value":1.0}""",
      """{"ts":"2025-01-01T10:10:00Z","user":"u1","value":2.0}""",
      """{"ts":"2025-01-01T10:20:00Z","user":"u2","value":5.0}""").getBytes)
    runOnce()
    assert(out.isEmpty) // watermark (10:10) hasn't passed any session's gap

    // a far event pushes the watermark past both sessions' last+30min
    Files.write(Paths.get(in, "b2.json"),
      """{"ts":"2025-01-01T13:00:00Z","user":"u3","value":0.5}""".getBytes)
    runOnce()
    assert(out.sorted.toList === List(("u1", 2, 3.0), ("u2", 1, 5.0)))

    // replaying with no new input emits nothing (state already cleared)
    runOnce()
    assert(out.size === 2)
  }
}

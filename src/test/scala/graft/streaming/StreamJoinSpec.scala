package graft.streaming

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import graft.SparkSuite

/** Stream-stream interval join (SURVEY §2.8 superset): purchases join
  * errors by the same user within a bounded event-time interval. Both
  * sides carry watermarks, so Spark bounds the join state — the pattern
  * that keeps a 100 TB/day dual-stream correlation from accumulating
  * unbounded state. */
class StreamJoinSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("ts", StringType), StructField("user", StringType),
    StructField("value", DoubleType)))

  test("purchases correlate with errors from the same user within 30 minutes") {
    val pDir = tempDir("sj-purch")
    val eDir = tempDir("sj-err")
    val ckpt = tempDir("sj-ckpt")
    val out = mutable.Buffer.empty[(String, String, String)]

    def runOnce(): Unit = {
      val purchases = spark.readStream.schema(schema).json(pDir)
        .select(to_timestamp(col("ts")).as("p_ts"), col("user"), col("value"))
        .withWatermark("p_ts", "10 minutes")
      val errors = spark.readStream.schema(schema).json(eDir)
        .select(to_timestamp(col("ts")).as("e_ts"), col("user").as("e_user"))
        .withWatermark("e_ts", "10 minutes")
      val q = purchases.join(errors,
          col("user") === col("e_user") &&
          col("e_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("e_ts") <= col("p_ts"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(r => out.synchronized {
            out += ((r.getAs[String]("user"),
                     r.getAs[java.sql.Timestamp]("p_ts").toString,
                     r.getAs[java.sql.Timestamp]("e_ts").toString))
          })
          ()
        }
        .start()
      q.awaitTermination(120000)
    }

    Files.write(Paths.get(pDir, "p1.json"), String.join("\n",
      """{"ts":"2025-01-01T10:30:00Z","user":"u1","value":9.0}""",
      """{"ts":"2025-01-01T12:00:00Z","user":"u2","value":5.0}""").getBytes)
    Files.write(Paths.get(eDir, "e1.json"), String.join("\n",
      """{"ts":"2025-01-01T10:10:00Z","user":"u1","value":0.0}""",
      """{"ts":"2025-01-01T10:20:00Z","user":"u1","value":0.0}""",
      """{"ts":"2025-01-01T11:45:00Z","user":"u3","value":0.0}""").getBytes)
    runOnce()
    // u1's purchase at 10:30 matches both prior errors within 30 min;
    // u2 has no errors; u3's error matches no purchase
    assert(out.sorted.toList === List(
      ("u1", "2025-01-01 10:30:00.0", "2025-01-01 10:10:00.0"),
      ("u1", "2025-01-01 10:30:00.0", "2025-01-01 10:20:00.0")))
  }
}

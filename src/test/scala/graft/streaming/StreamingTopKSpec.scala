package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.SparkSuite

/** The bounded top-k aggregate ([[graft.functions.TopKPairs]]) inside a
  * STREAMING aggregation: between micro-batches the aggregation state
  * store holds the SERIALIZED buffer, and a stream restart from the
  * checkpoint must deserialize it and keep ranking — the wire format is
  * not just a shuffle detail, it is durable state. Complete mode keeps
  * the running per-group top-k live across batches. */
class StreamingTopKSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("container", StringType),
    StructField("score", DoubleType),
    StructField("item", LongType)))

  test("streaming graft_topk keeps the running top-2 across micro-batches and restarts") {
    graft.functions.TopKPairs.register(spark)
    val in = tempDir("topk-in")
    val ckpt = tempDir("topk-ckpt")
    @volatile var snapshot: Map[String, Seq[(Double, Long)]] = Map.empty

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(in)
        .groupBy(col("container"))
        .agg(expr("graft_topk(score, item, 2)").as("top"))
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = batch.selectExpr("container", "inline(top)").collect()
          snapshot = rows.groupBy(_.getString(0)).view.mapValues(
            _.map(r => (r.getDouble(1), r.getLong(2))).toSeq).toMap
          ()
        }
        .start()
      val finished = q.awaitTermination(120000)
      if (!finished) q.stop() // don't leak a hung query into later suites
      assert(finished, "streaming top-k query timed out after 120 s")
    }

    def drop(name: String, lines: String*): Unit =
      Files.write(Paths.get(in, name), String.join("\n", lines: _*).getBytes)

    drop("b1.json",
      """{"container":"c1","score":1.0,"item":1}""",
      """{"container":"c1","score":3.0,"item":3}""",
      """{"container":"c1","score":2.0,"item":2}""",
      """{"container":"c2","score":9.0,"item":7}""")
    runOnce()
    assert(snapshot("c1") === Seq((3.0, 3L), (2.0, 2L)))
    assert(snapshot("c2") === Seq((9.0, 7L)))

    // a RESTARTED query (fresh stream, same checkpoint) must restore the
    // serialized buffers and merge new rows into the surviving top-2
    drop("b2.json",
      """{"container":"c1","score":5.0,"item":5}""",
      """{"container":"c1","score":0.5,"item":9}""",
      """{"container":"c2","score":9.0,"item":4}""")
    runOnce()
    assert(snapshot("c1") === Seq((5.0, 5L), (3.0, 3L)),
      "state from batch 1 must survive the restart and keep ranking")
    assert(snapshot("c2") === Seq((9.0, 4L), (9.0, 7L)),
      "score tie must break by payload ascending, merging old and new state")
  }
}

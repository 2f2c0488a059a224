package graft.streaming

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.SparkSuite

/** Stream-static enrichment join (SURVEY §2.8 superset): each
  * micro-batch joins against a STATIC dimension (user → tier), the
  * streaming counterpart of the batch broadcast-dimension star join.
  * The static side is broadcast per micro-batch — stateless, no
  * watermark, no stream-stream buffering; at 100 TB of stream this is
  * the only join shape that needs zero state store. */
class StreamStaticJoinSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("user", StringType), StructField("action", StringType)))

  test("micro-batches enrich against a broadcast static dimension") {
    val in = tempDir("ss-in")
    val ckpt = tempDir("ss-ckpt")
    val out = mutable.Buffer.empty[(String, String, String)]

    import scala.jdk.CollectionConverters._
    val dim = spark.createDataFrame(
      Seq(("alice", "gold"), ("bob", "basic")).map(t => org.apache.spark.sql.Row(t._1, t._2)).asJava,
      StructType(Seq(StructField("user", StringType), StructField("tier", StringType))))

    val q = spark.readStream.schema(schema).json(in)
      .join(broadcast(dim), Seq("user"), "left")
      .withColumn("tier", coalesce(col("tier"), lit("unknown")))
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          out.synchronized { out += ((r.getString(0), r.getString(1), r.getString(2))) }
        }
        ()
      }

    Files.write(Paths.get(in, "b1.json"), String.join("\n",
      """{"user":"alice","action":"login"}""",
      """{"user":"carol","action":"login"}""").getBytes)
    val s1 = q.start(); s1.awaitTermination(120000)

    assert(out.synchronized(out.toSet) === Set(
      ("alice", "login", "gold"),
      ("carol", "login", "unknown")), "dimension hit enriched, miss defaulted")
  }
}

package graft.streaming

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import graft.SparkSuite

/** Arbitrary stateful processing v2 (Spark 4 `transformWithState`,
  * SURVEY §2.8 superset): a per-key running total kept in typed
  * `ValueState` on the RocksDB state store — the successor API to
  * flatMapGroupsWithState (`StatefulSessionSpec`), with explicitly
  * declared state variables instead of one opaque state object. State
  * persists in the checkpoint across separate stream runs. */
/** Top-level (not an inner class): the processor ships to executors and
  * must not capture the test suite. */
class RunningTotalProcessor
    extends StatefulProcessor[String, (String, Double), (String, Double)] {
  @transient private var total: ValueState[Double] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Double]("total", Encoders.scalaDouble, TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Double)],
                               tv: TimerValues): Iterator[(String, Double)] = {
    val sum = rows.map(_._2).sum + (if (total.exists()) total.get() else 0.0)
    total.update(sum)
    Iterator((key, sum))
  }
}

class TransformWithStateSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("user", StringType), StructField("value", DoubleType)))

  test("transformWithState keeps a per-key running total across restarted runs") {
    val in = tempDir("tws-in")
    val ckpt = tempDir("tws-ckpt")
    val out = mutable.Buffer.empty[(String, Double)]
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val sp = spark; import sp.implicits._
        val q = spark.readStream.schema(schema).json(in)
          .as[(String, Double)]
          .groupByKey(_._1)
          .transformWithState(new RunningTotalProcessor, TimeMode.None(), OutputMode.Update())
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Double)], _: Long) =>
            batch.collect().foreach(r => out.synchronized { out += r })
            ()
          }
          .start()
        q.awaitTermination(120000)
      }
      Files.write(Paths.get(in, "b1.json"), String.join("\n",
        """{"user":"alice","value":1.0}""",
        """{"user":"alice","value":2.0}""",
        """{"user":"bob","value":10.0}""").getBytes)
      runOnce()
      // second, separate run: state must come back from the checkpoint
      Files.write(Paths.get(in, "b2.json"),
        """{"user":"alice","value":4.0}""".getBytes)
      runOnce()
      val finalByUser = out.synchronized(out.groupBy(_._1).map {
        case (k, vs) => k -> vs.last._2
      })
      assert(finalByUser === Map("alice" -> 7.0, "bob" -> 10.0))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

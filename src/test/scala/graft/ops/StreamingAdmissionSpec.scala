package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkSuite

/** STREAMING admission gate (round-13): micro-batches of documents
  * probing the FROZEN persisted assets inside `foreachBatch` — the
  * arrival-time shape of `pipe_curation_admit`'s rule. Each drained
  * batch then appends its digests to the admission digest index
  * ([[IndexTables.appendToAdmissionDigests]]), so a later batch gates
  * against everything already accepted: the CROSS-batch exact dup the
  * per-batch keeper window cannot see. Runs on a crafted fixture
  * corpus (its own dir tag → its own tables). */
class StreamingAdmissionSpec extends SparkSuite {

  private val inSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  private def words(prefix: String): Seq[String] =
    (1 to 30).map {
      case 5 => "the"
      case 20 => "the"
      case i => f"$prefix${i}%02dxx".take(5)
    }
  private def text(prefix: String): String = words(prefix).mkString(" ")

  test("micro-batches gate against the frozen base AND against previously admitted batches") {
    val standing = text("s")
    val vText = text("v")
    val vNear = (words("v").dropRight(1) :+ "zzzzz").mkString(" ")
    val wText = text("w")
    // base corpus 0..36 (doc 5 = standing, doc 6 = vText); thr = 36
    val base = (0 to 36).map {
      case 5 => (5L, standing, "en", "web", standing.length.toLong)
      case 6 => (6L, vText, "en", "web", vText.length.toLong)
      case i =>
        val t = text(f"f$i%02d"); (i.toLong, t, "en", "web", t.length.toLong)
    }
    val fix = tempDir("stream-admit")
    spark.createDataFrame(base).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$fix/documents.parquet")
    val thr = 36L
    Pipeline.ensureAdmissionAssets(spark, fix, thr)

    val in = tempDir("stream-admit-in")
    val ckpt = tempDir("stream-admit-ckpt")
    val decDir = tempDir("stream-admit-dec")
    val decisions = scala.collection.mutable.Map.empty[Long, String]
    // THE documented probe-then-append foreachBatch body, replay-safe
    // (round-13 advice): decisions COMMIT keyed by batch id BEFORE the
    // digest append — the streaming analog of admitRun's tagged A1
    // order. Under at-least-once redelivery (crash between the append
    // and the sink's checkpoint commit) the redelivered batch finds its
    // committed decision artifact and replays it instead of re-probing
    // against its own digests, which would flip every 'keep' to
    // 'exact_dup'. Only ADMITTED (keep) digests grow the gate, matching
    // admitRun's stage doc.
    def admitBatch(batch: DataFrame, batchId: Long): Unit = {
      if (batch.isEmpty) return
      val marker = java.nio.file.Paths.get(decDir, s"batch-$batchId.tsv")
      if (!java.nio.file.Files.exists(marker)) {
        val rows = Pipeline.admissionFrozenOf(spark, fix, thr, batch).collect()
          .map(r => s"${r.getLong(0)}\t${r.getString(2)}")
        val tmp = java.nio.file.Paths.get(decDir, s".batch-$batchId.tmp")
        java.nio.file.Files.write(tmp, rows.mkString("\n").getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, marker,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE) // the decision COMMIT
        val keepIds = rows.map(_.split("\t")).collect {
          case Array(id, "keep") => id.toLong
        }.toSeq
        IndexTables.appendToAdmissionDigests(spark, fix, thr,
          batch.filter(col("doc_id").isin(keepIds: _*)).select(col("text")))
      }
      // serve the COMMITTED artifact (first delivery and replays alike)
      java.nio.file.Files.readAllLines(marker).forEach { line =>
        val Array(id, dec) = line.split("\t")
        decisions(id.toLong) = dec
      }
    }
    def drain(): Unit = {
      val q = spark.readStream.schema(inSchema).json(in)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          admitBatch(batch, batchId)
        }
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive, "stream did not drain in time")
    }
    def jsonLine(id: Long, t: String): String =
      s"""{"doc_id":$id,"source":"web","text":"$t"}"""
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        rows.map { case (id, t) => jsonLine(id, t) }.mkString("\n").getBytes("UTF-8"))

    // batch 1: a base copy, a fresh doc, and its within-batch copy
    writeBatch("b1.json", Seq(40L -> standing, 41L -> wText, 42L -> wText))
    drain()
    // batch 2: a CROSS-batch copy of 41, a near-dup of base 6, a fresh doc
    writeBatch("b2.json", Seq(43L -> wText, 44L -> vNear, 45L -> text("q")))
    drain()

    assert(decisions(40L) == "exact_dup", "base copy not gated")
    assert(decisions(41L) == "keep", "fresh doc not admitted")
    assert(decisions(42L) == "exact_dup", "within-batch copy not gated by the keeper window")
    assert(decisions(43L) == "exact_dup",
      "CROSS-batch copy not gated — the digest-index append is not feeding later batches")
    assert(decisions(44L) == "near_dup", "near-dup of a base doc not gated")
    assert(decisions(45L) == "keep", "fresh doc in batch 2 not admitted")
    // replay safety: redelivering batch 2's digests appends nothing
    val redelivered = spark.createDataFrame(Seq(Tuple1(wText))).toDF("text")
    assert(IndexTables.appendToAdmissionDigests(spark, fix, thr, redelivered) == 0L,
      "a redelivered batch's digests re-appended")
    // AT-LEAST-ONCE REDELIVERY of a whole batch (crash between the
    // digest append and the checkpoint commit): the committed-decision
    // replay must hold every 'keep' — an unprotected re-probe would
    // find the batch's own digests and flip 45 to exact_dup
    val before = decisions.toMap
    val b2replay = spark.createDataFrame(
      Seq((43L, "web", wText), (44L, "web", vNear), (45L, "web", text("q"))))
      .toDF("doc_id", "source", "text")
    admitBatch(b2replay, 1L) // same batchId the sink assigned batch 2
    assert(decisions.toMap == before,
      s"redelivered batch flipped committed decisions: $before -> $decisions")
    assert(decisions(45L) == "keep",
      "replay flipped an admitted doc to exact_dup against its own digests")
  }
}

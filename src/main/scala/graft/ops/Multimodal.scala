package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (builder-prompt requirement): image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata.
  * The container has no media codecs, so the DECODE step is a
  * deliberate, clearly-marked deterministic stub — a pure function of
  * the payload bytes (md5-derived pseudo width/height/channels/format) —
  * while everything around it is the real production pattern:
  *
  *  - the payload is a true `BinaryType` column ([[blobs]]);
  *  - feature extraction runs as `mapPartitions` over a typed Dataset —
  *    the JVM analogue of `mapInPandas` — with the expensive
  *    decoder/model initialized ONCE PER PARTITION (the per-batch
  *    amortization that makes media decode viable at 100 TB), not per
  *    row;
  *  - frame sampling is declarative explode/stride arithmetic, so
  *    Catalyst parallelizes it like any other generator.
  *
  * The stub being a pure byte-function is what lets the DuckDB oracle
  * replay it exactly; a real decoder swaps into [[Multimodal.decodeStub]]
  * without touching the plumbing.
  */
object Multimodal {

  final case class BlobRow(doc_id: Long, blob: Array[Byte])
  final case class MmFeatures(doc_id: Long, n_bytes: Long, width: Long,
                              height: Long, channels: Long, fmt: String)

  /** documents.text's utf-8 bytes standing in for media payloads. */
  private[ops] def blobs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))

  /** THE STUB — replace with a real codec. Deterministic pseudo-decode:
    * metadata derived from the md5 of the payload, so the oracle can
    * derive identical values. `md` is the per-partition "decoder". */
  private def decodeStub(md: MessageDigest, docId: Long, blob: Array[Byte]): MmFeatures = {
    md.reset()
    val h = md.digest(blob).map("%02x".format(_)).mkString
    def hexVal(pos: Int): Long = // value of 2 hex digits at 1-based pos
      java.lang.Long.parseLong(h.substring(pos - 1, pos + 1), 16)
    MmFeatures(
      doc_id = docId,
      n_bytes = blob.length.toLong,
      width = 16 + hexVal(1),
      height = 16 + hexVal(3),
      channels = 1 + hexVal(5) % 3,
      fmt = (hexVal(7) % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" })
  }

  /** Feature extraction over binary payloads via mapPartitions: decoder
    * initialized once per partition, rows streamed through it. */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    blobs(s, dir).as[BlobRow]
      .mapPartitions { rows =>
        val decoder = MessageDigest.getInstance("MD5") // per-partition init
        rows.map(r => decodeStub(decoder, r.doc_id, r.blob))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Resize stub: nearest-neighbor downsampling IS stride subsampling,
    * so the stub subsamples the payload to `outPx` bytes at a uniform
    * stride and hashes the result — a pure byte function (oracle-
    * replayable) with the real resize's data-flow shape: one projection
    * over the scan, output size fixed at `outPx` regardless of input
    * size, no shuffle, no UDF. A real image resize swaps the transform
    * for a codec call inside [[decodeFeatures]]'s mapPartitions. */
  def resizeStub(s: SparkSession, dir: String, outPx: Int = 64): DataFrame =
    blobs(s, dir)
      .withColumn("hh", lower(hex(col("blob"))))
      .withColumn("n_bytes", length(col("blob")).cast("long"))
      .filter(col("n_bytes") >= outPx)
      .withColumn("stride", expr(s"CAST(n_bytes div $outPx AS INT)"))
      .withColumn("resized_md5", md5(expr(
        s"array_join(transform(sequence(0, ${outPx - 1}), i -> substring(hh, i * stride * 2 + 1, 2)), '')")))
      .select(col("doc_id"), col("n_bytes"), lit(outPx.toLong).as("out_px"),
              col("resized_md5"))
      .orderBy(col("doc_id"))

  /** Frame sampling: treat the payload as a sequence of 16-byte frames
    * and keep every 4th, emitting (doc_id, frame_no, frame hash). Pure
    * explode + stride arithmetic — the scan parallelizes per row group
    * and the generator never materializes unsampled frames. */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    blobs(s, dir)
      .withColumn("hh", lower(hex(col("blob"))))
      .withColumn("n_frames", expr("CAST(length(hh) div 32 AS BIGINT)")) // 16 bytes = 32 hex chars
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("hh"), col("n_frames"),
        explode(expr("sequence(0, CAST(n_frames - 1 AS INT), 4)")).as("frame_no"))
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        md5(expr("substring(hh, CAST(frame_no AS INT) * 32 + 1, 32)")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_no"))

  /** FRAME-level exact dedup across media payloads — the video-dedup
    * primitive (mirrored uploads share most frames even when container
    * metadata differs, so whole-file digests miss them): every 16-byte
    * frame hashes to md5, a frame is DUPLICATED when its hash occurs in
    * ≥2 distinct documents, and each document reports its duplicated-
    * frame fraction — near 1.0 flags a re-encoded copy, mid-range flags
    * shared intro/outro segments. The distinct-doc count (not raw
    * occurrences) keeps a frame looping within ONE video from
    * self-promoting, exactly like [[TextAnalysis.boilerplate]]'s DF
    * rule. Cost: one generator pass over the frames, one 32-byte-keyed
    * frequency aggregate bounded by distinct frames, one hash join back
    * — the shape that holds when frames outnumber documents 10⁴:1. */
  def frameDedup(s: SparkSession, dir: String): DataFrame = {
    val frames = blobs(s, dir)
      .withColumn("hh", lower(hex(col("blob"))))
      .withColumn("n_frames", expr("CAST(length(hh) div 32 AS BIGINT)"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("hh"), col("n_frames"),
        explode(expr("sequence(0, CAST(n_frames - 1 AS INT))")).as("i"))
      .select(col("doc_id"),
        md5(expr("substring(hh, CAST(i AS INT) * 32 + 1, 32)")).as("fm"))
    val dfreq = frames.distinct()
      .groupBy(col("fm")).agg(count(lit(1)).as("df"))
    frames.join(dfreq, Seq("fm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
           sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_frames"))
      .withColumn("dup_ratio",
        Tables.trunc6(col("n_dup_frames").cast("double") / col("n_frames")))
      .orderBy(col("doc_id"))
  }

  /** PERCEPTUAL-hash near-dup over "decoded" images — the image-dedup
    * primitive whole-file digests and frame hashing both miss (a
    * re-encoded or slightly-edited image shares almost no bytes but
    * nearly all perceptual structure). A 64-bit AVERAGE HASH (aHash,
    * the classic pHash-family recipe): 64 grayscale samples at uniform
    * stride over the payload (the decode stub — sample = byte value; a
    * real decoder swaps a luma plane in without touching anything
    * downstream), bit j set iff sample j is above the document mean —
    * then the SAME pigeonhole chunk blocking + exact `bit_count(xor)`
    * verify the text SimHash family uses ([[graft.ops.Dedup]]), whose
    * exactness is already ScalaCheck-proven. Integer-exact throughout:
    * the threshold compares `px·64 > Σpx`, never a float mean, so the
    * oracle replays every bit; bit 63 rides the shared signed-64
    * convention (Spark `1L << 63` = DuckDB's HUGEINT-routed min-BIGINT).
    * At 100 TB this is one scan-rate projection per payload plus the
    * blocked join — candidates track true perceptual-dup density. */
  def phashNearDup(s: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    // The signature relation is MATERIALIZED (memoized localCheckpoint)
    // before the blocked self-join — not just for reuse: without the
    // cut, the join's null-intolerance inference pushes an
    // isnotnull(<whole aHash expression>) filter into BOTH scan sides,
    // and because Catalyst inlines the HOF lambdas, that filter
    // re-derives hex(blob) inside every one of the 64×64 lambda
    // evaluations — measured 468 s at sf0.1 vs ~1 s materialized.
    // (The text SimHash family dodges this because graft_simhash is a
    // single native expression, not a nested HOF tree.)
    val ph = Tables.memoized("phash64", s, dir) { phashSignatures(s, dir) }
    Dedup.hammingPairsFrom(ph, maxDist)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The 64-bit average-hash projection itself (see [[phashNearDup]]). */
  private def phashSignatures(s: SparkSession, dir: String): DataFrame = {
    blobs(s, dir)
      .withColumn("hh", lower(hex(col("blob"))))
      .withColumn("nb", length(col("blob")).cast("long"))
      .filter(col("nb") >= 64)
      .withColumn("stride", expr("nb div 64"))
      .withColumn("px", expr(
        "transform(sequence(0, 63), i -> CAST(conv(substring(hh, CAST(i * stride AS INT) * 2 + 1, 2), 16, 10) AS BIGINT))"))
      .withColumn("sum_px", expr("aggregate(px, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
          |  (a, j) -> a + IF(px[CAST(j AS INT)] * 64 > sum_px,
          |                   shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)),
          |                   CAST(0 AS BIGINT)))""".stripMargin))
      .select(col("doc_id"), col("simhash"))
  }

  /** Audio-feature shape: treat the payload as 8-byte frames, compute an
    * integer per-frame energy (sum of unsigned byte values), and report
    * the per-document energy profile — frame count, mean (integer-
    * floored), max, and peak count (frames above 2× the mean), i.e. the
    * onset-detection summary an audio curation pass stores. Frame energy
    * is a pure fold over hex pairs (one projection, codegen'd); the
    * per-doc mean needs one window over the doc's frames — at 100 TB the
    * window partitions by doc_id, which is how the frames already
    * co-locate after the generator. All arithmetic is INTEGER, so the
    * profile replays exactly on any engine. */
  def audioEnergy(s: SparkSession, dir: String): DataFrame = {
    val frames = blobs(s, dir)
      .withColumn("hh", lower(hex(col("blob"))))
      .withColumn("n_frames", expr("CAST(length(hh) div 16 AS BIGINT)")) // 8 bytes = 16 hex chars
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("hh"), col("n_frames"),
        explode(expr("sequence(0, CAST(n_frames - 1 AS INT))")).as("i"))
      .withColumn("e", expr(
        """aggregate(
          |  transform(sequence(0, 7),
          |    j -> CAST(conv(substring(hh, (CAST(i AS INT) * 8 + j) * 2 + 1, 2), 16, 10) AS BIGINT)),
          |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin))
    frames
      .withColumn("mean_e", expr(
        "sum(e) OVER (PARTITION BY doc_id) div count(e) OVER (PARTITION BY doc_id)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
           min(col("mean_e")).as("mean_energy"),
           max(col("e")).as("max_energy"),
           sum(when(col("e") > lit(2) * col("mean_e"), 1L).otherwise(0L)).as("n_peaks"))
      .orderBy(col("doc_id"))
  }
}

package graft.ops

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import graft.SparkSuite

/** The real decode path behind the multimodal operators: constructed
  * PPM/BMP images with KNOWN pixels decode to the known luma plane,
  * known aHash, and known metadata, while non-image bytes keep the
  * deterministic fallback the driver oracle replays (pinned here by
  * running both kinds through the same operator cores). */
class MediaCodecSpec extends SparkSuite {

  /** P6 PPM with the given row-major RGB pixels. */
  private def ppm(w: Int, h: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(px.length == w * h)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ px.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }
  }

  /** 24-bit bottom-up BMP with the given row-major RGB pixels. */
  private def bmp(w: Int, h: Int, px: Seq[(Int, Int, Int)]): Array[Byte] = {
    require(px.length == w * h)
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up rows, BGR, padded to 4 bytes
    for (y <- (h - 1) to 0 by -1) {
      for (x <- 0 until w) {
        val (r, g, bl) = px(y * w + x)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
      }
      for (_ <- 0 until stride - w * 3) b.put(0.toByte)
    }
    b.array()
  }

  test("PPM decodes to the exact integer luma plane") {
    // 2×2: red, green / blue, white — BT.601 integer luma
    val img = MediaCodec.decode(ppm(2, 2, Seq(
      (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)))).get
    assert(img.width == 2 && img.height == 2 && img.channels == 3 && img.fmt == "ppm")
    assert(img.luma.toSeq == Seq(299 * 255 / 1000, 587 * 255 / 1000, 114 * 255 / 1000, 255))
  }

  test("PPM header comments and whitespace are handled") {
    val bytes = "P6\n# a comment\n 1 1\n# another\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30)
    val img = MediaCodec.decode(bytes).get
    assert(img.width == 1 && img.height == 1)
    assert(img.luma.toSeq == Seq((299 * 10 + 587 * 20 + 114 * 30) / 1000))
  }

  test("BMP decodes bottom-up padded rows to top-down luma") {
    // 2×2 grayscale values laid out top-down: 10, 20 / 30, 40
    val img = MediaCodec.decode(bmp(2, 2, Seq(
      (10, 10, 10), (20, 20, 20), (30, 30, 30), (40, 40, 40)))).get
    assert(img.width == 2 && img.height == 2 && img.fmt == "bmp")
    assert(img.luma.toSeq == Seq(10, 20, 30, 40))
  }

  test("truncated or size-inconsistent payloads are not images") {
    val good = ppm(2, 2, Seq.fill(4)((1, 2, 3)))
    assert(MediaCodec.decode(good).isDefined)
    assert(MediaCodec.decode(good.dropRight(1)).isEmpty)  // short payload
    assert(MediaCodec.decode(good :+ 0.toByte).isEmpty)   // trailing bytes
    assert(MediaCodec.decode("P6 but actually text".getBytes).isEmpty)
    assert(MediaCodec.decode("BMocking header".getBytes ++ new Array[Byte](60)).isEmpty)
  }

  test("aHash over a half-dark half-bright image sets exactly the bright-column bits") {
    // 16×16: left half luma 0, right half luma 255 → 8×8 grid columns
    // 0-3 dark, 4-7 bright; mean strictly between → bright bits only
    val px = for (y <- 0 until 16; x <- 0 until 16)
      yield if (x < 8) (0, 0, 0) else (255, 255, 255)
    val img = MediaCodec.decode(ppm(16, 16, px)).get
    val expected = (for (r <- 0 until 8; c <- 4 until 8) yield 1L << (r * 8 + c)).sum
    assert(MediaCodec.aHash64(MediaCodec.luma64(img)) == expected)
    // uniform image: no sample strictly exceeds the mean → hash 0
    val flat = MediaCodec.decode(ppm(8, 8, Seq.fill(64)((7, 7, 7)))).get
    assert(MediaCodec.aHash64(MediaCodec.luma64(flat)) == 0L)
  }

  test("resample block-means the luma plane and nearest-neighbors tiny images") {
    val img = MediaCodec.DecodedImage(4, 1, 3, "ppm", Array(0, 10, 20, 30))
    assert(MediaCodec.resample(img, 2).toSeq == Seq(5, 25))   // block means
    assert(MediaCodec.resample(img, 8).toSeq ==               // repetition
      Seq(0, 0, 10, 10, 20, 20, 30, 30))
  }

  private val blobSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("blob", BinaryType)))

  test("operator cores: image rows get real features, text rows keep the oracle fallback") {
    val image = ppm(16, 16,
      for (y <- 0 until 16; x <- 0 until 16)
        yield if (x < 8) (0, 0, 0) else (255, 255, 255))
    val text = ("the quick brown fox " * 8).getBytes("UTF-8")
    val df = spark.createDataFrame(
      Seq(Row(1L, image), Row(2L, text)).asJava, blobSchema)

    val feats = Multimodal.featuresOf(spark, df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getLong(2) == 16 && feats(1L).getLong(3) == 16 &&
           feats(1L).getString(5) == "ppm")
    // text falls back to the md5-derived stub — replay it here
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(text).map("%02x".format(_)).mkString
    assert(feats(2L).getLong(2) == 16 + java.lang.Long.parseLong(h.substring(0, 2), 16))

    val ph = Multimodal.phashOf(spark, df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for (r <- 0 until 8; c <- 4 until 8) yield 1L << (r * 8 + c)).sum
    assert(ph(1L) == expected)
    // text path: stride byte sampling, identical to the declarative form
    val stride = text.length / 64
    val px = Array.tabulate(64)(i => (text(i * stride) & 0xFF).toLong)
    assert(ph(2L) == MediaCodec.aHash64(px))

    val rs = Multimodal.resizeOf(spark, df, 64).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    def md5OfHex(samples: Array[Int]): String = {
      val s = samples.map(v => f"$v%02x").mkString
      md.reset(); md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val img = MediaCodec.decode(image).get
    assert(rs(1L) == md5OfHex(MediaCodec.resample(img, 64)))
    assert(rs(2L) == md5OfHex(Array.tabulate(64)(i => text(i * stride) & 0xFF)))
  }
}

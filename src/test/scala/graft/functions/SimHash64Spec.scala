package graft.functions

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSuite

/** Pins `graft_simhash` to an INDEPENDENT sequential reference that
  * implements the signature's original definition — md5 hex string,
  * digit j/4, bit 3-j%4 of the digit — rather than the digest-byte
  * shortcut the native expression uses. If the "bit j of the signature
  * is bit j of the digest MSB-first" collapse were wrong anywhere, the
  * two would disagree on some token; the property runs over corpora
  * with unicode tokens, empty tokens from doubled/leading/trailing
  * spaces, and heavy repetition (the frequency-weighting regime). */
class SimHash64Spec extends SparkSuite {

  private def refSimhash(text: String): Long = {
    val counts = new Array[Int](64)
    for (tok <- text.split(" ", -1)) {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = dig.map(b => f"$b%02x").mkString
      for (j <- 0 until 64) {
        val digit = Integer.parseInt(hex.charAt(j / 4).toString, 16)
        counts(j) += ((digit >> (3 - j % 4)) & 1) * 2 - 1
      }
    }
    (0 until 64).foldLeft(0L)((acc, j) =>
      if (counts(j) > 0) acc | (1L << j) else acc)
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def viaSpark(texts: Seq[String]): Map[Long, Long] = {
    SimHash64.register(spark)
    spark.createDataFrame(
        texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava, schema)
      .select(col("doc_id"), expr("graft_simhash(text)").as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val corpus: Gen[List[String]] = {
    val token = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("é", "中文", "☃", "the", "a", ""))
    Gen.listOfN(6, for {
      toks <- Gen.nonEmptyListOf(token)
      sep <- Gen.oneOf(" ", "  ")
    } yield toks.mkString(sep))
  }

  test("matches the sequential hex-digit reference on generated corpora") {
    val prop = Prop.forAll(corpus) { texts =>
      viaSpark(texts) == texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> refSimhash(t)
      }.toMap
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("edge cases: empty string, single space, repetition; null is null") {
    assert(viaSpark(Seq("", " ", "x x x x")) ===
      Map(0L -> refSimhash(""), 1L -> refSimhash(" "), 2L -> refSimhash("x x x x")))
    assert(SimHash64(Literal.create(null, StringType)).eval() === null)
  }

  test("interpreted eval agrees with the codegen path") {
    val texts = Seq("the quick brown fox", "", "é ☃ 中文")
    val interp = texts.map(t =>
      SimHash64(Literal.create(t, StringType)).eval().asInstanceOf[Long])
    val gen = viaSpark(texts)
    assert(texts.indices.forall(i => gen(i.toLong) == interp(i)))
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Frozen-stat batch admission (round-13, pipe_curation_admit): the
  * O(batch) decision path against the base corpus's committed
  * statistics. Three contracts:
  *  - the INDEX-SERVED probe (digest index + base-slice shingle
  *    segments) produces row-identical decisions to the in-plan form —
  *    the twin-alias obligation;
  *  - the frozen rule AGREES with the exact combined-corpus decision
  *    wherever staleness can't bite (base exact/near matches,
  *    within-batch exact dups);
  *  - the one thing the freeze deliberately can't see — a batch-internal
  *    NEAR-dup pair — is admitted twice and surfaces as n_divergent,
  *    the measured staleness price the declared query reports. */
class AdmissionFrozenSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq.sortBy(_.mkString("|"))

  test("index-served frozen admission ≡ in-plan form, per-doc and in the declared rollup") {
    assume(hasTestData)
    val maxId = Tables.documents(spark, sf).agg(max(col("doc_id"))).head().getLong(0)
    val thr = 9L * maxId / 10L
    val inPlan = rowsOf(Pipeline.admissionFrozen(spark, sf, thr))
    val indexed = rowsOf(Pipeline.admissionFrozenIndexed(spark, sf, thr))
    assert(inPlan.nonEmpty, "vacuous: empty batch")
    assert(indexed == inPlan,
      "index-served frozen decisions diverge from the in-plan form")
    assert(rowsOf(Pipeline.curationAdmitIndexed(spark, sf)) ==
           rowsOf(Pipeline.curationAdmit(spark, sf)),
      "declared twin rollups diverge")
  }

  test("staleness semantics on a crafted corpus: base matches gate, batch-internal near-dups admit and diverge") {
    // 30-word documents that all pass the Gopher gate (the
    // CurationRunSpec word recipe: 5-char words, two 'the's)
    def words(prefix: String): Seq[String] =
      (1 to 30).map {
        case 5 => "the"
        case 20 => "the"
        case i => f"$prefix${i}%02dxx".take(5)
      }
    def text(prefix: String): String = words(prefix).mkString(" ")
    val standing = text("s")                    // base doc 5's text
    val vText = text("v")                       // base doc 6's text
    val vNear = (words("v").dropRight(1) :+ "zzzzz").mkString(" ")
    val wText = text("w")                       // fresh batch content
    val wNear = (words("w").dropRight(1) :+ "qqqqq").mkString(" ")
    val fillers = (0 to 36).map {
      case 5 => 5L -> standing
      case 6 => 6L -> vText
      case i => i.toLong -> text(f"f$i%02d")
    }
    // max = 40 → thr = 36: batch = {37, 38, 39, 40}
    val rows = (fillers ++ Seq(
      37L -> standing, // exact copy of base 5 → frozen exact_dup
      38L -> vNear,    // near-dup of base 6   → frozen near_dup
      39L -> wText,    // fresh                → frozen keep
      40L -> wNear     // near-dup of 39 ONLY  → frozen keep (the blind spot)
    )).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val dir = tempDir("admit-frozen")
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val frozen = Pipeline.admissionFrozen(spark, dir, 36L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(frozen == Map(37L -> "exact_dup", 38L -> "near_dup",
                         39L -> "keep", 40L -> "keep"),
      s"frozen decisions wrong: $frozen")
    // the exact combined-corpus decision flags 40 as the near-dup of 39
    val exact = Pipeline.curationDecisions(spark, dir)
      .filter(col("doc_id") > 36L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(exact(40L) == "near_dup",
      s"fixture broken: exact decision for 40 is ${exact(40L)}, not near_dup")
    assert(exact(37L) == "exact_dup" && exact(38L) == "near_dup" && exact(39L) == "keep")
    // the declared rollup prices exactly that one blind spot
    val report = Pipeline.curationAdmit(spark, dir).collect()
    assert(report.length == 1)
    val r = report.head
    assert(r.getString(0) == "web")
    assert(r.getLong(1) == 4L, "n_batch")
    assert(r.getLong(2) == 2L, "n_keep")
    assert(r.getLong(3) == 1L, "n_exact_dup")
    assert(r.getLong(4) == 1L, "n_near_dup")
    assert(r.getLong(5) == 0L, "n_quality")
    assert(r.getLong(6) == 1L,
      s"n_divergent must price the batch-internal near-dup: ${r.getLong(6)}")
  }

  test("within-batch exact dups elect the batch minimum without the base corpus") {
    def words(prefix: String): Seq[String] =
      (1 to 30).map {
        case 5 => "the"
        case 20 => "the"
        case i => f"$prefix${i}%02dxx".take(5)
      }
    def text(prefix: String): String = words(prefix).mkString(" ")
    val dup = text("d")
    val fillers = (0 to 36).map(i => i.toLong -> text(f"g$i%02d"))
    val rows = (fillers ++ Seq(
      37L -> dup, 38L -> dup,     // same NEW text twice in the batch
      39L -> text("x"), 40L -> text("y")
    )).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val dir = tempDir("admit-batchdup")
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val frozen = Pipeline.admissionFrozen(spark, dir, 36L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(frozen(37L) == "keep", "batch keeper must admit")
    assert(frozen(38L) == "exact_dup", "batch non-keeper must gate without any base match")
    // and the exact rule agrees — zero divergence on this corpus
    val r = Pipeline.curationAdmit(spark, dir).collect().head
    assert(r.getLong(6) == 0L, s"unexpected divergence ${r.getLong(6)}")
  }
}

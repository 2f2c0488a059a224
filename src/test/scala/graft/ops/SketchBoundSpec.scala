package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Executable error bounds for the sketch queries. Since round 7 each
  * sketch query emits its contract in oracle-checkable form (exact
  * value + bound-holds flag), so the driver's hash gate verifies the
  * bound too — this spec keeps the DIRECT assertion on the raw sketch
  * estimate, which the flag-form output no longer exposes. (The
  * approx-quantile twin bound lives in TextAnalysisSpec;
  * decontaminate-bloom's no-false-negatives proof in PipelineSpec.) */
class SketchBoundSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/orders.parquet").isFile

  test("q21 HLL distinct-customer estimate stays within the 5% design bound of exact counts") {
    assume(hasTestData)
    // approx_count_distinct's default rsd is 0.05; per-group HLL error
    // concentrates well inside ±3 standard errors. Small groups use the
    // sketch's exact linear-counting range, so a flat +2 absolute slack
    // covers integer-rounding at tiny cardinalities without weakening
    // the relative bound where it matters.
    val both = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey")).as("a"),
           countDistinct(col("o_custkey")).as("e"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(both.nonEmpty)
    both.foreach { case (status, (a, e)) =>
      val tol = math.max(2L, math.ceil(e * 3 * 0.05).toLong)
      assert(math.abs(a - e) <= tol,
        s"status $status: HLL estimate $a vs exact $e exceeds ±$tol (3·rsd bound)")
    }
  }

  test("q21 query output reports the bound as held, with exact counts") {
    assume(hasTestData)
    val rows = RelationalQueries.q21ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) === 1L,
        s"within_3rsd flag is 0 for ${r.getString(0)} — sketch out of bound")
      assert(r.getLong(2) > 0, "exact_customers must be positive")
    }
  }
}

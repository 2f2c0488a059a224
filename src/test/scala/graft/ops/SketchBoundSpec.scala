package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Executable error bounds for the sketch queries whose driver oracle is
  * rows-only (`no_oracle`): the bound that justifies shipping a sketch
  * instead of the exact aggregate is asserted HERE, against the exact
  * twin, instead of living in prose. (The approx-quantile twin bound
  * lives in TextAnalysisSpec; decontaminate-bloom's no-false-negatives
  * proof lives in PipelineSpec.) */
class SketchBoundSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/orders.parquet").isFile

  test("q21 HLL distinct-customer estimate stays within the 5% design bound of q6-style exact counts") {
    assume(hasTestData)
    // approx_count_distinct's default rsd is 0.05; per-group HLL error
    // concentrates well inside ±3 standard errors. Small groups use the
    // sketch's exact linear-counting range, so a flat +2 absolute slack
    // covers integer-rounding at tiny cardinalities without weakening
    // the relative bound where it matters.
    val approx = RelationalQueries.q21ApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet, "sketch and exact disagree on the group set")
    exact.foreach { case (status, e) =>
      val a = approx(status)
      val tol = math.max(2L, math.ceil(e * 3 * 0.05).toLong)
      assert(math.abs(a - e) <= tol,
        s"status $status: HLL estimate $a vs exact $e exceeds ±$tol (3·rsd bound)")
    }
  }
}

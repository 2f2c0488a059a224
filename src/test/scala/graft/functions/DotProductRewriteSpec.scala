package graft.functions

import graft.SparkSuite

/** The optimizer rule must rewrite the composable builtin idiom to the
  * fused expression — and must NOT fire when the rewrite would change
  * semantics (nullable elements, different fold). */
class DotProductRewriteSpec extends SparkSuite {

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ DotProductRewrite
    try f finally spark.experimental.extraOptimizations = prev
  }

  private def hasFused(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))

  test("aggregate(zip_with) dot product is rewritten to the fused expression, same result") {
    withRule {
      val df = spark.range(3).selectExpr(
        "array(1.0D, 2.0D, 3.0D) AS a", "array(4.0D, 5.0D, 6.0D) AS b")
        .selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS dot")
      assert(hasFused(df), df.queryExecution.optimizedPlan.toString)
      assert(df.collect().map(_.getDouble(0)).toSeq === Seq(32.0, 32.0, 32.0))
    }
  }

  test("rewritten form preserves NULL for runtime length mismatch (zip_with null-pads)") {
    withRule {
      val df = spark.range(1).selectExpr(
        "array(1.0D, 2.0D) AS a", "array(3.0D) AS b")
        .selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS dot")
      assert(hasFused(df), "length guard keeps the fused fast path in the plan")
      assert(df.collect().head.isNullAt(0),
        "unequal lengths must yield NULL, exactly like the un-rewritten form")
    }
  }

  test("no rewrite when elements are nullable (fused form would change NULL semantics)") {
    withRule {
      // array(...) with a null literal element ⇒ containsNull = true
      val df = spark.range(1).selectExpr(
        "array(1.0D, CAST(NULL AS DOUBLE)) AS a", "array(4.0D, 5.0D) AS b")
        .selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS dot")
      assert(!hasFused(df), "must not fire on nullable elements")
      assert(df.collect().head.isNullAt(0), "composable form yields NULL, preserved")
    }
  }

  test("no rewrite for a non-deterministic array child (guard references it twice)") {
    withRule {
      // shuffle() is non-deterministic; the guarded rewrite would evaluate
      // it once for size() and again for the fused loop — two different
      // shuffles. The rule must leave the single-evaluation form alone.
      // Inline on purpose: behind a Project alias the child would be a
      // (deterministic) attribute and the rewrite is safe again.
      val df = spark.range(1).selectExpr(
        """aggregate(zip_with(shuffle(array(1.0D, 2.0D, 3.0D)), array(4.0D, 5.0D, 6.0D),
          |(x, y) -> x * y), 0D, (acc, x) -> acc + x) AS dot""".stripMargin)
      assert(!hasFused(df), "must not fire on non-deterministic children")
    }
  }

  test("no rewrite for a different fold (sum of maxima is not a dot product)") {
    withRule {
      val df = spark.range(1).selectExpr(
        "array(1.0D, 2.0D) AS a", "array(4.0D, 5.0D) AS b")
        .selectExpr("aggregate(zip_with(a, b, (x, y) -> greatest(x, y)), 0D, (acc, x) -> acc + x) AS s")
      assert(!hasFused(df))
      assert(df.collect().head.getDouble(0) === 9.0)
    }
  }
}

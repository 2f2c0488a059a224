package graft.functions

import graft.SparkSuite
import graft.ops.RelationalQueries
import org.apache.spark.sql.functions._

/** The native bounded top-k aggregate must be a drop-in replacement for
  * the row_number window idiom — same rows, different (cheaper) physical
  * shape — and deterministic under any partitioning/merge order. */
class TopKAggSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/lineitem.parquet").isFile

  test("graft_topk reproduces the window-rank query exactly") {
    assume(hasTestData)
    val viaWindow = RelationalQueries.q5WindowRank(spark, sf).collect().map(_.toSeq).toSet
    val viaAgg = RelationalQueries.q28TopKAgg(spark, sf).collect().map(_.toSeq).toSet
    assert(viaAgg.nonEmpty)
    assert(viaAgg === viaWindow)
  }

  test("the aggregate plan has no Window and combines map-side") {
    assume(hasTestData)
    val plan = RelationalQueries.q28TopKAgg(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "top-k aggregate still plans a window")
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_graft_topk"),
      "graft_topk is not partially aggregated map-side")
  }

  test("determinism: duplicates kept, ties broken by payload, any partitioning") {
    TopKPairs.register(spark)
    val sess = spark
    import sess.implicits._
    // two identical (score, payload) rows: both must be kept (a set-based
    // buffer would collapse them); score ties break by payload ascending
    val rows = Seq((1.0, 10L), (1.0, 10L), (1.0, 5L), (0.5, 1L), (2.0, 7L))
    (1 to 7).foreach { parts =>
      val out = rows.toDF("s", "p").repartition(parts)
        .agg(expr("graft_topk(s, p, 3)").as("top"))
        .selectExpr("inline(top)").collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSeq
      assert(out === Seq((2.0, 7L), (1.0, 5L), (1.0, 10L)), s"parts=$parts: $out")
    }
  }

  test("property: random inserts under any merge split match brute-force top-k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    // the EXACT production comparator (shared factory — cannot drift)
    val ord = TopKPairs.orderingFor(DoubleType, LongType)
    val genPairs = Gen.listOf(for {
      s <- Gen.choose(-5, 5).map(_.toDouble) // narrow range to force score ties
      p <- Gen.choose(0L, 20L)
    } yield (s, p))
    val prop = Prop.forAll(genPairs, Gen.choose(1, 6), Gen.choose(0, 100)) {
      (pairs: List[(Double, Long)], k: Int, cut: Int) =>
        // split at an arbitrary point and merge partial buffers, like a
        // map-side combine would; result must equal the global sort
        val (l, r) = pairs.splitAt(cut % (pairs.length + 1))
        val bl = new TopKPairsBuffer(k, ord); l.foreach { case (s, p) => bl.insert(s, p) }
        val br = new TopKPairsBuffer(k, ord); r.foreach { case (s, p) => br.insert(s, p) }
        bl.mergeIn(br)
        val expected = pairs.sortBy { case (s, p) => (-s, p) }.take(k)
        bl.result == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("NaN scores rank first, matching the row_number window idiom exactly") {
    TopKPairs.register(spark)
    val sess = spark
    import sess.implicits._
    val df = Seq((Double.NaN, 3L), (2.0, 1L), (1.0, 2L), (Double.NaN, 9L)).toDF("s", "p")
    val viaAgg = df.agg(expr("graft_topk(s, p, 3)").as("top"))
      .selectExpr("inline(top)").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // gold standard: the window form this aggregate replaces
    val viaWindow = df.selectExpr("s", "p",
        "row_number() OVER (ORDER BY s DESC, p) AS rk")
      .filter(col("rk") <= 3).orderBy(col("rk")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(viaAgg.map(t => (t._1.isNaN, if (t._1.isNaN) 0.0 else t._1, t._2)) ===
           viaWindow.map(t => (t._1.isNaN, if (t._1.isNaN) 0.0 else t._1, t._2)))
    assert(viaAgg.head._1.isNaN, "SQL total order ranks NaN above every number in DESC")
  }

  test("string payload: serialization round-trip and binary-collation tiebreak") {
    TopKPairs.register(spark)
    val sess = spark
    import sess.implicits._
    // force a shuffle so partial buffers SERIALIZE (UnsafeRow wire format)
    val out = Seq((1.0, "bb"), (1.0, "aa"), (2.0, "zz"), (0.5, "cc"))
      .toDF("s", "tok").repartition(4)
      .agg(expr("graft_topk(s, tok, 3)").as("top"))
      .selectExpr("inline(top)").collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(out === Seq((2.0, "zz"), (1.0, "aa"), (1.0, "bb")))
  }

  test("struct score: composite (tf DESC, df ASC) key matches the window idiom") {
    TopKPairs.register(spark)
    val sess = spark
    import sess.implicits._
    val df = Seq((3L, 9L, "a"), (3L, 2L, "b"), (5L, 7L, "c"), (3L, 2L, "d"), (1L, 1L, "e"))
      .toDF("tf", "df", "tok")
    val viaAgg = df.repartition(3)
      .agg(expr("graft_topk(named_struct('tf', tf, 'ndf', -df), tok, 4)").as("top"))
      .selectExpr("inline(top)")
      .selectExpr("score.tf AS tf", "-score.ndf AS df", "payload AS tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val viaWindow = df.selectExpr("tf", "df", "tok",
        "row_number() OVER (ORDER BY tf DESC, df, tok) AS rk")
      .filter(col("rk") <= 4).orderBy(col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg === Seq((5L, 7L, "c"), (3L, 2L, "b"), (3L, 2L, "d"), (3L, 9L, "a")))
  }

  test("non-orderable payload is rejected at analysis time") {
    TopKPairs.register(spark)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("id AS s", "map(1, 2) AS m")
        .agg(expr("graft_topk(CAST(s AS DOUBLE), m, 2)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("orderable"), err.getMessage)
  }

  test("k larger than the group returns the whole group, ordered") {
    TopKPairs.register(spark)
    val sess = spark
    import sess.implicits._
    val out = Seq((3.0, 1L), (1.0, 2L)).toDF("s", "p")
      .agg(expr("graft_topk(s, p, 10)").as("top"))
      .selectExpr("inline(top)").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out === Seq((3.0, 1L), (1.0, 2L)))
  }
}

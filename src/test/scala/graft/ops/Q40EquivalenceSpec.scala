package graft.ops

import graft.SparkSuite

/** Round-17 equivalence proof for the q40 restructure: the iterative
  * frontier evaluation ([[RelationalQueries.q40RecursiveCte]]) must be
  * row-identical to Spark's OWN evaluation of the unchanged ANSI
  * `WITH RECURSIVE` oracle text — the strongest in-suite witness that
  * the per-level loop computes exactly the recursion the declared
  * oracle replays (the DuckDB side still evaluates the same text, so
  * the driver's hash gate is the cross-engine half of this proof). */
class Q40EquivalenceSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("iterative frontier loop ≡ Spark's WITH RECURSIVE on the oracle text") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val iterative = rows(RelationalQueries.q40RecursiveCte(spark, sf))
      Tables.registerAll(spark, sf)
      val recursive = rows(spark.sql(graft.SparkEntry.oracleSql("q40_recursive_cte")))
      assert(iterative === recursive, s"q40 level evaluation diverged at $sf")
      assert(iterative.nonEmpty, s"degenerate fixture at $sf — proof is vacuous")
    }
  }

  test("result schema matches the oracle text's column names and types") {
    val df = RelationalQueries.q40RecursiveCte(spark, "/root/testdata/sf0.001")
    assert(df.schema.fieldNames.toSeq === Seq("depth", "n_orders", "total_path_cents"))
    assert(df.schema.fields.forall(_.dataType ===
      org.apache.spark.sql.types.LongType))
  }
}

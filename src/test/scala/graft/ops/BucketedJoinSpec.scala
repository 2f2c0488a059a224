package graft.ops

import org.apache.spark.sql.functions.col
import graft.SparkSuite

/** Proves the bucketed layout actually co-locates: with broadcast
  * disabled, joining the two bucketed tables produces a sort-merge join
  * with NO Exchange on either input — the shuffle was paid at write
  * time, once. */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed tables join without a runtime shuffle") {
    val (liT, oT) = RelationalQueries.ensureBucketed(spark, "/root/testdata/sf0.001")
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(liT)
        .join(spark.table(oT), col("l_orderkey") === col("o_orderkey"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"expected no Exchange in:\n$plan")
      // and the result matches the unbucketed join
      val expected = Tables.lineitem(spark, "/root/testdata/sf0.001")
        .join(Tables.orders(spark, "/root/testdata/sf0.001"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
  }
}

package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The custom as-of operator (logical node → strategy → sort-merge
  * exec) under test: exact semantics on synthetic edges, physical-plan
  * shape, and full parity with the window-encoded q14 on real data. */
class AsOfJoinSpec extends SparkSuite {

  private val ss = graft.SparkSuite.spark // stable identifier for implicits
  import ss.implicits._

  private def trades = Seq(
    // (trade_id, sym, t)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "b", 5L), (5L, "c", 7L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    // (q_sym, q_t, px)
    ("a", 5L, 1.0), ("a", 10L, 2.0), ("a", 15L, 3.0), ("b", 9L, 9.0)
  ).toDF("q_sym", "q_t", "px")

  test("latest strictly-before match per key; no match → null") {
    val out = AsOf.join(trades, quotes,
        Seq("sym"), Seq("q_sym"), Seq("t"), Seq("q_t"))
      .select($"trade_id", $"px").orderBy($"trade_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(out.toSeq == Seq(
      (1L, 1.0),  // quote@5 is the only one strictly before t=10 (q_t=10 excluded)
      (2L, 3.0), (3L, 3.0), // both t=20 trades see quote@15
      (4L, null), // only quote for b is at 9 > 5
      (5L, null)  // key with no quotes at all
    ))
  }

  test("ordering ties break lexicographically on the full ordering tuple") {
    val l = Seq((1L, "k", 10L, 5L)).toDF("id", "sym", "t", "seq")
    val r = Seq(("k", 10L, 1L, "early"), ("k", 10L, 9L, "late"), ("k", 10L, 4L, "mid"))
      .toDF("r_sym", "r_t", "r_seq", "tag")
    val out = AsOf.join(l, r, Seq("sym"), Seq("r_sym"),
        Seq("t", "seq"), Seq("r_t", "r_seq"))
      .select($"tag").collect().map(_.getString(0))
    // (10,1) and (10,4) are strictly before (10,5); latest is (10,4)
    assert(out.toSeq == Seq("mid"))
  }

  test("inclusive mode admits an exact ordering-tuple tie (merge_asof backward default)") {
    val out = AsOf.join(trades, quotes,
        Seq("sym"), Seq("q_sym"), Seq("t"), Seq("q_t"), inclusive = true)
      .select($"trade_id", $"px").orderBy($"trade_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    // trade 1 (t=10) now takes the quote AT 10; the rest are unchanged
    assert(out.toSeq == Seq(
      (1L, 2.0), (2L, 3.0), (3L, 3.0), (4L, null), (5L, null)))
  }

  test("null keys group together — null-safe equality, matching PARTITION BY semantics") {
    val l = Seq((1L, Option.empty[String], 10L), (2L, Some("a"), 10L))
      .toDF("id", "sym", "t")
    val r = Seq((Option.empty[String], 5L, 1.0), (Some("a"), 5L, 2.0))
      .toDF("r_sym", "r_t", "px")
    val out = AsOf.join(l, r, Seq("sym"), Seq("r_sym"), Seq("t"), Seq("r_t"))
      .select($"id", $"px").orderBy($"id").collect()
      .map(row => (row.getLong(0), row.getDouble(1)))
    assert(out.toSeq == Seq((1L, 1.0), (2L, 2.0)))
  }

  test("physical plan uses AsOfJoinExec with co-partitioning exchanges") {
    val df = AsOf.join(trades, quotes, Seq("sym"), Seq("q_sym"), Seq("t"), Seq("q_t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("colliding right-side column names are rejected") {
    intercept[IllegalArgumentException] {
      AsOf.join(trades, trades, Seq("sym"), Seq("sym"), Seq("t"), Seq("t"))
    }
  }

  test("raw join output survives direct collect and sort — no Project on top") {
    // exec output must be UnsafeRow: a bare collect()/orderBy on the
    // join (no select in between) crashes if the exec leaks JoinedRows
    val df = AsOf.join(trades, quotes, Seq("sym"), Seq("q_sym"), Seq("t"), Seq("q_t"))
    assert(df.collect().length == 5)
    val sorted = df.orderBy($"px".desc_nulls_last).collect()
    assert(sorted.length == 5 && sorted.head.getDouble(5) == 3.0)
  }

  test("mismatched key/ordering column types are rejected, not silently miscompared") {
    val r = quotes.select($"q_sym", $"q_t".cast("int").as("q_t"), $"px")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(trades, r, Seq("sym"), Seq("q_sym"), Seq("t"), Seq("q_t"))
    }
    assert(e.getMessage.contains("type mismatch"))
    val r2 = quotes.select($"q_sym".cast("binary").as("q_sym"), $"q_t", $"px")
    intercept[IllegalArgumentException] {
      AsOf.join(trades, r2, Seq("sym"), Seq("q_sym"), Seq("t"), Seq("q_t"))
    }
  }

  test("property: operator matches the brute-force as-of model on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tight key/time domains force the interesting cases: key collisions,
    // ordering ties resolved by the second tuple element, empty keys
    val genRow = for {
      k <- Gen.choose(0, 4); t <- Gen.choose(0L, 12L); s <- Gen.choose(0L, 3L)
    } yield (k.toString, t, s)
    val gen = for {
      ls <- Gen.listOfN(20, genRow); rs <- Gen.listOfN(20, genRow)
    } yield (ls, rs)
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t, s), i) => (i.toLong, k, t, s) }
        .toDF("lid", "k", "t", "s")
      // right ordering tuple is (rt, rid) — unique per row, so the
      // operator's "latest" is well-defined and the model can predict it
      val r = rs.zipWithIndex.map { case ((k, t, _), i) => (i.toLong, k, t) }
        .toDF("rid", "rk", "rt")
      val got = AsOf.join(l, r, Seq("k"), Seq("rk"), Seq("t", "s"), Seq("rt", "rid"))
        .select($"lid", $"rid").collect()
        .map(row => row.getLong(0) -> (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
      val want = ls.zipWithIndex.map { case ((k, t, s), i) =>
        val cands = rs.zipWithIndex
          .filter { case ((rk, rt, _), rid) =>
            rk == k && (rt < t || (rt == t && rid < s)) }
          .map { case ((_, rt, _), rid) => (rt, rid.toLong) }
        i.toLong -> (if (cands.isEmpty) -1L else cands.max._2)
      }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("parity with the window-encoded as-of join (q14) on real events") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/events.parquet").isFile)
    val viaWindow = graft.ops.RelationalQueries.q14AsOfJoin(spark, sf).collect()
    val viaCustom = graft.ops.RelationalQueries.q37AsOfCustom(spark, sf).collect()
    assert(viaCustom.length == viaWindow.length)
    assert(viaCustom.map(_.toString).toSeq == viaWindow.map(_.toString).toSeq)
  }
}

package graft

/** Scan-level regression guard: predicate pushdown and column pruning
  * must actually REACH the parquet scan (SURVEY §4 O1/O5). A plan that
  * filters after materializing, or reads all columns for a two-column
  * projection, is the difference between scanning 100 TB and scanning
  * the relevant fraction — and nothing else in the test suite would
  * notice, because the results are identical. Assertions read the
  * executed plan's FileScan line: `PushedFilters` non-empty where a
  * scan-level predicate exists, `ReadSchema` restricted to the columns
  * the query touches. */
class ScanAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/lineitem.parquet").isFile

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2's range+equality predicates are pushed into the lineitem scan") {
    assume(hasTestData)
    val p = plan("q2_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull"),
      "no pushed filters on the lineitem scan — predicate evaluated post-materialization")
    // the widest column must not be read: pruning failed if it appears
    assert(!p.contains("l_comment"), "scan reads l_comment for a query that never touches it")
  }

  test("two-column projections prune the documents scan to two columns") {
    assume(hasTestData)
    Seq("mm_binary_meta", "text_rolling_hash", "text_fingerprint").foreach { q =>
      val p = plan(q)
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        s"$q reads more than (doc_id, text) from documents")
    }
  }

  test("scans under the custom as-of operator still get pushdown and pruning") {
    assume(hasTestData)
    // the custom node is opaque to Catalyst's pruning rules — its children
    // must arrive pre-filtered/pre-projected, and those child plans must
    // still push to the scan; a regression here would silently scan the
    // full events table twice at 100 TB
    val p = plan("q37_asof_custom")
    assert(p.contains("EqualTo(event_type,purchase)") &&
           p.contains("EqualTo(event_type,error)"),
      "event_type predicates not pushed into the scans under AsOfJoin")
    assert(!p.contains("props"), "as-of query reads the props column it never touches")
  }

  test("aggregate-only queries never read unused wide columns") {
    assume(hasTestData)
    // q4 touches orders(o_custkey, o_totalprice) + customer(c_custkey, c_name)
    val p = plan("q4_top_customers")
    assert(!p.contains("o_comment") && !p.contains("c_address") && !p.contains("c_phone"),
      "q4 scans columns its aggregation never references")
  }
}

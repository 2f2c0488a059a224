package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator library over the TPC-H-ish test tables.
  *
  * Design rules (see SURVEY.md §2.3-§2.6 and §7):
  *  - Declarative DataFrame plans only — Catalyst does pushdown/pruning,
  *    AQE picks shuffle counts at runtime.
  *  - Dimension joins are explicitly `broadcast()` so the 100 TB plan is
  *    a broadcast-hash join per dimension, never a shuffled fact table.
  *  - Money arithmetic goes through DECIMAL(18,2) so sums are exact and
  *    order-independent (a double sum is order-dependent across engines),
  *    then the final value is cast back to DOUBLE for a stable oracle
  *    comparison with DuckDB.
  */
object RelationalQueries {

  import Tables.trunc6

  /** Exact money arithmetic: cast to decimal before aggregating. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** TPC-H Q1-style pricing summary (ref has only counts — SURVEY §2.4;
    * this is the superset group-by aggregate). One shuffle on the two
    * low-cardinality group keys; partial aggregation makes the map side
    * do nearly all the work at scale. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Filter + projection scan — exercises parquet predicate pushdown and
    * column pruning (SURVEY §2.2 F1/F5). The scan must read only the five
    * referenced columns and skip row groups via min/max stats. */
  def q2FilterPushdown(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
              col("l_returnflag") === "R" &&
              col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_extendedprice"), col("l_shipdate"))
  }

  /** Star join: revenue per nation/region. Fact table (lineitem) joins
    * orders (fact-fact: shuffled sort-merge under AQE), then broadcasts
    * customer/nation/region dimensions — at 100 TB the only big shuffle
    * is lineitem⋈orders on orderkey. */
  def q3StarJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-k with deterministic tiebreak: top 10 customers by total order
    * value. groupBy-then-limit: the sort after aggregation is tiny. */
  def q4TopCustomers(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("total_spent"),
           count(lit(1)).as("n_orders"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"), col("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(10)
  }

  /** Window function: top-3 parts by revenue within each brand
    * (SURVEY §2.5 — absent in ref, core superset op). Deterministic
    * tiebreak on partkey. */
  def q5WindowRank(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    val rev = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("part_rev"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("part_rev").desc, col("p_partkey"))
    rev.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("part_rev"), col("rk"))
      .orderBy(col("p_brand"), col("rk"))
  }

  /** q5's top-3-per-brand computed with the native bounded top-k
    * AGGREGATE ([[graft.functions.TopKPairs]], `graft_topk`) instead of
    * a window: the window plan shuffles every (brand, partkey) row and
    * sorts each brand's full set just to discard all but 3, while the
    * aggregate keeps a k-pair buffer per brand, combines map-side, and
    * ships ≤k pairs per brand into the shuffle. Same rows as q5 (the
    * oracle is the same row_number SQL; `TopKAggSpec` asserts plan-level
    * that no Window/Sort appears and results match q5 exactly). */
  def q28TopKAgg(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    graft.functions.TopKPairs.register(s)
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("part_rev"))
      .groupBy(col("p_brand"))
      .agg(expr(s"graft_topk(part_rev, p_partkey, $k)").as("top"))
      .select(col("p_brand"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("p_brand"), col("e.payload").as("p_partkey"),
              col("e.score").as("part_rev"), (col("pos") + 1).cast("long").as("rk"))
      .orderBy(col("p_brand"), col("rk"))
  }

  /** Distinct aggregation per market segment (SURVEY §2.4 superset:
    * count distinct). Written as an explicit two-phase aggregate —
    * partial by (segment, custkey), then rollup to segment — instead of
    * `countDistinct`, whose expand-based plan re-shuffles every row per
    * distinct column; this shape is two plain map-side-combined hash
    * aggregations and produces identical exact results. At 100 TB swap
    * the first phase to approx_count_distinct when tolerance allows. */
  def q6DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("tot"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           sum(col("cnt")).as("n_orders"),
           sum(col("tot")).cast("double").as("segment_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** Two-branch UNION ALL (bag semantics — SURVEY §2.6 U1). */
  def q7UnionAll(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val errors  = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val bigBuys = e.filter(col("event_type") === "purchase" && col("value") > 150)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    errors.unionAll(bigBuys)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("event_type"))
  }

  /** Left anti join: customers with no high-value order (dedup-style
    * filter, SURVEY §2.3). The anti side is pre-filtered + distinct so
    * only a small key set shuffles at scale. */
  def q8AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o.filter(col("o_totalprice") > 300000).select(col("o_custkey")).distinct(),
           col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left semi join (EXISTS): orders that contain a high-quantity line. */
  def q10SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    o.join(li.filter(col("l_quantity") >= 49).select(col("l_orderkey")),
           col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** ROLLUP aggregate (SURVEY §2.4 superset: grouping sets). */
  def q9Rollup(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("n"), col("total"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))
  }

  /** Event-time bucketing: per-day per-type counts (SURVEY §2.8 T7 —
    * absent in ref; the superset windowed aggregate). */
  def q11TimeBucket(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Sessionization: a new session starts after a >30 min gap per user;
    * one window pass (lag + running sum), no self-join. */
  def q12Sessionize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withGap = e.withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
    withGap
      .withColumn("sess_id", sum(col("new_sess")).over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(dec(col("value"))).cast("double").as("sess_value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
           max(col("n_events")).as("max_session_events"),
           sum(dec(col("sess_value"))).cast("double").as("total_value"))
      .orderBy(col("user_id"))
  }

  /** Per-user argmax: the event carrying each user's max value, with a
    * deterministic event_id tiebreak (row_number, not max_by, so the
    * DuckDB oracle agrees on ties). */
  def q13ArgMax(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** JSON scalar functions in-plan (SURVEY §2.7 C9 superset): extract a
    * typed value from the JSON `props` payload and aggregate it. The
    * extraction is a codegen'd path expression over the scan — no UDF,
    * no intermediate parse tree materialized. */
  def q15JsonExtract(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Salted two-phase aggregation — the skew-mitigation pattern for a
    * hot grouping key: phase 1 aggregates on (key, salt) so a skewed
    * key's rows spread across `nSalts` reducers, phase 2 merges the
    * partials per key. The result is identical to a direct groupBy (the
    * oracle runs the plain form); only the shuffle distribution differs.
    * At 100 TB this is the manual fallback when AQE's skew handling
    * can't apply (e.g. skewed aggregation rather than join). */
  def q16SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val nSalts = 16
    Tables.events(s, dir)
      .withColumn("salt", pmod(crc32(col("event_id").cast("string")), lit(nSalts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("tot"))
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"),
           sum(col("tot")).cast("double").as("total_value"))
      .orderBy(col("event_type"))
  }

  /** Bucketed co-located join (SURVEY §2.3 / builder prompt: "bucketing
    * for co-located joins"): both sides are written `bucketBy(orderkey)`
    * into session-catalog tables, and the subsequent join reads matching
    * buckets with NO shuffle on either side. This is the 100 TB pattern
    * for a fact-fact join that recurs across a pipeline: pay the
    * partitioned write once, join shuffle-free forever after. At test
    * scale AQE (correctly) prefers broadcasting the small side, so the
    * exchange-free sort-merge plan is asserted in `BucketedJoinSpec`
    * with broadcast disabled. The oracle runs the plain join — results
    * are identical, only the physical plan differs. */
  /** Write lineitem/orders as bucketed session-catalog tables (8 buckets
    * on the join key, sorted within buckets); idempotent per (session,
    * sfDir). Returns the table names. */
  private[graft] def ensureBucketed(s: SparkSession, dir: String): (String, String) =
    synchronized {
      val buckets = 8
      // collision-resistant tag (round-7 review: hashCode tags can
      // serve one dir's data for another) — shared with IndexTables
      val tag = IndexTables.dirTag(dir)
      val (liT, oT) = (s"li_bkt_$tag", s"o_bkt_$tag")
      // Each table is ensured INDEPENDENTLY: a crash between the two
      // writes must not leave a registered liT permanently shadowing a
      // missing oT (round-7 review), and the in-memory catalog resets
      // per JVM while spark-warehouse persists on disk — drop any stale
      // location before saveAsTable or it fails LOCATION_ALREADY_EXISTS.
      val warehouse = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
      val fs = warehouse.getFileSystem(s.sparkContext.hadoopConfiguration)
      def ensure(t: String)(write: => Unit): Unit =
        if (!s.catalog.tableExists(t)) {
          val p = new org.apache.hadoop.fs.Path(warehouse, t)
          if (fs.exists(p)) fs.delete(p, true)
          write
        }
      ensure(liT) {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
          .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable(liT)
      }
      ensure(oT) {
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"))
          .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable(oT)
      }
      (liT, oT)
    }

  def q17BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (liT, oT) = ensureBucketed(s, dir)
    s.table(liT).join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
           sum(dec(col("l_extendedprice"))).cast("double").as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** CUBE grouping sets (all four subtotal combinations). */
  def q18Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("n"), col("total"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  /** Pivot (wide conditional aggregation): per-user value totals by event
    * type. The pivot value list is explicit, so the output schema is
    * static — the oracle expresses the same thing as CASE aggregates. */
  def q19Pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(sum(dec(col("value"))).cast("double"))
      .orderBy(col("user_id"))
  }

  /** Deterministic array aggregation: each user's sorted distinct event
    * types, serialized to one string so the oracle compare stays on flat
    * scalar columns. collect_set order is nondeterministic; sort_array
    * canonicalizes before joining. */
  def q20ArrayAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(array_join(sort_array(collect_set(col("event_type"))), ",").as("types"),
           count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** Approximate distinct (HLL sketch) — the 100 TB substitute for exact
    * countDistinct when tolerance allows. The sketch VALUE is engine-
    * specific (DuckDB cannot replay Spark's HLL++ bit pattern), so the
    * query emits the sketch's CONTRACT instead of its raw estimate: the
    * exact distinct count plus `within_3rsd` = 1 iff the HLL estimate
    * lands within max(2, ⌈3·rsd·exact⌉) of it (rsd = 0.05, Spark's
    * default; 3 standard errors; the +2 floor covers integer rounding in
    * the sketch's small-cardinality linear-counting range). The oracle
    * computes the identical exact count and asserts the flag is 1 — so
    * the hash-match gate now CHECKS the sketch's error bound instead of
    * skipping the query (the round-≤6 form emitted the raw estimate and
    * was driver-declared `no_oracle`). Same bound as SketchBoundSpec,
    * which keeps the standalone executable proof. */
  def q21ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey")).as("approx"),
           countDistinct(col("o_custkey")).as("exact_customers"),
           count(lit(1)).as("n_orders"))
      .select(col("o_orderstatus"), col("n_orders"), col("exact_customers"),
        (abs(col("approx") - col("exact_customers")) <=
          greatest(lit(2L), ceil(col("exact_customers") * lit(3 * 0.05)).cast("long")))
          .cast("long").as("within_3rsd"))
      .orderBy(col("o_orderstatus"))

  /** As-of join via composed built-ins (SURVEY guide: compose before
    * custom plans): for each purchase, the most recent prior error by
    * the same user. Single sort per user partition — no range cross
    * join, scales linearly in events. */
  def q14AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.withColumn("last_error_ts",
        last(when(col("event_type") === "error", col("ts")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("last_error_ts"))
      .orderBy(col("event_id"))
  }

  /** Interval range join done scale-safely: for each purchase, how many
    * errors the same user logged in the preceding 30 minutes. The naive
    * form is a non-equi self-join (`e2.ts BETWEEN e1.ts - 30m AND
    * e1.ts`) — a per-user cross join that explodes on hot users; here it
    * is ONE window pass with a RANGE frame over epoch seconds (sort each
    * user partition once, slide the frame), linear in events and
    * identical in result. The window-over-union-tag trick is the
    * standard Spark answer to bounded-interval joins when one side can
    * be folded into the other's ordering. */
  def q22RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("ts_sec", col("ts").cast("long"))
      .withColumn("is_err", when(col("event_type") === "error", 1L).otherwise(0L))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-1800, 0)
    e.withColumn("n_recent_errors", sum(col("is_err")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("n_recent_errors"))
      .orderBy(col("event_id"))
  }

  /** LEFT OUTER join with null-probe aggregation: orders that have NO
    * high-quantity line items (the "find the absences" query shape anti
    * join can't express when you also need the present side's counts).
    * Shuffle on orderkey; null-side counting is a conditional integer
    * sum, map-side combined. */
  def q24LeftJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey")).distinct()
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_without_big_items"))
      .orderBy(col("o_orderstatus"))
  }

  /** INTERSECT / EXCEPT set algebra (absent from the reference, SURVEY
    * §2.6): purchase-users vs error-users partitioned into both /
    * purchase-only / error-only. Set semantics (distinct) on both
    * engines; each leg is a hash-partitioned set operation on user_id. */
  def q25SetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // value > 150 keeps the sets sparse enough that all three partitions
    // are non-empty at test scale (unfiltered, every user has every type)
    val buyers = ev.filter(col("event_type") === "purchase" && col("value") > 150)
      .select(col("user_id")).distinct()
    val errorers = ev.filter(col("event_type") === "error" && col("value") > 150)
      .select(col("user_id")).distinct()
    buyers.intersect(errorers).withColumn("set_op", lit("both"))
      .union(buyers.except(errorers).withColumn("set_op", lit("purchase_only")))
      .union(errorers.except(buyers).withColumn("set_op", lit("error_only")))
      .groupBy(col("set_op")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("set_op"))
  }

  /** Window distribution functions (SURVEY §2.5 superset): quartile
    * assignment (ntile), percent_rank, and cume_dist of each customer's
    * spend WITHIN its market segment — partitioned windows, so at 100 TB
    * each segment ranks in parallel; a global ORDER BY window would
    * serialize the corpus through one partition. Rank inputs are exact
    * (DECIMAL-summed spend, custkey tiebreak); the rank→ratio math is
    * integer-derived on both engines, trunc6 for the hash. */
  def q26DistributionRank(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("total_spent"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("total_spent"), col("c_custkey"))
    spend
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", trunc6(percent_rank().over(w)))
      .withColumn("cume", trunc6(cume_dist().over(w)))
      .select(col("c_mktsegment"), col("c_custkey"), col("total_spent"),
              col("quartile"), col("pct_rank"), col("cume"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** Correlated scalar subquery semantics (SURVEY §2.3 superset):
    * orders strictly above their own customer's average order value.
    * Expressed as windowed per-customer sums — the decorrelated plan
    * Catalyst would produce anyway, one shuffle on the correlation key
    * instead of a per-row subquery. The comparison is division-free
    * cross-multiplication in DECIMAL (price·n > Σprice): exact integer-
    * style arithmetic, no float average to diverge between engines. */
  def q27CorrSubquery(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(s, dir)
      .withColumn("cust_total", sum(dec(col("o_totalprice"))).over(w))
      .withColumn("cust_n", count(lit(1)).over(w))
      .filter(dec(col("o_totalprice")) * col("cust_n") > col("cust_total"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"),
           sum(dec(col("o_totalprice"))).cast("double").as("total_above"))
      .orderBy(col("o_orderpriority"))
  }

  /** Ordered event funnel (product analytics): how many users progressed
    * view → click → purchase IN TIME ORDER — each stage requires the
    * user's first event of that type to come strictly after the first
    * event of the previous stage. One aggregate pass per user collecting
    * three conditional MIN timestamps (map-side combined), then a
    * constant-size projection evaluates the stage predicates; no joins,
    * no windows, one shuffle on user_id. Counts are integers. */
  def q33EventFunnel(s: SparkSession, dir: String): DataFrame = {
    def firstTs(tpe: String) = min(when(col("event_type") === tpe, col("ts")))
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(firstTs("view").as("t_view"),
           firstTs("click").as("t_click"),
           firstTs("purchase").as("t_purchase"))
      .agg(count(lit(1)).as("n_users"),
           sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
           sum(when(col("t_view").isNotNull && col("t_click") > col("t_view"), 1L)
             .otherwise(0L)).as("n_clicked_after_view"),
           sum(when(col("t_view").isNotNull && col("t_click") > col("t_view") &&
                    col("t_purchase") > col("t_click"), 1L)
             .otherwise(0L)).as("n_full_funnel"))
  }

  /** UNPIVOT / melt (the inverse of q19's pivot): per-status order
    * aggregates widened into (measure, value) rows via `stack` — the
    * wide-to-long reshape feeding metric stores and plotting layers.
    * Aggregate FIRST (5 rows), then unpivot the tiny result: the
    * generator runs on the aggregate, never on raw orders. Measures are
    * DECIMAL-derived doubles, counts cast to double so both measures
    * share one value column (the unpivot contract). */
  def q32Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).cast("double").as("n_orders"),
           sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .select(col("o_orderstatus"),
        expr("stack(2, 'n_orders', n_orders, 'total_price', total_price) AS (measure, value)"))
      .orderBy(col("o_orderstatus"), col("measure"))

  /** Time-series smoothing: 7-day moving average of daily revenue per
    * event type, as a RANGE frame over the day number — the window
    * covers a fixed TIME span, not a fixed row count, so gap days
    * genuinely shrink the average's denominator. Two steps: exact daily
    * totals (DECIMAL sums → DOUBLE — tiny relation, one row per
    * (type, day)), then the RANGE window runs over #days rows per type,
    * never raw events. The average divides the window sum by the window
    * count in double (both derived from exact values — deterministic),
    * then trunc6. */
  def q31MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
               date_trunc("day", col("ts")).as("day"))
      // window the DECIMAL, not a double: a double window sum's
      // association order is engine-internal (incremental vs segment
      // tree) and could differ in the last bits — decimal sums are exact
      .agg(sum(dec(col("value"))).as("dv"))
      .withColumn("day_no", expr("CAST(floor(unix_timestamp(day) / 86400) AS BIGINT)"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_no"))
      .rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("avg7",
        trunc6(sum(col("dv")).over(w).cast("double") / count(lit(1)).over(w)))
      .select(col("event_type"), col("day"), col("dv").cast("double").as("day_value"),
              col("avg7"))
      .orderBy(col("event_type"), col("day"))
  }

  /** FULL OUTER join (completes the join family: inner/broadcast q3,
    * semi q10, anti q8, left-outer q24, as-of q14, range q22, bucketed
    * q17): two per-user aggregates reconciled symmetrically — users
    * present on either side survive with nulls marking the missing side,
    * then one category rollup. The value>150 gates keep all three
    * categories non-empty at test scale (same trick as q25). Both inputs
    * pre-aggregate to one row per user BEFORE the join, so the full
    * outer is a join of two small keyed relations, not raw events. */
  def q30FullOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def side(tpe: String, out: String) = ev
      .filter(col("event_type") === tpe && col("value") > 150)
      .groupBy(col("user_id")).agg(count(lit(1)).as(out))
    side("purchase", "n_purchases")
      .join(side("error", "n_errors"), Seq("user_id"), "full_outer")
      .withColumn("category",
        when(col("n_purchases").isNull, lit("error_only"))
          .when(col("n_errors").isNull, lit("purchase_only"))
          .otherwise(lit("both")))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n_users"),
           sum(coalesce(col("n_purchases"), lit(0L))).as("total_purchases"),
           sum(coalesce(col("n_errors"), lit(0L))).as("total_errors"))
      .orderBy(col("category"))
  }

  /** The `spark.sql` TEXT entry point (the third query surface next to
    * the DataFrame API and the pushdown-triple builder): temp views over
    * the same parquet tables, and the DuckDB oracle string itself parsed
    * by Spark's SQL parser — ONE ANSI text evaluated by both engines,
    * proving text SQL lands in the same Catalyst pipeline (identical
    * pushdown/pruning/broadcast decisions, same oracle gate). The query
    * pre-aggregates lineitem per order BEFORE the join, so the join
    * input is one row per order on both sides. */
  def q29SqlInterface(s: SparkSession, dir: String): DataFrame = {
    // views carry the oracle's table names, so the ORACLE STRING ITSELF
    // is the query — one ANSI text parsed by both engines, zero drift room
    Tables.registerAll(s, dir)
    s.sql(graft.SparkEntry.oracleSql("q29_sql_interface"))
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE) — iterative hierarchy
    * traversal with PATH aggregation, the one relational shape no
    * window/join combination expresses: orders form a forest via the
    * key-derived parent `o_orderkey div 8`, anchors are the root keys
    * (< 8), and each recursion level extends every chain by one child
    * generation while accumulating the exact-integer price-path sum
    * (floor-cents — a double path sum could never hash-match across
    * engines). The `o_orderkey >= 8` guard is load-bearing: key 0 is
    * its own key-parent, and without the guard that self-cycle feeds
    * the whole table back in every round until the recursion limit
    * (measured — 1500 rows per level, forever).
    *
    * One ANSI text evaluated by BOTH engines (the q29 recipe), so the
    * recursion semantics themselves are what's being proven equal.
    * Scale shape: each level is one equi-join of the orders scan
    * against the previous FRONTIER only (standard recursive-CTE
    * semantics) — a BFS whose round count is log₈(max key), the same
    * bounded-rounds pattern as the connected-components fixpoint; the
    * final depth histogram is a map-side-combining aggregate. */
  def q40RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    // Round-17 (guide §2.4, verdict #8): the SAME recursion the oracle
    // text declares, evaluated as an explicit per-level loop instead of
    // through `WITH RECURSIVE`'s UnionLoop operator. The DuckDB oracle
    // still evaluates the unchanged ANSI text; what moved is only HOW
    // Spark executes it. Equivalence is structural — recursive UNION ALL
    // semantics are "L0 = anchor; L(k+1) = step(Lk); result = ⋃ Lk",
    // and the loop below computes exactly those levels:
    //  - L0 = roots (o_orderkey < 8) at depth 0;
    //  - L(k+1) = orders (o_orderkey >= 8) equi-joined on key-parent
    //    = chain row of Lk, depth+1, path extended — the identical join
    //    and arithmetic expressions as the text;
    //  - stop when a level is empty; aggregate the union by depth.
    // Q40EquivalenceSpec additionally proves row-identity against
    // Spark's own evaluation of the oracle text.
    // Why: UnionLoop re-planned a growing plan per level and re-scanned
    // orders each round; here the iterate relation is pruned to three
    // BIGINTs and materialized ONCE (one scan total), each frontier is
    // checkpointed so every level's plan is one bounded equi-join (the
    // connectedComponents fixpoint pattern), and the join carries no
    // broadcast hint — AQE broadcasts the small frontier at test scale
    // and degrades to a hash join at 100 TB.
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val children = orders.filter(col("o_orderkey") >= 8)
      .withColumn("parent",
        expr("CAST((o_orderkey - (o_orderkey % 8)) / 8 AS BIGINT)"))
      .localCheckpoint()
    var frontier = orders.filter(col("o_orderkey") < 8)
      .select(col("o_orderkey"), lit(0L).as("depth"), col("cents").as("path_cents"))
      .localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame]()
    while (!frontier.isEmpty) {
      levels += frontier
      frontier = children
        .join(frontier.select(col("o_orderkey").as("parent"),
          col("depth"), col("path_cents")), Seq("parent"))
        .select(col("o_orderkey"), (col("depth") + 1L).as("depth"),
                (col("path_cents") + col("cents")).as("path_cents"))
        .localCheckpoint()
    }
    // degenerate no-anchor corpus: serve the empty frontier's shape
    (if (levels.isEmpty) frontier else levels.reduce(_.unionByName(_)))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_orders"), sum(col("path_cents")).as("total_path_cents"))
      .orderBy(col("depth"))
  }

  /** Per-user inter-event gap statistics (lag-window time deltas — the
    * behavioral-cadence feature behind sessionization thresholds and
    * bot detection): one lag over the (user, time) window yields each
    * event's distance to its predecessor in MICROSECONDS (integer — no
    * float duration math anywhere), then a map-side-combined aggregate
    * reduces each user to count/min/max/floored-mean. Scale shape: the
    * window partitions BY USER — millions of independent partitions,
    * never a global ordering — and the aggregate reuses the exact same
    * (user_id) partitioning, so Catalyst runs window + groupBy under ONE
    * shuffle. */
  def q34EventGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
           min(col("gap_us")).as("min_gap_us"),
           max(col("gap_us")).as("max_gap_us"),
           expr("sum(gap_us) div count(1)").as("avg_gap_us"))
      .orderBy(col("user_id"))
  }

  /** Explicit GROUPING SETS — the general form rollup/cube specialize
    * (q9/q18): per-priority totals, per-status totals, and the grand
    * total in ONE pass (Spark expands to a single Expand + one shuffle,
    * not three scans). */
  def q23GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
              coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
              col("n"), col("total"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  /** Exact per-group quantiles (p25/median/p75 of extended price per
    * return flag) — the distribution summary ntile/percent_rank (q26)
    * don't give: an actual interpolated value, not a rank. Determinism
    * contract: quantiles run over integer CENTS (round(price·100) —
    * exact for 2-decimal money), and interpolation fractions are
    * 0/.25/.5/.75, all negative powers of two, so `(hi-lo)·f` and the
    * final sum are EXACT doubles on any engine and any evaluation
    * order; only the one final /100 is an IEEE op, identical on both
    * sides. Spark's `percentile` is a partial-aggregating exact
    * implementation: per-partition value→count maps combine map-side,
    * so the shuffle carries distinct-value counts, not rows — at
    * 100 TB swap for approx_percentile only if the distinct-value
    * domain itself is unbounded (prices: it isn't). */
  def q35MedianIqr(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
           expr("percentile(cents, array(0.25D, 0.5D, 0.75D))").as("q"))
      .select(col("l_returnflag"), col("n_items"),
              (col("q")(0) / 100.0).as("p25"),
              (col("q")(1) / 100.0).as("median"),
              (col("q")(2) / 100.0).as("p75"))
      .orderBy(col("l_returnflag"))

  /** Forward-fill (last-observation-carried-forward): every event
    * annotated with the user's most recent purchase value at that point
    * in time — the standard gap-filling/feature-join primitive for
    * sparse signals on a dense event stream (no self-join, no as-of
    * join against a second table). One `last(..., ignoreNulls)` over a
    * per-user running ROWS frame: Spark evaluates it in a single pass
    * per partition with O(1) state, and the window partitions BY USER —
    * millions of independent partitions at scale, never a global sort.
    * Events before the user's first purchase stay NULL by design. */
  /** The as-of join AGAIN, through the custom operator
    * ([[graft.plans.AsOfJoin]]: LogicalPlan + Strategy + sort-merge
    * SparkPlan) instead of q14's window-over-one-table encoding — two
    * genuinely different physical paths hash-matched against the SAME
    * oracle. Purchases are the left (probe) side, errors the right;
    * the (ts, event_id) ordering tuple reproduces q14's deterministic
    * strictly-before tie-break exactly. */
  def q37AsOfCustom(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val errors = Tables.events(s, dir).filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("err_ts"),
              col("event_id").as("err_event"))
    graft.plans.AsOf.join(purchases, errors,
        Seq("user_id"), Seq("e_user"), Seq("ts", "event_id"), Seq("err_ts", "err_event"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
              col("err_ts").as("last_error_ts"))
      .orderBy(col("event_id"))
  }

  /** As-of join with a TOLERANCE bound (pandas merge_asof's
    * `tolerance=`): the matched error must be within 30 minutes of the
    * purchase or the match is dropped to NULL — staleness-bounded
    * enrichment ("most recent quote, but not if it's an hour old").
    * Pure composition: the custom operator keeps the full matched row,
    * so the bound is one projection-level `when` over the time delta —
    * no second join, no plan change. */
  def q38AsOfTolerance(s: SparkSession, dir: String, toleranceSec: Long = 1800): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val errors = Tables.events(s, dir).filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("err_ts"),
              col("event_id").as("err_event"))
    graft.plans.AsOf.join(purchases, errors,
        Seq("user_id"), Seq("e_user"), Seq("ts", "event_id"), Seq("err_ts", "err_event"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(unix_micros(col("ts")) - unix_micros(col("err_ts")) <= toleranceSec * 1000000L,
          col("err_ts")).as("recent_error_ts"))
      .orderBy(col("event_id"))
  }

  /** INTERVAL-OVERLAP join via BINNING — the join shape Spark has no
    * native operator for (an `a.start <= b.end AND a.end >= b.start`
    * theta join plans as a nested-loop scan of every pair), re-expressed
    * as the canonical at-scale recipe: explode each interval into the
    * fixed-width bins it touches and equi-join on the bin key. Here:
    * user sessions (30-min-gap sessionization, the q12 rule) against
    * "incident hours" (hour buckets holding ≥ `errThreshold` error
    * events) — which sessions were exposed to each incident window. The
    * bin explosion is bounded by interval duration / bin width (a
    * session touching h hours emits h+1 rows), the join is hash-
    * partitioned on the hour key, and because a session's bin range is
    * exactly the hours its closed [start, end] touches, bin membership
    * IS the overlap predicate — no post-filter, no dedup. The oracle
    * plays the naive theta join (fine at test scale) against this plan,
    * proving the rewrite exact. */
  def q39IntervalJoin(s: SparkSession, dir: String, errThreshold: Long = 6): DataFrame = {
    val e = Tables.events(s, dir).withColumn("ts_sec", col("ts").cast("long"))
    // sub-second order differences must not flip the lag: both engines
    // sessionize over the SAME total order (ts_sec, event_id)
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val sessions = e
      .withColumn("prev_sec", lag(col("ts_sec"), 1).over(wUser))
      .withColumn("new_sess",
        when(col("prev_sec").isNull || col("ts_sec") > col("prev_sec") + 1800L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts_sec")).as("sstart"), max(col("ts_sec")).as("send"))
    val incidents = e.filter(col("event_type") === "error")
      .groupBy(expr("ts_sec div 3600").as("hb"))
      .agg(count(lit(1)).as("n_err"))
      .filter(col("n_err") >= errThreshold)
    sessions
      .select(col("user_id"),
        explode(expr("sequence(sstart div 3600, send div 3600)")).as("hb"))
      .join(incidents, Seq("hb"))
      .groupBy(col("hb").as("incident_hour"))
      .agg(max(col("n_err")).as("n_err"), // constant within the hour
           count(lit(1)).as("n_sessions"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("incident_hour"))
  }

  def q36GapFill(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("last_purchase",
        last(when(col("event_type") === "purchase", col("value")),
             ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"), col("last_purchase"))
      .orderBy(col("event_id"))
  }
}

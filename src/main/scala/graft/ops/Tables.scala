package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query in [[graft.SparkEntry]] takes `(spark, sfDir)` and reads
  * from these. At 100 TB these would be partitioned directory trees; the
  * loaders centralize the access so swapping layout means one change.
  */
object Tables {
  private val names = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Cross-engine-stable 6-decimal truncation: floor(x·1e6)/1e6. Unlike
    * round(), bit-identical across Spark and DuckDB for the same double
    * input (half-way rounding modes differ between engines). ONE shared
    * definition for every ops module — the truncation scheme is oracle
    * contract, and four drifting private copies was a review finding. */
  private[ops] def trunc6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.floor(c * 1000000.0) / 1000000.0

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects by default (PARQUET_TYPE_ILLEGAL). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` — set at SparkSession
    * build by every harness (Verify/Bench/test fixture), NOT here: a
    * loader must not mutate global session conf — the nanos arrive as a
    * long, floor-divided to µs. DuckDB reads the same column as
    * TIMESTAMP_NS without truncating; the driver's test data is
    * µs-aligned (sub-µs components are zero), so the floor-divide is
    * lossless and both engines see identical instants. If a future
    * generator emitted sub-µs precision, the oracle side would need an
    * explicit µs truncation to keep boundary predicates in agreement. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at SparkSession build to read events.parquet")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` can be used. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

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
  /** events.parquet's `ts` physical type has varied across driver
    * regenerations of the test data — TIMESTAMP(NANOS) in earlier
    * rounds (readable only as a long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`), plain TIMESTAMP(µs)
    * now. Normalize every layout to a session-zone TimestampType
    * column so downstream queries and the DuckDB oracle agree on
    * instants regardless of which generation is on disk:
    *  - LongType (nanos-as-long): floor-divide to µs — the data is
    *    µs-aligned, so this is lossless;
    *  - TIMESTAMP_NTZ (µs, not UTC-adjusted): cast to TimestampType;
    *    with the harness-wide UTC session zone the naive values are
    *    reinterpreted as the same UTC instants DuckDB sees;
    *  - TimestampType: already the target shape. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // A silent pass-through here let an unexpected type (e.g.
        // StringType from a bad regeneration, or NANOS read without the
        // legacy conf surfacing Spark's raw PARQUET_TYPE_ILLEGAL) reach
        // downstream timestamp arithmetic — fail with the fix instead.
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected TIMESTAMP(µs)/" +
          "TIMESTAMP_NTZ, or a NANOS file read as LongType via " +
          "spark.sql.legacy.parquet.nanosAsLong=true")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` can be used.
    * `events` routes through [[events]] so the SQL interface sees the
    * same normalized TimestampType `ts` as every DataFrame-path
    * consumer (a raw load would expose TIMESTAMP_NTZ to SQL only). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}

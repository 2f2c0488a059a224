package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time queries (3 rounds), dump formatted plans, or show
  * rows. `runMain graft.Prof q1 q2` times; `-explain q` plans;
  * `-show q` prints up to 100 result rows. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // honors SPARK_GRAFT_CPUS like Bench (round-17: core-ratio debugging)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", Scratch.localDir)
      .config("spark.sql.warehouse.dir", Scratch.localDir + "/warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val explain = args.headOption.contains("-explain")
    val show = args.headOption.contains("-show")
    val names = if (explain || show) args.drop(1).toSeq else args.toSeq
    if (explain)
      names.foreach { n =>
        println(s"===== $n =====")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    else if (show)
      names.foreach { n =>
        println(s"===== $n =====")
        SparkEntry.queries(n)(spark, sfDir).show(100, truncate = false)
      }
    else
      for (round <- 1 to 3; n <- names) {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[$round] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    spark.stop()
  }
}

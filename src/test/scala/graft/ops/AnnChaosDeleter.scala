package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM deleter for `AnnCrossProcessChaosSpec`: a SECOND real
  * process (own SparkSession, own JVM — no shared in-process table
  * locks) issuing a stream of single-id tombstone deletes against the
  * same durable warehouse while the spec's JVM runs
  * [[IndexTables.rebuildAnnIndexes]]. Each delete's ack (id, newly
  * deleted count, and the generation it committed into) is appended to
  * `ackFile` AFTER [[IndexTables.deleteFromAnnIndex]] returns — the
  * acked set is exactly what the spec asserts can never be served.
  *
  * No generation registration is performed for claimed generations:
  * the delete path must resolve the flip from DURABLE state alone
  * (claim files → [[IndexTables.durableFrontierGen]]), exactly as a
  * process with a cold catalog would — the harder half of the race.
  */
object AnnChaosDeleter {
  def main(args: Array[String]): Unit = {
    val Array(warehouse, fix, ackPath, stopPath) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-chaos-deleter")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.local.dir", graft.Scratch.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // victim stream: every 3rd id, ascending — enough to outlast the
      // spec's two rebuild windows at one delete per iteration
      val victims = spark.read.parquet(s"$fix/embeddings.parquet")
        .select(col("vec_id")).filter(col("vec_id") % 3 === 0)
        .collect().map(_.getLong(0)).sorted
      // gen-0 registration ONCE: the spec's JVM built the seed tables;
      // without it this session's ensureIvfIndex would classify the
      // durable dir as an orphan and delete-and-rebuild it out from
      // under the racing process. Claimed generations are deliberately
      // NOT registered: the delete path must stay correct on durable
      // state alone (frontier-targeted, catalog-free).
      syncCatalog(spark, fix, warehouse)
      val ack = new java.io.PrintWriter(new java.io.FileWriter(ackPath, true))
      val stop = new java.io.File(stopPath)
      var i = 0
      while (!stop.exists() && i < victims.length) {
        val id = victims(i)
        // one retry: concurrent parquet appends from two processes can
        // clash on the committer's _temporary staging; the delete is
        // idempotent (anti-join), so a re-issue is always safe
        val n = try IndexTables.deleteFromAnnIndex(spark, fix, Seq(id))
                catch { case _: Exception =>
                  IndexTables.deleteFromAnnIndex(spark, fix, Seq(id)) }
        val g = IndexTables.durableFrontierGen(spark, fix)
        ack.println(s"$id,$n,$g"); ack.flush()
        i += 1
      }
      ack.close()
    } finally {
      // done marker LAST: the spec only reads acks after seeing it
      new java.io.FileWriter(ackPath + ".done").close()
      spark.stop()
    }
    sys.exit(0)
  }

  private def syncCatalog(s: SparkSession, dir: String, warehouse: String): Unit = {
    def register(tbl: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(warehouse)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val dataDir = new org.apache.hadoop.fs.Path(warehouse, tbl)
      if (!s.catalog.tableExists(tbl) && fs.exists(dataDir))
        s.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$dataDir'")
    }
    register(IndexTables.annIvfName(dir, 0L))
    register(IndexTables.annPqName(dir, 0L))
  }
}

package graft

/** Scratch-space selection for Spark's shuffle/spill files
  * (`spark.local.dir`).
  *
  * Shuffle blocks are written to local disk between stages; on this
  * harness's VM the root disk's buffered-write throughput can be an
  * order of magnitude below memory bandwidth, which turns every
  * shuffle-heavy query into a disk-writeback stall (measured: a
  * documents-table explode+shuffle query at sf0.1 went 2.5 s → 87 s on
  * a boot whose disk wrote at ~20 MB/s). The box has 128 GiB RAM and
  * sf0.1 shuffle volumes are a few GiB at most, so RAM-backed tmpfs is
  * the right local-mode scratch tier — the single-node analogue of the
  * NVMe shuffle volumes a real cluster's executors mount.
  */
object Scratch {
  /** `/dev/shm/graft-spark` when tmpfs is present and writable,
    * otherwise the JVM temp dir (Spark's own default). */
  lazy val localDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark")
      d.mkdirs()
      d.getAbsolutePath
    } else sys.props.getOrElse("java.io.tmpdir", "/tmp")
  }
}

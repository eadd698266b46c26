package graft.core

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for the engine.
  *
  * The same knobs apply on a real cluster (where `master` comes from
  * spark-submit): AQE with skew-join splitting on, shuffle partitions
  * sized to the available parallelism (the driver re-sizes via AQE
  * coalescing at runtime), UTC everywhere, ANSI off for
  * null-out-of-range semantics that match the warehouse oracles.
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    configure(SparkSession.builder().appName(appName))

  /** Shuffle/spill scratch on tmpfs when available: local[] mode on a
    * single box is otherwise bottlenecked by VM-disk bandwidth, which
    * flattens core-count scaling (on a real cluster this is the
    * NVMe-backed spark.local.dir of each executor). */
  private def localDir: Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark-local")
      d.mkdirs()
      Some(d.getAbsolutePath)
    } else None
  }

  def configure(b: SparkSession.Builder): SparkSession.Builder =
    localDir.fold(b)(d => b.config("spark.local.dir", d))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // read parquet TIMESTAMP(isAdjustedToUTC=false) as TIMESTAMP, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session with `cpus` threads; shuffle partitions sized to match
    * (not Spark's default 200 — pointless task overhead at local scale).
    */
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = builder(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft.tools

import graft.core.GraftSession

/** Parameterized dev profiler: time any SparkEntry query (noop sink) at
  * a chosen SF and parallelism, optionally dumping the formatted plan.
  *
  * usage: runMain graft.tools.Profile <queryName ...> [--sf <dir>]
  *        [--cpus <n>] [--explain] [--repeat <n>]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.01"
    var cpus = 8
    var explain = false
    var repeat = 1
    val names = scala.collection.mutable.Buffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf"      => sfDir = args(i + 1); i += 2
        case "--cpus"    => cpus = args(i + 1).toInt; i += 2
        case "--explain" => explain = true; i += 1
        case "--repeat"  => repeat = args(i + 1).toInt; i += 2
        case q           => names += q; i += 1
      }
    }
    require(names.nonEmpty, s"usage: Profile <queryName ...>; known: " +
      graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))

    val spark = GraftSession.local(cpus, "profile")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query '$n'"))
      if (explain) { println(s"########## $n ##########"); fn(spark, sfDir).explain("formatted") }
      (1 to repeat).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[profile] $n run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

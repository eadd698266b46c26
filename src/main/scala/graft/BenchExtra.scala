package graft

import graft.core.GraftSession

/** Optimization-round measurement harness (guide §1.4/§1.5) — separate
  * from the FROZEN driver-contract [[Bench]].
  *
  * For each named query (default: all of [[SparkEntry.queries]]):
  *  - times `fn(spark, sfDir).write.format("noop")` REPS times (same
  *    action as Bench, so numbers are comparable) and reports every
  *    sample plus the min;
  *  - optionally dumps the final DataFrame's `explain("formatted")` to
  *    `$SPARK_GRAFT_PLAN_DIR/<name>_$SPARK_GRAFT_PLAN_SUFFIX.txt`.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default
  * 3), SPARK_GRAFT_PLAN_DIR (default: no plan dump),
  * SPARK_GRAFT_PLAN_SUFFIX (default "before").
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = GraftSession.local(cpus, "graft-bench-extra")

    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      var last: org.apache.spark.sql.DataFrame = null
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        last = fn(spark, sfDir)
        last.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (planDir.nonEmpty) {
        val txt = last.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(planDir, s"${name}_$suffix.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p,
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      spark.sparkContext.setJobDescription(null)
      (name, times)
    }
    results.foreach { case (n, ts) =>
      println(f"BENCHX $n%-30s min=${ts.min}%7.3f  samples=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
    val qJson = results
      .map { case (n, ts) => s""""$n":${f"${ts.min}%.3f"}""" }
      .mkString("{", ",", "}")
    println(s"""BENCHX_JSON {"min_total":${f"${results.map(_._2.min).sum}%.3f"},"queries":$qJson}""")
    spark.stop()
  }
}

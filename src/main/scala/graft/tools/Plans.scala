package graft.tools

import graft.core.GraftSession

/** Dump formatted physical plans for the key queries (dev tool). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "plans")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_agg_basic", "q03_join_agg", "q09_asof_join")
    names.foreach { n =>
      println(s"########## $n ##########")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

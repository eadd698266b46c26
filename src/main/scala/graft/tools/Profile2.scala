package graft.tools

import graft.core.GraftSession

/** Isolated timing of the LSH-family queries (dev tool). */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "profile2")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Seq(1, 2).foreach { round =>
      time(s"q22 minhash r$round")(
        graft.QueriesExtra.q22MinhashCandidates(spark, dir)
          .write.mode("overwrite").format("noop").save())
      time(s"q25 simhash r$round")(
        graft.QueriesExtra.q25Simhash(spark, dir)
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}

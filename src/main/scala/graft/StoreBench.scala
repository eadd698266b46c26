package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.datagen.DocsGen
import graft.dedup.DedupStore

/** Incremental-dedup-store scaling evidence: probe a FIXED increment
  * against stores of growing size. The store's 100 TB claim is that
  * per-increment probe cost tracks the increment (plus a columnar scan
  * of digest tables that are ~5% of corpus bytes), NOT the history —
  * the batch alternative re-pays the full-corpus LSH shuffle per
  * increment. This harness measures exactly that: build wall (the
  * one-time cost that grows with the store) vs newDocs/nearDups probe
  * walls (which must grow only with the digest scan), min-of-3 per
  * level (host CPU drifts across minutes — BASELINE.md methodology).
  *
  * Increment shape: half exact copies of store docs (every probe path
  * exercised: fingerprint hits, band collisions, signature fetches),
  * half fresh docs (ids past the largest store level, so "fresh" stays
  * fresh at every level and row counts are exactly predictable).
  *
  * usage: runMain graft.StoreBench <nInc> <nStore1,nStore2,...> [dir]
  */
object StoreBench {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def min3[A](f: => A): (Double, A) =
    (1 to 3).map(_ => time(f)).minBy(_._1)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StoreBench <nInc> <nStore1,nStore2,...> [dir]")
    val nInc = args(0).toLong
    val levels = args(1).split(",").map(_.trim.toLong).toSeq
    val base = args.lift(2).getOrElse("/tmp/graft_store_bench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus, "graft-store-bench")
    import spark.implicits._

    val freshBase = levels.max + 1000000L
    // copies of store ids [0, nInc/2) + fresh text never in any store
    val increment = spark.range(nInc).map { i =>
      if (i < nInc / 2) (10000000L + i, DocsGen.text(i))
      else (10000000L + i, DocsGen.text(freshBase + i))
    }.toDF("doc_id", "text").localCheckpoint()

    val rows = levels.map { n =>
      val dir = s"$base/store_$n"
      val (buildS, st) = time {
        DedupStore.build(DocsGen.docs(spark, n), "text", "doc_id", dir)
      }
      val (newS, newRows) =
        min3(DedupStore.newDocs(st, increment, "text", "doc_id").count())
      val (nearS, nearRows) =
        min3(DedupStore.nearDups(st, increment, "text", "doc_id", 0.9).count())
      val digestBytes = {
        def du(p: String): Long = {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getContentSummary(hp).getLength
        }
        du(s"$dir/fingerprints") + du(s"$dir/signatures") + du(s"$dir/buckets")
      }
      f"""{"store":$n,"build_s":$buildS%.2f,"new_s":$newS%.3f,""" +
        f""""near_s":$nearS%.3f,"new_rows":$newRows,"near_rows":$nearRows,""" +
        s""""digest_mb":${digestBytes / 1048576}}"""
    }
    println(s"""{"metric":"store_probe","unit":"sec","cpus":$cpus,""" +
      s""""inc":$nInc,"levels":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}

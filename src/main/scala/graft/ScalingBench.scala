package graft

import org.apache.spark.sql.SparkSession

import graft.asof.AsOfJoin
import graft.core.GraftSession
import graft.datagen.TranscriptGen
import graft.features.TranscriptFeatures

/** Two-cluster-size scaling evidence (north_rule: throughput scaling
  * efficiency >= 0.8 between N and 4N executors; sandbox stand-in = the
  * same job at two local[] parallelism levels over the same input).
  *
  * Usage: runMain graft.ScalingBench [nTurnsTarget] [cpusCsv]
  * Defaults: ~2M turns, cpus "2,8,32". Prints one JSON line per level
  * plus a final efficiency line for each adjacent 4x pair.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val targetTurns = args.headOption.map(_.toInt).getOrElse(2000000)
    val cpuLevels = args.lift(1).getOrElse("2,8,32").split(",").map(_.trim.toInt).toSeq
    val nConvs = targetTurns / 25
    val path = s"/tmp/graft_scaling_turns_$nConvs.parquet"

    // generate once (not timed) with full parallelism
    locally {
      val s = GraftSession.local(Runtime.getRuntime.availableProcessors(), "scaling-gen")
      if (!new java.io.File(path).exists()) {
        import s.implicits._
        TranscriptGen.turns(s, nConvs, avgTurns = 25, hotConvs = 10,
          hotFactor = 50, seed = 42L).toDF()
          .write.mode("overwrite").parquet(path)
      }
      s.stop()
    }

    val results = cpuLevels.map { cpus =>
      val s = GraftSession.local(cpus, s"scaling-$cpus")
      import s.implicits._
      val turns = s.read.parquet(path)
      val n = turns.count()

      // warmup, untimed: primes the OS page cache with the full input
      // (all columns) and JIT/codegen, so every level reads warm
      TranscriptFeatures.turnFeaturesNarrow(turns)
        .write.mode("overwrite").format("noop").save()

      // min of 3 reps: the sandbox host's delivered CPU drifts across
      // minutes; min is the standard noise-robust wall-clock estimator
      def timeMin(reps: Int)(f: => Unit): Double =
        (1 to reps).map { _ =>
          val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
        }.min

      val matSec = timeMin(3) {
        TranscriptFeatures.turnFeaturesNarrow(turns)
          .write.mode("overwrite").format("noop").save()
      }

      val feats = TranscriptFeatures.turnFeaturesNarrow(turns)
        .select("conv_id", "ts", "turn_idx", "turns_so_far", "tokens_so_far")
      val probes = TranscriptGen.probes(s, turns.as[graft.features.Turn])
        .withColumnRenamed("ts", "probe_ts")
      val asofSec = timeMin(3) {
        AsOfJoin.backward(probes, feats, Seq("conv_id"), "probe_ts", "ts",
          Some(30L * 86400L), Seq("turn_idx"))
          .write.mode("overwrite").format("noop").save()
      }
      s.stop()

      val tps = n / matSec
      println(
        s"""{"bench":"scaling","cpus":$cpus,"turns":$n,""" +
        s""""materialize_sec":${f"$matSec%.2f"},"turns_per_sec":${f"$tps%.0f"},""" +
        s""""asof_sec":${f"$asofSec%.2f"}}""")
      (cpus, tps, asofSec)
    }

    for {
      (c1, t1, _) <- results
      (c2, t2, _) <- results
      if c2 == 4 * c1
    } {
      val eff = (t2 / t1) / 4.0
      println(s"""{"bench":"scaling_efficiency","from_cpus":$c1,"to_cpus":$c2,""" +
        s""""efficiency":${f"$eff%.3f"}}""")
    }
  }
}

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
    val levelsArg = args.lift(1).getOrElse("2,8,32")
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
    // "gen" = generate-only (used by tools/scaling_pinned.sh so the
    // pinned level JVMs never pay generation inside their core budget)
    if (levelsArg == "gen") { println("""{"bench":"scaling_gen_done"}"""); return }
    val cpuLevels = levelsArg.split(",").map(_.trim.toInt).toSeq

    // INTERLEAVED rounds: each round times every cpu level once, so the
    // levels sample the same host-load windows — a load spike inflates
    // the same round at both levels instead of silently penalizing
    // whichever level happened to run later (the sandbox host's
    // delivered CPU drifts across minutes). Per-level wall = min over
    // rounds (the standard noise-robust estimator); JIT/codegen and the
    // OS page cache persist across the per-round sessions, so only the
    // very first round pays warmup and the min discards it.
    val rounds = 3
    val matSamples = scala.collection.mutable.Map.empty[Int, List[Double]]
      .withDefaultValue(Nil)
    val asofSamples = scala.collection.mutable.Map.empty[Int, List[Double]]
      .withDefaultValue(Nil)
    var nTurns = 0L

    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }

    for (round <- 1 to rounds; cpus <- cpuLevels) {
      val s = GraftSession.local(cpus, s"scaling-$cpus-r$round")
      import s.implicits._
      val turns = s.read.parquet(path)
      if (round == 1 && cpus == cpuLevels.head) {
        nTurns = turns.count()
        // untimed warmup: page cache + JIT/codegen
        TranscriptFeatures.turnFeaturesNarrow(turns)
          .write.mode("overwrite").format("noop").save()
      }
      matSamples(cpus) = time {
        TranscriptFeatures.turnFeaturesNarrow(turns)
          .write.mode("overwrite").format("noop").save()
      } :: matSamples(cpus)

      val feats = TranscriptFeatures.turnFeaturesNarrow(turns)
        .select("conv_id", "ts", "turn_idx", "turns_so_far", "tokens_so_far")
      val probes = TranscriptGen.probes(s, turns.as[graft.features.Turn])
        .withColumnRenamed("ts", "probe_ts")
      asofSamples(cpus) = time {
        AsOfJoin.backward(probes, feats, Seq("conv_id"), "probe_ts", "ts",
          Some(30L * 86400L), Seq("turn_idx"))
          .write.mode("overwrite").format("noop").save()
      } :: asofSamples(cpus)
      s.stop()
    }

    val results = cpuLevels.map { cpus =>
      val matSec = matSamples(cpus).min
      val asofSec = asofSamples(cpus).min
      val tps = nTurns / matSec
      println(
        s"""{"bench":"scaling","cpus":$cpus,"turns":$nTurns,""" +
        s""""materialize_sec":${f"$matSec%.2f"},"turns_per_sec":${f"$tps%.0f"},""" +
        s""""asof_sec":${f"$asofSec%.2f"},""" +
        s""""mat_samples":[${matSamples(cpus).reverse.map(x => f"$x%.2f").mkString(",")}]}""")
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

package graft.datagen

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.features.Turn

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Pure function of (seed, conv index): each conversation is generated
  * independently from its own PRNG, so the output is identical regardless
  * of partitioning or parallelism — a requirement for the two-parallelism
  * scaling benchmark and for resumable materialization tests.
  *
  * Distributed via `spark.range(nConvs).flatMap`, so generation itself
  * scales with the cluster; no driver-side materialization.
  *
  * Skew: the first `hotConvs` conversations get `hotFactor`× the turns of
  * the median conversation (north_star: "skew from hot conversations").
  * Duplicate-ts turn pairs are injected (~2% of turns) to exercise as-of
  * tie-breaking; inter-turn gaps occasionally exceed any session gap
  * threshold to create session boundaries.
  */
object TranscriptGen {

  /** Generator identity for cache keys: BUMP whenever `turns`/`genConv`
    * output changes for the same parameters. Bench caches generated
    * parquet keyed by (params, seed, this) — without the version a
    * generator change would silently benchmark stale cached data. */
  val Version: String = "g1"

  private val Vocab: Array[String] =
    ("the quick brown fox jumps over lazy dog spark scala feature engine " +
      "join window agg token session tool user assistant plan query data " +
      "table row column batch stream shuffle partition skew hash sort merge")
      .split(" ")

  private val Tools: Array[String] =
    Array("search", "calculator", "browser", "code_run", "db_query")

  val Roles: Array[String] = Array("user", "assistant", "system", "tool")

  def turns(
      spark: SparkSession,
      nConvs: Int,
      avgTurns: Int = 20,
      hotConvs: Int = 0,
      hotFactor: Int = 50,
      seed: Long = 42L,
      startEpochSec: Long = 1704067200L /* 2024-01-01T00:00:00Z */ ): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, nConvs.toLong, 1)
      .flatMap { convIdx =>
        genConv(convIdx, avgTurns, hotConvs, hotFactor, seed, startEpochSec)
      }
  }

  /** One conversation, deterministically from (seed, convIdx). */
  def genConv(
      convIdx: Long,
      avgTurns: Int,
      hotConvs: Int,
      hotFactor: Int,
      seed: Long,
      startEpochSec: Long): Seq[Turn] = {
    val rng = new scala.util.Random(seed * 1000003L + convIdx)
    val convId = f"conv_$convIdx%08d"
    val base = 2 + rng.nextInt(math.max(1, 2 * avgTurns - 2))
    val n = if (convIdx < hotConvs) base * hotFactor else base
    // Conversations start at staggered offsets so event time interleaves
    // across conversations (realistic for range-partitioned backfill).
    var tsMicros =
      (startEpochSec + (convIdx % 86400L) * 60L + rng.nextInt(3600)) * 1000000L
    (0 until n).map { i =>
      val role = if (i == 0) "user" else Roles(rng.nextInt(Roles.length)) match {
        case "system" if i > 2 => "assistant" // systems mostly lead
        case r                 => r
      }
      val nWords = 3 + rng.nextInt(40)
      val text = Array.fill(nWords)(Vocab(rng.nextInt(Vocab.length))).mkString(" ")
      val tool =
        if (role == "tool" || (role == "assistant" && rng.nextInt(5) == 0))
          Tools(rng.nextInt(Tools.length))
        else ""
      val t = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        tsMicros / 1000000L, (tsMicros % 1000000L) * 1000L))
      val turn = Turn(convId, i, role, text, tool, t)
      // advance event time: ~2% duplicate-ts pairs, occasional large gaps
      // (session boundaries), otherwise seconds-scale gaps
      val advance = rng.nextInt(100) match {
        case x if x < 2  => 0L                                  // duplicate ts
        case x if x < 8  => (1800L + rng.nextInt(7200)) * 1000000L // session gap
        case _           => (1L + rng.nextInt(120)).toLong * 1000000L + rng.nextInt(1000000)
      }
      tsMicros += advance
      turn
    }
  }

  /** Deterministic probe set for point-in-time retrieval tests
    * (FIXTURES.md §1): `perConv` probes per conversation. The first 4
    * are the fixed edge cases — before-first-turn (expect nulls),
    * exactly-on-turn, mid-stream, after-last-turn; probes beyond 4 are
    * seeded hash-derived mid-stream timestamps, so probe density is
    * tunable without losing determinism.
    */
  def probes(spark: SparkSession, ts: Dataset[Turn], perConv: Int = 4, seed: Long = 7L)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(perConv >= 1, s"perConv must be >= 1, got $perConv")
    val bounds = ts.groupBy(col("conv_id"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    val span = col("hi").cast("double") - col("lo").cast("double")
    val fixed = Seq(
      // before first turn (expect nulls)
      col("lo") - expr("INTERVAL 1 HOUR"),
      // exactly on a turn
      col("lo"),
      // mid-stream
      to_timestamp(from_unixtime(col("lo").cast("double") + span / 2.0)),
      // after last turn
      col("hi") + expr("INTERVAL 10 MINUTES"))
    val extra = (4 until perConv).map { j =>
      val frac = pmod(xxhash64(col("conv_id"), lit(seed), lit(j)), lit(1000L))
        .cast("double") / 1000.0
      to_timestamp(from_unixtime(col("lo").cast("double") + frac * span))
    }
    bounds.select(
      col("conv_id"),
      explode(array((fixed ++ extra).take(perConv): _*)).as("ts"))
  }
}

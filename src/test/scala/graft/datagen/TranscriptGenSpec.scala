package graft.datagen

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TranscriptGenSpec extends SparkTestBase {
  import spark.implicits._

  test("deterministic and partitioning-invariant") {
    val a = TranscriptGen.turns(spark, 50, avgTurns = 8, seed = 42L)
      .collect().sortBy(t => (t.conv_id, t.turn_idx)).toSeq
    val b = TranscriptGen.turns(spark, 50, avgTurns = 8, seed = 42L)
      .repartition(13).collect().sortBy(t => (t.conv_id, t.turn_idx)).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("hot conversations are ~hotFactor× longer; ts monotone per conv; dup-ts pairs exist") {
    val t = TranscriptGen.turns(spark, 40, avgTurns = 10, hotConvs = 2,
      hotFactor = 25, seed = 1L).toDF()
    val sizes = t.groupBy($"conv_id").count()
      .as[(String, Long)].collect().toMap
    val hot = Seq("conv_00000000", "conv_00000001").map(sizes)
    val cold = sizes.filterNot(kv => kv._1 < "conv_00000002").values
    assert(hot.min > cold.max * 5, s"hot=$hot coldMax=${cold.max}")

    val rows = t.orderBy($"conv_id", $"turn_idx")
      .select($"conv_id", $"ts".cast("long"))
      .as[(String, Long)].collect()
    rows.sliding(2).foreach {
      case Array((c1, t1), (c2, t2)) if c1 == c2 => assert(t2 >= t1)
      case _ =>
    }
    // duplicate-ts pairs exist somewhere (as-of tie-break coverage)
    val dups = t.groupBy($"conv_id", $"ts").count().filter($"count" > 1).count()
    assert(dups > 0)
  }

  test("probes cover before-first (nulls expected) through after-last") {
    val turns = TranscriptGen.turns(spark, 10, avgTurns = 6, seed = 3L)
    val p = TranscriptGen.probes(spark, turns)
    assert(p.count() === 40) // 4 probes per conversation
  }
}

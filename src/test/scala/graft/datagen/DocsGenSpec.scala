package graft.datagen

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.pipeline.PretrainPipeline

/** The planted mixture of the pipeline-benchmark corpus, especially the
  * star near-dup cluster (ids ≡ 13/14/15 mod 20) on which the pair-local
  * and transitive canonicalizations must DIVERGE by exactly one survivor
  * per block — the property the 1M-doc BASELINE.md record reports.
  */
class DocsGenSpec extends SparkTestBase {
  import spark.implicits._

  test("star cluster: exact 3-gram Jaccards straddle the 0.8 threshold as planted") {
    val ids = (0L until 200L).filter(i => Seq(13L, 14L, 15L).contains(i % 20))
    val docs = ids.map(i => (i, DocsGen.text(i))).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardExact(docs, "text", "doc_id",
      shingleWidth = 3, threshold = 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    (0L until 200L by 20L).foreach { b =>
      assert(pairs.contains((b + 13, b + 15)), s"missing edge (13,15) in block $b")
      assert(pairs.contains((b + 14, b + 15)), s"missing edge (14,15) in block $b")
      assert(!pairs.contains((b + 13, b + 14)),
        s"leaves of star block $b must be below the threshold")
    }
    // no cross-block contamination
    assert(pairs.forall { case (a, b) => a / 20 === b / 20 })
  }

  test("pairdrop and components survivor sets diverge by exactly n/20 (the star mid-nodes)") {
    val docs = DocsGen.docs(spark, 200L)
    def survivors(c: PretrainPipeline.Canonicalize): Set[Long] =
      PretrainPipeline.clean(docs, "text", "doc_id",
        cfg = PretrainPipeline.Config(canonicalize = c))
        .select($"doc_id").as[Long].collect().toSet
    val pair = survivors(PretrainPipeline.Canonicalize.PairDrop)
    val comp = survivors(PretrainPipeline.Canonicalize.Components)

    // per 20-block: 0-12 and 16 unique; 13 is each canonicalization's
    // cluster minimum; 17 exact-dup'd; 18/15 near-dup-dropped by both;
    // 19 filtered. The models differ ONLY on the star's mid node 14.
    val expectComp = (0L until 200L).filter { i =>
      val m = i % 20; m <= 13 || m == 16
    }.toSet
    assert(comp === expectComp)
    assert(pair === expectComp ++ (0L until 200L).filter(_ % 20 == 14))
    assert(pair.size - comp.size === 10, "divergence must be exactly n/20")
  }
}

package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("bruteForceTopK: exact cosine ranking on handcrafted vectors") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.9f, 0.1f)),
      (12L, Array(0.0f, 1.0f)),
      (13L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")

    val got = Similarity.bruteForceTopK(queries, corpus, "vec_id", "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq
    assert(got === Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)))
  }

  test("ivfTopK: high recall vs brute force on the real embeddings table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet

    val brute = pairs(Similarity.bruteForceTopK(
      queries, emb, "vec_id", "vec_id", "embedding", k = 10))
    val ivf = pairs(Similarity.ivfTopK(
      queries, emb, "vec_id", "vec_id", "embedding",
      k = 10, nCentroids = 8, nProbe = 4, dim = 64))

    assert(brute.size === 100)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
    // the trivial self-match must always be found
    assert((0L until 10L).forall(q => ivf.contains((q, q))))
  }
}

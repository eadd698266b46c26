package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Build-once / query-many IVF index: correctness vs the one-shot
  * [[Similarity.ivfTopK]], determinism across query rounds, and the
  * serving-path plan gates (no Lloyd aggregation jobs in the query plan;
  * corpus scan partition-pruned to the probed cells).
  */
class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val indexDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val copies = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    IvfIndex.build(emb.unionByName(copies), "vec_id", "embedding", d,
      nCentroids = 16, dim = 64)
    d
  }

  private def queries = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding").filter($"vec_id" < 10)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq

  test("query equals the one-shot ivfTopK on the same corpus and params") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val copies = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val oneShot = rows(Similarity.ivfTopK(
      queries, emb.unionByName(copies), "vec_id", "vec_id", "embedding",
      k = 5, nCentroids = 16, nProbe = 4, dim = 64))
    val indexed = rows(IvfIndex.query(
      spark, indexDir, queries, "vec_id", "embedding", k = 5, nProbe = 4))
    assert(indexed === oneShot)
    // the planted identical copy is always probed and lands at rank 2
    assert((0L until 10L).forall(q => indexed.contains((q, q + 100000L, 2))))
  }

  test("two query rounds of one build return identical results") {
    val r1 = rows(IvfIndex.query(
      spark, indexDir, queries, "vec_id", "embedding", k = 5, nProbe = 4))
    val r2 = rows(IvfIndex.query(
      spark, indexDir, queries, "vec_id", "embedding", k = 5, nProbe = 4))
    assert(r1 === r2)
    assert(r1.size === 50)
  }

  test("append: new vectors are probed exactly like build-time ones") {
    val d = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    IvfIndex.build(emb, "vec_id", "embedding", d, nCentroids = 16, dim = 64)
    val before = rows(IvfIndex.query(
      spark, d, queries, "vec_id", "embedding", k = 5, nProbe = 4))
    assert(!before.exists(_._2 >= 200000L))

    // append exact copies of the query vectors under new ids
    IvfIndex.append(
      emb.filter($"vec_id" < 10)
        .select(($"vec_id" + 200000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding", d)
    val after = rows(IvfIndex.query(
      spark, d, queries, "vec_id", "embedding", k = 5, nProbe = 4))
    // an appended identical copy shares the query's cell deterministically
    // (same centroid table), so it is always probed: cosine 1.0 at rank 2
    assert((0L until 10L).forall(q => after.contains((q, q + 200000L, 2))))
    // pre-existing neighbors keep their relative order below the copy
    assert((0L until 10L).forall(q => after.contains((q, q, 1))))
  }

  test("query plan: no Lloyd aggregation, corpus partition-pruned to probed cells") {
    val df = IvfIndex.query(
      spark, indexDir, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    df.collect() // AQE-final plan only visible after execution
    val p = df.queryExecution.executedPlan.toString
    // serving path must be a pure read: the Lloyd build (posexplode +
    // per-dimension AVG hash aggregates) must not run per query
    assert(!p.contains("posexplode"), s"Lloyd explode in the query plan:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"aggregation job in the query plan:\n$p")
    // the corpus scan must prune at the partition level to probed cells
    assert(p.contains("PartitionFilters: [centroid_id"),
      s"corpus scan not partition-pruned on centroid_id:\n$p")
    // the query batch is broadcast into the pruned scan, never shuffled
    // against the corpus via sort-merge
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast probe join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"probe join degraded to SMJ:\n$p")
  }
}

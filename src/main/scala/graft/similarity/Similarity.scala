package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small)
  *    query set against the corpus; one scan of the corpus, no corpus
  *    shuffle. The correctness baseline.
  *  - [[ivfTopK]] — IVF-style scale path: corpus is bucketed by nearest
  *    centroid (one-pass assignment against broadcast centroids); a
  *    query probes only its `nProbe` nearest centroid buckets, cutting
  *    scanned rows to ~nProbe/nCentroids of the corpus. Centroids are
  *    chosen deterministically (hash-sampled corpus vectors), then
  *    refined with one Lloyd iteration — all DataFrame aggregations.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Exact cosine top-k per query.
    *
    * @param queries (queryIdCol, vecCol) — assumed small; broadcast
    * @param corpus  (idCol, vecCol) — scanned once, never shuffled except
    *                the final per-query top-k (k rows per query survive
    *                the map-side partial top-k)
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("_qv"))
    val c = graft.dedup.Dedup.spread(corpus).select(
      col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", Dedup.cosineSim(col("_qv"), col("_cv")))
    topKPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic centroids: hash-sample `n` corpus vectors, then one
    * Lloyd refinement step.
    *
    * Scale shape: seed ids come from one bounded single-row aggregate
    * over the n sampled rows (TakeOrderedAndProject + collect_list of n
    * structs — never a partitionless window over the corpus), and the
    * refinement mean is posexplode → groupBy(centroid, pos).avg — the
    * per-dimension partial aggregation runs map-side, so no agg buffer
    * ever materializes a cluster's member vectors (a centroid with
    * millions of members costs the same as one with ten).
    *
    * The ≤ n-row centroid table is carried DRIVER-side between passes
    * (it is bounded by construction — the same doctrine as collecting
    * it for the native assignment expression): each Lloyd pass is then
    * exactly ONE distributed job (assign + per-dimension mean,
    * collected), where the previous localCheckpoint form paid a
    * checkpoint job plus a collect job per pass and leaked cached
    * blocks into long-lived sessions. The returned DataFrame is a
    * LocalRelation, so downstream collects are driver-local no-ops.
    *
    * @param dim   retained for API stability / input validation only
    * @param iters Lloyd refinement passes (one distributed job each)
    */
  def centroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      n: Int,
      dim: Int,
      iters: Int = 2): DataFrame = {
    require(n > 0 && dim > 0, "nCentroids and dim must be positive")
    val spark = corpus.sparkSession
    val seeds = corpus
      .withColumn("_r", pmod(xxhash64(col(idCol)), lit(1000000)))
      .orderBy(col("_r"), col(idCol))
      .limit(n)
      .select(struct(col("_r"), col(idCol).as("_sid"), col(vecCol).as("_ctr")).as("_s"))
      .groupBy()
      .agg(array_sort(collect_list(col("_s"))).as("_ss"))
      .select(posexplode(col("_ss")).as(Seq("_cid", "_s")))
      .select(
        col("_cid").cast("long").as("centroid_id"),
        col("_s").getField("_ctr").as("_ctr"))
    var local = collectCentroids(seeds)
    // Lloyd iterations: assign to nearest centroid, element-wise mean
    // per cluster via per-(centroid, pos) AVG — one job per pass
    (0 until iters).foreach { _ =>
      val (ids, vecs) = local
      val refined = graft.dedup.Dedup.spread(corpus)
        .withColumn("centroid_id", element_at(
          graft.functions.NearestCentroids(col(vecCol), ids, vecs, k = 1), 1))
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("_pos", "_x")))
        .groupBy(col("centroid_id"), col("_pos"))
        .agg(avg(col("_x").cast("double")).as("_m"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("_pos"), col("_m")))),
          s => s.getField("_m").cast("float")).as("_ctr"))
      local = collectCentroids(refined)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("centroid_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_ctr",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val rows = local._1.zip(local._2)
      .map { case (id, vec) => org.apache.spark.sql.Row(id, vec) }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  /** Collect the (bounded-by-construction) centroid table to the
    * driver, sorted by id — the input to the native nearest-centroid
    * expression. */
  private def collectCentroids(ctrs: DataFrame): (Seq[Long], Seq[Seq[Float]]) = {
    val local = ctrs.select(col("centroid_id"), col("_ctr")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      .sortBy(_._1).toSeq
    (local.map(_._1), local.map(_._2))
  }

  /** Assign each corpus row to its nearest centroid — the native fused
    * [[graft.functions.NearestCentroids]] expression over a driver-
    * collected centroid table with precomputed norms: one dot product
    * per centroid per row, no interpreted broadcast-struct fold on the
    * corpus scan. */
  def assign(
      corpus: DataFrame,
      ctrs: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val (ids, vecs) = collectCentroids(ctrs)
    graft.dedup.Dedup.spread(corpus).withColumn(
      "centroid_id",
      element_at(
        graft.functions.NearestCentroids(col(vecCol), ids, vecs, k = 1), 1))
  }

  /** IVF top-k: probe only the `nProbe` nearest centroid buckets per
    * query. Recall < 1 by construction; pair with [[bruteForceTopK]] as
    * the audit oracle. */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      dim: Int = 64,
      iters: Int = 2): DataFrame = {
    // the centroid table is consumed exactly once (the bounded collect
    // below) — caching it would leak a persisted RDD in long sessions
    val ctrs = centroids(corpus, idCol, vecCol, nCentroids, dim, iters)
    val (cids, cvecs) = collectCentroids(ctrs)
    val bucketed = graft.dedup.Dedup.spread(corpus)
      .withColumn("centroid_id", element_at(
        graft.functions.NearestCentroids(col(vecCol), cids, cvecs, k = 1), 1))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"), col("centroid_id"))
      .repartition(col("centroid_id"))

    // per-query probe list: nProbe nearest centroids (same native
    // expression, k = nProbe)
    val qAssigned = queries
      .select(col(queryIdCol).as("query_id"), col(vecCol).as("_qv"))
      .select(col("query_id"), col("_qv"),
        explode(graft.functions.NearestCentroids(
          col("_qv"), cids, cvecs, k = nProbe)).as("centroid_id"))

    val scored = bucketed.join(qAssigned, Seq("centroid_id"))
      .withColumn("cosine", Dedup.cosineSim(col("_qv"), col("_cv")))
    topKPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}

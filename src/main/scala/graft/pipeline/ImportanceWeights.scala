package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashedNgramBuckets, HashedNgramRatioScore, WhitespaceTokenCount}

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw-corpus document by how much more
  * likely its hashed-n-gram bag is under a target-domain distribution
  * than under the raw-corpus distribution, so downstream sampling can
  * up-weight target-like data without training a classifier.
  *
  * log w(doc) = Σ_{g ∈ grams(doc)} log( p_target[b(g)] / p_source[b(g)] )
  *
  * where grams = unigrams + bigrams of the normalized text, b(g) hashes
  * a gram into one of `nBuckets` buckets ([[graft.functions.HashedNgram]],
  * the engine's standard engine-independent md5/u60 construction), and
  * the two bucket distributions carry add-½ smoothing.
  *
  * 100 TB shape — three scans, nothing else:
  *  - two distribution passes (target is normally tiny; the source pass
  *    is one corpus scan) that each reduce to a ≤`nBuckets`-row
  *    map-side-combined aggregate, collected driver-side (bounded, same
  *    doctrine as the IVF centroid table);
  *  - one scoring scan where the whole per-document computation is a
  *    single codegen'd scalar ([[HashedNgramRatioScore]]) — no explode,
  *    no per-document shuffle, no UDF.
  *
  * Determinism: log ratios are quantized driver-side to integer
  * micro-units (`round(log · 1e6)`), so per-document scores are exact
  * integer sums — order-independent and replayable bit-for-bit by a SQL
  * oracle that recomputes the same buckets and the same quantized
  * ratios (q61).
  */
object ImportanceWeights {

  val DefaultBuckets = 256
  val DefaultSalt = "graft-dsir"

  /** Per-bucket gram-occurrence histogram of a corpus: one codegen'd
    * scan + a map-side-combined aggregate to ≤ nBuckets rows, collected
    * driver-side (bounded by construction). */
  def bucketCounts(
      df: DataFrame,
      textCol: String,
      nBuckets: Int = DefaultBuckets,
      salt: String = DefaultSalt): Array[Long] = {
    require(nBuckets >= 1 && nBuckets <= (1 << 20),
      s"nBuckets must be in [1, 2^20]: $nBuckets")
    val rows = df
      .select(explode(HashedNgramBuckets(col(textCol), nBuckets, salt)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .collect()
    val counts = new Array[Long](nBuckets)
    rows.foreach(r => counts(r.getInt(0)) = r.getLong(1))
    counts
  }

  /** Quantized (micro-unit) smoothed log importance ratios:
    * round( [ln((t_b + ½)/(Σt + ½B)) − ln((s_b + ½)/(Σs + ½B))] · 1e6 ).
    * Computed once driver-side so the scoring scan does no float math
    * and the oracle can embed the identical arithmetic. */
  def logRatiosMicro(target: Array[Long], source: Array[Long]): Array[Long] = {
    require(target.length == source.length,
      s"histogram sizes differ: ${target.length} vs ${source.length}")
    val b = target.length
    val tTot = target.sum.toDouble + 0.5 * b
    val sTot = source.sum.toDouble + 0.5 * b
    Array.tabulate(b) { i =>
      val lr = math.log((target(i) + 0.5) / tTot) - math.log((source(i) + 0.5) / sTot)
      math.round(lr * 1e6)
    }
  }

  /** Score `df` against precomputed quantized ratios: scan-local,
    * zero-shuffle. Output adds `n_grams` (unigrams + bigrams = 2T−1
    * for T ≥ 1 tokens) and `log_w_micro` (score in 1e-6 log units). */
  def score(
      df: DataFrame,
      textCol: String,
      lrqMicro: Array[Long],
      nBuckets: Int = DefaultBuckets,
      salt: String = DefaultSalt): DataFrame = {
    val tc = WhitespaceTokenCount(col(textCol)).cast("long")
    df.withColumn("n_grams", when(tc > 0L, tc * 2L - 1L).otherwise(0L))
      .withColumn("log_w_micro",
        HashedNgramRatioScore(col(textCol), nBuckets, salt, lrqMicro))
  }

  /** End-to-end: build both distributions, then score the corpus.
    * `target` is the in-domain exemplar set (often a filtered slice of
    * the corpus or a separate curated table). When the target IS a
    * predicate over the corpus, use [[dsirWeightsWithin]] — it builds
    * both histograms in one corpus pass instead of two. */
  def dsirWeights(
      corpus: DataFrame,
      target: DataFrame,
      textCol: String,
      nBuckets: Int = DefaultBuckets,
      salt: String = DefaultSalt): DataFrame = {
    val t = bucketCounts(target, textCol, nBuckets, salt)
    val s = bucketCounts(corpus, textCol, nBuckets, salt)
    score(corpus, textCol, logRatiosMicro(t, s), nBuckets, salt)
  }

  /** [[dsirWeights]] for the common case where the target domain is a
    * FILTERED SLICE of the corpus itself (e.g. `lang = 'en'`): one
    * corpus scan computes the source histogram and, via a conditional
    * count on the same exploded rows, the target histogram — halving
    * the distribution passes (guide §1.2: don't scan twice for what one
    * aggregation can produce). Counts are identical to
    * `dsirWeights(corpus, corpus.filter(targetPred), ...)` by
    * construction, so the scores are bit-equal. */
  def dsirWeightsWithin(
      corpus: DataFrame,
      targetPred: Column,
      textCol: String,
      nBuckets: Int = DefaultBuckets,
      salt: String = DefaultSalt): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= (1 << 20),
      s"nBuckets must be in [1, 2^20]: $nBuckets")
    val rows = corpus
      .select(explode(HashedNgramBuckets(col(textCol), nBuckets, salt))
        .as("bucket"), targetPred.as("_t"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), count_if(col("_t")).as("tcnt"))
      .collect()
    val s = new Array[Long](nBuckets)
    val t = new Array[Long](nBuckets)
    rows.foreach { r =>
      s(r.getInt(0)) = r.getLong(1)
      t(r.getInt(0)) = r.getLong(2)
    }
    score(corpus, textCol, logRatiosMicro(t, s), nBuckets, salt)
  }

  val DefaultGumbelSalt = "graft-dsir-gumbel"

  private val TwoPow60 = 1.152921504606846976e18 // 2^60, exact as a double

  /** Integer-quantized standard Gumbel draw derived from the key hash:
    * `floor(-ln(-ln((u60(key)+½)/2^60)) · 1e6 + ½)`. Content-independent
    * and engine-independent — the same md5/u60 construction as
    * [[MixtureSampler.u60]], so a SQL oracle replays the draw exactly
    * (the two nested `ln`s run on identical IEEE doubles; quantization
    * absorbs sub-micro library differences, same doctrine as the q61
    * log-ratio quantization). */
  def gumbelMicro(key: Column, salt: String = DefaultGumbelSalt): Column =
    floor(-log(-log((MixtureSampler.u60(key, salt).cast("double") + lit(0.5))
        / TwoPow60)) * 1e6 + lit(0.5)).cast("long")

  /** DSIR's selection step (Xie et al. 2023 §2: sample-without-
    * replacement via Gumbel top-k): keep the k documents with the
    * largest `log_w_micro + gumbel_micro`. All-integer scores with the
    * key as tie-break make the selected SET deterministic and
    * SQL-replayable (q63).
    *
    * Physical shape: sort-limit compiles to TakeOrderedAndProject —
    * a per-partition bounded heap plus one driver merge, never a global
    * sort exchange (PlanSpec gates it). Driver memory is O(k): right
    * for "select the top million of ten billion". For corpus-FRACTION
    * selection at scale use [[resampleByQuantile]]. */
  def resampleTopK(
      scored: DataFrame,
      keyCol: String,
      k: Int,
      salt: String = DefaultGumbelSalt): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    scored
      .withColumn("gumbel_micro", gumbelMicro(col(keyCol), salt))
      .withColumn("score_micro", col("log_w_micro") + col("gumbel_micro"))
      .orderBy(col("score_micro").desc, col(keyCol))
      .limit(k)
  }

  /** Fraction variant for selections too large to rank through the
    * driver: keep rows whose Gumbel-perturbed score clears the
    * (1−fraction) GK quantile of the score distribution — one
    * constant-memory aggregate collected as a single scalar, then a
    * scan-local literal predicate (the q60 corpus-relative-threshold
    * shape). Lands within the GK rank-error bound of `fraction`, not
    * exactly on it; the exact-k path is [[resampleTopK]]. */
  def resampleByQuantile(
      scored: DataFrame,
      keyCol: String,
      fraction: Double,
      accuracy: Int = 10000,
      salt: String = DefaultGumbelSalt): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0,1]: $fraction")
    val withScore = scored
      .withColumn("gumbel_micro", gumbelMicro(col(keyCol), salt))
      .withColumn("score_micro", col("log_w_micro") + col("gumbel_micro"))
    if (fraction >= 1.0) withScore
    else {
      val row = withScore
        .select(expr(
          s"approx_percentile(score_micro, ${1.0 - fraction}, $accuracy)"))
        .head()
      // a null percentile means an empty corpus — fail with the cause,
      // not the bare NPE getLong would throw (same contract as
      // quantileThresholdFilter)
      require(!row.isNullAt(0),
        "resampleByQuantile: empty corpus (or all-null scores) — " +
          "no quantile threshold exists")
      withScore.filter(col("score_micro") > row.getLong(0))
    }
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** End-to-end pretraining-corpus cleaning — the composition the engine
  * exists for, as one call:
  *
  *  1. exact dedup — min-id canonical row per normalized-content
  *     fingerprint (single hash shuffle);
  *  2. near-duplicate removal — MinHash+LSH candidate pairs at
  *     `nearDupThreshold` exact-verified Jaccard, canonicalized by
  *     [[Canonicalize]]: `PairDrop` (default) drops the GREATER id of
  *     every ≥threshold pair — deterministic, order-free, zero extra
  *     passes, but treats each pair locally (a doc can be dropped while
  *     its only near-dup was itself dropped); `Components` keeps exactly
  *     one representative (min id) per TRANSITIVE similarity cluster via
  *     [[graft.dedup.ConnectedComponents]] — the standard pretraining-
  *     pipeline semantics, at the cost of O(log diameter) label-
  *     propagation rounds over the candidate-pair edge list;
  *  3. language filter — marker-wordlist argmax ∈ `langs`;
  *  4. quality filter — composite pretraining-quality score ≥
  *     `minQuality`.
  *
  * Every stage is the library's own scale-shaped operator (LSH banding
  * shuffles ids only, native expressions on all scan-hot scalars), so
  * the whole pipeline is shuffle-bounded: one exchange for exact dedup,
  * the banding/candidate exchanges of LSH, and map-only filters.
  * Output: surviving rows plus `lang_pred` and `quality` columns.
  */
object PretrainPipeline {

  /** Near-dup canonicalization rule (see object scaladoc). */
  sealed trait Canonicalize
  object Canonicalize {
    /** Drop the greater id of every ≥threshold pair (pair-local). */
    case object PairDrop extends Canonicalize
    /** Keep only the min id of each transitive similarity cluster. */
    case object Components extends Canonicalize
  }

  /** @param maxDupLineFrac  optional Gopher repetition gate: drop docs
    *                         whose duplicate-raw-line fraction exceeds
    *                         this ([[graft.text.TextAnalysis.dupLineFraction]])
    * @param maxTopNgramFrac optional Gopher repetition gate: drop docs
    *                         whose top-bigram occupancy exceeds this
    *                         (native [[graft.functions.NgramModeFraction]]).
    *                         Both ride the same scan as the language and
    *                         quality filters — enabling them adds zero
    *                         passes and zero shuffles.
    * @param minRepetitionTokens length floor below which the
    *                         top-n-gram gate does NOT apply: the mode
    *                         fraction is length-confounded (a clean
    *                         4-token doc scores 1/3; under 6 tokens it
    *                         can never beat 0.2), so without the floor
    *                         the gate silently wipes out short clean
    *                         docs — Gopher applies its repetition
    *                         thresholds above a length floor for the
    *                         same reason. The dup-line gate is not
    *                         length-confounded and always applies.
    * @param maxDupParaFrac  optional CORPUS-WIDE paragraph gate
    *                         ([[graft.dedup.Dedup.paragraphStats]], Lee
    *                         et al. 2022): drop docs whose fraction of
    *                         paragraphs repeated ANYWHERE in the corpus
    *                         exceeds this. Unlike the scan-local
    *                         repetition gates it needs the global
    *                         paragraph histogram — enabling it adds the
    *                         two paragraph-key/doc-id shuffles of
    *                         paragraphStats plus one anti-join, computed
    *                         over the exact-deduped corpus (the staged
    *                         table, so the extra pass re-scans stage
    *                         files, not the raw input).
    * @param dsir            optional DSIR selection stage
    *                         ([[ImportanceWeights]], Xie et al. 2023)
    *                         over the cleaned survivors, before
    *                         `mixture`: score each doc's hashed-n-gram
    *                         bag against a target exemplar corpus and
    *                         keep the Gumbel-top-k. Adds two bounded
    *                         distribution passes that RE-SCAN the
    *                         cleaned plan — set `stageDir` when
    *                         enabling this so the re-scans read staged
    *                         files, not recomputed shuffles. Output
    *                         keeps `log_w_micro`/`gumbel_micro`/
    *                         `score_micro` for audit.
    * @param mixture         optional FINAL stage: deterministic
    *                         stratified mixture sampling
    *                         ([[MixtureSampler.sample]]) of the cleaned
    *                         survivors — a scan-local hash-threshold
    *                         predicate (zero extra shuffles/passes;
    *                         rides the filter scan) that adds a
    *                         `sample_weight` column. Strata default to
    *                         the pipeline's own `lang_pred`. */
  case class Config(
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.75,
      nearDupThreshold: Double = 0.8,
      numHashes: Int = 32,
      bands: Int = 16,
      shingleWidth: Int = 3,
      maxBucket: Int = 128,
      canonicalize: Canonicalize = Canonicalize.PairDrop,
      maxDupLineFrac: Option[Double] = None,
      maxTopNgramFrac: Option[Double] = None,
      minRepetitionTokens: Int = 20,
      maxDupParaFrac: Option[Double] = None,
      dsir: Option[Dsir] = None,
      mixture: Option[Mixture] = None)

  /** DSIR selection stage config (see [[Config.dsir]]). `target` is
    * the in-domain exemplar corpus (any DataFrame with the pipeline's
    * text column — often a curated slice). */
  case class Dsir(
      target: DataFrame,
      k: Int,
      nBuckets: Int = ImportanceWeights.DefaultBuckets,
      salt: String = ImportanceWeights.DefaultSalt,
      gumbelSalt: String = ImportanceWeights.DefaultGumbelSalt)

  /** Mixture-sampling stage config (see [[Config.mixture]]). */
  case class Mixture(
      rates: Map[String, Double],
      stratumCol: String = "lang_pred",
      defaultRate: Double = 0.0,
      salt: String = "graft-mix")

  /** @param stageDir when set, the exact-dedup result is materialized
    *                  there once and downstream stages read the files —
    *                  without it, the plan references the exact-dedup
    *                  subtree from three places (LSH signatures, LSH
    *                  verification, the anti-join base) and Spark
    *                  recomputes its shuffle each time. At test scale
    *                  recompute is fine; at 100 TB staging turns three
    *                  corpus shuffles into one shuffle + one write +
    *                  cheap columnar re-scans (the standard staged-
    *                  pipeline layout on a lake).
    * @param resume   when true and `stageDir` is set, a completed stage
    *                 from an earlier run is REUSED instead of recomputed:
    *                 the stage write commits an atomic manifest (same
    *                 Materializer scheme the backfill sink uses) keyed by
    *                 a resume hash over the input FILE LIST + the input's
    *                 analyzed-plan semantic hash + the stage-relevant
    *                 config, so a crashed/killed pipeline run restarts
    *                 past its heaviest shuffle. A changed input, a
    *                 caller-side transformation (filter/limit/projection)
    *                 or changed config invalidates the manifest; pure
    *                 metric decoration (`observe`) does not; a partial
    *                 write (no manifest) is re-done.
    */
  def clean(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      cfg: Config = Config(),
      stageDir: Option[String] = None,
      resume: Boolean = false): DataFrame =
    cleanDetailed(df, textCol, idCol, cfg, stageDir, resume)._1

  /** [[clean]] plus whether a completed staged exact-dedup manifest was
    * REUSED (true ⇒ this call skipped the staging scan of the input —
    * callers whose metrics ride that scan via `observe`, e.g.
    * [[graft.PipelineJob]]'s input count, must then pay for their own
    * pass; false ⇒ the input was, or will be on execution, scanned). */
  def cleanDetailed(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      cfg: Config = Config(),
      stageDir: Option[String] = None,
      resume: Boolean = false): (DataFrame, Boolean) = {
    val exact0 = Dedup.exact(df, textCol, idCol)
    var stageReused = false
    val exact = stageDir match {
      case Some(dir) =>
        val manifest = java.nio.file.Paths.get(dir, "_exact_dedup_manifest.json")
        val hash = stageHash(df, textCol, idCol)
        // resume only for file-backed inputs: an in-memory DataFrame has no
        // input files, so every such input would share one degenerate hash
        val canResume = resume && df.inputFiles.nonEmpty
        if (!(canResume && graft.materialize.Materializer.isComplete(manifest, hash))) {
          val t0 = System.nanoTime()
          exact0.write.mode("overwrite").parquet(s"$dir/exact_dedup")
          graft.materialize.Materializer.writeManifest(manifest, Map(
            "status" -> "complete",
            "spec_hash" -> hash,
            "stage" -> "exact_dedup",
            "wall_ms" -> (System.nanoTime() - t0) / 1000000L))
        } else stageReused = true
        df.sparkSession.read.parquet(s"$dir/exact_dedup")
      case None => exact0
    }
    val pairs = Dedup.minhashLsh(exact, textCol, idCol,
      numHashes = cfg.numHashes, bands = cfg.bands,
      shingleWidth = cfg.shingleWidth, threshold = cfg.nearDupThreshold,
      maxBucket = cfg.maxBucket)
    val drops = cfg.canonicalize match {
      case Canonicalize.PairDrop =>
        pairs.select(col("id_b").as(idCol)).distinct()
      case Canonicalize.Components =>
        graft.dedup.ConnectedComponents.dropSet(pairs)
          .select(col("id").as(idCol))
    }
    val repetitionGate = Seq(
      cfg.maxDupLineFrac.map(t =>
        TextAnalysis.dupLineFraction(col(textCol)) <= t),
      cfg.maxTopNgramFrac.map(t =>
        graft.functions.WhitespaceTokenCount(col(textCol))
          < cfg.minRepetitionTokens ||
          TextAnalysis.topNgramFraction(col(textCol), 2) <= t))
      .flatten.reduceOption(_ && _).getOrElse(lit(true))
    val afterNearDup = exact.join(drops, Seq(idCol), "left_anti")
    // corpus-wide paragraph gate (opt-in): histogram over the exact-
    // deduped corpus, anti-join of the over-threshold doc ids
    val afterParas = cfg.maxDupParaFrac match {
      case Some(t) =>
        val hot = Dedup.paragraphStats(exact, textCol, idCol)
          .filter(col("dup_para_frac") > t)
          .select(col(idCol))
        afterNearDup.join(hot, Seq(idCol), "left_anti")
      case None => afterNearDup
    }
    val cleaned = afterParas
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .filter(col("lang_pred").isInCollection(cfg.langs.toSeq) &&
        col("quality") >= cfg.minQuality && repetitionGate)
    val afterDsir = cfg.dsir match {
      case Some(d) =>
        val scored = ImportanceWeights.dsirWeights(
          cleaned, d.target, textCol, d.nBuckets, d.salt)
        ImportanceWeights.resampleTopK(scored, idCol, d.k, d.gumbelSalt)
      case None => cleaned
    }
    val out = cfg.mixture match {
      case Some(m) => MixtureSampler.sample(
        afterDsir, m.stratumCol, idCol, m.rates, m.defaultRate, m.salt)
      case None => afterDsir
    }
    (out, stageReused)
  }

  /** Resume key for the staged exact-dedup intermediate: the sorted input
    * file list (metadata-only — no scan) + the input plan's SEMANTIC
    * hash with metric-observation nodes stripped + the parameters the
    * stage's output depends on. The plan component makes any caller-side
    * transformation of the input (filter, limit, column rewrite)
    * invalidate the stage; stripping `CollectMetrics` first keeps pure
    * observability decoration (e.g. PipelineJob's input-count observe)
    * from defeating resume. `semanticHash` (structural, over the
    * canonicalized plan) rather than a rendered plan STRING — plan
    * strings truncate wide field lists at
    * spark.sql.debug.maxToStringFields, which would collide distinct
    * projections of a wide table. Input files rewritten in place between
    * runs with identical names would still NOT invalidate the stage
    * (same trade-off as any path-keyed checkpoint); a lake layout where
    * files are immutable makes the key exact. */
  private def stageHash(df: DataFrame, textCol: String, idCol: String): String = {
    // ANALYZED plan, not .logical: a bare `spark.read.parquet` stays a lazy
    // UnresolvedDataSource node until analysis, while observe() wraps the
    // already-analyzed relation — hashing .logical would make the same
    // table hash differently depending on how the caller built it
    // Replace source-relation leaves with a schema-only placeholder
    // BEFORE hashing: HadoopFsRelation (inside LogicalRelation) hashes
    // by its FileIndex's identity hashCode, which is JVM-LOCAL — the raw
    // plan's semanticHash differs across driver restarts, silently
    // defeating every cross-process resume (caught live in r4: two
    // identical PipelineJob runs produced different spec hashes). File
    // identity still enters the key via the sorted path list below;
    // caller-side transformations still change the plan structure above
    // the placeholder. Output column names ride separately (a
    // rename-only change alters the staged schema but not the
    // canonicalized structure, where names are normalized away).
    val planKey = df.queryExecution.analyzed.transformUp {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c.child
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(r.output)
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(r.output)
    }.semanticHash()
    // fold paths into the digest incrementally — a lake-scale input has
    // millions of file paths, and one concatenated driver-side string
    // would be O(total path bytes) of memory churn per clean() call
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    df.inputFiles.sorted.foreach { p =>
      digest.update(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      digest.update(','.toByte)
    }
    digest.update(
      s"|$planKey|${df.columns.mkString("~")}|exact_dedup_v1|$textCol|$idCol"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    digest.digest().take(8).map("%02x".format(_)).mkString
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is shuffle-bounded by a BUCKET key
  * (fingerprint, LSH band bucket, simhash band), never by all-pairs —
  * candidate generation is groupBy(bucket) + self-join within bucket, so
  * cost is Σ bucket² not N². Verification (exact jaccard / cosine) runs
  * only on candidate pairs.
  */
object Dedup {

  /** Compute-heavy ops must not inherit a tiny split count from a small
    * parquet file: below half the cluster's parallelism, round-robin
    * repartition first (one cheap pass; a no-op at real scale where
    * inputs already have thousands of splits).
    *
    * The split count is ESTIMATED from source metadata (file bytes /
    * `files.maxPartitionBytes`), never from `df.rdd.getNumPartitions` —
    * instantiating the RDD forces physical planning of the whole subtree
    * on the driver once per operator call (r3 VERDICT #1). Non-file
    * inputs (local/shuffled relations) are treated as already parallel:
    * the planner sizes them from the parent stage, not from file splits.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (splitEstimate(df, target) * 2 < target) df.repartition(target) else df
  }

  private def splitEstimate(df: DataFrame, alreadyParallel: Int): Long =
    if (df.inputFiles.isEmpty) alreadyParallel.toLong
    else {
      val maxSplit = math.max(1L,
        df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      ((bytes + maxSplit - 1) / maxSplit).min(BigInt(Long.MaxValue)).toLong.max(1L)
    }

  // ------------------------------------------------------------- exact
  /** Exact dedup on normalized content: one canonical row (min id) per
    * fingerprint. Single hash-shuffle on the 128-bit key + one
    * in-partition sort (row_number window). A `min_by(struct)` hash-
    * aggregate form was tried and rejected: the struct buffer is
    * immutable, so Spark falls back to SortAggregate — sorting the
    * corpus map-side AND reduce-side, strictly worse than this plan's
    * single post-shuffle sort. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol).asc)
    df.withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_fp", "_rn")
  }

  /** Duplicate groups (fingerprint, canonical id, count) — audit shape. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // ------------------------------------------------------- shingling
  /** w-word shingles of normalized text (distinct) — the native fused
    * [[graft.functions.WordShingles]] expression: one byte pass, no
    * interpreted per-shingle lambda, no token-array materialization
    * (output equals the composed
    * `array_distinct(transform(sequence(...), concat_ws(slice(split(
    * lower(regexp_replace(trim(..))))))))` form byte-for-byte; the
    * equivalence is property-tested in WordShinglesSpec). */
  def shingles(text: Column, w: Int = 3): Column =
    graft.functions.WordShingles(text, w)

  /** w-word shingles from a pre-tokenized array column (composed form;
    * kept for callers that already hold a token array). */
  def shinglesFromTokens(toks: Column, w: Int): Column = {
    val n = size(toks)
    array_distinct(
      when(n < w, array(concat_ws(" ", toks)))
        .otherwise(
          transform(sequence(lit(0), n - w),
            i => concat_ws(" ", slice(toks, i + lit(1), lit(w))))))
  }

  // --------------------------------------------------------- minhash
  /** Second-hash seed for Kirsch–Mitzenmacher double hashing (the
    * golden-ratio constant, fixed so signatures are reproducible). */
  private val KmSeed = 0x9E3779B9L

  /** splitmix64 finalizer: a full-avalanche 64-bit mix (3 int ops).
    * Applied over the Kirsch–Mitzenmacher combination `h1 + i·h2`
    * because the RAW linear family is NOT order-independent across i:
    * the argmin drifts from "shingle minimizing h1" (small i) toward
    * structure dominated by h2, so disagreement between two documents
    * concentrates on the same few functions instead of being spread
    * i.i.d. Measured live (r4, 1M-doc corpus): planted nested-set pairs
    * at true Jaccard 0.84 produced signatures agreeing on only 8/32
    * rows (expected ≈27/32) and deterministically missed all 16 bands —
    * ~1e-4 of near-threshold edges lost. The finalizer destroys the
    * linear order correlation (ordering under mix(x) is unrelated to
    * ordering of x), restoring per-function independence at the cost of
    * 3 multiplies/xors per (shingle, function) — the two per-shingle
    * STRING hashes, which dominate at 100 TB, stay at 2 (vs 32 for
    * fully independent seeded hashing). DedupSpec's planted-recall spec
    * and DocsGenSpec's exact survivor counts gate the repair. */
  private def mix64(c: Column): Column = {
    val z1 = c.bitwiseXOR(shiftrightunsigned(c, 30)) * lit(0xBF58476D1CE4E5B9L)
    val z2 = z1.bitwiseXOR(shiftrightunsigned(z1, 27)) * lit(0x94D049BB133111EBL)
    z2.bitwiseXOR(shiftrightunsigned(z2, 31))
  }

  /** The i-th minhash function: mix64(h1 + i·h2) — K-M double hashing
    * through the splitmix64 finalizer (see [[mix64]] for why the
    * finalizer is load-bearing). Two xxhash64 string evaluations per
    * shingle cover ANY number of hash functions. */
  private def kmHash(s: Column, i: Int): Column =
    mix64(xxhash64(s) + lit(i.toLong) * xxhash64(s, lit(KmSeed)))

  /** MinHash signature: for each of `numHashes` mixed K-M hash
    * functions, the min over shingle hashes. Pure columnar (transform +
    * aggregate), no UDF. (Expression form; the scale path is
    * [[minhashSignatures]].)
    *
    * The mix runs as CHAINED transforms, one finalizer stage per
    * lambda: higher-order functions are interpreted with no
    * common-subexpression elimination (CLAUDE.md), so a single lambda
    * containing the whole mix64 tree would re-evaluate each stage's
    * input wherever it appears (~8× the arithmetic per element);
    * referencing the lambda VARIABLE twice is a cheap bound lookup. */
  def minhashSignature(shinglesCol: Column, numHashes: Int = 32): Column = {
    // evaluate the two base hashes once per shingle, derive all rows
    val hashed = transform(shinglesCol,
      s => struct(xxhash64(s).as("h1"), xxhash64(s, lit(KmSeed)).as("h2")))
    array((0 until numHashes).map { i =>
      val comb = transform(hashed,
        h => h.getField("h1") + lit(i.toLong) * h.getField("h2"))
      val s1 = transform(comb,
        z => z.bitwiseXOR(shiftrightunsigned(z, 30)) * lit(0xBF58476D1CE4E5B9L))
      val s2 = transform(s1,
        z => z.bitwiseXOR(shiftrightunsigned(z, 27)) * lit(0x94D049BB133111EBL))
      array_min(transform(s2, z => z.bitwiseXOR(shiftrightunsigned(z, 31))))
    }: _*)
  }

  /** MinHash signatures via the native one-pass
    * [[graft.functions.MinHashSignature]] scalar: scan-local, no row
    * amplification, no aggregation, NO SHUFFLE — each document's
    * `numHashes` minima come out of one byte pass over its text.
    * Value-equal to the previous explode + 32-min-aggregate pipeline
    * (property-tested in MinHashSignatureSpec); the explode form
    * multiplied every doc into one row per shingle through a hash
    * aggregate and an exchange, which measured as the dominant cost of
    * every LSH query. Null-text docs are dropped, matching the old
    * form's explode-of-null semantics. Returns (idCol → _id, _sig). */
  def minhashSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      shingleWidth: Int): DataFrame =
    spread(df).select(
      col(idCol).as("_id"),
      graft.functions.MinHashSignature(
        col(textCol), numHashes, shingleWidth, KmSeed).as("_sig"))
      .filter(col("_sig").isNotNull)

  /** LSH band rows (_id, _band, _bucket) from a signature table
    * ((_id, _sig) as produced by [[minhashSignatures]]): each bucket is
    * the hash of (band index, band slice of the signature) — `hash()`
    * digests the array column natively (no JSON serialization). Shared
    * verbatim by the one-shot [[minhashLsh]] path and the persisted
    * [[DedupStore]] (build AND probe must band identically or
    * increment-vs-store collisions silently vanish). */
  private[dedup] def bandRows(
      sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      hash(lit(b), slice(col("_sig"), b * rowsPerBand + 1, rowsPerBand))
    }
    sig.select(
      col("_id"),
      posexplode(array(bandCols: _*)).as(Seq("_band", "_bucket")))
  }

  /** Text keyed by id — the verification payload table. Shingle sets
    * are NOT materialized here: the caller joins this against the
    * candidate-pair ids first and derives shingles only for the joined
    * (candidate) rows — shingling the whole corpus a second time for a
    * candidate subset that is ≪ corpus was the measured cost of the old
    * pre-shingled form (guide §2.3: defer expensive derivations until
    * after the filter that discards most rows). */
  private def textById(
      df: DataFrame, textCol: String, idCol: String): DataFrame =
    spread(df).select(col(idCol).as("_id"), col(textCol).as("_tx"))

  /** MinHash LSH candidate pairs: signatures cut into `bands` bands of
    * rows; docs sharing any band bucket become candidates; candidates
    * are verified with exact shingle-set Jaccard >= `threshold`.
    *
    * Scale shape: the banding shuffle carries ONLY (id, band, bucket) —
    * never the shingle arrays (the old form replicated every doc's
    * shingle set once per band through the exchange: `bands`× corpus
    * amplification at 100 TB). Verification joins the raw TEXT back for
    * the candidate subset and derives shingle sets only for the joined
    * rows; candidates ≪ corpus, so AQE broadcasts them, the corpus-side
    * text table is scanned (not shuffled), and the second corpus-wide
    * shingling pass of the old pre-shingled form disappears.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, distinct.
    */
  def minhashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleWidth: Int = 3,
      threshold: Double = 0.8,
      maxBucket: Int = 128): DataFrame = {
    val base = minhashSignatures(df, textCol, idCol, numHashes, shingleWidth)
    val banded = bandRows(base, numHashes, bands)

    val cand = bucketPairs(banded, Seq("_band", "_bucket"),
      struct(col("_id")), maxBucket)
      .select(
        col("_pair").getField("a").getField("_id").as("id_a"),
        col("_pair").getField("b").getField("_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val txt = textById(df, textCol, idCol)
    // verification = the fused NgramJaccardSim scalar on candidate rows
    // (value-equal to intersect/union over the WordShingles arrays —
    // NgramJaccardSimSpec): one set build + one membership sweep per
    // evaluation, no shingle-array materialization. The all-pairs oracle
    // path (ngramJaccardExact) keeps pre-shingled arrays instead: there
    // every doc's set is reused across many pairs.
    cand
      .join(txt.select(col("_id").as("id_a"), col("_tx").as("_tx_a")), "id_a")
      .join(txt.select(col("_id").as("id_b"), col("_tx").as("_tx_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.NgramJaccardSim(
          col("_tx_a"), col("_tx_b"), shingleWidth).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** All intra-bucket pairs WITHOUT a self-join: groupBy bucket,
    * collect members, expand ordered pairs (sorted by id, so pairs come
    * out (smaller, larger)). One pass over the input — the
    * candidate-generation plan is executed once, not once per join side.
    *
    * `maxBucket` is the LSH skew guard: a bucket of k members yields
    * k(k-1)/2 pairs, so one degenerate bucket (boilerplate documents,
    * near-constant vectors) turns the stage quadratic. Buckets above the
    * cap are dropped — standard practice; their members are boilerplate
    * that exact dedup already collapses.
    */
  private def bucketPairs(
      banded: DataFrame,
      bucketCols: Seq[String],
      member: Column,
      maxBucket: Int): DataFrame = {
    val grouped = banded
      .groupBy(bucketCols.map(col): _*)
      .agg(array_sort(collect_list(member)).as("_ms"))
      .filter(size(col("_ms")) > 1 && size(col("_ms")) <= maxBucket)
    grouped.select(explode(flatten(
      transform(col("_ms"), (x, i) =>
        transform(
          slice(col("_ms"), i + lit(2), greatest(size(col("_ms")) - i - 1, lit(0))),
          y => struct(x.as("a"), y.as("b")))))).as("_pair"))
  }

  /** Exact n-gram Jaccard on candidate pairs carrying shingle arrays. */
  private def verifyJaccard(candidates: DataFrame, threshold: Double): DataFrame =
    candidates
      .withColumn("_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("_union", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("_inter").cast("double") / col("_union"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Near-duplicate CLUSTERS: MinHash-LSH candidate pairs verified at
    * `threshold`, closed under transitivity via
    * [[ConnectedComponents]] — returns (id, canonical) for every doc
    * that belongs to a non-trivial cluster, where canonical is the
    * cluster's min id (docs with no ≥threshold neighbor don't appear).
    * The curation join is then a broadcast/left join on id: keep rows
    * absent from this table or with id == canonical. */
  def nearDupClusters(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleWidth: Int = 3,
      threshold: Double = 0.8,
      maxBucket: Int = 128): DataFrame =
    ConnectedComponents.label(
      minhashLsh(df, textCol, idCol, numHashes, bands, shingleWidth,
        threshold, maxBucket))
      .select(col("id").as(idCol), col("component").as("canonical"))

  /** Benchmark decontamination support: per-document count of DISTINCT
    * w-word shingles shared with a benchmark/eval corpus — the overlap
    * statistic train-set decontamination thresholds on (the GPT-3 /
    * Pile-style n-gram contamination check).
    *
    * Scale shape: the benchmark gram set is eval-corpus-sized (small) —
    * distinct'd once and BROADCAST; the training corpus explodes its
    * shingles and inner-joins the broadcast set, so the corpus is never
    * shuffled and the per-doc count is a map-side-combinable aggregate.
    * Docs sharing nothing with the benchmark don't appear (join
    * semantics); callers needing zeros left-join back (q53 does).
    *
    * Broadcast guard (r4 VERDICT #3): "eval-corpus-sized" is a contract
    * a caller can break by pointing `bench` at a corpus slice, and the
    * failure would be an opaque 8 GB-broadcast abort mid-stage. The
    * distinct gram count is therefore measured FIRST (one agg-only scan
    * of the bench corpus — cheap by the same smallness assumption, and
    * the scan is paid anyway to build the broadcast); above
    * `maxBroadcastGrams` the join degrades to a plain shuffle join on
    * the gram key (corpus exploded + hash-shuffled — slower but
    * unbounded-safe) instead of failing.
    */
  def benchmarkOverlap(
      docs: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      shingleWidth: Int = 3,
      maxBroadcastGrams: Long = 20000000L): DataFrame = {
    // localCheckpoint so the distinct gram set is computed ONCE: the
    // guard must count it before choosing a join strategy, and without
    // materialization the join would re-run the whole shingle+distinct
    // (worst exactly in the over-cap case the guard exists for). The
    // checkpoint backs the returned DataFrame and is never freed here
    // (repo convention: never unpersist the final checkpoint behind a
    // returned plan); MEMORY_AND_DISK storage keeps the over-cap case
    // bounded-safe. This makes benchmarkOverlap eager at call time —
    // inherent to guarding: the strategy choice needs the count.
    val bg = bench
      .select(explode(shingles(col(textCol), shingleWidth)).as("_g"))
      .distinct()
      .localCheckpoint()
    // ~100 B/gram in a broadcast hash relation → the 20M default is ~2 GB,
    // well under Spark's 8 GB broadcast ceiling
    val bgSide = if (bg.count() <= maxBroadcastGrams) broadcast(bg) else bg
    spread(docs)
      .select(col(idCol).as("_id"),
        explode(shingles(col(textCol), shingleWidth)).as("_g"))
      .join(bgSide, Seq("_g"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("overlap_grams"))
      .select(col("_id").as(idCol), col("overlap_grams"))
  }

  /** Drop training documents whose shingle overlap with the benchmark
    * corpus exceeds `maxOverlap` grams (decontamination filter). */
  def decontaminate(
      docs: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      maxOverlap: Long,
      shingleWidth: Int = 3,
      maxBroadcastGrams: Long = 20000000L): DataFrame = {
    val hot = benchmarkOverlap(docs, bench, textCol, idCol, shingleWidth,
        maxBroadcastGrams)
      .filter(col("overlap_grams") > maxOverlap)
      .select(col(idCol))
    docs.join(hot, Seq(idCol), "left_anti")
  }

  // --------------------------------------- paragraph-level dedup
  /** One row per non-empty paragraph: (_id, _pos, _raw, _fp) — the
    * shared base of [[paragraphStats]] and [[dedupParagraphs]].
    * Paragraphs split on newline; the dedup KEY is the whitespace-
    * collapsed lowercased form (same normalization family as
    * [[graft.text.TextAnalysis.fingerprint]]), hashed to a 128-bit md5
    * so the corpus-wide shuffle carries a fixed-width key, not
    * paragraph text; `_raw` (the original paragraph) rides only as far
    * as reconstruction needs it. Paragraphs that normalize to ''
    * (blank/whitespace lines) are dropped — they are formatting, not
    * content, and would otherwise be the most-repeated "paragraph" in
    * any corpus. */
  private def paraRows(df: DataFrame, textCol: String, idCol: String): DataFrame =
    spread(df)
      .select(col(idCol).as("_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("_pos", "_raw")))
      .withColumn("_norm", lower(regexp_replace(trim(col("_raw")), "\\s+", " ")))
      .filter(col("_norm") =!= "")
      .withColumn("_fp", md5(col("_norm")))
      .drop("_norm")

  /** Per-document repeated-paragraph statistics — the paragraph-level
    * analog of n-gram contamination scoring and the filter signal of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better"): documents dominated by paragraphs that repeat
    * corpus-wide (boilerplate, navigation, licenses) are low-value and
    * the FRACTION is the gate statistic.
    *
    * Returns (idCol, n_paras, dup_paras, dup_para_frac) where a
    * paragraph counts as dup when its normalized form occurs ≥2 times
    * corpus-wide (multiplicity counted, within-doc repeats included).
    * Docs with zero non-empty paragraphs don't appear; callers needing
    * zeros left-join back (q55 does).
    *
    * Scale shape: one hash shuffle on the 128-bit paragraph key (window
    * count — same plan family as [[exact]]), one shuffle on the doc id
    * for the per-doc rollup. Nothing is ever joined all-pairs and the
    * paragraph text itself never enters an exchange. */
  def paragraphStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val paras = paraRows(df, textCol, idCol).select(col("_id"), col("_fp"))
    paras
      .withColumn("_c", count(lit(1)).over(Window.partitionBy(col("_fp"))))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum((col("_c") > 1).cast("long")).as("dup_paras"))
      .select(col("_id").as(idCol), col("n_paras"), col("dup_paras"),
        (col("dup_paras").cast("double") / col("n_paras")).as("dup_para_frac"))
  }

  /** Corpus-wide paragraph dedup REWRITE: every repeated paragraph is
    * kept only at its first occurrence (ordered by (doc id, position) —
    * deterministic) and removed everywhere else; unique paragraphs are
    * untouched. Returns (idCol, textCol) with the rebuilt text — one
    * row per input doc that still has at least one paragraph; callers
    * join back on id for the other columns (docs reduced to nothing get
    * '' via a left join, q55 shows the shape). Blank lines are dropped
    * in the rebuild (see [[paraRows]]).
    *
    * Scale shape: the keep decision is ROW_NUMBER()=1 over the
    * paragraph-key window (first occurrence and unique paragraphs both
    * land on row 1 — one window, no count join), then one groupBy(doc)
    * rebuilds text from the kept (position, raw) pairs. Shuffle cost:
    * paragraph key + doc id, same as [[paragraphStats]].
    */
  def dedupParagraphs(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("_fp"))
      .orderBy(col("_id").asc, col("_pos").asc)
    paraRows(df, textCol, idCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .groupBy(col("_id"))
      .agg(concat_ws("\n",
        transform(
          array_sort(collect_list(struct(col("_pos"), col("_raw").as("_r")))),
          x => x.getField("_r"))).as(textCol))
      .select(col("_id").as(idCol), col(textCol))
  }

  /** Exact all-pairs n-gram Jaccard >= threshold (the oracle path; O(N²)
    * within a length bucket — use only at test scale or as the verifier
    * for sampled audits). */
  def ngramJaccardExact(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleWidth: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val base = spread(df)
      .select(col(idCol).as("_id"), shingles(col(textCol), shingleWidth).as("_sh"))
    val pairs = base.as("a").join(base.as("b"), col("a._id") < col("b._id"))
      .select(
        col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._sh").as("sh_a"), col("b._sh").as("sh_b"))
    verifyJaccard(pairs, threshold)
  }

  // ---------------------------------------------------------- simhash
  /** 64-bit SimHash: per-bit majority vote over the distinct tokens'
    * xxhash64 values — the native one-pass
    * [[graft.functions.SimHash64]] expression (same normalization and
    * hash function as the previous composed form; the old explode →
    * 64-SUM-aggregate pipeline shuffled one row per document token,
    * this is a scan-local scalar with no shuffle at all). */
  def simhash(text: Column): Column = graft.functions.SimHash64(text)

  /** SimHash per row (scan-local, shuffle-free). Returns (idCol → _sh64). */
  def simhashDF(df: DataFrame, textCol: String, idCol: String): DataFrame =
    spread(df).select(
      col(idCol).as("_id"),
      graft.functions.SimHash64(col(textCol)).as("_sh64"))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, using
    * band-of-16-bits blocking (pigeonhole: any pair within distance 3
    * shares at least one of 4 exact 16-bit bands).
    *
    * Cap-recall contract: the pigeonhole guarantee holds only for pairs
    * with at least one shared band bucket UNDER `maxBucket` — on a
    * corpus whose token distributions are so similar that a 16-bit band
    * value is shared corpus-wide (boilerplate-heavy crawls), over-cap
    * buckets are dropped and their exclusive pairs with them. That is
    * the deliberate skew trade (one degenerate bucket is quadratic);
    * run exact dedup first and raise `maxBucket` knowingly if near-dup
    * recall on such a corpus matters more than the quadratic guard. */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 128): DataFrame = {
    // 4 bands of 16 bits guarantee recall only up to Hamming distance 3
    // (pigeonhole); larger maxDist would silently return incomplete pairs.
    require(maxDist <= 3,
      s"simhashPairs guarantees recall only for maxDist <= 3 with 4-band " +
        s"blocking (pigeonhole); got $maxDist")
    val base = simhashDF(df, textCol, idCol)
    val bandCols = (0 until 4).map { b =>
      shiftright(col("_sh64"), b * 16).bitwiseAND(lit(0xFFFFL))
    }
    val banded = base.select(
      col("_id"), col("_sh64"),
      posexplode(array(bandCols: _*)).as(Seq("_band", "_bucket")))
    bucketPairs(banded, Seq("_band", "_bucket"),
      struct(col("_id"), col("_sh64")), maxBucket)
      .select(
        col("_pair").getField("a").getField("_id").as("id_a"),
        col("_pair").getField("b").getField("_id").as("id_b"),
        hamming64(
          col("_pair").getField("a").getField("_sh64"),
          col("_pair").getField("b").getField("_sh64")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------- winnowing rolling-hash dedup
  /** Near-duplicate pairs via winnowing document fingerprints
    * (rolling-hash k-grams + window minima; see
    * [[graft.functions.RollingFingerprints]]): docs sharing a
    * fingerprint become candidates, pair overlap is COUNTED —
    * |A∩B| / |A∪B| from a groupBy((id_a,id_b)).count over exploded
    * shared fingerprints — so no fingerprint array ever travels through
    * the candidate shuffle (cheaper than minhash: one byte pass per doc,
    * no shingle explosion).
    *
    * Output: (id_a, id_b, overlap) with id_a < id_b, overlap >= threshold.
    * Buckets above `maxBucket` (boilerplate fingerprints) are dropped —
    * the standard LSH skew guard; exact dedup owns what they collapse.
    * The drop is applied to a CONSISTENT universe: over-cap fingerprints
    * leave both the shared counts (numerator) and the per-doc sizes
    * (denominator), so overlap is |A∩B| / |A∪B| over exactly the
    * surviving fingerprints — sizing docs over ALL fingerprints would
    * bias overlap downward for docs containing boilerplate and let true
    * near-dups fall below threshold silently.
    */
  def winnowNearDup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 16,
      w: Int = 8,
      threshold: Double = 0.5,
      maxBucket: Int = 256): DataFrame = {
    val fps = spread(df).select(
      col(idCol).as("_id"),
      explode(graft.functions.RollingFingerprints(col(textCol), k, w)).as("_f"))
    // fingerprints are distinct per doc, so the bucket size counts docs
    val surviving = fps
      .withColumn("_bs", count(lit(1)).over(Window.partitionBy(col("_f"))))
      .filter(col("_bs") <= maxBucket)
      .drop("_bs")
    // per-doc surviving-fingerprint count as a SECOND window over the
    // same linear pipeline, not a separate groupBy branch: the old
    // `surviving.join(surviving.groupBy(_id).count, "_id")` referenced
    // the explode+window subtree twice, and Spark executed the whole
    // fingerprint pass twice (no cross-branch reuse of the un-cached
    // subtree — confirmed by the doubled Union/Scan nodes in the r6
    // before-plan). One pipeline, one fingerprint pass.
    val withSize = surviving
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_id"))))
    val pairs = bucketPairs(withSize, Seq("_f"),
      struct(col("_id"), col("_n")), maxBucket)
      .select(
        col("_pair").getField("a").getField("_id").as("id_a"),
        col("_pair").getField("b").getField("_id").as("id_b"),
        col("_pair").getField("a").getField("_n").as("_na"),
        col("_pair").getField("b").getField("_n").as("_nb"))
    pairs
      .groupBy(col("id_a"), col("id_b"), col("_na"), col("_nb"))
      .agg(count(lit(1)).as("_shared"))
      .withColumn("overlap",
        col("_shared").cast("double") / (col("_na") + col("_nb") - col("_shared")))
      .filter(col("overlap") >= threshold)
      .select(col("id_a"), col("id_b"), col("overlap"))
  }

  // ------------------------------------------- embedding near-dup
  /** Embedding-cosine near-duplicates via banded random-hyperplane LSH:
    * `nPlanes` deterministic hyperplanes → sign bits, cut into `bands`
    * band tables of nPlanes/bands bits each (same amplification shape as
    * [[minhashLsh]]); pairs sharing ANY band bucket are verified with
    * exact cosine >= threshold. A single table (bands = 1) at r = 16
    * bits has recall ≈ (1-θ/π)^16 ≈ 0.18 at cosine 0.95 — banding makes
    * recall controllable: at nPlanes = 32, bands = 4 (r = 8), recall at
    * cosine 0.95 is 1-(1-0.9^8)^4 ≈ 0.9. Hyperplanes are deterministic
    * gaussians from (seed, planeIdx), precomputed on the driver and
    * evaluated by the native fused
    * [[graft.functions.PlaneSignBuckets]] expression — one dense loop
    * per row instead of nPlanes interpreted array traversals over a
    * full-corpus scan.
    */
  def embeddingNearDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      nPlanes: Int = 32,
      bands: Int = 4,
      threshold: Double = 0.95,
      seed: Long = 42L,
      maxBucket: Int = 1024): DataFrame = {
    require(nPlanes % bands == 0, "bands must divide nPlanes")
    val planes = graft.functions.PlaneSignBuckets.gaussianPlanes(nPlanes, dim, seed)
    // banding shuffle carries only (id, band, bucket); vectors are
    // joined back for the candidate subset (AQE broadcasts it), so the
    // corpus is never amplified `bands`× through an exchange
    val banded = df.select(
      col(idCol).as("_id"),
      posexplode(graft.functions.PlaneSignBuckets(col(vecCol), planes, bands))
        .as(Seq("_band", "_bucket")))

    val cand = bucketPairs(banded, Seq("_band", "_bucket"), struct(col("_id")), maxBucket)
      .select(
        col("_pair").getField("a").getField("_id").as("id_a"),
        col("_pair").getField("b").getField("_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    val vecs = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    cand
      .join(vecs.select(col("_id").as("id_a"), col("_v").as("_va")), "id_a")
      .join(vecs.select(col("_id").as("id_b"), col("_v").as("_vb")), "id_b")
      .select(col("id_a"), col("id_b"), cosineSim(col("_va"), col("_vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact cosine similarity between two float arrays (double math) —
    * the native codegen'd [[graft.functions.CosineSimilarity]]: one
    * fused loop instead of three interpreted array traversals, with
    * bit-identical accumulation order. */
  def cosineSim(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)
}

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

  // ------------------------------------------------------------- exact
  /** Exact dedup on normalized content: one canonical row (min id) per
    * fingerprint. Single hash-shuffle on the 128-bit key. */
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
  /** w-word shingles of normalized text (distinct). */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(lower(regexp_replace(trim(text), "\\s+", " ")), " ")
    val n = size(toks)
    array_distinct(
      when(n < w, array(concat_ws(" ", toks)))
        .otherwise(
          transform(sequence(lit(0), n - w),
            i => concat_ws(" ", slice(toks, i + lit(1), lit(w))))))
  }

  // --------------------------------------------------------- minhash
  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over shingle hashes. Pure columnar (transform + aggregate),
    * no UDF. */
  def minhashSignature(shinglesCol: Column, numHashes: Int = 32): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shinglesCol, s => xxhash64(s, lit(i))))
    }: _*)

  /** MinHash LSH candidate pairs: signatures cut into `bands` bands of
    * rows; docs sharing any band bucket become candidates; candidates
    * are verified with exact shingle-set Jaccard >= `threshold`.
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
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    val base = df.select(
      col(idCol).as("_id"),
      shingles(col(textCol), shingleWidth).as("_sh"))
      .withColumn("_sig", minhashSignature(col("_sh"), numHashes))

    // band buckets: hash of (band index, band slice of the signature)
    val bandCols = (0 until bands).map { b =>
      hash(lit(b), to_json(struct(
        slice(col("_sig"), b * rowsPerBand + 1, rowsPerBand))))
    }
    val banded = base.select(
      col("_id"), col("_sh"),
      posexplode(array(bandCols: _*)).as(Seq("_band", "_bucket")))

    val candidates = banded.as("a").join(banded.as("b"),
        col("a._band") === col("b._band") &&
          col("a._bucket") === col("b._bucket") &&
          col("a._id") < col("b._id"))
      .select(
        col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._sh").as("sh_a"), col("b._sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")

    verifyJaccard(candidates, threshold)
  }

  /** Exact n-gram Jaccard on candidate pairs carrying shingle arrays. */
  private def verifyJaccard(candidates: DataFrame, threshold: Double): DataFrame =
    candidates
      .withColumn("_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("_union", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("_inter").cast("double") / col("_union"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Exact all-pairs n-gram Jaccard >= threshold (the oracle path; O(N²)
    * within a length bucket — use only at test scale or as the verifier
    * for sampled audits). */
  def ngramJaccardExact(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleWidth: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val base = df.select(col(idCol).as("_id"), shingles(col(textCol), shingleWidth).as("_sh"))
    val pairs = base.as("a").join(base.as("b"), col("a._id") < col("b._id"))
      .select(
        col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._sh").as("sh_a"), col("b._sh").as("sh_b"))
    verifyJaccard(pairs, threshold)
  }

  // ---------------------------------------------------------- simhash
  /** 64-bit SimHash from token hashes: per-bit weighted vote over all
    * token hashes. Columnar: fold token hash array into 64 bit-counters.
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(lower(regexp_replace(trim(text), "\\s+", " ")), " "))
    val hashes = transform(toks, t => xxhash64(t))
    // bit b of result = majority vote of bit b across token hashes
    val bits = (0 until 64).map { b =>
      when(
        aggregate(hashes, lit(0L),
          (acc, h) => acc +
            when(shiftright(h, b).bitwiseAND(lit(1L)) === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, using
    * band-of-16-bits blocking (pigeonhole: any pair within distance 3
    * shares at least one of 4 exact 16-bit bands). */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("_id"), simhash(col(textCol)).as("_sh64"))
    val bandCols = (0 until 4).map { b =>
      shiftright(col("_sh64"), b * 16).bitwiseAND(lit(0xFFFFL))
    }
    val banded = base.select(
      col("_id"), col("_sh64"),
      posexplode(array(bandCols: _*)).as(Seq("_band", "_bucket")))
    banded.as("a").join(banded.as("b"),
        col("a._band") === col("b._band") &&
          col("a._bucket") === col("b._bucket") &&
          col("a._id") < col("b._id"))
      .select(
        col("a._id").as("id_a"), col("b._id").as("id_b"),
        hamming64(col("a._sh64"), col("b._sh64")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------- embedding near-dup
  /** Embedding-cosine near-duplicates via random-hyperplane LSH:
    * `nPlanes` deterministic hyperplanes → sign bits → bucket; pairs in
    * the same bucket verified with exact cosine >= threshold.
    * Hyperplanes are derived from xxhash64(seed, planeIdx, dim) so the
    * whole pipeline is deterministic and distributable.
    */
  def embeddingNearDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      nPlanes: Int = 16,
      threshold: Double = 0.95,
      seed: Long = 42L): DataFrame = {
    val planeVal: (Int, Column) => Column = (p, i) =>
      (hash(lit(seed), lit(p), i).cast("double") / lit(Int.MaxValue.toDouble))
    // sign bit per plane: dot(vec, plane) > 0
    val sigBits = (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(col(vecCol), sequence(lit(0), lit(dim - 1)),
          (v, i) => v.cast("double") * planeVal(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    val base = df.select(
      col(idCol).as("_id"), col(vecCol).as("_v"),
      sigBits.reduce(_ + _).as("_bucket"))

    base.as("a").join(base.as("b"),
        col("a._bucket") === col("b._bucket") && col("a._id") < col("b._id"))
      .withColumn("cosine", cosineSim(col("a._v"), col("b._v")))
      .filter(col("cosine") >= threshold)
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"), col("cosine"))
  }

  /** Exact cosine similarity between two float arrays (double math). */
  def cosineSim(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }
}

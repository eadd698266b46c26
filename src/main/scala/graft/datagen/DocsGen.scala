package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic documents corpus for pipeline benchmarks —
  * the documents-table shape (doc_id, text) at arbitrary scale, with a
  * planted mixture that exercises every PretrainPipeline stage. Per
  * 20-id block:
  *
  *  - ids ≡ 0–12, 16: unique English-ish docs (40-60 tokens, every 3rd
  *    a real English marker stopword so langId = en, quality = 1.0);
  *  - ids ≡ 13/14/15: a planted STAR near-dup cluster (≥3 nodes) whose
  *    pair-local and transitive canonicalizations DIVERGE. With g =
  *    distinct 3-grams of base doc 13: doc 15 drops the last ~0.15·g
  *    words of 13 (J(13,15) ≈ 0.84), doc 14 drops the last ~0.26·g
  *    words (J(14,15) ≥ 0.85 — 14's grams are a prefix subset of 15's —
  *    but J(13,14) ≤ 0.75 < 0.8; every margin ≥ 0.04 so banding misses
  *    are ~1e-9/pair — a first cut at 0.30 put J(14,15) as low as
  *    0.8056 and LSH missed 7 of 100k near-threshold edges at 1M docs). The verified ≥0.8 pair edges are thus
  *    exactly (13,15) and (14,15): PairDrop removes only the greater id
  *    of each pair → drops {15}; Components closes {13,14,15} → drops
  *    {14,15}. Survivor delta = exactly n/20 docs (DocsGenSpec and the
  *    BASELINE.md pipeline record assert the divergence).
  *  - id ≡ 17: EXACT duplicate (copies id-1, i.e. 16);
  *  - id ≡ 18: pairwise NEAR duplicate of 16 (id-2 minus its last two
  *    words — 3-gram Jaccard ≈ 0.95; both models drop 18);
  *  - id ≡ 19: filtered content (alternating German text and
  *    punctuation junk — dropped by the language / quality filters).
  *
  * Text is a pure function of doc_id (seeded per id), so the corpus is
  * identical across partitionings, parallelism levels and runs — the
  * property scaling comparisons need.
  */
object DocsGen {

  // the en langId markers double as quality stopwords (ratio 1/3 ≥ 0.2)
  private val stops =
    Array("the", "and", "of", "to", "is", "that", "with")
  private val germanBase =
    "der hund und die katze sind nicht mit dem vogel in das haus " +
      "gegangen und der tag ist nicht zu ende und das ist gut so"

  private def english(id: Long): String = {
    val rng = new java.util.Random(id * 2654435761L + 12345L)
    val n = 40 + rng.nextInt(21)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      if (i % 3 == 1) sb.append(stops(rng.nextInt(stops.length)))
      else { sb.append("tok"); sb.append(rng.nextInt(50000)) }
      i += 1
    }
    sb.toString
  }

  /** Drop the trailing `frac` fraction (of the base's 3-gram count) of
    * words — the star-cluster mutation operator. Prefix truncations are
    * NESTED, which is what makes the pairwise Jaccards exact:
    * J(base, drop(k)) = (g-k)/g with g = words-2 distinct grams. */
  private def dropTail(base: String, frac: Double): String = {
    val w = base.split(" ")
    val k = math.max(1, math.round(frac * (w.length - 2)).toInt)
    w.dropRight(k).mkString(" ")
  }

  /** The document text for an id — pure and total. */
  def text(id: Long): String = (id % 20) match {
    case 14 => dropTail(text(id - 1), 0.26) // star leaf: far from base 13…
    case 15 => dropTail(text(id - 2), 0.15) // …but both within 0.8 of 15
    case 17 => text(id - 1) // exact duplicate
    case 18 => // near duplicate: drop the last two words
      val w = text(id - 2).split(" ")
      w.dropRight(2).mkString(" ")
    case 19 =>
      if ((id / 20) % 2 == 0) s"$germanBase nummer ${id / 20}"
      else s"!!! ??? *** ### $$$$$$ %%% ^^^ &&& ((( ))) @@@ ${id / 20} !!!"
    case _ => english(id)
  }

  def docs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => (i, text(i))).toDF("doc_id", "text")
  }

  /** usage: runMain graft.datagen.DocsGen <nDocs> <outPath> */
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: DocsGen <nDocs> <outPath>")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors().toString).toInt, "docs-gen")
    docs(spark, args(0).toLong)
      .write.mode("overwrite").parquet(args(1))
    println(s"""{"gen":"docs","n":${args(0)},"out":"${args(1)}"}""")
    spark.stop()
  }
}

package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  // base corpus: distinct sentences + near-duplicate mutations + exact dups
  private lazy val docs = {
    val rng = new scala.util.Random(13)
    val vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau".split(" ")
    val base = (0 until 60).map { i =>
      val words = Array.fill(20 + rng.nextInt(20))(vocab(rng.nextInt(vocab.length)))
      (i.toLong, words.mkString(" "))
    }
    val nearDups = base.take(15).map { case (id, text) =>
      (id + 1000L, text.split(" ").dropRight(2).mkString(" ")) // drop last 2 words
    }
    val exactDups = base.take(5).map { case (id, text) =>
      (id + 2000L, "  " + text.toUpperCase + " ") // same after normalization
    }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup: normalization-equal rows collapse to the min id") {
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.count() === 75) // 80 - 5 exact dups
    // canonical ids are the originals (0..4), not the 2000+ copies
    val kept = out.select($"doc_id").as[Long].collect().toSet
    assert((0L until 5L).forall(kept.contains))
    assert(!(2000L until 2005L).exists(kept.contains))

    val groups = Dedup.exactGroups(docs, "text", "doc_id")
      .filter($"dup_count" > 1)
    assert(groups.count() === 5)
  }

  test("minhash LSH finds the planted near-dup pairs with no sub-threshold pairs") {
    val exact = Dedup.ngramJaccardExact(docs, "text", "doc_id", threshold = 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "text", "doc_id",
      numHashes = 32, bands = 8, threshold = 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    // verification step guarantees zero false positives
    assert(lsh.subsetOf(exact))
    // planted pairs: (i, i+1000) for long-enough docs — exact finds them
    assert(exact.count { case (a, b) => b - a == 1000 || b - a == 2000 } >= 10)
    // recall of banding: ≥ 90% of truly-similar pairs
    assert(lsh.size >= (exact.size * 0.9).toInt, s"lsh=${lsh.size} exact=${exact.size}")
  }

  test("nearDupClusters: mutation chains collapse to one canonical min id") {
    // base doc + two successive 2-word-drop mutations: adjacent Jaccards
    // ≈ 0.89/0.875 clear the 0.8 threshold, the chain ends (≈0.78) don't
    // — transitivity must still put all three in one cluster
    val a = (1 to 20).map(i => s"word$i").mkString(" ")
    val b = a.split(" ").dropRight(2).mkString(" ")
    val c = b.split(" ").dropRight(2).mkString(" ")
    val other = (100 to 130).map(i => s"tok$i").mkString(" ")
    val docsDf = Seq((5L, a), (6L, b), (7L, c), (9L, other))
      .toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(docsDf, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(clusters === Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("simhash: identical text → distance 0; mutated → small; pairs found") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (4L, "completely different words nothing shared here at all whatsoever truly")
    ).toDF("doc_id", "text")
    val sh = d.select($"doc_id", Dedup.simhash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) < 16)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 16)

    val pairs = Dedup.simhashPairs(d, "text", "doc_id", maxDist = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("decontamination: overlap counts, filter, and broadcast plan shape") {
    val benchDoc = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val clean = "completely unrelated words about spark catalyst plans and shuffles at scale"
    val docs = Seq(
      (1L, benchDoc),                                          // verbatim contamination
      (2L, benchDoc.split(" ").dropRight(2).mkString(" ")),    // paraphrase
      (3L, clean)
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")

    val ov = Dedup.benchmarkOverlap(docs, bench, "text", "doc_id")
    val got = ov.as[(Long, Long)].collect().toMap
    val benchGrams = 13L // 15 tokens → 13 trigrams, all distinct
    assert(got(1L) === benchGrams)
    assert(got(2L) === benchGrams - 2)
    assert(!got.contains(3L), "clean doc shares nothing and must not appear")

    val kept = Dedup.decontaminate(docs, bench, "text", "doc_id", maxOverlap = 5L)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(3L))

    // scale shape: benchmark gram set broadcasts; the corpus side must
    // not sort-merge against it
    ov.collect()
    val p = ov.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled against benchmark:\n$p")
  }

  test("decontamination over-cap gram set falls back to a shuffle join, same result") {
    val benchDoc = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val clean = "completely unrelated words about spark catalyst plans and shuffles at scale"
    val docs = Seq(
      (1L, benchDoc),
      (2L, benchDoc.split(" ").dropRight(2).mkString(" ")),
      (3L, clean)
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchDoc)).toDF("doc_id", "text")

    // cap of 1 gram forces the unbounded-safe path
    val ov = Dedup.benchmarkOverlap(docs, bench, "text", "doc_id",
      maxBroadcastGrams = 1L)
    val got = ov.as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 13L, 2L -> 11L), "fallback changed the counts")

    // the gram join must NOT use the explicit broadcast hint (AQE may
    // still pick a broadcast strategy for a small side on its own; the
    // guard's job is only to never FORCE one past the cap)
    val plan = ov.queryExecution.analyzed.toString
    assert(!plan.contains("broadcast"),
      s"over-cap benchmark set still carries the broadcast hint:\n$plan")

    val kept = Dedup.decontaminate(docs, bench, "text", "doc_id",
        maxOverlap = 5L, maxBroadcastGrams = 1L)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(3L))
  }

  test("paragraph stats + rewrite: corpus-wide first occurrence wins, blanks dropped") {
    val boiler = "Subscribe to our newsletter"
    val docs = Seq(
      // doc 1: unique + boiler; boiler's first occurrence (doc 1, pos 1)
      (1L, "alpha beta gamma\nSubscribe   to our NEWSLETTER\nunique one"),
      // doc 2: boiler (normalized-equal, mixed case/space) + unique + a blank line
      (2L, s"$boiler\n   \nunique two"),
      // doc 3: all unique, plus an in-doc repeat
      (3L, "same line twice\nsame line twice\nunique three"),
      // doc 4: nothing but boiler → rewritten to nothing
      (4L, boiler)
    ).toDF("doc_id", "text")

    val stats = Dedup.paragraphStats(docs, "text", "doc_id")
      .select($"doc_id", $"n_paras", $"dup_paras").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // blanks don't count; boiler occurs 3× corpus-wide, "same line twice" 2×
    assert(stats(1L) === ((3L, 1L)))
    assert(stats(2L) === ((2L, 1L)))
    assert(stats(3L) === ((3L, 2L)))
    assert(stats(4L) === ((1L, 1L)))

    val clean = Dedup.dedupParagraphs(docs, "text", "doc_id")
      .as[(Long, String)].collect().toMap
    // first occurrence (doc 1 pos 2) keeps its RAW form; later copies drop
    assert(clean(1L) === "alpha beta gamma\nSubscribe   to our NEWSLETTER\nunique one")
    assert(clean(2L) === "unique two")
    assert(clean(3L) === "same line twice\nunique three")
    assert(!clean.contains(4L), "all-dup doc has no rebuilt row (callers left-join '')")
  }

  test("embedding near-dup: identical and near-identical vectors found, orthogonal not") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f, 0.0f)), // cosine ~1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),    // orthogonal
      (4L, Array(1.0f, 0.0f, 0.0f, 0.0f))     // exact dup of 1
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(vecs, "embedding", "vec_id",
      dim = 4, nPlanes = 8, threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }
}

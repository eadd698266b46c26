package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic documents corpus for pipeline benchmarks —
  * the documents-table shape (doc_id, text) at arbitrary scale, with a
  * planted mixture that exercises every PretrainPipeline stage:
  *
  *  - 85% unique English-ish docs (40-60 tokens, every 3rd a real
  *    English marker stopword so langId = en and quality = 1.0);
  *  - 5% EXACT duplicates (id ≡ 17 mod 20 copies id-1);
  *  - 5% NEAR duplicates (id ≡ 18 mod 20 is id-2 minus its last two
  *    words — 3-gram Jaccard ≈ 0.96, well above the 0.8 threshold);
  *  - 5% filtered content (id ≡ 19 mod 20, alternating German text and
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

  /** The document text for an id — pure and total. */
  def text(id: Long): String = (id % 20) match {
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

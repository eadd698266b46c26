package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Training-data-pipeline + remaining SQL-surface queries (SURVEY §2
  * W4/F6-F11 and the dedup / similarity / text-analysis operator set).
  * Same oracle conventions as [[Queries]].
  */
object QueriesExtra {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Per-process scratch path for queries that exercise a real write
    * path (q35 stage, q44 sink, q48 index): keyed by the testdata dir so
    * SFs don't collide, and by the PID so two concurrent driver
    * processes (e.g. bench and the correctness gate) never race on
    * overwrite/delete of the same dir. PID-keyed paths are never reused
    * by later processes, so each is registered for recursive deletion at
    * JVM exit — repeated gate/bench invocations would otherwise fill
    * the scratch volume with corpus-scale leftovers.
    *
    * Scratch lives on tmpfs when available (same rationale as
    * GraftSession putting spark.local.dir on /dev/shm — guide §6:
    * local-mode /tmp is VM-disk-bound, and these intermediates are
    * written AND re-read inside the timed query): on a real cluster the
    * analog is the executors' NVMe-backed scratch volume, configured via
    * SPARK_GRAFT_SCRATCH_DIR. */
  private val scratchRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val scratchBase: String =
    sys.env.get("SPARK_GRAFT_SCRATCH_DIR").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm" else "/tmp"
    }

  private def scratch(tag: String, dir: String): String = {
    val p = s"$scratchBase/graft_${tag}_${dir.hashCode & 0x7fffffff}" +
      s"_p${ProcessHandle.current().pid()}"
    if (scratchRegistered.add(p)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          def del(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(del))
            f.delete(): Unit
          }
          del(new java.io.File(p))
        } catch { case _: Throwable => () }))
    }
    p
  }

  // ------------------------------------------------------------------- W4
  /** FIRST_VALUE / LAST_VALUE with the full-frame pin (SURVEY §2.4 W4;
    * test_snowflake_sources.py:14-15). */
  def q16FirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("first_val", first(col("value")).over(w))
      .withColumn("last_val", last(col("value")).over(full))
      .drop("ts", "value")
  }

  val q16Sql: String =
    """SELECT user_id, event_id,
      | FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |   AS first_val,
      | LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val
      |FROM events""".stripMargin

  // ------------------------------------------------------------ F6-F11
  /** Date/time scalar functions (SURVEY §2.6 F6/F7/F8/F9/F10/F11). */
  def q17DateFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        add_months(to_date(col("ts")), -6).as("six_months_ago"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("days_since_jan1"),
        date_trunc("day", col("ts")).as("day_start"),
        month(col("ts")).cast("long").as("ts_month"),
        (to_date(col("ts")) + expr("INTERVAL 1 DAY")).cast("date").as("next_day"))

  val q17Sql: String =
    """SELECT event_id,
      | CAST(ts AS DATE) - INTERVAL 6 MONTH AS six_months_ago,
      | date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since_jan1,
      | date_trunc('day', ts) AS day_start,
      | CAST(EXTRACT(month FROM ts) AS BIGINT) AS ts_month,
      | CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS DATE) AS next_day
      |FROM events""".stripMargin

  // ------------------------------------------------------- text quality
  /** Token counts, mean word length, stopword ratio per doc (text
    * analysis operator over the documents table).
    *
    * No interpreted HOF lambdas: Σ token lengths is pure length
    * arithmetic (chars − single-space separators = length after
    * translate-out-spaces), and the stopword counter is the native
    * codegen'd [[graft.functions.TokenInSetCount]] — everything stays in
    * one WholeStageCodegen scan. */
  def q18TextQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ", -1)
    val stops = Seq("the", "a", "table", "row", "value")
    Dedup.spread(t(s, dir, "documents"))
      .select(
        col("doc_id"),
        size(toks).cast("long").as("tokens"),
        round(
          length(translate(col("text"), " ", "")).cast("double")
            / size(toks), 6).as("avg_word_len"),
        round(
          graft.functions.TokenInSetCount(lower(col("text")), stops,
            whitespaceRuns = false).cast("double")
            / size(toks), 6).as("stop_ratio"))
  }

  val q18Sql: String =
    """SELECT doc_id,
      | CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS tokens,
      | ROUND(CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
      |     x -> LEN(x))) AS DOUBLE)
      |   / LEN(STRING_SPLIT(text, ' ')), 6) AS avg_word_len,
      | ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
      |     x -> x IN ('the', 'a', 'table', 'row', 'value'))) AS DOUBLE)
      |   / LEN(STRING_SPLIT(LOWER(text), ' ')), 6) AS stop_ratio
      |FROM documents""".stripMargin

  // ------------------------------------------------------------ lang id
  /** Marker-wordlist language ID (argmax, alphabetical tie-break). */
  def q19LangId(s: SparkSession, dir: String): DataFrame =
    Dedup.spread(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("predicted_lang"))

  val q19Sql: String = {
    val m = TextAnalysis.DefaultLangMarkers.toSeq.sortBy(_._1)
    val scores = m.map { case (lang, words) =>
      s"LEN(LIST_FILTER(STRING_SPLIT(LOWER(TRIM(text)), ' '), " +
        s"x -> x IN (${words.map(w => s"'$w'").mkString(", ")}))) AS s_$lang"
    }.mkString(",\n   ")
    val langs = m.map(_._1)
    val greatest = s"GREATEST(${langs.map("s_" + _).mkString(", ")})"
    val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH sc AS (
       |  SELECT doc_id, lang,
       |   $scores
       |  FROM documents),
       | mx AS (SELECT *, $greatest AS m FROM sc)
       |SELECT doc_id, lang, CASE $cases END AS predicted_lang FROM mx""".stripMargin
  }

  // ----------------------------------------------------- exact dedup
  /** md5-fingerprint exact-dedup groups (canonical id + count). */
  def q20FingerprintDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")

  val q20Sql: String =
    """SELECT md5(LOWER(REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g'))) AS fingerprint,
      | MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
      |FROM documents GROUP BY 1""".stripMargin

  // --------------------------------------------- near-dup (exact oracle)
  /** Exact 3-gram Jaccard near-dup pairs over a bounded slice of the
    * corpus plus deterministic mutated copies (drop-last-2-words), so
    * true near-duplicates exist at every SF. Bounded input (250+250
    * docs) keeps the all-pairs oracle O(1) w.r.t. SF; the scale path is
    * [[q22MinhashCandidates]]. */
  def q21NeardupJaccard(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 250)
      .select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ", -1)
    val mutated = base.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1)))).as("text"))
    val all = base.unionByName(mutated)
    Dedup.ngramJaccardExact(all, "text", "doc_id", shingleWidth = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  val q21Sql: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 250),
      | mutated AS (
      |  SELECT doc_id + 100000 AS doc_id,
      |   array_to_string(string_split(text, ' ')[1:GREATEST(LEN(string_split(text,' '))-2, 1)], ' ') AS text
      |  FROM base),
      | all_docs AS (SELECT * FROM base UNION ALL SELECT * FROM mutated),
      | sh AS (
      |  SELECT doc_id,
      |   CASE WHEN LEN(string_split(LOWER(REGEXP_REPLACE(TRIM(text),'\s+',' ','g')), ' ')) < 3
      |        THEN [LOWER(REGEXP_REPLACE(TRIM(text),'\s+',' ','g'))]
      |        ELSE list_distinct(list_transform(
      |          range(0, LEN(string_split(LOWER(REGEXP_REPLACE(TRIM(text),'\s+',' ','g')), ' ')) - 2),
      |          i -> array_to_string(string_split(LOWER(REGEXP_REPLACE(TRIM(text),'\s+',' ','g')), ' ')[i+1:i+3], ' ')))
      |   END AS grams
      |  FROM all_docs),
      | pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |   CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |     / LEN(list_distinct(list_concat(a.grams, b.grams))) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM pairs WHERE j >= 0.8""".stripMargin

  // ------------------------------------------- minhash LSH (scale path)
  /** MinHash+LSH near-dup pairs over the full corpus + mutated copies
    * (drop-last-2-words) — the O(N) banding path — restricted to the
    * PLANTED pair relation (id_b = id_a + 100000) so DuckDB can compute
    * the exact expected set in O(N): each planted pair's true 3-gram
    * Jaccard is far above the 0.8 threshold, and at 16 bands of 2 rows
    * the banding miss probability at s = 0.8 is (1-0.8²)¹⁶ ≈ 8e-8 —
    * verified exhaustively against the oracle on the driver's sf. Full
    * (unrestricted) LSH recall vs the exact oracle stays asserted in
    * DedupSpec. */
  def q22MinhashCandidates(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ", -1)
    val mutated = base.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1)))).as("text"))
    Dedup.minhashLsh(base.unionByName(mutated), "text", "doc_id",
      numHashes = 32, bands = 16, threshold = 0.8)
      .filter(col("id_b") === col("id_a") + 100000L && col("id_a") < 100000L)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  val q22Sql: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents),
      | mutated AS (
      |  SELECT doc_id + 100000 AS doc_id,
      |   array_to_string(string_split(text, ' ')[1:GREATEST(LEN(string_split(text,' '))-2, 1)], ' ') AS text
      |  FROM base),
      | all_docs AS (SELECT * FROM base UNION ALL SELECT * FROM mutated),
      | sh AS (
      |  SELECT doc_id,
      |   CASE WHEN LEN(string_split(LOWER(REGEXP_REPLACE(TRIM(text),'\s+',' ','g')), ' ')) < 3
      |        THEN [LOWER(REGEXP_REPLACE(TRIM(text),'\s+',' ','g'))]
      |        ELSE list_distinct(list_transform(
      |          range(0, LEN(string_split(LOWER(REGEXP_REPLACE(TRIM(text),'\s+',' ','g')), ' ')) - 2),
      |          i -> array_to_string(string_split(LOWER(REGEXP_REPLACE(TRIM(text),'\s+',' ','g')), ' ')[i+1:i+3], ' ')))
      |   END AS grams
      |  FROM all_docs),
      | pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |   CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |     / LEN(list_distinct(list_concat(a.grams, b.grams))) AS j
      |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 100000 AND a.doc_id < 100000)
      |SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM pairs WHERE j >= 0.8""".stripMargin

  // --------------------------------------------------------- brute kNN
  /** Exact cosine top-k (k=5) for the first 10 vectors — ANN baseline. */
  def q23KnnBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 10), emb, "vec_id", "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  val q23Sql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
      | c AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
      | s AS (
      |  SELECT qid AS query_id, nid AS neighbor_id,
      |   list_sum(list_transform(range(1, LEN(qv)+1),
      |     i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
      |   / (sqrt(list_sum(list_transform(range(1, LEN(qv)+1),
      |        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
      |    * sqrt(list_sum(list_transform(range(1, LEN(cv)+1),
      |        i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cosine
      |  FROM q, c),
      | r AS (
      |  SELECT query_id, neighbor_id, cosine,
      |   ROW_NUMBER() OVER (PARTITION BY query_id
      |     ORDER BY cosine DESC, neighbor_id) AS rank
      |  FROM s)
      |SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank
      |FROM r WHERE rank <= 5""".stripMargin

  // ------------------------------------------------------------ IVF ANN
  /** IVF approximate top-k — the scale path (probes nProbe/nCentroids of
    * the corpus) — over corpus + planted exact copies (vec_id+100000),
    * restricted to the planted relation: IVF is DETERMINISTIC for an
    * identical vector (same nearest-centroid assignment, same probe
    * list — NearestCentroids breaks ties by centroid id), so the copy is
    * always probed and scores cosine exactly 1.0; the query itself (also
    * in the corpus at cosine 1.0, smaller id wins the tie-break) takes
    * rank 1, the copy rank 2 — DuckDB's expected set is one
    * (id, id+100000, 1.0, 2) row per copied vector. General recall
    * (≥0.9 on planted NEAR neighbors, probed-fraction bound on uniform
    * data) stays asserted in SimilaritySpec. */
  def q24KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val copies = base.filter(col("vec_id") < 100)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    Similarity.ivfTopK(
      base.filter(col("vec_id") < 100), base.unionByName(copies),
      "vec_id", "vec_id", "embedding",
      k = 5, nCentroids = 16, nProbe = 4, dim = 64)
      .filter(col("neighbor_id") === col("query_id") + 100000L)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  val q24Sql: String =
    """SELECT vec_id AS query_id, vec_id + 100000 AS neighbor_id,
      | 1.0 AS cosine, CAST(2 AS BIGINT) AS rank
      |FROM embeddings WHERE vec_id < 100""".stripMargin

  // ----------------------------------------------------------- simhash
  /** SimHash near-dup pairs over a bounded corpus slice + planted exact
    * copies, restricted to the planted relation (id_b = id_a + 100000):
    * an identical copy has an identical 64-bit simhash, so it shares
    * every 16-bit band bucket deterministically and surfaces at Hamming
    * 0 — DuckDB's expected set is exactly one (id, id+100000, 0) row per
    * document. The slice is bounded at 500 docs because the guarantee
    * holds only while band buckets stay under the `maxBucket` skew cap:
    * the synthetic corpus' token distributions are similar enough that
    * 16-bit simhash bands collide corpus-wide, and at sf0.1 (5000 docs)
    * whole buckets exceed the cap and planted pairs are (correctly, per
    * the cap contract) dropped. Near-dup (mutated) behavior stays
    * asserted in DedupSpec, where the engine-side hashes can be compared
    * directly. */
  def q25Simhash(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 500)
      .select(col("doc_id"), col("text"))
    val copies = base.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    // maxDist 3 = the guarantee bound of 4-band/16-bit blocking
    Dedup.simhashPairs(base.unionByName(copies), "text", "doc_id", maxDist = 3)
      .filter(col("id_b") === col("id_a") + 100000L && col("id_a") < 100000L)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  val q25Sql: String =
    """SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
      | CAST(0 AS BIGINT) AS hamming
      |FROM documents WHERE doc_id < 500""".stripMargin

  // ------------------------------------------------------------------- A4
  /** PERCENTILE_CONT(0.5) WITHIN GROUP — exact median (SURVEY §2.3 A4;
    * test_snowflake_sources.py:13). Interpolated from at most two values
    * → bit-stable across engines. */
  def q26Percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("median_value"),
        round(expr("percentile(value, 0.9)"), 6).as("p90_value"),
        count(lit(1)).as("n"))

  val q26Sql: String =
    """SELECT event_type,
      | ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value), 6) AS median_value,
      | ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY value), 6) AS p90_value,
      | COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  // ----------------------------------------------------------- F5/F12
  /** IFF/IF, CONCAT/||, NULLIF+ZEROIFNULL idioms (SURVEY §2.6 F3/F4/F5/
    * F12; test_snowflake_sources.py:34,67). */
  def q27ScalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        when(col("value") > 10, "big").otherwise("small").as("size_tag"),
        concat(col("event_type"), lit("_"), col("user_id").cast("string")).as("tag"),
        coalesce(col("value") / nullif(pmod(col("user_id"), lit(10)), lit(0)), lit(0.0))
          .as("safe_ratio"))

  val q27Sql: String =
    """SELECT event_id,
      | IF(value > 10, 'big', 'small') AS size_tag,
      | event_type || '_' || CAST(user_id AS VARCHAR) AS tag,
      | COALESCE(value / NULLIF(user_id % 10, 0), 0.0) AS safe_ratio
      |FROM events""".stripMargin

  // ------------------------------------------------------------------- J4
  /** CROSS JOIN grid + left join with zero-fill (SURVEY §2.2 J4;
    * test_teradata_sources.py:22-33 date-spine × customer grid). */
  def q28CrossGrid(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val users = e.select(col("user_id")).distinct()
    val types = e.select(col("event_type")).distinct()
    val counts = e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    users.crossJoin(types)
      .join(counts, Seq("user_id", "event_type"), "left")
      .select(col("user_id"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  val q28Sql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      | t AS (SELECT DISTINCT event_type FROM events),
      | c AS (SELECT user_id, event_type, COUNT(*) AS n
      |       FROM events GROUP BY 1, 2)
      |SELECT u.user_id, t.event_type, COALESCE(c.n, 0) AS n_events
      |FROM u CROSS JOIN t
      |LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type""".stripMargin

  // ------------------------------------------------------------------- O3
  /** UNION ALL of tagged subsets (SURVEY §2.5 O3). */
  def q29UnionAll(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.filter(col("value") >= 15)
      .select(col("event_id"), lit("high").as("bucket"))
      .unionAll(
        e.filter(col("value") < 5)
          .select(col("event_id"), lit("low").as("bucket")))
  }

  val q29Sql: String =
    """SELECT event_id, 'high' AS bucket FROM events WHERE value >= 15
      |UNION ALL
      |SELECT event_id, 'low' AS bucket FROM events WHERE value < 5""".stripMargin

  // ------------------------------------------------------------------- A7
  /** ARRAY_AGG(OBJECT_CONSTRUCT(...)) ≡ sorted collect of structs,
    * serialized to JSON for a stable comparable shape (SURVEY §2.3 A7;
    * reference stringifies these — sql_sources.py:230-232; we keep the
    * native array<struct> in [[graft.engine.FeatureEngine]] plans and
    * stringify only at this comparison boundary). */
  def q30StructAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_id") < 500)
      .groupBy(col("user_id"))
      .agg(to_json(array_sort(collect_list(
        struct(col("event_id").as("id"), col("event_type").as("t")))))
        .as("events_json"))

  val q30Sql: String =
    """SELECT user_id,
      | CAST(to_json(list_sort(list((event_id, event_type)::
      |   STRUCT(id BIGINT, t VARCHAR)))) AS VARCHAR) AS events_json
      |FROM events WHERE event_id < 500 GROUP BY user_id""".stripMargin

  // ----------------------------------------------------- A10 (oracle'd)
  /** The north_star per-turn cumulative transcript features, fully
    * DuckDB-oracle-checked: a transcript table is derived from `events`
    * identically on both sides (conv=user, turn order by ts, text=props,
    * tool from event_type), then run through
    * [[TranscriptFeatures.cumulativeTurnFeatures]]. */
  def q31TranscriptFeatures(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tr = t(s, dir, "events").select(
      col("user_id").cast("string").as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      when(col("event_type") === "view", "user")
        .when(col("event_type") === "click", "assistant")
        .otherwise(col("event_type")).as("role"),
      col("props").as("text"),
      when(col("event_type") === "click", "browser").otherwise("").as("tool"),
      col("ts"))
    graft.features.TranscriptFeatures.cumulativeTurnFeatures(tr)
      .select(
        col("conv_id"), col("turn_idx"),
        col("turns_so_far"), col("tokens_so_far"), col("tool_turns_so_far"),
        round(col("tool_rate_so_far"), 6).as("tool_rate"),
        col("user_tokens_so_far"), col("assistant_tokens_so_far"))
  }

  val q31Sql: String =
    """WITH tr AS (
      |  SELECT CAST(user_id AS VARCHAR) AS conv_id,
      |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
      |     AS turn_idx,
      |   CASE WHEN event_type = 'view' THEN 'user'
      |        WHEN event_type = 'click' THEN 'assistant'
      |        ELSE event_type END AS role,
      |   props AS text,
      |   CASE WHEN event_type = 'click' THEN 'browser' ELSE '' END AS tool,
      |   ts
      |  FROM events),
      | f AS (
      |  SELECT conv_id, turn_idx,
      |   COUNT(*) OVER w AS turns_so_far,
      |   CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), x -> x <> ''))) OVER w AS BIGINT) AS tokens_so_far,
      |   CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS tool_turns_so_far,
      |   CAST(SUM(CASE WHEN role = 'user'
      |        THEN LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), x -> x <> '')) ELSE 0 END)
      |     OVER w AS BIGINT) AS user_tokens_so_far,
      |   CAST(SUM(CASE WHEN role = 'assistant'
      |        THEN LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), x -> x <> '')) ELSE 0 END)
      |     OVER w AS BIGINT) AS assistant_tokens_so_far
      |  FROM tr
      |  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT conv_id, turn_idx, turns_so_far, tokens_so_far, tool_turns_so_far,
      | ROUND(CAST(tool_turns_so_far AS DOUBLE) / turns_so_far, 6) AS tool_rate,
      | user_tokens_so_far, assistant_tokens_so_far
      |FROM f""".stripMargin

  // ------------------------------------------- embedding near-dup
  /** Embedding-cosine near-duplicates via banded random-hyperplane LSH
    * over the corpus + planted exact copies (vec_id+100000), restricted
    * to the planted relation: an identical copy has identical sign bits
    * in every band, so it is found deterministically with cosine exactly
    * 1.0 after 6-digit rounding — DuckDB's expected set is one
    * (id, id+100000, 1.0) row per copied vector. General near-dup recall
    * (banding at cosine 0.95) is asserted in DedupSpec. */
  def q32EmbedNeardup(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val copies = base.filter(col("vec_id") < 100)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    Dedup.embeddingNearDup(base.unionByName(copies), "embedding", "vec_id",
      dim = 64, nPlanes = 32, bands = 4, threshold = 0.98)
      .filter(col("id_b") === col("id_a") + 100000L && col("id_a") < 100000L)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  val q32Sql: String =
    """SELECT vec_id AS id_a, vec_id + 100000 AS id_b, 1.0 AS cosine
      |FROM embeddings WHERE vec_id < 100""".stripMargin

  // ------------------------------------------------- quality scoring
  /** Composite pretraining-data quality score (length band + punctuation
    * + stopword presence), oracle-checked: Java \p{Punct} == POSIX
    * [[:punct:]] (ASCII), identical ratio arithmetic on both sides. */
  def q33QualityScore(s: SparkSession, dir: String): DataFrame =
    Dedup.spread(t(s, dir, "documents"))
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))

  val q33Sql: String = {
    val stops = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (
       | SELECT doc_id,
       |  CASE WHEN TRIM(text) = '' THEN 0
       |       ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS toks,
       |  CASE WHEN LEN(text) = 0 THEN 0.0
       |       ELSE CAST(LEN(text) - LEN(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g'))
       |            AS DOUBLE) / LEN(text) END AS punct_ratio,
       |  CASE WHEN LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) = 0 THEN 0.0
       |       ELSE CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
       |              x -> x IN ($stops))) AS DOUBLE)
       |            / LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) END AS stop_ratio
       | FROM documents)
       |SELECT doc_id,
       | ROUND((
       |   (CASE WHEN toks BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
       |   + (1.0 - LEAST(punct_ratio * 5.0, 1.0))
       |   + LEAST(stop_ratio * 5.0, 1.0)) / 3.0, 6) AS quality
       |FROM m""".stripMargin
  }

  // ------------------------------------- winnowing rolling-hash dedup
  /** Winnowing (rolling-hash) fingerprint near-dup over corpus + planted
    * exact copies, restricted to the planted relation: identical text →
    * identical fingerprint set → every shared-fingerprint bucket pairs
    * them and overlap = |A∩B|/|A∪B| = exactly 1.0 — DuckDB's expected
    * set is one (id, id+100000, 1.0) row per document. Near-dup overlap
    * behavior on mutated text is asserted in DedupSpec, where the
    * engine-side fingerprints can be compared directly. */
  def q34WinnowFingerprint(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val copies = base.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    Dedup.winnowNearDup(base.unionByName(copies), "text", "doc_id",
      k = 16, w = 8, threshold = 0.8)
      .filter(col("id_b") === col("id_a") + 100000L && col("id_a") < 100000L)
      .select(col("id_a"), col("id_b"), round(col("overlap"), 6).as("overlap"))
  }

  val q34Sql: String =
    """SELECT doc_id AS id_a, doc_id + 100000 AS id_b, 1.0 AS overlap
      |FROM documents""".stripMargin

  // -------------------------------------- pretraining pipeline (e2e)
  /** The full pretraining-corpus cleaning composition over documents +
    * planted exact copies (+100000) + planted mutated near-dups
    * (+200000): exact dedup → minhash-LSH near-dup drop (greater id of
    * every ≥0.8 pair) → language filter (en) → quality filter (≥0.75).
    * DuckDB replays every stage exactly (md5 dedup, all-pairs shingle
    * Jaccard, marker-argmax langid, quality arithmetic), so the whole
    * pipeline is hash-gated end-to-end.
    *
    * Runs STAGED: the exact-dedup intermediate is materialized once to a
    * deterministic /tmp dir and the three downstream consumers (LSH
    * signatures, LSH verification join-back, the anti-join base) re-scan
    * the parquet instead of recomputing the dedup shuffle — at 100 TB
    * that is one corpus shuffle + one write instead of three shuffles
    * (PipelineSpec gates the plan shape). */
  def q35PipelineClean(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ", -1)
    val exactCopies = base.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val mutated = base.select(
      (col("doc_id") + 200000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1)))).as("text"))
    val corpus = base.unionByName(exactCopies).unionByName(mutated)
    val stage = scratch("q35_stage", dir)
    graft.pipeline.PretrainPipeline.clean(corpus, "text", "doc_id",
      stageDir = Some(stage))
      .select(col("doc_id"), col("lang_pred"), col("quality"))
  }

  val q35Sql: String = {
    val m = TextAnalysis.DefaultLangMarkers.toSeq.sortBy(_._1)
    val scores = m.map { case (lang, words) =>
      s"LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'), " +
        s"x -> x IN (${words.map(w => s"'$w'").mkString(", ")}))) AS s_$lang"
    }.mkString(",\n   ")
    val langs = m.map(_._1)
    val greatest = s"GREATEST(${langs.map("s_" + _).mkString(", ")})"
    val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    val stops = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
    val norm = "LOWER(REGEXP_REPLACE(TRIM(text),'\\s+',' ','g'))"
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       | exact_copies AS (SELECT doc_id + 100000 AS doc_id, text FROM base),
       | mutated AS (
       |  SELECT doc_id + 200000 AS doc_id,
       |   array_to_string(string_split(text, ' ')[1:GREATEST(LEN(string_split(text,' '))-2, 1)], ' ') AS text
       |  FROM base),
       | corpus AS (SELECT * FROM base UNION ALL SELECT * FROM exact_copies
       |            UNION ALL SELECT * FROM mutated),
       | exact AS (
       |  SELECT doc_id, text FROM (
       |   SELECT doc_id, text,
       |    ROW_NUMBER() OVER (PARTITION BY md5($norm) ORDER BY doc_id) AS rn
       |   FROM corpus) WHERE rn = 1),
       | sh AS (
       |  SELECT doc_id,
       |   CASE WHEN LEN(string_split($norm, ' ')) < 3
       |        THEN [$norm]
       |        ELSE list_distinct(list_transform(
       |          range(0, LEN(string_split($norm, ' ')) - 2),
       |          i -> array_to_string(string_split($norm, ' ')[i+1:i+3], ' ')))
       |   END AS grams
       |  FROM exact),
       | drops AS (
       |  SELECT DISTINCT b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
       |     / LEN(list_distinct(list_concat(a.grams, b.grams))) >= 0.8),
       | surv AS (
       |  SELECT e.doc_id, e.text FROM exact e
       |  LEFT JOIN drops d ON e.doc_id = d.id_b WHERE d.id_b IS NULL),
       | sc AS (
       |  SELECT doc_id, text,
       |   $scores
       |  FROM surv),
       | lng AS (
       |  SELECT doc_id, text, CASE $cases END AS lang_pred
       |  FROM (SELECT *, $greatest AS m FROM sc)),
       | qm AS (
       |  SELECT doc_id, lang_pred,
       |   CASE WHEN TRIM(text) = '' THEN 0
       |        ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS toks,
       |   CASE WHEN LEN(text) = 0 THEN 0.0
       |        ELSE CAST(LEN(text) - LEN(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g'))
       |             AS DOUBLE) / LEN(text) END AS punct_ratio,
       |   CASE WHEN LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) = 0 THEN 0.0
       |        ELSE CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
       |               x -> x IN ($stops))) AS DOUBLE)
       |             / LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) END AS stop_ratio
       |  FROM lng),
       | scored AS (
       |  SELECT doc_id, lang_pred,
       |   ROUND((
       |     (CASE WHEN toks BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
       |     + (1.0 - LEAST(punct_ratio * 5.0, 1.0))
       |     + LEAST(stop_ratio * 5.0, 1.0)) / 3.0, 6) AS quality
       |  FROM qm)
       |SELECT doc_id, lang_pred, quality FROM scored
       |WHERE lang_pred = 'en' AND quality >= 0.75""".stripMargin
  }

  // --------------------------------------------- subword token counts
  /** BPE-ish subword count + whitespace token count (SURVEY §2.6 F15
    * family; the testdata documents are punctuation/digit-free, so the
    * text is enriched with a deterministic doc_id-derived suffix —
    * identically on both sides — to exercise the punctuation and
    * digit-run terms). */
  def q36SubwordCount(s: SparkSession, dir: String): DataFrame =
    Dedup.spread(t(s, dir, "documents"))
      .withColumn("etext", concat(
        col("text"), lit(" v"), col("doc_id").cast("string"),
        lit(".0; rev-"), pmod(col("doc_id"), lit(7)).cast("string")))
      .select(
        col("doc_id"),
        TextAnalysis.subwordCountApprox(col("etext")).cast("long").as("subwords"),
        TextAnalysis.tokenCountRegex(col("etext")).cast("long").as("ws_tokens"))

  val q36Sql: String =
    """WITH e AS (
      | SELECT doc_id,
      |  text || ' v' || CAST(doc_id AS VARCHAR) || '.0; rev-'
      |       || CAST(doc_id % 7 AS VARCHAR) AS etext
      | FROM documents)
      |SELECT doc_id,
      | CAST(LEN(STRING_SPLIT_REGEX(TRIM(etext), '\s+'))
      |  + (LEN(etext) - LEN(REGEXP_REPLACE(etext, '[[:punct:]]', '', 'g')))
      |  + LEN(REGEXP_EXTRACT_ALL(etext, '[0-9]+')) AS BIGINT) AS subwords,
      | CAST(CASE WHEN TRIM(etext) = '' THEN 0
      |      ELSE LEN(STRING_SPLIT_REGEX(TRIM(etext), '\s+')) END AS BIGINT)
      |   AS ws_tokens
      |FROM e""".stripMargin

  // ---------------------------------------------- connected components
  /** Connected-components labeling (near-dup cluster canonicalization,
    * [[graft.dedup.ConnectedComponents]]) on a deterministic planted
    * graph: edges (i, i+1) for i % 5 != 4 (both endpoints restricted to
    * existing doc ids) make the components exact runs of 5 consecutive
    * ids, so DuckDB computes every expected label arithmetically —
    * component = id - id % 5 — while the engine has to earn it by
    * actual iterative label propagation. The one possible isolate (a
    * max id ≡ 0 mod 5 has neither an outgoing nor an incoming edge) is
    * excluded on both sides. PRECONDITION the oracle arithmetic relies
    * on: testdata doc_ids are contiguous from 0 (verified for all
    * shipped SFs) — ids starting elsewhere would misalign the
    * id − id % 5 runs and could add a low-end isolate the max-only
    * exclusion misses. */
  def q37ConnectedComponents(s: SparkSession, dir: String): DataFrame = {
    val ids = t(s, dir, "documents").select(col("doc_id"))
    val edges = ids.filter(pmod(col("doc_id"), lit(5)) =!= 4)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1L).as("id_b"))
      .join(ids.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
    graft.dedup.ConnectedComponents.label(edges)
      .select(col("id"), col("component"))
  }

  val q37Sql: String =
    """SELECT doc_id AS id, doc_id - doc_id % 5 AS component
      |FROM documents
      |WHERE NOT (doc_id % 5 = 0
      |           AND doc_id = (SELECT MAX(doc_id) FROM documents))""".stripMargin

  // ------------------------------------------------ multimodal metadata
  /** Multimodal metadata path, driver-gated: a deterministic media table
    * is DERIVED from `documents` by pure doc_id arithmetic (identically
    * replayable in DuckDB — no RNG, no binary payload), then run through
    * [[graft.multimodal.Multimodal.resizeMeta]] (image dims capped at
    * maxSide 256, aspect preserved) and
    * [[graft.multimodal.Multimodal.sampleFrames]] (1 frame/s over video
    * durations). Only the decode STUB is excluded — exactly the part
    * that needs real codecs. */
  def q38MediaMeta(s: SparkSession, dir: String): DataFrame = {
    val idx = (pmod(col("doc_id"), lit(3)) + 1).cast("int")
    val media = t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      lit(null).cast("binary").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")), idx)
          .as("media_type"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")), idx).as("format"),
        (lit(16L) + pmod(col("doc_id") * 37L, lit(1024L))).cast("int").as("width"),
        (lit(16L) + pmod(col("doc_id") * 53L, lit(1024L))).cast("int").as("height"),
        pmod(col("doc_id") * 997L, lit(10000L)).as("duration_ms")).as("meta"))
    val resized = graft.multimodal.Multimodal.resizeMeta(media, maxSide = 256)
    val frames = graft.multimodal.Multimodal.sampleFrames(resized, everyMs = 1000L)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"), max(col("frame_ts_ms")).as("last_frame_ts"))
    resized.select(
        col("media_id"),
        col("meta").getField("media_type").as("media_type"),
        col("meta").getField("width").as("width"),
        col("meta").getField("height").as("height"))
      .join(frames, Seq("media_id"), "left")
      .select(col("media_id"), col("media_type"), col("width"), col("height"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"),
        coalesce(col("last_frame_ts"), lit(-1L)).as("last_frame_ts"))
  }

  val q38Sql: String =
    """WITH m AS (
      | SELECT doc_id AS media_id,
      |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |  16 + (doc_id * 37) % 1024 AS width,
      |  16 + (doc_id * 53) % 1024 AS height,
      |  (doc_id * 997) % 10000 AS duration_ms
      | FROM documents),
      | r AS (
      | SELECT media_id, media_type,
      |  CASE WHEN media_type = 'image'
      |       THEN CAST(ROUND(width * LEAST(1.0, 256.0 / GREATEST(width, height))) AS INT)
      |       ELSE CAST(width AS INT) END AS width,
      |  CASE WHEN media_type = 'image'
      |       THEN CAST(ROUND(height * LEAST(1.0, 256.0 / GREATEST(width, height))) AS INT)
      |       ELSE CAST(height AS INT) END AS height
      | FROM m),
      | f AS (
      | SELECT media_id, COUNT(*) AS n_frames, MAX(ts) AS last_frame_ts
      | FROM (SELECT media_id,
      |        UNNEST(generate_series(0, GREATEST(duration_ms - 1, 0), 1000)) AS ts
      |       FROM m WHERE media_type = 'video')
      | GROUP BY media_id)
      |SELECT r.media_id, r.media_type, r.width, r.height,
      | COALESCE(f.n_frames, 0) AS n_frames,
      | COALESCE(f.last_frame_ts, -1) AS last_frame_ts
      |FROM r LEFT JOIN f ON r.media_id = f.media_id""".stripMargin

  // --------------------------------------------------------- A9 (bonus)
  /** ROLLUP subtotals (SURVEY §2.3 A9 — absent in the reference's SQL
    * corpus, provided for SQL-surface completeness): per-(type, user
    * decile) aggregates with type-level and grand totals; null-filled
    * grouping columns match across engines. */
  def q39Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .rollup(col("event_type"), pmod(col("user_id"), lit(10)).as("user_mod"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  val q39Sql: String =
    """SELECT event_type, user_id % 10 AS user_mod, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY ROLLUP (event_type, user_id % 10)""".stripMargin

  // --------------------------------------------------------- O4 (bonus)
  /** INTERSECT / EXCEPT / deterministic LIMIT (SURVEY §2.5 O4 — absent
    * in the reference, provided for SQL-surface completeness). */
  def q40SetOps(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val hi = e.filter(col("value") >= 10).select(col("event_id"))
    val click = e.filter(col("event_type") === "click").select(col("event_id"))
    hi.intersect(click).select(col("event_id"), lit("both").as("tag"))
      .unionAll(hi.except(click).select(col("event_id"), lit("hi_only").as("tag")))
      .unionAll(e.select(col("event_id")).orderBy(col("event_id")).limit(100)
        .select(col("event_id"), lit("first100").as("tag")))
  }

  val q40Sql: String =
    """SELECT event_id, 'both' AS tag FROM (
      |  SELECT event_id FROM events WHERE value >= 10
      |  INTERSECT
      |  SELECT event_id FROM events WHERE event_type = 'click')
      |UNION ALL
      |SELECT event_id, 'hi_only' AS tag FROM (
      |  SELECT event_id FROM events WHERE value >= 10
      |  EXCEPT
      |  SELECT event_id FROM events WHERE event_type = 'click')
      |UNION ALL
      |SELECT event_id, 'first100' AS tag FROM (
      |  SELECT event_id FROM events ORDER BY event_id LIMIT 100)""".stripMargin

  // --------------------------------------------------------- J7 (bonus)
  /** Semi/anti join (SURVEY §2.2 J7 — absent in the reference's SQL
    * corpus; the pipeline's survivor anti-join
    * ([[graft.pipeline.PretrainPipeline.clean]]) is its production use).
    * Splits customers by existence of a high-value order: `left_semi`
    * keeps only left rows WITH a match (no right columns, no row
    * amplification — a customer with 40 big orders appears once),
    * `left_anti` keeps only left rows WITHOUT one. Both sides shuffle
    * on the key once; at scale the filtered orders side stays skinny
    * (key column only) through the exchange. The remaining J7 flavor —
    * theta/range predicates — is exercised by the as-of join's
    * `[t − ttl, t]` range (q09). */
  def q41SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val big = t(s, dir, "orders")
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey").as("c_custkey"))
    cust.join(big, Seq("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"), lit("has_big").as("tag"))
      .unionAll(cust.join(big, Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"), lit("none").as("tag")))
  }

  val q41Sql: String =
    """SELECT c_custkey, c_mktsegment, 'has_big' AS tag FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      |UNION ALL
      |SELECT c_custkey, c_mktsegment, 'none' AS tag FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)""".stripMargin

  // ----------------------------------------------- n-gram language ID
  /** Char-n-gram profile language ID (the substring-frequency variant of
    * q19's marker-wordlist heuristic — fires inside inflected/compound
    * words). Native one-pass [[graft.functions.SubstringSetCount]] per
    * language; per-pattern non-overlap counts equal REPLACE arithmetic,
    * so DuckDB replays every score exactly. */
  def q42LangIdNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.spread(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langIdNgram(col("text")).as("ngram_pred"))

  val q42Sql: String = {
    val m = TextAnalysis.DefaultLangNgrams.toSeq.sortBy(_._1)
    val scores = m.map { case (lang, grams) =>
      grams.map(g => s"((LEN(t) - LEN(REPLACE(t, '$g', ''))) // ${g.length})")
        .mkString(" + ") + s" AS s_$lang"
    }.mkString(",\n   ")
    val langs = m.map(_._1)
    val greatest = s"GREATEST(${langs.map("s_" + _).mkString(", ")})"
    val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH lt AS (SELECT doc_id, lang, LOWER(text) AS t FROM documents),
       | sc AS (
       |  SELECT doc_id, lang,
       |   $scores
       |  FROM lt),
       | mx AS (SELECT *, $greatest AS m FROM sc)
       |SELECT doc_id, lang, CASE $cases END AS ngram_pred FROM mx""".stripMargin
  }

  // ------------------------------------------------------ salted agg
  /** Salted two-phase per-conversation aggregation in the driver gate
    * (north_star: "salted repartitioning" — previously spec-only in
    * SaltedAggSpec). The engine runs
    * [[graft.features.TranscriptFeatures.convAggregatesSalted]] — hot
    * keys split across (key, salt) partial reducers, then merged — and
    * must land EXACTLY on the plain one-phase GROUP BY the oracle
    * computes: every aggregate here is salt-decomposable (count/sum/
    * min/max, rate derived as sum/count after the merge). Transcript
    * shape is derived from `events` like q31. */
  def q43SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val tr = t(s, dir, "events").select(
      col("user_id").cast("string").as("conv_id"),
      when(col("event_type") === "view", "user")
        .when(col("event_type") === "click", "assistant")
        .otherwise(col("event_type")).as("role"),
      col("props").as("text"),
      when(col("event_type") === "click", "browser").otherwise("").as("tool"),
      col("ts"))
    graft.features.TranscriptFeatures.convAggregatesSalted(tr, salt = 8)
      .select(col("conv_id"), col("n_turns"), col("last_ts"), col("first_ts"),
        col("tool_turns"), round(col("tool_rate"), 6).as("tool_rate"),
        col("total_tokens"),
        col("role_user_tokens"), col("role_user_turns"),
        col("role_assistant_tokens"), col("role_assistant_turns"))
  }

  val q43Sql: String =
    """WITH tr AS (
      | SELECT CAST(user_id AS VARCHAR) AS conv_id,
      |  CASE WHEN event_type = 'view' THEN 'user'
      |       WHEN event_type = 'click' THEN 'assistant'
      |       ELSE event_type END AS role,
      |  props AS text,
      |  CASE WHEN event_type = 'click' THEN 'browser' ELSE '' END AS tool,
      |  ts
      | FROM events),
      | tok AS (
      | SELECT *, LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), x -> x <> ''))
      |   AS toks
      | FROM tr)
      |SELECT conv_id,
      | COUNT(*) AS n_turns,
      | MAX(ts) AS last_ts,
      | MIN(ts) AS first_ts,
      | CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT) AS tool_turns,
      | ROUND(CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS DOUBLE)
      |   / COUNT(*), 6) AS tool_rate,
      | CAST(SUM(toks) AS BIGINT) AS total_tokens,
      | CAST(SUM(CASE WHEN role = 'user' THEN toks ELSE 0 END) AS BIGINT)
      |   AS role_user_tokens,
      | CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
      |   AS role_user_turns,
      | CAST(SUM(CASE WHEN role = 'assistant' THEN toks ELSE 0 END) AS BIGINT)
      |   AS role_assistant_tokens,
      | CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
      |   AS role_assistant_turns
      |FROM tok GROUP BY conv_id""".stripMargin

  // ---------------------------------------- materialization + pruning
  /** Materialization sink round-trip in the driver gate (north_rule:
    * resumable checkpointed backfill — previously MaterializerSpec-only):
    * a feature table is materialized through
    * [[graft.materialize.Materializer.materialize]] (event-time daily
    * buckets, ONE dynamic-partition write, atomic per-bucket manifests),
    * then a 10-day window is read back via `readRange` — which must
    * partition-prune to 10 bucket dirs — and must equal the source-side
    * date filter DuckDB computes directly. The sink is WIPED first so
    * every execution exercises the real write path (a persistent sink
    * would resume past complete manifests and gate stale bytes written
    * by older code); the manifest resume/crash semantics themselves are
    * MaterializerSpec's job (including an injected-failure restart). */
  def q44MaterializeRange(s: SparkSession, dir: String): DataFrame = {
    val feats = t(s, dir, "events").select(
      col("event_id"), col("user_id"), col("ts"),
      (col("value") * 2.0).as("v2x"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("is_purchase"))
    val sink = scratch("q44_sink", dir)
    val hp = new org.apache.hadoop.fs.Path(sink)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
    graft.materialize.Materializer.materialize(s, feats, "ts", sink,
      lineage = Map("source" -> s"$dir/events.parquet"))
    graft.materialize.Materializer
      .readRange(s, sink, "2024-01-08", "2024-01-17")
      .select(col("event_id"), col("user_id"), col("v2x"), col("is_purchase"))
  }

  val q44Sql: String =
    """SELECT event_id, user_id, value * 2.0 AS v2x,
      | CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT)
      |   AS is_purchase
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-17'""".stripMargin

  // ------------------------------------- YAML-driven engine retrieval
  /** The reference's core API path end-to-end in the driver gate
    * (previously FeatureEngineSpec-only): EP1 `applyConfig` registers
    * entity + file source, EP2 `createFromYamlText` validates and
    * registers a feature view + service from YAML, EP3 `retrieve` runs
    * the backward as-of join with TTL for a probe grid (every user at
    * two fixed timestamps). The oracle replays the point-in-time
    * semantics directly: latest event with `ts ∈ [probe − 7d, probe]`
    * per (user, probe), nulls where none (left-outer). `event_id` rides
    * as the created-timestamp tie-break on BOTH sides (greatest wins),
    * so the gate stays deterministic even if regenerated testdata gains
    * equal-(user, ts) rows; behavioral tie-break semantics are
    * FeatureEngineSpec's job. */
  def q45YamlRetrieve(s: SparkSession, dir: String): DataFrame = {
    val engine = new graft.engine.FeatureEngine(s)
    engine.applyConfig(Map(
      "entities" -> Seq(Map(
        "name" -> "user", "join_key" -> "user_id",
        "description" -> "event actor")),
      "data_sources" -> Map("events_src" -> Map(
        "type" -> "file",
        "path" -> s"$dir/events.parquet",
        "timestamp_field" -> "ts",
        // unique tie-break key so equal-ts rows (none in current
        // testdata, but regeneration must not break the gate) resolve
        // identically on both sides: greatest created wins in the
        // engine ↔ ORDER BY ts DESC, event_id DESC in the oracle
        "created_timestamp_column" -> "event_id"))))
    engine.createFromYamlText(
      """feature_views:
        |  user_latest:
        |    source_name: events_src
        |    entities: [user]
        |    ttl_days: 7
        |    schema:
        |      - name: value
        |        dtype: FLOAT
        |      - name: props
        |        dtype: STRING
        |feature_services:
        |  user_svc:
        |    features: [user_latest]""".stripMargin)
    val probes = t(s, dir, "events").select(col("user_id")).distinct()
      .crossJoin(probeTimes(s))
      .select(col("user_id"), col("t").cast("timestamp").as("event_timestamp"))
    engine.retrieve(probes, "user_svc")
      .select(col("user_id"), col("event_timestamp").as("probe_ts"),
        col("value"), col("props"))
  }

  private def probeTimes(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq("2024-01-15 00:00:00", "2024-01-25 00:00:00").toDF("t")
  }

  val q45Sql: String =
    """WITH p AS (SELECT DISTINCT user_id FROM events),
      | pr AS (
      |  SELECT user_id, UNNEST([TIMESTAMP '2024-01-15 00:00:00',
      |                          TIMESTAMP '2024-01-25 00:00:00']) AS probe_ts
      |  FROM p),
      | j AS (
      |  SELECT pr.user_id, pr.probe_ts, e.value, e.props,
      |   ROW_NUMBER() OVER (PARTITION BY pr.user_id, pr.probe_ts
      |     ORDER BY e.ts DESC, e.event_id DESC) AS rn
      |  FROM pr LEFT JOIN events e
      |    ON e.user_id = pr.user_id
      |   AND e.ts <= pr.probe_ts
      |   AND e.ts >= pr.probe_ts - INTERVAL 7 DAY)
      |SELECT user_id, probe_ts, value, props FROM j WHERE rn = 1""".stripMargin

  // ---------------------------------------------- near-dup clusters
  /** Transitive near-dup clustering in the driver gate:
    * [[Dedup.nearDupClusters]] (MinHash-LSH candidates → exact-Jaccard
    * verify → ConnectedComponents closure) over a bounded slice plus
    * TWO mutation generations (drop-2 and drop-4 words), which plants
    * ≥3-node clusters. The oracle earns the same answer the hard way:
    * DuckDB computes the EXACT ≥0.8 3-gram Jaccard pair graph all-pairs
    * (q21's arithmetic) and closes it transitively with a recursive CTE
    * (min reachable id per node) — so the gate covers LSH recall AND
    * the cluster closure, organic pairs included. Determinism: seeded
    * hashing; at 16 bands × 2 rows the per-pair banding miss is
    * ≤ (1−0.8²)¹⁶ ≈ 8e-8 at the threshold, verified empirically on the
    * gate data. Bounded slice keeps the all-pairs oracle O(1) in SF;
    * the scale path is q22. */
  def q46NeardupClusters(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    val toks = split(col("text"), " ", -1)
    def dropped(n: Int, shift: Long) = base.select(
      (col("doc_id") + shift).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - n, lit(1))))
        .as("text"))
    val all = base.unionByName(dropped(2, 100000L)).unionByName(dropped(4, 200000L))
    Dedup.nearDupClusters(all, "text", "doc_id", numHashes = 32, bands = 16)
  }

  val q46Sql: String = {
    val norm = "LOWER(REGEXP_REPLACE(TRIM(text),'\\s+',' ','g'))"
    s"""WITH RECURSIVE base AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 200),
       | drop2 AS (
       |  SELECT doc_id + 100000 AS doc_id,
       |   array_to_string(string_split(text, ' ')[1:GREATEST(LEN(string_split(text,' '))-2, 1)], ' ') AS text
       |  FROM base),
       | drop4 AS (
       |  SELECT doc_id + 200000 AS doc_id,
       |   array_to_string(string_split(text, ' ')[1:GREATEST(LEN(string_split(text,' '))-4, 1)], ' ') AS text
       |  FROM base),
       | all_docs AS (
       |  SELECT * FROM base UNION ALL SELECT * FROM drop2
       |  UNION ALL SELECT * FROM drop4),
       | sh AS (
       |  SELECT doc_id,
       |   CASE WHEN LEN(string_split($norm, ' ')) < 3
       |        THEN [$norm]
       |        ELSE list_distinct(list_transform(
       |          range(0, LEN(string_split($norm, ' ')) - 2),
       |          i -> array_to_string(string_split($norm, ' ')[i+1:i+3], ' ')))
       |   END AS grams
       |  FROM all_docs),
       | pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
       |     / LEN(list_distinct(list_concat(a.grams, b.grams))) >= 0.8),
       | edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       | reach(id, r) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b)
       |SELECT id AS doc_id, MIN(r) AS canonical FROM reach GROUP BY id""".stripMargin
  }

  // ------------------------------ multi-view feature-service retrieval
  /** The reference's actual product shape end-to-end: a feature SERVICE
    * of TWO views (reference: customer_metrics.py:127-130 retrieves the
    * multi-view `customer_insights` service), one over the raw events
    * file source and one over a DERIVED daily-aggregate `spark` QUERY
    * source (S2), retrieved in a single call. The engine executes the
    * multi-view path ([[graft.asof.AsOfJoin.backwardMulti]]): both
    * views' feature rows and the probe union into ONE window pass — one
    * hash exchange for the whole service (MultiViewRetrieveSpec gates
    * the plan; V exchanges would be the naive fold). The oracle replays
    * each view as its own correlated ROW_NUMBER() point-in-time join and
    * joins the two replays on (user, probe). Tie-breaks: the events
    * view carries `event_id` as its created-ts tie-break on both sides;
    * (user_id, day_ts) is unique by GROUP BY construction. */
  def q47MultiViewService(s: SparkSession, dir: String): DataFrame = {
    val engine = new graft.engine.FeatureEngine(s)
    engine.applyConfig(Map(
      "entities" -> Seq(Map(
        "name" -> "user", "join_key" -> "user_id",
        "description" -> "event actor")),
      "data_sources" -> Map(
        "events_src" -> Map(
          "type" -> "file",
          "path" -> s"$dir/events.parquet",
          "timestamp_field" -> "ts",
          // unique tie-break (see q45): greatest event_id wins equal-ts
          "created_timestamp_column" -> "event_id"),
        "daily_src" -> Map(
          "type" -> "spark",
          "query" -> (s"SELECT user_id, CAST(to_date(ts) AS TIMESTAMP) AS day_ts, " +
            s"COUNT(*) AS n_events, " +
            s"CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value " +
            s"FROM parquet.`$dir/events.parquet` GROUP BY user_id, to_date(ts)"),
          "timestamp_field" -> "day_ts"))))
    engine.createFromYamlText(
      """feature_views:
        |  user_latest:
        |    source_name: events_src
        |    entities: [user]
        |    ttl_days: 7
        |    schema:
        |      - name: value
        |        dtype: FLOAT
        |      - name: props
        |        dtype: STRING
        |  user_daily:
        |    source_name: daily_src
        |    entities: [user]
        |    ttl_days: 3
        |    schema:
        |      - name: n_events
        |        dtype: INT64
        |      - name: day_value
        |        dtype: FLOAT
        |feature_services:
        |  user_insights:
        |    features: [user_latest, user_daily]""".stripMargin)
    val probes = t(s, dir, "events").select(col("user_id")).distinct()
      .crossJoin(probeTimes(s))
      .select(col("user_id"), col("t").cast("timestamp").as("event_timestamp"))
    engine.retrieve(probes, "user_insights")
      .select(col("user_id"), col("event_timestamp").as("probe_ts"),
        col("value"), col("props"), col("n_events"),
        round(col("day_value"), 6).as("day_value"))
  }

  val q47Sql: String =
    """WITH p AS (SELECT DISTINCT user_id FROM events),
      | pr AS (
      |  SELECT user_id, UNNEST([TIMESTAMP '2024-01-15 00:00:00',
      |                          TIMESTAMP '2024-01-25 00:00:00']) AS probe_ts
      |  FROM p),
      | j1 AS (
      |  SELECT pr.user_id, pr.probe_ts, e.value, e.props,
      |   ROW_NUMBER() OVER (PARTITION BY pr.user_id, pr.probe_ts
      |     ORDER BY e.ts DESC, e.event_id DESC) AS rn
      |  FROM pr LEFT JOIN events e
      |    ON e.user_id = pr.user_id
      |   AND e.ts <= pr.probe_ts
      |   AND e.ts >= pr.probe_ts - INTERVAL 7 DAY),
      | d AS (
      |  SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts,
      |   COUNT(*) AS n_events,
      |   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
      | j2 AS (
      |  SELECT pr.user_id, pr.probe_ts, d.n_events, d.day_value,
      |   ROW_NUMBER() OVER (PARTITION BY pr.user_id, pr.probe_ts
      |     ORDER BY d.day_ts DESC) AS rn
      |  FROM pr LEFT JOIN d
      |    ON d.user_id = pr.user_id
      |   AND d.day_ts <= pr.probe_ts
      |   AND d.day_ts >= pr.probe_ts - INTERVAL 3 DAY)
      |SELECT j1.user_id, j1.probe_ts, j1.value, j1.props,
      | j2.n_events, ROUND(j2.day_value, 6) AS day_value
      |FROM (SELECT * FROM j1 WHERE rn = 1) j1
      |JOIN (SELECT * FROM j2 WHERE rn = 1) j2
      |  ON j1.user_id = j2.user_id AND j1.probe_ts = j2.probe_ts""".stripMargin

  // ----------------------------------- persisted IVF index (build/query)
  /** Build-once / query-many ANN serving path
    * ([[graft.similarity.IvfIndex]]): the index (centroids + centroid-
    * partitioned corpus) is BUILT once per execution into a per-process
    * scratch dir (wiped first so the real build path runs every time),
    * then QUERIED TWICE — the gated result is the intersection of the
    * two rounds, so any cross-query nondeterminism shrinks the row count
    * below the oracle's and fails the gate. Oracle = q24's planted-copy
    * relation (identical vector → same cell → always probed → cosine
    * exactly 1.0 at rank 2 behind the query itself). IvfPlanSpec asserts
    * the query path contains no Lloyd aggregation and partition-prunes
    * the corpus scan to the probed cells. */
  def q48IvfIndexQuery(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val copies = base.filter(col("vec_id") < 100)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val idx = scratch("q48_ivf", dir)
    val hp = new org.apache.hadoop.fs.Path(idx)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
    // iters=1: the planted-copy oracle is centroid-quality-independent
    // (identical vectors land in the same cell for ANY centroid table);
    // centroid refinement quality is IvfIndexSpec/SimilaritySpec's job
    graft.similarity.IvfIndex.build(
      base.unionByName(copies), "vec_id", "embedding", idx,
      nCentroids = 16, dim = 64, iters = 1)
    val queries = base.filter(col("vec_id") < 100)
    def once(): DataFrame = graft.similarity.IvfIndex.query(
      s, idx, queries, "vec_id", "embedding", k = 5, nProbe = 4)
    once().intersect(once())
      .filter(col("neighbor_id") === col("query_id") + 100000L)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  val q48Sql: String =
    """SELECT vec_id AS query_id, vec_id + 100000 AS neighbor_id,
      | 1.0 AS cosine, CAST(2 AS BIGINT) AS rank
      |FROM embeddings WHERE vec_id < 100""".stripMargin

  /** Run a bounded streaming lifecycle with stream-sized state
    * partitioning. `spark.sql.shuffle.partitions` governs the number of
    * state-store instances (and per-micro-batch tasks) of every stateful
    * streaming operator, fixed at query start; the batch session sizes
    * it to the core count, which for these bounded gate streams
    * (≤ a few hundred rows per batch) just multiplies per-batch
    * task-launch + state-commit overhead — measured 35-40% of the
    * streaming queries' wall clock at 32 partitions vs 8. State
    * partitioning is a per-stream capacity decision (resizing means a
    * new checkpoint), so it is parameterised (SPARK_GRAFT_STREAM_SHUFFLE,
    * default 8) — a production ingest sized for real throughput sets it
    * to hundreds/thousands; results are partition-count-invariant
    * (dedup survivor choice is committed-state-based, session/window
    * aggregates are deterministic functions of the data). The previous
    * value is restored after the lifecycle so batch queries are
    * untouched. */
  private def withStreamShuffle[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "8"))
    try body finally s.conf.set(key, prev)
  }

  // ------------------------------------- streaming near-dup (driver gate)
  /** Structured Streaming in the driver gate (SURVEY §2.1 S7 —
    * previously spec-only): token-NAMESPACED synthetic docs (40 tokens
    * `w<id*100+j>`, disjoint across ids — replayed identically by
    * DuckDB) plus token-REVERSED copies (id+100000, arriving in a LATER
    * micro-batch) stream through [[graft.streaming.StreamingFeatures
    * .streamingNearDupDedup]]. SimHash64 is a majority vote over
    * DISTINCT tokens, so a reversed copy is signature-identical
    * deterministically and every copy is dropped against batch-1
    * state — survivors are exactly the originals, which DuckDB states
    * directly. Disjoint token sets make intra-batch-1 signature
    * collisions structurally absent (an earlier cut streamed REAL
    * documents rows and lost 26/300 to organic signature collisions —
    * real dedup behavior, but not oracle-replayable without simhash).
    * The 300-row driver-side generation builds the TEST stream only —
    * the operator under test is the streaming query itself. */
  def q49StreamingNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val originals = t(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id")).as[Long].collect().sorted
      .map { id =>
        (id, (1 to 40).map(j => s"w${id * 100 + j}").mkString(" "),
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) }
    val copies = originals.map { case (id, tx, _) =>
      (id + 100000L, tx.split(" ").reverse.mkString(" "),
        java.sql.Timestamp.valueOf("2024-01-01 00:10:00")) }
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)](s)
    val out = graft.streaming.StreamingFeatures.streamingNearDupDedup(
      input.toDF().toDF("doc_id", "text", "ts"), "text")
    val table = s"q49_stream_${ProcessHandle.current().pid()}"
    withStreamShuffle(s) {
      val q = out.writeStream.format("memory").queryName(table)
        .outputMode("append").start()
      try {
        input.addData(originals.toSeq) // batch 1: originals seed the state
        // force the micro-batch boundary BEFORE the copies arrive: two
        // back-to-back addData calls coalesce into one batch, and
        // intra-batch dedup keeps whichever row a shuffle happens to
        // deliver first — the determinism of this gate rests on the
        // copies testing committed batch-1 STATE, not intra-batch order
        q.processAllAvailable()
        input.addData(copies.toSeq)    // batch 2: every copy collapses
        q.processAllAvailable()
      } finally q.stop()
    }
    s.table(table).select(col("doc_id"), col("text"))
  }

  val q49Sql: String =
    """SELECT doc_id,
      | array_to_string(list_transform(range(1, 41),
      |   j -> 'w' || CAST(doc_id * 100 + j AS VARCHAR)), ' ') AS text
      |FROM documents WHERE doc_id < 300""".stripMargin

  // ------------------------------------------------- PII redaction
  /** PII scrubbing ([[graft.text.Redact]]) driver-gated: emails, dashed
    * phone numbers and IPv4 addresses are planted into `documents` text
    * by pure doc_id arithmetic (every 3rd doc stays clean to exercise
    * the zero-count path), then masked with stable placeholders and
    * counted on the raw text. The patterns are RE2-compatible (no
    * backreferences/lookaround), so DuckDB replays both the plant and
    * the regex semantics byte-for-byte. */
  def q50PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val pii = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@ex"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".com tel 555-"),
      (pmod(col("doc_id"), lit(900)) + 100).cast("string"),
      lit("-"), (pmod(col("doc_id"), lit(9000)) + 1000).cast("string"),
      lit(" ip 10."), pmod(col("doc_id"), lit(256)).cast("string"),
      lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
      lit("."), pmod(col("doc_id") * 13, lit(256)).cast("string"))
    Dedup.spread(t(s, dir, "documents"))
      .withColumn("etext",
        when(pmod(col("doc_id"), lit(3)) === 0, col("text")).otherwise(pii))
      .select(
        col("doc_id"),
        graft.text.Redact.scrub(col("etext")).as("clean_text"),
        graft.text.Redact.redactionCount(col("etext")).as("n_redactions"))
  }

  val q50Sql: String = {
    // the ORACLE verifies the SHIPPED rules: patterns and placeholders
    // come from Redact's Rule constants, so an edit there cannot drift
    // away from what this gate checks
    val email = graft.text.Redact.Email.pattern
    val phone = graft.text.Redact.Phone.pattern
    val ipv4 = graft.text.Redact.Ipv4.pattern
    s"""WITH e AS (
       | SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0 THEN text
       |  ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
       |   || '@ex' || CAST(doc_id % 7 AS VARCHAR)
       |   || '.com tel 555-' || CAST(doc_id % 900 + 100 AS VARCHAR)
       |   || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
       |   || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
       |   || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
       |   || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
       |  END AS etext
       | FROM documents)
       |SELECT doc_id,
       | regexp_replace(regexp_replace(regexp_replace(etext,
       |   '$email', '${graft.text.Redact.Email.placeholder}', 'g'),
       |   '$phone', '${graft.text.Redact.Phone.placeholder}', 'g'),
       |   '$ipv4', '${graft.text.Redact.Ipv4.placeholder}', 'g') AS clean_text,
       | CAST(LEN(regexp_extract_all(etext, '$email'))
       |  + LEN(regexp_extract_all(etext, '$phone'))
       |  + LEN(regexp_extract_all(etext, '$ipv4')) AS BIGINT) AS n_redactions
       |FROM e""".stripMargin
  }

  // ------------------------------------------- repetition signals
  /** Gopher-style repetition filters driver-gated: a lined/repetitive
    * document is DERIVED from `documents` by doc_id arithmetic — every
    * 3rd doc duplicates its first line twice, every 4th doc appends a
    * run of one repeated bigram — then scored with
    * [[TextAnalysis.dupLineFraction]] (raw-line distinct arithmetic) and
    * [[TextAnalysis.topNgramFraction]] (native one-pass
    * [[graft.functions.NgramModeFraction]]). DuckDB replays the
    * construction, the line histogram, and the bigram mode fraction via
    * an UNNEST histogram. `keep` applies Gopher-ish thresholds. */
  def q51Repetition(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ", -1)
    def line(from: Int) = concat_ws(" ", slice(toks, lit(from), lit(8)))
    val l1 = line(1); val l2 = line(9); val l3 = line(17)
    val spam = concat_ws(" ",
      array_repeat(lit("spam ham"), (pmod(col("doc_id"), lit(5)) + 3).cast("int")))
    val lined =
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat_ws("\n", l1, l2, l1, l3, l1))
        .otherwise(concat_ws("\n", l1, l2, l3))
    val etext =
      when(pmod(col("doc_id"), lit(4)) === 0, concat(lined, lit("\n"), spam))
        .otherwise(lined)
    Dedup.spread(t(s, dir, "documents"))
      .withColumn("etext", etext)
      .select(
        col("doc_id"),
        round(TextAnalysis.dupLineFraction(col("etext")), 6).as("dup_line_frac"),
        round(TextAnalysis.topNgramFraction(col("etext"), 2), 6).as("top_bigram_frac"),
        (TextAnalysis.dupLineFraction(col("etext")) < 0.3 &&
          TextAnalysis.topNgramFraction(col("etext"), 2) < 0.2)
          .cast("long").as("keep"))
  }

  val q51Sql: String = {
    val norm = "LOWER(REGEXP_REPLACE(TRIM(etext),'\\s+',' ','g'))"
    s"""WITH b AS (
       | SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       | parts AS (
       | SELECT doc_id,
       |  -- COALESCE: DuckDB array_to_string of an EMPTY slice is NULL,
       |  -- Spark concat_ws of an empty array is '' — short docs must
       |  -- agree
       |  COALESCE(array_to_string(toks[1:8], ' '), '') AS l1,
       |  COALESCE(array_to_string(toks[9:16], ' '), '') AS l2,
       |  COALESCE(array_to_string(toks[17:24], ' '), '') AS l3,
       |  COALESCE(array_to_string(list_transform(range(1, CAST(doc_id % 5 + 4 AS BIGINT)),
       |    i -> 'spam ham'), ' '), '') AS spam
       | FROM b),
       | e AS (
       | SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0 THEN l1 || chr(10) || l2 || chr(10) || l1
       |         || chr(10) || l3 || chr(10) || l1
       |       ELSE l1 || chr(10) || l2 || chr(10) || l3 END
       |  || CASE WHEN doc_id % 4 = 0 THEN chr(10) || spam ELSE '' END AS etext
       | FROM parts),
       | lines AS (
       | SELECT doc_id,
       |  CAST(LEN(string_split(etext, chr(10)))
       |    - LEN(list_distinct(string_split(etext, chr(10)))) AS DOUBLE)
       |    / LEN(string_split(etext, chr(10))) AS dup_line_frac
       | FROM e),
       | sh AS (
       | SELECT doc_id,
       |  CASE WHEN LEN(string_split($norm, ' ')) < 2 THEN [$norm]
       |       ELSE list_transform(range(0, LEN(string_split($norm, ' ')) - 1),
       |         i -> array_to_string(string_split($norm, ' ')[i+1:i+2], ' '))
       |  END AS grams
       | FROM e),
       | g AS (SELECT doc_id, UNNEST(grams) AS gr FROM sh),
       | c AS (SELECT doc_id, gr, COUNT(*) AS cnt FROM g GROUP BY doc_id, gr),
       | m AS (SELECT doc_id, CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS tf
       |       FROM c GROUP BY doc_id)
       |SELECT l.doc_id, ROUND(l.dup_line_frac, 6) AS dup_line_frac,
       | ROUND(m.tf, 6) AS top_bigram_frac,
       | CAST(l.dup_line_frac < 0.3 AND m.tf < 0.2 AS BIGINT) AS keep
       |FROM lines l JOIN m ON l.doc_id = m.doc_id""".stripMargin
  }

  // ----------------------------------- streaming session windows
  /** Streaming gap-sessionization in the driver gate (S7, second op
    * class after q49's stateful dedup): a bounded transcript-shaped
    * slice of `events` streams through [[graft.streaming
    * .StreamingFeatures.sessionAggregates]] (built-in `session_window`,
    * watermarked, complete mode) in TWO micro-batches split mid-stream —
    * sessions opened in batch 1 must merge/extend with batch-2 events.
    * Session aggregation is a deterministic function of the data (no
    * first-arrival semantics), so unlike q49 no ordering hazard exists;
    * the boundary exercises cross-batch session-state merging. The
    * oracle replays `session_window` semantics exactly: a NEW session
    * starts when the gap is ≥ 1800 s (the built-in splits when event
    * windows no longer overlap — note q08's hand-rolled batch
    * sessionizer uses strict >; both are gated, each against its own
    * contract). (user_id, ts) is unique so the LAG ordering is total. */
  def q52StreamingSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = t(s, dir, "events").filter(col("user_id") < 10)
      .select(col("user_id").cast("string").as("conv_id"), col("ts"),
        col("props").as("text"),
        when(col("event_type") === "click", "browser").otherwise("").as("tool"))
      .as[(String, java.sql.Timestamp, String, String)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp, String, String)](s)
    val out = graft.streaming.StreamingFeatures.sessionAggregates(
      input.toDF().toDF("conv_id", "ts", "text", "tool"), gapSeconds = 1800L)
    val table = s"q52_sessions_${ProcessHandle.current().pid()}"
    withStreamShuffle(s) {
      val q = out.writeStream.format("memory").queryName(table)
        .outputMode("complete").start()
      try {
        input.addData(b1.toSeq)
        q.processAllAvailable()
        input.addData(b2.toSeq)
        q.processAllAvailable()
      } finally q.stop()
    }
    s.table(table).select(
      col("conv_id"), col("session_start"), col("turns"),
      col("tokens"), col("tool_turns"))
  }

  val q52Sql: String =
    """WITH tr AS (
      | SELECT CAST(user_id AS VARCHAR) AS conv_id, ts, props AS text,
      |  CASE WHEN event_type = 'click' THEN 'browser' ELSE '' END AS tool
      | FROM events WHERE user_id < 10),
      | g AS (
      | SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
      |        OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
      |       THEN 1 ELSE 0 END AS is_new
      | FROM tr WINDOW w AS (PARTITION BY conv_id ORDER BY ts)),
      | sid AS (
      | SELECT *, SUM(is_new) OVER (PARTITION BY conv_id ORDER BY ts
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      | FROM g)
      |SELECT conv_id, MIN(ts) AS session_start,
      | CAST(COUNT(*) AS BIGINT) AS turns,
      | CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS tokens,
      | CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT) AS tool_turns
      |FROM sid GROUP BY conv_id, sess""".stripMargin

  // -------------------------------------- benchmark decontamination
  /** Train-set decontamination ([[Dedup.benchmarkOverlap]]): docs 0-49
    * act as the "benchmark/eval" corpus; the training corpus is every
    * document plus drop-2-word paraphrases of the benchmark slice
    * (id+100000 — contaminated near-copies that exact dedup would NOT
    * catch). Per-doc distinct-shingle overlap with the benchmark gram
    * set is computed via the broadcast-join shape (corpus never
    * shuffled) and thresholded; DuckDB replays with list_intersect
    * against the aggregated benchmark gram list. */
  def q53Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val bench = base.filter(col("doc_id") < 50)
    val toks = split(col("text"), " ", -1)
    val paraphrased = bench.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1))))
        .as("text"))
    val corpus = base.unionByName(paraphrased)
    val overlap = Dedup.benchmarkOverlap(corpus, bench, "text", "doc_id")
    // the FILTER form runs too (left_anti over the same overlap stat),
    // so both public decontamination entry points are driver-gated:
    // kept must equal NOT contaminated row-for-row
    val keptIds = Dedup.decontaminate(corpus, bench, "text", "doc_id",
        maxOverlap = 15L)
      .select(col("doc_id"), lit(1L).as("_kept"))
    corpus.join(overlap, Seq("doc_id"), "left")
      .join(keptIds, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("overlap_grams"), lit(0L)).as("overlap_grams"),
        (coalesce(col("overlap_grams"), lit(0L)) > 15L).cast("long")
          .as("contaminated"),
        coalesce(col("_kept"), lit(0L)).as("kept"))
  }

  val q53Sql: String = {
    val norm = "LOWER(REGEXP_REPLACE(TRIM(text),'\\s+',' ','g'))"
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       | para AS (
       |  SELECT doc_id + 100000 AS doc_id,
       |   array_to_string(string_split(text, ' ')[1:GREATEST(LEN(string_split(text,' '))-2, 1)], ' ') AS text
       |  FROM base WHERE doc_id < 50),
       | corpus AS (SELECT * FROM base UNION ALL SELECT * FROM para),
       | sh AS (
       |  SELECT doc_id,
       |   CASE WHEN LEN(string_split($norm, ' ')) < 3
       |        THEN [$norm]
       |        ELSE list_distinct(list_transform(
       |          range(0, LEN(string_split($norm, ' ')) - 2),
       |          i -> array_to_string(string_split($norm, ' ')[i+1:i+3], ' ')))
       |   END AS grams
       |  FROM corpus),
       | bg AS (
       |  SELECT LIST(DISTINCT g) AS bl FROM (
       |   SELECT UNNEST(grams) AS g FROM sh WHERE doc_id < 50)),
       | ov AS (
       |  -- cross join the one-row gram list in (a scalar subquery inside
       |  -- list_intersect trips DuckDB's lambda rewrite)
       |  SELECT sh.doc_id,
       |   CAST(LEN(list_intersect(sh.grams, bg.bl)) AS BIGINT)
       |     AS overlap_grams
       |  FROM sh, bg)
       |SELECT doc_id, overlap_grams,
       | CAST(overlap_grams > 15 AS BIGINT) AS contaminated,
       | CAST(overlap_grams <= 15 AS BIGINT) AS kept
       |FROM ov""".stripMargin
  }

  // ------------------------------- spec-registered streaming source
  /** Streaming source registered through the SPEC surface and executed
    * (closing r4 Missing #2): a bounded transcript-shaped slice of
    * `events` is laid out as a 5-file parquet directory, declared as a
    * `file_stream` data source via `applyConfig` (the same EP1 path that
    * registers kafka sources), compiled by [[graft.engine.FeatureEngine
    * .readStreamDF]] with `max_files_per_trigger=2` — so the stream runs
    * THREE micro-batches over the registered source, exercising
    * cross-batch session merging downstream — and aggregated by
    * [[graft.streaming.StreamingFeatures.sessionAggregates]]. A
    * `field_mapping` rename (props→text) rides the spec to prove the
    * mapping applies on the streaming path too.
    *
    * Files are laid out in EVENT-TIME order (range-partitioned on ts,
    * mtimes ticked in order) — the shape of a real lake ingest, where
    * files land roughly as time advances. This matters for determinism:
    * the session operator drops input rows below the propagated
    * watermark from the third micro-batch on EVEN in complete output
    * mode (pinned by SessionWatermarkBehaviorSpec), so out-of-order
    * file arrival would silently lose data — in-order arrival never
    * produces a late row and the result is the exact batch replay.
    * Oracle = q52's session replay over this disjoint user slice. */
  def q54FileStreamSource(s: SparkSession, dir: String): DataFrame = {
    val src = scratch("q54_stream_src", dir)
    t(s, dir, "events")
      .filter(col("user_id") >= 10 && col("user_id") < 20)
      .select(col("user_id").cast("string").as("conv_id"), col("ts"),
        col("props"),
        when(col("event_type") === "click", "browser").otherwise("").as("tool"))
      .repartitionByRange(5, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(src)
    // deterministic arrival order: tick mtimes in part-file (= ts range)
    // order so the file source's (mtime, path) ordering equals event time
    locally {
      val parts = new java.io.File(src).listFiles()
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
      var tick = 1700000000000L
      parts.foreach { f => tick += 2000L; f.setLastModified(tick): Unit }
    }
    val engine = new graft.engine.FeatureEngine(s)
    engine.applyConfig(Map(
      "data_sources" -> Map(
        "event_stream" -> Map(
          "type" -> "file_stream",
          "path" -> src,
          "timestamp_field" -> "ts",
          "max_files_per_trigger" -> "2",
          "field_mapping" -> Map("props" -> "text")))))
    val out = graft.streaming.StreamingFeatures.sessionAggregates(
      engine.readStream("event_stream"), gapSeconds = 1800L)
    val table = s"q54_fs_${ProcessHandle.current().pid()}"
    withStreamShuffle(s) {
      val q = out.writeStream.format("memory").queryName(table)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(table).select(
      col("conv_id"), col("session_start"), col("turns"),
      col("tokens"), col("tool_turns"))
  }

  val q54Sql: String =
    """WITH tr AS (
      | SELECT CAST(user_id AS VARCHAR) AS conv_id, ts, props AS text,
      |  CASE WHEN event_type = 'click' THEN 'browser' ELSE '' END AS tool
      | FROM events WHERE user_id >= 10 AND user_id < 20),
      | g AS (
      | SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
      |        OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
      |       THEN 1 ELSE 0 END AS is_new
      | FROM tr WINDOW w AS (PARTITION BY conv_id ORDER BY ts)),
      | sid AS (
      | SELECT *, SUM(is_new) OVER (PARTITION BY conv_id ORDER BY ts
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      | FROM g)
      |SELECT conv_id, MIN(ts) AS session_start,
      | CAST(COUNT(*) AS BIGINT) AS turns,
      | CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS tokens,
      | CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT) AS tool_turns
      |FROM sid GROUP BY conv_id, sess""".stripMargin

  // ------------------------------------ paragraph-level dedup (q55)
  /** Corpus-wide repeated-paragraph stats + rewrite
    * ([[Dedup.paragraphStats]] / [[Dedup.dedupParagraphs]], the Lee et
    * al. 2022 paragraph-dedup family) driver-gated on a derived lined
    * corpus: every doc contributes three 8-token lines of its own text
    * (organically repeated wherever the raw texts repeat), every 4th doc
    * a GLOBAL boilerplate line, every 5th doc one of 25 SHARED segment
    * lines (~4 docs each at sf0.01). DuckDB replays the construction,
    * the corpus-wide paragraph histogram, the per-doc fractions, the
    * keep gate, and the first-occurrence-wins rebuilt text exactly. */
  def q55ParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ", -1)
    def seg(from: Int) = concat_ws(" ", slice(toks, lit(from), lit(8)))
    val boiler = lit("subscribe to our newsletter for daily updates")
    // doc_id/5 (exact: the line only attaches when doc_id % 5 == 0)
    // mod 25 gives 25 distinct shared-segment classes; pmod(doc_id, 25)
    // restricted to multiples of 5 would give only {0,5,10,15,20} — 5
    // classes, 5x more concentrated than the plant documents (r5 review)
    val shared = concat(lit("shared segment number "),
      pmod((col("doc_id") / 5).cast("long"), lit(25)).cast("string"))
    val etext = concat(
      seg(1),
      when(pmod(col("doc_id"), lit(4)) === 0, concat(lit("\n"), boiler))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0, concat(lit("\n"), shared))
        .otherwise(lit("")),
      lit("\n"), seg(9), lit("\n"), seg(17))
    val corpus = Dedup.spread(t(s, dir, "documents")).withColumn("etext", etext)
    val stats = Dedup.paragraphStats(corpus, "etext", "doc_id")
    val clean = Dedup.dedupParagraphs(corpus, "etext", "doc_id")
      .withColumnRenamed("etext", "clean_text")
    corpus.select(col("doc_id"))
      .join(stats, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("dup_paras"), lit(0L)).as("dup_paras"),
        round(coalesce(col("dup_para_frac"), lit(0.0)), 6).as("dup_para_frac"),
        (coalesce(col("dup_para_frac"), lit(0.0)) <= 0.5).cast("long").as("keep"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  val q55Sql: String =
    """WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      | parts AS (SELECT doc_id,
      |  COALESCE(array_to_string(toks[1:8], ' '), '') AS l1,
      |  COALESCE(array_to_string(toks[9:16], ' '), '') AS l2,
      |  COALESCE(array_to_string(toks[17:24], ' '), '') AS l3
      | FROM b),
      | e AS (SELECT doc_id,
      |  l1
      |  || CASE WHEN doc_id % 4 = 0
      |       THEN chr(10) || 'subscribe to our newsletter for daily updates'
      |       ELSE '' END
      |  || CASE WHEN doc_id % 5 = 0
      |       THEN chr(10) || 'shared segment number ' || CAST((doc_id // 5) % 25 AS VARCHAR)
      |       ELSE '' END
      |  || chr(10) || l2 || chr(10) || l3 AS etext
      | FROM parts),
      | p0 AS (SELECT doc_id,
      |  UNNEST(string_split(etext, chr(10))) AS raw,
      |  UNNEST(range(1, LEN(string_split(etext, chr(10))) + 1)) AS pos
      | FROM e),
      | p AS (SELECT doc_id, pos, raw,
      |  LOWER(REGEXP_REPLACE(TRIM(raw), '\s+', ' ', 'g')) AS norm
      | FROM p0
      | WHERE LOWER(REGEXP_REPLACE(TRIM(raw), '\s+', ' ', 'g')) <> ''),
      | c AS (SELECT *, COUNT(*) OVER (PARTITION BY norm) AS cnt,
      |  ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id, pos) AS rn
      | FROM p),
      | stats AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
      |  CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_paras
      | FROM c GROUP BY doc_id),
      | clean AS (SELECT doc_id, string_agg(raw, chr(10) ORDER BY pos) AS clean_text
      | FROM c WHERE rn = 1 GROUP BY doc_id)
      |SELECT e.doc_id,
      | COALESCE(stats.n_paras, 0) AS n_paras,
      | COALESCE(stats.dup_paras, 0) AS dup_paras,
      | ROUND(COALESCE(CAST(stats.dup_paras AS DOUBLE) / stats.n_paras, 0), 6)
      |   AS dup_para_frac,
      | CAST(COALESCE(CAST(stats.dup_paras AS DOUBLE) / stats.n_paras, 0) <= 0.5
      |   AS BIGINT) AS keep,
      | COALESCE(clean.clean_text, '') AS clean_text
      |FROM e
      |LEFT JOIN stats ON e.doc_id = stats.doc_id
      |LEFT JOIN clean ON e.doc_id = clean.doc_id""".stripMargin

  // --------------------------------------- approx aggregates (q56)
  /** Bounded-state approximate aggregates
    * ([[graft.features.ApproxAggregates.eventTypeStats]], approx mode)
    * driver-gated against the EXACT DuckDB aggregates. Legitimacy of an
    * exact oracle for approximate operators: the input is planted at a
    * cardinality where the approximation is provably/verifiably exact —
    * ≤40 distinct users per group against 2^16 HLL registers (no
    * register collision at sf0.01, checked live; linear counting then
    * returns n exactly) and ~500-row groups against a 100k-accuracy GK
    * summary (every sample retained → exact order statistics). Both
    * engines are deterministic and the gate data is fixed, so the
    * equality is conclusive, not lucky (same doctrine as the q22/q24
    * LSH gates). The at-scale error-bound contract is spec'd separately
    * (ApproxAggregatesSpec). */
  def q56ApproxAggs(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").filter(col("user_id") < 40)
    graft.features.ApproxAggregates.eventTypeStats(ev, approx = true)
      .select(col("event_type"), col("n_events"), col("distinct_users"),
        round(col("p50_value"), 6).as("p50_value"),
        round(col("p90_value"), 6).as("p90_value"))
  }

  val q56Sql: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
      | ROUND(quantile_disc(value, 0.5), 6) AS p50_value,
      | ROUND(quantile_disc(value, 0.9), 6) AS p90_value
      |FROM events WHERE user_id < 40
      |GROUP BY event_type""".stripMargin

  // ------------------------------------ mixture sampling (q57)
  /** Deterministic stratified mixture sampling
    * ([[graft.pipeline.MixtureSampler.sample]]): per-language keep
    * rates decided by a 60-bit md5 hash of doc_id, exactly replayable
    * in DuckDB — the oracle recomputes the SAME hash and the SAME
    * integer thresholds (embedded as literals computed by the same
    * Scala code), so the gate matches the sample row-for-row, not just
    * in expectation. Scan-local predicate: no shuffle, no RNG state. */
  private val q57Rates = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 1.0)
  private val q57Default = 0.1

  def q57MixtureSample(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.MixtureSampler.sample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", q57Rates, defaultRate = q57Default)
      .select(col("doc_id"), col("lang"),
        round(col("sample_weight"), 6).as("sample_weight"))

  val q57Sql: String = {
    import graft.pipeline.MixtureSampler.threshold
    val thrCase = q57Rates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN '$l' THEN CAST(${threshold(r)} AS BIGINT)" }
      .mkString(" ")
    val rateCase = q57Rates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN '$l' THEN CAST($r AS DOUBLE)" }
      .mkString(" ")
    s"""WITH d AS (
       | SELECT doc_id, lang,
       |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft-mix'), 1, 15)
       |       AS BIGINT) AS h,
       |  CASE lang $thrCase ELSE CAST(${threshold(q57Default)} AS BIGINT) END AS thr,
       |  CASE lang $rateCase ELSE CAST($q57Default AS DOUBLE) END AS rate
       | FROM documents)
       |SELECT doc_id, lang, ROUND(1.0 / rate, 6) AS sample_weight
       |FROM d WHERE h < thr""".stripMargin
  }

  // --------------------------- dataset splits / quotas / thresholds
  /** Deterministic train/val/test assignment
    * ([[graft.pipeline.MixtureSampler.assignSplit]]): hash-threshold
    * CASE over cumulative integer thresholds, different salt than the
    * mixture sampler so membership is independent of sampling survival.
    * DuckDB replays the identical hash + thresholds row-for-row. */
  private val q58Splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  def q58SplitAssign(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.MixtureSampler.assignSplit(
      t(s, dir, "documents").select(col("doc_id"), col("lang")),
      "doc_id", q58Splits)

  val q58Sql: String = {
    val thr = graft.pipeline.MixtureSampler.splitThresholds(q58Splits)
    val whens = thr.init
      .map { case (n, t) => s"WHEN h < CAST($t AS BIGINT) THEN '$n'" }
      .mkString(" ")
    s"""WITH d AS (
       | SELECT doc_id, lang,
       |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft-split'), 1, 15)
       |       AS BIGINT) AS h
       | FROM documents)
       |SELECT doc_id, lang,
       | CASE $whens ELSE '${thr.last._1}' END AS split
       |FROM d""".stripMargin
  }

  /** Per-source quota cap ([[graft.pipeline.MixtureSampler.capPerStratum]]):
    * keep ≤10 of each source's 25 docs (the cap BINDS on every stratum at gate scale), ranked by the content-independent hash
    * (doc_id tie-break) — a uniform deterministic sample of each
    * stratum, replayed in DuckDB by the identical correlated
    * ROW_NUMBER. */
  def q59QuotaCap(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.MixtureSampler.capPerStratum(
      t(s, dir, "documents").select(col("doc_id"), col("source")),
      "source", "doc_id", maxPerStratum = 10)

  val q59Sql: String =
    """SELECT doc_id, source FROM (
      | SELECT doc_id, source,
      |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY
      |   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft-cap'), 1, 15)
      |        AS BIGINT), doc_id) AS rk
      | FROM documents)
      |WHERE rk <= 10""".stripMargin

  /** Corpus-relative quantile filtering
    * ([[graft.features.ApproxAggregates.quantileThresholdFilter]]):
    * keep documents at/above the corpus p75 of n_chars. At gate scale
    * (n ≤ GK accuracy) the threshold is an exact order statistic, so
    * DuckDB's quantile_disc replays it exactly — same doctrine as q56. */
  def q60QuantileFilter(s: SparkSession, dir: String): DataFrame =
    graft.features.ApproxAggregates.quantileThresholdFilter(
      t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
      "n_chars", q = 0.75)

  val q60Sql: String =
    """SELECT doc_id, n_chars,
      | (SELECT CAST(quantile_disc(n_chars, 0.75) AS DOUBLE) FROM documents)
      |   AS threshold
      |FROM documents
      |WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.75) FROM documents)""".stripMargin

  // ------------------------- DSIR importance weighting (q61)
  /** DSIR-style hashed-n-gram importance weights
    * ([[graft.pipeline.ImportanceWeights.dsirWeights]]): target = the
    * corpus's English slice, source = the whole corpus. Scores are
    * exact integer sums of driver-quantized log ratios, and both the
    * bucket hash (md5/u60, same construction as q57/q58/q59) and the
    * quantization (floor(x·1e6 + ½), Java Math.round) are replayed
    * verbatim by DuckDB — the gate is bit-exact, not approximate. The
    * transcendental step (LN) is computed by both engines on identical
    * IEEE inputs and lands on the same doubles on the fixed gate data
    * (verified live; quantization then absorbs sub-micro differences
    * except on knife-edge half-integers, which the fixed corpus does
    * not contain). */
  def q61ImportanceWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.spread(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("text"))
    // fused-histogram path (one corpus pass for both distributions);
    // counts — and therefore scores — are identical to
    // dsirWeights(docs, docs.filter(lang = 'en'), _)
    graft.pipeline.ImportanceWeights.dsirWeightsWithin(
        docs, col("lang") === "en", "text")
      .select(col("doc_id"), col("n_grams"), col("log_w_micro"))
  }

  val q61Sql: String =
    """WITH tok AS (
      | SELECT doc_id, lang,
      |  LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'), x -> x <> '') AS toks
      | FROM documents),
      |grams AS (
      | SELECT doc_id, lang,
      |  list_concat(toks,
      |   list_transform(range(1, GREATEST(LEN(toks), 1)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS gs
      | FROM tok),
      |g AS (SELECT doc_id, lang, UNNEST(gs) AS gram FROM grams),
      |b AS (SELECT doc_id, lang,
      |  CAST(CAST('0x' || substr(md5(gram || ':graft-dsir'), 1, 15) AS BIGINT) % 256 AS INT) AS bucket
      | FROM g),
      |src AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
      |tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT
      |  (SELECT SUM(cnt) FROM tgt) + 0.5 * 256 AS t_tot,
      |  (SELECT SUM(cnt) FROM src) + 0.5 * 256 AS s_tot),
      |lr AS (SELECT s.bucket,
      |  CAST(FLOOR((LN((COALESCE(t.cnt, 0) + 0.5) / tot.t_tot)
      |            - LN((s.cnt + 0.5) / tot.s_tot)) * 1000000 + 0.5) AS BIGINT) AS lrq
      | FROM src s LEFT JOIN tgt t USING (bucket), tot),
      |sc AS (SELECT b.doc_id, CAST(SUM(lr.lrq) AS BIGINT) AS log_w_micro
      | FROM b JOIN lr USING (bucket) GROUP BY 1),
      |ng AS (SELECT doc_id, CAST(LEN(gs) AS BIGINT) AS n_grams FROM grams)
      |SELECT ng.doc_id, ng.n_grams, COALESCE(sc.log_w_micro, 0) AS log_w_micro
      |FROM ng LEFT JOIN sc ON ng.doc_id = sc.doc_id""".stripMargin

  // ------------------- context-window packing plan (q62)
  /** Deterministic packing plan ([[graft.pipeline.Packing.pack]]):
    * hash-ordered global document sequence, distributed prefix sum of
    * token counts, and the 512-token context windows each document
    * occupies. All-integer arithmetic; DuckDB replays the global
    * running sum with a single ORDER BY window (its scale ceiling is
    * exactly why the engine shards the prefix sum — PlanSpec asserts
    * the Spark window is hash-partitioned, never SinglePartition). */
  def q62PackBins(s: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.spread(t(s, dir, "documents")).select(col("doc_id"),
      graft.functions.WhitespaceTokenCount(col("text")).cast("long").as("n_tokens"))
    graft.pipeline.Packing.pack(docs, "doc_id", "n_tokens",
        capacity = 512L, nShards = 8)
      .select(col("doc_id"), col("n_tokens"), col("seq"), col("cum_tokens"),
        col("bin_first"), col("bin_last"))
  }

  val q62Sql: String =
    """WITH d AS (
      | SELECT doc_id,
      |  CASE WHEN TRIM(text) = '' THEN 0
      |       ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END AS n_tokens,
      |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft-pack'), 1, 15)
      |       AS BIGINT) AS h
      | FROM documents),
      |o AS (
      | SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS seq,
      |  CAST(SUM(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
      |       AS BIGINT) AS cum_tokens
      | FROM d WHERE n_tokens > 0)
      |SELECT doc_id, n_tokens, seq, cum_tokens,
      | (cum_tokens - n_tokens) // 512 AS bin_first,
      | (cum_tokens - 1) // 512 AS bin_last
      |FROM o""".stripMargin

  // ------------------- DSIR Gumbel top-k resampling (q63)
  /** The DSIR selection step ([[graft.pipeline.ImportanceWeights
    * .resampleTopK]]): the 100 documents with the largest
    * `log_w_micro + gumbel_micro`, where the Gumbel draw is the
    * integer-quantized `-ln(-ln(u))` of the doc's content-independent
    * u60 hash — same determinism doctrine as q61 (all-integer final
    * scores, doc_id tie-break), so the selected set is exact. The
    * oracle nests the q61 oracle as a subquery and replays the draw. */
  def q63ImportanceResample(s: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.spread(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("text"))
    val scored = graft.pipeline.ImportanceWeights.dsirWeightsWithin(
      docs, col("lang") === "en", "text")
    graft.pipeline.ImportanceWeights.resampleTopK(scored, "doc_id", k = 100)
      .select(col("doc_id"), col("log_w_micro"), col("gumbel_micro"),
        col("score_micro"))
  }

  val q63Sql: String =
    s"""SELECT doc_id, log_w_micro, gumbel_micro,
      | log_w_micro + gumbel_micro AS score_micro
      |FROM (
      | SELECT doc_id, log_w_micro,
      |  CAST(FLOOR(-LN(-LN((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
      |       || ':graft-dsir-gumbel'), 1, 15) AS BIGINT) + 0.5)
      |       / 1152921504606846976)) * 1000000 + 0.5) AS BIGINT) AS gumbel_micro
      | FROM ( ${q61Sql.replace("\n", "\n  ")} ) w
      |) g
      |ORDER BY score_micro DESC, doc_id
      |LIMIT 100""".stripMargin

  // ------------------- incremental dedup store (q64/q65)
  /** Exact stage of the persisted incremental-dedup store
    * ([[graft.dedup.DedupStore]]): the store holds the even-id half of
    * the corpus; the odd-id half arrives as the increment. Survivors =
    * odd docs that exactly match no store doc and are first (min id)
    * among increment copies of the same normalized text — the daily-
    * crawl-vs-historical shape with the store side probed as a bucketed
    * scan (zero store-side shuffle, DedupStoreSpec plan gate). */
  def q64StoreNewDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val store = graft.dedup.DedupStore.build(
      docs.filter(col("doc_id") % 2 === 0), "text", "doc_id",
      scratch("q64_store", dir),
      graft.dedup.DedupStore.Params(nearDup = false)) // exact-only store
    graft.dedup.DedupStore.newDocs(
        store, docs.filter(col("doc_id") % 2 === 1), "text", "doc_id")
      .select(col("doc_id"), col("fingerprint"))
  }

  val q64Sql: String =
    """WITH fp AS (
      |  SELECT doc_id,
      |   md5(LOWER(REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g'))) AS f
      |  FROM documents),
      | inc AS (SELECT doc_id, f FROM fp WHERE doc_id % 2 = 1),
      | first AS (SELECT f, MIN(doc_id) AS keep FROM inc GROUP BY f)
      |SELECT i.doc_id, i.f AS fingerprint
      |FROM inc i JOIN first k ON i.f = k.f AND i.doc_id = k.keep
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM fp s WHERE s.doc_id % 2 = 0 AND s.f = i.f)""".stripMargin

  /** Near-dup stage of the incremental store: exact copies of the first
    * 200 docs arrive as the increment and must each collide with their
    * store original in every LSH band and agree on every signature row
    * (sig_agreement exactly 1.0 — deterministic for identical text, the
    * q22/q48 planted-copy doctrine). Output restricted to the planted
    * relation so DuckDB computes the expected set exactly; mutated-copy
    * recall is DedupSpec/DedupStoreSpec territory. */
  def q65StoreNearDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val store = graft.dedup.DedupStore.build(
      docs, "text", "doc_id", scratch("q65_store", dir))
    val inc = docs.filter(col("doc_id") < 200)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    graft.dedup.DedupStore.nearDups(store, inc, "text", "doc_id",
        threshold = 0.9)
      .filter(col("store_id") === col("inc_id") - 100000L)
      .select(col("inc_id"), col("store_id"),
        round(col("sig_agreement"), 6).as("sig_agreement"))
  }

  val q65Sql: String =
    """SELECT doc_id + 100000 AS inc_id, doc_id AS store_id,
      | 1.0 AS sig_agreement
      |FROM documents WHERE doc_id < 200""".stripMargin

  /** Streaming ingestion against the persisted store
    * ([[graft.dedup.DedupStore.ingest]]): the store seeds with 100
    * namespaced-token docs, then two forced micro-batches arrive —
    * batch 1 carries 50 copies of store docs + 50 fresh, batch 2
    * carries 50 copies of BATCH 1's fresh survivors + 50 fresh. The
    * sink must hold exactly the 100 fresh docs: batch-2 copies dying
    * proves the store append IS the cross-batch state (q49 doctrine:
    * batch boundaries forced so the gate tests committed state, not
    * intra-batch order; all texts are disjoint token namespaces DuckDB
    * reconstructs by arithmetic). */
  def q66StoreIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def tx(src: Long): String =
      (1 to 30).map(j => s"v${src * 100 + j}").mkString(" ")
    val storeDocs = (0L until 100L).map(i => (i, tx(i)))
    val store = graft.dedup.DedupStore.build(
      storeDocs.toDF("doc_id", "text"), "text", "doc_id",
      scratch("q66_store", dir),
      graft.dedup.DedupStore.Params(nearDup = false)) // exact-gated ingest
    val batch1 = (0L until 100L).map(i =>
      (1000L + i, tx(if (i < 50) i else 100L + i)))
    val batch2 = (0L until 100L).map(i =>
      (2000L + i, tx(if (i < 50) 150L + i else 300L + i)))

    val sink = scratch("q66_sink", dir)
    val ckpt = scratch("q66_ckpt", dir)
    Seq(sink, ckpt).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
    }
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](s)
    withStreamShuffle(s) {
      val q = graft.dedup.DedupStore.ingest(
        store, input.toDF().toDF("doc_id", "text"), "text", "doc_id",
        sink, ckpt)
      try {
        input.addData(batch1)
        q.processAllAvailable() // commit batch 1 before its copies arrive
        input.addData(batch2)
        q.processAllAvailable()
      } finally q.stop()
    }
    s.read.parquet(sink).select(col("doc_id"), col("text"))
  }

  val q66Sql: String =
    """WITH d AS (SELECT doc_id AS i FROM documents WHERE doc_id < 50),
      | src AS (
      |  SELECT 1050 + i AS doc_id, 150 + i AS s FROM d
      |  UNION ALL
      |  SELECT 2050 + i AS doc_id, 350 + i AS s FROM d)
      |SELECT doc_id,
      | array_to_string(list_transform(range(1, 31),
      |   j -> 'v' || CAST(s * 100 + j AS VARCHAR)), ' ') AS text
      |FROM src""".stripMargin

  /** The DSIR selection family's corpus-fraction path
    * ([[graft.pipeline.ImportanceWeights.resampleByQuantile]]): keep
    * docs whose Gumbel-perturbed score clears the corpus p80 of
    * `score_micro`. At gate scale (n ≤ GK accuracy) the threshold is an
    * exact order statistic (q60/q56 doctrine), and the scores are the
    * same all-integer construction q63 gates — so DuckDB replays the
    * whole selection: q61 weights + the quantized Gumbel draw +
    * quantile_disc + the strict > filter. */
  def q67ImportanceThreshold(s: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.spread(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("text"))
    val scored = graft.pipeline.ImportanceWeights.dsirWeightsWithin(
      docs, col("lang") === "en", "text")
    graft.pipeline.ImportanceWeights.resampleByQuantile(
        scored, "doc_id", fraction = 0.2)
      .select(col("doc_id"), col("log_w_micro"), col("gumbel_micro"),
        col("score_micro"))
  }

  val q67Sql: String =
    s"""WITH g AS (
      | SELECT doc_id, log_w_micro, gumbel_micro,
      |  log_w_micro + gumbel_micro AS score_micro
      | FROM (
      |  SELECT doc_id, log_w_micro,
      |   CAST(FLOOR(-LN(-LN((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
      |        || ':graft-dsir-gumbel'), 1, 15) AS BIGINT) + 0.5)
      |        / 1152921504606846976)) * 1000000 + 0.5) AS BIGINT) AS gumbel_micro
      |  FROM ( ${q61Sql.replace("\n", "\n  ")} ) w
      | ) x)
      |SELECT doc_id, log_w_micro, gumbel_micro, score_micro
      |FROM g
      |WHERE score_micro > (SELECT quantile_disc(score_micro, 0.8) FROM g)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_first_last" -> (q16FirstLast _),
    "q17_date_functions" -> (q17DateFunctions _),
    "q18_text_quality" -> (q18TextQuality _),
    "q19_langid" -> (q19LangId _),
    "q20_fingerprint_dedup" -> (q20FingerprintDedup _),
    "q21_neardup_jaccard" -> (q21NeardupJaccard _),
    "q22_minhash_candidates" -> (q22MinhashCandidates _),
    "q23_knn_brute" -> (q23KnnBrute _),
    "q24_knn_ivf" -> (q24KnnIvf _),
    "q25_simhash" -> (q25Simhash _),
    "q26_percentile" -> (q26Percentile _),
    "q27_scalar_funcs" -> (q27ScalarFuncs _),
    "q28_cross_grid" -> (q28CrossGrid _),
    "q29_union_all" -> (q29UnionAll _),
    "q30_struct_agg" -> (q30StructAgg _),
    "q31_transcript_features" -> (q31TranscriptFeatures _),
    "q32_embed_neardup" -> (q32EmbedNeardup _),
    "q33_quality_score" -> (q33QualityScore _),
    "q34_winnow_fingerprint" -> (q34WinnowFingerprint _),
    "q35_pipeline_clean" -> (q35PipelineClean _),
    "q36_subword_count" -> (q36SubwordCount _),
    "q37_connected_components" -> (q37ConnectedComponents _),
    "q38_media_meta" -> (q38MediaMeta _),
    "q39_rollup" -> (q39Rollup _),
    "q40_set_ops" -> (q40SetOps _),
    "q41_semi_anti" -> (q41SemiAnti _),
    "q42_langid_ngram" -> (q42LangIdNgram _),
    "q43_salted_agg" -> (q43SaltedAgg _),
    "q44_materialize_range" -> (q44MaterializeRange _),
    "q45_yaml_retrieve" -> (q45YamlRetrieve _),
    "q46_neardup_clusters" -> (q46NeardupClusters _),
    "q47_multiview_service" -> (q47MultiViewService _),
    "q48_ivf_index_query" -> (q48IvfIndexQuery _),
    "q49_streaming_neardup" -> (q49StreamingNeardup _),
    "q50_pii_redact" -> (q50PiiRedact _),
    "q51_repetition" -> (q51Repetition _),
    "q52_streaming_sessions" -> (q52StreamingSessions _),
    "q53_decontaminate" -> (q53Decontaminate _),
    "q54_file_stream_source" -> (q54FileStreamSource _),
    "q55_paragraph_dedup" -> (q55ParagraphDedup _),
    "q56_approx_aggs" -> (q56ApproxAggs _),
    "q57_mixture_sample" -> (q57MixtureSample _),
    "q58_split_assign" -> (q58SplitAssign _),
    "q59_quota_cap" -> (q59QuotaCap _),
    "q60_quantile_filter" -> (q60QuantileFilter _),
    "q61_importance_weights" -> (q61ImportanceWeights _),
    "q62_pack_bins" -> (q62PackBins _),
    "q63_importance_resample" -> (q63ImportanceResample _),
    "q64_store_newdocs" -> (q64StoreNewDocs _),
    "q65_store_neardups" -> (q65StoreNearDups _),
    "q66_store_ingest" -> (q66StoreIngest _),
    "q67_importance_threshold" -> (q67ImportanceThreshold _))

  val oracles: Map[String, String] = Map(
    "q16_first_last" -> q16Sql,
    "q17_date_functions" -> q17Sql,
    "q18_text_quality" -> q18Sql,
    "q19_langid" -> q19Sql,
    "q20_fingerprint_dedup" -> q20Sql,
    "q21_neardup_jaccard" -> q21Sql,
    "q22_minhash_candidates" -> q22Sql,
    "q23_knn_brute" -> q23Sql,
    "q24_knn_ivf" -> q24Sql,
    "q25_simhash" -> q25Sql,
    "q32_embed_neardup" -> q32Sql,
    "q26_percentile" -> q26Sql,
    "q27_scalar_funcs" -> q27Sql,
    "q28_cross_grid" -> q28Sql,
    "q29_union_all" -> q29Sql,
    "q30_struct_agg" -> q30Sql,
    "q31_transcript_features" -> q31Sql,
    "q33_quality_score" -> q33Sql,
    "q34_winnow_fingerprint" -> q34Sql,
    "q35_pipeline_clean" -> q35Sql,
    "q36_subword_count" -> q36Sql,
    "q37_connected_components" -> q37Sql,
    "q38_media_meta" -> q38Sql,
    "q39_rollup" -> q39Sql,
    "q40_set_ops" -> q40Sql,
    "q41_semi_anti" -> q41Sql,
    "q42_langid_ngram" -> q42Sql,
    "q43_salted_agg" -> q43Sql,
    "q44_materialize_range" -> q44Sql,
    "q45_yaml_retrieve" -> q45Sql,
    "q46_neardup_clusters" -> q46Sql,
    "q47_multiview_service" -> q47Sql,
    "q48_ivf_index_query" -> q48Sql,
    "q49_streaming_neardup" -> q49Sql,
    "q50_pii_redact" -> q50Sql,
    "q51_repetition" -> q51Sql,
    "q52_streaming_sessions" -> q52Sql,
    "q53_decontaminate" -> q53Sql,
    "q54_file_stream_source" -> q54Sql,
    "q55_paragraph_dedup" -> q55Sql,
    "q56_approx_aggs" -> q56Sql,
    "q57_mixture_sample" -> q57Sql,
    "q58_split_assign" -> q58Sql,
    "q59_quota_cap" -> q59Sql,
    "q60_quantile_filter" -> q60Sql,
    "q61_importance_weights" -> q61Sql,
    "q62_pack_bins" -> q62Sql,
    "q63_importance_resample" -> q63Sql,
    "q64_store_newdocs" -> q64Sql,
    "q65_store_neardups" -> q65Sql,
    "q66_store_ingest" -> q66Sql,
    "q67_importance_threshold" -> q67Sql)
}

package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.asof.AsOfJoin
import graft.registry.FeatureRegistry
import graft.spec._

/** The engine: spec → compiled Catalyst plans → point-in-time retrieval.
  *
  * Lifecycle mirrors the reference's three entry points (SURVEY.md §3):
  *  - EP1 `applyConfig` — entities + data sources from an engine config
  *    (reference: SousChef.__init__/_init_data_sources, sous_chef.py:
  *    47-160), minus Feast: specs land in [[FeatureRegistry]].
  *  - EP2 `createFromYaml` — YAML spec → validation → FeatureView/Service
  *    specs (reference: create_from_yaml, sous_chef.py:167-260) with the
  *    same error-message contract.
  *  - EP3 `retrieve` — probe rows × feature service → one backward as-of
  *    join per member view, column-union of outputs (reference:
  *    get_historical_features, customer_metrics.py:127-130). All Spark;
  *    the TTL bound comes from each view's `ttl_days`.
  */
class FeatureEngine(
    val spark: SparkSession,
    val registry: FeatureRegistry = new FeatureRegistry,
    val metadataRules: MetadataRules = ConfigValidator.DefaultRules) {

  /** Internal column carrying a source's created_timestamp_column. */
  private val CreatedTsCol = "_created_ts"

  // ------------------------------------------------------------- EP1
  /** Register entities + data sources from an engine config map
    * (YAML shape: tests/fixtures/config/feast_config.yaml). */
  def applyConfig(config: Map[String, Any]): Unit = {
    config.get("entities").foreach {
      case es: Seq[_] =>
        es.foreach { case e: Map[_, _] =>
          val m = e.asInstanceOf[Map[String, Any]]
          registry.applyEntity(EntitySpec(
            name = String.valueOf(m("name")),
            joinKey = String.valueOf(m("join_key")),
            description = m.get("description").map(String.valueOf(_)).getOrElse("")))
        }
      case _ =>
    }
    config.get("data_sources").foreach {
      case ds: Map[_, _] =>
        ds.asInstanceOf[Map[String, Any]].foreach { case (name, cfg: Map[_, _]) =>
          val m = cfg.asInstanceOf[Map[String, Any]]
          val sourceType = m.get("type").map(String.valueOf(_)).getOrElse("file").toLowerCase
          if (!SourceSpec.SupportedTypes.contains(sourceType))
            throw new IllegalArgumentException(
              s"Source type '$sourceType' is not supported. " +
                s"Available types: ${SourceSpec.SupportedTypes.mkString("['", "', '", "']")}")
          // field_mapping is a nested map (source column → exposed name),
          // not a scalar param (reference: sous_chef.py:41-42)
          val fieldMapping = m.get("field_mapping") match {
            case Some(fm: Map[_, _]) => fm.asInstanceOf[Map[Any, Any]]
              .map { case (k, v) => String.valueOf(k) -> String.valueOf(v) }
            case _ => Map.empty[String, String]
          }
          val allowsMapping =
            SourceSpec.SourceParams.get(sourceType).exists(_.contains("field_mapping"))
          val params = SourceSpec.filterParams(
            sourceType,
            (m - "type" - "field_mapping").map { case (k, v) => k -> String.valueOf(v) })
          registry.applySource(SourceSpec(name, sourceType, params,
            if (allowsMapping) fieldMapping else Map.empty))
        }
      case _ =>
    }
  }

  // ------------------------------------------------------------- EP2
  /** YAML spec text → validated + registered view/service specs.
    * Error-message contract matches the reference (sous_chef.py:167-260).
    */
  def createFromYamlText(
      yamlText: String,
      applyToRegistry: Boolean = true,
      dryRun: Boolean = false): Map[String, Product] = {
    val config = YamlLoader.loadMap(yamlText)
    if (!config.contains("feature_views"))
      throw new IllegalArgumentException("No feature_views section found in YAML")

    // Structured errors (reference: errors.py:12-30): GraftError carries
    // the ValidationError list for CI (toDict/toJson) while its message
    // keeps the reference's exact string contract.
    val errors = new ConfigValidator(metadataRules).validateStructured(config)
    if (errors.nonEmpty)
      throw new GraftError(
        "Configuration validation failed:\n" + errors.map(_.message).mkString("\n"),
        errors)

    val viewSpecs = scala.collection.mutable.LinkedHashMap[String, FeatureViewSpec]()
    config("feature_views").asInstanceOf[Map[String, Any]].foreach {
      case (name, spec: Map[_, _]) =>
        val m = spec.asInstanceOf[Map[String, Any]]
        val sourceName = String.valueOf(m("source_name"))
        if (registry.getSource(sourceName).isEmpty)
          throw new IllegalArgumentException(s"Data source '$sourceName' not found")
        val entityNames = m("entities").asInstanceOf[Seq[_]].map(String.valueOf(_))
        entityNames.foreach { en =>
          if (registry.getEntity(en).isEmpty)
            throw new IllegalArgumentException(s"Entity '$en' not found")
        }
        val schema = m("schema").asInstanceOf[Seq[_]].map { case f: Map[_, _] =>
          val fm = f.asInstanceOf[Map[String, Any]]
          val dtype = String.valueOf(fm("dtype"))
          if (!FieldSpec.ValidDtypes.contains(dtype))
            throw new NoSuchElementException(s"key not found: $dtype")
          FieldSpec(
            String.valueOf(fm("name")), dtype,
            fm.get("tags").map(YamlLoader.asStringMap).getOrElse(Map.empty))
        }
        viewSpecs(name) = FeatureViewSpec(
          name = name,
          sourceName = sourceName,
          entities = entityNames,
          ttlDays = m.get("ttl_days").map(String.valueOf(_).toInt).getOrElse(1),
          schema = schema,
          tags = m.get("tags").map(YamlLoader.asStringMap).getOrElse(Map.empty))
      case _ =>
    }

    val created = scala.collection.mutable.LinkedHashMap[String, Product]()
    viewSpecs.foreach { case (k, v) => created(k) = v }

    config.get("feature_services").foreach { case svcs: Map[_, _] =>
      svcs.asInstanceOf[Map[String, Any]].foreach { case (name, spec: Map[_, _]) =>
        val m = spec.asInstanceOf[Map[String, Any]]
        val members = m("features").asInstanceOf[Seq[_]].map(String.valueOf(_))
        members.foreach { vn =>
          if (!viewSpecs.contains(vn))
            throw new IllegalArgumentException(s"Feature view '$vn' not found")
        }
        created(name) = FeatureServiceSpec(
          name = name,
          features = members,
          description = m.get("description").map(String.valueOf(_)).getOrElse(""),
          tags = m.get("tags").map(YamlLoader.asStringMap).getOrElse(Map.empty))
      }
    }

    if (applyToRegistry && !dryRun) {
      created.values.foreach {
        case v: FeatureViewSpec    => registry.applyView(v)
        case s: FeatureServiceSpec => registry.applyService(s)
        case _                     =>
      }
    }
    created.toMap
  }

  def createFromYamlFile(
      path: String,
      applyToRegistry: Boolean = true,
      dryRun: Boolean = false): Map[String, Product] = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      throw new java.io.FileNotFoundException(s"Config file not found: $path")
    createFromYamlText(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8),
      applyToRegistry, dryRun)
  }

  // --------------------------------------------------------- compile
  /** Source spec → DataFrame. Parquet is the sandbox physical format;
    * `spark` sources take a catalog table or SQL query (SURVEY §2.1
    * S1-S3) — which is also the Iceberg path (north_rule): an Iceberg
    * table registered in the session catalog is consumed through the
    * same `table` param with zero engine changes (partition pruning,
    * snapshot reads and metadata-level filters come from the Iceberg
    * DSv2 connector underneath the identical plan). `field_mapping`
    * renames are applied here, so every downstream spec name refers to
    * post-mapping columns (reference: sous_chef.py:41-42; Feast applies
    * the mapping at source load). */
  def sourceDF(src: SourceSpec): DataFrame = {
    val raw = src.sourceType match {
      case "file" =>
        spark.read.parquet(src.path.getOrElse(
          throw new IllegalArgumentException(s"file source '${src.name}' needs a path")))
      case "spark" =>
        src.query.map(spark.sql)
          .orElse(src.table.map(spark.table))
          .orElse(src.path.map(spark.read.parquet(_)))
          .getOrElse(throw new IllegalArgumentException(
            s"spark source '${src.name}' needs query, table or path"))
      case other =>
        throw new IllegalArgumentException(
          s"Source type '$other' has no batch compilation (streaming/online only)")
    }
    applyMapping(src, raw)
  }

  private def applyMapping(src: SourceSpec, raw: DataFrame): DataFrame =
    src.fieldMapping.foldLeft(raw) { case (df, (from, to)) =>
      if (!df.columns.contains(from))
        throw new IllegalArgumentException(
          s"field_mapping of source '${src.name}' maps missing column '$from'")
      df.withColumnRenamed(from, to)
    }

  // --------------------------------------------------- compile (stream)
  /** Registered streaming source → the (format, options) pair its
    * `spark.readStream` call uses. Split out as a pure function so the
    * kafka wiring is assertable WITHOUT a broker (the sandbox ships no
    * kafka connector jar) — the reference registers KafkaSource specs it
    * never executes (sous_chef.py:35,43); this is the execution seam. */
  def streamReaderFor(src: SourceSpec): (String, Map[String, String]) =
    src.sourceType match {
      case "kafka" =>
        val brokers = src.params.getOrElse("bootstrap_servers",
          throw new IllegalArgumentException(
            s"kafka source '${src.name}' needs bootstrap_servers"))
        val topic = src.params.getOrElse("topic",
          throw new IllegalArgumentException(
            s"kafka source '${src.name}' needs topic"))
        ("kafka", Map(
          "kafka.bootstrap.servers" -> brokers,
          "subscribe" -> topic,
          "startingOffsets" -> "earliest"))
      case "file_stream" =>
        val path = src.path.getOrElse(
          throw new IllegalArgumentException(
            s"file_stream source '${src.name}' needs a path"))
        ("parquet", Map("path" -> path) ++
          src.params.get("max_files_per_trigger").map("maxFilesPerTrigger" -> _))
      case other =>
        throw new IllegalArgumentException(
          s"Source type '$other' has no streaming compilation")
    }

  /** Compile a registered source to a STREAMING DataFrame, feeding the
    * [[graft.streaming.StreamingFeatures]] operators (readStream →
    * transforms → writeStream). `field_mapping` renames apply exactly as
    * in the batch path, so view specs compile against either. The file
    * source needs a static schema: inferred once from the directory's
    * existing files via a metadata-only batch probe (at scale, pass a
    * registered table schema instead of re-inferring per job). */
  def readStreamDF(src: SourceSpec): DataFrame = {
    val (format, opts) = streamReaderFor(src)
    val reader = spark.readStream.format(format).options(opts)
    val raw = src.sourceType match {
      case "file_stream" =>
        reader.schema(spark.read.parquet(src.path.get).schema).load()
      case _ => reader.load()
    }
    applyMapping(src, raw)
  }

  /** [[readStreamDF]] by registered source name. */
  def readStream(sourceName: String): DataFrame =
    readStreamDF(registry.getSource(sourceName).getOrElse(
      throw new IllegalArgumentException(s"Data source '$sourceName' not found")))

  /** Canonical Spark type for a spec dtype — compute in DOUBLE, cast
    * FLOAT only at the serving boundary (SURVEY §1.2). */
  private def specType(dtype: String): String = dtype match {
    case "INT64" => "long"
    case "FLOAT" => "double"
    case _       => "string"
  }

  /** Compile a feature view to its unexecuted DataFrame: entity keys +
    * event time + declared features, dtypes normalized. Projection is
    * pushed to the scan by Catalyst (only spec'd columns are read).
    * If the source declares `created_timestamp_column`, it rides along
    * as `_created_ts` — the equal-event-timestamp tie-break for
    * point-in-time retrieval and latest-row materialization (Feast
    * semantics; reference: sous_chef.py:41). */
  def compileView(view: FeatureViewSpec): DataFrame = {
    val src = registry.getSource(view.sourceName).getOrElse(
      throw new IllegalArgumentException(s"Data source '${view.sourceName}' not found"))
    val tsField = src.timestampField.getOrElse(
      throw new IllegalArgumentException(
        s"Source '${src.name}' has no timestamp_field"))
    val df = sourceDF(src)
    val keyCols = view.entities.map { en =>
      registry.getEntity(en).getOrElse(
        throw new IllegalArgumentException(s"Entity '$en' not found")).joinKey
    }
    val errors = CatalystInference.reconcile(
      view.schema,
      df.select((keyCols :+ tsField).map(col) ++ view.schema.map(f => col(f.name)): _*).schema)
    if (errors.nonEmpty)
      throw new IllegalArgumentException(
        "Schema reconciliation failed:\n" + errors.mkString("\n"))
    val createdSel = src.createdTimestampColumn.toSeq
      .map(c => col(c).cast("timestamp").as(CreatedTsCol))
    df.select(
      keyCols.map(col) ++
        Seq(col(tsField).cast("timestamp").as("event_timestamp")) ++
        createdSel ++
        view.schema.map(f => col(f.name).cast(specType(f.dtype)).as(f.name)): _*)
  }

  // ------------------------------------------------------------- EP3
  /** Point-in-time retrieval: one backward as-of join per member view of
    * the service; output = probe columns + each view's features (nulls
    * where no in-TTL row exists).
    *
    * @param probe DataFrame with each view's entity join keys and an
    *              `event_timestamp` column (Feast entity_df convention)
    * @param fullFeatureNames prefix features `viewName__feature`
    */
  def retrieve(
      probe: DataFrame,
      serviceName: String,
      fullFeatureNames: Boolean = false): DataFrame = {
    val service = registry.getService(serviceName).getOrElse(
      throw new IllegalArgumentException(s"Feature service '$serviceName' not found"))
    val views = service.features.map { vn =>
      registry.getView(vn).getOrElse(
        throw new IllegalArgumentException(s"Feature view '$vn' not found"))
    }
    val keySets = views.map(_.entities.map(en => registry.getEntity(en).get.joinKey))
    // Multi-view service over a SHARED entity key: one tagged union +
    // one window carries every view's latest-row struct simultaneously —
    // exactly ONE hash exchange for the whole service, vs one per view
    // in the fold (each reshuffling the growing probe result). This is
    // the service-retrieval shape that matters at 10^12 probe rows; the
    // plan is gated by MultiViewPlanSpec, the fold-equality by
    // FeatureEngineSpec.
    if (views.size > 1 && keySets.distinct.size == 1) {
      val keyCols = keySets.head
      val sides = views.map { view => compileSide(view, keyCols, fullFeatureNames) }
      AsOfJoin.backwardMulti(probe, sides, keyCols, "event_timestamp")
    } else {
      service.features.foldLeft(probe) { (acc, viewName) =>
        retrieveView(acc, viewName, fullFeatureNames)
      }
    }
  }

  /** Compile one view into a [[AsOfJoin.FeatureSide]] for multi-view
    * retrieval: same naming/tie-break contract as [[retrieveView]], with
    * the created-ts tie-break kept out of the output projection (two
    * views' `_created_ts` columns would otherwise collide). */
  private def compileSide(
      view: FeatureViewSpec,
      keyCols: Seq[String],
      fullFeatureNames: Boolean): AsOfJoin.FeatureSide = {
    val compiled = compileView(view)
    val hasCreated = compiled.columns.contains(CreatedTsCol)
    val outNames =
      if (fullFeatureNames) view.schema.map(f => s"${view.name}__${f.name}")
      else view.schema.map(_.name)
    val feats =
      if (fullFeatureNames)
        compiled.select(
          (keyCols :+ "event_timestamp").map(col) ++
            (if (hasCreated) Seq(col(CreatedTsCol)) else Nil) ++
            view.schema.map(f => col(f.name).as(s"${view.name}__${f.name}")): _*)
      else compiled
    AsOfJoin.FeatureSide(
      features = feats,
      featTsCol = "event_timestamp",
      ttlSeconds = Some(view.ttlSeconds),
      tieBreak = if (hasCreated) Seq(CreatedTsCol) else Nil,
      matchedTsName = None,
      outputCols = Some(outNames))
  }

  /** Single-view point-in-time retrieval (used by retrieve and directly
    * testable). Equal event timestamps break on the source's
    * `created_timestamp_column` when declared (greatest wins — Feast's
    * point-in-time dedup), else on the engine's stable default. */
  def retrieveView(
      probe: DataFrame,
      viewName: String,
      fullFeatureNames: Boolean = false): DataFrame = {
    val view = registry.getView(viewName).getOrElse(
      throw new IllegalArgumentException(s"Feature view '$viewName' not found"))
    val compiled = compileView(view)
    val hasCreated = compiled.columns.contains(CreatedTsCol)
    val keyCols = view.entities.map { en => registry.getEntity(en).get.joinKey }
    val feats =
      if (fullFeatureNames)
        compiled.select(
          (keyCols :+ "event_timestamp").map(col) ++
            (if (hasCreated) Seq(col(CreatedTsCol)) else Nil) ++
            view.schema.map(f => col(f.name).as(s"${view.name}__${f.name}")): _*)
      else compiled
    AsOfJoin.backward(
      probe, feats.withColumnRenamed("event_timestamp", "_feat_ts"),
      keys = keyCols,
      probeTsCol = "event_timestamp",
      featTsCol = "_feat_ts",
      ttlSeconds = Some(view.ttlSeconds),
      tieBreak = if (hasCreated) Seq(CreatedTsCol) else Nil,
      matchedTsName = s"_matched_ts_${view.name}")
      .drop(s"_matched_ts_${view.name}")
      .drop(CreatedTsCol)
  }

  /** Checkpoint-resumable backfill of a compiled feature view to a
    * parquet sink with per-bucket manifests and a per-view lineage
    * record (north_rule: "per-partition lineage + metrics ... per
    * feature view"). Rerunning resumes past completed buckets.
    */
  def materializeView(
      viewName: String,
      outDir: String): graft.materialize.Materializer.Report = {
    val view = registry.getView(viewName).getOrElse(
      throw new IllegalArgumentException(s"Feature view '$viewName' not found"))
    val compiled = compileView(view)
    graft.materialize.Materializer.materialize(
      spark, compiled, "event_timestamp", outDir,
      lineage = Map(
        "feature_view" -> view.name,
        "source" -> view.sourceName,
        "entities" -> view.entities.mkString(","),
        "ttl_days" -> view.ttlDays.toString,
        "schema" -> view.schema.map(f => s"${f.name}:${f.dtype}").mkString(",")))
  }

  /** "Materialize latest per key" — the online-store write shape
    * (SURVEY §2.1 S5): ROW_NUMBER()=1 over key ordered by ts desc, with
    * the source's created-timestamp as the equal-ts tie-break when
    * declared. */
  def materializeLatest(viewName: String): DataFrame = {
    val view = registry.getView(viewName).getOrElse(
      throw new IllegalArgumentException(s"Feature view '$viewName' not found"))
    val compiled = compileView(view)
    val keyCols = view.entities.map(en => registry.getEntity(en).get.joinKey)
    val ordering =
      if (compiled.columns.contains(CreatedTsCol))
        Seq(col("event_timestamp").desc, col(CreatedTsCol).desc)
      else Seq(col("event_timestamp").desc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    compiled.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", CreatedTsCol)
  }
}

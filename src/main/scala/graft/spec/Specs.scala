package graft.spec

/** Declarative feature-store spec AST — the reference's data model
  * (reference: src/sous_chef/sous_chef.py:133-252) re-expressed as case
  * classes. Tags are metadata only and never enter the data path.
  */

/** Named join key (reference: sous_chef.py:133-139). */
case class EntitySpec(
    name: String,
    joinKey: String,
    description: String = "")

/** Pointer to a timestamped event table (reference: sous_chef.py:32-45,
  * 141-160). `params` already filtered per source type.
  *
  * `fieldMapping` (reference: sous_chef.py:41-42 `field_mapping`; Feast
  * renames source columns with it) maps source column → exposed name and
  * is applied at load time, so every other spec name (`timestamp_field`,
  * `created_timestamp_column`, entity join keys, view schema fields)
  * refers to POST-mapping names. `created_timestamp_column` is the
  * equal-event-timestamp tie-break during point-in-time retrieval
  * (Feast's point-in-time dedup contract).
  */
case class SourceSpec(
    name: String,
    sourceType: String,
    params: Map[String, String],
    fieldMapping: Map[String, String] = Map.empty) {
  def path: Option[String] = params.get("path")
  def table: Option[String] = params.get("table")
  def query: Option[String] = params.get("query")
  def timestampField: Option[String] = params.get("timestamp_field")
  def createdTimestampColumn: Option[String] = params.get("created_timestamp_column")
}

object SourceSpec {
  /** Source-type parameter allowlists (reference: sous_chef.py:40-45).
    * `file_stream` is an engine extension beyond the reference's four
    * types: a parquet directory consumed as a STREAM (Structured
    * Streaming file source) — the in-sandbox-testable streaming seam;
    * kafka compiles through the same [[graft.engine.FeatureEngine
    * .readStreamDF]] path. */
  val SourceParams: Map[String, Seq[String]] = Map(
    "file" -> Seq("path", "timestamp_field", "created_timestamp_column", "field_mapping"),
    "spark" -> Seq("path", "timestamp_field", "table", "query", "field_mapping"),
    "kafka" -> Seq("bootstrap_servers", "topic", "timestamp_field", "message_format"),
    "redis" -> Seq("connection_string", "key_ttl"),
    "file_stream" -> Seq("path", "timestamp_field", "max_files_per_trigger", "field_mapping"))

  val SupportedTypes: Seq[String] = Seq("file", "spark", "kafka", "redis", "file_stream")

  /** Filter config params per source type (reference: sous_chef.py:119-125). */
  def filterParams(sourceType: String, config: Map[String, String]): Map[String, String] =
    SourceParams.get(sourceType) match {
      case Some(allowed) => config.filter { case (k, _) => allowed.contains(k) }
      case None          => config
    }
}

/** One feature column: dtype ∈ {FLOAT, INT64, STRING} (reference DTYPE_MAP
  * sous_chef.py:26-29 plus STRING from sql_sources.py:219).
  */
case class FieldSpec(
    name: String,
    dtype: String,
    tags: Map[String, String] = Map.empty)

object FieldSpec {
  val ValidDtypes: Set[String] = Set("FLOAT", "INT64", "STRING")
}

/** Named, TTL'd set of features over one source keyed by entities
  * (reference: sous_chef.py:224-231; YAML shape
  * tests/fixtures/features/driver_stats.yaml).
  */
case class FeatureViewSpec(
    name: String,
    sourceName: String,
    entities: Seq[String],
    ttlDays: Int = 1,
    schema: Seq[FieldSpec] = Nil,
    tags: Map[String, String] = Map.empty) {
  def ttlSeconds: Long = ttlDays.toLong * 86400L
}

/** Named bundle of feature views — the retrieval unit (reference:
  * sous_chef.py:247-252).
  */
case class FeatureServiceSpec(
    name: String,
    features: Seq[String],
    description: String = "",
    tags: Map[String, String] = Map.empty)

/** Tag governance rules (reference: src/sous_chef/config/metadata_rules
  * .yaml; validators.py:167-215).
  */
case class MetadataRules(
    requiredTags: Map[String, Seq[String]],
    optionalTags: Map[String, Seq[String]]) {

  def requiredFor(contextType: String): Set[String] =
    requiredTags.getOrElse("global", Nil).toSet ++
      requiredTags.getOrElse(contextType, Nil).toSet

  def allowedFor(contextType: String): Set[String] =
    optionalTags.getOrElse("global", Nil).toSet ++
      requiredTags.values.flatten.toSet
}

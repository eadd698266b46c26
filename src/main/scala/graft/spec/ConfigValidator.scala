package graft.spec

/** Spec/tag governance validation — a behavior-compatible port of the
  * reference's ConfigValidator (reference: src/sous_chef/validators.py:
  * 160-295), returning the same error strings so fixture-replay tests
  * hold. Set-shaped message fragments are rendered Python-repr-style
  * (`{'a', 'b'}`) in sorted order for determinism.
  *
  * Errors are produced structurally ([[ValidationError]] with path /
  * code / context — reference: errors.py:4-10) and flattened to the
  * legacy strings by [[validate]]; CI consumers use
  * [[validateStructured]] or catch [[GraftError]] and call `toDict`.
  */
class ConfigValidator(rules: MetadataRules) {

  import ValidationCodes._

  private def pySet(s: Iterable[String]): String =
    s.toSeq.sorted.map(x => s"'$x'").mkString("{", ", ", "}")

  /** reference: validators.py:177-215 (string contract). */
  def validateTags(tags: Any, context: String, contextType: String): Seq[String] =
    validateTagsStructured(tags, context, contextType, path = context).map(_.message)

  /** Structured tag validation: same messages, plus path/code/context. */
  def validateTagsStructured(
      tags: Any,
      context: String,
      contextType: String,
      path: String): Seq[ValidationError] =
    tags match {
      case m: Map[_, _] =>
        val keys = m.keys.map(String.valueOf(_)).toSet
        val required = rules.requiredFor(contextType)
        val allowed = rules.allowedFor(contextType)
        val errors = scala.collection.mutable.ArrayBuffer[ValidationError]()
        val invalid = keys -- allowed
        if (invalid.nonEmpty)
          errors += ValidationError(path, UnsupportedTags,
            s"$context: unsupported tags found: ${pySet(invalid)}",
            Map("tags" -> invalid.toSeq.sorted.mkString(",")))
        val missing = required -- keys
        if (missing.nonEmpty)
          errors += ValidationError(path, MissingTags,
            s"$context: missing required tags: ${pySet(missing)}",
            Map("tags" -> missing.toSeq.sorted.mkString(",")))
        errors.toSeq
      case _ =>
        Seq(ValidationError(path, InvalidType, s"$context: tags must be a dictionary"))
    }

  /** Whole-config validation, legacy string shape (reference:
    * validators.py:217-295). */
  def validate(config: Any): Seq[String] =
    validateStructured(config).map(_.message)

  /** Whole-config validation with the structured error contract. */
  def validateStructured(config: Any): Seq[ValidationError] = config match {
    case cfg: Map[_, _] =>
      val c = cfg.asInstanceOf[Map[String, Any]]
      val errors = scala.collection.mutable.ArrayBuffer[ValidationError]()

      c.get("feature_views").foreach {
        case views: Map[_, _] =>
          views.asInstanceOf[Map[String, Any]].foreach {
            case (name, view: Map[_, _]) =>
              val v = view.asInstanceOf[Map[String, Any]]
              val viewPath = s"feature_views.$name"
              val requiredFields = Set("source_name", "entities", "schema")
              val missing = requiredFields -- v.keySet
              if (missing.nonEmpty)
                errors += ValidationError(viewPath, MissingField,
                  s"Feature view '$name' missing required fields: ${pySet(missing)}",
                  Map("fields" -> missing.toSeq.sorted.mkString(",")))
              v.get("tags").foreach { t =>
                errors ++= validateTagsStructured(
                  t, s"Feature view '$name'", "feature_view", s"$viewPath.tags")
              }
              v.get("schema").foreach {
                case fields: Seq[_] =>
                  fields.foreach {
                    case f: Map[_, _] =>
                      val fm = f.asInstanceOf[Map[String, Any]]
                      val fname = String.valueOf(fm.getOrElse("name", ""))
                      fm.get("tags").foreach { t =>
                        errors ++= validateTagsStructured(
                          t,
                          s"Feature '$fname' in view '$name'",
                          "feature",
                          s"$viewPath.schema.$fname.tags")
                      }
                    case _ =>
                  }
                case _ =>
              }
            case (name, _) =>
              errors += ValidationError(s"feature_views.$name", InvalidType,
                s"Feature view '$name' configuration must be a dictionary")
          }
        case _ =>
      }

      c.get("feature_services").foreach {
        case services: Map[_, _] =>
          val knownViews: Set[String] = c.get("feature_views") match {
            case Some(m: Map[_, _]) => m.keys.map(String.valueOf(_)).toSet
            case _                  => Set.empty
          }
          services.asInstanceOf[Map[String, Any]].foreach {
            case (name, svc: Map[_, _]) =>
              val s = svc.asInstanceOf[Map[String, Any]]
              val svcPath = s"feature_services.$name"
              s.get("features") match {
                case None =>
                  errors += ValidationError(svcPath, MissingField,
                    s"Feature service '$name' missing required field: features",
                    Map("fields" -> "features"))
                case Some(fs: Seq[_]) =>
                  if (fs.isEmpty)
                    errors += ValidationError(s"$svcPath.features", EmptyList,
                      s"Feature service '$name' features list cannot be empty")
                  fs.foreach { vn =>
                    if (!knownViews.contains(String.valueOf(vn)))
                      errors += ValidationError(s"$svcPath.features", UnknownReference,
                        s"Feature service '$name' references non-existent feature view: $vn",
                        Map("view" -> String.valueOf(vn)))
                  }
                case Some(_) =>
                  errors += ValidationError(s"$svcPath.features", InvalidType,
                    s"Feature service '$name' features must be a list")
              }
              s.get("tags").foreach {
                case _: Map[_, _] =>
                  errors ++= validateTagsStructured(
                    s("tags"), s"Feature service '$name'", "feature_service",
                    s"$svcPath.tags")
                case _ =>
                  errors += ValidationError(s"$svcPath.tags", InvalidType,
                    s"Feature service '$name' tags must be a dictionary")
              }
            case (name, _) =>
              errors += ValidationError(s"feature_services.$name", InvalidType,
                s"Feature service '$name' configuration must be a dictionary")
          }
        case _ =>
      }

      errors.toSeq
    case _ =>
      Seq(ValidationError("", InvalidType, "Configuration must be a dictionary"))
  }
}

object ConfigValidator {

  /** Default rules (reference: src/sous_chef/config/metadata_rules.yaml). */
  val DefaultRules: MetadataRules = MetadataRules(
    requiredTags = Map(
      "global" -> Seq("owner", "version"),
      "feature_view" -> Seq("domain", "team"),
      "feature" -> Seq("description", "data_quality"),
      "feature_service" -> Seq("status", "SLA")),
    optionalTags = Map(
      "global" -> Seq(
        "description", "domain", "team", "status", "SLA", "data_quality",
        "update_frequency", "source_system", "data_owner", "tier",
        "privacy_level", "freshness_sla", "validation_rules")))

  def fromYaml(v: Any): MetadataRules = {
    val m = v.asInstanceOf[Map[String, Any]]
    def section(key: String): Map[String, Seq[String]] = m.get(key) match {
      case Some(s: Map[_, _]) =>
        s.asInstanceOf[Map[String, Any]].map {
          case (k, l: Seq[_]) => k -> l.map(String.valueOf(_))
          case (k, _)         => k -> Nil
        }
      case _ => Map.empty
    }
    MetadataRules(section("required_tags"), section("optional_tags"))
  }

  def apply(rules: MetadataRules = DefaultRules): ConfigValidator =
    new ConfigValidator(rules)
}

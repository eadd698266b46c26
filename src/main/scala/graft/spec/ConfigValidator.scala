package graft.spec

/** Spec/tag governance validation — a behavior-compatible port of the
  * reference's ConfigValidator (reference: src/sous_chef/validators.py:
  * 160-295), returning the same error strings so fixture-replay tests
  * hold. Set-shaped message fragments are rendered Python-repr-style
  * (`{'a', 'b'}`) in sorted order for determinism.
  */
class ConfigValidator(rules: MetadataRules) {

  private def pySet(s: Iterable[String]): String =
    s.toSeq.sorted.map(x => s"'$x'").mkString("{", ", ", "}")

  /** reference: validators.py:177-215 */
  def validateTags(tags: Any, context: String, contextType: String): Seq[String] =
    tags match {
      case m: Map[_, _] =>
        val keys = m.keys.map(String.valueOf(_)).toSet
        val required = rules.requiredFor(contextType)
        val allowed = rules.allowedFor(contextType)
        val errors = scala.collection.mutable.ArrayBuffer[String]()
        val invalid = keys -- allowed
        if (invalid.nonEmpty)
          errors += s"$context: unsupported tags found: ${pySet(invalid)}"
        val missing = required -- keys
        if (missing.nonEmpty)
          errors += s"$context: missing required tags: ${pySet(missing)}"
        errors.toSeq
      case _ => Seq(s"$context: tags must be a dictionary")
    }

  /** Whole-config validation (reference: validators.py:217-295). */
  def validate(config: Any): Seq[String] = config match {
    case cfg: Map[_, _] =>
      val c = cfg.asInstanceOf[Map[String, Any]]
      val errors = scala.collection.mutable.ArrayBuffer[String]()

      c.get("feature_views").foreach {
        case views: Map[_, _] =>
          views.asInstanceOf[Map[String, Any]].foreach {
            case (name, view: Map[_, _]) =>
              val v = view.asInstanceOf[Map[String, Any]]
              val requiredFields = Set("source_name", "entities", "schema")
              val missing = requiredFields -- v.keySet
              if (missing.nonEmpty)
                errors += s"Feature view '$name' missing required fields: ${pySet(missing)}"
              v.get("tags").foreach { t =>
                errors ++= validateTags(t, s"Feature view '$name'", "feature_view")
              }
              v.get("schema").foreach {
                case fields: Seq[_] =>
                  fields.foreach {
                    case f: Map[_, _] =>
                      val fm = f.asInstanceOf[Map[String, Any]]
                      fm.get("tags").foreach { t =>
                        errors ++= validateTags(
                          t,
                          s"Feature '${fm.getOrElse("name", "")}' in view '$name'",
                          "feature")
                      }
                    case _ =>
                  }
                case _ =>
              }
            case (name, _) =>
              errors += s"Feature view '$name' configuration must be a dictionary"
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
              s.get("features") match {
                case None =>
                  errors += s"Feature service '$name' missing required field: features"
                case Some(fs: Seq[_]) =>
                  if (fs.isEmpty)
                    errors += s"Feature service '$name' features list cannot be empty"
                  fs.foreach { vn =>
                    if (!knownViews.contains(String.valueOf(vn)))
                      errors += s"Feature service '$name' references non-existent feature view: $vn"
                  }
                case Some(_) =>
                  errors += s"Feature service '$name' features must be a list"
              }
              s.get("tags").foreach {
                case _: Map[_, _] =>
                  errors ++= validateTags(s("tags"), s"Feature service '$name'", "feature_service")
                case _ =>
                  errors += s"Feature service '$name' tags must be a dictionary"
              }
            case (name, _) =>
              errors += s"Feature service '$name' configuration must be a dictionary"
          }
        case _ =>
      }

      errors.toSeq
    case _ => Seq("Configuration must be a dictionary")
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

package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** Tag/metadata governance validation — replays the reference's
  * validator contracts (reference: tests/test_validators.py:84-431)
  * against the ported rule sets in tests/fixtures/config/
  * metadata_rules.yaml (minimal / complex / standard).
  */
class ConfigValidatorSpec extends AnyFunSuite {

  private lazy val rulesYaml = YamlLoader.loadFileMap(
    getClass.getResource("/fixtures/config/metadata_rules.yaml").getPath)

  private def rules(name: String): MetadataRules =
    ConfigValidator.fromYaml(rulesYaml(name))

  test("minimal rules: anything goes when nothing is required or optional") {
    val v = new ConfigValidator(rules("minimal"))
    assert(v.validateTags(Map.empty[String, String], "Feature view 'x'", "feature_view").isEmpty)
  }

  test("standard rules: missing required and unsupported tags reported") {
    val v = new ConfigValidator(rules("standard"))
    val errs = v.validateTags(
      Map("owner" -> "me", "bogus" -> "x"), "Feature view 'fv'", "feature_view")
    assert(errs.exists(_ ===
      "Feature view 'fv': unsupported tags found: {'bogus'}"))
    assert(errs.exists(_ ===
      "Feature view 'fv': missing required tags: {'team', 'version'}"))
  }

  test("tags must be a dictionary") {
    val v = new ConfigValidator(rules("standard"))
    assert(v.validateTags("not-a-map", "Feature view 'fv'", "feature_view") ===
      Seq("Feature view 'fv': tags must be a dictionary"))
  }

  test("feature view required fields") {
    val v = ConfigValidator()
    val errs = v.validate(Map("feature_views" -> Map(
      "bad_view" -> Map("entities" -> Seq("e1")))))
    assert(errs === Seq(
      "Feature view 'bad_view' missing required fields: {'schema', 'source_name'}"))
  }

  test("feature service contracts: missing/empty/dangling features") {
    val v = ConfigValidator()
    val base = Map(
      "feature_views" -> Map("v1" -> Map(
        "source_name" -> "s", "entities" -> Seq("e"), "schema" -> Seq.empty)))

    assert(v.validate(base + ("feature_services" -> Map("svc" -> Map.empty[String, Any])))
      === Seq("Feature service 'svc' missing required field: features"))

    assert(v.validate(base + ("feature_services" -> Map("svc" -> Map("features" -> Seq.empty[String]))))
      === Seq("Feature service 'svc' features list cannot be empty"))

    assert(v.validate(base + ("feature_services" -> Map("svc" -> Map("features" -> "v1"))))
      === Seq("Feature service 'svc' features must be a list"))

    assert(v.validate(base + ("feature_services" ->
      Map("svc" -> Map("features" -> Seq("nonexistent_view")))))
      === Seq("Feature service 'svc' references non-existent feature view: nonexistent_view"))
  }

  test("non-dict config and non-dict view/service configs") {
    val v = ConfigValidator()
    assert(v.validate("nope") === Seq("Configuration must be a dictionary"))
    assert(v.validate(Map("feature_views" -> Map("fv" -> "nope")))
      === Seq("Feature view 'fv' configuration must be a dictionary"))
    assert(v.validate(Map(
      "feature_views" -> Map.empty[String, Any],
      "feature_services" -> Map("s" -> "nope")))
      === Seq("Feature service 's' configuration must be a dictionary"))
  }

  test("default rules accept the complex unicode fixture") {
    val cfg = YamlLoader.loadFileMap(
      getClass.getResource("/fixtures/features/complex_features.yaml").getPath)
    assert(ConfigValidator().validate(cfg).isEmpty)
  }

  test("feature-level tag validation inside view schema") {
    val v = new ConfigValidator(rules("standard"))
    val cfg = Map("feature_views" -> Map("fv" -> Map(
      "source_name" -> "s", "entities" -> Seq("e"),
      "schema" -> Seq(Map(
        "name" -> "f1", "dtype" -> "FLOAT",
        "tags" -> Map("owner" -> "me"))))))
    val errs = v.validate(cfg)
    assert(errs === Seq(
      "Feature 'f1' in view 'fv': missing required tags: {'description', 'version'}"))
  }

  test("structured error contract: path/code/context alongside the strings") {
    // reference: errors.py:4-10 ValidationError{path, code, message,
    // context} + errors.py:18-30 to_dict
    val v = ConfigValidator()
    val cfg = Map(
      "feature_views" -> Map("bad_view" -> Map("entities" -> Seq("e1"))),
      "feature_services" -> Map("svc" -> Map("features" -> Seq("nope"))))
    val errs = v.validateStructured(cfg)
    assert(errs.size === 2)

    val missing = errs.find(_.code == ValidationCodes.MissingField).get
    assert(missing.path === "feature_views.bad_view")
    assert(missing.message ===
      "Feature view 'bad_view' missing required fields: {'schema', 'source_name'}")
    assert(missing.context("fields") === "schema,source_name")

    val dangling = errs.find(_.code == ValidationCodes.UnknownReference).get
    assert(dangling.path === "feature_services.svc.features")
    assert(dangling.context("view") === "nope")

    // strings contract is the structured messages, verbatim
    assert(v.validate(cfg) === errs.map(_.message))
  }

  test("GraftError: CI dictionary/JSON shape, catchable as the legacy type") {
    val errs = Seq(ValidationError(
      "feature_views.v1.tags", ValidationCodes.MissingTags,
      "Feature view 'v1': missing required tags: {'team'}",
      Map("tags" -> "team")))
    val ex = new GraftError("Configuration validation failed:\n" +
      errs.head.message, errs)
    assert(ex.isInstanceOf[IllegalArgumentException])

    val d = ex.toDict
    assert(String.valueOf(d("message")).startsWith("Configuration validation failed:"))
    val first = d("errors").asInstanceOf[Seq[Map[String, Any]]].head
    assert(first("path") === "feature_views.v1.tags")
    assert(first("code") === "MISSING_TAGS")

    val json = ex.toJson
    assert(json.contains(""""path": "feature_views.v1.tags""""))
    assert(json.contains(""""code": "MISSING_TAGS""""))
    assert(json.contains(""""context": {"tags": "team"}"""))
  }
}

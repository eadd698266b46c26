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
}

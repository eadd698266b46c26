package graft.spec

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Minimal YAML → Scala structure loader (snakeyaml ships with Spark).
  * All spec YAML is maps/lists/scalars; everything is normalized to
  * `Map[String, Any]`, `Seq[Any]`, `String`/`Int`/`Double`/`Boolean`.
  */
object YamlLoader {

  def load(text: String): Any = normalize(new Yaml().load[Any](text))

  def loadFile(path: String): Any =
    load(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def loadMap(text: String): Map[String, Any] =
    load(text).asInstanceOf[Map[String, Any]]

  def loadFileMap(path: String): Map[String, Any] =
    loadFile(path).asInstanceOf[Map[String, Any]]

  private def normalize(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> normalize(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(normalize).toSeq
    case other                => other
  }

  /** Tags block → Map[String,String] (values stringified like the
    * reference's YAML-to-Feast pass-through, preserving unicode). */
  def asStringMap(v: Any): Map[String, String] = v match {
    case m: Map[_, _] =>
      m.map { case (k, x) => String.valueOf(k) -> String.valueOf(x) }
    case null => Map.empty
    case _    => Map.empty
  }
}

package graft.registry

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import graft.spec._

/** Durable catalog of applied spec objects — the reference's Feast
  * `registry.db` + `store.apply(...)` protocol (reference: sous_chef.py:
  * 139,160,257) replaced by an in-memory map with JSON persistence.
  * `apply` is an idempotent upsert.
  */
class FeatureRegistry {

  private val entities = scala.collection.mutable.LinkedHashMap[String, EntitySpec]()
  private val sources = scala.collection.mutable.LinkedHashMap[String, SourceSpec]()
  private val views = scala.collection.mutable.LinkedHashMap[String, FeatureViewSpec]()
  private val services = scala.collection.mutable.LinkedHashMap[String, FeatureServiceSpec]()

  def applyEntity(e: EntitySpec): Unit = entities.update(e.name, e)
  def applySource(s: SourceSpec): Unit = sources.update(s.name, s)
  def applyView(v: FeatureViewSpec): Unit = views.update(v.name, v)
  def applyService(s: FeatureServiceSpec): Unit = services.update(s.name, s)

  def getEntity(name: String): Option[EntitySpec] = entities.get(name)
  def getSource(name: String): Option[SourceSpec] = sources.get(name)
  def getView(name: String): Option[FeatureViewSpec] = views.get(name)
  def getService(name: String): Option[FeatureServiceSpec] = services.get(name)

  def entityNames: Seq[String] = entities.keys.toSeq
  def sourceNames: Seq[String] = sources.keys.toSeq
  def viewNames: Seq[String] = views.keys.toSeq
  def serviceNames: Seq[String] = services.keys.toSeq

  private case class State(
      entities: Seq[EntitySpec],
      sources: Seq[SourceSpec],
      views: Seq[FeatureViewSpec],
      services: Seq[FeatureServiceSpec])

  private implicit val formats: Formats = DefaultFormats

  /** Persist the full registry as JSON (atomic rename). */
  def save(path: String): Unit = {
    val json = Serialization.writePretty(State(
      entities.values.toSeq, sources.values.toSeq,
      views.values.toSeq, services.values.toSeq))
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def load(path: String): Unit = {
    val json = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    val st = Serialization.read[State](json)
    st.entities.foreach(applyEntity)
    st.sources.foreach(applySource)
    st.views.foreach(applyView)
    st.services.foreach(applyService)
  }
}

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
  *
  * Durability comes in two grades:
  *  - [[save]]/[[load]] — one-shot full-state snapshot (unchanged API);
  *  - [[attachStore]] — an append-only VERSIONED store directory: every
  *    state-CHANGING apply writes `v%06d.json` (atomic tmp+rename, like
  *    the materialization manifests) carrying the change record AND the
  *    full post-apply state, so any historical registry state can be
  *    reconstructed by reading one file and the apply stream is
  *    auditable ([[history]]). Idempotent re-applies of an identical
  *    spec do NOT burn a version — the history records real changes,
  *    which is what an audit reads. Attach replays the highest version
  *    present, so restarts resume seamlessly. Single-writer per store
  *    directory (same contract as the materialization sink).
  */
class FeatureRegistry {
  import FeatureRegistry._

  private val entities = scala.collection.mutable.LinkedHashMap[String, EntitySpec]()
  private val sources = scala.collection.mutable.LinkedHashMap[String, SourceSpec]()
  private val views = scala.collection.mutable.LinkedHashMap[String, FeatureViewSpec]()
  private val services = scala.collection.mutable.LinkedHashMap[String, FeatureServiceSpec]()

  private var store: Option[java.nio.file.Path] = None
  private var storeVersion: Int = 0
  private var nowMs: () => Long = () => System.currentTimeMillis()

  def applyEntity(e: EntitySpec): Unit =
    applying("entity", e.name, entities.get(e.name).contains(e)) {
      entities.update(e.name, e)
    }
  def applySource(s: SourceSpec): Unit =
    applying("source", s.name, sources.get(s.name).contains(s)) {
      sources.update(s.name, s)
    }
  def applyView(v: FeatureViewSpec): Unit =
    applying("view", v.name, views.get(v.name).contains(v)) {
      views.update(v.name, v)
    }
  def applyService(s: FeatureServiceSpec): Unit =
    applying("service", s.name, services.get(s.name).contains(s)) {
      services.update(s.name, s)
    }

  private def applying(kind: String, name: String, noop: Boolean)(upd: => Unit): Unit = {
    upd
    if (!noop) store.foreach { dir =>
      storeVersion += 1
      val snap = Snapshot(storeVersion, nowMs(), Change(kind, name), stateNow)
      writeAtomic(dir.resolve(f"v$storeVersion%06d.json"),
        Serialization.writePretty(snap))
    }
  }

  def getEntity(name: String): Option[EntitySpec] = entities.get(name)
  def getSource(name: String): Option[SourceSpec] = sources.get(name)
  def getView(name: String): Option[FeatureViewSpec] = views.get(name)
  def getService(name: String): Option[FeatureServiceSpec] = services.get(name)

  def entityNames: Seq[String] = entities.keys.toSeq
  def sourceNames: Seq[String] = sources.keys.toSeq
  def viewNames: Seq[String] = views.keys.toSeq
  def serviceNames: Seq[String] = services.keys.toSeq

  private implicit val formats: Formats = DefaultFormats

  private def stateNow: State = State(
    entities.values.toSeq, sources.values.toSeq,
    views.values.toSeq, services.values.toSeq)

  private def writeAtomic(target: java.nio.file.Path, json: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def snapshotFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val files = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
    files.filter(f => f.getName.matches("v\\d{6}\\.json"))
      .sortBy(_.getName).map(_.toPath).toSeq
  }

  /** Attach an append-only versioned store. Creates `dir` if absent;
    * replays the highest committed snapshot into this registry; every
    * subsequent state-changing apply appends a new versioned snapshot.
    * `clock` is injectable for deterministic tests.
    *
    * Pre-attach in-memory state is never silently lost (r5 review):
    * attaching a NON-EMPTY registry to an EMPTY store bootstraps the
    * store with a version-1 snapshot of the current state; attaching a
    * non-empty registry to a store that already has snapshots is
    * REFUSED (there is no principled merge order — either the snapshot
    * would clobber the in-memory applies or vice versa). Attach first,
    * then apply. */
  def attachStore(dir: String,
      clock: () => Long = () => System.currentTimeMillis()): Unit = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    nowMs = clock
    val snaps = snapshotFiles(p)
    val empty = entities.isEmpty && sources.isEmpty &&
      views.isEmpty && services.isEmpty
    if (snaps.nonEmpty && !empty)
      throw new IllegalStateException(
        s"attachStore: registry already holds applied objects and '$dir' " +
          "already holds snapshots — attaching would silently clobber one " +
          "of them. Attach the store FIRST, then apply changes.")
    snaps.lastOption.foreach { latest =>
      val snap = Serialization.read[Snapshot](
        new String(Files.readAllBytes(latest), StandardCharsets.UTF_8))
      restore(snap.state)
      storeVersion = snap.version
    }
    store = Some(p)
    if (snaps.isEmpty && !empty) {
      storeVersion = 1
      writeAtomic(p.resolve(f"v$storeVersion%06d.json"),
        Serialization.writePretty(
          Snapshot(storeVersion, nowMs(), Change("registry", "bootstrap"), stateNow)))
    }
  }

  /** The audited apply stream of the attached store, version-ordered
    * (read from disk, so it survives restarts and other writers' pasts). */
  def history(): Seq[HistoryEntry] = store.toSeq.flatMap { dir =>
    snapshotFiles(dir).map { f =>
      val snap = Serialization.read[Snapshot](
        new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
      HistoryEntry(snap.version, snap.appliedAtMs, snap.change.kind, snap.change.name)
    }
  }

  /** Registry state as of `version` in the attached store — each
    * snapshot is self-contained, so this reads exactly one file. */
  def stateAt(version: Int): FeatureRegistry = {
    val dir = store.getOrElse(throw new IllegalStateException(
      "stateAt requires an attached store (attachStore)"))
    val f = dir.resolve(f"v$version%06d.json")
    require(Files.exists(f), s"no snapshot for version $version at $f")
    val snap = Serialization.read[Snapshot](
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
    val r = new FeatureRegistry
    r.restore(snap.state)
    r
  }

  private def restore(st: State): Unit = {
    entities.clear(); sources.clear(); views.clear(); services.clear()
    st.entities.foreach(e => entities.update(e.name, e))
    st.sources.foreach(s => sources.update(s.name, s))
    st.views.foreach(v => views.update(v.name, v))
    st.services.foreach(s => services.update(s.name, s))
  }

  /** Persist the full registry as JSON (atomic rename). */
  def save(path: String): Unit =
    writeAtomic(Paths.get(path), Serialization.writePretty(stateNow))

  def load(path: String): Unit = {
    val json = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    val st = Serialization.read[State](json)
    st.entities.foreach(applyEntity)
    st.sources.foreach(applySource)
    st.views.foreach(applyView)
    st.services.foreach(applyService)
  }
}

object FeatureRegistry {
  private[registry] case class State(
      entities: Seq[EntitySpec],
      sources: Seq[SourceSpec],
      views: Seq[FeatureViewSpec],
      services: Seq[FeatureServiceSpec])
  private[registry] case class Change(kind: String, name: String)
  private[registry] case class Snapshot(
      version: Int, appliedAtMs: Long, change: Change, state: State)

  /** One audited apply: which object changed, when, at which version. */
  case class HistoryEntry(version: Int, appliedAtMs: Long, kind: String, name: String)
}

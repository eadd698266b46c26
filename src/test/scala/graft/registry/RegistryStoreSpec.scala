package graft.registry

import org.scalatest.funsuite.AnyFunSuite

import graft.spec._

/** Durable apply-history store (r4 VERDICT task #7: the reference's
  * `registry.db` durability analog, sous_chef.py:139,160,257): every
  * state-changing apply appends a self-contained versioned snapshot;
  * attach replays the latest; history is the audited change stream.
  */
class RegistryStoreSpec extends AnyFunSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-regstore").toString

  private val ent = EntitySpec("customer", "customer_id")
  private val src = SourceSpec("s", "file",
    Map("path" -> "/tmp/x.parquet", "timestamp_field" -> "ts"))
  private def view(ttl: Int) = FeatureViewSpec("v", "s", Seq("customer"), ttlDays = ttl)

  test("applies append versioned snapshots; idempotent re-apply burns no version") {
    val dir = tmpDir()
    var t = 1000L
    val r = new FeatureRegistry
    r.attachStore(dir, clock = () => { t += 1; t })
    r.applyEntity(ent)
    r.applySource(src)
    r.applyView(view(7))
    r.applyView(view(7)) // identical — no new version
    r.applyView(view(30)) // changed — new version

    val h = r.history()
    assert(h.map(e => (e.version, e.kind, e.name)) === Seq(
      (1, "entity", "customer"), (2, "source", "s"),
      (3, "view", "v"), (4, "view", "v")))
    assert(h.map(_.appliedAtMs) === Seq(1001L, 1002L, 1003L, 1004L))
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".json")) === 4)
  }

  test("restart resumes: attach replays latest state and versioning continues") {
    val dir = tmpDir()
    val r1 = new FeatureRegistry
    r1.attachStore(dir)
    r1.applyEntity(ent); r1.applySource(src); r1.applyView(view(7))

    val r2 = new FeatureRegistry
    r2.attachStore(dir)
    assert(r2.getView("v") === Some(view(7)))
    assert(r2.getEntity("customer") === Some(ent))
    r2.applyView(view(30))
    assert(r2.history().map(_.version) === Seq(1, 2, 3, 4))
    assert(r2.getView("v") === Some(view(30)))
  }

  test("stateAt reconstructs any historical registry state from one file") {
    val dir = tmpDir()
    val r = new FeatureRegistry
    r.attachStore(dir)
    r.applyEntity(ent); r.applySource(src); r.applyView(view(7)); r.applyView(view(30))
    assert(r.stateAt(3).getView("v") === Some(view(7)))
    assert(r.stateAt(4).getView("v") === Some(view(30)))
    assert(r.stateAt(2).getView("v") === None)
    assert(r.stateAt(2).getSource("s") === Some(src))
    assert(intercept[IllegalArgumentException](r.stateAt(99))
      .getMessage.contains("no snapshot"))
  }

  test("attaching a non-empty registry to an empty store bootstraps a v1 snapshot") {
    val dir = tmpDir()
    val r = new FeatureRegistry
    r.applyEntity(ent); r.applySource(src) // pre-attach, in-memory only
    r.attachStore(dir)
    assert(r.getEntity("customer") === Some(ent), "pre-attach state preserved")
    val h = r.history()
    assert(h.map(e => (e.version, e.kind, e.name)) ===
      Seq((1, "registry", "bootstrap")))
    // a restart from the store alone recovers the bootstrapped state
    val r2 = new FeatureRegistry
    r2.attachStore(dir)
    assert(r2.getSource("s") === Some(src))
    r2.applyView(view(7))
    assert(r2.history().map(_.version) === Seq(1, 2))
  }

  test("attaching a non-empty registry to a store WITH snapshots is refused") {
    val dir = tmpDir()
    val r1 = new FeatureRegistry
    r1.attachStore(dir)
    r1.applyEntity(ent)
    val r2 = new FeatureRegistry
    r2.applySource(src) // diverged in-memory state
    val ex = intercept[IllegalStateException](r2.attachStore(dir))
    assert(ex.getMessage.contains("clobber"))
    assert(r2.getSource("s") === Some(src), "refusal must not mutate either side")
    assert(r2.history().isEmpty)
  }

  test("a leftover .tmp from a crashed write is ignored on attach") {
    val dir = tmpDir()
    val r = new FeatureRegistry
    r.attachStore(dir)
    r.applyEntity(ent)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "v000002.json.tmp"),
      "{broken".getBytes("UTF-8"))
    val r2 = new FeatureRegistry
    r2.attachStore(dir)
    assert(r2.getEntity("customer") === Some(ent))
    r2.applySource(src)
    assert(r2.history().map(_.version) === Seq(1, 2))
  }
}

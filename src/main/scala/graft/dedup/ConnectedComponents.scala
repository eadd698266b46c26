package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the standard
  * canonicalization for near-duplicate clusters: every document in a
  * transitive similarity cluster maps to the cluster's minimum id, so a
  * chain A~B~C keeps exactly one representative (min id) instead of the
  * pair-local greater-id rule.
  *
  * Algorithm: min-label propagation with pointer jumping.
  * Each round
  *  1. propagates `min(label)` across edges (one hash-shuffle groupBy);
  *  2. compresses label chains with one pointer-jump join
  *     (`label := label(label)`), so a path of length L collapses in
  *     O(log L) rounds instead of L — the doubling trick of classic
  *     PRAM connectivity (cf. Kiveris et al., "Connected Components in
  *     MapReduce and Beyond", SoCC 2014, whose two-phase star operations
  *     this single-join variant approximates).
  *
  * Scale shape: every round is a constant number of key-hash shuffles
  * over the node set (never edges × nodes), labels decrease
  * monotonically toward the component minimum, and each round's result
  * is localCheckpoint'ed so plan lineage stays flat across iterations.
  * Dedup candidate graphs are near-degenerate (tiny clusters, small
  * diameter), so convergence is typically 2-3 rounds; the pointer jump
  * bounds adversarial chains at O(log diameter).
  */
object ConnectedComponents {

  /** Label every node of the (id_a, id_b) edge list with its component's
    * minimum node id. Returns (id, component).
    *
    * @param maxIter safety cap; with pointer jumping 20 rounds cover
    *                diameters beyond 2^20. Throws if not converged (a
    *                truncated labeling silently merges nothing but may
    *                leave non-minimal labels — never return one).
    */
  def label(
      edges: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col(idACol).as("src"), col(idBCol).as("dst"))
      .unionByName(edges.select(col(idBCol).as("src"), col(idACol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = true)

    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(eager = true)

    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // 1. propagate: label(v) := min(label(v), min over neighbors u of label(u))
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("_nl"))
      // carry the pre-round label as _prev so convergence is readable off
      // the checkpointed result — no dedicated compare-join/action per
      // round. Checkpointed BEFORE the pointer-jump self-join so the
      // propagation shuffle runs once, not on both sides of the join.
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("_prev"),
          least(col("label"), coalesce(col("_nl"), col("label"))).as("label"))
        .localCheckpoint(eager = true)
      // 2. pointer jump: label(v) := label(label(v)) — labels only
      // decrease (label(u) <= u for all u), so this never diverges
      val jumped = prop
        .join(prop.select(col("id").as("label"), col("label").as("_ll")),
          Seq("label"), "left")
        .select(col("id"), col("_prev"),
          coalesce(col("_ll"), col("label")).as("label"))
        .localCheckpoint(eager = true)
      converged = jumped.filter(col("label") =!= col("_prev")).isEmpty
      // free superseded checkpoints eagerly (the intermediate prop and
      // the previous round's labels) — without this a long-lived session
      // accumulates every round's blocks in the block manager
      org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(prop)
      org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(labels)
      labels = jumped.select(col("id"), col("label"))
      it += 1
    }
    require(converged,
      s"connected components did not converge within $maxIter rounds")
    // sym is consumed only inside the loop; the FINAL labels checkpoint
    // stays alive (it backs the returned DataFrame — a localCheckpoint
    // cannot be recomputed) and is reclaimed by the ContextCleaner when
    // the result goes out of scope.
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(sym)
    labels.select(col("id"), col("label").as("component"))
  }

  /** Non-canonical members: every node whose component representative is
    * a different (smaller) node — the drop set for connected-components
    * near-dup canonicalization. */
  def dropSet(
      edges: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b"): DataFrame =
    label(edges, idACol, idBCol)
      .filter(col("id") =!= col("component"))
      .select(col("id"))
}

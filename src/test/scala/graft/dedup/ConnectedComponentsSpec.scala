package graft.dedup

import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.label(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("chain A-B-C collapses to min id") {
    assert(labelsOf(Seq((1L, 2L), (2L, 3L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star: two docs sharing only a common neighbor join one component " +
    "(where pair-drop keeps both)") {
    // pairs (1,5), (2,5): pair-drop drops only 5 (greater side of both
    // pairs) keeping 1 AND 2; components canonicalization keeps min 1
    val lab = labelsOf(Seq((1L, 5L), (2L, 5L)))
    assert(lab === Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate minima") {
    val lab = labelsOf(Seq((10L, 11L), (11L, 12L), (3L, 4L), (20L, 21L)))
    assert(lab === Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      3L -> 3L, 4L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges within the iteration cap (pointer jumping)") {
    // a 300-node path needs 300 rounds under plain propagation; with the
    // pointer jump the label horizon doubles per round (2^(k+1)-2), so
    // ~8 rounds suffice — well inside maxIter = 20
    val n = 300L
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val lab = labelsOf(edges)
    assert(lab.size === n)
    assert(lab.values.forall(_ == 0L))
  }

  test("ring, reversed/duplicate edges and self-loops are handled") {
    val edges = Seq((5L, 6L), (6L, 7L), (7L, 5L), // ring
      (6L, 5L), (5L, 6L),                         // reversed + duplicate
      (9L, 9L))                                   // self-loop only: no node
    val lab = labelsOf(edges)
    assert(lab === Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("empty edge list yields an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ConnectedComponents.label(empty).count() === 0L)
  }

  test("property: random graphs match a driver-side union-find oracle") {
    // 20 seeded random graphs of mixed density; the oracle is a plain
    // union-find over the same edges
    for (seed <- 1 to 20) {
      val rng = new scala.util.Random(seed)
      val n = 5 + rng.nextInt(60)
      val m = rng.nextInt(2 * n)
      val edges = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = nodes.map { v =>
          val members = nodes.filter(u => find(u.toInt) == find(v.toInt))
          v -> members.min
        }.toMap
        assert(labelsOf(edges) === expected, s"seed=$seed n=$n m=$m")
      }
    }
  }

  test("dropSet keeps exactly the component minima") {
    val drops = ConnectedComponents
      .dropSet(Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b"))
      .as[Long].collect().sorted.toSeq
    assert(drops === Seq(2L, 3L, 8L))
  }
}

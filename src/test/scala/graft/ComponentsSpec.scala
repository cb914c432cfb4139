package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Components

/** Connected components (ext/Components): min-label propagation must
  * reach the transitive fixpoint — including labels that can only
  * travel along multi-hop chains — and leave isolated nodes as their
  * own singleton clusters.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
        nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain propagates the min label across multiple hops") {
    // path 1-2-3-4-5: label 1 needs 4 rounds to reach node 5
    val got = run(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate labels; isolated node is a singleton") {
    val got = run(Seq(1L, 2L, 3L, 10L, 11L, 99L),
      Seq((2L, 1L), (2L, 3L), (11L, 10L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("cycle and duplicate/reversed edges converge to one cluster") {
    val got = run(Seq(5L, 6L, 7L),
      Seq((5L, 6L), (6L, 5L), (6L, 7L), (7L, 5L), (5L, 6L)))
    assert(got === Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("no edges at all leaves every node canonical") {
    val got = run(Seq(3L, 1L, 2L), Seq.empty)
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("edges referencing nodes absent from the node list still cluster them") {
    // nearDupPairs can emit edges for docs filtered out of the node
    // frame by an upstream guard; the union in the label table must not
    // drop them
    val got = run(Seq(1L, 2L), Seq((2L, 7L)))
    assert(got(1L) === 1L)
    assert(got(2L) === 2L)
    assert(got(7L) === 2L)
  }

  test("a node-frame-absent endpoint bridges a multi-hop chain") {
    // node 3 exists only as an edge endpoint but is the middle of the
    // 5-3-1 chain: label 1 must cross it, needing >1 round — a
    // convergence check that ignores first-seen ids stops too early
    // and leaves 5 labelled 5
    val got = run(Seq(1L, 5L), Seq((5L, 3L), (3L, 1L)))
    assert(got === Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("a node-frame-absent endpoint can be the component minimum") {
    // id 0 never appears in the node frame; its own id must still seed
    // the label pool per the min-reachable-id contract
    val got = run(Seq(5L, 7L), Seq((5L, 0L), (0L, 7L)))
    assert(got === Map(0L -> 0L, 5L -> 0L, 7L -> 0L))
  }

  test("property: random graphs match an in-memory union-find reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val nodes = (1L to n.toLong).toSeq
      val edges = Seq.fill(n / 2)(
        (rnd.between(1L, n + 1L), rnd.between(1L, n + 1L)))
        .filter { case (a, b) => a != b }
      // reference: classic union-find, then canonical = min id per root
      val parent = scala.collection.mutable.Map(nodes.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val expected = {
        val minOfRoot = nodes.groupBy(find).map { case (r, ms) => r -> ms.min }
        nodes.map(i => i -> minOfRoot(find(i))).toMap
      }
      assert(run(nodes, edges) === expected, s"trial $trial (n=$n)")
    }
  }

  test("hitting maxIter without a fixpoint throws instead of returning wrong labels") {
    // a 6-node path needs 5 rounds; cap at 2
    val nodes = (1L to 6L)
    val edges = (1L to 5L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      Components.connectedComponents(
        nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}

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
}

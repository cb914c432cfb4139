package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Components, Sampling}

/** Group-aware splitting (the x39 operator): hashing the near-dup
  * CLUSTER id instead of the doc id guarantees no pair of connected
  * docs ever straddles the train/holdout boundary — the property
  * x38's audit shows doc-hash splitting violates.
  */
class GroupSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no edge crosses the split when membership hashes the cluster id") {
    // 200 nodes; edges chain consecutive ids within groups of 3 —
    // clusters {0,1,2}, {3,4,5}, … some spanning the hash boundary
    val nodes = spark.range(0, 200).toDF("doc_id")
    val edges = spark.range(0, 200).toDF("a")
      .filter(pmod($"a", lit(3L)) =!= 2L && $"a" < 199L)
      .select($"a".as("id_a"), ($"a" + 1).as("id_b"))
    val comp = Components.connectedComponents(nodes, "doc_id", edges, "id_a", "id_b")
    val split = comp.withColumn("split",
      Sampling.holdoutSplit($"cluster_id", 200))

    // doc-hash splitting DOES leak on this graph (sanity that the
    // property is non-trivial) …
    val docLeaks = edges
      .withColumn("sa", Sampling.holdoutSplit($"id_a", 200))
      .withColumn("sb", Sampling.holdoutSplit($"id_b", 200))
      .filter($"sa" =!= $"sb").count()
    assert(docLeaks > 0, "expected the doc-hash split to leak on chained clusters")

    // … while cluster-hash splitting cannot: join each edge to both
    // endpoints' assignments and demand equality
    val assign = split.select($"doc_id", $"split")
    val crossing = edges
      .join(assign.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "sa"), "id_a")
      .join(assign.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "sb"), "id_b")
      .filter($"sa" =!= $"sb")
    assert(crossing.isEmpty, "a connected pair straddled the split")

    // both splits are non-degenerate
    val sizes = split.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(sizes.getOrElse("train", 0L) > 0L && sizes.getOrElse("holdout", 0L) > 0L)
  }
}

package graft.resolve

import graft.SparkTestBase

class DocClusterSpec extends SparkTestBase {
  import spark.implicits._

  test("connected components: chains merge transitively, components stay separate") {
    // 1-2-3-4 chain, {10,11}, {20,21,22} via shared hub
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val cc = DocCluster.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
  }

  test("long chain converges within the iteration cap") {
    val edges = (1L until 15L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = DocCluster.connectedComponents(edges, maxIter = 20).collect()
    assert(cc.forall(_.getLong(1) == 1L))
  }

  test("star edges per dup-group are linear in group size and cluster identically") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // dd11's edge construction: node -> group-min, NOT all-pairs. A
    // 6-member group must emit exactly 5 edges (g-1), and the components
    // must equal the all-pairs clustering.
    val keyed = Seq(
      (1L, "k1"), (2L, "k1"), (3L, "k1"), (4L, "k1"), (5L, "k1"), (6L, "k1"),
      (10L, "k2"), (11L, "k2"), (20L, "k3")).toDF("doc_id", "k")
    val star = keyed
      .withColumn("root", min(col("doc_id")).over(Window.partitionBy("k")))
      .filter(col("doc_id") =!= col("root"))
      .select(col("root").as("a"), col("doc_id").as("b"))
    assert(star.count() == 5 + 1) // g-1 per group; singleton k3 emits none
    val cc = DocCluster.connectedComponents(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L).forall(cc(_) == 10L))
    assert(!cc.contains(20L)) // no edges -> not in any multi-node cluster
  }
}

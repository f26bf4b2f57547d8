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
}

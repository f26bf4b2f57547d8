package graft.resolve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive dedup clustering: pairwise near-dup edges → connected
  * components, so each duplicate group gets one canonical id (min doc id
  * in the component) — the step production dedup needs after MinHash/LSH
  * pair detection (dd2), and the Spark-iterative analog of a recursive
  * CTE.
  *
  * Min-label propagation converges in O(component diameter) rounds; each
  * round is one equi-join + groupBy-min — all shuffles on the node key,
  * no driver-side graph. Near-dup components are shallow (dozens of
  * docs), so maxIter is a backstop, not a tuning knob.
  */
object DocCluster {

  /** @param edges two-column frame (a, b); undirected.
    * @return (node, cluster) where cluster = min node id reachable. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val a = edges.columns(0); val b = edges.columns(1)
    // repartition on the join key BEFORE caching: the cached relation
    // then carries hashpartitioning(src), so every round's edge⋈label
    // join reads it exchange-free instead of re-shuffling the edge table
    // once per iteration.
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct().repartition(col("src")).cache()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("cluster", col("node")).cache()
    val sc = edges.sparkSession.sparkContext
    var converged = false
    var i = 0
    // Convergence check without a per-round join: min-label propagation
    // only ever LOWERS a node's cluster id, so sum(cluster) strictly
    // decreases on any change and is stable exactly at the fixpoint. One
    // cheap aggregate over the freshly-checkpointed round replaces the
    // next-vs-previous anti-join the loop used to pay each iteration.
    // DECIMAL(38,0) so a 100 TB node-id space cannot overflow the sum.
    var prevSum: Option[String] = None
    // RDD ids of the previous round's localCheckpoint: Dataset.unpersist
    // is a CacheManager no-op for checkpointed datasets, so their pinned
    // blocks must be dropped through the SparkContext registry — leaking
    // one persisted RDD per round keeps O(iterations) copies of the label
    // table in executor memory for the rest of the application.
    var prevRoundIds: scala.collection.Set[Int] = Set.empty[Int]
    while (!converged && i < maxIter) {
      val propagated = sym.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("cluster"))
      // pointer jumping: also propagate each node's label THROUGH its
      // current cluster representative (label-of-label). Plain min-label
      // needs O(diameter) rounds — star edges deliberately lengthen
      // chains (node→group-min→variant), so diameter, not edge count, was
      // the round driver; with the doubling step convergence is
      // O(log diameter) and each saved round saves a full fixed-cost
      // join+checkpoint cycle.
      val jumped = labels.select(col("node").as("jn"), col("cluster").as("jc"))
        .join(labels, col("jc") === col("node"))
        .select(col("jn").as("node"), col("cluster"))
      // localCheckpoint (not cache): truncates the lineage each round —
      // otherwise the plan grows exponentially with iterations and the
      // optimizer itself OOMs on long chains. Eager: materialized here.
      val before = sc.getPersistentRDDs.keySet
      val next = labels.unionByName(propagated).unionByName(jumped)
        .groupBy("node").agg(min(col("cluster")).as("cluster"))
        .localCheckpoint()
      val thisRoundIds = sc.getPersistentRDDs.keySet.diff(before)
      val s = next.agg(sum(col("cluster").cast("decimal(38,0)")).cast("string"))
        .first().getString(0)
      converged = prevSum.contains(s)
      prevSum = Some(s)
      // `next` no longer depends on the previous round — drop its blocks
      labels.unpersist() // frees the initial .cache() on round 0
      prevRoundIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevRoundIds = thisRoundIds
      labels = next
      i += 1
    }
    sym.unpersist()
    // the final round's checkpoint stays pinned — it IS the result; the
    // caller (or Bench's between-query cleanup) releases it after use
    labels
  }
}

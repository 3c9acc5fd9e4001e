package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering core behind near-dup removal (Dedup.removeNearDuplicates)
  * exposed as its own operator, because training pipelines also need it for
  * URL-graph grouping, cross-source entity merging, and cluster-capped
  * sampling.
  *
  * Shape per round: one equi-join (edges ⋈ labels) + one hash aggregation —
  * no driver-side graph state ever; each round propagates the minimum label
  * one hop, with an early exit when no label moves. Cluster diameters in
  * dedup/entity workloads are tiny (near-cliques), so rounds ≈ 2-3; the cap
  * is a safety valve and logs if it is ever hit while still converging.
  *
  * At 100 TB: labels and edges shuffle on the node id — the same key both
  * sides, so the per-round exchange is stable and AQE coalesces it; the
  * edge cache holds (id, id) longs only.
  */
object Graph {

  /** @param nodes one row per node id (dataframe with `idCol`)
    * @param edges undirected edge list (`srcCol`, `dstCol`) — orientation
    *   is normalized internally
    * @param rounds when non-null, receives the number of propagation rounds
    *   actually run (incl. the final no-change round) — scale receipts
    *   record it alongside timings (SCALE.md)
    * @return (id, comp) — comp is the minimum node id of the component
    */
  def connectedComponents(
      nodes: DataFrame, idCol: Column,
      edges: DataFrame, srcCol: Column, dstCol: Column,
      maxIterations: Int = 25,
      rounds: java.util.concurrent.atomic.AtomicInteger = null): DataFrame = {
    val directed = edges.select(srcCol.as("id_a"), dstCol.as("id_b"))
    val bidir = directed
      .unionByName(directed.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .persist()
    var labels = nodes.select(idCol.as("id")).withColumn("comp", col("id"))
    var persisted: DataFrame = null // the one iteration cache currently held
    var iter = 0
    var changed = 1L
    while (iter < maxIterations && changed > 0) {
      val neighborMin = bidir
        .join(labels.withColumnRenamed("id", "id_b").withColumnRenamed("comp", "n_comp"),
          Seq("id_b"))
        .groupBy(col("id_a").as("id"))
        .agg(min(col("n_comp")).as("min_n_comp"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("min_n_comp"), col("comp"))).as("comp"),
          (col("min_n_comp") < col("comp")).as("__changed"))
      updated.persist()
      changed = updated.filter(col("__changed")).count()
      if (persisted != null) persisted.unpersist()
      persisted = updated
      labels = updated.drop("__changed")
      iter += 1
    }
    if (rounds != null) rounds.set(iter)
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents: min-label propagation still moving after " +
          s"$maxIterations iterations ($changed labels changed) — a component " +
          s"with diameter > $maxIterations exists; raise maxIterations")
    // Lineage-truncating materialization so callers can drop the iteration
    // cache; blocks release via the ContextCleaner once unreferenced.
    val out = labels.localCheckpoint()
    if (persisted != null) persisted.unpersist()
    bidir.unpersist()
    out
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Materialize

/** Connected components over an edge list — the clustering step real
  * dedup pipelines need (pairwise near-dup hits chain: A~B, B~C puts A
  * and C in one duplicate group even when A~C was never emitted).
  *
  * Algorithm: iterative min-label propagation over the EDGE-INCIDENT
  * vertices only. In a deduped corpus the overwhelming majority of
  * vertices touch no edge at all; they can never change label, so
  * iterating over them is pure waste — each is its own singleton
  * component (`cluster_id = id`), attached with one anti-join at the
  * end. The propagation loop therefore runs on a table bounded by
  * 2·|edges| distinct ids, not |vertices|: at 100 TB that is the
  * difference between joining a few hundred million near-dup ids per
  * round and joining the whole corpus per round.
  *
  * Each round is one shuffle (edge join + min aggregate); convergence
  * in O(component diameter) rounds — near-dup components are shallow
  * (cliques and short chains), so 3-5 rounds typically suffice;
  * `maxIter` bounds the worst case. Lineage is cut per round with
  * [[graft.Materialize.cut]] (localCheckpoint by default; reliable
  * `checkpoint()` under `spark.graft.reliableCheckpoint=true`) so
  * plans don't grow unboundedly and a cluster job can survive executor
  * loss — the standard Spark iterative-DataFrame pattern.
  */
object Components {

  /** @param vertices one column `idCol`
    * @param edges    two columns (id_a, id_b), undirected
    * @return (idCol, cluster_id) — cluster_id = min vertex id of the
    *         component
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      idCol: String,
      maxIter: Int = 20): DataFrame = {
    // materialize the edge list once — it re-enters the plan every
    // round, and its lineage may be an expensive pipeline (minhash
    // candidate generation); without the checkpoint each iteration and
    // each convergence check re-executes that whole upstream plan
    val sym = Materialize.cut(
      edges.select(col("id_a").as("__src"), col("id_b").as("__dst"))
        .unionByName(edges.select(col("id_b").as("__src"), col("id_a").as("__dst"))))
    // only vertices incident to >=1 edge can ever change label; the
    // semi-join against the vertex set keeps the old contract that
    // edges mentioning unknown ids neither label them nor route
    // propagation through them
    val active = Materialize.cut(
      vertices.select(col(idCol).as("__id"))
        .join(sym.select(col("__src").as("__id")).distinct(),
          Seq("__id"), "left_semi"))
    var labels = active.select(col("__id"), col("__id").as("__label"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("__id").as("__dst"), col("__label")), Seq("__dst"))
        .groupBy(col("__src"))
        .agg(min(col("__label")).as("__nbr"))
      // one pass computes the new label AND whether it moved — the
      // convergence check costs a filter on the checkpointed result,
      // not a second join against the previous labels
      val next = Materialize.cut(labels
        .join(nbrMin.select(col("__src").as("__id"), col("__nbr")), Seq("__id"), "left")
        .select(col("__id"),
          least(col("__label"), coalesce(col("__nbr"), col("__label")))
            .as("__label"),
          (col("__nbr").isNotNull && col("__nbr") < col("__label"))
            .as("__moved")))
      val changed = next.filter(col("__moved")).count()
      labels = next.select(col("__id"), col("__label"))
      converged = changed == 0
      i += 1
    }
    // partially-propagated labels are silently WRONG (one component
    // reported as several) — refuse to return them
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds — " +
        "a component's diameter exceeds maxIter; raise maxIter")
    // isolated vertices: singleton components, never iterated over
    val isolated = vertices.select(col(idCol).as("__id"))
      .join(active, Seq("__id"), "left_anti")
      .select(col("__id").as(idCol), col("__id").as("cluster_id"))
    labels.select(col("__id").as(idCol), col("__label").as("cluster_id"))
      .unionByName(isolated)
  }

  /** Incremental connected components: fold a batch of NEW edges into
    * a FROZEN label table without re-running CC over the corpus — the
    * continual-crawl shape ([[graft.operators.TextDedup]]'s
    * incremental probes, `streaming.ContinualDedup`) for the
    * clustering step itself. A component labeled by its min vertex id
    * is fully described by that label, so merging is decided on the
    * COMPONENT GRAPH: map each new edge to its endpoints' labels
    * (unknown endpoints label themselves), run [[connectedComponents]]
    * on that label graph — whose size is bounded by the BATCH, not the
    * corpus — and apply the resulting old-label → merged-label map
    * back with one broadcast join. Exact: the merged set's min vertex
    * id is the min over member labels, so the output row-equals a
    * from-scratch CC over (old components' structure ∪ new edges) —
    * spec-pinned, and harness q396 pins it against the full recursive
    * oracle.
    *
    * Per-batch cost: two |batch|-sized joins to label endpoints, CC on
    * a batch-bounded graph, one broadcast relabel join over the label
    * table (one pass, no iteration touches corpus-sized data).
    *
    * @param labels frozen (idCol, cluster_id) with cluster_id = min
    *               member id — [[connectedComponents]] output
    * @param newEdges (id_a, id_b), undirected; endpoints need not be
    *                 in `labels` (new vertices join/form components)
    * @return updated (idCol, cluster_id): every `labels` row
    *         (relabeled where merged) plus every new endpoint
    */
  def incrementalComponents(
      labels: DataFrame,
      newEdges: DataFrame,
      idCol: String,
      maxIter: Int = 20): DataFrame = {
    val lab = labels.select(col(idCol).as("__id"),
      col("cluster_id").as("__lab"))
    val e = Materialize.cut(
      newEdges.select(col("id_a"), col("id_b")))
    val endpoints = e.select(col("id_a").as("__id"))
      .unionByName(e.select(col("id_b").as("__id"))).distinct()
    val endLab = Materialize.cut(endpoints
      .join(lab, Seq("__id"), "left")
      .select(col("__id"), coalesce(col("__lab"), col("__id")).as("__lab")))
    val labEdges = e
      .join(endLab.select(col("__id").as("id_a"), col("__lab").as("__la")),
        Seq("id_a"))
      .join(endLab.select(col("__id").as("id_b"), col("__lab").as("__lb")),
        Seq("id_b"))
      .select(col("__la").as("id_a"), col("__lb").as("id_b"))
    val merged = connectedComponents(
      endLab.select(col("__lab").as("v")).distinct(), labEdges, "v", maxIter)
    // only labels that actually move ride in the broadcast map
    val remap = broadcast(merged.filter(col("v") =!= col("cluster_id"))
      .select(col("v").as("__lab"), col("cluster_id").as("__new")))
    val updated = lab.join(remap, Seq("__lab"), "left")
      .select(col("__id"), coalesce(col("__new"), col("__lab")).as("__lab"))
    val newRows = endLab.join(lab.select(col("__id")), Seq("__id"), "left_anti")
      .join(remap, Seq("__lab"), "left")
      .select(col("__id"), coalesce(col("__new"), col("__lab")).as("__lab"))
    updated.unionByName(newRows)
      .select(col("__id").as(idCol), col("__lab").as("cluster_id"))
  }
}

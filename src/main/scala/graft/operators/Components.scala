package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step real
  * dedup pipelines need (pairwise near-dup hits chain: A~B, B~C puts A
  * and C in one duplicate group even when A~C was never emitted).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with its own id; each round every vertex takes the minimum
  * of its label and its neighbors' labels; convergence in O(component
  * diameter) rounds. Near-dup components are shallow (cliques and
  * short chains), so 3-5 rounds typically suffice; `maxIter` bounds
  * the worst case. Each round is one shuffle (edge join + min
  * aggregate); lineage is cut per round with localCheckpoint so plans
  * don't grow unboundedly — the standard Spark iterative-DataFrame
  * pattern.
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
    val sym = edges.select(col("id_a").as("__src"), col("id_b").as("__dst"))
      .unionByName(edges.select(col("id_b").as("__src"), col("id_a").as("__dst")))
      .localCheckpoint(true)
    var labels = vertices.select(col(idCol).as("__id"), col(idCol).as("__label"))
      .localCheckpoint(true)
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
      val next = labels
        .join(nbrMin.select(col("__src").as("__id"), col("__nbr")), Seq("__id"), "left")
        .select(col("__id"),
          least(col("__label"), coalesce(col("__nbr"), col("__label")))
            .as("__label"),
          (col("__nbr").isNotNull && col("__nbr") < col("__label"))
            .as("__moved"))
        .localCheckpoint(true)
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
    labels.select(col("__id").as(idCol), col("__label").as("cluster_id"))
  }
}

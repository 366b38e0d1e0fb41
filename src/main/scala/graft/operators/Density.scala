package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density estimation over an embedding column — the DBSCAN
  * core-point primitive (how many neighbors within eps?) computed
  * without an all-pairs join: project to a low dimension
  * ([[Similarity.projectRandom]], the same deterministic JL planes the
  * ANN family uses), snap points to an eps-sized integer grid, and
  * score each point only against its 3x3 cell neighborhood — every
  * point within eps of a cell lies in one of its 8 surrounding cells
  * or the cell itself, so the neighborhood join is exact over the
  * projected space while candidate volume stays (points per cell)²
  * per cell instead of n².
  *
  * Scale shape: the grid key is dense and data-adaptive (cells only
  * exist where points do), the join shuffles ids + 2 doubles, and a
  * skewed cell (dense cluster) degrades to that cell's local
  * quadratic only. The classic follow-up — full DBSCAN labels — is
  * core-points + [[Components.connectedComponents]] over the
  * eps-neighbor edges this operator already materializes internally.
  */
object Density {

  /** Per-point eps-neighbor count and core flag over the seeded 2-D
    * projection. Output: (idCol, x, y, n_neighbors, is_core) — x/y
    * floor-snapped at 1e9, neighbor counts exact integers (the
    * decimal-summed projection makes both engine-portable).
    */
  def gridCorePoints(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps: Double,
      minPts: Int,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val proj = Similarity.projectRandom(df, idCol, vecCol,
      outDim = 2, dim = dim, seed = seed)
    val pts = proj.groupBy(col(idCol))
      .agg(
        max(when(col("d") === 0, col("value"))).as("x"),
        max(when(col("d") === 1, col("value"))).as("y"))
      .withColumn("__cx", floor(col("x") / lit(eps)).cast("long"))
      .withColumn("__cy", floor(col("y") / lit(eps)).cast("long"))
    val a = pts.select(col(idCol).as("id_a"), col("x").as("__xa"),
      col("y").as("__ya"), col("__cx"), col("__cy"))
    // replicate side b into its 9 surrounding cells; each true
    // neighbor pair matches on exactly one (shifted cell = a's cell)
    // key, so no post-join distinct is needed
    val shifts = df.sparkSession
      .createDataFrame(for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy))
      .toDF("__dx", "__dy")
    val b = pts.crossJoin(broadcast(shifts))
      .select(col(idCol).as("id_b"), col("x").as("__xb"),
        col("y").as("__yb"),
        (col("__cx") + col("__dx")).as("__cx"),
        (col("__cy") + col("__dy")).as("__cy"))
    val eps2 = eps * eps
    val neighbors = a.join(b, Seq("__cx", "__cy"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(
        (col("__xa") - col("__xb")) * (col("__xa") - col("__xb"))
          + (col("__ya") - col("__yb")) * (col("__ya") - col("__yb"))
          <= lit(eps2))
      .groupBy(col("id_a"))
      .agg(count(lit(1)).as("n_neighbors"))
    pts.select(col(idCol), col("x"), col("y"))
      .join(neighbors.withColumnRenamed("id_a", idCol), Seq(idCol), "left")
      .select(col(idCol),
        (floor(col("x") * 1e9) / 1e9).as("x"),
        (floor(col("y") * 1e9) / 1e9).as("y"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        (coalesce(col("n_neighbors"), lit(0L)) >= minPts).as("is_core"))
  }
}

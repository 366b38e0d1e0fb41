package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means with EXPLICIT initial centroids and a
  * fixed round count — the missing producer for the explicit-centroid
  * consumers ([[Similarity.ivfSearchTopK]], [[Similarity.semanticDedup]],
  * [[Similarity.semanticDedupAgainst]]): fit on a sample or a full pass
  * here, then route every ANN / semantic-dedup query through the frozen
  * table. Unlike Spark ML's `KMeans` (seeded sampling init, convergence-
  * dependent iteration count, vector UDTs), every step is deterministic
  * dataframe algebra, so the whole fit replays exactly in any engine:
  *
  *   - assign: squared-L2 distance accumulated in DECIMAL(30,18) over
  *     per-dimension double terms (order-independent fold — the
  *     [[Similarity]] dot-product discipline), argmin broken by lowest
  *     centroid id;
  *   - update: per-cell per-dimension mean = exact decimal sum / count,
  *     divided in double and rounded to 12 decimals (the
  *     [[Similarity.labelCentroids]] discipline — a last-ulp
  *     decimal-to-double cast difference between engines would
  *     otherwise compound round over round); empty cells keep their
  *     previous centroid;
  *   - rounds are FIXED (static stage graph, AQE-plannable) and each
  *     round ends in a [[graft.Materialize.cut]] so lineage stays
  *     bounded.
  *
  * Scale shape: the data-sized table is exploded once to (id, dim, x)
  * and materialized; each round is {broadcast centroid join + two hash
  * aggregates + one window over k rows per id}. Only ids, dimension
  * indexes and scalars shuffle — never whole vectors. k and dim are
  * assumed small (the broadcast side is k x dim rows); the data side
  * streams.
  */
object Clustering {

  /** Exploded (id, __d, __x) view of a vector column, dims 0-based. */
  private def dimTable(df: DataFrame, idCol: String, vecCol: String)
    : DataFrame =
    df.select(col(idCol).as("__id"), posexplode(col(vecCol)))
      .select(col("__id"), col("pos").as("__d"),
        col("col").cast("double").as("__x"))

  /** (id, vec) view with the same row exclusion the dim explode had:
    * null/empty vectors produce no dims, so they were never assigned.
    */
  private def vecTable(df: DataFrame, idCol: String, vecCol: String)
    : DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).as("__id"), col(vecCol).as("__vv"))

  /** Nearest-centroid assignment of each id against an exploded
    * centroid table (cid, __d, __c): returns (__id, cid, __d2) with
    * __d2 the exact decimal squared-L2 distance of the winning cell.
    *
    * IN-ROW since round 13: the per-round hot stage was rows·dim·k
    * joined rows through a decimal HashAggregate (~1.5 s single-task
    * per round at sf0.1); now each (row, centroid) pair is ONE
    * codegen'd [[graft.functions.ExactL2DistExpr]] call — same
    * quantized terms, exact sum and null-term skipping as the exploded
    * join, so __d2 and the (distance asc, cid asc) argmin are
    * identical (ragged rows pair over the shared dim prefix via the
    * slice guard = the old per-dim equi-join intersection). Centroids
    * re-assemble into a broadcast k-row array table — k·dim is tiny by
    * contract.
    */
  private def assign(vecs: DataFrame, cent: DataFrame): DataFrame = {
    val centArr = broadcast(cent.groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("__d"), col("__c")))),
        s => s.getField("__c")).as("__cv")))
    val mLen = least(size(col("__vv")), size(col("__cv")))
    val d2 = when(size(col("__vv")) === size(col("__cv")),
      graft.functions.Native.exactL2(col("__vv"), col("__cv")))
      .otherwise(graft.functions.Native.exactL2(
        slice(col("__vv"), lit(1), mLen), slice(col("__cv"), lit(1), mLen)))
    vecs.crossJoin(centArr)
      .select(col("__id"), col("cid"), d2.as("__d2"))
      .groupBy(col("__id"))
      .agg(min(struct(col("__d2"), col("cid"))).as("__b"))
      .select(col("__id"), col("__b.cid").as("cid"),
        col("__b.__d2").as("__d2"))
  }

  /** Lloyd k-means: `rounds` rounds of assign + decimal-exact mean
    * update from `init` (cid, cvec array). Returns the final centroids
    * exploded as (cid, dim, coord) — feed through
    * [[assembleCentroids]] for the array form the ANN operators take.
    */
  def lloydKMeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      init: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // dims feed the decimal-exact mean updates (member-count-sized);
    // the hot assignment stage reads whole vectors through the in-row
    // L2 kernel instead
    val dims = graft.Materialize.cut(dimTable(df, idCol, vecCol))
    val vecs = graft.Materialize.cut(vecTable(df, idCol, vecCol))
    var cent = init
      .select(col("cid"), posexplode(col("cvec")))
      .select(col("cid"), col("pos").as("__d"),
        col("col").cast("double").as("__c"))
    for (_ <- 1 to rounds) {
      val a = assign(vecs, cent)
      val upd = dims
        .join(a.select(col("__id"), col("cid")), Seq("__id"))
        .groupBy(col("cid"), col("__d"))
        .agg(round(sum(col("__x").cast("decimal(30,18)")).cast("double")
          / count(lit(1)), 12).as("__cnew"))
      cent = graft.Materialize.cut(
        cent.join(upd, Seq("cid", "__d"), "left")
          .select(col("cid"), col("__d"),
            coalesce(col("__cnew"), col("__c")).as("__c")))
    }
    cent.select(col("cid"), col("__d").cast("long").as("dim"),
      col("__c").as("coord"))
  }

  /** Final assignment audit over a fitted centroid table (the
    * [[lloydKMeans]] output shape): per cell, member count and exact
    * decimal inertia (sum of squared distances).
    */
  def kmeansCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    val cent = centroids.select(col("cid"), col("dim").as("__d"),
      col("coord").as("__c"))
    assign(vecTable(df, idCol, vecCol), cent)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("__d2")).cast("double"), 12).as("inertia"))
  }

  /** (cid, dim, coord) -> (cell, cvec array<double>), the shape
    * [[Similarity.ivfSearchTopK]] and the semantic-dedup family take.
    */
  def assembleCentroids(centroids: DataFrame): DataFrame =
    centroids.groupBy(col("cid").as("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("coord")))),
        s => s.getField("coord")).as("cvec"))
}

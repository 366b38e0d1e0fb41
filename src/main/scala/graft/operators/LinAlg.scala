package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed dense linear algebra over an embedding column
  * (`array<float>`): Gram matrix X'X and the covariance matrix, the two
  * statistics PCA / whitening / ZCA pipelines need before any
  * driver-side eigen step (the d x d result is tiny; the n x d input is
  * the 100 TB part).
  *
  * Scale shape: each row expands IN-ROW to its d(d+1)/2 upper-triangle
  * products, and the explode feeds straight into the partial hash
  * aggregate inside the same whole-stage-codegen task — the O(n * d^2)
  * product stream never hits the network. The shuffle carries only
  * numPartitions * d(d+1)/2 partial sums, and the result is d(d+1)/2
  * rows regardless of n. (This is the DataFrame-native equivalent of
  * MLlib RowMatrix.computeGramianMatrix's treeAggregate, but it keeps
  * the exact-decimal parity discipline the harness oracles need.)
  *
  * Numeric discipline: float * float is exact in double (24+24 bits
  * fit 53); each product is cast to DECIMAL(30,18) once and summed
  * exactly (order-independent), then surfaced as double.
  */
object LinAlg {

  /** Upper triangle of the Gram matrix: one row per (i, j), i <= j,
    * with `dot` = sum over rows of vec[i] * vec[j]. `dim` must be the
    * (fixed) vector length.
    */
  def gramMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val pairs = expr(
      s"""flatten(transform(sequence(0, ${dim - 1}), i ->
         |  transform(sequence(i, ${dim - 1}), j ->
         |    named_struct(
         |      'i', i, 'j', j,
         |      'p', CAST(CAST($vecCol[i] AS DOUBLE) * CAST($vecCol[j] AS DOUBLE)
         |             AS DECIMAL(30,18))))))""".stripMargin)
    df.select(explode(pairs).as("pr"))
      .groupBy(col("pr.i").as("i"), col("pr.j").as("j"))
      .agg(sum(col("pr.p")).as("__s"))
      .select(col("i"), col("j"), col("__s").cast("double").as("dot"))
  }

  /** Per-dimension exact sums: (i, sx DECIMAL, n). Internal building
    * block for the covariance; same in-row explode + tiny shuffle
    * shape as [[gramMatrix]].
    */
  private def dimSums(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val terms = expr(
      s"""transform(sequence(0, ${dim - 1}), i ->
         |  named_struct('i', i,
         |    'x', CAST(CAST($vecCol[i] AS DOUBLE) AS DECIMAL(30,18))))""".stripMargin)
    df.select(explode(terms).as("t"))
      .groupBy(col("t.i").as("i"))
      .agg(sum(col("t.x")).as("sx"), count(lit(1)).as("n"))
  }

  /** Upper triangle of the (population, 1/n) covariance matrix:
    * cov_ij = sxy/n - (sx/n)(sy/n), assembled from the exact decimal
    * Gram and per-dimension sums with the double arithmetic done in a
    * single fixed expression order, so the result hash-pins across
    * engines and partitionings. The two per-dimension joins broadcast
    * (d rows each).
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val gram = gramMatrix(df, vecCol, dim)
    val sums = dimSums(df, vecCol, dim)
    val si = broadcast(sums.select(col("i"), col("sx").as("__sxi"), col("n")))
    val sj = broadcast(sums.select(col("i").as("j"), col("sx").as("__sxj")))
    gram.join(si, Seq("i")).join(sj, Seq("j"))
      .select(col("i"), col("j"),
        round(
          col("dot") / col("n")
            - (col("__sxi").cast("double") / col("n"))
              * (col("__sxj").cast("double") / col("n")),
          12).as("cov"))
  }

  /** Per-dimension mean vector (i, mean): exact decimal sum over
    * exact count, divided once in double.
    */
  def meanVector(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    dimSums(df, vecCol, dim)
      .select(col("i"),
        round(col("sx").cast("double") / col("n"), 12).as("mean"))

  /** Top eigenvector of a symmetric matrix given as its upper
    * triangle (i, j, value) — power iteration with a fixed round
    * count, entirely relational: each round is one broadcast
    * equi-join (the d-row vector onto the d^2-row matrix) + one hash
    * aggregate. With the d x d covariance as input this completes the
    * PCA path: covariance reduce (n-scaled) + driver-free principal
    * direction.
    *
    * Every sum that is order-sensitive in double (the matvec entries,
    * the squared norm) accumulates in DECIMAL(38,18), so the result
    * is bit-stable under any partitioning and replays in SQL.
    * Returns (i, v, eigval): the unit eigenvector after `rounds`
    * iterations and the Rayleigh estimate (the last matvec's norm,
    * same value on every row).
    */
  def powerIteration(
      upperTri: DataFrame, iCol: String, jCol: String, valCol: String,
      dim: Int, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds out of range: $rounds")
    val full = upperTri.select(col(iCol).as("i"), col(jCol).as("j"),
      col(valCol).as("a"))
      .unionAll(upperTri.where(col(iCol) =!= col(jCol))
        .select(col(jCol).as("i"), col(iCol).as("j"), col(valCol).as("a")))
    val spark = upperTri.sparkSession
    var v: DataFrame = spark.range(dim)
      .select(col("id").cast("int").as("j"), lit(1.0).as("v"))
    var lastNorm: DataFrame = null
    for (_ <- 1 to rounds) {
      val mv = full.join(broadcast(v), Seq("j"))
        .groupBy(col("i"))
        .agg(sum((col("a") * col("v")).cast("decimal(38,18)"))
          .cast("double").as("u"))
      val norm = mv.agg(
        sqrt(sum((col("u") * col("u")).cast("decimal(38,18)"))
          .cast("double")).as("nrm"))
      lastNorm = norm
      v = mv.crossJoin(broadcast(norm))
        .select(col("i").as("j"), (col("u") / col("nrm")).as("v"))
    }
    v.select(col("j").as("i"), col("v"))
      .crossJoin(broadcast(lastNorm))
      .select(col("i"), round(col("v"), 12).as("v"),
        round(col("nrm"), 12).as("eigval"))
  }
}

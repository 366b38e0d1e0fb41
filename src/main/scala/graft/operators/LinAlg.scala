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
    * (fixed) vector length. Round 13: computed by the single-pass
    * [[graft.functions.GramAgg]] — bit-identical sums (same decimal
    * quantization per product, exact 128-bit accumulate) without
    * exploding n·d(d+1)/2 interpreted structs through a 2080-group
    * HashAggregate; the shuffle carries one ~50 KB buffer per map
    * task instead of per-pair decimal rows.
    */
  def gramMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    df.agg(graft.functions.Native.gramAgg(col(vecCol), dim).as("__g"))
      .select(inline(col("__g")))
  }

  /** Per-dimension exact sums: (i, sx DECIMAL, n). Internal building
    * block for the covariance; single-pass
    * [[graft.functions.DimSumsAgg]] (round 13), same values as the old
    * explode + per-dim decimal sum.
    */
  private def dimSums(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.agg(graft.functions.Native.dimSumsAgg(col(vecCol), dim).as("__t"))
      .select(inline(col("__t")))

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
      dim: Int, rounds: Int, varyStart: Boolean = false): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds out of range: $rounds")
    // materialize the mirrored matrix once: it re-enters the plan every
    // round, and its lineage may be an expensive reduce (the covariance
    // aggregate) — uncut, each round re-embedded and re-paid it
    val full = graft.Materialize.cut(
      upperTri.select(col(iCol).as("i"), col(jCol).as("j"),
        col(valCol).as("a"))
        .unionAll(upperTri.where(col(iCol) =!= col(jCol))
          .select(col(jCol).as("i"), col(iCol).as("j"), col(valCol).as("a"))))
    val spark = upperTri.sparkSession
    // varyStart = v0_j = 1 + j: a start vector that is orthogonal to
    // (almost) nothing — required after deflation, where the all-ones
    // start may be exactly the killed direction (A2 · v1 = 0)
    var v: DataFrame = spark.range(dim)
      .select(col("id").cast("int").as("j"),
        (if (varyStart) lit(1.0) + col("id").cast("double")
         else lit(1.0)).as("v"))
    var lastNorm: DataFrame = null
    for (_ <- 1 to rounds) {
      // cut per round (the louvainAscent discipline): without it the
      // round-r plan nests every earlier round's matvec + norm +
      // broadcast, and Catalyst optimization time grows with depth
      val mv = graft.Materialize.cut(
        full.join(broadcast(v), Seq("j"))
          .groupBy(col("i"))
          .agg(sum((col("a") * col("v")).cast("decimal(38,18)"))
            .cast("double").as("u")))
      val norm = mv.agg(
        sqrt(sum((col("u") * col("u")).cast("decimal(38,18)"))
          .cast("double")).as("nrm"))
      lastNorm = norm
      // nullif: a zero iterate (start orthogonal to the whole range)
      // surfaces as NULLs, not an ANSI divide-by-zero abort
      v = mv.crossJoin(broadcast(norm))
        .select(col("i").as("j"),
          (col("u") / nullif(col("nrm"), lit(0.0d))).as("v"))
    }
    v.select(col("j").as("i"), col("v"))
      .crossJoin(broadcast(lastNorm))
      .select(col("i"), round(col("v"), 12).as("v"),
        round(col("nrm"), 12).as("eigval"))
  }

  /** Ridge regression (two features + unpenalized intercept) solved in
    * closed form from the normal equations (X'X + lambda * diag(0,1,1))
    * beta = X'y — the 100 TB shape for low-dimensional linear fits:
    * ONE map-side partial aggregate reduces the whole table to nine
    * scalar moments (n, sums, cross-products), and the 3x3 Cramer
    * solve runs on that single row. No per-row model state, no
    * gradient passes over the data (contrast [[graft.operators
    * .Classify]]'s logistic descent, which pays one scan per step).
    *
    * Numeric discipline: each cross-product is computed in double
    * (exact for these operand widths), cast to DECIMAL once, summed
    * exactly, and surfaced as double; the determinant expansion is one
    * fixed expression both engines fold identically. Output: 3 rows
    * (feature, beta), beta floor-snapped at 1e6.
    */
  /** Fixed-order Cramer expansion for the symmetric 3x3 system with
    * columns (a11, a12, a13, a22, a23, a33, b1, b2, b3) — a21 = a12,
    * a31 = a13, a32 = a23. Adds (det, d0, d1, d2); betas are d_i/det.
    * Every consumer's SQL oracle must spell these formulas
    * identically.
    */
  private def cramer3(solved: DataFrame): DataFrame =
    solved
      .withColumn("det",
        col("a11") * (col("a22") * col("a33") - col("a23") * col("a23"))
          - col("a12") * (col("a12") * col("a33") - col("a23") * col("a13"))
          + col("a13") * (col("a12") * col("a23") - col("a22") * col("a13")))
      .withColumn("d0",
        col("b1") * (col("a22") * col("a33") - col("a23") * col("a23"))
          - col("a12") * (col("b2") * col("a33") - col("a23") * col("b3"))
          + col("a13") * (col("b2") * col("a23") - col("a22") * col("b3")))
      .withColumn("d1",
        col("a11") * (col("b2") * col("a33") - col("a23") * col("b3"))
          - col("b1") * (col("a12") * col("a33") - col("a23") * col("a13"))
          + col("a13") * (col("a12") * col("b3") - col("b2") * col("a13")))
      .withColumn("d2",
        col("a11") * (col("a22") * col("b3") - col("b2") * col("a23"))
          - col("a12") * (col("a12") * col("b3") - col("b2") * col("a13"))
          + col("b1") * (col("a12") * col("a23") - col("a22") * col("a13")))

  def ridgeNormalEq(
      df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      lambda: Double): DataFrame = {
    require(lambda >= 0, s"lambda must be >= 0, got $lambda")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(30,10)")).cast("double")
    val x1 = col(x1Col).cast("double")
    val x2 = col(x2Col).cast("double")
    val y = col(yCol).cast("double")
    val m = df.agg(
      count(lit(1)).cast("double").as("n"),
      dsum(x1).as("s1"), dsum(x2).as("s2"),
      dsum(x1 * x1).as("s11"), dsum(x1 * x2).as("s12"),
      dsum(x2 * x2).as("s22"),
      dsum(y).as("sy"), dsum(x1 * y).as("s1y"), dsum(x2 * y).as("s2y"))
    val solved = m.select(
      col("n").as("a11"), col("s1").as("a12"), col("s2").as("a13"),
      (col("s11") + lit(lambda)).as("a22"), col("s12").as("a23"),
      (col("s22") + lit(lambda)).as("a33"),
      col("sy").as("b1"), col("s1y").as("b2"), col("s2y").as("b3"))
    val withDet = cramer3(solved)
    withDet.selectExpr(
      s"stack(3, 'intercept', d0 / det, '$x1Col', d1 / det, " +
        s"'$x2Col', d2 / det) AS (feature, beta)")
      .select(col("feature"),
        (floor(col("beta") * 1e6) / 1e6).as("beta"))
  }

  /** Leave-one-group-out influence on the ridge fit — "which data
    * source moves the model": refit [[ridgeNormalEq]]'s system with
    * each group's moments SUBTRACTED from the totals and report the
    * coefficient shift. Because the fit is nine exact moments, the
    * LOO sweep costs ONE grouped aggregate + per-group scalar algebra
    * — no per-group refit pass over the data, which is what makes
    * data-source attribution tractable at 100 TB (contrast actual
    * refits: |groups| full scans). Moments stay DECIMAL through
    * grouping, totaling, and subtraction (all exact), and go double
    * only inside the shared fixed-order Cramer solve.
    *
    * Output: one row per (group, feature) with beta_full, beta_loo
    * (both floor-snapped at 1e6) and delta = beta_loo − beta_full
    * (snapped at 1e6 — the Cramer ratio cancels catastrophically on
    * near-collinear systems, so a finer snap flips last-ulp
    * divergence across grid lines).
    */
  /** Ridge regularization path — the WHOLE lambda sweep from ONE data
    * pass: the nine moments (plus y'y) determine every fit, so each
    * lambda is a scalar Cramer solve and a fixed-order quadratic form,
    * and the sweep costs |lambdas| rows of algebra, zero extra scans.
    * This is the model-selection shape that matters at 100 TB: tuning
    * loops must not multiply passes over the data.
    *
    * Output per lambda: (lambda, beta_intercept, beta_x1, beta_x2,
    * sse, slope_l2) — SSE assembled from moments as
    * y'y − 2·β'X'y + β'X'Xβ (fixed expansion order), slope_l2 the
    * penalized-coefficient norm that the path trades against it.
    * Betas snap at 1e6 and SSE/slope_l2 are computed FROM the snapped
    * betas (see the inline note), then snap at 1e2/1e4.
    */
  def ridgePath(
      df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      lambdas: Seq[Double]): DataFrame = {
    require(lambdas.nonEmpty, "need at least one lambda")
    require(lambdas.forall(_ >= 0), "lambdas must be >= 0")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(30,10)")).cast("double")
    val x1 = col(x1Col).cast("double")
    val x2 = col(x2Col).cast("double")
    val y = col(yCol).cast("double")
    val m = df.agg(
      count(lit(1)).cast("double").as("n"),
      dsum(x1).as("s1"), dsum(x2).as("s2"),
      dsum(x1 * x1).as("s11"), dsum(x1 * x2).as("s12"),
      dsum(x2 * x2).as("s22"),
      dsum(y).as("sy"), dsum(x1 * y).as("s1y"), dsum(x2 * y).as("s2y"),
      dsum(y * y).as("syy"))
    val lambdaTable = broadcast(df.sparkSession
      .createDataFrame(lambdas.map(Tuple1(_))).toDF("lambda"))
    val solved = cramer3(m.crossJoin(lambdaTable).select(
      col("lambda"), col("syy"), col("s11"), col("s22"),
      col("n").as("a11"), col("s1").as("a12"), col("s2").as("a13"),
      (col("s11") + col("lambda")).as("a22"), col("s12").as("a23"),
      (col("s22") + col("lambda")).as("a33"),
      col("sy").as("b1"), col("s1y").as("b2"), col("s2y").as("b3")))
      // the Cramer ratios diverge by last ulps across engines and the
      // quadratic form amplifies that ~|X'X|-fold, so SSE is computed
      // from the SNAPPED betas — identical doubles by construction —
      // rather than the raw ones
      .withColumn("b0", floor((col("d0") / col("det")) * 1e6) / 1e6)
      .withColumn("bx1", floor((col("d1") / col("det")) * 1e6) / 1e6)
      .withColumn("bx2", floor((col("d2") / col("det")) * 1e6) / 1e6)
    solved.select(col("lambda"),
      col("b0").as("beta_intercept"),
      col("bx1").as("beta_x1"),
      col("bx2").as("beta_x2"),
      (floor((col("syy")
        - lit(2.0) * (col("b0") * col("b1") + col("bx1") * col("b2")
          + col("bx2") * col("b3"))
        + (col("b0") * col("b0") * col("a11")
          + col("bx1") * col("bx1") * col("s11")
          + col("bx2") * col("bx2") * col("s22")
          + lit(2.0) * col("b0") * col("bx1") * col("a12")
          + lit(2.0) * col("b0") * col("bx2") * col("a13")
          + lit(2.0) * col("bx1") * col("bx2") * col("a23"))) * 1e2)
        / 1e2).as("sse"),
      (floor((col("bx1") * col("bx1") + col("bx2") * col("bx2")) * 1e4)
        / 1e4).as("slope_l2"))
      .orderBy(col("lambda"))
  }

  def ridgeLooInfluence(
      df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      lambda: Double, groupCol: String): DataFrame = {
    require(lambda >= 0, s"lambda must be >= 0, got $lambda")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(30,10)")
    val x1 = col(x1Col).cast("double")
    val x2 = col(x2Col).cast("double")
    val y = col(yCol).cast("double")
    val g = df.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).as("gn"),
      sum(dec(x1)).as("gs1"), sum(dec(x2)).as("gs2"),
      sum(dec(x1 * x1)).as("gs11"), sum(dec(x1 * x2)).as("gs12"),
      sum(dec(x2 * x2)).as("gs22"),
      sum(dec(y)).as("gsy"), sum(dec(x1 * y)).as("gs1y"),
      sum(dec(x2 * y)).as("gs2y"))
    val tot = g.agg(
      sum(col("gn")).as("tn"),
      sum(col("gs1")).as("ts1"), sum(col("gs2")).as("ts2"),
      sum(col("gs11")).as("ts11"), sum(col("gs12")).as("ts12"),
      sum(col("gs22")).as("ts22"),
      sum(col("gsy")).as("tsy"), sum(col("gs1y")).as("ts1y"),
      sum(col("gs2y")).as("ts2y"))
    def sys(n: org.apache.spark.sql.Column, s1: org.apache.spark.sql.Column,
        s2: org.apache.spark.sql.Column, s11: org.apache.spark.sql.Column,
        s12: org.apache.spark.sql.Column, s22: org.apache.spark.sql.Column,
        sy: org.apache.spark.sql.Column, s1y: org.apache.spark.sql.Column,
        s2y: org.apache.spark.sql.Column) = Seq(
      n.cast("double").as("a11"), s1.cast("double").as("a12"),
      s2.cast("double").as("a13"),
      (s11.cast("double") + lit(lambda)).as("a22"),
      s12.cast("double").as("a23"),
      (s22.cast("double") + lit(lambda)).as("a33"),
      sy.cast("double").as("b1"), s1y.cast("double").as("b2"),
      s2y.cast("double").as("b3"))
    val full = cramer3(tot.select(sys(col("tn"), col("ts1"), col("ts2"),
        col("ts11"), col("ts12"), col("ts22"), col("tsy"), col("ts1y"),
        col("ts2y")): _*))
      .select(col("det").as("fdet"), col("d0").as("fd0"),
        col("d1").as("fd1"), col("d2").as("fd2"))
    val loo = cramer3(g.crossJoin(broadcast(tot))
      .select(col("grp") +: sys(
        col("tn") - col("gn"), col("ts1") - col("gs1"),
        col("ts2") - col("gs2"), col("ts11") - col("gs11"),
        col("ts12") - col("gs12"), col("ts22") - col("gs22"),
        col("tsy") - col("gsy"), col("ts1y") - col("gs1y"),
        col("ts2y") - col("gs2y")): _*))
    loo.crossJoin(broadcast(full))
      .selectExpr("grp",
        s"stack(3, 'intercept', d0 / det, fd0 / fdet, " +
          s"'$x1Col', d1 / det, fd1 / fdet, " +
          s"'$x2Col', d2 / det, fd2 / fdet) " +
          "AS (feature, beta_loo, beta_full)")
      .select(col("grp"), col("feature"),
        (floor(col("beta_loo") * 1e6) / 1e6).as("beta_loo"),
        (floor(col("beta_full") * 1e6) / 1e6).as("beta_full"),
        (floor((col("beta_loo") - col("beta_full")) * 1e6) / 1e6)
          .as("delta"))
  }

  /** Top-2 principal components by power iteration + Hotelling
    * deflation: (v1, λ1) from [[powerIteration]], then the deflated
    * matrix A₂ = A − λ1·v1·v1ᵀ and a second power iteration for
    * (v2, λ2). Deflation uses the 12dp-ROUNDED v1/λ1 that
    * powerIteration already emits — that rounding IS the deflation
    * contract, so both engines deflate the bit-identical matrix and
    * the second component replays exactly. Output one row per
    * (component, dimension): loading, eigval, and explained =
    * eigval / trace(A) — the two-line scree a 100 TB embedding audit
    * wants before deciding whether truncation is safe
    * ([[graft.operators.Similarity.dimTruncationRecall]] is the
    * recall-side check of the same decision).
    *
    * Shape: everything after [[covarianceMatrix]] is dim²-sized —
    * matrix rows and d-row vectors through broadcast joins only.
    */
  /** Consecutive-snapshot centroid drift: per-snapshot per-dimension
    * decimal-exact mean vectors, then the L2 distance between each
    * snapshot's centroid and its predecessor's — the cheapest
    * embedding-distribution drift alarm (a new encoder version, a
    * scraper regression, a poisoned source all move the centroid long
    * before they move task metrics). Means follow the
    * [[graft.operators.Clustering]] 12dp discipline so the drift
    * series replays exactly.
    *
    * Shape: one explode + hash aggregate to (snapshot, dim, mean) —
    * snapshot-count x dim rows — then a lag window per dimension and
    * one decimal fold per snapshot pair.
    */
  def centroidDrift(
      df: DataFrame, snapCol: String, vecCol: String): DataFrame = {
    val means = df
      .select(col(snapCol).as("__s"), posexplode(col(vecCol)))
      .select(col("__s"), col("pos").as("__d"),
        col("col").cast("double").as("__x"))
      .groupBy(col("__s"), col("__d"))
      .agg(round(sum(col("__x").cast("decimal(30,18)")).cast("double")
        / count(lit(1)), 12).as("__m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__d")).orderBy(col("__s"))
    means.withColumn("__prev", lag(col("__m"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__s").as(snapCol))
      .agg(round(sqrt(sum(((col("__m") - col("__prev"))
        * (col("__m") - col("__prev"))).cast("decimal(38,18)"))
        .cast("double")), 12).as("drift_l2"))
  }

  /** Reconstruction-error outliers against a fitted component table
    * (the [[topTwoComponents]] output shape): residual² = ‖x‖² − Σ_c
    * (x·v_c)² per vector (valid because the components are
    * orthonormal), ranked descending — the embedding-space anomaly
    * detector (vectors the principal subspace cannot explain are the
    * mis-embedded / off-distribution documents a curation pass
    * quarantines). All dots accumulate in decimal over per-dimension
    * double terms; the subtraction happens once per vector in double.
    *
    * Shape: one (id, dim, x) explode joined against the broadcast
    * dim²-sized loading table, two hash aggregates, one top-k sort —
    * ids and scalars only.
    */
  def reconstructionOutliers(
      df: DataFrame, idCol: String, vecCol: String,
      components: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val dims = df.select(col(idCol).as("__id"), posexplode(col(vecCol)))
      .select(col("__id"), col("pos").as("__d"),
        col("col").cast("double").as("__x"))
    val load = broadcast(components.select(col("component").as("__c"),
      col("i").as("__d"), col("v").as("__v")))
    val proj = dims.join(load, Seq("__d"))
      .groupBy(col("__id"), col("__c"))
      .agg(sum((col("__x") * col("__v")).cast("decimal(38,18)"))
        .cast("double").as("__p"))
      .groupBy(col("__id"))
      .agg(sum((col("__p") * col("__p")).cast("decimal(38,18)"))
        .cast("double").as("__expl"))
    val norms = dims.groupBy(col("__id"))
      .agg(sum((col("__x") * col("__x")).cast("decimal(38,18)"))
        .cast("double").as("__n2"))
    norms.join(proj, Seq("__id"))
      .select(col("__id").as(idCol),
        round(col("__n2") - col("__expl"), 9).as("residual_sq"))
      .orderBy(col("residual_sq").desc, col(idCol))
      .limit(topN)
  }

  def topTwoComponents(
      upperTri: DataFrame, iCol: String, jCol: String, valCol: String,
      dim: Int, rounds: Int): DataFrame = {
    // lineage cuts between the two iterations: the deflated matrix
    // would otherwise embed the ENTIRE first-component plan into every
    // round of the second iteration and optimization time explodes
    val a = graft.Materialize.cut(
      upperTri.select(col(iCol).as("i"), col(jCol).as("j"),
        col(valCol).as("a")))
    val c1 = graft.Materialize.cut(powerIteration(a, "i", "j", "a", dim, rounds))
    val v1i = broadcast(c1.select(col("i"),
      col("v").as("__vi"), col("eigval").as("__l")))
    val v1j = broadcast(c1.select(col("i").as("j"), col("v").as("__vj")))
    val a2 = graft.Materialize.cut(
      a.join(v1i, Seq("i")).join(v1j, Seq("j"))
        .select(col("i"), col("j"),
          (col("a") - col("__l") * col("__vi") * col("__vj")).as("a2")))
    val c2 = powerIteration(a2, "i", "j", "a2", dim, rounds,
      varyStart = true)
    val trace = broadcast(a.filter(col("i") === col("j"))
      .agg(sum(col("a").cast("decimal(38,12)")).cast("double").as("__tr")))
    c1.select(lit(1).as("component"), col("i"), col("v"), col("eigval"))
      .unionByName(c2.select(lit(2).as("component"), col("i"), col("v"),
        col("eigval")))
      .crossJoin(trace)
      .select(col("component"), col("i"), col("v"), col("eigval"),
        round(col("eigval") / col("__tr"), 12).as("explained"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Controlled-experiment readout operators — the A/B-measurement layer
  * that sits downstream of the fraud pipeline's scored events (the
  * reference stops at model prep, `processor.py:79-85`; any production
  * deployment of that model immediately needs variance-reduced effect
  * estimates and multi-cell comparisons over the same event stream).
  *
  * Numeric discipline (see [[graft.queries.Registry]]): per-unit and
  * per-cell moments accumulate in DECIMAL (exact, order-independent);
  * doubles appear only in the final ratio expressions. Where a final
  * reduction over a SMALL fixed set of groups is itself
  * order-sensitive (a sum of per-group double ratios), it runs as an
  * ordered cumulative window over that group axis, so both engines
  * fold the same doubles in the same sequence — bit-identical without
  * any decimal detour.
  */
object Experiment {

  /** CUPED (Controlled-experiment Using Pre-Existing Data) adjusted
    * means: per experiment unit, a pre-period covariate x and an
    * in-experiment metric y; theta = cov(x,y)/var(x) pooled across all
    * units; each variant's adjusted mean is ybar_v - theta*(xbar_v -
    * xbar). Cuts metric variance by the squared pre/post correlation —
    * the standard trick for shipping experiments faster at constant
    * power.
    *
    * Shape: ONE shuffle onto the unit key for the per-unit (x, y)
    * sums; the pooled second moments are a one-row aggregate broadcast
    * back over the per-variant aggregate (cells = variant count).
    * Every moment (sum x, sum y, sum xy, sum x^2) is an exact decimal
    * product-sum; theta and the adjusted means are final-step double
    * arithmetic.
    *
    * Output: one row per variant — (variant, n_units, mean_pre,
    * mean_post, mean_adj, theta), variants ordered by name.
    */
  def cuped(
      df: DataFrame,
      unitCol: String,
      variantCol: String,
      metricCol: String,
      isPre: Column): DataFrame = {
    val v = col(metricCol).cast("decimal(18,6)")
    val perUnit = df
      .groupBy(col(unitCol).as("__u"))
      .agg(
        // unit -> variant must be a function (a unit in two variants is
        // a broken assignment); max() both asserts nothing and picks
        // deterministically — the spec pins the well-formed contract
        max(col(variantCol)).as("__variant"),
        // per-unit totals re-narrowed to decimal(18,6): products below
        // then fit both engines' 38-digit decimal width exactly (DuckDB
        // ERRORS on a multiply whose combined width exceeds 38, Spark
        // silently switches to precision-loss rounding — narrow inputs
        // sidestep both)
        coalesce(sum(when(isPre, v)), lit(0).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("__x"),
        coalesce(sum(when(!isPre, v)), lit(0).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("__y"))
    val pooled = perUnit.select(
      count(lit(1)).cast("decimal(8,0)").as("__n"),
      sum(col("__x")).cast("decimal(18,6)").as("__sx"),
      sum(col("__y")).cast("decimal(18,6)").as("__sy"),
      sum(col("__x") * col("__y")).cast("decimal(28,12)").as("__sxy"),
      sum(col("__x") * col("__x")).cast("decimal(28,12)").as("__sxx"))
    // theta's numerator/denominator stay EXACT decimals until one final
    // double division each; theta is then rounded to 12 so every
    // downstream use folds the same double on both engines
    val withTheta = pooled.select(
      col("__n"),
      (col("__sx").cast("double") / col("__n").cast("double"))
        .as("__xbar"),
      round(
        (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double")
          / (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double"), 12).as("theta"))
    val perVariant = perUnit
      .groupBy(col("__variant").as("variant"))
      .agg(
        count(lit(1)).as("n_units"),
        sum(col("__x")).as("__vx"),
        sum(col("__y")).as("__vy"))
    perVariant
      .crossJoin(broadcast(withTheta))
      .select(
        col("variant"),
        col("n_units"),
        (col("__vx").cast("double") / col("n_units")).as("mean_pre"),
        (col("__vy").cast("double") / col("n_units")).as("mean_post"),
        (col("__vy").cast("double") / col("n_units")
          - col("theta")
            * (col("__vx").cast("double") / col("n_units") - col("__xbar")))
          .as("mean_adj"),
        col("theta"))
      .orderBy(col("variant"))
  }

  /** Stratification-standardized average treatment effect: within each
    * stratum the treated/control mean difference, combined with
    * stratum-share weights — the back-door-adjusted ATE when the
    * stratum variable blocks confounding (and the classic "adjust for
    * segment mix before comparing cohorts" dashboard number).
    *
    * ATE = Σ_s (n_s/n) · (ȳ_treat,s − ȳ_ctrl,s). One hash aggregate
    * onto (stratum), conditional sums inside; cell means divide exact
    * decimal sums once in double; each stratum's weighted term rounds
    * at 12 and accumulates in decimal (order-independent). Strata
    * missing a treatment arm contribute NULL and null the total —
    * an incomparable design should fail loudly, not silently reweight.
    *
    * Output one row: (n, n_strata, ate).
    */
  def stratifiedAte(
      df: DataFrame, stratumCol: String, treatCol: String,
      yCol: String): DataFrame = {
    val y = col(yCol).cast("decimal(18,6)")
    val t = col(treatCol) === 1
    val per = df
      .filter(col(yCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(
        count(lit(1)).as("__ns"),
        sum(when(t, 1L).otherwise(0L)).as("__nt"),
        sum(when(t, y)).as("__st"),
        sum(when(!t, y)).as("__sc"))
    val tot = per.select(sum(col("__ns")).as("__n"))
    val effect = col("__st").cast("double") / col("__nt").cast("double") -
      col("__sc").cast("double") / (col("__ns") - col("__nt")).cast("double")
    per.crossJoin(broadcast(tot))
      .select(col("__n"),
        round(col("__ns").cast("double") / col("__n").cast("double")
          * effect, 12).cast("decimal(38,12)").as("__term"))
      .groupBy(col("__n"))
      .agg(count(lit(1)).as("n_strata"),
        sum(col("__term")).as("__ate"),
        // sum() SKIPS nulls — a one-armed stratum would silently drop
        // out and reweight the design; count the holes and null the
        // total explicitly
        sum(when(col("__term").isNull, 1L).otherwise(0L)).as("__bad"))
      .select(col("__n").as("n"), col("n_strata"),
        when(col("__bad") === 0, col("__ate").cast("double")).as("ate"))
  }

  /** Difference-in-differences over the 2×2 (treated, post) design:
    * did = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre) —
    * the parallel-trends effect estimate. One conditional aggregate;
    * four exact decimal cell sums, four double divisions, one final
    * double expression. Output one row: the four cell means (m_tpre,
    * m_tpost, m_cpre, m_cpost), cell counts, and did.
    */
  def diffInDiff(
      df: DataFrame, treatCol: String, postCol: String,
      yCol: String): DataFrame = {
    val y = col(yCol).cast("decimal(18,6)")
    val t = col(treatCol) === 1
    val p = col(postCol) === 1
    def cell(cond: Column, name: String): Seq[(String, Column)] = Seq(
      s"n_$name" -> sum(when(cond, 1L).otherwise(0L)),
      s"__s_$name" -> sum(when(cond, y)))
    val cells =
      cell(t && !p, "tpre") ++ cell(t && p, "tpost") ++
        cell(!t && !p, "cpre") ++ cell(!t && p, "cpost")
    val agg = df.filter(col(yCol).isNotNull)
      .agg(cells.head._2.as(cells.head._1),
        cells.tail.map { case (n, c) => c.as(n) }: _*)
    def m(name: String): Column =
      col(s"__s_$name").cast("double") / col(s"n_$name").cast("double")
    agg.select(
      col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
      m("tpre").as("m_tpre"), m("tpost").as("m_tpost"),
      m("cpre").as("m_cpre"), m("cpost").as("m_cpost"),
      ((m("tpost") - m("tpre")) - (m("cpost") - m("cpre"))).as("did"))
  }

  /** Per-group simple OLS fit y = slope*x + intercept — the
    * elasticity/trend readout (price vs quantity, value vs hour) as a
    * pure aggregation: per group the five moments (n, Σx, Σy, Σxy,
    * Σx²; plus Σy² for R²) accumulate as exact decimals in ONE hash
    * aggregate, then slope/intercept/R² are final-step double ratios
    * of exact decimal numerators. Groups with zero x-variance emit
    * null slope/intercept/r2 (0/0), never NaN.
    *
    * Output: (groupCol, n, slope, intercept, r2), ordered by group.
    */
  def olsByGroup(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    // (19,6) operands keep every product at or under the 38-digit
    // width both engines share (see cuped)
    val x = col(xCol).cast("decimal(19,6)")
    val y = col(yCol).cast("decimal(19,6)")
    val per = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("decimal(10,0)").as("__n"),
        sum(x).cast("decimal(19,6)").as("__sx"),
        sum(y).cast("decimal(19,6)").as("__sy"),
        sum(x * y).cast("decimal(28,12)").as("__sxy"),
        sum(x * x).cast("decimal(28,12)").as("__sxx"),
        sum(y * y).cast("decimal(28,12)").as("__syy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val denX = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val denY = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    per.select(
      col(groupCol),
      col("__n").cast("long").as("n"),
      when(denX > 0d, num / denX).as("slope"),
      when(denX > 0d,
        (col("__sy").cast("double")
          - (num / denX) * col("__sx").cast("double"))
          / col("__n").cast("double")).as("intercept"),
      when(denX > 0d && denY > 0d, num * num / (denX * denY)).as("r2"))
      .orderBy(col(groupCol))
  }

  /** One-way ANOVA F statistic across the groups of `groupCol`:
    * F = (SSB/(k-1)) / (SSW/(n-k)) with SSB = sum_g S_g^2/n_g - S^2/n
    * and SSW = Q - sum_g S_g^2/n_g, from per-group (n_g, sum, sum of
    * squares) — a single hash aggregate over the data, then a k-row
    * reduction.
    *
    * The k-row reduction sums per-group double ratios S_g^2/n_g — an
    * order-sensitive fold — so it runs as an ordered cumulative window
    * over the group axis (k rows; benign single-partition window) and
    * the last row carries the total: both engines add the same doubles
    * in the same order.
    *
    * Output: one row — (k, n, ss_between, ss_within, f_stat).
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    val per = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(
        count(lit(1)).as("__ng"),
        sum(v).as("__sg"),
        sum((v * v).cast("decimal(38,12)")).as("__qg"))
    val wOrd = Window.orderBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val folded = per
      // square in DOUBLE, not decimal: a decimal(38,6)^2 would need
      // scale 12 at precision 76 and engines truncate differently;
      // double*double/int is one correctly-rounded op chain both sides
      .withColumn("__ratio",
        col("__sg").cast("double") * col("__sg").cast("double")
          / col("__ng"))
      .select(
        sum(col("__ratio")).over(wOrd).as("__sum_ratio"),
        sum(col("__ng")).over(wOrd).as("__n"),
        sum(col("__sg")).over(wOrd).as("__s"),
        sum(col("__qg")).over(wOrd).as("__q"),
        count(lit(1)).over(wOrd).as("__k"),
        row_number().over(Window.orderBy(col("__g").desc)).as("__rn"))
      .where(col("__rn") === 1)
    folded.select(
      col("__k").as("k"),
      col("__n").as("n"),
      (col("__sum_ratio")
        - col("__s").cast("double") * col("__s").cast("double")
          / col("__n")).as("ss_between"),
      (col("__q").cast("double") - col("__sum_ratio")).as("ss_within"),
      ((col("__sum_ratio")
        - col("__s").cast("double") * col("__s").cast("double")
          / col("__n")) / (col("__k") - 1)
        / ((col("__q").cast("double") - col("__sum_ratio"))
          / (col("__n") - col("__k")))).as("f_stat"))
  }

  /** Huber-robust simple regression per group: one IRLS step on top of
    * [[olsByGroup]]'s closed form. Round 0 fits OLS; residual scale is
    * the exact median absolute residual (the interpolating percentile
    * both engines share); Huber weights w = min(1, δ·τ/|r|) (δ = 1.345,
    * the 95%-efficiency constant) downweight outliers; round 1 refits
    * the weighted closed form. One IRLS step removes the bulk of
    * outlier leverage and keeps the whole operator a THREE-aggregate
    * dataflow — full IRLS-to-convergence would be data passes in a
    * driver loop ([[Classify.logisticGd]]'s shape) for marginal gain.
    *
    * Shapes: per-group sums shuffle on the group key; the fitted
    * O(|groups|) parameter table joins back by BROADCAST so the data
    * shuffles once, not three times. Weights/products round at 12 and
    * decimal-accumulate; slope/intercept are final double expressions.
    *
    * Output: (group, n, slope_ols, slope_huber, intercept_huber,
    * scale, n_downweighted).
    */
  def huberOlsByGroup(
      df: DataFrame, groupCol: String, xCol: String, yCol: String,
      delta: Double = 1.345): DataFrame = {
    require(delta > 0, s"delta must be > 0, got $delta")
    // Cross-engine determinism, two rules learned the hard way here:
    //   1. FLOOR, never round(): round() implementations differ at half
    //      boundaries (Spark rounds a decimal string, DuckDB the scaled
    //      binary); floor of an identical double is identical in every
    //      IEEE engine, so parameters snap via floor(v·1e9)/1e9 and
    //      weights are exact integers floor(w·1e4).
    //   2. Keep every decimal's UNSCALED integer under 2^53 before a
    //      cast to double: past 2^53 an int128→double→/10^s cast
    //      double-rounds (observed: DuckDB off Spark by 1 ulp on a
    //      7e23-unscaled sum, visibly shifting the intercept). Hence
    //      the weighted sums run on per-group CENTERED x/y (integer
    //      centers floor(mean)) with 1e4-unit weights — spread-sized
    //      magnitudes instead of offset-sized, the standard numerical
    //      practice, and the slope/intercept transform back exactly.
    def snap9(c: Column): Column = floor(c * lit(1e9)) / lit(1e9)
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    val ols = olsByGroup(base, groupCol, "__x", "__y")
      .select(col(groupCol),
        snap9(col("slope")).as("__b0"),
        snap9(col("intercept")).as("__a0"),
        col("slope").as("__slope_ols"))
    val centers = base.groupBy(col(groupCol))
      .agg(
        floor(sum(col("__x").cast("decimal(19,6)")).cast("double")
          / count(lit(1))).cast("double").as("__x0"),
        floor(sum(col("__y").cast("decimal(19,6)")).cast("double")
          / count(lit(1))).cast("double").as("__y0"))
    val resid = base.join(broadcast(ols), Seq(groupCol))
      .withColumn("__r", col("__y") - (col("__a0") + col("__b0") * col("__x")))
    val scale = resid.groupBy(col(groupCol))
      .agg(snap9(expr("percentile(abs(__r), 0.5)")).as("__tau"))
    val weighted = resid.join(broadcast(scale), Seq(groupCol))
      .join(broadcast(centers), Seq(groupCol))
      .withColumn("__wi",
        when(col("__tau") <= 0d, lit(10000L))
          .otherwise(when(abs(col("__r")) <= lit(delta) * col("__tau"),
            lit(10000L))
            .otherwise(floor(lit(delta) * col("__tau") / abs(col("__r"))
              * lit(1e4)).cast("long"))))
      .withColumn("__xc", col("__x") - col("__x0"))
      .withColumn("__yc", col("__y") - col("__y0"))
      .withColumn("__wd", col("__wi").cast("decimal(10,0)"))
      .withColumn("__dx", col("__xc").cast("decimal(19,6)"))
      .withColumn("__dy", col("__yc").cast("decimal(19,6)"))
      .withColumn("__dxy", (col("__xc") * col("__yc")).cast("decimal(19,4)"))
      .withColumn("__dxx", (col("__xc") * col("__xc")).cast("decimal(19,4)"))
    val agg = weighted.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__wd")).cast("double").as("__sw"),
        sum(col("__wd") * col("__dx")).cast("double").as("__swx"),
        sum(col("__wd") * col("__dy")).cast("double").as("__swy"),
        sum(col("__wd") * col("__dxy")).cast("double").as("__swxy"),
        sum(col("__wd") * col("__dxx")).cast("double").as("__swxx"),
        sum(when(col("__wi") < 10000L, 1L).otherwise(0L))
          .as("n_downweighted"))
    val den = col("__sw") * col("__swxx") - col("__swx") * col("__swx")
    val num = col("__sw") * col("__swxy") - col("__swx") * col("__swy")
    val bH = num / den
    def snap10(c: Column): Column = floor(c * lit(1e10)) / lit(1e10)
    agg.join(broadcast(ols.select(col(groupCol), col("__slope_ols"))),
      Seq(groupCol))
      .join(broadcast(scale), Seq(groupCol))
      .join(broadcast(centers), Seq(groupCol))
      .select(col(groupCol), col("n"),
        snap10(col("__slope_ols")).as("slope_ols"),
        when(den > 0d, snap10(bH)).as("slope_huber"),
        when(den > 0d,
          snap10((col("__swy") / col("__sw") + col("__y0"))
            - bH * (col("__swx") / col("__sw") + col("__x0"))))
          .as("intercept_huber"),
        snap10(col("__tau")).as("scale"),
        col("n_downweighted"))
  }

  /** Standard-normal CDF via the Abramowitz–Stegun 7.1.26 erf
    * polynomial (|error| < 1.5e-7) — Spark has no built-in erf, and a
    * fixed polynomial is the point here: the SAME closed-form double
    * expression evaluates in any engine, so p-values are replayable
    * where a library erf would not be. Accuracy is far beyond what any
    * multiple-testing decision needs.
    */
  private[graft] def normalCdf(z: Column): Column = {
    val x = abs(z) / math.sqrt(2.0)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t
      + lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    val erf = lit(1.0) - poly * exp(-x * x)
    when(z >= 0, lit(0.5) * (lit(1.0) + erf))
      .otherwise(lit(0.5) * (lit(1.0) - erf))
  }

  /** Per-group two-proportion z-tests: [[Evaluation.abTest]]'s pooled-z
    * arithmetic keyed by `byCol`, plus the two-sided p-value from
    * [[normalCdf]] (rounded at 12 so an erf-library ulp can never flip
    * a downstream threshold compare). One hash aggregate on the group
    * key — the fan-out shape of a metrics cut ("did the treatment move
    * conversion in ANY segment"), and the input [[bhAdjust]] expects.
    * Degenerate cells (pooled variance 0, or an arm with no units at
    * all) emit NULL z and p — never an ANSI divide-by-zero abort.
    */
  def abTestPerGroup(
      perUnit: DataFrame, byCol: String, groupCol: String,
      convCol: String): DataFrame = {
    val agg = perUnit.groupBy(col(byCol)).agg(
      sum(when(col(groupCol) === 0, 1L).otherwise(0L)).as("n_control"),
      sum(when(col(groupCol) === 0 && col(convCol) === 1, 1L)
        .otherwise(0L)).as("c_control"),
      sum(when(col(groupCol) === 1, 1L).otherwise(0L)).as("n_treat"),
      sum(when(col(groupCol) === 1 && col(convCol) === 1, 1L)
        .otherwise(0L)).as("c_treat"))
    // nullif-guarded: a cell missing an arm entirely (possible at tiny
    // scale factors) is degenerate — NULL uplift/z/p, not an ANSI
    // divide-by-zero abort
    val p0 = col("c_control").cast("double") /
      nullif(col("n_control").cast("double"), lit(0.0d))
    val p1 = col("c_treat").cast("double") /
      nullif(col("n_treat").cast("double"), lit(0.0d))
    val pp = (col("c_control") + col("c_treat")).cast("double") /
      nullif((col("n_control") + col("n_treat")).cast("double"), lit(0.0d))
    val se = sqrt(pp * (lit(1.0d) - pp)
      * (lit(1.0d) / nullif(col("n_control").cast("double"), lit(0.0d))
        + lit(1.0d) / nullif(col("n_treat").cast("double"), lit(0.0d))))
    val z = (p1 - p0) / se
    agg.select(col(byCol),
      col("n_control"), col("c_control"), col("n_treat"), col("c_treat"),
      (p1 - p0).as("uplift"),
      when(se > 0d, z).otherwise(lit(null)).as("z"),
      when(se > 0d,
        round(lit(2.0) * (lit(1.0) - normalCdf(abs(z))), 12))
        .otherwise(lit(null)).as("p_value"))
  }

  /** Benjamini–Hochberg step-up FDR control over a family of p-values:
    * rank ascending, reject every hypothesis up to the LARGEST k with
    * p_(k) <= (k/m)·alpha, and report the monotone q-value
    * q_(k) = min_{j>=k} p_(j)·m/j. The multiple-testing gate every
    * segment-cut dashboard needs once it fans one test into dozens.
    *
    * The family is one test per row — dashboard-scale, not data-scale
    * — so the two unpartitioned windows (rank, suffix-min) run over m
    * rows by construction; the data-scale work happened upstream in
    * [[abTestPerGroup]]. NULL p-values (degenerate cells) are excluded
    * from the family, matching R's `p.adjust` on NA. Per-row terms
    * p·m/j are each one double expression; ties rank by the id column
    * for determinism.
    */
  def bhAdjust(
      tests: DataFrame, idCol: String, pCol: String,
      alpha: Double): DataFrame = {
    val m0 = tests.where(col(pCol).isNotNull)
    val withM = m0.crossJoin(
      broadcast(m0.agg(count(lit(1)).as("__m"))))
    val wAsc = Window.orderBy(col(pCol).asc, col(idCol).asc)
    val ranked = withM
      .withColumn("__k", row_number().over(wAsc))
      .withColumn("__term",
        round(col(pCol) * col("__m").cast("double")
          / col("__k").cast("double"), 12))
    val wSuffix = wAsc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wAll = wAsc.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .withColumn("__q", least(min(col("__term")).over(wSuffix), lit(1.0)))
      .withColumn("__kmax",
        max(when(col(pCol)
          <= round(lit(alpha) * col("__k").cast("double")
            / col("__m").cast("double"), 12), col("__k")))
          .over(wAll))
      .select(col(idCol), col(pCol).as("p_value"),
        col("__k").cast("long").as("k_rank"), col("__m").as("m"),
        col("__q").as("q_value"),
        (col("__kmax").isNotNull
          && col("__k") <= col("__kmax")).as("rejected"))
  }

  /** Propensity-score matching (nearest-neighbor, with replacement,
    * caliper): each treated unit matches the control whose score is
    * closest (ties: backward-then-id, the [[RangeJoin.asOfJoin]]
    * `nearest` contract), subject to `|score_t - score_c| <= caliper`;
    * the average treated-minus-matched-control outcome is the ATT.
    *
    * Scores quantize to integer micro-units up front (floor of a
    * double is engine-exact, and integer distance makes the caliper
    * test tie-free), so matching runs on longs. The control pool rides
    * the as-of join's broadcast side — the usual PSM regime (controls
    * bounded, treated stream large). For control pools too big to
    * broadcast, pre-bucket by score with [[RangeJoin.bucketedRangeJoin]].
    *
    * Output (one row): n_treated, n_matched, att,
    * mean_abs_gap (micro-unit score gap, in score units).
    */
  def psmAtt(
      treated: DataFrame,
      controls: DataFrame,
      scoreCol: String,
      yCol: String,
      idCol: String,
      caliper: Double = 0.01): DataFrame = {
    require(caliper > 0, s"caliper must be positive, got $caliper")
    val t = treated.select(col(idCol).as("__tid"),
      floor(col(scoreCol) * 1e6).cast("long").as("__ts"),
      col(yCol).as("__ty"))
    val c = controls.select(col(idCol).as("__cid"),
      floor(col(scoreCol) * 1e6).cast("long").as("__cs"),
      col(yCol).as("__cy"))
    val m = RangeJoin.asOfJoin(t, c, "__ts", "__cs", "__tid",
      direction = "nearest",
      tolerance = Some(math.floor(caliper * 1e6).toLong),
      rightTieBreak = Seq("__cid"))
    m.agg(
      count(lit(1)).as("n_treated"),
      count(col("__cid")).as("n_matched"),
      (floor((sum(when(col("__cid").isNotNull, col("__ty"))
        .cast("decimal(30,6)")) -
        sum(col("__cy").cast("decimal(30,6)"))).cast("double") /
        count(col("__cid")).cast("double") * 1e8) / 1e8).as("att"),
      (floor(sum(abs(col("__ts") - col("__cs"))).cast("double") /
        count(col("__cid")).cast("double") * 1e2) / 1e2 / 1e6)
        .as("mean_abs_gap"))
  }

  /** Wald's sequential probability ratio test over a Bernoulli stream,
    * replayed day by day — the "stop the experiment early" monitor.
    * For H0: p = p0 vs H1: p = p1, the cumulative log-likelihood
    * ratio after k successes in n trials is
    * k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)); cross A = ln((1−β)/α)
    * ⇒ accept H1, cross B = ln(β/(1−α)) ⇒ accept H0. `decision`
    * reports the boundary state AT that day; the first non-continue
    * day is the stopping time.
    *
    * Scale shape: the only data-sized work is the per-day (trials,
    * successes) aggregate; the cumulative window runs over the tiny
    * day series. Exact integer cumulative counts multiply two
    * CONSTANT doubles, so the trajectory replays engine-for-engine
    * (one fixed expression, no running float accumulation).
    */
  def sprtDecision(
      df: DataFrame, tsCol: String, successCol: Column,
      p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct p0, p1 in (0,1); got $p0, $p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha, beta must be in (0,1)")
    val micros = 86400L * 1000000L
    val daily = df
      .groupBy(((unix_micros(col(tsCol))
        - pmod(unix_micros(col(tsCol)), lit(micros)))
        / lit(micros)).cast("long").as("day"))
      .agg(count(lit(1)).as("__n"),
        sum(when(successCol, 1L).otherwise(0L)).as("__k"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the two LLR slopes and both boundaries are literals; the SQL
    // oracle must build them from the same double-cast literal forms
    val cumulative = daily
      .withColumn("n_cum", sum(col("__n")).over(w))
      .withColumn("k_cum", sum(col("__k")).over(w))
      .withColumn("llr",
        col("k_cum").cast("double") * log(lit(p1) / lit(p0))
          + (col("n_cum") - col("k_cum")).cast("double")
            * log(lit(1.0 - p1) / lit(1.0 - p0)))
    val upper = log(lit(1.0 - beta) / lit(alpha))
    val lower = log(lit(beta) / lit(1.0 - alpha))
    cumulative.select(col("day"), col("n_cum"), col("k_cum"),
      (floor(col("llr") * 1e9) / 1e9).as("llr"),
      when(col("llr") >= upper, lit("accept_h1"))
        .when(col("llr") <= lower, lit("accept_h0"))
        .otherwise(lit("continue")).as("decision"))
  }

  /** Inverse-propensity-weighted average treatment effect: fit the
    * propensity e(x) = P(T=1|x) with the same full-batch logistic GD
    * the classifier family oracles ([[Classify.logisticGd]]), clip it
    * to [clip, 1-clip], and take the Horvitz-Thompson estimate
    * (1/n)·Σ[T·y/ê − (1−T)·y/(1−ê)] — the weighting-based causal
    * estimate beside the matching ([[psmAtt]]) and stratification
    * ([[stratifiedAte]]) ones. Ships its own health check: the Kish
    * effective sample size (Σw)²/Σw² per arm — THE number that says
    * whether the weights degenerated (few huge weights ⇒ tiny ESS),
    * which at 100 TB is the difference between an estimate and noise.
    *
    * Scale shape: the GD fit is one O(p)-wide aggregate per round;
    * scoring + the HT sums are a single map-side pass. Every
    * weighted sum rounds at 12 dp and accumulates in DECIMAL, so the
    * estimate replays exactly from the oracle's unrolled GD chain.
    */
  def ipwAte(
      df: DataFrame, features: Seq[Column], treatCol: String,
      outcomeCol: String, iters: Int, lr: Double,
      clip: Double = 0.05): DataFrame = {
    require(clip > 0 && clip < 0.5, s"clip must be in (0,0.5), got $clip")
    val w = Classify.gdWeights(df, features, treatCol, iters, lr)
    val p = features.length
    val xs = features.zipWithIndex.map { case (f, i) =>
      f.cast("double").as(s"__x$i") }
    val base = df.select(
      (col(treatCol).cast("double").as("__t") +:
        col(outcomeCol).cast("double").as("__y") +: xs): _*)
    val z = (0 until p).foldLeft(lit(w(0)): Column) { (acc, j) =>
      acc + lit(w(j + 1)) * col(s"__x$j") }
    val praw = lit(1.0) / (lit(1.0) + exp(-z))
    val e = least(greatest(praw, lit(clip)), lit(1.0 - clip))
    val term = col("__t") * col("__y") / e -
      (lit(1.0) - col("__t")) * col("__y") / (lit(1.0) - e)
    val wt = lit(1.0) / e
    val wc = lit(1.0) / (lit(1.0) - e)
    def dsum(c: Column) = sum(c.cast("decimal(38,12)"))
    val agg = base.select(col("__t"), col("__y"),
        round(term, 12).as("__term"),
        round(wt, 12).as("__wt"), round(wt * wt, 12).as("__wt2"),
        round(wc, 12).as("__wc"), round(wc * wc, 12).as("__wc2"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("__term")).as("__st"),
        dsum(when(col("__t") === 1.0, col("__wt")).otherwise(lit(0.0)))
          .as("__swt"),
        dsum(when(col("__t") === 1.0, col("__wt2")).otherwise(lit(0.0)))
          .as("__swt2"),
        dsum(when(col("__t") === 0.0, col("__wc")).otherwise(lit(0.0)))
          .as("__swc"),
        dsum(when(col("__t") === 0.0, col("__wc2")).otherwise(lit(0.0)))
          .as("__swc2"))
    agg.select(col("n"),
      (floor(col("__st").cast("double") / col("n").cast("double") * 1e9)
        / 1e9).as("ate_ipw"),
      (floor(col("__swt").cast("double") * col("__swt").cast("double")
        / col("__swt2").cast("double") * 1e6) / 1e6).as("ess_treated"),
      (floor(col("__swc").cast("double") * col("__swc").cast("double")
        / col("__swc2").cast("double") * 1e6) / 1e6).as("ess_control"))
  }

  /** Seeded rerandomization test (the permutation test's
    * cluster-friendly form): B pseudo-assignments arm_b(row) =
    * hash(id, b) mod 2 re-split the population, and the p-value is
    * the fraction of replicates whose |mean difference| reaches the
    * observed one. (Hash assignment draws binomial, not
    * exactly-balanced, arms — a randomization test rather than an
    * exact permutation, the standard large-n equivalent — and is what
    * makes the procedure embarrassingly parallel: NO global shuffle
    * of labels, no per-replicate pass. The B replicates explode
    * IN-ROW and feed one partial aggregate keyed by (replicate,
    * arm); the shuffle carries 2B decimal partials.)
    *
    * Engine parity: the hash is the portable 60-bit md5; per-arm
    * sums accumulate in DECIMAL; each replicate's mean difference is
    * one fixed double expression, compared RAW against the observed
    * difference (identical doubles on both engines).
    *
    * Output: (b_reps, observed_diff, n_extreme, p_value) with
    * p = (1 + #extreme)/(B + 1).
    */
  def permutationTest(
      df: DataFrame, idCol: String, valueCol: String,
      treatCond: Column, reps: Int): DataFrame = {
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val base = df.select(
      col(idCol).cast("string").as("__id"),
      col(valueCol).cast("double").as("__v"),
      when(treatCond, 1L).otherwise(0L).as("__t"))
    def dsum(c: Column) = sum(c.cast("decimal(30,6)"))
    val diffExpr: Column =
      col("__s1").cast("double") / col("__n1").cast("double") -
        col("__s0").cast("double") / col("__n0").cast("double")
    val observed = base.agg(
      dsum(when(col("__t") === 1L, col("__v")).otherwise(lit(0.0))).as("__s1"),
      sum(when(col("__t") === 1L, 1L).otherwise(0L)).as("__n1"),
      dsum(when(col("__t") === 0L, col("__v")).otherwise(lit(0.0))).as("__s0"),
      sum(when(col("__t") === 0L, 1L).otherwise(0L)).as("__n0"))
      .select(diffExpr.as("__obs"))
    val perms = base
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(reps - 1))).as("__b"))
      .withColumn("__arm",
        pmod(graft.functions.TextFunctions.md5Hash60(
          concat(col("__id"), lit("_"), col("__b").cast("string"))), lit(2L)))
      .groupBy(col("__b"))
      .agg(
        dsum(when(col("__arm") === 1L, col("__v")).otherwise(lit(0.0)))
          .as("__s1"),
        sum(when(col("__arm") === 1L, 1L).otherwise(0L)).as("__n1"),
        dsum(when(col("__arm") === 0L, col("__v")).otherwise(lit(0.0)))
          .as("__s0"),
        sum(when(col("__arm") === 0L, 1L).otherwise(0L)).as("__n0"))
      .select(col("__b"), diffExpr.as("__diff"))
    perms.crossJoin(broadcast(observed))
      .agg(
        count(lit(1)).as("b_reps"),
        sum(when(abs(col("__diff")) >= abs(col("__obs")), 1L)
          .otherwise(0L)).as("n_extreme"),
        first(col("__obs")).as("__obs"))
      .select(col("b_reps"),
        (floor(col("__obs") * 1e9) / 1e9).as("observed_diff"),
        col("n_extreme"),
        ((lit(1L) + col("n_extreme")).cast("double")
          / lit((reps + 1).toDouble)).as("p_value"))
  }

  /** Cochran–Mantel–Haenszel pooled odds ratio over stratified 2x2
    * tables: OR = Σ_i (a_i·d_i/n_i) / Σ_i (b_i·c_i/n_i) — the
    * confounder-adjusted association readout that complements the
    * unstratified chi-square. Each stratum reduces to four INTEGER
    * cell counts in one hash aggregate; the per-stratum terms round
    * at 12 dp into decimal sums, so the pooled ratio replays exactly.
    * Strata where any margin is empty contribute their zero products
    * naturally (no special-casing).
    *
    * Output: (k_strata, sum_ad, sum_bc, or_cmh), or_cmh snapped 1e9.
    */
  def cmhOddsRatio(
      df: DataFrame, stratum: Column, exposure: Column,
      outcome: Column): DataFrame = {
    val cells = df
      .groupBy(stratum.as("__s"))
      .agg(
        sum(when(exposure && outcome, 1L).otherwise(0L)).as("__a"),
        sum(when(exposure && !outcome, 1L).otherwise(0L)).as("__b"),
        sum(when(!exposure && outcome, 1L).otherwise(0L)).as("__c"),
        sum(when(!exposure && !outcome, 1L).otherwise(0L)).as("__d"))
      .withColumn("__n",
        col("__a") + col("__b") + col("__c") + col("__d"))
    cells
      .select(
        round((col("__a") * col("__d")).cast("double")
          / col("__n").cast("double"), 12).as("__ad"),
        round((col("__b") * col("__c")).cast("double")
          / col("__n").cast("double"), 12).as("__bc"))
      .agg(count(lit(1)).as("k_strata"),
        sum(col("__ad").cast("decimal(38,12)")).as("__sad"),
        sum(col("__bc").cast("decimal(38,12)")).as("__sbc"))
      .select(col("k_strata"),
        col("__sad").cast("double").as("sum_ad"),
        col("__sbc").cast("double").as("sum_bc"),
        (floor(col("__sad").cast("double") / col("__sbc").cast("double")
          * 1e9) / 1e9).as("or_cmh"))
  }

  /** Doubly-robust (AIPW) average treatment effect — the estimator
    * that stays consistent if EITHER the propensity model OR the
    * outcome model is right:
    * mean[ m1(x) − m0(x) + T·(y − m1(x))/ê − (1−T)·(y − m0(x))/(1−ê) ].
    * Propensity = the same clipped logistic-GD fit [[ipwAte]] uses;
    * outcome models = per-arm OLS on two features, solved in closed
    * form from per-arm moment aggregates (zero extra data passes —
    * the regression-adjustment side costs nine scalars per arm).
    *
    * Engine parity: the per-arm OLS betas are Cramer ratios whose
    * last ulps differ across engines and would be amplified through
    * every per-row m(x); both engines therefore floor-snap the betas
    * at 1e9 BEFORE scoring, making the augmentation arithmetic
    * bit-identical. Per-row terms round at 12 dp into DECIMAL sums.
    *
    * Output: (n, ate_aipw, mt_mean, mc_mean) — the estimate plus each
    * outcome model's mean prediction over the full population.
    */
  def aipwAte(
      df: DataFrame, features: Seq[Column], treatCol: String,
      outcomeCol: String, iters: Int, lr: Double,
      clip: Double = 0.05): DataFrame = {
    require(features.length == 2,
      s"aipwAte fits 2-feature outcome models; got ${features.length}")
    require(clip > 0 && clip < 0.5, s"clip must be in (0,0.5), got $clip")
    val w = Classify.gdWeights(df, features, treatCol, iters, lr)
    val base = df.select(
      col(treatCol).cast("double").as("__t"),
      col(outcomeCol).cast("double").as("__y"),
      features(0).cast("double").as("__x0"),
      features(1).cast("double").as("__x1"))
    def dec(c: Column) = c.cast("decimal(30,10)")
    // per-arm OLS moments in one pass (conditional decimal sums)
    def armMoments(arm: Double) = Seq(
      sum(when(col("__t") === arm, 1L).otherwise(0L)).as(s"n$arm"),
      sum(when(col("__t") === arm, dec(col("__x0"))).otherwise(dec(lit(0.0)))),
      sum(when(col("__t") === arm, dec(col("__x1"))).otherwise(dec(lit(0.0)))),
      sum(when(col("__t") === arm, dec(col("__x0") * col("__x0")))
        .otherwise(dec(lit(0.0)))),
      sum(when(col("__t") === arm, dec(col("__x0") * col("__x1")))
        .otherwise(dec(lit(0.0)))),
      sum(when(col("__t") === arm, dec(col("__x1") * col("__x1")))
        .otherwise(dec(lit(0.0)))),
      sum(when(col("__t") === arm, dec(col("__y"))).otherwise(dec(lit(0.0)))),
      sum(when(col("__t") === arm, dec(col("__x0") * col("__y")))
        .otherwise(dec(lit(0.0)))),
      sum(when(col("__t") === arm, dec(col("__x1") * col("__y")))
        .otherwise(dec(lit(0.0)))))
    def named(prefix: String, cols: Seq[Column]): Seq[Column] = {
      val names = Seq("n", "s1", "s2", "s11", "s12", "s22",
        "sy", "s1y", "s2y")
      cols.zip(names).map { case (c, nm) => c.as(s"$prefix$nm") }
    }
    val moments = base.agg(
      (named("t_", armMoments(1.0)) ++ named("c_", armMoments(0.0)))
        .head,
      (named("t_", armMoments(1.0)) ++ named("c_", armMoments(0.0)))
        .tail: _*)
    // snapped per-arm betas via the shared fixed-order Cramer algebra
    def betas(row: org.apache.spark.sql.Row, p: String): (Double, Double, Double) = {
      def g(nm: String): Double = {
        val v = row.getAs[Any](s"$p$nm")
        v match {
          case d: java.math.BigDecimal => d.doubleValue()
          case l: java.lang.Long => l.toDouble
          case d: java.lang.Double => d
        }
      }
      val (a11, a12, a13) = (g("n"), g("s1"), g("s2"))
      val (a22, a23, a33) = (g("s11"), g("s12"), g("s22"))
      val (b1, b2, b3) = (g("sy"), g("s1y"), g("s2y"))
      val det = a11 * (a22 * a33 - a23 * a23) -
        a12 * (a12 * a33 - a23 * a13) + a13 * (a12 * a23 - a22 * a13)
      // degenerate design (empty arm, or constant/collinear features)
      // must surface as an error, not NaN/Infinity betas silently
      // propagating through every per-row m(x) into ate_aipw
      require(det != 0.0 && !det.isNaN,
        s"aipwAte: singular normal equations for arm '$p' " +
          s"(n=${a11}) — empty arm or collinear/constant features")
      val d0 = b1 * (a22 * a33 - a23 * a23) -
        a12 * (b2 * a33 - a23 * b3) + a13 * (b2 * a23 - a22 * b3)
      val d1 = a11 * (b2 * a33 - a23 * b3) -
        b1 * (a12 * a33 - a23 * a13) + a13 * (a12 * b3 - b2 * a13)
      val d2 = a11 * (a22 * b3 - b2 * a23) -
        a12 * (a12 * b3 - b2 * a13) + b1 * (a12 * a23 - a22 * a13)
      def snap(x: Double) = math.floor(x / det * 1e9) / 1e9
      (snap(d0), snap(d1), snap(d2))
    }
    val mrow = moments.head()
    val (tb0, tb1, tb2) = betas(mrow, "t_")
    val (cb0, cb1, cb2) = betas(mrow, "c_")
    val z = lit(w(0)) + lit(w(1)) * col("__x0") + lit(w(2)) * col("__x1")
    val praw = lit(1.0) / (lit(1.0) + exp(-z))
    val e = least(greatest(praw, lit(clip)), lit(1.0 - clip))
    val m1 = lit(tb0) + lit(tb1) * col("__x0") + lit(tb2) * col("__x1")
    val m0 = lit(cb0) + lit(cb1) * col("__x0") + lit(cb2) * col("__x1")
    val term = m1 - m0 +
      col("__t") * (col("__y") - m1) / e -
      (lit(1.0) - col("__t")) * (col("__y") - m0) / (lit(1.0) - e)
    def dsum(c: Column) = sum(c.cast("decimal(38,12)"))
    base.select(round(term, 12).as("__a"),
        round(m1, 12).as("__m1"), round(m0, 12).as("__m0"))
      .agg(count(lit(1)).as("n"), dsum(col("__a")).as("__sa"),
        dsum(col("__m1")).as("__sm1"), dsum(col("__m0")).as("__sm0"))
      .select(col("n"),
        (floor(col("__sa").cast("double") / col("n").cast("double") * 1e9)
          / 1e9).as("ate_aipw"),
        (floor(col("__sm1").cast("double") / col("n").cast("double") * 1e9)
          / 1e9).as("mt_mean"),
        (floor(col("__sm0").cast("double") / col("n").cast("double") * 1e9)
          / 1e9).as("mc_mean"))
  }
}

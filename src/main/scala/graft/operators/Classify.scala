package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Trainable-at-scale classifiers expressed as pure dataflow: multinomial
  * naive Bayes over tokens, full-batch logistic-regression gradient
  * descent, and a single decision stump (the weak learner of boosting).
  * The reference trains sklearn models on a collected pandas matrix
  * (reference `src/models/train_model.py` shape); these are the
  * corpus-scale equivalents — model state is a handful of aggregates, the
  * data never leaves the executors, and every step is replayable in any
  * engine (each transcendental term is rounded to 12 dp and accumulated
  * as an exact decimal, the house hash-parity discipline).
  */
object Classify {

  /** Multinomial naive Bayes with add-one smoothing, trained and scored
    * in one dataflow (resubstitution scoring — the harness checks the
    * arithmetic; a real split comes from [[Split.stratified]]).
    *
    * score(d, c) = ln P(c) + Σ_t tf(d,t)·ln(cnt(c,t)+1) − |d|·ln(tot(c)+V)
    *
    * The ln(cnt+1) form makes absent (class, term) pairs contribute
    * ln(1) = 0, so the per-class partial sums come from a plain
    * token-level equi-join — no dense vocab × class grid ever
    * materializes, which is the whole trick at 100 TB vocabulary sizes.
    * Model state (priors, class totals, vocab size) is ≤ |classes| rows,
    * broadcast. The token join shuffles on `term` — Zipf skew lands on a
    * join key (AQE skew splitting applies), never a single partition.
    *
    * Output: one row per document — (idCol, pred, score), score the
    * winning class's log-joint rounded to 10 dp, ties to the
    * lexicographically smallest class label.
    */
  def naiveBayes(
      df: DataFrame, textCol: String, idCol: String,
      labelCol: String): DataFrame = {
    val toks = df.select(col(idCol), col(labelCol).as("__cls"),
      explode(TextFunctions.tokens(col(textCol))).as("__term"))
    // per-document term frequencies + doc length
    val dt = toks.groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dlen = dt.groupBy(col(idCol)).agg(sum(col("__tf")).as("__n"))
    // class model: token counts, class token totals, doc priors, vocab
    val ctc = toks.groupBy(col("__cls"), col("__term"))
      .agg(count(lit(1)).as("__c"))
    val classTot = ctc.groupBy(col("__cls"))
      .agg(sum(col("__c")).as("__ct"))
    val priors = df.groupBy(col(labelCol).as("__cls"))
      .agg(count(lit(1)).as("__dc"))
    val nDocs = df.select(count(lit(1)).as("__d"))
    val vocab = ctc.select(countDistinct(col("__term")).as("__v"))
    // Σ_t tf·ln(cnt+1): absent pairs are exactly 0, so inner join on term
    val partial = dt.join(ctc, Seq("__term"))
      .withColumn("__w",
        (col("__tf") * round(log(col("__c") + lit(1)), 12))
          .cast("decimal(38,12)"))
      .groupBy(col(idCol), col("__cls"))
      .agg(sum(col("__w")).as("__s"))
    // dense (doc × class) grid for prior + length-penalty terms; the
    // class side is ≤ |classes| rows — broadcast, no shuffle
    val classes = broadcast(
      priors.join(classTot, Seq("__cls")).crossJoin(nDocs).crossJoin(vocab)
        .select(col("__cls"),
          round(log(col("__dc").cast("double") / col("__d")), 12)
            .cast("decimal(38,12)").as("__prior"),
          round(log((col("__ct") + col("__v")).cast("double")), 12)
            .cast("decimal(38,12)").as("__denom")))
    // one double expression over exact decimal inputs — NOT decimal
    // arithmetic: long × decimal(38,12) trips Spark's precision-loss
    // rule (scale collapses to 6) and the hash parity dies silently
    val scored = dlen.crossJoin(classes)
      .join(partial, Seq(idCol, "__cls"), "left")
      .select(col(idCol), col("__cls"),
        (col("__prior").cast("double")
          + coalesce(col("__s"), lit(0).cast("decimal(38,12)")).cast("double")
          - col("__n").cast("double") * col("__denom").cast("double"))
          .as("__score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("__cls").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("__cls").as("pred"),
        round(col("__score"), 10).as("score"))
  }

  /** Full-batch logistic-regression gradient descent: `iters` rounds of
    * w ← w − lr·∇, ∇ the MEAN gradient of log-loss. Each round is ONE
    * distributed aggregate (per-row terms rounded to 12 dp, summed as
    * exact decimals, one double division by n) and the weight vector —
    * the only state — rides along as a literal in the next round's
    * expressions, i.e. a broadcast of O(|features|) doubles. The
    * per-round driver collect is the model, not the data: this is the
    * textbook parameter-server-free distributed GD shape and the
    * correct 100 TB plan (p passes over the data, zero shuffles).
    *
    * Weights are re-rounded to 12 dp after each update so engines that
    * differ in an ulp of exp() cannot compound drift across rounds.
    * Output: one row — n, then w_0 ("intercept"), w_1.. in feature
    * order, each rounded to 10 dp.
    */
  /** The fitted 12-dp weight vector (intercept +: per-feature) of
    * [[logisticGd]] — exposed for consumers that SCORE with the model
    * (e.g. [[Experiment.ipwAte]]'s propensities) rather than report
    * it; the driver-side state is O(p) model parameters only, never
    * data.
    */
  private[operators] def gdWeights(
      df: DataFrame, features: Seq[Column], labelCol: String,
      iters: Int, lr: Double): Array[Double] = {
    require(iters >= 1 && features.nonEmpty)
    val xs = features.zipWithIndex.map { case (f, i) =>
      f.cast("double").as(s"__x$i") }
    val base = df.select(
      (col(labelCol).cast("double").as("__y") +: xs): _*)
    val p = features.length
    var w = Array.fill(p + 1)(0.0) // intercept + one per feature
    for (_ <- 1 to iters) {
      val z = (0 until p).foldLeft(lit(w(0)): Column) { (acc, j) =>
        acc + lit(w(j + 1)) * col(s"__x$j") }
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - col("__y")
      // aggregate row IS the gradient — O(p) doubles, the model update
      val row = base
        .select((round(err, 12).cast("decimal(38,12)").as("__g0") +:
          (1 to p).map(j =>
            round(err * col(s"__x${j - 1}"), 12).cast("decimal(38,12)")
              .as(s"__g$j"))): _*)
        .agg(sum("__g0").as("__g0"),
          ((1 to p).map(j => sum(s"__g$j").as(s"__g$j"))
            :+ count(lit(1)).as("__n")): _*)
        .head()
      val n = row.getLong(p + 1).toDouble
      w = w.zipWithIndex.map { case (wj, j) =>
        val g = row.getDecimal(j).doubleValue() / n
        BigDecimal(wj - lr * g).setScale(12, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
    }
    w
  }

  /** Persist a fitted [[logisticGd]] weight row — the train-once /
    * score-everywhere split for the classifier family, completing the
    * persist pattern ([[TokenizerStore.saveBigramLm]] for LMs,
    * [[TextDedup.saveMinhashIndex]] for dedup,
    * [[Similarity]]'s index for ANN): at 100 TB the quality
    * classifier is trained on a SAMPLE once and scores every corpus
    * pass with the loaded weights; fusing train+apply (the pre-q444
    * q417 shape) re-pays training on every pass. Weights are doubles;
    * parquet round-trips them bit-exactly, so scoring with a loaded
    * model reproduces the fresh one row-for-row.
    */
  def saveWeights(weights: DataFrame, path: String): Unit =
    weights.write.mode("overwrite").parquet(path + "/logistic_weights")

  /** Load a persisted [[logisticGd]] weight row (see
    * [[saveWeights]]) — one broadcast-sized row, cross-joined into
    * the scoring expression.
    */
  def loadWeights(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/logistic_weights")

  def logisticGd(
      df: DataFrame, features: Seq[Column], labelCol: String,
      iters: Int, lr: Double): DataFrame = {
    val w = gdWeights(df, features, labelCol, iters, lr)
    val p = features.length
    val spark = df.sparkSession
    import spark.implicits._
    val out = Seq((w(0), w.drop(1))).toDF("__b", "__ws")
    out.select(
      (lit(iters).as("iters") +:
        round(col("__b"), 10).as("w_intercept") +:
        (0 until p).map(j =>
          round(col("__ws")(j), 10).as(s"w_$j"))): _*)
  }

  /** Best single-feature threshold split by weighted Gini impurity — the
    * decision stump (boosting's weak learner; also the split search at
    * one tree node). Candidates are the DISTINCT feature values:
    * aggregate (value → pos, n) first, then one cumulative window over
    * the distinct values. The window is unpartitioned by construction
    * (split search is a global argmin) but runs over the distinct-value
    * domain, not the rows — bounded by feature resolution (2-dp money
    * values here), the same bounded-alphabet argument as the exact
    * percentile operators. The row-scale work stays in the first hash
    * aggregate.
    *
    * Objective: N·giniAfter = Σ_side (t − (p² + q²)/t), assembled from
    * exact integer cumulative counts in one double expression; argmin
    * ties to the smallest threshold. Splits are "x <= v"; the largest
    * value (empty right side) is excluded.
    */
  def decisionStump(
      df: DataFrame, featureCol: String, labelCol: Column): DataFrame = {
    val agg = df.where(col(featureCol).isNotNull)
      .groupBy(col(featureCol).as("__v"))
      .agg(sum(labelCol.cast("long")).as("__p"), count(lit(1)).as("__n"))
    val w = Window.orderBy(col("__v"))
    val tot = agg.agg(sum(col("__p")).as("__tp"), sum(col("__n")).as("__tn"))
    val cum = agg
      .withColumn("__cp", sum(col("__p")).over(w))
      .withColumn("__cn", sum(col("__n")).over(w))
      .crossJoin(broadcast(tot))
      .where(col("__cn") < col("__tn")) // last value: empty right side
    def side(pos: Column, total: Column): Column = {
      val neg = total - pos
      total.cast("double") -
        (pos.cast("double") * pos.cast("double")
          + neg.cast("double") * neg.cast("double")) / total.cast("double")
    }
    val obj = side(col("__cp"), col("__cn")) +
      side(col("__tp") - col("__cp"), col("__tn") - col("__cn"))
    val ranked = cum.withColumn("__obj", obj)
      .withColumn("__rn",
        row_number().over(Window.orderBy(col("__obj").asc, col("__v").asc)))
      .where(col("__rn") === 1)
    ranked.select(
      col("__v").as("threshold"),
      col("__cn").as("n_left"),
      (col("__tn") - col("__cn")).as("n_right"),
      col("__cp").as("pos_left"),
      (col("__tp") - col("__cp")).as("pos_right"),
      round(col("__obj") / col("__tn").cast("double"), 10).as("gini_after"))
  }

  /** Gradient-boosted regression stumps: `rounds` rounds of fitting a
    * least-squares stump to the current residuals, shrunk by
    * `shrinkage` — the skeleton of every GBDT trainer (XGBoost/LightGBM
    * reduce to exactly this per node, histogram-binned). The SSE-optimal
    * split maximizes S_l²/n_l + S_r²/n_r (total SS is constant), found
    * with the same distinct-value cumulative pass as [[decisionStump]];
    * leaf values are the residual means.
    *
    * Distribution shape per round: one hash aggregate over distinct
    * feature values + one bounded-domain cumulative window + an O(1)
    * driver collect of (threshold, two leaf means) — the model, not the
    * data. Residuals are never materialized: round k's residual is an
    * EXPRESSION over the raw columns and the k−1 collected stumps, so
    * the data makes exactly `rounds` passes with no checkpoint state.
    * Per-row residual terms are rounded to 12 dp before the decimal
    * sums; leaf means are re-rounded to 12 dp so engines can't drift
    * across rounds (the [[logisticGd]] discipline).
    *
    * Output: one row per round — (round, threshold, n_left, n_right,
    * left_value, right_value, gain), leaf values pre-shrinkage, gain
    * the SSE reduction per row.
    */
  def boostedStumps(
      df: DataFrame, featureCol: String, targetCol: String,
      rounds: Int, shrinkage: Double): DataFrame = {
    require(rounds >= 1)
    val spark = df.sparkSession
    val base = df
      .where(col(featureCol).isNotNull && col(targetCol).isNotNull)
      .select(col(featureCol).cast("double").as("__x"),
        col(targetCol).cast("double").as("__y"))
    val f0 = base
      .agg((sum(col("__y").cast("decimal(28,6)")).cast("double")
        / count(lit(1)).cast("double")).as("m"))
      .head().getDouble(0)
    val bias = BigDecimal(f0).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    final case class Stump(t: Double, l: Double, r: Double, nl: Long,
      nr: Long, gain: Double)
    var fit = Vector.empty[Stump]
    for (_ <- 1 to rounds) {
      val pred = fit.foldLeft(lit(bias): Column) { (acc, s) =>
        acc + lit(shrinkage) * when(col("__x") <= s.t, lit(s.l))
          .otherwise(lit(s.r)) }
      val resid = col("__y") - pred
      val agg = base
        .groupBy(col("__x").as("__v"))
        .agg(sum(round(resid, 12).cast("decimal(38,12)")).as("__s"),
          count(lit(1)).as("__n"))
      val tot = agg.agg(sum(col("__s")).as("__ts"), sum(col("__n")).as("__tn"))
      val w = Window.orderBy(col("__v"))
      val cum = agg
        .withColumn("__cs", sum(col("__s")).over(w))
        .withColumn("__cn", sum(col("__n")).over(w))
        .crossJoin(broadcast(tot))
        .where(col("__cn") < col("__tn"))
      val sl = col("__cs").cast("double")
      val sr = (col("__ts") - col("__cs")).cast("double")
      val obj = sl * sl / col("__cn").cast("double") +
        sr * sr / (col("__tn") - col("__cn")).cast("double")
      val best = cum.withColumn("__obj", obj)
        .withColumn("__rn",
          row_number().over(Window.orderBy(col("__obj").desc, col("__v").asc)))
        .where(col("__rn") === 1)
        .select(col("__v"), col("__cs"), col("__cn"), col("__ts"),
          col("__tn"), col("__obj"))
        .head()
      val (t, cs, cn, ts, tn) = (best.getDouble(0), best.getDecimal(1),
        best.getLong(2), best.getDecimal(3), best.getLong(4))
      def r12(d: Double): Double =
        BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      val l = r12(cs.doubleValue() / cn.toDouble)
      val r = r12((ts.doubleValue() - cs.doubleValue()) / (tn - cn).toDouble)
      val gain = best.getDouble(5) -
        ts.doubleValue() * ts.doubleValue() / tn.toDouble
      fit = fit :+ Stump(t, l, r, cn, tn - cn, gain / tn.toDouble)
    }
    import spark.implicits._
    fit.zipWithIndex.map { case (s, i) =>
      (i + 1, s.t, s.nl, s.nr, s.l, s.r, s.gain) }
      .toDF("round", "threshold", "n_left", "n_right", "__l", "__r", "__g")
      .select(col("round"), col("threshold"), col("n_left"), col("n_right"),
        round(col("__l"), 10).as("left_value"),
        round(col("__r"), 10).as("right_value"),
        round(col("__g"), 10).as("gain"))
  }

  /** Model introspection for [[naiveBayes]]: the top-k most
    * discriminative tokens per class by smoothed log-odds
    * ln P(t|c) − ln P(t|¬c) (add-one both sides) — the "why did the
    * model say that" table a reviewer reads before trusting a text
    * classifier. One count aggregate + broadcast class totals; the
    * rank window partitions per class over the vocabulary (a
    * TakeOrdered per class in production; the window form keeps it
    * oracle-replayable, and k·|classes| rows come out).
    */
  def naiveBayesTopFeatures(
      df: DataFrame, textCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val toks = df.select(col(labelCol).as("__cls"),
      explode(TextFunctions.tokens(col(textCol))).as("__term"))
    val ctc = toks.groupBy(col("__cls"), col("__term"))
      .agg(count(lit(1)).as("__c"))
    val classTot = ctc.groupBy(col("__cls")).agg(sum(col("__c")).as("__tc"))
    val global = ctc.groupBy(col("__term")).agg(sum(col("__c")).as("__g"))
    val totals = broadcast(ctc.agg(sum(col("__c")).as("__t"),
      countDistinct(col("__term")).as("__v")))
    val scored = ctc
      .join(broadcast(classTot), Seq("__cls"))
      .join(global, Seq("__term"))
      .crossJoin(totals)
      .withColumn("__lo",
        log((col("__c") + lit(1)).cast("double")
          / (col("__tc") + col("__v")).cast("double"))
          - log((col("__g") - col("__c") + lit(1)).cast("double")
            / (col("__t") - col("__tc") + col("__v")).cast("double")))
    val w = Window.partitionBy(col("__cls"))
      .orderBy(col("__lo").desc, col("__term").asc)
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col("__cls").as("label"), col("__rk").cast("long").as("rank"),
        col("__term").as("term"),
        (floor(col("__lo") * lit(1e10)) / lit(1e10)).as("log_odds"))
  }

  /** Rank-1 alternating least squares on a (user, item, value) cell
    * table — the alternating-projection skeleton of every ALS
    * recommender (Koren et al. 2009), kept at rank 1 so each half-step
    * is a closed-form ratio of two aggregates: v_i = Σ u·y / Σ u²
    * over the item's observed cells, then u_u = Σ v·y / Σ v² over the
    * user's. Init u ≡ 1 (deterministic), `halfSteps` alternations.
    *
    * Distribution shape: cells aggregate once; each half-step is one
    * equi-join cell⋈factor (the small side BROADCAST — items here;
    * both sides keyed for the general case) + one hash aggregate.
    * Factors snap at 9 via floor; per-cell products snap at 6 before
    * the decimal sums (value-scale² magnitudes — 12-dp snapping would
    * breach the 2^53 cast rule).
    *
    * Output: one row per user — (user, u_factor, n_items) after the
    * final user half-step.
    */
  def alsRank1(
      df: DataFrame, userCol: String, itemCol: String, valueCol: String,
      halfSteps: Int = 2): DataFrame = {
    require(halfSteps >= 2 && halfSteps % 2 == 0,
      s"halfSteps must be even >= 2, got $halfSteps")
    def snap(c: Column, s: Double): Column = floor(c * lit(s)) / lit(s)
    val cells = df
      .where(col(userCol).isNotNull && col(itemCol).isNotNull
        && col(valueCol).isNotNull)
      .groupBy(col(userCol).as("__u"), col(itemCol).as("__i"))
      .agg(snap(sum(col(valueCol).cast("decimal(28,6)")).cast("double")
        / count(lit(1)).cast("double"), 1e6).as("__y"))
    var users = cells.select(col("__u")).distinct()
      .withColumn("__uf", lit(1.0))
    var items: DataFrame = null
    for (step <- 1 to halfSteps) {
      if (step % 2 == 1) {
        items = cells.join(users, Seq("__u"))
          .groupBy(col("__i"))
          .agg(
            sum(snap(col("__uf") * col("__y"), 1e6).cast("decimal(38,6)"))
              .cast("double").as("__n"),
            sum(snap(col("__uf") * col("__uf"), 1e6).cast("decimal(38,6)"))
              .cast("double").as("__d"))
          .select(col("__i"), snap(col("__n") / col("__d"), 1e9).as("__if"))
      } else {
        users = cells.join(broadcast(items), Seq("__i"))
          .groupBy(col("__u"))
          .agg(
            sum(snap(col("__if") * col("__y"), 1e6).cast("decimal(38,6)"))
              .cast("double").as("__n"),
            sum(snap(col("__if") * col("__if"), 1e6).cast("decimal(38,6)"))
              .cast("double").as("__d"),
            count(lit(1)).as("__k"))
          .select(col("__u"), snap(col("__n") / col("__d"), 1e9).as("__uf"),
            col("__k"))
      }
    }
    users.select(col("__u").as(userCol), col("__uf").as("u_factor"),
      col("__k").as("n_items"))
  }

  /** Approximate functional-dependency audit: for each candidate
    * determinant → dependent pair, the g3' violation rate — the fraction
    * of rows that would have to change for the FD to hold exactly:
    * 1 − Σ_det max_dep cnt / N. Zero means the FD holds; the profiler's
    * signal for key discovery, denormalization checks, and broken-join
    * forensics. One aggregate per pair over (det, dep) counts plus a
    * per-det argmax — shuffles on the determinant (the natural key), and
    * the pairs are unioned into a single result so the scan is shared.
    */
  def fdViolations(
      df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty)
    val parts = pairs.map { case (det, dep) =>
      val cnt = df.where(col(det).isNotNull && col(dep).isNotNull)
        .groupBy(col(det).as("__det"), col(dep).as("__dep"))
        .agg(count(lit(1)).as("__c"))
      cnt.groupBy(col("__det"))
        .agg(max(col("__c")).as("__m"), sum(col("__c")).as("__s"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("__s")).as("n_rows"),
          round(lit(1.0) -
            sum(col("__m")).cast("double") / sum(col("__s")).cast("double"),
            10).as("violation_rate"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_groups"), col("n_rows"), col("violation_rate"))
    }
    parts.reduce(_ unionByName _)
  }
}

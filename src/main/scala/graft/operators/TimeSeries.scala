package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling and monitoring operators over an event log:
  * OHLC bars, rolling volatility, CUSUM changepoint location, and
  * seasonal (day-of-week) anomaly scoring.
  *
  * Numeric discipline: every statistic is assembled from exact pieces —
  * decimal sums, integer counts, integer epoch-day/epoch-micro
  * arithmetic — with at most one double expression at the end, so the
  * output hash-pins across engines and partitionings. Rolling windows
  * are per-key event-time ranges (Spark `rangeBetween` over epoch
  * micros); nothing windows over an unpartitioned global ordering.
  */
object TimeSeries {

  private val MicrosPerDay = 86400L * 1000000L

  private def epochDay(ts: Column): Column =
    (unix_micros(ts) - pmod(unix_micros(ts), lit(MicrosPerDay)))
      .divide(lit(MicrosPerDay)).cast("long")

  /** OHLC bars: per (key, epoch-day) the open/high/low/close of
    * `valueCol` plus the bar's event count and exact volume (decimal
    * sum, surfaced as double). Open/close are the values at the
    * first/last event of the day under the deterministic
    * (ts, tieCol) ordering — a raw min_by/max_by on ts alone would be
    * nondeterministic when timestamps collide.
    *
    * Shape: one window pass partitioned by (key, day) to tag first/last
    * values, one hash aggregate. Both shuffle on (key, day) — high
    * cardinality and uniform, the right 100 TB key.
    */
  def ohlcDaily(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String): DataFrame = {
    val day = epochDay(col(tsCol)).as("__day")
    val w = Window.partitionBy(col(keyCol), col("__day"))
      .orderBy(col(tsCol), col(tieCol))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(col(keyCol), day, col(tsCol), col(tieCol), col(valueCol))
      .withColumn("__open", first(col(valueCol)).over(wAll))
      .withColumn("__close", last(col(valueCol)).over(wAll))
      .groupBy(col(keyCol), col("__day").as("day"))
      .agg(
        min(col("__open")).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        min(col("__close")).as("close"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(28,6)")).cast("double").as("volume"))
  }

  /** Rolling population std-dev of `valueCol` over a trailing
    * event-time window of `windowSeconds` per key (inclusive of the
    * current row, like a 24 h volatility band). Variance comes from the
    * exact in-window decimal sum and sum-of-squares:
    * var = (ss − s²/n)/n, evaluated once in double — so two engines
    * summing in different orders still agree bit-for-bit.
    *
    * Shape: one range-frame window partitioned by key over epoch
    * micros. Per-key sequential scan — the standard rolling-feature
    * shape; hot keys are the caller's concern (see
    * [[Velocity.rollingCountsPreAgg]] for the mitigation pattern).
    */
  def rollingStd(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L + 1, 0)
    // DECIMAL(18,6) operands: v² is then DECIMAL(37,12) — exact on both
    // engines (an oversized operand pushes DuckDB past INT128 to double
    // and Spark into precision-loss rounding; see timeWeightedAverage).
    val v = col(valueCol).cast("decimal(18,6)")
    val s = sum(v).over(w)
    val ss = sum(v * v).over(w)
    val n = count(lit(1)).over(w)
    df.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(valueCol),
        n.as("n_window"),
        ((ss.cast("double") - s.cast("double") * s.cast("double")
          / n.cast("double")) / n.cast("double")).as("var_window"))
      .withColumn("std_window", sqrt(greatest(col("var_window"), lit(0d))))
  }

  /** Maximum drawdown of each key's cumulative daily value series —
    * "how far below its best day did this series ever sink": running
    * peak minus current cumulative, maximized over the series. The
    * standard stability diagnostic for any monotone-ish KPI
    * (cumulative revenue, net token budget, model-score drift).
    *
    * Exact end to end: daily sums and the cumulative/running-max
    * windows all run in decimal; only the reported doubles cast at
    * the edge. Per-key windows over per-key day rows (calendar-
    * bounded), one final hash aggregate. Output one row per key:
    * (key, n_days, final_value, peak_value, max_drawdown).
    */
  def maxDrawdown(
      df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    val daily = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), epochDay(col(tsCol)).as("__d"))
      .agg(sum(v).cast("decimal(28,6)").as("__s"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("__cum", sum(col("__s")).over(wCum))
      .withColumn("__peak", max(col("__cum")).over(wCum))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_days"),
        max(struct(col("__d"), col("__cum"))).getField("__cum")
          .cast("double").as("final_value"),
        max(col("__peak")).cast("double").as("peak_value"),
        max(col("__peak") - col("__cum")).cast("double")
          .as("max_drawdown"))
      .orderBy(col(keyCol))
  }

  /** Pearson correlation between TWO keys' daily value series — the
    * co-movement diagnostic (do purchases track clicks? does error
    * volume track traffic?). Days observed by either key form the
    * sample; a day where one key is silent contributes zero for it
    * (the natural reading for activity series).
    *
    * Shape: one hash aggregate onto the epoch day (conditional sums
    * for each key), then one five-moment aggregate over the day rows
    * — exact decimals throughout, one final double expression, round 9
    * (the sqrt denominator is irrational). Output one row:
    * (n_days, sum_a, sum_b, r).
    */
  def seriesCorrelation(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      keyA: String, keyB: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    val day = epochDay(col(tsCol))
    val daily = df
      .filter(col(keyCol).isin(keyA, keyB) && col(valueCol).isNotNull)
      .groupBy(day.as("__d"))
      .agg(
        coalesce(sum(when(col(keyCol) === keyA, v)),
          lit(0).cast("decimal(18,6)")).cast("decimal(19,6)").as("__x"),
        coalesce(sum(when(col(keyCol) === keyB, v)),
          lit(0).cast("decimal(18,6)")).cast("decimal(19,6)").as("__y"))
    val m = daily.agg(
      count(lit(1)).cast("decimal(10,0)").as("__n"),
      sum(col("__x")).cast("decimal(19,6)").as("__sx"),
      sum(col("__y")).cast("decimal(19,6)").as("__sy"),
      sum(col("__x") * col("__y")).cast("decimal(28,12)").as("__sxy"),
      sum(col("__x") * col("__x")).cast("decimal(28,12)").as("__sxx"),
      sum(col("__y") * col("__y")).cast("decimal(28,12)").as("__syy"))
    m.select(
      col("__n").cast("long").as("n_days"),
      col("__sx").cast("double").as("sum_a"),
      col("__sy").cast("double").as("sum_b"),
      round(
        (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double")
          / sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double")
            * (col("__n") * col("__syy") - col("__sy") * col("__sy"))
              .cast("double")), 9).as("r"))
  }

  /** Truncated half-life EWMA over a per-key bucketed series:
    * s_t = sum_{i=0..K-1} v_{t-i} * 2^-(i+1) — the alpha = 1/2
    * exponential smoother cut at K lags (tail weight 2^-K; K = 8
    * leaves < 0.4% of the mass, and the truncation is what makes the
    * operator exactly replayable: the recursive form never forgets,
    * so two engines folding a long history in different precisions
    * drift).
    *
    * Every weight is a power of two, so each product v * 2^-(i+1) is
    * EXACT in double (scaling by 2^k only shifts the exponent), and
    * the K-term sum is the same left-associated chain on both engines
    * — bit-identical with no decimal detour and no rounding step.
    * Missing leading history counts as zero (the s_0 = 0 convention).
    *
    * Shape: one per-key ordered window carrying K lag() reads in a
    * single pass — per-key cost is the series length, never corpus
    * size. Callers feed a REGULAR series (e.g. [[Resample.resample]]
    * output) — on an irregular one the "half-life" would silently
    * mean "half per observation", not per time unit.
    */
  def ewmaTruncated(
      df: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      halvings: Int = 8): DataFrame = {
    require(halvings >= 1 && halvings <= 50,
      s"halvings must be in [1,50], got $halvings")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val terms = (0 until halvings).map { i =>
      coalesce(lag(col(valueCol).cast("double"), i).over(w), lit(0.0)) *
        lit(math.pow(2.0, -(i + 1)))
    }
    df.withColumn("ewma", terms.reduceLeft(_ + _))
  }

  /** CUSUM changepoint locator over the per-group daily series of event
    * counts: for each group, the day where the cumulative deviation
    * |Σ_{i≤t} (xᵢ − x̄)| peaks — the classic single-changepoint
    * estimate — plus the peak magnitude. The mean never materializes:
    * N·CUSUM_t = N·S_t − t·S_N is pure integer arithmetic (S_t =
    * cumulative count, S_N/N = group total/days), argmax-invariant
    * under the positive scaling by N, and exact in DECIMAL(38,0) on
    * both engines; the reported peak divides by N once in double.
    *
    * Ties on the peak break to the earliest day, so the argmax is
    * deterministic. Shape: daily hash agg, per-group totals joined
    * back on the group key, one per-group cumulative window over ≤
    * a few hundred day-rows per group, final per-group argmax agg.
    */
  def cusumChangepoint(
      df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol), epochDay(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val totals = daily.groupBy(col(groupCol))
      .agg(sum(col("n")).as("__SN"), count(lit(1)).as("__N"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("day"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCusum = daily.join(totals, Seq(groupCol))
      .withColumn("__St", sum(col("n")).over(wCum))
      .withColumn("__t", row_number().over(wOrd))
      .withColumn("__mag", abs(
        col("__N").cast("decimal(19,0)") * col("__St").cast("decimal(19,0)")
          - col("__t").cast("decimal(19,0)") * col("__SN").cast("decimal(19,0)")))
    withCusum.groupBy(col(groupCol))
      .agg(
        min_by(col("day"), struct(negate(col("__mag")), col("day"))).as("change_day"),
        (max(col("__mag")).cast("double")
          / max(col("__N")).cast("double")).as("cusum_peak"),
        max(col("__N")).as("n_days"))
  }

  /** Seasonal anomaly score: each (group, day)'s event count against
    * the group's same-day-of-week baseline. Per (group, dow) the mean
    * and population std of daily counts are exact-decimal assembled;
    * z = (n − mean)/std evaluates once in double (0 when the baseline
    * is flat). Returns the per-day scores with their baselines —
    * `abs(z) > threshold` is the caller's cut, kept out of the
    * operator so the score stays reusable.
    */
  def seasonalAnomaly(
      df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol), epochDay(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
      // 1970-01-01 is a Thursday: epoch-day mod 7 = 0 ⇒ Thursday.
      // Integer arithmetic on both engines — no locale WEEKDAY trap.
      .withColumn("dow", pmod(col("day"), lit(7L)))
    val base = daily.groupBy(col(groupCol), col("dow"))
      .agg(
        sum(col("n").cast("decimal(28,0)")).as("__s"),
        // cast-then-multiply: n² in raw BIGINT overflows once a
        // day-group passes ~3e9 rows; DECIMAL(19,0)² is exact INT128
        sum(col("n").cast("decimal(19,0)")
          * col("n").cast("decimal(19,0)")).as("__ss"),
        count(lit(1)).as("__k"))
      .select(col(groupCol), col("dow"),
        (col("__s").cast("double") / col("__k").cast("double")).as("dow_mean"),
        sqrt(greatest(
          (col("__ss").cast("double")
            - col("__s").cast("double") * col("__s").cast("double")
              / col("__k").cast("double")) / col("__k").cast("double"),
          lit(0d))).as("dow_std"))
    daily.join(base, Seq(groupCol, "dow"))
      .select(col(groupCol), col("day"), col("dow"), col("n"),
        col("dow_mean"), col("dow_std"),
        when(col("dow_std") > 0d,
          (col("n").cast("double") - col("dow_mean")) / col("dow_std"))
          .otherwise(lit(0d)).as("z"))
  }

  /** Walk-forward (expanding-window) cross-validation folds over event
    * time: the distinct epoch-days are ntile'd into `k` contiguous
    * buckets; fold f tests on bucket f and trains on every earlier
    * bucket. This is the split discipline time-ordered data demands —
    * a random k-fold leaks the future into training.
    *
    * Returns one row per fold: test-day range, test row count, and the
    * cumulative train row count (0 for fold 1, which has no past).
    *
    * Scale shape: the day->bucket map is |distinct days| rows (tiny;
    * its ntile window is a deliberate single-partition sort over days,
    * not events) and broadcasts back onto the event stream; row counts
    * pre-aggregate per day BEFORE the broadcast join, so the fold
    * summary shuffles day-level rows only.
    */
  /** Theil-Sen style robust trend: the median of pairwise slopes over
    * a DETERMINISTIC systematic pairing (row id vs id + stride) —
    * the full Theil-Sen takes all O(n^2) pairs, which no 100 TB job
    * does; stride pairing keeps the estimator's median-of-slopes
    * robustness (one outlier corrupts one pair, not the median) at
    * O(n) pairs and one equi-join. Slopes are per-day; the median is
    * the exact interpolated percentile. Output one row:
    * (n_pairs, slope_per_day).
    */
  def theilSenTrend(
      df: DataFrame, idCol: String, tsCol: String, valueCol: String,
      stride: Long): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val a = df.select(col(idCol).as("__ia"),
      unix_micros(col(tsCol)).as("__ta"), col(valueCol).cast("double").as("__va"))
    val b = df.select((col(idCol) - stride).as("__ia"),
      unix_micros(col(tsCol)).as("__tb"), col(valueCol).cast("double").as("__vb"))
    val slopes = a.join(b, Seq("__ia"))
      .where(col("__tb") =!= col("__ta"))
      .select(((col("__vb") - col("__va"))
        / ((col("__tb") - col("__ta")).cast("double") / (86400.0 * 1000000.0)))
        .as("__slope"))
    slopes.agg(
      count(lit(1)).as("n_pairs"),
      round(expr("percentile(__slope, 0.5)"), 9).as("slope_per_day"))
  }

  def walkForwardFolds(
      df: DataFrame, tsCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val perDay = df
      .groupBy(epochDay(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val bucketed = perDay.withColumn("fold",
      ntile(k).over(Window.orderBy(col("day"))))
    val perFold = bucketed.groupBy(col("fold"))
      .agg(min(col("day")).as("test_day_min"),
        max(col("day")).as("test_day_max"),
        sum(col("n")).as("test_rows"))
    val w = Window.orderBy(col("fold"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perFold
      .withColumn("train_rows",
        coalesce(sum(col("test_rows")).over(w), lit(0L)))
      .select(col("fold"), col("test_day_min"), col("test_day_max"),
        col("test_rows"), col("train_rows"))
  }

  /** Classical additive decomposition of the daily count series per
    * key (the moving-average STL-lite of every forecasting primer):
    * trend = centered 7-day moving average (defined only where the
    * full window exists), seasonal = day-of-week mean of the detrended
    * series normalized to sum 0 over the week, residual = y − trend −
    * seasonal. Reported long-form per (key, day).
    *
    * Shape: rows collapse to (key, day, count) first; the MA is a
    * per-key ±3-row window over the DAY series (bounded by calendar
    * span), dow means one hash aggregate. Exact pieces: counts are
    * integers, the MA is an integer sum / 7 single division, dow means
    * decimal-accumulate the floor-snapped detrended values.
    */
  def decomposeDaily(
      df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), epochDay(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val withTrend = daily
      .withColumn("__cnt7", count(lit(1)).over(w))
      .withColumn("__sum7", sum(col("n")).over(w))
      .withColumn("trend",
        when(col("__cnt7") === 7,
          col("__sum7").cast("double") / lit(7.0)))
      .withColumn("__dow", pmod(col("day") + lit(3), lit(7)))
    val detr = withTrend.withColumn("__det",
      floor((col("n").cast("double") - col("trend")) * lit(1e9)) / lit(1e9))
    val dow = detr.where(col("__det").isNotNull)
      .groupBy(col(keyCol), col("__dow"))
      .agg((sum(col("__det").cast("decimal(38,9)")).cast("double")
        / count(lit(1)).cast("double")).as("__dmean"))
    // normalize the 7 dow means to sum 0 (additive-decomposition
    // identity): ordered fold over the 7-row axis so both engines add
    // the same doubles in the same order (anovaF's discipline)
    val wk = Window.partitionBy(col(keyCol)).orderBy(col("__dow"))
    val norm = dow
      .withColumn("__cum", sum(floor(col("__dmean") * lit(1e9)) / lit(1e9))
        .over(wk))
      .withColumn("__k", count(lit(1)).over(
        Window.partitionBy(col(keyCol))))
      .withColumn("__tot", last(col("__cum")).over(
        wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("seasonal",
        floor((floor(col("__dmean") * lit(1e9)) / lit(1e9)
          - col("__tot") / col("__k").cast("double")) * lit(1e9)) / lit(1e9))
      .select(col(keyCol), col("__dow"), col("seasonal"))
    detr.join(norm, Seq(keyCol, "__dow"), "left")
      .select(col(keyCol), col("day"), col("n"),
        col("trend"), col("seasonal"),
        when(col("trend").isNotNull,
          floor((col("n").cast("double") - col("trend") - col("seasonal"))
            * lit(1e9)) / lit(1e9)).as("residual"))
  }

  /** Autocorrelation function of the daily event-count series per key,
    * at lags 1..maxLag: r_k = Σ(y_t − ȳ)(y_{t−k} − ȳ) / Σ(y_t − ȳ)²,
    * the standard ACF (denominator the full-series sum of squares, mean
    * the full-series mean — both exact from integer counts). Seasonality
    * shows as a comb (lag-7 spike for weekly traffic); white noise decays
    * to 0 — the first dashboard of every forecasting task.
    *
    * Shape: rows collapse to (key, day, count) in one hash aggregate;
    * the lag windows then run per key over the DAY series, bounded by
    * the calendar span, not the row count (the same bounded-domain
    * argument as the stump's distinct-value window — here it's even
    * per-key partitioned). Numerator cross-products are doubles of
    * exact integers rounded at 12 dp and decimal-summed, one double
    * division at the end.
    */
  def acf(
      df: DataFrame, keyCol: String, tsCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val daily = df.groupBy(col(keyCol), epochDay(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__n"))
    val stats = daily.groupBy(col(keyCol))
      .agg(sum(col("__n")).as("__s"), count(lit(1)).as("__t"))
      .select(col(keyCol),
        (col("__s").cast("double") / col("__t").cast("double")).as("__mean"),
        col("__t"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    val lagged = daily.join(stats, Seq(keyCol))
      .withColumn("__d", col("__n").cast("double") - col("__mean"))
      .select((col(keyCol) +: col("__day") +: col("__d") +: col("__t") +:
        (1 to maxLag).map(k => lag(col("__d"), k).over(w).as(s"__l$k"))): _*)
    val denom = lagged.groupBy(col(keyCol))
      .agg(sum(round(col("__d") * col("__d"), 12).cast("decimal(38,12)"))
        .cast("double").as("__den"), max(col("__t")).as("n_days"))
    val nums = lagged.groupBy(col(keyCol))
      .agg(
        sum(round(col("__d") * col(s"__l1"), 12).cast("decimal(38,12)"))
          .cast("double").as("__num1"),
        (2 to maxLag).map(k =>
          sum(round(col("__d") * col(s"__l$k"), 12).cast("decimal(38,12)"))
            .cast("double").as(s"__num$k")): _*)
    val joined = nums.join(denom, Seq(keyCol))
    val long = (1 to maxLag).map { k =>
      joined.select(col(keyCol), lit(k).as("lag"), col("n_days"),
        round(col(s"__num$k") / col("__den"), 10).as("acf"))
    }.reduce(_ unionByName _)
    long
  }

  /** Gap-filled daily series with linear interpolation: per key, the
    * dense day grid from the key's first to last observed day; missing
    * days interpolate linearly between the bracketing observations
    * (integer day arithmetic in the weights, so the fraction is one
    * deterministic double division). The grid endpoints are observed
    * by construction, so every gap is bracketed and nothing
    * extrapolates.
    *
    * Shape: per-key `sequence()` explode builds the grid in-row (rows
    * = days spanned, data-independent of event count); the bracketing
    * neighbors come from two window passes (last/first over the
    * IGNORE NULLS frames) partitioned by key — no self-join of the
    * grid against observations.
    *
    * Output: (keyCol, day, value, interpolated) where `value` for an
    * observed day is the exact decimal day-sum of `valueCol`.
    */
  def interpolateDaily(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .withColumn("__day", epochDay(col(tsCol)))
      .groupBy(col(keyCol), col("__day"))
      .agg(sum(col(valueCol).cast("decimal(30,6)")).cast("double")
        .as("__v"))
    val grid = daily.groupBy(col(keyCol))
      .agg(min(col("__day")).as("__d0"), max(col("__day")).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"))).as("__day"))
    val sparse = grid.join(daily, Seq(keyCol, "__day"), "left")
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    val before = ord.rowsBetween(Window.unboundedPreceding, 0)
    val after = ord.rowsBetween(0, Window.unboundedFollowing)
    sparse
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(before))
      .withColumn("__pd", last(when(col("__v").isNotNull, col("__day")),
        ignoreNulls = true).over(before))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(after))
      .withColumn("__nd", first(when(col("__v").isNotNull, col("__day")),
        ignoreNulls = true).over(after))
      .select(col(keyCol), col("__day").as("day"),
        when(col("__v").isNotNull, col("__v"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((col("__day") - col("__pd")).cast("double") /
              (col("__nd") - col("__pd")).cast("double")))
          .as("value"),
        col("__v").isNull.as("interpolated"))
  }

  /** Holt linear (double-exponential) smoothing over the DAILY event
    * count series: level s_t = a*x_t + (1-a)(s_{t-1} + b_{t-1}),
    * trend b_t = g*(s_t - s_{t-1}) + (1-g)*b_{t-1}, initialized the
    * textbook way (s_1 = x_1, b_1 = x_2 - x_1). The recursion is
    * inherently sequential, so the distribution boundary is drawn
    * where the data size is: the raw table reduces to per-day counts
    * in one distributed hash aggregate, and the fold then runs over
    * ONE array row whose length is bounded by the calendar (days
    * observed), not by the 100 TB input — `aggregate()` over the
    * sorted array, no driver collect, no window-over-everything.
    *
    * The smoothing coefficients are interpolated as SQL literals so
    * an oracle replaying the recursion (recursive CTE) folds the
    * SAME double arithmetic; outputs floor-snap at 1e9. Requires at
    * least two observed days (empty result otherwise).
    */
  def holtLinear(
      df: DataFrame, tsCol: String,
      alpha: Double = 0.3, gamma: Double = 0.2): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    require(gamma > 0 && gamma < 1, s"gamma out of (0,1): $gamma")
    val a = alpha.toString
    val ia = (1.0 - alpha).toString
    val g = gamma.toString
    val ig = (1.0 - gamma).toString
    val daily = df
      .groupBy(epochDay(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val packed = daily
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("xs"))
      .where(size(col("xs")) >= 2)
    // s_new appears twice (once for the level, once inside the trend):
    // same expression, same double — SQL spells it identically.
    val sNew = s"$a * e.x + $ia * (element_at(acc, -1).s" +
      s" + element_at(acc, -1).b)"
    val folded = packed.select(explode(expr(
      s"""aggregate(
           slice(xs, 2, size(xs) - 1),
           array(named_struct(
             'day', xs[0].day, 'x', xs[0].x,
             's', xs[0].x, 'b', xs[1].x - xs[0].x)),
           (acc, e) -> concat(acc, array(named_struct(
             'day', e.day, 'x', e.x,
             's', $sNew,
             'b', $g * (($sNew) - element_at(acc, -1).s)
               + $ig * element_at(acc, -1).b))))""")).as("r"))
    folded.select(
      col("r.day").as("day"), col("r.x").as("x"),
      (floor(col("r.s") * 1e9) / 1e9).as("level"),
      (floor(col("r.b") * 1e9) / 1e9).as("trend"))
  }

  /** Best single structural breakpoint of the daily count series:
    * for every candidate split b (left = days 1..b, right = b+1..n,
    * both segments >= 2 points), fit each segment with its own
    * simple OLS on (day index, count) and report
    * SSE_left + SSE_right; the minimizing b (ties to the earliest
    * day) is flagged `is_best`. The segmented-regression sibling of
    * [[cusumChangepoint]] — CUSUM finds a LEVEL shift, this finds a
    * TREND break.
    *
    * Scale shape: the data-sized work is the daily aggregate; both
    * segments' OLS sufficient statistics (n, Σt, Σx, Σt², Σtx, Σx²)
    * come from one cumulative window over the day series — prefix
    * sums for the left, total-minus-prefix for the right — so the
    * whole candidate sweep is O(days), not O(days · rows). Counts
    * and indexes are integers, so every cumulative is EXACT (long
    * sums); doubles appear only in the final fixed-form SSE
    * expression, which the oracle replays symbol-for-symbol.
    */
  def bestBreakpoint(df: DataFrame, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(epochDay(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val wOrd = Window.orderBy(col("day"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idx = daily
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("x", col("x").cast("long"))
    val cums = idx
      .withColumn("__st", sum(col("t")).over(wCum))
      .withColumn("__sx", sum(col("x")).over(wCum))
      .withColumn("__stt", sum(col("t") * col("t")).over(wCum))
      .withColumn("__stx", sum(col("t") * col("x")).over(wCum))
      .withColumn("__sxx", sum(col("x") * col("x")).over(wCum))
    val tot = idx.agg(
      count(lit(1)).as("__n"),
      sum(col("t")).as("__tst"), sum(col("x")).as("__tsx"),
      sum(col("t") * col("t")).as("__tstt"),
      sum(col("t") * col("x")).as("__tstx"),
      sum(col("x") * col("x")).as("__tsxx"))
    def sse(n: Column, st: Column, sx: Column, stt: Column,
        stx: Column, sxx: Column): Column = {
      val nd = n.cast("double")
      val std = st.cast("double"); val sxd = sx.cast("double")
      val sttd = stt.cast("double"); val stxd = stx.cast("double")
      val sxxd = sxx.cast("double")
      (sxxd - sxd * sxd / nd) -
        (stxd - std * sxd / nd) * (stxd - std * sxd / nd) /
          (sttd - std * std / nd)
    }
    val cand = cums.crossJoin(broadcast(tot))
      .filter(col("t") >= 2 && col("t") <= col("__n") - 2)
      .withColumn("__sse_l",
        sse(col("t"), col("__st"), col("__sx"), col("__stt"),
          col("__stx"), col("__sxx")))
      .withColumn("__sse_r",
        sse(col("__n") - col("t"), col("__tst") - col("__st"),
          col("__tsx") - col("__sx"), col("__tstt") - col("__stt"),
          col("__tstx") - col("__stx"), col("__tsxx") - col("__sxx")))
      .withColumn("__sse_t", col("__sse_l") + col("__sse_r"))
    cand
      .withColumn("is_best",
        row_number().over(Window.orderBy(col("__sse_t"), col("day"))) === 1)
      .select(col("day"), col("x"),
        (floor(col("__sse_l") * 1e6) / 1e6).as("sse_left"),
        (floor(col("__sse_r") * 1e6) / 1e6).as("sse_right"),
        (floor(col("__sse_t") * 1e6) / 1e6).as("sse_total"),
        col("is_best"))
  }
}

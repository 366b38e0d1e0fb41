package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort-retention and funnel analysis — the two workhorse event
  * analytics over an activity log (the product-analytics layer next to
  * the fraud features; same `events` input, entity + event-time
  * semantics).
  *
  * Both are pure multi-stage hash aggregations keyed by the entity —
  * no windows, no self-joins — so they scale with the activity volume
  * and shuffle only (entity, small) pairs.
  */
object EventAnalytics {

  private val MicrosPerDay = 86400L * 1000000L

  /** Day-granularity cohort retention matrix: cohort = the entity's
    * first active day (epoch days — integer arithmetic, no
    * week-definition ambiguity between engines), offset = days since
    * that first day; one row per (cohort_day, day_offset) with the
    * count of DISTINCT entities active on that offset day. Row
    * (c, 0) is the cohort's size; retention rate at offset d is
    * n_active(c, d) / n_active(c, 0) for the reader.
    *
    * Shape: collapse to distinct (entity, day) first (the log may have
    * thousands of events per entity-day), per-entity min-day as a
    * second aggregate joined back ON THE ENTITY KEY, then the final
    * (cohort, offset) count-distinct. Three key-partitioned hash
    * aggregates; nothing global.
    */
  def cohortRetention(
      df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val activeDays = df
      .select(col(keyCol),
        (unix_micros(col(tsCol))
          - pmod(unix_micros(col(tsCol)), lit(MicrosPerDay)))
          .divide(lit(MicrosPerDay)).cast("long").as("__day"))
      .distinct()
    val cohorts = activeDays.groupBy(col(keyCol))
      .agg(min(col("__day")).as("__cohort"))
    activeDays.join(cohorts, Seq(keyCol))
      .groupBy(col("__cohort").as("cohort_day"),
        (col("__day") - col("__cohort")).as("day_offset"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
  }

  /** Ordered funnel conversion: for `steps` = (s₁, …, sₖ), an entity
    * converts through step i when it has events for every s₁…sᵢ and
    * the FIRST occurrences are strictly time-ordered
    * (min_ts(s₁) < … < min_ts(sᵢ)) — the standard first-touch funnel
    * (re-visits don't resurrect an out-of-order prefix). One row per
    * step: step index (1-based), step name, n_entities that reach it.
    *
    * Shape: filter to funnel events, one hash aggregate to
    * (entity → min-ts per step, conditional-agg pivoted in-row), one
    * summary aggregate of the k prefix predicates. The per-entity state
    * is k longs regardless of activity volume.
    */
  def funnel(
      df: DataFrame, keyCol: String, tsCol: String, eventCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val firstTs = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(eventCol) === s, unix_micros(col(tsCol)))).as(s"__t$i")
    }
    val perEntity = df
      .filter(col(eventCol).isin(steps: _*))
      .groupBy(col(keyCol))
      .agg(firstTs.head, firstTs.tail: _*)
    val reached = steps.indices.map { i =>
      val prefixOk = (1 to i).foldLeft(col("__t0").isNotNull) { (acc, j) =>
        acc && col(s"__t$j").isNotNull && col(s"__t${j - 1}") < col(s"__t$j")
      }
      sum(when(prefixOk, 1L).otherwise(0L)).as(s"__n$i")
    }
    val one = perEntity.agg(reached.head, reached.tail: _*)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).cast("long").as("step_idx"), lit(s).as("step"),
        col(s"__n$i").as("n_entities"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_entities"))
      .orderBy(col("step_idx"))
  }

  /** Last-touch attribution: each conversion event credits the
    * entity's most recent PRECEDING non-conversion event type (the
    * "channel"); conversions with no preceding touch credit
    * `direct`. Output per channel: n_conversions, sum_value (exact
    * decimal-accumulated sum of the conversion's `valueCol`).
    *
    * Shape: one window partitioned by the entity key (last-ignore-nulls
    * over an unbounded-preceding frame is O(1) running state per row),
    * then a hash aggregate on the channel — the same
    * one-shuffle-then-tiny-aggregate shape as the velocity features.
    */
  def lastTouchAttribution(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      eventCol: String, valueCol: String,
      conversionEvent: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(keyCol), col(tsCol), col(tieCol), col(eventCol),
        col(valueCol))
      .withColumn("__touch",
        last(when(col(eventCol) =!= conversionEvent, col(eventCol)),
          ignoreNulls = true).over(w))
      .filter(col(eventCol) === conversionEvent)
      .groupBy(coalesce(col("__touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(25,6)")).cast("double").as("sum_value"))
  }

  /** Position-based (U-shaped) multi-touch attribution: every touch
    * BEFORE an entity's FIRST conversion shares that conversion's
    * credit — `wEnds` to the first and last touch each, the remainder
    * split evenly over the middle (1-touch journeys take 1.0, 2-touch
    * journeys wEnds-normalized 0.5/0.5) — the standard answer to
    * last-touch's structural bias toward bottom-of-funnel channels
    * ([[lastTouchAttribution]] stays as the cheap single-pass
    * companion). Entities that never convert contribute nothing.
    *
    * Shape: one window pass to locate each entity's first conversion
    * (ts, tie)-ordered, one to rank the journey's touches, then a hash
    * aggregate of per-touch credits (each credit one double expression
    * from integer rank/count operands, decimal-summed per channel).
    */
  def positionAttribution(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      eventCol: String, conversionEvent: String,
      wEnds: Double = 0.4): DataFrame = {
    require(wEnds > 0 && wEnds <= 0.5, s"wEnds must be in (0,0.5], got $wEnds")
    val byKey = Window.partitionBy(col(keyCol))
    val conv = df
      .withColumn("__cts",
        min(when(col(eventCol) === conversionEvent,
          struct(col(tsCol), col(tieCol)))).over(byKey))
      .filter(col("__cts").isNotNull)
    val touches = conv
      .filter(col(eventCol) =!= conversionEvent &&
        struct(col(tsCol), col(tieCol)) < col("__cts"))
      .withColumn("__i", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))))
      .withColumn("__k", count(lit(1)).over(byKey))
    val credit =
      when(col("__k") === 1, lit(1.0))
        .when(col("__k") === 2, lit(0.5))
        .when(col("__i") === 1 || col("__i") === col("__k"), lit(wEnds))
        .otherwise(lit(1.0 - 2 * wEnds)
          / (col("__k") - 2).cast("double"))
    touches
      .groupBy(col(eventCol).as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(credit.cast("decimal(25,12)")).cast("double"), 9)
          .as("credit"))
  }

  /** Exact Shapley-value channel attribution (Shapley 1953, the
    * cooperative-game closure of the heuristic splits above): the
    * characteristic function v(S) is the observed conversion rate of
    * entities whose touched-channel set is EXACTLY S (unobserved
    * subsets contribute v = 0), and each channel's credit is the exact
    * Shapley sum Σ_{S ∌ c} |S|!(n−1−|S|)!/n! · (v(S∪{c}) − v(S)) —
    * no sampling, no permutation draws. Fair in the axiomatic sense
    * where last-touch ([[lastTouchAttribution]]) and U-shaped
    * ([[positionAttribution]]) are positional conventions.
    *
    * Scale shape: the corpus collapses to one row per entity (distinct
    * channel bitmask + converted flag), then to one row per OBSERVED
    * mask — everything after that operates on ≤ 2^n broadcast rows,
    * so the cost is one distinct + two hash aggregates regardless of
    * corpus size. `channels.size` is capped at 8 (256 subsets); the
    * per-channel sum decimal-accumulates its ≤ 2^(n-1) double terms,
    * so the credits replay exactly in SQL.
    *
    * Output per channel: `n_units` (entities that touched it) and
    * `shapley` (credit in conversion-rate units, rounded at 12).
    */
  def shapleyAttribution(
      df: DataFrame, keyCol: String, eventCol: String, convCol: String,
      channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 8,
      s"need 1..8 channels, got ${channels.size}")
    require(channels.distinct.size == channels.size, "channels must be unique")
    val n = channels.size
    val spark = df.sparkSession
    import spark.implicits._
    val ch = broadcast(channels.zipWithIndex.toDF("channel", "__ix"))
    val touches = df.join(ch, col(eventCol) === col("channel"))
      .select(col(keyCol).as("__u"), col("__ix")).distinct()
      .groupBy(col("__u"))
      .agg(sum(expr("cast(shiftleft(1, __ix) as bigint)")).as("__mask"))
    val conv = df.groupBy(col(keyCol).as("__u"))
      .agg(max(col(convCol)).as("__c"))
    val units = conv.join(touches, Seq("__u"), "left")
      .na.fill(0L, Seq("__mask"))
    val vObs = units.groupBy(col("__mask"))
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__nc"))
    val v = spark.range(0L, 1L << n).toDF("__mask")
      .join(vObs, Seq("__mask"), "left")
      .select(col("__mask"),
        coalesce(col("__n"), lit(0L)).as("__n"),
        coalesce(col("__nc").cast("double") / col("__n"), lit(0.0)).as("__v"))
    val popcnt = (m: String) =>
      (0 until n).map(i => s"(($m >> $i) & 1)").mkString(" + ")
    def fact(x: Int): Long = (1 to x).map(_.toLong).product
    val wNum = (0 until n).map(s => s"WHEN $s THEN ${fact(s) * fact(n - 1 - s)}")
      .mkString("CASE (" + popcnt("__m0") + ") ", " ", " END")
    val base = v.select(col("__mask").as("__m0"), col("__v").as("__v0"))
      .crossJoin(ch)
      .where(expr("(__m0 >> __ix) & 1 = 0"))
      .withColumn("__m1", expr("__m0 | cast(shiftleft(1, __ix) as bigint)"))
    val v1 = broadcast(v.select(col("__mask").as("__m1"), col("__v").as("__v1")))
    val terms = base.join(v1, Seq("__m1"))
      .withColumn("__t",
        (expr(s"cast(($wNum) as double)") / lit(fact(n).toDouble))
          * (col("__v1") - col("__v0")))
    val perChannel = terms.groupBy(col("channel"))
      .agg(round(sum(col("__t").cast("decimal(30,15)")).cast("double"), 12)
        .as("shapley"))
    // entities that touched each channel, from the observed-mask rows
    val touched = vObs.crossJoin(ch)
      .where(expr("(__mask >> __ix) & 1 = 1"))
      .groupBy(col("channel")).agg(sum(col("__n")).as("n_units"))
    perChannel.join(touched, Seq("channel"), "left")
      .na.fill(0L, Seq("n_units"))
      .select(col("channel"), col("n_units"), col("shapley"))
  }

  /** Behavioral entropy per entity: Shannon entropy (nats) of the
    * entity's event-type distribution over a FIXED category list plus
    * an `other` bucket — the bot/script detector (a human mixes
    * views/clicks/purchases, entropy > 0; a scripted account hammering
    * one action has entropy ≈ 0 at any volume, which raw counts hide).
    *
    * The category list is fixed so the entropy expression is one
    * static left-associated chain of `p·ln p` terms — both engines
    * evaluate the same additions in the same order, making an
    * ln()-derived statistic deterministic enough to hash (with the
    * round-to-12 transport convention). A dynamic per-group term set
    * would sum doubles in nondeterministic order.
    *
    * Shape: one hash aggregate (conditional counts pivot in-row), the
    * entropy is a scalar expression over that row. One shuffle.
    */
  def behavioralEntropy(
      df: DataFrame, keyCol: String, eventCol: String,
      categories: Seq[String]): DataFrame = {
    require(categories.nonEmpty, "categories must be non-empty")
    require(categories.distinct.size == categories.size,
      "categories must be distinct")
    val cat = when(col(eventCol).isin(categories: _*), col(eventCol))
      .otherwise("other")
    val buckets = categories :+ "other"
    val aggs = count(lit(1)).as("n") +: buckets.zipWithIndex.map {
      case (c, i) => sum(when(cat === c, 1L).otherwise(0L)).as(s"__c$i")
    }
    val counts = df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val terms = buckets.indices.map { i =>
      val p = col(s"__c$i").cast("double") / col("n")
      when(col(s"__c$i") > 0, p * log(p)).otherwise(lit(0.0))
    }
    counts
      .withColumn("entropy", -terms.reduce(_ + _))
      .select(col(keyCol), col("n"), col("entropy"))
  }

  /** Time-weighted average value per entity (TWAP): each event's value
    * is weighted by its DWELL — the microseconds until the entity's
    * next event — so a value held for an hour counts 3600× one held a
    * second (the right average for state-like signals sampled at
    * irregular event times: balances, prices, risk scores). The last
    * event has no dwell and is excluded; entities with one event emit
    * a NULL twap. Output: key, n_weighted (events carrying weight),
    * dwell_us_total, twap.
    *
    * Exactness: dwell is integer micros, value·dwell accumulates in
    * DECIMAL (exact, order-independent), ONE double division at the
    * end — the engine-parity discipline of the sum/mean operators.
    * The operand precisions are deliberately tight — DECIMAL(18,6)
    * value × DECIMAL(19,0) dwell = DECIMAL(38,6) — because an
    * oversized product (> 38 digits) makes DuckDB fall back to double
    * arithmetic, while an operand under 19 digits keeps DuckDB on
    * overflow-checked INT64 storage — 18,6 × 19,0 is the window where
    * both engines stay exact INT128 decimal.
    * Shape: one entity-keyed lead window, then a hash aggregate that
    * reuses the window's partitioning. One shuffle.
    */
  def timeWeightedAverage(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__us"), col(tieCol))
    df.select(col(keyCol), col(tieCol),
        unix_micros(col(tsCol)).as("__us"),
        col(valueCol).cast("decimal(18,6)").as("__v"))
      .withColumn("__dwell", lead(col("__us"), 1).over(w) - col("__us"))
      .groupBy(col(keyCol))
      .agg(
        count(col("__dwell")).as("n_weighted"),
        sum(col("__dwell")).as("dwell_us_total"),
        (sum(col("__v") * col("__dwell").cast("decimal(19,0)"))
          .cast("double")
          / sum(col("__dwell")).cast("double")).as("twap"))
  }

  private val MicrosPerDayTS = 86400L * 1000000L

  /** Longest consecutive-active-day streak per entity — textbook
    * gaps-and-islands: distinct (entity, epoch-day), island id =
    * day − row_number() over the entity's day order (constant within a
    * run of consecutive days), island length = count, then per-entity
    * max. Also reports the streak's start day (earliest longest
    * island — deterministic tie-break) and total active days.
    *
    * Shape: distinct + two entity-keyed aggregates and one entity
    * window — every shuffle is on the entity key; per-entity row
    * volume is bounded by the calendar (≤ days in the corpus), so no
    * skew hazard even for bot-grade entities.
    */
  def activityStreaks(
      df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val days = df.select(col(keyCol),
        (unix_micros(col(tsCol)) - pmod(unix_micros(col(tsCol)),
          lit(MicrosPerDayTS))).divide(lit(MicrosPerDayTS))
          .cast("long").as("__day"))
      .distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    val islands = days
      .withColumn("__island", col("__day") - row_number().over(w))
      .groupBy(col(keyCol), col("__island"))
      .agg(count(lit(1)).as("__len"), min(col("__day")).as("__start"))
    islands.groupBy(col(keyCol))
      .agg(
        max(col("__len")).as("longest_streak"),
        min_by(col("__start"), struct(negate(col("__len")), col("__start")))
          .as("streak_start_day"),
        sum(col("__len")).as("active_days"))
  }

  /** First-order Markov transition matrix over per-entity event-type
    * sequences: P(next = b | current = a) estimated from all adjacent
    * pairs under the deterministic (ts, tie) ordering. Output one row
    * per observed (from_type, to_type) with the pair count and the
    * row-normalized probability (exact counts; one double division).
    *
    * Shape: one entity-keyed lead window, a hash aggregate on the
    * (from, to) pair — tiny alphabet², so the final agg is trivially
    * broadcastable downstream — and a from-type window for the
    * normalizer (runs on the already-small pair table).
    */
  def markovTransitions(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      eventCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(eventCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_pairs"))
    val wf = Window.partitionBy(col("from_type"))
    pairs.select(col("from_type"), col("to_type"), col("n_pairs"),
      (col("n_pairs").cast("double")
        / sum(col("n_pairs")).over(wf).cast("double")).as("p"))
  }

  /** RFM (recency / frequency / monetary) segmentation — the classic
    * customer-value cube: per entity, days since last activity
    * (relative to the corpus's last day, so the operator is
    * reproducible on a frozen snapshot), event count, and exact-sum
    * monetary value; each dimension scored 1–5 against its own
    * quintile breakpoints (5 = best: most recent / most frequent /
    * highest value).
    *
    * Scoring uses exact interpolated quantile BREAKPOINTS broadcast
    * onto the rows — not `ntile`, whose global ordering would funnel
    * every entity through one window partition at scale. Breakpoint
    * comparison is `<=` on the raw statistic, so entities tied on a
    * breakpoint score identically (ntile would split them by
    * partition order — nondeterministic).
    */
  def rfmSegments(
      df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val perUser = df.groupBy(col(keyCol))
      .agg(
        max(unix_micros(col(tsCol))).as("__last_us"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(28,6)")).cast("double")
          .as("monetary"))
    val maxDay = perUser.select(
      max((col("__last_us") - pmod(col("__last_us"), lit(MicrosPerDayTS)))
        .divide(lit(MicrosPerDayTS)).cast("long")).as("__max_day"))
    val rfm = perUser
      .crossJoin(broadcast(maxDay))
      .select(col(keyCol),
        (col("__max_day")
          - (col("__last_us") - pmod(col("__last_us"), lit(MicrosPerDayTS)))
            .divide(lit(MicrosPerDayTS)).cast("long")).as("recency_days"),
        col("frequency"), col("monetary"))
    val breaks = rfm.select(
      expr("percentile(recency_days, array(0.2d, 0.4d, 0.6d, 0.8d))")
        .as("__rb"),
      expr("percentile(frequency, array(0.2d, 0.4d, 0.6d, 0.8d))")
        .as("__fb"),
      expr("percentile(monetary, array(0.2d, 0.4d, 0.6d, 0.8d))")
        .as("__mb"))
    def scoreAsc(c: org.apache.spark.sql.Column, b: String) =
      lit(1L) + (0 to 3).map(i =>
        when(c > element_at(col(b), i + 1), 1L).otherwise(0L))
        .reduce(_ + _)
    val scored = rfm.crossJoin(broadcast(breaks))
      .select(col(keyCol), col("recency_days"), col("frequency"),
        col("monetary"),
        // recency: LOW days = best -> invert the ascending score
        (lit(6L) - scoreAsc(col("recency_days").cast("double"), "__rb"))
          .as("r_score"),
        scoreAsc(col("frequency").cast("double"), "__fb").as("f_score"),
        scoreAsc(col("monetary"), "__mb").as("m_score"))
    scored.withColumn("segment",
      concat(col("r_score"), col("f_score"), col("m_score")))
  }

  /** Kaplan–Meier survival TABLE for signup → first-purchase
    * conversion: per distinct observed duration d (integer days from
    * the entity's first `startEvent` to its first subsequent
    * `endEvent`), the number of conversion events at d, the number
    * censored at d (entities that never converted, censored at the
    * corpus's last day), the at-risk count (entities with duration ≥
    * d — converted or censored; the KM denominator), and the step
    * factor 1 − d_events/at_risk. The survival curve is the running
    * product of step factors — left to the reader because a float
    * product is order-sensitive; every emitted column here is exact
    * integers plus one double division.
    *
    * Shape: two entity-keyed aggregates, then the KM roll-up runs on
    * the DURATION table — at most one row per distinct day, so the
    * unpartitioned cumulative window at the end scans a
    * calendar-bounded handful of rows, not the corpus.
    */
  def survivalTable(
      df: DataFrame, keyCol: String, tsCol: String,
      eventCol: String, startEvent: String, endEvent: String): DataFrame = {
    val horizon = df.select(max(unix_micros(col(tsCol))).as("__h"))
    val starts = df.where(col(eventCol) === startEvent)
      .groupBy(col(keyCol))
      .agg(min(unix_micros(col(tsCol))).as("__s_us"))
    val ends = df.where(col(eventCol) === endEvent)
      .select(col(keyCol).as("__ek"), unix_micros(col(tsCol)).as("__e_us"))
    // e ≥ s lives IN the join condition: a post-join filter would drop
    // entities whose only end-events precede the start (they must
    // surface as censored, not vanish)
    val durations = starts
      .join(ends, starts(keyCol) === col("__ek")
        && col("__e_us") >= col("__s_us"), "left")
      .groupBy(col(keyCol), col("__s_us"))
      .agg(min(col("__e_us")).as("__first_e"))
      .crossJoin(broadcast(horizon))
      .select(col(keyCol),
        when(col("__first_e").isNotNull,
          ((col("__first_e") - col("__s_us")) / lit(MicrosPerDayTS))
            .cast("long"))
          .otherwise(((col("__h") - col("__s_us")) / lit(MicrosPerDayTS))
            .cast("long")).as("dur_day"),
        col("__first_e").isNotNull.as("observed"))
    val byDur = durations.groupBy(col("dur_day"))
      .agg(
        sum(when(col("observed"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("observed"), 0L).otherwise(1L)).as("n_censored"),
        count(lit(1)).as("__n_all"))
    val w = Window.orderBy(col("dur_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = durations.select(count(lit(1)).as("__total"))
    byDur.crossJoin(broadcast(total))
      .withColumn("n_at_risk",
        col("__total") - sum(col("__n_all")).over(w) + col("__n_all"))
      .where(col("n_events") > 0)
      .select(col("dur_day"), col("n_events"), col("n_censored"),
        col("n_at_risk"),
        (lit(1.0d) - col("n_events").cast("double")
          / col("n_at_risk").cast("double")).as("km_factor"))
  }

  /** Top event-type n-gram paths: the frequency table of length-`n`
    * consecutive event-type sequences across per-entity timelines
    * (the "what do users do next" path analysis). Deterministic
    * (ts, tie) ordering; paths render as "a>b>c".
    *
    * Shape: n−1 stacked leads inside ONE entity-keyed window pass,
    * then a hash aggregate on the path string — alphabetⁿ distinct
    * keys at most.
    */
  def eventPathNgrams(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      eventCol: String, n: Int): DataFrame = {
    require(n >= 2 && n <= 5, s"path length out of range: $n")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val withLeads = (1 until n).foldLeft(
      df.select(col(keyCol), col(tsCol), col(tieCol),
        col(eventCol).as("__e0"))) { (acc, k) =>
      acc.withColumn(s"__e$k", lead(col("__e0"), k).over(w))
    }
    withLeads
      .where(col(s"__e${n - 1}").isNotNull)
      .select(concat_ws(">", (0 until n).map(k => col(s"__e$k")): _*)
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
  }

  /** Cumulative-user growth curve: per day, the number of entities
    * whose FIRST activity fell on that day (new users) and the
    * running total (the classic cumulative-signups chart). The
    * cumulative window runs over the per-day table — calendar-bounded
    * rows, so the unpartitioned frame is safe at any corpus size.
    */
  def cumulativeUsers(
      df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val firstDay = df.groupBy(col(keyCol))
      .agg(min((unix_micros(col(tsCol))
        - pmod(unix_micros(col(tsCol)), lit(MicrosPerDayTS)))
        .divide(lit(MicrosPerDayTS)).cast("long")).as("day"))
    val perDay = firstDay.groupBy(col("day"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.withColumn("n_cumulative", sum(col("n_new")).over(w))
  }

  /** Trailing-window active entities (the WAU/MAU family): per day,
    * the count of DISTINCT entities active in the trailing
    * `windowDays` days (inclusive). A count-distinct over a sliding
    * range frame isn't expressible as a window, so each active
    * (entity, day) is fanned out to the `windowDays` report days it
    * supports — a constant ×w map-side fan-out of small rows, then
    * distinct + count keyed by day. Report days are clamped to the
    * corpus's observed range.
    */
  def rollingActiveUsers(
      df: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 90,
      s"windowDays out of range: $windowDays")
    val days = df.select(col(keyCol),
      (unix_micros(col(tsCol)) - pmod(unix_micros(col(tsCol)),
        lit(MicrosPerDayTS))).divide(lit(MicrosPerDayTS))
        .cast("long").as("__day"))
      .distinct()
    val bounds = days.select(max(col("__day")).as("__max_day"))
    days
      .select(col(keyCol), col("__day"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__off"))
      .select(col(keyCol), (col("__day") + col("__off")).as("day"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .where(col("day") <= col("__max_day"))
      .groupBy(col("day"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
  }

  /** Event-type co-occurrence similarity (the bipartite projection of
    * the entity↔type graph): for each unordered type pair, the number
    * of entities touching both, with cosine similarity
    * n_both / √(n_a · n_b) over exact counts. The classic
    * "items engaged together" signal.
    *
    * Shape: distinct (entity, type), an entity-keyed self-join — safe
    * because the per-entity type list is bounded by the alphabet, so
    * the join fan-out is ≤ |alphabet|² per entity, not |events|² —
    * then a pair-keyed aggregate and a broadcast join against the
    * per-type marginals.
    */
  def typeCooccurrence(
      df: DataFrame, keyCol: String, eventCol: String): DataFrame = {
    val et = df.select(col(keyCol), col(eventCol)).distinct()
    val marg = et.groupBy(col(eventCol).as("t")).agg(count(lit(1)).as("n_t"))
    val pairs = et.as("a")
      .join(et.as("b"), col(s"a.$keyCol") === col(s"b.$keyCol")
        && col(s"a.$eventCol") < col(s"b.$eventCol"))
      .groupBy(col(s"a.$eventCol").as("type_a"),
        col(s"b.$eventCol").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(marg).as("ma"), col("type_a") === col("ma.t"))
      .join(broadcast(marg).as("mb"), col("type_b") === col("mb.t"))
      .select(col("type_a"), col("type_b"), col("n_both"),
        (col("n_both").cast("double")
          / sqrt(col("ma.n_t").cast("double")
            * col("mb.n_t").cast("double"))).as("cosine"))
  }

  /** Gini-Simpson diversity of a categorical column per key: for each
    * key, 1 - sum(c_t^2)/n^2 over its category counts (0 = one
    * category, ->1 = spread thin) plus the inverse-Simpson "effective
    * category count" n^2/sum(c_t^2). Complements entropy: Simpson
    * weighs dominant categories, entropy weighs the tail.
    *
    * Integer-exact all the way — c^2 sums in decimal (a 100 TB key can
    * pass 2^63 on the square), ONE double division at the end — so the
    * result hash-pins. Two hash aggregates, no window.
    */
  def diversityIndex(
      df: DataFrame, keyCol: String, catCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col(keyCol))
      .agg(sum(col("__c")).as("n"),
        count(lit(1)).as("n_cats"),
        sum(col("__c").cast("decimal(19,0)")
          * col("__c").cast("decimal(19,0)")).as("__ss"))
      .select(col(keyCol), col("n"), col("n_cats"),
        round(lit(1.0)
          - col("__ss").cast("double")
            / (col("n").cast("double") * col("n").cast("double")), 12)
          .as("simpson"),
        round(col("n").cast("double") * col("n").cast("double")
          / col("__ss").cast("double"), 12).as("inv_simpson"))
  }

  /** Event-time disorder audit for choosing a streaming watermark:
    * per key, an event's lateness is how far its event time sits
    * behind the key's running event-time high-water mark in arrival
    * order (`arrivalCol` — a monotone ingest id). The output is, for
    * each candidate watermark delay, how many events a stateful
    * streaming job with that watermark would drop as too-late, and
    * the observed maximum lateness — the number that turns "pick
    * 10 minutes?" into a measured tradeoff.
    *
    * The running max is a per-key ordered window (shuffles once on
    * the key, like every sessionization here); the threshold sweep is
    * an in-row array explode over a handful of candidates, and the
    * final aggregate is a couple of counters per threshold. Lateness
    * stays in integer microseconds end to end — no double drift.
    */
  def latenessAudit(
      df: DataFrame, keyCol: String, tsCol: String, arrivalCol: String,
      thresholdsSec: Seq[Long]): DataFrame = {
    require(thresholdsSec.nonEmpty, "need at least one threshold")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = df
      .withColumn("__hwm", max(unix_micros(col(tsCol))).over(w))
      .withColumn("__late_us",
        greatest(coalesce(col("__hwm") - unix_micros(col(tsCol)), lit(0L)),
          lit(0L)))
    late
      .select(col("__late_us"),
        explode(array(thresholdsSec.map(lit): _*)).as("threshold_sec"))
      .groupBy(col("threshold_sec"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("__late_us") > col("threshold_sec") * 1000000L, 1L)
          .otherwise(0L)).as("n_dropped"),
        max(col("__late_us")).as("max_late_us"))
      .select(col("threshold_sec"), col("n_events"), col("n_dropped"),
        round(col("n_dropped").cast("double") / col("n_events"), 12)
          .as("drop_frac"),
        col("max_late_us"))
  }

  /** Two-state HMM forward log-likelihood per entity — the sequence-
    * model upgrade of [[markovTransitions]]: score each entity's
    * ordered event-type sequence under a fixed two-state HMM (e.g.
    * "browsing" vs "buying" regimes) and surface the posterior of
    * state 0 after the last event. Anomalously ordered sequences score
    * low — a behavioral-anomaly feature the per-transition Markov lift
    * can't express (it has no hidden state).
    *
    * Formulation: the chain transitions BEFORE every emission, from
    * the prior pi at step 1 (state_1 ~ pi*P) — one uniform fold step,
    * no special-cased head. The forward pass is SCALED: alphas
    * renormalize each step and the log of each step's mass accumulates,
    * so a million-event sequence cannot underflow.
    *
    * Shape: one hash aggregate collects each entity's (ts, tie, e0, e1)
    * list (entity sequences bound the list, not the corpus); the fold
    * is a codegen'd `aggregate` higher-order function — per-row compute,
    * no shuffle beyond the collect. Cross-engine parity: the fold body
    * is straight-line +,*,/ and one ln per step over identical IEEE
    * doubles; emission/transition constants are exact literals.
    *
    * @param emissions (eventType -> (p_emit_state0, p_emit_state1)) in
    *                  a Seq — deterministic when-chain order; unlisted
    *                  types emit `defaultEmit` in both states
    */
  def hmmForward(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      emissions: Seq[(String, (Double, Double))],
      trans: ((Double, Double), (Double, Double)) = ((0.85, 0.15), (0.25, 0.75)),
      prior: (Double, Double) = (0.6, 0.4),
      defaultEmit: Double = 0.2): DataFrame = {
    val ((p00, p01), (p10, p11)) = trans
    val e0 = emissions.foldLeft(lit(defaultEmit)) { case (acc, (t, (a, _))) =>
      when(col(typeCol) === t, lit(a)).otherwise(acc)
    }
    val e1 = emissions.foldLeft(lit(defaultEmit)) { case (acc, (t, (_, b))) =>
      when(col(typeCol) === t, lit(b)).otherwise(acc)
    }
    val seqs = df
      .select(col(keyCol), struct(unix_micros(col(tsCol)).as("t"),
        col(tieCol).as("k"), e0.as("e0"), e1.as("e1")).as("__e"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(col("__e"))).as("__seq"))
    val init = struct(lit(prior._1).as("a0"), lit(prior._2).as("a1"),
      lit(0.0).as("ll"))
    // the per-step mass is inlined (not bound to a local) so the Spark
    // and oracle expression trees are operation-for-operation identical
    def u0(acc: Column, x: Column) =
      (acc.getField("a0") * p00 + acc.getField("a1") * p10) *
        x.getField("e0")
    def u1(acc: Column, x: Column) =
      (acc.getField("a0") * p01 + acc.getField("a1") * p11) *
        x.getField("e1")
    val folded = seqs.withColumn("__f",
      aggregate(col("__seq"), init, (acc, x) => struct(
        (u0(acc, x) / (u0(acc, x) + u1(acc, x))).as("a0"),
        (u1(acc, x) / (u0(acc, x) + u1(acc, x))).as("a1"),
        (acc.getField("ll") + log(u0(acc, x) + u1(acc, x))).as("ll"))))
    folded.select(col(keyCol),
      size(col("__seq")).cast("long").as("n_events"),
      col("__f.ll").as("log_likelihood"),
      col("__f.a0").as("p_state0"))
  }

  /** Viterbi best-path log-score of the same two-state HMM as
    * [[hmmForward]] (max-product instead of sum-product): the
    * likelihood of the single most probable hidden-state path, plus
    * which state that path ends in. The forward/Viterbi score gap is
    * the classic "how concentrated is the posterior on one regime
    * path" diagnostic.
    *
    * Runs entirely in LOG space with pre-logged constants, so every
    * fold step is additions and `greatest` only — no division, no
    * per-step `ln` — and the result is bit-exact in any IEEE engine
    * (the caller embeds the same 17-digit log literals in its oracle).
    * End-state ties (exactly equal path scores) resolve to state 0.
    */
  def hmmViterbiScore(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      emissions: Seq[(String, (Double, Double))],
      trans: ((Double, Double), (Double, Double)) = ((0.85, 0.15), (0.25, 0.75)),
      prior: (Double, Double) = (0.6, 0.4),
      defaultEmit: Double = 0.2): DataFrame = {
    val ((p00, p01), (p10, p11)) = trans
    def lg(x: Double): Double = math.log(x)
    val le0 = emissions.foldLeft(lit(lg(defaultEmit))) {
      case (acc, (t, (a, _))) =>
        when(col(typeCol) === t, lit(lg(a))).otherwise(acc)
    }
    val le1 = emissions.foldLeft(lit(lg(defaultEmit))) {
      case (acc, (t, (_, b))) =>
        when(col(typeCol) === t, lit(lg(b))).otherwise(acc)
    }
    val seqs = df
      .select(col(keyCol), struct(unix_micros(col(tsCol)).as("t"),
        col(tieCol).as("k"), le0.as("le0"), le1.as("le1")).as("__e"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(col("__e"))).as("__seq"))
    val init = struct(lit(lg(prior._1)).as("v0"), lit(lg(prior._2)).as("v1"))
    val folded = seqs.withColumn("__f",
      aggregate(col("__seq"), init, (acc, x) => struct(
        (greatest(acc.getField("v0") + lg(p00),
          acc.getField("v1") + lg(p10)) + x.getField("le0")).as("v0"),
        (greatest(acc.getField("v0") + lg(p01),
          acc.getField("v1") + lg(p11)) + x.getField("le1")).as("v1"))))
    folded.select(col(keyCol),
      size(col("__seq")).cast("long").as("n_events"),
      greatest(col("__f.v0"), col("__f.v1")).as("viterbi_logprob"),
      when(col("__f.v0") >= col("__f.v1"), 0).otherwise(1)
        .as("best_end_state"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
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
}

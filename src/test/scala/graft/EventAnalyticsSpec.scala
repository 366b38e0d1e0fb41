package graft

import java.sql.Timestamp

import graft.operators.EventAnalytics

/** cohortRetention / funnel — event-analytics semantics on literal
  * frames with hand-computed answers.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: first day defines the cohort; offsets count distinct users") {
    val df = Seq(
      // users 1,2 start day 0; user 1 returns day 1 and day 3 (twice)
      (1L, ts("2024-01-01 08:00:00")),
      (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-04 10:00:00")),
      (1L, ts("2024-01-04 11:00:00")), // same day twice -> one active-day
      (2L, ts("2024-01-01 23:59:59")),
      // user 3 starts day 1
      (3L, ts("2024-01-02 00:00:00")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(df, "user_id", "ts")
      .orderBy($"cohort_day", $"day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val day0 = ts("2024-01-01 00:00:00").getTime * 1000 / 86400000000L
    assert(got.toSeq === Seq(
      (day0, 0L, 2L),      // users 1 and 2 on their first day
      (day0, 1L, 1L),      // user 1 returns next day
      (day0, 3L, 1L),      // user 1 returns day 3 (deduped)
      (day0 + 1, 0L, 1L))) // user 3's own cohort
  }

  test("lastTouchAttribution: latest preceding touch wins; no touch = direct") {
    val df = Seq(
      // u1: view, click, purchase(10) -> click credited
      (1L, ts("2024-01-01 00:00:01"), 11L, "view", 0.0),
      (1L, ts("2024-01-01 00:00:02"), 12L, "click", 0.0),
      (1L, ts("2024-01-01 00:00:03"), 13L, "purchase", 10.0),
      // u1 second purchase with no new touch -> still click (last touch)
      (1L, ts("2024-01-01 00:00:04"), 14L, "purchase", 5.0),
      // u2: purchase first (direct), then view, purchase -> view
      (2L, ts("2024-01-01 00:00:01"), 21L, "purchase", 7.0),
      (2L, ts("2024-01-01 00:00:02"), 22L, "view", 0.0),
      (2L, ts("2024-01-01 00:00:03"), 23L, "purchase", 3.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = graft.operators.EventAnalytics.lastTouchAttribution(
      df, "user_id", "ts", "event_id", "event_type", "value", "purchase")
      .orderBy($"channel")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      ("click", 2L, 15.0), ("direct", 1L, 7.0), ("view", 1L, 3.0)))
  }

  test("behavioralEntropy: uniform mix maxes, single-action zero, other-bucket folds") {
    val df = Seq(
      (1L, "view"), (1L, "click"),            // 50/50 -> ln 2
      (2L, "view"), (2L, "view"), (2L, "view"), // single action -> 0
      (3L, "weird"), (3L, "odd"), (3L, "view")) // 2 unknowns fold into other
      .toDF("user_id", "event_type")
    val got = graft.operators.EventAnalytics.behavioralEntropy(
      df, "user_id", "event_type", Seq("click", "view", "purchase", "error"))
      .orderBy($"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(math.abs(got(0)._3 - math.log(2)) < 1e-12)
    assert(got(1)._3 === 0.0)
    // user 3: other=2/3, view=1/3
    val p1 = 2.0 / 3; val p2 = 1.0 / 3
    assert(math.abs(got(2)._3 - -(p1 * math.log(p1) + p2 * math.log(p2))) < 1e-12)
  }

  test("timeWeightedAverage: dwell-weighted mean; last event carries no weight") {
    val df = Seq(
      // u1: value 10 held 1s, value 100 held 3s, final value 7 unweighted
      // twap = (10*1e6 + 100*3e6) / 4e6 = 77.5
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:00:01"), 2L, 100.0),
      (1L, ts("2024-01-01 00:00:04"), 3L, 7.0),
      // u2: single event -> no dwell, NULL twap
      (2L, ts("2024-01-01 00:00:00"), 4L, 50.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = graft.operators.EventAnalytics.timeWeightedAverage(
      df, "user_id", "ts", "event_id", "value")
      .orderBy($"user_id").collect()
    val u1 = got(0)
    assert(u1.getAs[Long]("n_weighted") === 2L)
    assert(u1.getAs[Long]("dwell_us_total") === 4000000L)
    assert(u1.getAs[Double]("twap") === 77.5)
    val u2 = got(1)
    assert(u2.getAs[Long]("n_weighted") === 0L &&
      u2.isNullAt(u2.fieldIndex("twap")))
  }

  test("percentileBands: exact interpolated quartiles on a known set") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0)).toDF("g", "v")
    val got = graft.operators.Eda.percentileBands(
      df, "g", "v", Seq(0.25, 0.5, 1.0))
      .orderBy($"g").collect()
    // 4 values: p25 interpolates at rank 1.75 -> 1.75; p50 -> 2.5
    assert(got(0).getAs[Double]("p25") === 1.75)
    assert(got(0).getAs[Double]("p50") === 2.5)
    assert(got(0).getAs[Double]("p100") === 4.0)
    assert(got(1).getAs[Double]("p50") === 10.0)
  }

  test("funnel: strict first-touch ordering; out-of-order prefix blocks later steps") {
    val df = Seq(
      // u1 completes in order: view < click < purchase
      (1L, ts("2024-01-01 00:00:01"), "view"),
      (1L, ts("2024-01-01 00:00:02"), "click"),
      (1L, ts("2024-01-01 00:00:03"), "purchase"),
      // u2: click BEFORE first view -> never reaches step 2
      (2L, ts("2024-01-01 00:00:01"), "click"),
      (2L, ts("2024-01-01 00:00:02"), "view"),
      (2L, ts("2024-01-01 00:00:03"), "purchase"),
      // u3: view then click, no purchase
      (3L, ts("2024-01-01 00:00:01"), "view"),
      (3L, ts("2024-01-01 00:00:02"), "click"),
      // u4: only noise events
      (4L, ts("2024-01-01 00:00:01"), "error"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, "view", 3L),      // u1, u2, u3 all have a view
      (2L, "click", 2L),     // u1, u3 (u2's click precedes its view)
      (3L, "purchase", 1L))) // u1 only
  }

  test("positionAttribution: U-shaped credit over pre-conversion touches") {
    def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    val ev = Seq(
      // u1 journey: view, click, view -> purchase; post-conversion click ignored
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"),
      (1L, ts(3), 3L, "view"), (1L, ts(4), 4L, "purchase"),
      (1L, ts(5), 5L, "click"),
      // u2: single touch -> full credit
      (2L, ts(1), 6L, "click"), (2L, ts(2), 7L, "purchase"),
      // u3: never converts -> contributes nothing
      (3L, ts(1), 8L, "view"), (3L, ts(2), 9L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.positionAttribution(ev, "user_id", "ts",
      "event_id", "event_type", "purchase", wEnds = 0.4)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_touches"), r.getAs[Double]("credit"))).toMap
    // u1: view 0.4 (first) + view 0.4 (last) = 0.8; click middle 0.2
    // u2: click 1.0
    assert(out("view") === ((2L, 0.8)))
    assert(out("click") === ((2L, 1.2)))
    // total credit equals number of converting users
    assert(math.abs(out.values.map(_._2).sum - 2.0) < 1e-9)
  }

  test("shapleyAttribution: exact two-channel game") {
    // v({a})=1/2, v({b})=0, v({a,b})=1, v(empty)=0 ->
    // phi_a = .5*.5 + .5*1 = 0.75, phi_b = 0 + .5*.5 = 0.25
    val ev = Seq(
      (1L, "a", 0), (1L, "buy", 1),
      (2L, "a", 0),
      (3L, "a", 0), (3L, "b", 0), (3L, "buy", 1),
      (4L, "b", 0),
      (5L, "x", 0))
      .toDF("user_id", "event_type", "conv")
    val out = EventAnalytics.shapleyAttribution(
      ev, "user_id", "event_type", "conv", channels = Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_units"), r.getAs[Double]("shapley"))).toMap
    assert(out("a") === ((3L, 0.75)))
    assert(out("b") === ((2L, 0.25)))
    // efficiency: credits sum to v(grand) - v(empty) = 1
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-12)
  }
}

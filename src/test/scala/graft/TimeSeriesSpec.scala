package graft

import java.sql.Timestamp

import graft.operators.{EventAnalytics, Privacy, TimeSeries}

/** TimeSeries (OHLC / rolling std / CUSUM / seasonal anomaly),
  * the sequence-analytics additions (streaks, Markov, co-occurrence)
  * and the privacy audit — semantics on literal frames with
  * hand-computed answers.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val day0 = ts("2024-01-01 00:00:00").getTime * 1000 / 86400000000L

  test("ohlcDaily: open/close follow (ts, tie) order; high/low/volume exact") {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, 5.0),
      (1L, ts("2024-01-01 09:00:00"), 11L, 9.0), // same ts: tie on id
      (1L, ts("2024-01-01 17:00:00"), 12L, 2.0),
      (1L, ts("2024-01-02 10:00:00"), 13L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.ohlcDaily(df, "user_id", "ts", "event_id", "value")
      .orderBy($"day")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))
    assert(got.toSeq === Seq(
      (day0, 5.0, 9.0, 2.0, 2.0, 3L, 16.0),
      (day0 + 1, 7.0, 7.0, 7.0, 7.0, 1L, 7.0)))
  }

  test("rollingStd: trailing 24h window variance over exact sums") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2.0),
      (1L, ts("2024-01-01 12:00:00"), 4.0),
      (1L, ts("2024-01-02 06:00:00"), 6.0)) // first row fell out of range
      .toDF("user_id", "ts", "value")
    val got = TimeSeries.rollingStd(df, "user_id", "ts", "value", 86400L)
      .orderBy($"ts")
      .collect().map(r => (r.getLong(3), r.getDouble(5)))
    // row1: n=1 std 0; row2: {2,4} var 1 std 1; row3: {4,6} var 1 std 1
    assert(got.toSeq === Seq((1L, 0.0), (2L, 1.0), (2L, 1.0)))
  }

  test("cusumChangepoint: level shift peaks at the last pre-shift day") {
    // counts 1,1,1,5,5: mean 2.6; cusum -1.6,-3.2,-4.8,-2.4,0 -> peak day 2
    val rows = Seq.tabulate(5) { d =>
      val n = if (d < 3) 1 else 5
      Seq.fill(n)(("g", ts(f"2024-01-0${d + 1}%d 12:00:00")))
    }.flatten
    val got = TimeSeries.cusumChangepoint(
      rows.toDF("g", "ts"), "g", "ts").head()
    assert(got.getLong(1) === day0 + 2) // change_day
    assert(math.abs(got.getDouble(2) - 4.8) < 1e-12) // |N·S_t−t·S_N|/N = 24/5
    assert(got.getLong(3) === 5L)
  }

  test("seasonalAnomaly: z is 0 on a flat baseline, signed on a spike") {
    // two Mondays with 2 events, one Monday with 6: dow baseline catches it
    val rows =
      Seq.fill(2)(("g", ts("2024-01-01 10:00:00"))) ++
        Seq.fill(2)(("g", ts("2024-01-08 10:00:00"))) ++
        Seq.fill(6)(("g", ts("2024-01-15 10:00:00")))
    val got = TimeSeries.seasonalAnomaly(rows.toDF("g", "ts"), "g", "ts")
      .orderBy($"day").collect()
      .map(r => (r.getLong(3), r.getDouble(6)))
    // mean 10/3, std sqrt(56/9 - ... ) -> pop std of {2,2,6}
    val mean = 10.0 / 3
    val std = math.sqrt((4.0 + 4 + 36) / 3 - mean * mean)
    assert(got.length === 3)
    assert(math.abs(got(0)._2 - (2 - mean) / std) < 1e-9)
    assert(math.abs(got(2)._2 - (6 - mean) / std) < 1e-9)
  }

  test("activityStreaks: islands split on gaps; earliest longest wins") {
    val df = Seq(
      (1L, ts("2024-01-01 01:00:00")),
      (1L, ts("2024-01-02 01:00:00")), // streak of 2
      (1L, ts("2024-01-05 01:00:00")),
      (1L, ts("2024-01-06 01:00:00")), // another streak of 2: tie -> earliest
      (2L, ts("2024-01-03 01:00:00"))) // singleton
      .toDF("user_id", "ts")
    val got = EventAnalytics.activityStreaks(df, "user_id", "ts")
      .orderBy($"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, day0, 4L),
      (2L, 1L, day0 + 2, 1L)))
  }

  test("markovTransitions: row-normalized adjacent-pair probabilities") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1L, "a"),
      (1L, ts("2024-01-01 00:00:02"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:03"), 3L, "a"),
      (2L, ts("2024-01-01 00:00:01"), 4L, "a"),
      (2L, ts("2024-01-01 00:00:02"), 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.markovTransitions(
      df, "user_id", "ts", "event_id", "event_type")
      .orderBy($"from_type", $"to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", "b", 2L, 1.0),
      ("b", "a", 1L, 1.0)))
  }

  test("typeCooccurrence: cosine from exact entity counts") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // dup collapses
      (2L, "x"), (3L, "y"))
      .toDF("user_id", "event_type")
    val got = EventAnalytics.typeCooccurrence(df, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // n_x=2, n_y=2, both=1 -> cosine 0.5
    assert(got.toSeq === Seq(("x", "y", 1L, 0.5)))
  }

  test("kAnonymityAudit + summary: class sizes, diversity, at-risk mass") {
    val df = Seq(
      ("US", "A", 1.0), ("US", "A", 2.0), ("US", "A", 2.0),
      ("US", "B", 5.0),
      ("DE", "A", 7.0), ("DE", "A", 8.0))
      .toDF("country", "seg", "bal")
    val audit = Privacy.kAnonymityAudit(
      df, Seq("country", "seg"), "bal", k = 3, l = 2)
      .orderBy($"country", $"seg")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(audit.toSeq === Seq(
      ("DE", "A", 2L, 2L, true, false),
      ("US", "A", 3L, 2L, false, false),
      ("US", "B", 1L, 1L, true, true)))
    val s = Privacy.kAnonymitySummary(
      df, Seq("country", "seg"), "bal", k = 3, l = 2).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4))
      === ((3L, 6L, 3L, 1L, 1L)))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, TimeFeatures, Velocity}

class VelocitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: events at t0, t0+1h, t0+24h exactly, t0+25h
  private val events = Seq(
    (1L, "u1", ts("2024-01-01 00:00:00")),
    (2L, "u1", ts("2024-01-01 01:00:00")),
    (3L, "u1", ts("2024-01-02 00:00:00")), // exactly 24h after e1
    (4L, "u1", ts("2024-01-02 01:00:00")), // 24h after e2, 25h after e1
    (5L, "u2", ts("2024-01-01 00:00:00")),
    (6L, "u2", ts("2024-01-01 00:00:00"))  // same-timestamp peer
  ).toDF("event_id", "user", "t")

  test("rolling 24h counts: closed-closed frame, self excluded, peers included") {
    val got = Velocity.rollingCounts(events, "t", Seq("user"), suffix = "_n")
      .select($"event_id", $"user_n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // e3 sees e1 (exactly 24h -> included in closed-closed RANGE) and e2
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 1L))
  }

  test("pre-aggregated variant matches direct window at second granularity") {
    val a = Velocity.rollingCounts(events, "t", Seq("user"), suffix = "_n")
      .select($"event_id", col("user_n").as("n"))
    val b = Velocity.rollingCountsPreAgg(events, "t", "user", outCol = "n")
      .select($"event_id", $"n")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("hour / weekday (Mon=0) / elapsed match pandas semantics") {
    // 2024-01-01 is a Monday
    val r = events.filter($"event_id" === 2L)
      .select(
        TimeFeatures.hourOfDay($"t"),
        TimeFeatures.dayOfWeekMon0($"t"),
        TimeFeatures.secondsBetween(lit(ts("2024-01-01 00:00:00")), $"t"),
        TimeFeatures.hoursBetween(lit(ts("2024-01-01 00:00:00")), $"t"))
      .collect()(0)
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 0L)
    assert(r.getDouble(2) === 3600.0)
    assert(r.getDouble(3) === 1.0)
  }

  test("coerceTimestamps nulls unparseable strings (errors='coerce')") {
    val df = Seq("2024-01-01 10:00:00", "garbage", null).toDF("s")
    val got = Cleaning.coerceTimestamps(df, Seq("s")).collect().map(_.isNullAt(0))
    assert(got.toSeq === Seq(false, true, true))
  }

  test("dedup removes exact duplicate rows (clean_data.py:37-42)") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("x", "y")
    assert(Cleaning.dedup(df).count() === 2)
  }

  test("resample fills gaps with zero rows; sums stay exact") {
    import java.sql.Timestamp
    val df = Seq(
      ("u1", Timestamp.valueOf("2024-01-01 10:00:00"), 1.5),
      ("u1", Timestamp.valueOf("2024-01-01 23:59:59"), 2.5),
      // 2024-01-02: gap day for u1
      ("u1", Timestamp.valueOf("2024-01-03 00:00:00"), 4.0),
      ("u2", Timestamp.valueOf("2024-01-05 12:00:00"), 7.0)
    ).toDF("k", "ts", "v")
    val got = graft.operators.Resample
      .resample(df, "ts", "k", 86400000000L, "v")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(
      ("u1", "2024-01-01 00:00:00.0", 2L, 4.0),
      ("u1", "2024-01-02 00:00:00.0", 0L, 0.0), // the filled gap
      ("u1", "2024-01-03 00:00:00.0", 1L, 4.0),
      ("u2", "2024-01-05 00:00:00.0", 1L, 7.0)))
  }

  test("resample keeps a null key's real counts (null-safe grid join)") {
    import java.sql.Timestamp
    val df = Seq(
      (Option.empty[String], Timestamp.valueOf("2024-01-01 10:00:00"), 3.0),
      (Option.empty[String], Timestamp.valueOf("2024-01-03 10:00:00"), 4.0),
      (Some("u1"), Timestamp.valueOf("2024-01-01 01:00:00"), 1.0)
    ).toDF("k", "ts", "v")
    val got = graft.operators.Resample
      .resample(df, "ts", "k", 86400000000L, "v")
      .filter($"k".isNull)
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
      .toSet
    // the null key is a real group: counts present, gap day filled
    assert(got === Set(
      ("2024-01-01 00:00:00.0", 1L, 3.0),
      ("2024-01-02 00:00:00.0", 0L, 0.0),
      ("2024-01-03 00:00:00.0", 1L, 4.0)))
  }

  test("interArrivalRegularity flags metronomes, spares humans and tiny accounts") {
    def ev(u: Long, sec: Long, id: Long) =
      (u, Timestamp.from(java.time.Instant.ofEpochSecond(sec)), id)
    val rows =
      (0 to 6).map(i => ev(1L, i * 10L, i.toLong)) ++          // bot: 10 s metronome
      Seq(0L, 3L, 50L, 51L, 300L, 1000L, 1003L).zipWithIndex
        .map { case (s, i) => ev(2L, s, 100L + i) } ++          // human: bursty
      Seq(ev(3L, 0L, 200L), ev(3L, 10L, 201L))                  // 1 gap only
    val out = Velocity.interArrivalRegularity(
      rows.toDF("user_id", "ts", "event_id"), "user_id", "ts", "event_id",
      minGaps = 5, cvFlag = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_gaps"), r.getAs[Double]("cv"),
          r.getAs[Boolean]("regular"))).toMap
    assert(out(1L)._1 === 6L && out(1L)._2 === 0.0 && out(1L)._3)
    assert(out(2L)._2 > 0.5 && !out(2L)._3)
    assert(out(3L)._1 === 1L && !out(3L)._3) // volume floor
  }
}

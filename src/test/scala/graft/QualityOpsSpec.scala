package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Expectations, TimeFeatures, Velocity}

/** fkAudit, interArrival, burstHours — the round-7 quality/profile
  * operators, pinned on literal frames with known answers.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fkAudit: orphans, null FKs, and a clean edge") {
    val child = Seq(
      (Some(1L), "a"), (Some(2L), "b"), (Some(99L), "orphan"),
      (None: Option[Long], "nullfk"))
      .toDF("fk_key", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Expectations.fkAudit(Seq(
      Expectations.FkCheck("child->parent", child, "fk_key", parent, "pk")))
      .collect().head
    assert(got.getAs[Long]("n_child") === 4L)
    assert(got.getAs[Long]("n_null") === 1L)
    assert(got.getAs[Long]("n_orphans") === 1L) // 99 only; null not orphan
    assert(got.getAs[Double]("orphan_frac") === 1.0 / 3.0)
    assert(!got.getAs[Boolean]("pass"))

    val clean = Expectations.fkAudit(Seq(
      Expectations.FkCheck("ok", child.filter(col("fk_key") <= 2), "fk_key",
        parent, "pk"))).collect().head
    assert(clean.getAs[Long]("n_orphans") === 0L &&
      clean.getAs[Boolean]("pass"))
  }

  test("interArrival: exact gaps in (ts, tie) order; singleton has none") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 00:00:01"), 11L),
      (1L, ts("2024-01-01 00:00:04"), 12L),
      (2L, ts("2024-01-01 00:00:00"), 20L))
      .toDF("user_id", "ts", "event_id")
    val got = TimeFeatures.interArrival(df, "user_id", "ts", "event_id")
      .orderBy($"user_id").collect()
    val u1 = got(0)
    assert(u1.getAs[Long]("n_events") === 3L && u1.getAs[Long]("n_gaps") === 2L)
    assert(u1.getAs[Long]("min_gap_us") === 1000000L)
    assert(u1.getAs[Long]("max_gap_us") === 3000000L)
    assert(u1.getAs[Double]("mean_gap_us") === 2000000.0)
    val u2 = got(1)
    assert(u2.getAs[Long]("n_gaps") === 0L && u2.isNullAt(u2.fieldIndex("mean_gap_us")))
  }

  test("burstHours: integer threshold flags only the hot hour") {
    // user 1: hours with 1,1,10 events -> total 12 over 3 active hours;
    // burst iff n*3 > 2*12 <=> n > 8 -> only the 10-event hour
    val rows =
      Seq.tabulate(1)(i => (1L, ts(f"2024-01-01 00:00:${i}%02d"))) ++
      Seq.tabulate(1)(i => (1L, ts(f"2024-01-01 01:00:${i}%02d"))) ++
      Seq.tabulate(10)(i => (1L, ts(f"2024-01-01 02:00:${i}%02d"))) ++
      // user 2: perfectly uniform -> never bursts
      Seq.tabulate(4)(i => (2L, ts(f"2024-01-01 0$i:00:00")))
    val df = rows.toDF("user_id", "ts")
    val got = Velocity.burstHours(df, "user_id", "ts", factor = 2).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("user_id") === 1L)
    assert(got.head.getAs[Long]("n") === 10L)
    assert(got.head.getAs[Long]("hour_start_us") ===
      ts("2024-01-01 02:00:00").getTime * 1000)
  }
}
